"""Password-candidate chain for protected documents (reference A2/J2 parity).

Re-implements, from scratch, the ordered candidate logic of the reference's
``FileManagementService.get_all_passwords_for_file``
(``backend/services/document_processing/services/file_management_service.py:187-212``):

    1. the caller-provided password,
    2. the password previously SAVED for this document (the reference's
       per-directory CSV; here a plain mapping — at job scale a broadcast
       ``ray.put`` dict captured in the extractor actor's ctor),
    3. the password CACHED from an earlier success in this worker
       (``password_cache`` dict, file_management_service.py:45),
    4. the configured default password,
    5. ``None`` (try without a password),

deduplicated in first-occurrence order. The enhanced extractor then tries at
most ``MAX_ATTEMPTS`` of these (``core_pdf_processor.py:283``) and records a
success back into cache + saved map (``:307-308``).

Actual PDF decryption is OUT of the engine's fixture scope (sandbox fixtures
are unencrypted; SURVEY.md §2.3 A2) — this module carries the state/lookup
semantics, which is the part that shapes the distributed design: the saved
map is a broadcast small side, the cache is actor-local, and success updates
never need cross-worker coordination (re-deriving a password costs one extra
attempt, so last-writer-wins is correct).
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Optional

MAX_ATTEMPTS = 3  # core_pdf_processor.py:283


def password_candidates(
    doc_key: str,
    provided: Optional[str] = None,
    saved: Optional[Mapping[str, str]] = None,
    cache: Optional[Mapping[str, str]] = None,
    default: Optional[str] = None,
) -> List[Optional[str]]:
    """Ordered, deduplicated candidate list ending with ``None``."""
    out: List[Optional[str]] = []

    def add(pw: Optional[str]) -> None:
        if pw is not None and pw not in out:
            out.append(pw)

    add(provided)
    if saved:
        add(saved.get(doc_key))
    if cache:
        add(cache.get(doc_key))
    add(default)
    out.append(None)
    return out


class PasswordBook:
    """Actor-held password state: an immutable broadcast ``saved`` map plus a
    mutable per-actor success cache (the A2 pattern, Ray-shaped)."""

    def __init__(
        self,
        saved: Optional[Mapping[str, str]] = None,
        default: Optional[str] = None,
    ) -> None:
        self.saved = dict(saved or {})
        self.default = default
        self.cache: Dict[str, str] = {}

    def candidates_for(
        self, doc_key: str, provided: Optional[str] = None
    ) -> List[Optional[str]]:
        return password_candidates(
            doc_key, provided, self.saved, self.cache, self.default
        )[:MAX_ATTEMPTS]

    def record_success(self, doc_key: str, password: Optional[str]) -> None:
        """Cache a working password (file_management_service.py:214-221's
        cache half; the CSV half becomes the next run's broadcast map)."""
        if password is not None:
            self.cache[doc_key] = password
