"""Text-quality predicates and normalizers.

Pure functions, shared verbatim between the sequential oracle and the
distributed Ray job so that output bytes are independent of parallelism.

Semantics reproduce the reference service exactly (all citations into
/root/reference):

- ``is_garbage_text``  — ``core_pdf_processor.py:584-648`` (the 7-clause
  garbage predicate that gates the primary-extraction-vs-fallback decision).
- ``clean_unicode``    — ``backend/core/text_utils.py:16-75``.
- ``chunk_text``       — ``text_utils.py:77-117``.
- ``extract_numbers`` / ``extract_dates`` — ``text_utils.py:119-140``.
- ``normalize_whitespace`` — ``text_utils.py:142-147``.
- ``remove_page_headers_footers`` — ``text_utils.py:149-166``.
- ``MIN_TEXT_LENGTH`` — production quality gate ``min_text_length=250``
  (``document_text_extraction_service.py:174-178``).
"""

from __future__ import annotations

import re
from typing import List

# Production config of the reference service (document_text_extraction_service.py:174-178):
# PDFProcessor(max_pages=None, min_text_length=250).
MIN_TEXT_LENGTH = 250
MAX_PAGES: int | None = None

# Control characters excluding \t \n \r and space — core_pdf_processor.py:607-611.
_CONTROL_SEQ_RE = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]+")
_ALLOWED_PUNCT = set(".,!?;:()[]{}\"'")


def _is_garbage_text_reference(text: str) -> bool:
    """Literal clause-for-clause port of the reference predicate
    (core_pdf_processor.py:584-648) — kept as the semantic oracle for the
    vectorized implementation below (property-tested equal)."""
    if not text.strip():
        return True

    n = len(text)

    control_char_count = sum(1 for c in text if ord(c) < 32 and c not in "\t\n\r")
    if control_char_count > n * 0.3:
        return True

    if len(_CONTROL_SEQ_RE.findall(text)) > 3:
        return True

    special_char_ratio = (
        sum(1 for c in text if not c.isalnum() and not c.isspace() and c not in _ALLOWED_PUNCT)
        / n
    )
    if special_char_ratio > 0.5:
        return True

    if len(set(text)) < 5:
        return True

    words = text.split()
    if words:
        short_word_ratio = sum(1 for w in words if len(w) < 2) / len(words)
        if short_word_ratio > 0.7:
            return True

    non_printable_count = sum(
        1 for c in text if ord(c) < 32 and c not in "\t\n\r" or ord(c) > 126
    )
    if non_printable_count > n * 0.2:
        return True

    printable_ratio = sum(1 for c in text if c.isprintable() and c not in "\t\n\r") / n
    if printable_ratio < 0.3:
        return True

    return False


def _build_ascii_luts():
    """Boolean lookup tables for code points < 128, derived from Python's own
    str predicates so ASCII semantics are identical by construction."""
    import numpy as np

    special = np.zeros(128, dtype=bool)   # not alnum, not space, not allowed punct
    space = np.zeros(128, dtype=bool)
    printable = np.zeros(128, dtype=bool)
    for i in range(128):
        c = chr(i)
        special[i] = (not c.isalnum()) and (not c.isspace()) and c not in _ALLOWED_PUNCT
        space[i] = c.isspace()
        printable[i] = c.isprintable() and c not in "\t\n\r"
    return special, space, printable


_LUT_SPECIAL, _LUT_SPACE, _LUT_PRINTABLE = _build_ascii_luts()


def is_garbage_text(text: str) -> bool:
    """True if extracted text appears to be garbage.

    Exact thresholds of the reference predicate (core_pdf_processor.py:
    584-648; see ``_is_garbage_text_reference``), vectorized: the per-char
    clauses run as numpy ops over the UTF-32 code points, with ASCII
    lookup tables built from Python's own ``str`` predicates and a
    per-*unique*-codepoint fallback for the (rare) non-ASCII chars — so the
    result is bit-identical to the reference loop on ANY input. This
    predicate runs on every extracted page; the reference loops cost ~1 ms
    per page of Python-level iteration, which dominates nothing alone but
    adds up at 10^12 pages.

    Clauses: 1. empty/whitespace-only; 2. >30% control chars (excl \\t\\n\\r);
    3. >3 control sequences; 4. special-char ratio > 0.5; 5. <5 distinct
    chars; 6. short-word (<2) ratio > 0.7; 7. >20% non-printable;
    8. <30% printable.
    """
    import numpy as np

    if not text.strip():
        return True

    n = len(text)
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)

    is_ctl = (cp < 32) & (cp != 9) & (cp != 10) & (cp != 13)
    if int(is_ctl.sum()) > n * 0.3:
        return True

    # Control *sequences*: runs of [\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F].
    in_seq = (
        (cp <= 0x08)
        | (cp == 0x0B)
        | (cp == 0x0C)
        | ((cp >= 0x0E) & (cp <= 0x1F))
        | ((cp >= 0x7F) & (cp <= 0x9F))
    )
    n_runs = int(in_seq[0]) + int((in_seq[1:] & ~in_seq[:-1]).sum())
    if n_runs > 3:
        return True

    ascii_mask = cp < 128
    all_ascii = bool(ascii_mask.all())
    non_ascii = cp[~ascii_mask] if not all_ascii else cp[:0]
    uniq_na, counts_na = (np.unique(non_ascii, return_counts=True)
                          if non_ascii.size else (np.array([], dtype=np.uint32), np.array([], dtype=np.int64)))
    uniq_chars = [chr(int(u)) for u in uniq_na]

    ascii_cp = cp if all_ascii else cp[ascii_mask]
    # One O(n) histogram serves both the special-char ratio and the
    # distinct-char count (np.unique's sort was the hottest line here).
    ascii_hist = np.bincount(ascii_cp, minlength=128)[:128]
    special_count = int(ascii_hist[_LUT_SPECIAL].sum()) + int(
        sum(
            cnt
            for u, cnt in zip(uniq_chars, counts_na)
            if (not u.isalnum()) and (not u.isspace()) and u not in _ALLOWED_PUNCT
        )
    )
    if special_count / n > 0.5:
        return True

    distinct = int((ascii_hist > 0).sum()) + len(uniq_chars)
    if distinct < 5:
        return True

    # Short words over str.split() semantics: words are maximal runs of
    # non-whitespace (unicode isspace).
    is_sp = np.empty(n, dtype=bool)
    is_sp[ascii_mask] = _LUT_SPACE[ascii_cp]
    if non_ascii.size:
        na_space = {u: chr(int(u)).isspace() for u in uniq_na}
        is_sp[~ascii_mask] = [na_space[int(c)] for c in non_ascii]
    non_sp = ~is_sp
    starts = non_sp & np.concatenate(([True], is_sp[:-1]))
    n_words = int(starts.sum())
    if n_words > 0:
        # word lengths: distance between run starts and run ends
        ends = non_sp & np.concatenate((is_sp[1:], [True]))
        lengths = np.flatnonzero(ends) - np.flatnonzero(starts) + 1
        if int((lengths < 2).sum()) / n_words > 0.7:
            return True

    non_printable_count = int((is_ctl | (cp > 126)).sum())
    if non_printable_count > n * 0.2:
        return True

    printable_count = int(ascii_hist[_LUT_PRINTABLE].sum()) + int(
        sum(
            cnt
            for u, cnt in zip(uniq_chars, counts_na)
            if u.isprintable()
        )
    )
    if printable_count / n < 0.3:
        return True

    return False


_CURRENCY_REPLACEMENTS = {
    "\ufffd\ufffd\ufffd": "\u20ac",  # common Euro-symbol corruption (replacement chars)
    "\u00e2\u201a\u00ac": "\u20ac",  # mojibake Euro ("\u00e2\u201a\u00ac")
    "\u20ac": "\u20ac",  # Euro symbol
    "\u00a3": "\u00a3",  # Pound symbol
    "\u00a5": "\u00a5",  # Yen symbol
    "\u0024": "$",  # Dollar symbol
}

_UNICODE_REPLACEMENTS = {
    "\u00a0": " ",  # non-breaking space
    "\u2010": "-",  # hyphen
    "\u2011": "-",  # non-breaking hyphen
    "\u2012": "-",  # figure dash
    "\u2013": "-",  # en dash
    "\u2014": "-",  # em dash
    "\u2015": "-",  # horizontal bar
    "\u2018": "'",  # left single quote
    "\u2019": "'",  # right single quote
    "\u201a": "'",  # single low quote
    "\u201c": '"',  # left double quote
    "\u201d": '"',  # right double quote
    "\u201e": '"',  # double low quote
    "\u2026": "...",  # ellipsis
    "\ufeff": "",  # BOM
}

_KEEP_CURRENCY = {
    "\u20ac", "\u00a3", "\u00a5", "\u00a2", "\u20b9",
    "\u20bd", "\u20a9", "\u20aa", "\u20ab",
}

def clean_unicode(text: str) -> str:
    """Clean Unicode/special-character corruption (text_utils.py:16-75 semantics).

    Currency-corruption fixes, smart-quote/dash/ellipsis/NBSP/BOM mapping,
    control chars -> space (keeping \\n\\r\\t), keep listed currency symbols and
    latin-1, replace other non-ASCII with a space.
    """
    for corrupted, correct in _CURRENCY_REPLACEMENTS.items():
        text = text.replace(corrupted, correct)
    for old, new in _UNICODE_REPLACEMENTS.items():
        text = text.replace(old, new)

    out: list[str] = []
    for char in text:
        o = ord(char)
        if o < 32:
            out.append(char if char in ("\n", "\r", "\t") else " ")
        elif o > 127:
            if char in _KEEP_CURRENCY:
                out.append(char)
            elif o < 256:
                out.append(char)
            else:
                out.append(" ")
        else:
            out.append(char)
    return "".join(out)


def chunk_text(text: str, max_chars: int = 8000, overlap: int = 200) -> List[str]:
    """Split text into overlapping chunks (text_utils.py:77-117 semantics).

    Breaks preferentially at ``\\n\\n``, ``\\n``, ``. ``, ``! ``, ``? ``;
    ``overlap`` characters are repeated between adjacent chunks.
    """
    if len(text) <= max_chars:
        return [text]

    chunks: list[str] = []
    start = 0
    while start < len(text):
        end = start + max_chars
        if end >= len(text):
            chunks.append(text[start:])
            break
        break_pos = end
        for break_char in ["\n\n", "\n", ". ", "! ", "? "]:
            pos = text.rfind(break_char, start, end)
            if pos > start:
                break_pos = pos + len(break_char)
                break
        chunks.append(text[start:break_pos])
        start = break_pos - overlap if overlap > 0 else break_pos
    return chunks


_NUMBER_RE = re.compile(r"\b\d{1,3}(?:,\d{3})*(?:\.\d{1,2})?\b")

_DATE_PATTERNS = [
    re.compile(r"\b\d{1,2}\s+(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\w*\s+\d{4}\b", re.IGNORECASE),
    re.compile(r"\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\w*\s+\d{1,2},?\s+\d{4}\b", re.IGNORECASE),
    re.compile(r"\b\d{4}-\d{2}-\d{2}\b"),
    re.compile(r"\b\d{1,2}/\d{1,2}/\d{4}\b"),
    re.compile(r"\b\d{1,2}\.\d{1,2}\.\d{4}\b"),
]


def extract_numbers(text: str) -> List[str]:
    """Extract comma-grouped / decimal numbers (text_utils.py:119-124)."""
    return _NUMBER_RE.findall(text)


def extract_dates(text: str) -> List[str]:
    """Extract date strings via the reference's 5 patterns (text_utils.py:126-140)."""
    dates: list[str] = []
    for pattern in _DATE_PATTERNS:
        dates.extend(pattern.findall(text))
    return dates


_WS_RE = re.compile(r"\s+")


def normalize_whitespace(text: str) -> str:
    """Collapse all whitespace runs to single spaces and strip (text_utils.py:142-147)."""
    return _WS_RE.sub(" ", text).strip()


_PAGE_LINE_RE = re.compile(r"^Page \d+$", re.IGNORECASE)
_NUM_LINE_RE = re.compile(r"^\d+$")
_DASH_LINE_RE = re.compile(r"^-+$")


def remove_page_headers_footers(text: str) -> str:
    """Drop header/footer-looking lines (text_utils.py:149-166 semantics).

    Removes lines matching ``^Page \\d+$``, bare numbers, lines shorter than 3
    chars, and horizontal rules.
    """
    cleaned: list[str] = []
    for line in text.split("\n"):
        line = line.strip()
        if (
            _PAGE_LINE_RE.match(line)
            or _NUM_LINE_RE.match(line)
            or len(line) < 3
            or _DASH_LINE_RE.match(line)
        ):
            continue
        cleaned.append(line)
    return "\n".join(cleaned)


# ---------------------------------------------------------------------------
# License detection (phrase classifier over page text)
# ---------------------------------------------------------------------------

_LICENSE_PATTERNS = (
    # order matters: more specific CC variants before plain cc-by
    ("cc-by-nc", re.compile(r"creative commons attribution[- ]noncommercial", re.I)),
    ("cc-by-nd", re.compile(r"creative commons attribution[- ]noderivatives", re.I)),
    ("cc-by", re.compile(r"creative commons attribution", re.I)),
    ("mit", re.compile(r"\bmit license\b", re.I)),
)

_LICENSE_RIGHTS = {
    "cc-by": (True, True),
    "cc-by-nc": (False, True),
    "cc-by-nd": (True, False),
    "mit": (True, True),
    "unknown": (False, False),
}


def detect_license(text: str) -> dict:
    """Classify a page's declared license by footer phrase (first matching
    pattern wins; specific CC variants outrank plain cc-by). Returns
    {license, allows_commercial, allows_derivatives} — 'unknown' grants
    nothing (the conservative default a training-data pipeline needs)."""
    for name, rx in _LICENSE_PATTERNS:
        if rx.search(text):
            commercial, derivatives = _LICENSE_RIGHTS[name]
            return {
                "license": name,
                "allows_commercial": commercial,
                "allows_derivatives": derivatives,
            }
    return {"license": "unknown", "allows_commercial": False,
            "allows_derivatives": False}


_HYPHEN_BREAK_RX = re.compile(r"(\w)-\n(\w)")


def dehyphenate(text: str) -> str:
    """Rejoin words split by end-of-line hyphenation ("exam-\\nple" ->
    "example") — the PDF/column-text repair every extraction
    post-processor runs (line-wrapped justified text hyphenates words at
    the right margin; the broken halves poison tokenizers and dedup
    shingles). Only letter-hyphen-newline-letter joins; a hyphen before a
    space or at a real compound ("well-known") is untouched."""
    return _HYPHEN_BREAK_RX.sub(r"\1\2", text)


# ---------------------------------------------------------------------------
# Scholarly identifier extraction (DOI / arXiv)
# ---------------------------------------------------------------------------

_DOI_RX = re.compile(r"\b10\.\d{4,9}/[-._;()/:a-z0-9]+", re.I)
_ARXIV_RX = re.compile(r"\barxiv:\s*(\d{4}\.\d{4,5})(v\d+)?", re.I)


def extract_identifiers(text: str) -> list:
    """-> [(kind, identifier)] in document order: DOIs (the Crossref
    display form, trailing punctuation trimmed) and arXiv IDs (new-style
    YYMM.NNNNN, version suffix dropped) — the citation-graph primitive a
    scientific-corpus pipeline runs at ingest."""
    out = []
    for m in _DOI_RX.finditer(text):
        doi = m.group(0).rstrip(".,;)")
        out.append(("doi", doi.lower()))
    for m in _ARXIV_RX.finditer(text):
        out.append(("arxiv", m.group(1)))
    return out
