"""JSON-LD structured-data extraction (schema.org entities embedded in
``<script type="application/ld+json">`` blocks — the machine-readable
metadata news articles, products and recipes ship).

The reference has no JSON-LD path, but it DOES ship a tolerant JSON salvage
suite for almost-JSON payloads (``backend/core/json_utils.py``, re-expressed
in ``functions/json_utils.py``); real-world JSON-LD is exactly that kind of
almost-JSON (trailing commas, stray apostrophes, CMS templating leftovers),
so this extractor reuses ``safe_json_loads`` as its parse step: a block that
plain ``json.loads`` rejects gets one sanitize-and-retry pass before being
dropped. Blocks that fail even the sanitizer contribute no entities — never
an exception (the per-batch totality contract all extract stages follow).

Entity model (deliberately flat — the engine's unit of work is a row):
every top-level object, every element of a top-level array, and every node
of a ``@graph`` array becomes one entity row with its ``@type``, its
display name (``name``, falling back to ``headline`` — the Article idiom),
and ``wordCount`` when present. Nested entities (e.g. ``author`` objects)
are NOT recursed into: they belong to their parent row; flattening them
would double-count names under the dedup/curation consumers downstream.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Any, Dict, List, Optional

from .json_utils import safe_json_loads


class _LdBlockCollector(HTMLParser):
    """Collect the raw text of every ld+json script block; any other script
    (untyped, text/javascript, a decoy carrying JSON-looking source) is
    ignored by the MIME check, not by content sniffing."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._in_ld = False
        self._buf: List[str] = []
        self.blocks: List[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "script":
            mime = (dict(attrs).get("type") or "").split(";")[0].strip().lower()
            if mime == "application/ld+json":
                self._in_ld = True
                self._buf = []

    def handle_endtag(self, tag: str) -> None:
        if tag == "script" and self._in_ld:
            self._in_ld = False
            self.blocks.append("".join(self._buf))

    def handle_data(self, data: str) -> None:
        if self._in_ld:
            self._buf.append(data)


def _nodes(data: Any) -> List[Dict[str, Any]]:
    """Top-level entity nodes of one parsed block: a bare object, a bare
    array of objects, or the objects under ``@graph``."""
    if isinstance(data, dict):
        graph = data.get("@graph")
        if isinstance(graph, list):
            return [n for n in graph if isinstance(n, dict)]
        return [data]
    if isinstance(data, list):
        return [n for n in data if isinstance(n, dict)]
    return []


def extract_jsonld(html: bytes | str) -> List[Dict[str, Optional[object]]]:
    """All schema.org entities of a page, in block order then node order.

    Returns dicts with keys ``entity_type`` (the ``@type`` string; nodes
    without a string ``@type`` are skipped — untyped nodes carry no
    classification downstream), ``name`` (``name`` falling back to
    ``headline``; None when absent), ``word_count`` (``wordCount`` when an
    int; None otherwise)."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    collector = _LdBlockCollector()
    try:
        collector.feed(html)
        collector.close()
    except Exception:
        return []
    out: List[Dict[str, Optional[object]]] = []
    for block in collector.blocks:
        try:
            data = safe_json_loads(block)
        except Exception:
            continue  # beyond salvage: no entities, never an exception
        for node in _nodes(data):
            etype = node.get("@type")
            if not isinstance(etype, str):
                continue
            name = node.get("name")
            if not isinstance(name, str):
                name = node.get("headline")
                if not isinstance(name, str):
                    name = None
            wc = node.get("wordCount")
            out.append({
                "entity_type": etype,
                "name": name,
                "word_count": int(wc) if isinstance(wc, int) and not isinstance(wc, bool) else None,
            })
    return out
