"""RSS 2.0 / Atom feed parsing — the non-HTML content type a web crawl
sees most after HTML/PDF (news syndication, podcast indexes, blog feeds).

From-scratch on the stdlib: ``xml.etree.ElementTree`` for structure,
``email.utils.parsedate_to_datetime`` for RFC 822 pubDates (the RSS date
format), ``datetime.fromisoformat`` for Atom's ISO 8601. The reference has
no feed path (its queue carries PDFs); this extends the sniff/dispatch
family the same way the table and link extractors do — a typed payload in,
a flat entity-row list out, failures are counted rows, never exceptions.

Timestamps normalize to epoch SECONDS (int64, UTC) — the cross-format
common denominator; both wire formats carry second precision.

Entity model: one row per item/entry with (feed_kind, feed_title,
item_title, link, pub_epoch). Atom links prefer rel="alternate" (or an
unmarked rel, which the spec defaults to alternate) and ignore rel="self"/
"hub" plumbing links. Items missing a title or link still emit (None
fields) — curation filters decide downstream, not the parser.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from datetime import datetime, timezone
from email.utils import parsedate_to_datetime
from typing import Dict, List, Optional

ATOM_NS = "{http://www.w3.org/2005/Atom}"


def detect_feed(payload: bytes | None) -> Optional[str]:
    """'rss' / 'atom' by ROOT TAG (after the XML declaration / BOM /
    comments), not by sniffing content bytes — a root <html> page that
    merely mentions rss stays html."""
    if not payload:
        return None
    head = payload[:512]
    if head[:3] == b"\xef\xbb\xbf":
        head = head[3:]
    s = head.lstrip()
    if not s.startswith(b"<"):
        return None
    # skip declaration and comments to the first element tag
    i = 0
    while i < len(s):
        if s.startswith(b"<?", i):
            j = s.find(b"?>", i)
            if j < 0:
                return None
            i = j + 2
        elif s.startswith(b"<!--", i):
            j = s.find(b"-->", i)
            if j < 0:
                return None
            i = j + 3
        elif s.startswith(b"<", i):
            tag = s[i + 1 : i + 32].split(b">")[0].split(b" ")[0].lower()
            if tag == b"rss":
                return "rss"
            if tag == b"feed":
                return "atom"
            return None
        else:
            i += 1
    return None


def _epoch_rfc822(text: Optional[str]) -> Optional[int]:
    if not text:
        return None
    try:
        return int(parsedate_to_datetime(text.strip()).timestamp())
    except (ValueError, TypeError):
        return None


def _epoch_iso(text: Optional[str]) -> Optional[int]:
    if not text:
        return None
    try:
        dt = datetime.fromisoformat(text.strip().replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp())
    except ValueError:
        return None


def parse_feed(payload: bytes) -> Optional[Dict]:
    """Parse one feed document. Returns ``{"kind", "feed_title", "items":
    [{"item_title", "link", "pub_epoch"}, ...]}`` or None for non-feed /
    malformed XML (the caller counts those, mirroring the PDF/HTML
    parse_failure contract)."""
    kind = detect_feed(payload)
    if kind is None:
        return None
    try:
        root = ET.fromstring(payload)
    except ET.ParseError:
        return None

    items: List[Dict] = []
    if kind == "rss":
        channel = root.find("channel")
        if channel is None:
            return None
        feed_title = (channel.findtext("title") or "").strip() or None
        for it in channel.iter("item"):
            items.append({
                "item_title": (it.findtext("title") or "").strip() or None,
                "link": (it.findtext("link") or "").strip() or None,
                "pub_epoch": _epoch_rfc822(it.findtext("pubDate")),
            })
    else:
        feed_title = (root.findtext(ATOM_NS + "title") or "").strip() or None
        for entry in root.iter(ATOM_NS + "entry"):
            link = None
            for ln in entry.iter(ATOM_NS + "link"):
                rel = ln.get("rel") or "alternate"  # spec default
                if rel == "alternate":
                    link = ln.get("href")
                    break
            items.append({
                "item_title": (entry.findtext(ATOM_NS + "title") or "").strip() or None,
                "link": link,
                "pub_epoch": _epoch_iso(entry.findtext(ATOM_NS + "updated")),
            })
    return {"kind": kind, "feed_title": feed_title, "items": items}
