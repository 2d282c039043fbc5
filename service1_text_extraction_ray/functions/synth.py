"""Deterministic synthetic corpus generator (the FIXTURES.md spec).

Emits the authoritative input shape from BASELINE.json's ``input_hint``:
Parquet columns ``(url: string, warc_ts: timestamp[us], html: binary,
text: string, lang: string)``. Payloads are produced by our own HTML and
minimal-PDF writers so they stay inside the from-scratch parsers' supported
subset. Everything is seeded and wall-clock-free: row ``i`` of a given
``(seed, n_rows)`` is byte-identical across runs, processes, and machines.

Payload mix per FIXTURES.md §2 (category by ``i % 100``):
0-54 clean article HTML, 55-64 link-farm HTML, 65-69 script/style-heavy,
70-74 short/empty (under the 250-char gate), 75-79 garbage-text HTML,
80-94 synthetic PDF (half FlateDecode; some 2-column / out-of-order Tm;
cat 84 ENCRYPTED owner-locked with empty user password, cat 91 ENCRYPTED
with the saved per-site / configured default password, cat 94 ENCRYPTED
with an unknown password -> password_required failure — both RC4-40 /V 1
and RC4-128 /V 2, see functions/pdf_crypt.py), 95-99 malformed payloads.
Rows with ``i % 1000 in (7, 13)`` are giant blobs (~1.5 MiB, >100x median)
to exercise the truncation/skew path.
"""

from __future__ import annotations

import random
import zlib
from typing import List, Tuple

import numpy as np
import pyarrow as pa

EPOCH_US = 1735689600000000  # 2025-01-01T00:00:00Z in microseconds

LANGS = ["en", "en", "en", "de", "fr", "es", "hi", "en", "de", "en"]

_VOCAB = (
    "stream data page query batch shard merge sort scan table index key value "
    "column row block arrow vector text parse token filter group join order "
    "window count system worker node cluster shuffle spill cache memory disk "
    "network engine plan stage task actor pool lineage resume commit hash"
).split()

_SENTENCE_ENDINGS = [". ", ". ", ". ", "! ", "? "]

BOILERPLATE_NAV = (
    "Home News Products About Contact Careers Privacy Terms Sitemap Login Register"
)
BOILERPLATE_FOOTER = (
    "Copyright 2025 Example Corp. All rights reserved. Privacy Policy | Terms of Service | Cookies"
)
RELATED_LINKS = [
    "Read more about our premium subscription offers",
    "Top ten lists you cannot miss this week",
    "Subscribe to the newsletter for daily updates",
    "Trending now across the network of sites",
    "Download the app for exclusive mobile content",
    "More stories from around the web today",
]


def _rng(seed: int, i: int) -> random.Random:
    return random.Random(seed * 1_000_003 + i)


def _sentence(rng: random.Random, n_words: int) -> str:
    words = [rng.choice(_VOCAB) for _ in range(n_words)]
    words[0] = words[0].capitalize()
    return " ".join(words) + rng.choice(_SENTENCE_ENDINGS)


def make_paragraphs(rng: random.Random, n_paras: int, words_per_sentence=(6, 14), sentences=(2, 6)) -> List[str]:
    paras = []
    for _ in range(n_paras):
        n_sent = rng.randint(*sentences)
        paras.append(
            "".join(_sentence(rng, rng.randint(*words_per_sentence)) for _ in range(n_sent)).strip()
        )
    return paras


# --------------------------------------------------------------------------
# HTML writer
# --------------------------------------------------------------------------


def make_article_html(title: str, paragraphs: List[str], rng: random.Random,
                      heavy_scripts: bool = False, charset: str = "utf-8",
                      bom: bool = False) -> bytes:
    """A realistic article page: head, nav, header, main content, sidebar,
    related-links box, footer. The extractor's golden output is the title +
    content paragraphs (boilerplate must be stripped).

    ``charset``: declared in ``<meta charset>`` AND used to encode the
    bytes (e.g. "windows-1252" legacy pages). ``bom``: prefix a UTF-8 BOM
    (utf-8 only) — the extractor must strip it."""
    scripts = ""
    if heavy_scripts:
        blob = " ".join(rng.choice(_VOCAB) for _ in range(400))
        scripts = (
            f"<script>var DATA = {{payload: '{blob}'}};\n"
            + "function f(x){return x*2;}\n" * 30
            + "</script><style>"
            + ".cls{margin:0;padding:0;color:#333}\n" * 40
            + "</style>"
        )
    nav_links = " ".join(f'<a href="/{w}">{w.capitalize()}</a>' for w in BOILERPLATE_NAV.split())
    related = "".join(f'<li><a href="/r/{i}">{t}</a></li>' for i, t in enumerate(RELATED_LINKS))
    body_paras = "".join(f"<p>{p}</p>" for p in paragraphs)
    ad = '<div class="ad"><a href="/buy">Buy now</a> <a href="/deal">Hot deal</a></div>'
    html = (
        "<!DOCTYPE html>"
        f'<html><head><title>{title}</title><meta charset="{charset}">{scripts}</head>'
        "<body>"
        f"<header><h1>Example Site</h1><nav>{nav_links}</nav></header>"
        f"<main><article><h1>{title}</h1>{body_paras}</article>"
        f'<aside><h3>Related</h3><ul>{related}</ul>{ad}</aside></main>'
        f"<footer><p>{BOILERPLATE_FOOTER}</p></footer>"
        "</body></html>"
    )
    payload = html.encode(charset)
    if bom:
        assert charset == "utf-8"
        payload = b"\xef\xbb\xbf" + payload
    return payload


def make_linkfarm_html(rng: random.Random, keep_paragraphs: List[str]) -> bytes:
    """Blocks with link density > 0.5 interleaved with a few real paragraphs;
    golden keeps only the low-link-density blocks."""
    farm_blocks = []
    for _ in range(8):
        links = "".join(
            f'<a href="/x/{j}">{" ".join(rng.choice(_VOCAB) for _ in range(3))}</a> '
            for j in range(rng.randint(5, 12))
        )
        farm_blocks.append(f"<div>{links}</div>")
    content = "".join(f"<p>{p}</p>" for p in keep_paragraphs)
    html = (
        "<html><head><title>Directory</title></head><body>"
        + farm_blocks[0]
        + content
        + "".join(farm_blocks[1:])
        + "</body></html>"
    )
    return html.encode("utf-8")


def make_short_html(rng: random.Random) -> bytes:
    txt = _sentence(rng, rng.randint(3, 10)).strip()
    return f"<html><head><title>stub</title></head><body><p>{txt}</p></body></html>".encode("utf-8")


_GARBAGE_MAKERS = [
    # One maker per garbage-predicate clause (core_pdf_processor.py:584-648).
    lambda rng: "@#$% ^&* (()) ~~ || " * 30,                       # special-char ratio > 0.5
    lambda rng: "ababab " * 60,                                     # < 5 distinct chars
    lambda rng: "a b c d e f g h i j " * 30,                        # short-word ratio > 0.7
    lambda rng: ("\x01\x02\x03" + "ab ") * 80,                      # control chars > 30%
    lambda rng: " ".join("~" * rng.randint(1, 2) for _ in range(200)),  # special + short words
]


def make_garbage_html(rng: random.Random, clause: int) -> bytes:
    garbage = _GARBAGE_MAKERS[clause % len(_GARBAGE_MAKERS)](rng)
    # XML-escape so the payload stays well-formed markup.
    garbage = garbage.replace("&", "&amp;").replace("<", "&lt;")
    return f"<html><body><p>{garbage}</p></body></html>".encode("utf-8")


# --------------------------------------------------------------------------
# Minimal-PDF writer (subset matching functions/pdf_extract.py)
# --------------------------------------------------------------------------


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _page_content(lines: List[Tuple[float, float, str]], use_tm: bool, rng: random.Random,
                  cid_map: dict | None = None) -> bytes:
    """Content stream placing each (x, y, text) line. ``use_tm`` emits absolute
    Tm placements in a shuffled order (exercises span reordering); otherwise a
    classic Td/T* relative walk. With ``cid_map`` (char -> CID), strings are
    hex 2-byte-CID strings for a Type0/Identity-H font instead of literals."""

    def enc(s: str) -> str:
        if cid_map is None:
            return f"({_pdf_escape(s)})"
        return "<" + "".join(f"{cid_map[ch]:04x}" for ch in s) + ">"

    ops: List[str] = ["BT", "/F1 12 Tf"]
    if use_tm:
        order = list(range(len(lines)))
        rng.shuffle(order)  # seeded; exercises out-of-order placement
        for idx in order:
            x, y, s = lines[idx]
            ops.append(f"1 0 0 1 {x:g} {y:g} Tm {enc(s)} Tj")
    else:
        ops.append("14 TL")
        prev_x, prev_y = 0.0, 0.0
        for i, (x, y, s) in enumerate(lines):
            if i == 0:
                ops.append(f"{x:g} {y:g} Td")
            else:
                dx, dy = x - prev_x, y - prev_y
                if dx == 0 and dy == -14:
                    ops.append("T*")
                else:
                    ops.append(f"{dx:g} {dy:g} Td")
            if i % 3 == 2:
                # exercise TJ with kerning numbers
                mid = max(1, len(s) // 2)
                ops.append(f"[{enc(s[:mid])} -20 {enc(s[mid:])}] TJ")
            else:
                ops.append(f"{enc(s)} Tj")
            prev_x, prev_y = x, y
    ops.append("ET")
    return "\n".join(ops).encode("latin-1")


def _tounicode_cmap(cid_map: dict) -> bytes:
    """ToUnicode CMap for char->CID ``cid_map``: contiguous codepoint runs
    (CIDs are assigned in sorted-codepoint order, so runs are contiguous in
    both) become ``bfrange`` entries, singletons become ``bfchar``."""
    items = sorted(cid_map.items(), key=lambda kv: kv[1])
    runs: List[Tuple[int, int, int]] = []  # (cid_lo, cid_hi, cp_lo)
    for ch, cid in items:
        cp = ord(ch)
        if runs and runs[-1][1] == cid - 1 and cp == runs[-1][2] + (cid - runs[-1][0]):
            runs[-1] = (runs[-1][0], cid, runs[-1][2])
        else:
            runs.append((cid, cid, cp))
    ranges = [r for r in runs if r[1] - r[0] >= 2]
    chars = [
        (cid, runs_cp + (cid - cid_lo))
        for cid_lo, cid_hi, runs_cp in runs
        if cid_hi - cid_lo < 2
        for cid in range(cid_lo, cid_hi + 1)
    ]
    parts = [
        "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange"
    ]
    if ranges:
        parts.append(f"{len(ranges)} beginbfrange")
        for lo, hi, cp in ranges:
            parts.append(f"<{lo:04x}> <{hi:04x}> <{cp:04x}>")
        parts.append("endbfrange")
    if chars:
        parts.append(f"{len(chars)} beginbfchar")
        for cid, cp in chars:
            parts.append(f"<{cid:04x}> <{cp:04x}>")
        parts.append("endbfchar")
    parts.append("endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend")
    return "\n".join(parts).encode("latin-1")


def _lzw_encode(data: bytes) -> bytes:
    """LZWDecode-compatible encoder (PDF 1.7 §7.4.4, TIFF variant,
    EarlyChange=1). Width bumps mirror the decoder exactly: the decoder's
    table is one entry behind the encoder's, so the encoder widens when its
    next free code reaches 512/1024/2048 (the decoder's 511/1023/2047)."""
    bits: List[Tuple[int, int]] = [(256, 9)]  # clear table first (spec)
    table = {bytes([c]): c for c in range(256)}
    next_code = 258
    width = 9
    w = b""
    for b in data:
        c = bytes([b])
        if w + c in table:
            w += c
            continue
        bits.append((table[w], width))
        table[w + c] = next_code
        next_code += 1
        if next_code - 1 in (511, 1023, 2047):
            width += 1
        if next_code == 4096:
            bits.append((256, width))
            table = {bytes([ch]): ch for ch in range(256)}
            next_code = 258
            width = 9
        w = c
    if w:
        bits.append((table[w], width))
    bits.append((257, width))
    out = bytearray()
    buf = 0
    cnt = 0
    for code, wd in bits:
        buf = (buf << wd) | code
        cnt += wd
        while cnt >= 8:
            out.append((buf >> (cnt - 8)) & 0xFF)
            cnt -= 8
    if cnt:
        out.append((buf << (8 - cnt)) & 0xFF)
    return bytes(out)


def _a85_encode(data: bytes) -> bytes:
    """ASCII85Decode-compatible encoder (PDF 1.7 §7.4.3): 4 bytes -> 5
    base-85 chars, all-zero full groups as ``z``, trailing n bytes as n+1
    chars, ``~>`` EOD."""
    out = bytearray()
    for i in range(0, len(data), 4):
        chunk = data[i:i + 4]
        n = len(chunk)
        acc = int.from_bytes(chunk + b"\x00" * (4 - n), "big")
        if acc == 0 and n == 4:
            out.append(0x7A)  # 'z'
            continue
        grp = bytearray()
        for _ in range(5):
            grp.append(acc % 85 + 0x21)
            acc //= 85
        grp.reverse()
        out += grp[: n + 1]
    out += b"~>"
    return bytes(out)


def _rle_encode(data: bytes) -> bytes:
    """RunLengthDecode-compatible encoder (PDF 1.7 §7.4.5): repeat runs of
    2-128 equal bytes as (257-n, byte); literals in chunks of <= 128."""
    out = bytearray()
    i = 0
    n = len(data)
    lit_start = i
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            j = lit_start
            while j < i:
                k = min(128, i - j)
                out.append(k - 1)
                out += data[j:j + k]
                j += k
            out.append(257 - run)
            out.append(data[i])
            i += run
            lit_start = i
        else:
            i += 1
    j = lit_start
    while j < n:
        k = min(128, n - j)
        out.append(k - 1)
        out += data[j:j + k]
        j += k
    out.append(128)  # EOD
    return bytes(out)


def make_pdf(page_line_texts: List[List[str]], rng: random.Random,
             compress: "bool | str" = False,
             two_column: bool = False, use_tm: bool = False,
             encrypt: dict | None = None, objstm: bool = False,
             cid_font: bool = False, form_header: bool = False,
             info: dict | None = None) -> bytes:
    """Write a minimal PDF 1.4 with the given per-page line texts.

    ``compress``: False = raw content streams; True = FlateDecode; "lzw" /
    "rle" / "a85" = LZWDecode / RunLengthDecode / ASCII85Decode page
    content (auxiliary streams stay Flate) — same text operators, so
    extraction is byte-identical across every encoding.

    ``cid_font``: use a composite Type0 font with /Encoding /Identity-H
    instead of the simple Type1 font — strings in the content streams are
    hex 2-byte CIDs and a /ToUnicode CMap stream (bfrange for contiguous
    codepoint runs, bfchar for singletons) maps them back, so extracted
    text is byte-identical to the simple-font layout. Composable with
    ``compress`` (CMap FlateDecode'd), ``encrypt`` and ``objstm``.

    ``objstm``: emit the PDF 1.5+ compressed-object layout instead — every
    non-stream object (catalog, page tree, page dicts, font) is packed into
    one FlateDecode'd /Type /ObjStm, the trailer fields move into a
    /Type /XRef stream dict, and the file has NO ``trailer`` keyword.
    Content streams (and the /Encrypt dict, which must stay readable before
    the key exists) remain classic objects. Combined with ``encrypt``, the
    ObjStm stream itself is encrypted under its own object number — the
    deferred-root path in PdfDocument. Same text operators either way, so
    extracted text is byte-identical to the classic layout.

    Layout: letter MediaBox (612x792), 12pt lines, 14pt leading starting at
    y=720. ``two_column`` splits lines between x=72 and x=320 columns (the
    golden reading order is left column top-down then right column).

    ``encrypt``: standard-security-handler encryption via pdf_crypt —
    ``{"user_pw": str, "owner_pw": str, "v": 1|2|4}`` (v=1 -> RC4-40 /R 2,
    v=2 -> RC4-128 /R 3, v=4 -> AES-128-CBC /R 4 with /StdCF /CFM /AESV2).
    Stream bytes are stored crypt(filtered(content)): filters apply first,
    encryption is outermost, exactly what the parser inverts. AES IVs are
    derived from (id0, object number), so corpora stay pure functions of
    (seed, i). An empty ``user_pw`` produces a document that opens without
    a prompt (needs_pass False), the common real-world "owner-locked" case.
    """
    objects: List[bytes] = []

    def add(obj_body: bytes) -> int:
        objects.append(obj_body)
        return len(objects)

    n_pages = len(page_line_texts)
    # Object numbering: 1 catalog, 2 pages, then per page (page, content),
    # then font; the /Encrypt dict (if any) goes last.
    catalog_num = 1
    pages_num = 2
    page_nums = [3 + 2 * i for i in range(n_pages)]
    content_nums = [4 + 2 * i for i in range(n_pages)]
    font_num = 3 + 2 * n_pages
    # ``form_header``: each page's first two lines live in a Form XObject
    # (PDF 1.7 §8.10) invoked via ``/FmI Do`` — the reusable-letterhead
    # layout real corpora use. Form stream objects follow the font block.
    form_base = font_num + (2 if cid_font else 1)
    form_nums = [form_base + i for i in range(n_pages)] if form_header else []

    crypt = None
    if encrypt is not None:
        from .pdf_crypt import (
            compute_encryption_key,
            compute_o_entry,
            compute_u_entry,
            crypt_object_bytes,
            crypt_object_bytes_aes,
        )

        user_pw = encrypt["user_pw"].encode("latin-1")
        owner_pw = encrypt.get("owner_pw", "").encode("latin-1")
        v = int(encrypt.get("v", 1))
        r = {1: 2, 2: 3, 4: 4, 5: int(encrypt.get("r", 6))}[v]
        length_bits = {1: 40, 2: 128, 4: 128, 5: 256}[v]
        key_len = length_bits // 8
        p = -44  # print+extract denied; any value works, P feeds the key hash
        import hashlib as _hl

        id0 = _hl.md5(
            b"graft-fixture-id" + user_pw + owner_pw + bytes([v])
        ).digest()
        extra = {}
        if v == 5:
            from .pdf_crypt import crypt_object_bytes_aes256, make_v5_entries

            file_key = _hl.sha256(b"graft-v5-filekey" + id0).digest()
            ents = make_v5_entries(user_pw, owner_pw, file_key, id0, r, p)
            o_entry, u_entry = ents["o"], ents["u"]
            extra = {"ue": ents["ue"], "oe": ents["oe"], "perms": ents["perms"]}

            def _aes256_fn(key: bytes, num: int, gen: int, data: bytes) -> bytes:
                iv = _hl.md5(b"graft-iv" + id0 + bytes([num & 0xFF, gen & 0xFF])).digest()
                return crypt_object_bytes_aes256(key, data, iv)

            fn = _aes256_fn
        else:
            o_entry = compute_o_entry(owner_pw, user_pw, key_len, r)
            file_key = compute_encryption_key(user_pw, o_entry, p, id0, key_len, r)
            u_entry = compute_u_entry(file_key, id0, r)
            if v == 4:
                def _aes_fn(key: bytes, num: int, gen: int, data: bytes) -> bytes:
                    iv = _hl.md5(b"graft-iv" + id0 + bytes([num & 0xFF, gen & 0xFF])).digest()
                    return crypt_object_bytes_aes(key, num, gen, data, iv)

                fn = _aes_fn
            else:
                fn = crypt_object_bytes
        crypt = {
            "file_key": file_key, "o": o_entry, "u": u_entry, "p": p,
            "v": v, "r": r, "length_bits": length_bits, "id0": id0,
            "fn": fn, **extra,
        }

    cid_map = None
    if cid_font:
        charset = sorted({ch for texts in page_line_texts for t in texts for ch in t})
        cid_map = {ch: i + 1 for i, ch in enumerate(charset)}

    add(f"<< /Type /Catalog /Pages {pages_num} 0 R >>".encode())
    kids = " ".join(f"{p} 0 R" for p in page_nums)
    add(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())

    form_bodies: List[bytes] = []
    for i, texts in enumerate(page_line_texts):
        lines: List[Tuple[float, float, str]] = []
        if two_column:
            half = (len(texts) + 1) // 2
            for j, t in enumerate(texts[:half]):
                lines.append((72.0, 720.0 - 14.0 * j, t))
            for j, t in enumerate(texts[half:]):
                lines.append((330.0, 720.0 - 14.0 * j, t))
        else:
            for j, t in enumerate(texts):
                lines.append((72.0, 720.0 - 14.0 * j, t))
        xobj_clause = ""
        if form_header:
            head, lines = lines[:2], lines[2:]
            form_bodies.append(_page_content(head, use_tm, rng, cid_map))
            xobj_clause = f"/XObject << /Fm{i} {form_nums[i]} 0 R >> "
            content = f"/Fm{i} Do\n".encode() + _page_content(lines, use_tm, rng, cid_map)
        else:
            content = _page_content(lines, use_tm, rng, cid_map)
        filt = ""
        if compress == "lzw":
            content = _lzw_encode(content)
            filt = " /Filter /LZWDecode"
        elif compress == "rle":
            content = _rle_encode(content)
            filt = " /Filter /RunLengthDecode"
        elif compress == "a85":
            content = _a85_encode(content)
            filt = " /Filter /ASCII85Decode"
        elif compress:
            content = zlib.compress(content, 6)
            filt = " /Filter /FlateDecode"
        if crypt is not None:
            content = crypt["fn"](crypt["file_key"], content_nums[i], 0, content)
        add(
            f"<< /Type /Page /Parent {pages_num} 0 R /MediaBox [0 0 612 792] "
            f"/Contents {content_nums[i]} 0 R "
            f"/Resources << /Font << /F1 {font_num} 0 R >> {xobj_clause}>> >>".encode()
        )
        objects.append(
            f"<< /Length {len(content)}{filt} >>\nstream\n".encode() + content + b"\nendstream"
        )
    if cid_map is not None:
        tounicode_num = font_num + 1
        add(
            f"<< /Type /Font /Subtype /Type0 /BaseFont /SynthCID "
            f"/Encoding /Identity-H /ToUnicode {tounicode_num} 0 R >>".encode()
        )
        cmap_data = _tounicode_cmap(cid_map)
        cmap_filt = ""
        if compress:
            cmap_data = zlib.compress(cmap_data, 6)
            cmap_filt = " /Filter /FlateDecode"
        if crypt is not None:
            cmap_data = crypt["fn"](crypt["file_key"], tounicode_num, 0, cmap_data)
        objects.append(
            f"<< /Length {len(cmap_data)}{cmap_filt} >>\nstream\n".encode()
            + cmap_data + b"\nendstream"
        )
    else:
        add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    for i, body in enumerate(form_bodies):
        ffilt = ""
        if compress:
            body = zlib.compress(body, 6)
            ffilt = " /Filter /FlateDecode"
        if crypt is not None:
            body = crypt["fn"](crypt["file_key"], form_nums[i], 0, body)
        objects.append(
            (
                f"<< /Type /XObject /Subtype /Form /BBox [0 0 612 792] "
                f"/Length {len(body)}{ffilt} >>\nstream\n"
            ).encode() + body + b"\nendstream"
        )

    info_clause = ""
    if info is not None and crypt is None:
        # /Info document-information dictionary (§14.3.3). Emitted only for
        # non-encrypted docs: strings in encrypted documents are themselves
        # encrypted, which is out of the fixture subset.
        ent = " ".join(
            f"/{k} ({_pdf_escape(str(v))})" for k, v in sorted(info.items())
        )
        info_num = add(f"<< {ent} >>".encode())
        info_clause = f" /Info {info_num} 0 R"

    encrypt_clause = ""
    if crypt is not None:
        if crypt["v"] == 4:
            cf_clause = (
                "/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >> "
                "/StmF /StdCF /StrF /StdCF "
            )
        elif crypt["v"] == 5:
            cf_clause = (
                "/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> "
                "/StmF /StdCF /StrF /StdCF "
            )
        else:
            cf_clause = ""
        v5_clause = (
            f"/UE <{crypt['ue'].hex()}> /OE <{crypt['oe'].hex()}> "
            f"/Perms <{crypt['perms'].hex()}> "
            if crypt["v"] == 5 else ""
        )
        encrypt_num = add(
            (
                f"<< /Filter /Standard /V {crypt['v']} /R {crypt['r']} "
                f"/Length {crypt['length_bits']} {cf_clause}"
                f"/O <{crypt['o'].hex()}> /U <{crypt['u'].hex()}> {v5_clause}"
                f"/P {crypt['p']} >>"
            ).encode()
        )
        idhex = crypt["id0"].hex()
        encrypt_clause = f" /Encrypt {encrypt_num} 0 R /ID [<{idhex}> <{idhex}>]"

    if objstm:
        classic_nums = set(content_nums) | set(form_nums)
        if crypt is not None:
            classic_nums.add(encrypt_num)
        if cid_map is not None:
            classic_nums.add(font_num + 1)  # the /ToUnicode CMap stream
        packed = [
            (num, body)
            for num, body in enumerate(objects, start=1)
            if num not in classic_nums
        ]
        bodies = [body for _, body in packed]
        offs, pos = [], 0
        for b in bodies:
            offs.append(pos)
            pos += len(b) + 1  # one space between bodies
        header = (
            " ".join(f"{num} {off}" for (num, _), off in zip(packed, offs)) + "\n"
        ).encode()
        first = len(header)
        data = zlib.compress(header + b" ".join(bodies), 6)
        objstm_num = len(objects) + 1
        if crypt is not None:
            data = crypt["fn"](crypt["file_key"], objstm_num, 0, data)
        objstm_body = (
            f"<< /Type /ObjStm /N {len(packed)} /First {first} "
            f"/Length {len(data)} /Filter /FlateDecode >>\nstream\n"
        ).encode() + data + b"\nendstream"
        xref_num = objstm_num + 1
        size = xref_num + 1
        xref_entries = b"\x00" * (4 * size)  # entries unread by the parser
        xref_body = (
            f"<< /Type /XRef /Size {size} /Root {catalog_num} 0 R{encrypt_clause}{info_clause}"
            f" /W [1 2 1] /Index [0 {size}] /Length {len(xref_entries)} >>\nstream\n"
        ).encode() + xref_entries + b"\nendstream"
        out = bytearray(b"%PDF-1.5\n")
        for num, body in enumerate(objects, start=1):
            if num in classic_nums:
                out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
        out += f"{objstm_num} 0 obj\n".encode() + objstm_body + b"\nendobj\n"
        xref_pos = len(out)
        out += f"{xref_num} 0 obj\n".encode() + xref_body + b"\nendobj\n"
        out += f"startxref\n{xref_pos}\n%%EOF\n".encode()
        return bytes(out)

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root {catalog_num} 0 R{encrypt_clause}{info_clause} >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n".encode()
    )
    return bytes(out)


def append_incremental_update(pdf: bytes, page_index: int,
                              new_lines: List[str], rng: random.Random) -> bytes:
    """Append an incremental update (ISO 32000-1 §7.5.6) replacing one
    page's content stream: a new object with the SAME object number after
    the original ``%%EOF``, plus an update xref section and trailer with
    ``/Prev``. The live document is the appended version — parsers must
    resolve last-definition-wins. Valid for classic non-encrypted
    ``make_pdf`` output (content object numbers are ``4 + 2*page``);
    the replacement content is raw (uncompressed) single-column text."""
    content = _page_content(
        [(72.0, 720.0 - 14.0 * j, t) for j, t in enumerate(new_lines)],
        False, rng, None,
    )
    num = 4 + 2 * page_index
    obj = (
        f"{num} 0 obj\n<< /Length {len(content)} >>\nstream\n".encode()
        + content + b"\nendstream\nendobj\n"
    )
    offset = len(pdf) + 1
    tail = (
        f"xref\n{num} 1\n{offset:010d} 00000 n \n"
        f"trailer\n<< /Prev 0 >>\nstartxref\n{offset}\n%%EOF\n"
    )
    return pdf + b"\n" + obj + tail.encode()


def make_scanned_pdf(page_line_texts: List[List[str]], rng: random.Random,
                     psm_trap: bool = False) -> bytes:
    """Write a PDF whose pages carry their text ONLY as pixels — the
    scanned-document fixture for the OCR fallback ladder (P5/P6).

    Each page is one 8-bit /DeviceGray image XObject (FlateDecode) placed
    over the full MediaBox via ``q 612 0 0 792 0 0 cm /ImN Do Q``; there
    are no text operators and no fonts, so content-stream extraction
    yields "" and the page gate fails — exactly the scanned-page shape the
    reference falls back to tesseract on (core_pdf_processor.py:391-400).
    The image raster is 2 px/pt (1224x1584), matching the OCR ladder's 2x
    zoom (``Matrix(2, 2)``) so the page-raster blit is pixel-identical.

    ``psm_trap``: layout that defeats single-uniform-block segmentation —
    a short ``p. N`` header far above a uniformly spaced body, so a psm-6
    pass returns <10 chars and the enhanced ladder's ``--psm 3`` retry
    (core_pdf_processor.py:986-994) observably fires. The first line of
    ``page_line_texts[i]`` is the header; the rest are the body.
    """
    from .page_render import rasterize_page

    objects: List[bytes] = []

    def add(obj_body: bytes) -> int:
        objects.append(obj_body)
        return len(objects)

    n_pages = len(page_line_texts)
    catalog_num, pages_num = 1, 2
    page_nums = [3 + 3 * i for i in range(n_pages)]
    content_nums = [4 + 3 * i for i in range(n_pages)]
    image_nums = [5 + 3 * i for i in range(n_pages)]

    add(f"<< /Type /Catalog /Pages {pages_num} 0 R >>".encode())
    kids = " ".join(f"{p} 0 R" for p in page_nums)
    add(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())

    for i, texts in enumerate(page_line_texts):
        if psm_trap and texts:
            head, body = texts[:1], texts[1:]
            lines = [(72.0, 40.0, head[0])] + [
                (72.0, 200.0 + 14.0 * j, t) for j, t in enumerate(body)
            ]
        else:
            lines = [(72.0, 72.0 + 14.0 * j, t) for j, t in enumerate(texts)]
        fake_layout = {
            "width": 612.0,
            "height": 792.0,
            "blocks": [
                {
                    "bbox": [x, y, x + 6.0 * len(t), y + 12.0],
                    "lines": [
                        {
                            "bbox": [x, y, x + 6.0 * len(t), y + 12.0],
                            "spans": [
                                {
                                    "text": t,
                                    "bbox": [x, y, x + 6.0 * len(t), y + 12.0],
                                    "size": 12.0,
                                    "font": "F1",
                                    "flags": 0,
                                }
                            ],
                        }
                    ],
                }
                for (x, y, t) in lines
            ],
        }
        canvas = rasterize_page(fake_layout, scale=2.0)
        img_h, img_w = canvas.shape
        img_data = zlib.compress(canvas.tobytes(), 6)
        content = f"q 612 0 0 792 0 0 cm /Im{i} Do Q\n".encode()
        add(
            f"<< /Type /Page /Parent {pages_num} 0 R /MediaBox [0 0 612 792] "
            f"/Contents {content_nums[i]} 0 R "
            f"/Resources << /XObject << /Im{i} {image_nums[i]} 0 R >> >> >>".encode()
        )
        objects.append(
            f"<< /Length {len(content)} >>\nstream\n".encode()
            + content + b"\nendstream"
        )
        objects.append(
            (
                f"<< /Type /XObject /Subtype /Image /Width {img_w} "
                f"/Height {img_h} /ColorSpace /DeviceGray "
                f"/BitsPerComponent 8 /Filter /FlateDecode "
                f"/Length {len(img_data)} >>\nstream\n"
            ).encode() + img_data + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root {catalog_num} 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n".encode()
    )
    return bytes(out)


def make_malformed(rng: random.Random, variant: int) -> bytes:
    variant = variant % 4
    if variant == 0:
        return b"%PDF"  # truncated header -> sniffed as 'other'
    if variant == 1:
        # valid header, garbage body -> PdfParseError -> parse_failure
        return b"%PDF-1.4\n" + bytes(rng.getrandbits(8) for _ in range(256))
    if variant == 2:
        return bytes(rng.getrandbits(8) for _ in range(128))  # random bytes
    return b"<html><body><p>unclosed paragraph with enough words " + (
        " ".join(rng.choice(_VOCAB) for _ in range(60)).encode()
    )  # unclosed HTML — parser-tolerant


# --------------------------------------------------------------------------
# Row/corpus assembly
# --------------------------------------------------------------------------

GIANT_ROW_MOD = 1000
GIANT_ROW_RESIDUES = (7, 13)


def make_row(i: int, seed: int = 42) -> dict:
    """Build row ``i`` of the corpus (pure function of (seed, i))."""
    rng = _rng(seed, i)
    cat = i % 100
    lang = LANGS[i % len(LANGS)]
    slug = f"doc-{i:08d}"
    site = i % 17
    url = f"https://site{site}.example/{lang}/{slug}"
    ts = EPOCH_US + i * 37_000_000  # +37 s per row

    giant = (i % GIANT_ROW_MOD) in GIANT_ROW_RESIDUES

    if giant:
        # ~1.5 MiB clean article — exceeds the 1 MiB truncation guard.
        paras = make_paragraphs(rng, 2600, words_per_sentence=(8, 14), sentences=(5, 8))
        title = f"Giant document {i}"
        payload = make_article_html(title, paras, rng)
        text = "\n\n".join(paras)
    elif cat < 55:
        n_paras = rng.randint(4, 10)
        paras = make_paragraphs(rng, n_paras)
        # Charset fixtures: i%13==7 -> legacy windows-1252 page with a
        # declared meta charset and non-ASCII content (the decoder must
        # honor the declaration, not mojibake it through latin-1   — the
        # golden text carries the accents); i%13==3 -> UTF-8 BOM page (the
        # decoder must strip the BOM from the extracted text).
        if i % 13 == 7:
            paras = [p + " Café déjà vu — señal única." for p in paras]
            title = f"Article {i}: résumé"
            payload = make_article_html(title, paras, rng, charset="windows-1252")
        elif i % 13 == 3:
            title = f"Article {i}: {' '.join(rng.choice(_VOCAB) for _ in range(3))}"
            payload = make_article_html(title, paras, rng, bom=True)
        else:
            title = f"Article {i}: {' '.join(rng.choice(_VOCAB) for _ in range(3))}"
            payload = make_article_html(title, paras, rng)
        text = "\n\n".join(paras)
    elif cat < 65:
        paras = make_paragraphs(rng, rng.randint(2, 4))
        payload = make_linkfarm_html(rng, paras)
        text = "\n\n".join(paras)
    elif cat < 70:
        paras = make_paragraphs(rng, rng.randint(3, 6))
        title = f"Scripted {i}"
        payload = make_article_html(title, paras, rng, heavy_scripts=True)
        text = "\n\n".join(paras)
    elif cat < 75:
        payload = make_short_html(rng)
        text = ""
    elif cat < 80:
        payload = make_garbage_html(rng, clause=i % 5)
        text = ""
    elif cat < 95:
        n_pages = rng.randint(1, 8) if cat < 90 else rng.randint(1, 3)
        two_column = cat in (86, 87, 92)
        # Two-column lines must be narrower than the gutter distance
        # (x=72 -> x=330 at ~6 pt/char => <= ~40 chars per line).
        words = (3, 5) if two_column else (5, 9)
        pages = []
        for _ in range(n_pages):
            n_lines = rng.randint(24, 40)
            pages.append([_sentence(rng, rng.randint(*words)).strip() for _ in range(n_lines)])
        # Encrypted fixtures (standard security handler — pdf_crypt.py).
        # Passwords come from the engine's test-deployment book
        # (functions/passwords.py) so the default ExtractConfig opens them:
        #   cat 84: owner-locked, EMPTY user password -> opens transparently
        #   cat 91: per-site saved password (attempt 1), or the configured
        #           default password (attempt 2) on every third row
        #   cat 94: unknown password -> password_required failure, text ""
        from .passwords import DEFAULT_PASSWORD

        encrypt = None
        # RC4-40 /R2, RC4-128 /R3, AES-128 /V4 /R4, AES-256 /V5 /R6
        enc_v = (1, 2, 4, 5)[i % 4]
        if cat == 84:
            encrypt = {"user_pw": "", "owner_pw": f"owner-{site}", "v": enc_v}
        elif cat == 91:
            pw = DEFAULT_PASSWORD if i % 3 == 0 else f"pw-{site}"
            encrypt = {"user_pw": pw, "owner_pw": f"owner-{site}", "v": enc_v}
        elif cat == 94:
            encrypt = {"user_pw": f"secret-{i}", "owner_pw": f"hidden-{i}", "v": enc_v}
        payload = make_pdf(
            pages,
            rng,
            # Filter rotation over the compressed half: mostly Flate, with
            # LZWDecode (i%8==0), RunLengthDecode (i%8==4) and
            # ASCII85Decode (i%16==6) slices — extracted text is
            # byte-identical across filters, so goldens and the corpus
            # content hash are unchanged by the re-encoding.
            compress=(
                False if i % 2 else
                ("lzw" if i % 8 == 0 else
                 ("rle" if i % 8 == 4 else
                  ("a85" if i % 16 == 6 else True)))
            ),
            two_column=two_column,
            use_tm=(cat in (88, 89, 93)),
            encrypt=encrypt,
            # ~1 in 5 PDFs (incl. encrypted ones) use the PDF 1.5+
            # compressed-object layout, and ~1 in 7 a composite
            # Type0/Identity-H font with a /ToUnicode CMap; text goldens
            # are unchanged by either re-encoding.
            objstm=(i % 5 == 1),
            cid_font=(i % 7 == 2),
        )
        if encrypt is None and i % 7 != 2 and i % 11 == 5:
            # Incrementally-updated document (§7.5.6): page 0's content is
            # replaced by an appended object with the same number — the
            # golden text is the UPDATED page (last-definition-wins).
            # Excluded: encrypted docs (replacement would need the object
            # crypt) and CID-font docs (replacement uses literal strings).
            new_lines = [
                _sentence(rng, rng.randint(*words)).strip()
                for _ in range(rng.randint(6, 14))
            ]
            payload = append_incremental_update(payload, 0, new_lines, rng)
            pages[0] = new_lines
        text = "" if cat == 94 else "\n\n".join("\n".join(p) for p in pages)
    else:
        payload = make_malformed(rng, variant=i)
        text = ""

    return {"url": url, "warc_ts": ts, "html": payload, "text": text, "lang": lang}


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def gen_pages_table(n_rows: int, seed: int = 42, start: int = 0) -> pa.Table:
    """Materialize rows [start, start+n_rows) as an Arrow table."""
    rows = [make_row(i, seed) for i in range(start, start + n_rows)]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def write_pages_parquet(path: str, n_rows: int, seed: int = 42, rows_per_file: int = 10_000) -> None:
    """Write the corpus as a directory of Parquet shards (resumable layout:
    many part files, never one giant file)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    start = 0
    part = 0
    while start < n_rows:
        n = min(rows_per_file, n_rows - start)
        pq.write_table(
            gen_pages_table(n, seed=seed, start=start),
            os.path.join(path, f"part-{part:05d}.parquet"),
        )
        start += n
        part += 1


def make_scanned_row(i: int, seed: int = 42) -> dict:
    """Row ``i`` of the scanned-document corpus (pure function of
    (seed, i); PAGES_SCHEMA, so the extraction pipeline runs unchanged).

    ``html`` is a make_scanned_pdf payload — text exists only as pixels;
    ``text`` is the planted golden: the exact combined document text the
    OCR ladder should recover, pre-rendered in the combine_pages framing
    (``--- PAGE N ---``) so the eval is a straight string equality against
    the pipeline's doc_text. Every third document is a psm-trap layout
    (short header + distant body: per-page expected text is
    ``header\\n\\nbody`` — the psm-3 two-block segmentation)."""
    from .render import combine_pages

    rng = _rng(seed + 1_000_003, i)  # stream disjoint from make_row's
    lang = LANGS[i % len(LANGS)]
    url = f"https://scan{i % 11}.example/{lang}/scan-{i:08d}"
    ts = EPOCH_US + i * 41_000_000
    trap = i % 3 == 0
    n_pages = 1 + i % 3
    page_lines: List[List[str]] = []
    expected: List[Tuple[int, str]] = []
    for p in range(n_pages):
        n_lines = rng.randint(6, 12)
        lines = [
            " ".join(_sentence(rng, rng.randint(4, 8)).split())
            for _ in range(n_lines)
        ]
        if trap:
            header = f"p. {p + 1}"
            page_lines.append([header] + lines)
            expected.append((p + 1, header + "\n\n" + "\n".join(lines)))
        else:
            page_lines.append(lines)
            expected.append((p + 1, "\n".join(lines)))
    payload = make_scanned_pdf(page_lines, rng, psm_trap=trap)
    return {
        "url": url,
        "warc_ts": ts,
        "html": payload,
        "text": combine_pages(expected),
        "lang": lang,
    }


def gen_scanned_table(n_rows: int, seed: int = 42, start: int = 0) -> pa.Table:
    rows = [make_scanned_row(i, seed) for i in range(start, start + n_rows)]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def write_scanned_parquet(path: str, n_rows: int, seed: int = 42,
                          rows_per_file: int = 500) -> None:
    """Scanned corpus as a directory of Parquet shards (image payloads are
    ~15-40 KiB each after Flate, so shards stay small)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    start, part = 0, 0
    while start < n_rows:
        n = min(rows_per_file, n_rows - start)
        pq.write_table(
            gen_scanned_table(n, seed=seed, start=start),
            os.path.join(path, f"part-{part:05d}.parquet"),
        )
        start += n
        part += 1


def make_table_page(doc_id: int, lang: str, source: str, n_chars: int) -> bytes:
    """Deterministic table-bearing page derived ONLY from the document's
    columns — the fixture for the structured-table extractor
    (functions/html_tables.py). Table 0 (every doc): <th> header (k, v) and
    1 + doc_id%4 data rows (k{i}, n_chars+i). Table 1 (doc_id%5==0): header
    (lang, src), one row (lang, source). A decoy table inside <script> must
    be dropped, and the nav boilerplate must not leak into any cell."""
    rows0 = "".join(
        f"<tr><td>k{i}</td><td>{n_chars + i}</td></tr>"
        for i in range(1 + doc_id % 4)
    )
    t0 = f"<table><tr><th>k</th><th>v</th></tr>{rows0}</table>"
    t1 = (
        f"<table><tr><th>lang</th><th>src</th></tr>"
        f"<tr><td>{lang}</td><td>{source}</td></tr></table>"
        if doc_id % 5 == 0
        else ""
    )
    decoy = "<script>var x = '<table><tr><td>NOPE</td></tr></table>';</script>"
    nav = '<nav><a href="/a">Home</a> <a href="/b">About</a></nav>'
    html = (
        f"<html><head><title>doc {doc_id}</title>{decoy}</head>"
        f"<body><header>{nav}</header><main><h1>Doc {doc_id}</h1>{t0}{t1}</main>"
        f"<footer><p>footer boilerplate</p></footer></body></html>"
    )
    return html.encode("utf-8")


def make_link_page(doc_id: int, source: str, lang: str) -> tuple[bytes, str]:
    """Deterministic outlink-bearing page derived ONLY from the document's
    columns — the fixture for the web-graph extractor (functions/links.py).
    Returns (html, base_url). Every resolution branch is exercised:
    absolute cross-site, protocol-relative, root-relative, ``..`` relative,
    a nofollow ad link (even doc_ids), plus hrefs that MUST be dropped
    (javascript:, mailto:, bare fragment) and a <script> decoy link. Meta
    robots is noindex,nofollow for doc_id%7==0 pages."""
    base_url = f"https://{source}.example.com/d/{doc_id}/index.html"
    robots = "noindex,nofollow" if doc_id % 7 == 0 else "index,follow"
    # doc_id%6==3 pages carry a <base href> that re-roots RELATIVE links
    # onto another host (absolute and protocol-relative links unaffected;
    # the page's own host — the graph source — is unchanged per spec).
    base_tag = (
        f'<base href="https://base{doc_id % 4}.example.org/dir/sub/">'
        if doc_id % 6 == 3 else ""
    )
    links = [
        f'<a href="https://src{(doc_id * 7 + 1) % 20}.example.net/x/{doc_id % 9}">ref {doc_id % 9}</a>',
        f'<a href="//cdn.example.org/lib/{doc_id % 4}">cdn <b>{doc_id % 4}</b></a>',
        f'<a href="/local/{doc_id % 5}">local {doc_id % 5}</a>',
        f'<a href="../up/{doc_id % 3}">up {doc_id % 3}</a>',
    ]
    if doc_id % 2 == 0:
        links.append(
            f'<a href="http://ads.example.com/click?id={doc_id % 11}" rel="nofollow">ad</a>'
        )
    dropped = (
        '<a href="javascript:void(0)">js</a>'
        '<a href="mailto:x@example.com">mail</a>'
        '<a href="#top">top</a>'
    )
    decoy = "<script>var s = '<a href=\"https://evil.example/x\">no</a>';</script>"
    html = (
        f'<html><head><title>links {doc_id}</title>{base_tag}'
        f'<meta name="robots" content="{robots}">{decoy}</head>'
        f"<body><p>{lang} page</p>{''.join(links)}{dropped}</body></html>"
    )
    return html.encode("utf-8"), base_url


def make_meta_page(doc_id: int, source: str, lang: str, n_chars: int) -> tuple[bytes, str]:
    """Deterministic metadata-bearing page from the document's own columns —
    fixture for functions/meta.py. Branch coverage: og:title present for
    doc_id%3!=0, description for doc_id%4!=0, canonical <link> (RELATIVE,
    exercising resolution) for doc_id%2==0 with a /5 bucket so ~5 even docs
    share one canonical target (the dedup_canonical fixture); a second
    <title> and a <script> decoy title must be ignored."""
    og = (
        f'<meta property="og:title" content="OG {doc_id}">'
        if doc_id % 3 != 0 else ""
    )
    desc = (
        f'<meta name="description" content="{lang} description {n_chars}">'
        if doc_id % 4 != 0 else ""
    )
    # even docs: RELATIVE canonical (exercises resolution; self-host target,
    # unique per page with the testdata's doc_id%20 source layout); odd
    # docs: ABSOLUTE cross-site canonical shared by the 5 odd ids of each
    # /10 bucket — the dedup_canonical duplicate groups.
    canon = (
        f'<link rel="canonical" href="/canon/{doc_id // 5}">'
        if doc_id % 2 == 0
        else f'<link rel="canonical" href="https://archive.example.org/c/{doc_id // 10}">'
    )
    decoy = "<script>var t = '<title>NOPE</title>';</script>"
    html = (
        f"<html><head><title>Doc {doc_id} · {source}</title>{og}{desc}{canon}"
        f"{decoy}<title>second ignored</title></head>"
        f"<body><p>{lang} body</p></body></html>"
    )
    return html.encode("utf-8"), f"https://{source}.example.com/p/{doc_id}"


def make_jsonld_page(doc_id: int, source: str, lang: str, n_chars: int) -> tuple[bytes, str]:
    """Deterministic JSON-LD-bearing page from the document's own columns —
    fixture for functions/structured.py. Branch coverage:

    - Article block on every doc: headline ``Doc {doc_id}``, wordCount
      ``n_chars`` — with a TRAILING COMMA for doc_id%7==0 (the sanitizer
      must salvage it to the identical values) and a missing-comma
      syntax break for doc_id%13==0 that yields NO Article entity
      (%7 loses to %13 when both divide): the sanitizer's quote-escape
      repair produces a valid object whose ``@type`` key is swallowed
      into the preceding ``@context`` value — an untyped node the
      extractor skips. ``@context`` first is load-bearing for that.
    - @graph block for doc_id%5==0: Organization ``Org {source}`` +
      WebPage ``Page {doc_id}`` (graph flattening).
    - Decoys that must contribute nothing: a text/javascript script and an
      untyped script both carrying JSON-looking source.
    """
    if doc_id % 13 == 0:
        # missing comma between members: json.loads fails; the sanitizer's
        # repair leaves a valid-but-untyped node -> no entity row
        article = (
            f'{{"@context": "https://schema.org" "@type": "Article", '
            f'"headline": "Doc {doc_id}", "wordCount": {n_chars}}}'
        )
    elif doc_id % 7 == 0:
        article = (
            f'{{"@context": "https://schema.org", "@type": "Article", '
            f'"headline": "Doc {doc_id}", "wordCount": {n_chars},}}'
        )
    else:
        article = (
            f'{{"@context": "https://schema.org", "@type": "Article", '
            f'"headline": "Doc {doc_id}", "wordCount": {n_chars}}}'
        )
    graph = (
        f'<script type="application/ld+json">{{"@context": "https://schema.org", '
        f'"@graph": [{{"@type": "Organization", "name": "Org {source}"}}, '
        f'{{"@type": "WebPage", "name": "Page {doc_id}"}}]}}</script>'
        if doc_id % 5 == 0 else ""
    )
    decoys = (
        '<script type="text/javascript">var x = {"@type": "Movie", "name": "NOPE"};</script>'
        '<script>var y = {"@type": "Book", "name": "NOPE"};</script>'
    )
    html = (
        f"<html><head><title>ld {doc_id}</title>"
        f'<script type="application/ld+json">{article}</script>'
        f"{graph}{decoys}</head>"
        f"<body><p>{lang} article body</p></body></html>"
    )
    return html.encode("utf-8"), f"https://{source}.example.com/a/{doc_id}"


FEED_EPOCH_BASE = 1_600_000_000  # fixed UTC origin for feed timestamps


def make_feed_page(doc_id: int, source: str, lang: str) -> tuple[bytes, str]:
    """Deterministic RSS/Atom feed document from the document's own columns —
    fixture for functions/feeds.py. Branch coverage:

    - doc_id%2==0 -> RSS 2.0 (RFC 822 pubDates); odd -> Atom (ISO 8601
      ``updated``, namespaced tags, rel="self" decoy link that must lose to
      the rel-less alternate).
    - 1 + doc_id%3 items; item i: title ``Item {doc_id}-{i}``, link
      ``https://{source}.example.com/post/{doc_id}/{i}``, timestamp epoch
      ``FEED_EPOCH_BASE + doc_id*3600 + i*60``.
    - doc_id%11==0 -> truncated XML (no closing root tag): malformed,
      parse_feed returns None, no rows.
    - A commented-out decoy item that ElementTree must drop.
    """
    from datetime import datetime, timezone
    from email.utils import format_datetime

    url = f"https://{source}.example.com/feed/{doc_id}.xml"
    n_items = 1 + doc_id % 3
    stamps = [
        datetime.fromtimestamp(
            FEED_EPOCH_BASE + doc_id * 3600 + i * 60, tz=timezone.utc
        )
        for i in range(n_items)
    ]
    title = f"Feed {source} {doc_id}"
    if doc_id % 2 == 0:
        items = "".join(
            f"<item><title>Item {doc_id}-{i}</title>"
            f"<link>https://{source}.example.com/post/{doc_id}/{i}</link>"
            f"<pubDate>{format_datetime(stamps[i])}</pubDate></item>"
            for i in range(n_items)
        )
        decoy = "<!-- <item><title>NOPE</title></item> -->"
        body = (
            f'<?xml version="1.0" encoding="UTF-8"?>\n'
            f'<rss version="2.0"><channel><title>{title}</title>'
            f"<language>{lang}</language>{decoy}{items}</channel></rss>"
        )
    else:
        entries = "".join(
            f"<entry><title>Item {doc_id}-{i}</title>"
            f'<link rel="self" href="https://{source}.example.com/feed/{doc_id}.xml"/>'
            f'<link href="https://{source}.example.com/post/{doc_id}/{i}"/>'
            f"<updated>{stamps[i].isoformat().replace('+00:00', 'Z')}</updated></entry>"
            for i in range(n_items)
        )
        decoy = "<!-- <entry><title>NOPE</title></entry> -->"
        body = (
            f'<?xml version="1.0" encoding="UTF-8"?>\n'
            f'<feed xmlns="http://www.w3.org/2005/Atom"><title>{title}</title>'
            f"{decoy}{entries}</feed>"
        )
    if doc_id % 11 == 0:
        body = body[: len(body) // 2]  # truncated: malformed XML
    return body.encode("utf-8"), url


def make_pdf_link_doc(doc_id: int, source: str) -> tuple[bytes, str]:
    """Deterministic PDF with URI link annotations — fixture for
    PdfDocument.links() (the PDF twin of the outlink extractor). Branch
    coverage: 2 + doc_id%3 external URI links (the FIRST via an indirect
    /A action object, the rest inline), plus decoys that must contribute
    nothing: a /Square annotation and a /Link whose action is an internal
    /GoTo. One content line keeps the page a valid text page."""
    n_links = 2 + doc_id % 3
    uris = [
        f"https://ref{(doc_id * 5 + i) % 17}.example.net/p/{doc_id % 9}/{i}"
        for i in range(n_links)
    ]
    url = f"https://{source}.example.com/pdf/{doc_id}"
    content = f"BT /F1 12 Tf 72 720 Td (Document {doc_id} with links) Tj ET".encode()

    objs = []
    annot_refs = []
    next_num = 10
    # indirect action for link 0
    objs.append(
        f"{next_num} 0 obj << /Type /Action /S /URI /URI ({uris[0]}) >> endobj\n".encode()
    )
    action_ref = next_num
    next_num += 1
    objs.append(
        f"{next_num} 0 obj << /Type /Annot /Subtype /Link "
        f"/Rect [72 700 200 712] /A {action_ref} 0 R >> endobj\n".encode()
    )
    annot_refs.append(next_num)
    next_num += 1
    for uri in uris[1:]:
        objs.append(
            f"{next_num} 0 obj << /Type /Annot /Subtype /Link "
            f"/Rect [72 680 200 692] /A << /Type /Action /S /URI "
            f"/URI ({uri}) >> >> endobj\n".encode()
        )
        annot_refs.append(next_num)
        next_num += 1
    # decoys
    objs.append(
        f"{next_num} 0 obj << /Type /Annot /Subtype /Square "
        f"/Rect [0 0 10 10] >> endobj\n".encode()
    )
    annot_refs.append(next_num)
    next_num += 1
    objs.append(
        f"{next_num} 0 obj << /Type /Annot /Subtype /Link "
        f"/Rect [0 0 10 10] /A << /Type /Action /S /GoTo /D (page2) >> "
        f">> endobj\n".encode()
    )
    annot_refs.append(next_num)

    annots = " ".join(f"{n} 0 R" for n in annot_refs)
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        + (
            f"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents 4 0 R /Annots [ {annots} ] "
            f"/Resources << /Font << /F1 5 0 R >> >> >> endobj\n"
        ).encode()
        + b"4 0 obj << /Length " + str(len(content)).encode() + b" >>\n"
        b"stream\n" + content + b"\nendstream endobj\n"
        b"5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n"
        + b"".join(objs)
        + b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )
    return pdf, url


def make_image_page(doc_id: int, source: str, lang: str) -> tuple[bytes, str]:
    """Deterministic image-bearing page — fixture for the image-alt pair
    extractor (functions/links.extract_image_alts). Branch coverage:
    RELATIVE src resolved through a <base href> for doc_id%6==3, absolute
    cross-host src, root-relative src; drops that must contribute nothing:
    missing alt, empty (decorative) alt, a data: URI, and a <script>
    decoy img."""
    base_url = f"https://{source}.example.com/g/{doc_id}/index.html"
    base_tag = (
        f'<base href="https://img{doc_id % 4}.example.org/cdn/">'
        if doc_id % 6 == 3 else ""
    )
    imgs = [
        f'<img src="pics/{doc_id % 7}.jpg" alt="{lang} photo {doc_id % 7}">',
        f'<img src="https://media.example.net/m/{doc_id % 5}.png" '
        f'alt="Figure {doc_id % 5}">',
        f'<img src="/static/logo{doc_id % 3}.gif" alt="Logo {doc_id % 3}">',
    ]
    drops = (
        '<img src="plain.jpg">'                       # no alt
        '<img src="deco.jpg" alt="">'                  # decorative
        '<img src="data:image/gif;base64,R0lGOD" alt="inline">'  # data URI
    )
    decoy = "<script>var i = '<img src=\"x.jpg\" alt=\"NOPE\">';</script>"
    html = (
        f"<html><head><title>gallery {doc_id}</title>{base_tag}{decoy}</head>"
        f"<body><p>{lang} gallery</p>{''.join(imgs)}{drops}</body></html>"
    )
    return html.encode("utf-8"), base_url


def make_hreflang_page(doc_id: int, source: str, lang: str) -> tuple[bytes, str]:
    """Deterministic hreflang-bearing page — fixture for the alternate-
    language extractor. Cluster structure: docs sharing doc_id//4 form one
    translation set; each page lists all 3 language variants (en/de/fr,
    RELATIVE hrefs — exercising resolution) plus an x-default (absolute).
    Drops: a stylesheet <link>, an alternate WITHOUT hreflang (an RSS
    autodiscovery link), and a <script> decoy."""
    base_url = f"https://{source}.example.com/t/{doc_id}"
    cluster = doc_id // 4
    alts = "".join(
        f'<link rel="alternate" hreflang="{lg}" href="/i18n/{cluster}/{lg}">'
        for lg in ("en", "de", "fr")
    )
    xdef = (
        f'<link rel="alternate" hreflang="x-default" '
        f'href="https://www.example.com/i18n/{cluster}">'
    )
    drops = (
        '<link rel="stylesheet" href="/style.css">'
        '<link rel="alternate" type="application/rss+xml" href="/feed.xml">'
    )
    decoy = ("<script>var l = '<link rel=\"alternate\" hreflang=\"zz\" "
             "href=\"/no\">';</script>")
    html = (
        f"<html><head><title>t {doc_id}</title>{alts}{xdef}{drops}{decoy}</head>"
        f"<body><p>{lang} translated page</p></body></html>"
    )
    return html.encode("utf-8"), base_url


def make_pdf_outline_doc(doc_id: int, source: str) -> tuple[bytes, str]:
    """Deterministic PDF with a bookmark tree — fixture for
    PdfDocument.outline(). Structure: 1 + doc_id%3 top-level sections
    ("Section {doc_id}-{k}"), the FIRST with two children
    ("Sub {doc_id}-0-{j}"); one content line keeps the page valid."""
    n_top = 1 + doc_id % 3
    url = f"https://{source}.example.com/book/{doc_id}"
    content = f"BT /F1 12 Tf 72 720 Td (Book {doc_id}) Tj ET".encode()

    objs = []
    # outline item numbering: 10 = /Outlines root; tops 11..; subs 21, 22
    tops = list(range(11, 11 + n_top))
    header = f"10 0 obj << /Type /Outlines /First {tops[0]} 0 R /Last {tops[-1]} 0 R >> endobj\n"
    objs.append(header.encode())
    for k, num in enumerate(tops):
        parts = [f"/Title (Section {doc_id}-{k})", "/Parent 10 0 R"]
        if k + 1 < n_top:
            parts.append(f"/Next {tops[k + 1]} 0 R")
        if k == 0:
            parts.append("/First 21 0 R /Last 22 0 R /Count 2")
        objs.append(f"{num} 0 obj << {' '.join(parts)} >> endobj\n".encode())
    objs.append(
        f"21 0 obj << /Title (Sub {doc_id}-0-0) /Parent 11 0 R /Next 22 0 R >> endobj\n".encode()
    )
    objs.append(
        f"22 0 obj << /Title (Sub {doc_id}-0-1) /Parent 11 0 R >> endobj\n".encode()
    )
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R /Outlines 10 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >> endobj\n"
        b"4 0 obj << /Length " + str(len(content)).encode() + b" >>\n"
        b"stream\n" + content + b"\nendstream endobj\n"
        b"5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n"
        + b"".join(objs)
        + b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )
    return pdf, url


def make_microdata_page(doc_id: int, source: str, lang: str, n_chars: int) -> tuple[bytes, str]:
    """Deterministic microdata-bearing page — fixture for
    structured.extract_microdata. One Product entity per page (name, img
    image, meta sku, time released) with a NESTED Offer entity (price) for
    doc_id%3==0; drops: an itemprop outside any scope, an empty-value
    meta, and a <script> decoy."""
    url = f"https://{source}.example.com/shop/{doc_id}"
    offer = (
        f'<div itemscope itemtype="https://schema.org/Offer">'
        f'<span itemprop="price">{doc_id % 90 + 10}.{doc_id % 100:02d}</span></div>'
        if doc_id % 3 == 0 else ""
    )
    html = (
        f"<html><head><title>shop {doc_id}</title>"
        "<script>var m = '<span itemprop=\"name\">NOPE</span>';</script></head>"
        f"<body>"
        f'<div itemscope itemtype="https://schema.org/Product">'
        f'<span itemprop="name">Product {doc_id} ({lang})</span>'
        f'<img itemprop="image" src="/img/{doc_id % 8}.jpg">'
        f'<meta itemprop="sku" content="SKU-{source}-{doc_id}">'
        f"{offer}"
        f'<time itemprop="released" datetime="2024-01-{1 + doc_id % 28:02d}">x</time>'
        f'<meta itemprop="empty" content="">'
        f"</div>"
        f'<span itemprop="orphan">{n_chars}</span>'
        f"</body></html>"
    )
    return html.encode("utf-8"), url


def make_feed_discovery_page(doc_id: int, source: str, lang: str) -> tuple[bytes, str]:
    """Deterministic page with feed-autodiscovery links — fixture for
    meta.discover_feeds. Every page advertises an RSS feed (relative
    href); doc_id%4==0 pages also an Atom feed (absolute, titled); drops:
    an hreflang alternate, a stylesheet, and a text/html alternate."""
    url = f"https://{source}.example.com/blog/{doc_id}"
    atom = (
        f'<link rel="alternate" type="application/atom+xml" '
        f'href="https://feeds.example.net/{source}/atom.xml" '
        f'title="Atom feed for {source}">'
        if doc_id % 4 == 0 else ""
    )
    drops = (
        f'<link rel="alternate" hreflang="de" href="/de/{doc_id}">'
        '<link rel="stylesheet" href="/s.css">'
        f'<link rel="alternate" type="text/html" href="/m/{doc_id}">'
    )
    html = (
        f"<html><head><title>blog {doc_id}</title>"
        f'<link rel="alternate" type="application/rss+xml" href="/feed/{doc_id % 5}.xml">'
        f"{atom}{drops}</head><body><p>{lang} post</p></body></html>"
    )
    return html.encode("utf-8"), url


def make_rdfa_page(doc_id: int, source: str, lang: str) -> tuple[bytes, str]:
    """Deterministic RDFa-Lite-bearing page — fixture for
    structured.extract_rdfa. One Article entity per page (name text,
    datePublished datetime, image src, wordCount content) under a body
    vocab; doc_id%3==0 pages nest a Person entity (reporter name); a CURIE
    property (dc:subject) follows the nested scope, back on the Article;
    drops: a chained property on the typeof tag, an empty-value meta, an
    out-of-scope property, and a <script> decoy."""
    url = f"https://{source}.example.com/news/{doc_id}"
    person = (
        f'<span typeof="Person"><span property="name">'
        f"Reporter {doc_id % 10}</span></span>"
        if doc_id % 3 == 0 else ""
    )
    html = (
        f"<html><head><title>news {doc_id}</title>"
        "<script>var r = '<span property=\"name\">NOPE</span>';</script></head>"
        f'<body vocab="https://schema.org/">'
        f'<article typeof="Article" property="chained">'
        f'<h1 property="name">Story {doc_id} ({lang})</h1>'
        f'<time property="datePublished" '
        f'datetime="2024-{1 + doc_id % 12:02d}-{1 + doc_id % 28:02d}">d</time>'
        f'<img property="image" src="/img/{doc_id % 8}.jpg">'
        f'<meta property="wordCount" content="{100 + doc_id % 900}">'
        f"{person}"
        f'<span property="dc:subject">beat-{doc_id % 5}</span>'
        f'<meta property="empty" content="">'
        f"</article>"
        f'<span property="orphan">{lang}</span>'
        f"</body></html>"
    )
    return html.encode("utf-8"), url


def make_paginated_page(doc_id: int, source: str, lang: str) -> tuple[bytes, str]:
    """Deterministic paginated-article page — fixture for the rel=next/prev
    extractor. Articles are 4-page series WITHIN one host: docs sharing
    (source, doc_id//80) form one series at position (doc_id%80)//20+1
    (source is periodic in doc_id with period 20, so the four members
    share a host and the chain key is assemblable). The corpus tail
    truncates the last series of each host to fewer pages — exactly the
    incomplete-chain structure a recrawl scheduler queues. Each page links
    rel=next (pos<4) and rel=prev (pos>1) with absolute-path hrefs.
    Drops: a stylesheet link, an empty-href next, and a <script> decoy."""
    series, pos = doc_id // 80, (doc_id % 80) // 20 + 1
    url = f"https://{source}.example.com/art/{series}?page={pos}"
    nxt = (
        f'<link rel="next" href="/art/{series}?page={pos + 1}">'
        if pos < 4 else ""
    )
    prv = (
        f'<link rel="prev" href="/art/{series}?page={pos - 1}">'
        if pos > 1 else ""
    )
    drops = (
        '<link rel="stylesheet" href="/s.css">'
        '<link rel="next" href="">'
        "<script>var p = '<link rel=\"next\" href=\"/no\">';</script>"
    )
    html = (
        f"<html><head><title>art {series} p{pos}</title>{nxt}{prv}{drops}</head>"
        f"<body><p>{lang} page {pos} of series {series}</p></body></html>"
    )
    return html.encode("utf-8"), url


def make_status_page(doc_id: int, source: str, lang: str) -> tuple[bytes, str]:
    """Deterministic indexability/status fixture page — for
    functions/meta.py's page_status. Branch coverage: robots meta on
    doc_id%6 in {1: noindex, 3: nofollow, 5: BOTH via case/space variant
    'NOINDEX,NOFOLLOW'}; soft-404 content on doc_id%9==4 (404 TITLE, thin
    body) and doc_id%9==7 (healthy title, thin body with an error phrase);
    everything else a healthy page whose body is long enough to clear the
    thin-page gate."""
    robots = {
        1: '<meta name="robots" content="noindex, follow">',
        3: '<meta name="robots" content="index, nofollow">',
        5: '<meta name="ROBOTS" content="NOINDEX,NOFOLLOW">',
    }.get(doc_id % 6, "")
    m = doc_id % 9
    if m == 4:
        title = f"404 Not Found - {source}"
        body = "The page you requested could not be found."
    elif m == 7:
        title = f"Doc {doc_id} - {source}"
        body = "Sorry, this page does not exist or has been removed."
    else:
        title = f"Doc {doc_id} - {source}"
        body = f"{lang} content paragraph for document {doc_id}. " * 5
    html = (
        f"<html><head><title>{title}</title>{robots}"
        f"<script>var x = 'page not found decoy';</script></head>"
        f"<body><p>{body}</p></body></html>"
    )
    return html.encode("utf-8"), f"https://{source}.example.com/s/{doc_id}"


def make_license_page(doc_id: int, source: str) -> str:
    """Deterministic page-footer text for license detection
    (functions/quality.py detect_license). doc_id%5 selects: 0 cc-by,
    1 cc-by-nc, 2 cc-by-nd, 3 mit, 4 no declaration."""
    footer = {
        0: "Licensed under the Creative Commons Attribution 4.0 License.",
        1: "Licensed under the Creative Commons Attribution-NonCommercial 4.0 License.",
        2: "Licensed under the Creative Commons Attribution-NoDerivatives 4.0 License.",
        3: "Released under the MIT License.",
    }.get(doc_id % 5, "All rights reserved.")
    return f"Article {doc_id} from {source}.\n\n{footer}\n"


def make_social_page(doc_id: int, source: str, lang: str) -> tuple[bytes, str]:
    """Deterministic social-card fixture page (functions/meta.py
    extract_social_card). Branches: og:image RELATIVE for doc_id%2==0
    (exercises resolution) else absent; og:type article/website by %3
    (absent on %3==2); twitter:card summary vs summary_large_image by %4
    (absent on %4==3); twitter:site for %5!=0; plus a decoy og:image
    inside a script."""
    parts = []
    if doc_id % 2 == 0:
        parts.append(f'<meta property="og:image" content="/img/{doc_id % 9}.jpg">')
    if doc_id % 3 == 0:
        parts.append('<meta property="og:type" content="article">')
    elif doc_id % 3 == 1:
        parts.append('<meta property="og:type" content="website">')
    if doc_id % 4 == 0:
        parts.append('<meta name="twitter:card" content="summary">')
    elif doc_id % 4 in (1, 2):
        parts.append('<meta name="twitter:card" content="summary_large_image">')
    if doc_id % 5 != 0:
        parts.append(f'<meta name="twitter:site" content="@{source}">')
    decoy = "<script>var m = '<meta property=\"og:image\" content=\"NOPE\">';</script>"
    html = (
        f"<html><head><title>S{doc_id}</title>{''.join(parts)}{decoy}</head>"
        f"<body><p>{lang} social body</p></body></html>"
    )
    return html.encode("utf-8"), f"https://{source}.example.com/sp/{doc_id}"


def make_nav_page(doc_id: int, source: str) -> tuple[bytes, str]:
    """Deterministic redirect/form fixture page. Branches: meta refresh on
    doc_id%4==1 (delay doc_id%7, RELATIVE target) and %4==3 (bare reload,
    NO url -> not a redirect); a search form on doc_id%3!=0 (GET, q +
    lang fields) and a POST login form on doc_id%5==0 (user/pass);
    refresh decoy inside a script."""
    parts = []
    if doc_id % 4 == 1:
        parts.append(
            f'<meta http-equiv="refresh" content="{doc_id % 7}; url=/moved/{doc_id // 4}">'
        )
    elif doc_id % 4 == 3:
        parts.append('<meta http-equiv="Refresh" content="5">')
    body = []
    if doc_id % 3 != 0:
        body.append(
            '<form action="/search" method="get">'
            '<input name="q"><select name="lang"></select></form>'
        )
    if doc_id % 5 == 0:
        body.append(
            f'<form action="https://auth.example.org/login" method="POST">'
            '<input name="user"><input name="pass" type="password">'
            '<input type="submit"></form>'
        )
    decoy = "<script>var s='<meta http-equiv=\"refresh\" content=\"0;url=/NO\">';</script>"
    html = (
        f"<html><head><title>N{doc_id}</title>{''.join(parts)}{decoy}</head>"
        f"<body>{''.join(body)}</body></html>"
    )
    return html.encode("utf-8"), f"https://{source}.example.com/n/{doc_id}"


def make_redirect_hop_page(doc_id: int) -> tuple[bytes, str]:
    """Deterministic redirect-CHAIN fixture page (all on one hub host so
    targets are pure doc_id arithmetic). Groups of 8 consecutive doc_ids:
    g = doc_id//8, p = doc_id%8.

    - cycle groups (g%11==0): p in {0,1,2} form a 3-cycle
      0 -> 1 -> 2 -> 0 (instant refresh); p >= 3 plain terminal pages.
    - chain groups (g%11!=0): pages p <= g%6 redirect to doc_id+1
      (chain of L = g%6 + 2 pages, so hops from the head = g%6 + 1 <= 6);
      pages p > g%6 are terminals. The last group of a corpus can
      truncate mid-chain, leaving a DANGLING target (a url with no page)
      — resolution must treat it as the final destination.

    A script decoy refresh exercises the skip parser."""
    g, p = doc_id // 8, doc_id % 8
    url = f"https://hub.example.com/r/{doc_id}"
    nxt = None
    if g % 11 == 0:
        if p < 3:
            nxt = doc_id - 2 if p == 2 else doc_id + 1
    elif p <= g % 6:
        nxt = doc_id + 1
    head = ""
    if nxt is not None:
        head = f'<meta http-equiv="refresh" content="0; url=/r/{nxt}">'
    decoy = "<script>var r='<meta http-equiv=\"refresh\" content=\"0;url=/r/0\">';</script>"
    html = (
        f"<html><head><title>R{doc_id}</title>{head}{decoy}</head>"
        f"<body><p>hop page {doc_id} group {g} pos {p}</p></body></html>"
    )
    return html.encode("utf-8"), url


def make_pdf_attachment_doc(doc_id: int, source: str) -> tuple[bytes, str]:
    """Deterministic PDF with embedded-file attachments — fixture for
    PdfDocument.attachments(). 1 + doc_id%2 attachments named
    ``att-{doc_id}-{k}.txt`` with content ``attachment {doc_id}-{k} from
    {source}\\n`` x (2+k); attachment 0 is Flate-compressed (exercises the
    filter chain), attachment 1 raw. doc_id%3==0 routes through a /Kids
    intermediate node (exercises name-tree recursion)."""
    import zlib as _z

    url = f"https://{source}.example.com/att/{doc_id}"
    content = f"BT /F1 12 Tf 72 720 Td (Att {doc_id}) Tj ET".encode()
    n_att = 1 + doc_id % 2

    objs = []
    name_pairs = []
    for k in range(n_att):
        data = (f"attachment {doc_id}-{k} from {source}\n" * (2 + k)).encode()
        snum, fnum = 20 + 2 * k, 21 + 2 * k
        if k == 0:
            enc = _z.compress(data)
            objs.append(
                f"{snum} 0 obj << /Type /EmbeddedFile /Filter /FlateDecode "
                f"/Length {len(enc)} >>\n".encode()
                + b"stream\n" + enc + b"\nendstream endobj\n"
            )
        else:
            objs.append(
                f"{snum} 0 obj << /Type /EmbeddedFile /Length {len(data)} >>\n".encode()
                + b"stream\n" + data + b"\nendstream endobj\n"
            )
        objs.append(
            f"{fnum} 0 obj << /Type /Filespec /F (att-{doc_id}-{k}.txt) "
            f"/EF << /F {snum} 0 R >> >> endobj\n".encode()
        )
        name_pairs.append(f"(att-{doc_id}-{k}.txt) {fnum} 0 R")
    names_arr = " ".join(name_pairs)
    if doc_id % 3 == 0:
        # /Kids level: 10 = tree root -> 11 = leaf with the /Names array
        objs.append(b"10 0 obj << /Kids [11 0 R] >> endobj\n")
        objs.append(f"11 0 obj << /Names [{names_arr}] >> endobj\n".encode())
    else:
        objs.append(f"10 0 obj << /Names [{names_arr}] >> endobj\n".encode())

    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R "
        b"/Names << /EmbeddedFiles 10 0 R >> >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >> endobj\n"
        b"4 0 obj << /Length " + str(len(content)).encode() + b" >>\n"
        b"stream\n" + content + b"\nendstream endobj\n"
        b"5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n"
        + b"".join(objs)
        + b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )
    return pdf, url


def make_pdf_font_doc(doc_id: int, source: str) -> tuple[bytes, str]:
    """Deterministic PDF with a varied font inventory — fixture for
    PdfDocument.fonts(). Always /F1 Type1 Helvetica (not embedded);
    doc_id%2==0 adds /F2 TrueType ``Body{doc_id%5}`` with a descriptor
    carrying /FontFile2 (embedded); doc_id%3==0 adds /F3 Type0
    ``CJK{doc_id%4}`` whose descriptor lives on the descendant CIDFont
    and has NO font program (not embedded); doc_id%4==1 adds a dangling
    /F9 ref that must be skipped."""
    url = f"https://{source}.example.com/fnt/{doc_id}"
    content = f"BT /F1 12 Tf 72 720 Td (Fonts {doc_id}) Tj ET".encode()

    entries = ["/F1 5 0 R"]
    objs = []
    if doc_id % 2 == 0:
        entries.append("/F2 6 0 R")
        objs.append(
            f"6 0 obj << /Type /Font /Subtype /TrueType "
            f"/BaseFont /Body{doc_id % 5} /FontDescriptor 7 0 R >> endobj\n"
            .encode()
        )
        prog = b"\x00\x01FAKEGLYFPROGRAM!"
        objs.append(
            f"7 0 obj << /Type /FontDescriptor /FontName /Body{doc_id % 5} "
            f"/Flags 4 /FontFile2 12 0 R >> endobj\n".encode()
        )
        objs.append(
            f"12 0 obj << /Length {len(prog)} >>\n".encode()
            + b"stream\n" + prog + b"\nendstream endobj\n"
        )
    if doc_id % 3 == 0:
        entries.append("/F3 8 0 R")
        objs.append(
            f"8 0 obj << /Type /Font /Subtype /Type0 /BaseFont /CJK{doc_id % 4} "
            f"/Encoding /Identity-H /DescendantFonts [9 0 R] >> endobj\n"
            .encode()
        )
        objs.append(
            f"9 0 obj << /Type /Font /Subtype /CIDFontType2 "
            f"/BaseFont /CJK{doc_id % 4} /FontDescriptor 10 0 R >> endobj\n"
            .encode()
        )
        objs.append(
            f"10 0 obj << /Type /FontDescriptor /FontName /CJK{doc_id % 4} "
            f"/Flags 4 >> endobj\n".encode()
        )
    if doc_id % 4 == 1:
        entries.append("/F9 99 0 R")

    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << "
        + " ".join(entries).encode() + b" >> >> >> endobj\n"
        b"4 0 obj << /Length " + str(len(content)).encode() + b" >>\n"
        b"stream\n" + content + b"\nendstream endobj\n"
        b"5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n"
        + b"".join(objs)
        + b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )
    return pdf, url


def make_pdf_ocg_doc(doc_id: int, source: str) -> tuple[bytes, str]:
    """Deterministic PDF with optional-content layers — fixture for
    PdfDocument.layers() and the hidden-layer text drop. Two OCGs:
    (Main) always ON, (Watermark) OFF on even doc_ids (its /OC-marked
    text must vanish from extraction) and ON on odd. An /Artifact BMC
    scope (no /OC) wraps decoration text that stays visible — exercises
    marked-content nesting without optional content."""
    url = f"https://{source}.example.com/ocg/{doc_id}"
    content = (
        f"/OC /MC0 BDC BT /F1 12 Tf 72 720 Td (Body {doc_id}) Tj ET EMC\n"
        f"/Artifact BMC BT /F1 9 Tf 72 700 Td (Deco {doc_id}) Tj ET EMC\n"
        f"/OC /MC1 BDC BT /F1 48 Tf 200 400 Td (WM {doc_id}) Tj ET EMC"
    ).encode()
    off = "/OFF [21 0 R]" if doc_id % 2 == 0 else ""
    pdf = (
        b"%PDF-1.5\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R /OCProperties << "
        b"/OCGs [20 0 R 21 0 R] /D << " + off.encode() + b" >> >> >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> "
        b"/Properties << /MC0 20 0 R /MC1 21 0 R >> >> >> endobj\n"
        b"4 0 obj << /Length " + str(len(content)).encode() + b" >>\n"
        b"stream\n" + content + b"\nendstream endobj\n"
        b"5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n"
        b"20 0 obj << /Type /OCG /Name (Main) >> endobj\n"
        b"21 0 obj << /Type /OCG /Name (Watermark) >> endobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )
    return pdf, url


def make_pdf_labeled_doc(doc_id: int, source: str) -> tuple[bytes, str]:
    """Deterministic PDF with /PageLabels — fixture for
    PdfDocument.page_labels(). 2 + doc_id%3 pages: front matter in
    lowercase roman (doc_id%2==0) or uppercase letters with prefix 'App-'
    (odd), then decimal restarting at 1 + doc_id%5 from page index 1."""
    n_pages = 2 + doc_id % 3
    url = f"https://{source}.example.com/lbl/{doc_id}"
    page_objs = []
    kids = []
    for k in range(n_pages):
        cnum, pnum = 10 + 2 * k, 11 + 2 * k
        content = f"BT /F1 12 Tf 72 720 Td (Pg {doc_id}-{k}) Tj ET".encode()
        page_objs.append(
            f"{cnum} 0 obj << /Length {len(content)} >>\n".encode()
            + b"stream\n" + content + b"\nendstream endobj\n"
        )
        page_objs.append(
            f"{pnum} 0 obj << /Type /Page /Parent 2 0 R "
            f"/MediaBox [0 0 612 792] /Contents {cnum} 0 R "
            f"/Resources << /Font << /F1 5 0 R >> >> >> endobj\n".encode()
        )
        kids.append(f"{pnum} 0 R")
    if doc_id % 2 == 0:
        first = "<< /S /r >>"
    else:
        first = "<< /S /A /P (App-) >>"
    labels = (
        f"/PageLabels << /Nums [0 {first} "
        f"1 << /S /D /St {1 + doc_id % 5} >>] >>"
    )
    pdf = (
        b"%PDF-1.4\n"
        + f"1 0 obj << /Type /Catalog /Pages 2 0 R {labels} >> endobj\n".encode()
        + f"2 0 obj << /Type /Pages /Kids [{' '.join(kids)}] /Count {n_pages} >> endobj\n".encode()
        + b"5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n"
        + b"".join(page_objs)
        + b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )
    return pdf, url


def make_pdf_form_doc(doc_id: int, source: str) -> tuple[bytes, str]:
    """Deterministic PDF with an AcroForm — fixture for
    PdfDocument.form_fields(). Terminal fields in DFS order: a text field
    (title), a checkbox (agree, /V name /Yes|/Off), a combo choice (color,
    /Ff 131072), a radio GROUP whose only kid is a /T-less widget (grp —
    the group itself is the terminal field, /Ff 32768), and a non-terminal
    node (addr) whose kids inherit /FT /Tx from it (addr.city, addr.zip).
    A /T-less decoy field sits in /Fields between agree and color and must
    produce no row."""
    url = f"https://{source}.example.com/form/{doc_id}"
    content = f"BT /F1 12 Tf 72 720 Td (Form {doc_id}) Tj ET".encode()
    agree = "Yes" if doc_id % 2 else "Off"
    objs = [
        f"10 0 obj << /T (title) /FT /Tx /V (Doc {doc_id}) >> endobj\n",
        f"11 0 obj << /T (agree) /FT /Btn /V /{agree} >> endobj\n",
        "18 0 obj << /FT /Tx /V (decoy) >> endobj\n",
        f"12 0 obj << /T (color) /FT /Ch /V (c{doc_id % 4}) /Ff 131072 >> endobj\n",
        f"13 0 obj << /T (grp) /FT /Btn /Ff 32768 /V /opt{doc_id % 3} "
        "/Kids [14 0 R] >> endobj\n",
        "14 0 obj << /Subtype /Widget /Parent 13 0 R >> endobj\n",
        "15 0 obj << /T (addr) /FT /Tx /Kids [16 0 R 17 0 R] >> endobj\n",
        f"16 0 obj << /T (city) /V (City {doc_id % 10}) >> endobj\n",
        f"17 0 obj << /T (zip) /V ({10000 + doc_id}) >> endobj\n",
    ]
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R /AcroForm << /Fields "
        b"[10 0 R 11 0 R 18 0 R 12 0 R 13 0 R 15 0 R] >> >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >> endobj\n"
        b"4 0 obj << /Length " + str(len(content)).encode() + b" >>\n"
        b"stream\n" + content + b"\nendstream endobj\n"
        b"5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n"
        + "".join(objs).encode()
        + b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )
    return pdf, url


def make_pdf_xmp_doc(doc_id: int, source: str) -> tuple[bytes, str]:
    """Deterministic PDF with an XMP metadata packet (ISO 32000-1 §14.3.2:
    catalog /Metadata -> /Subtype /XML stream holding RDF/XML) — fixture
    for PdfDocument.xmp(). Carries dc:title, dc:creator (rdf:Seq), and
    xmp:CreateDate; the packet is Flate-free plain XML as most producers
    write it (the spec requires metadata streams be readable without
    filters by plain-text scanners)."""
    url = f"https://{source}.example.com/xmp/{doc_id}"
    content = f"BT /F1 12 Tf 72 720 Td (Xmp {doc_id}) Tj ET".encode()
    xmp = (
        '<?xpacket begin="﻿" id="W5M0MpCehiHzreSzNTczkc9d"?>\n'
        '<x:xmpmeta xmlns:x="adobe:ns:meta/">\n'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">\n'
        '<rdf:Description xmlns:dc="http://purl.org/dc/elements/1.1/"\n'
        '  xmlns:xmp="http://ns.adobe.com/xap/1.0/">\n'
        f"<dc:title><rdf:Alt><rdf:li xml:lang=\"x-default\">Report {doc_id}"
        "</rdf:li></rdf:Alt></dc:title>\n"
        f"<dc:creator><rdf:Seq><rdf:li>author-{doc_id % 5}</rdf:li>"
        "</rdf:Seq></dc:creator>\n"
        f"<xmp:CreateDate>2024-{1 + doc_id % 12:02d}-"
        f"{1 + doc_id % 28:02d}T00:00:00Z</xmp:CreateDate>\n"
        "</rdf:Description>\n</rdf:RDF>\n</x:xmpmeta>\n"
        '<?xpacket end="w"?>'
    ).encode("utf-8")
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R /Metadata 10 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >> endobj\n"
        b"4 0 obj << /Length " + str(len(content)).encode() + b" >>\n"
        b"stream\n" + content + b"\nendstream endobj\n"
        b"5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n"
        b"10 0 obj << /Type /Metadata /Subtype /XML /Length "
        + str(len(xmp)).encode() + b" >>\n"
        b"stream\n" + xmp + b"\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )
    return pdf, url


def make_headings_page(doc_id: int, source: str, lang: str) -> tuple[bytes, str]:
    """Deterministic heading-outline page from the document's own columns —
    fixture for functions/meta.extract_headings. Branch coverage:

    - h1 ``Doc {doc_id}`` (odd docs wrap the id in <em> — nested inline
      text must concatenate to the identical string).
    - (doc_id%3)+1 sections: h2 ``Section {k} of doc {doc_id}`` (even k
      uses a nested <em>of</em> variant), each with ((doc_id+k)%2)+1 h3
      ``Part {k}.{j}`` children.
    - Decoys contributing nothing: nav h2, footer h6, a display:none h3,
      and a whitespace-only h4.
    """
    url = f"https://{source}.example.com/h/{doc_id}"
    n_sections = (doc_id % 3) + 1
    h1 = (
        f"<h1>Doc <em>{doc_id}</em></h1>" if doc_id % 2
        else f"<h1>Doc {doc_id}</h1>"
    )
    parts = [
        f"<html><head><title>outline {doc_id}</title></head><body>",
        "<nav><h2>Site menu</h2></nav>",
        h1,
    ]
    for k in range(1, n_sections + 1):
        if k % 2 == 0:
            parts.append(f"<h2>Section {k} <em>of</em> doc {doc_id}</h2>")
        else:
            parts.append(f"<h2>Section {k} of doc {doc_id}</h2>")
        if k == 1:
            parts.append(f'<div style="display:none"><h3>Hidden {doc_id}</h3></div>')
            parts.append("<h4>   </h4>")
        for j in range(1, ((doc_id + k) % 2) + 2):
            parts.append(f"<h3>Part {k}.{j}</h3><p>body text {lang}</p>")
    parts.append("<footer><h6>Footer heading</h6></footer></body></html>")
    return "".join(parts).encode("utf-8"), url


def make_pdf_annot_doc(doc_id: int, source: str, lang: str) -> tuple[bytes, str]:
    """Deterministic annotation-bearing PDF — fixture for
    PdfDocument.annotations(). Branch coverage:

    - (doc_id%2)+1 /Text notes ``Note {doc_id}-{i}``;
    - a /Highlight ``HL {doc_id}`` on even docs;
    - a /FreeText ``Free {lang} {doc_id}`` on every doc;
    - decoys contributing nothing: a /Link URI annotation, a /Square,
      and a /Text WITHOUT /Contents.
    """
    url = f"https://{source}.example.com/pdfa/{doc_id}"
    content = f"BT /F1 12 Tf 72 720 Td (Annotated {doc_id}) Tj ET".encode()

    objs = []
    annot_refs = []
    next_num = 10
    for i in range(1, (doc_id % 2) + 2):
        objs.append(
            f"{next_num} 0 obj << /Type /Annot /Subtype /Text "
            f"/Rect [72 {700 - 14 * i} 90 {712 - 14 * i}] "
            f"/Contents (Note {doc_id}-{i}) >> endobj\n".encode()
        )
        annot_refs.append(next_num)
        next_num += 1
    if doc_id % 2 == 0:
        objs.append(
            f"{next_num} 0 obj << /Type /Annot /Subtype /Highlight "
            f"/Rect [72 600 200 612] /Contents (HL {doc_id}) >> endobj\n".encode()
        )
        annot_refs.append(next_num)
        next_num += 1
    objs.append(
        f"{next_num} 0 obj << /Type /Annot /Subtype /FreeText "
        f"/Rect [72 560 200 572] /Contents (Free {lang} {doc_id}) "
        f">> endobj\n".encode()
    )
    annot_refs.append(next_num)
    next_num += 1
    # decoys
    objs.append(
        f"{next_num} 0 obj << /Type /Annot /Subtype /Link "
        f"/Rect [0 0 10 10] /A << /Type /Action /S /URI "
        f"/URI (https://nope.example.org/{doc_id}) >> >> endobj\n".encode()
    )
    annot_refs.append(next_num)
    next_num += 1
    objs.append(
        f"{next_num} 0 obj << /Type /Annot /Subtype /Square "
        f"/Rect [0 0 10 10] >> endobj\n".encode()
    )
    annot_refs.append(next_num)
    next_num += 1
    objs.append(
        f"{next_num} 0 obj << /Type /Annot /Subtype /Text "
        f"/Rect [0 0 10 10] >> endobj\n".encode()  # no /Contents -> dropped
    )
    annot_refs.append(next_num)

    annots = " ".join(f"{n} 0 R" for n in annot_refs)
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        + (
            f"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents 4 0 R /Annots [ {annots} ] "
            f"/Resources << /Font << /F1 5 0 R >> >> >> endobj\n"
        ).encode()
        + b"4 0 obj << /Length " + str(len(content)).encode() + b" >>\n"
        b"stream\n" + content + b"\nendstream endobj\n"
        b"5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n"
        + b"".join(objs)
        + b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )
    return pdf, url


def make_pdf_tagged_doc(doc_id: int, source: str) -> tuple[bytes, str]:
    """Deterministic TAGGED PDF (logical structure, ISO 32000-1 §14.7) —
    fixture for PdfDocument.structure(). 2 + doc_id%3 structure elements:
    an H1 title then paragraphs whose roles alternate /Para (mapped to /P
    via /RoleMap) and /P directly. An /Artifact BMC page-number span and a
    completely unmarked span are present in the CONTENT (plain extraction
    keeps them) but belong to no structure element, so the structure walk
    must drop both."""
    url = f"https://{source}.example.com/tagged/{doc_id}"
    n_para = 1 + (2 + doc_id % 3) - 1  # elements beyond the H1
    parts = [
        f"/H1 <</MCID 0>> BDC BT /F1 16 Tf 72 720 Td (Title {doc_id}) Tj ET EMC"
    ]
    for i in range(1, n_para):
        parts.append(
            f"/P <</MCID {i}>> BDC BT /F1 12 Tf 72 {720 - 24 * i} Td "
            f"(Para {doc_id}-{i}) Tj ET EMC"
        )
    parts.append("/Artifact BMC BT /F1 8 Tf 280 40 Td (Page 1) Tj ET EMC")
    parts.append("BT /F1 8 Tf 400 40 Td (loose) Tj ET")
    content = "\n".join(parts).encode()

    elems = []
    kid_refs = " ".join(f"{20 + i} 0 R" for i in range(n_para))
    for i in range(n_para):
        role = "/H1" if i == 0 else ("/Para" if i % 2 == 1 else "/P")
        elems.append(
            f"{20 + i} 0 obj << /S {role} /K {i} /Pg 3 0 R >> endobj\n".encode()
        )
    pdf = (
        b"%PDF-1.7\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R /MarkInfo << /Marked true >> "
        b"/StructTreeRoot 10 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >> endobj\n"
        b"4 0 obj << /Length " + str(len(content)).encode() + b" >>\n"
        b"stream\n" + content + b"\nendstream endobj\n"
        b"5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n"
        b"10 0 obj << /Type /StructTreeRoot /K 11 0 R "
        b"/RoleMap << /Para /P >> >> endobj\n"
        b"11 0 obj << /S /Document /K [" + kid_refs.encode() + b"] >> endobj\n"
        + b"".join(elems) +
        b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )
    return pdf, url
