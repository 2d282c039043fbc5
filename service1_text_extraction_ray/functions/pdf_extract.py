"""From-scratch PDF text/layout extraction on the Python stdlib (zlib + re).

Replaces the reference's PyMuPDF usage (``core_pdf_processor.py:115-218``
doc loop, ``:356-416`` page dispatcher, ``:418-465`` layout tree) with a
parser for a defined PDF subset — no fitz/pdfminer/pypdf in the environment,
and the north rule demands a from-scratch build. The *semantics* downstream
of parsing (page acceptance gate, layout-tree shape, reading order, output
formats) mirror the reference, cited at each function.

Supported subset (documented per SURVEY.md §7.4 item 2; the fixture writer in
``functions/synth.py`` emits only this subset, and real-world deviations
surface as per-page/per-doc ``parse_failure`` rows, never exceptions):

- PDF 1.x layout: ``N G obj ... endobj`` bodies, dictionaries ``<< ... >>``,
  direct ``/Length`` integers on streams (an indirect ``/Length N 0 R``
  falls back to the ``endstream`` scan), PLUS 1.5+ object streams: every
  ``/Type /ObjStm`` is decoded and its contained objects unpacked into the
  object map (``_expand_object_streams``), so compressed-catalog documents
  parse; trailer fields are also read from ``/Type /XRef`` stream dicts
  (cross-reference-stream files have no ``trailer`` keyword). Incremental
  updates (§7.5.6) resolve last-definition-at-highest-generation wins, so
  appended replacement objects shadow their originals.
- Document structure: ``trailer`` dict (or a ``/Type /Catalog`` object) ->
  ``/Root`` -> ``/Pages`` tree with nested ``/Kids`` -> ``/Type /Page``
  leaves; ``/MediaBox`` inherited or per-page; ``/Contents`` as a single ref
  or an array of refs.
- Content streams: raw, ``/Filter /FlateDecode`` (stdlib zlib),
  ``/LZWDecode`` (TIFF-variant LZW, EarlyChange=1), ``/RunLengthDecode``,
  ``/ASCIIHexDecode``, ``/ASCII85Decode``, or a chain of these in array
  order (any other filter -> counted parse failure, never junk text);
  ``/DecodeParms`` ``/Predictor`` post-filters on the Flate/LZW stages —
  TIFF horizontal differencing (2) and all five PNG row filters (10-15,
  RFC 2083) with Columns/Colors/BitsPerComponent row geometry; text
  operators ``BT ET Tf Td TD Tm T* TL Tj TJ ' "``; inline images
  (``BI .. ID <binary> EI``, §8.9.7) are skipped at token granularity so
  image bytes that spell text operators never inject junk spans; literal
  ``(...)`` strings
  with standard escapes + octal, hex ``<...>`` strings; single-byte
  (StandardEncoding/WinAnsi ~ latin-1) text, with ``/Encoding
  /Differences`` glyph-name remapping honored per font (uniXXXX names and
  an Adobe-Glyph-List subset; inline or indirect encoding dicts).
- The xref table is ignored (objects are located by scanning) — tolerant of
  broken/truncated xref sections, which is the common real-world corruption.

Geometry model: spans carry the text-matrix origin; y is flipped to
top-down coordinates (y_down = page_height - y_pdf) so the layout tree and
the layout-recreation formatter use the same orientation as the reference's
fitz-based tree (fitz is y-down). Reading order: lines sorted top-to-bottom
with gap-based two-column detection (left column first), seeded from the
reference's layout-recreation thresholds (``core_pdf_processor.py:709-781``).
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

# Glyph advance approximation for span bboxes (Helvetica-ish average width as a
# fraction of font size). Affects only layout bboxes, not text bytes.
GLYPH_WIDTH_FACTOR = 0.5

# Spans whose baselines differ by <= this many points are the same line.
LINE_Y_TOLERANCE = 2.0

# Consecutive lines with a vertical gap > 1.8x font size start a new block.
BLOCK_GAP_FACTOR = 1.8

# Two-column detection: the x-gap between column clusters must exceed this
# fraction of the page width, and each side must have at least 2 lines.
COLUMN_GAP_FRACTION = 0.20


class PdfParseError(Exception):
    """Raised for payloads outside the supported subset; callers convert this
    into a ``parse_failure`` row (reference failure isolation,
    ``core_pdf_processor.py:202-209``)."""


class PdfPasswordError(PdfParseError):
    """The document is encrypted and no supplied password authenticates —
    the caller's password-attempt loop (reference
    ``core_pdf_processor.py:283-306``) turns this into a
    ``password_required`` failure row."""


# --------------------------------------------------------------------------
# Object scanning
# --------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_WS = b" \t\r\n\f\x00"


def _skip_ws(data: bytes, i: int) -> int:
    n = len(data)
    while i < n and data[i : i + 1] in (b" ", b"\t", b"\r", b"\n", b"\f", b"\x00"):
        i += 1
    return i


def _scan_dict(data: bytes, i: int) -> Tuple[bytes, int]:
    """Return (dict bytes including delimiters, index after '>>').
    ``i`` must point at ``<<``. Handles nesting; strings inside dicts are
    skipped so ')>>(' sequences can't break the balance."""
    assert data[i : i + 2] == b"<<"
    depth = 0
    j = i
    n = len(data)
    while j < n:
        c = data[j : j + 2]
        if c == b"<<":
            depth += 1
            j += 2
        elif c == b">>":
            depth -= 1
            j += 2
            if depth == 0:
                return data[i:j], j
        elif data[j : j + 1] == b"(":
            j = _skip_string(data, j)
        else:
            j += 1
    raise PdfParseError("unterminated dictionary")


def _skip_string(data: bytes, i: int) -> int:
    """Skip a literal string starting at '('; returns index after ')'."""
    depth = 0
    n = len(data)
    j = i
    while j < n:
        c = data[j]
        if c == 0x5C:  # backslash
            j += 2
            continue
        if c == 0x28:  # (
            depth += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return j + 1
        j += 1
    raise PdfParseError("unterminated string")


# Direct /Length only: an indirect '/Length 12 0 R' must NOT match as 12
# (or backtrack to 1) — (?!\d) pins the full number, the second lookahead
# rejects the reference form so the endstream-scan fallback resolves it.
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)")


@dataclass
class _PdfObject:
    num: int
    dict_bytes: bytes
    stream: Optional[bytes]
    gen: int = 0


def _scan_objects(data: bytes) -> Dict[int, _PdfObject]:
    """Locate all indirect objects by scanning (xref ignored — see module doc)."""
    objects: Dict[int, _PdfObject] = {}
    pos = 0
    n = len(data)
    while True:
        m = _OBJ_RE.search(data, pos)
        if m is None:
            break
        num = int(m.group(1))
        gen = int(m.group(2))
        i = _skip_ws(data, m.end())
        dict_bytes = b""
        stream: Optional[bytes] = None
        if data[i : i + 2] == b"<<":
            dict_bytes, i = _scan_dict(data, i)
            i = _skip_ws(data, i)
            if data[i : i + 6] == b"stream":
                i += 6
                if data[i : i + 2] == b"\r\n":
                    i += 2
                elif data[i : i + 1] == b"\n":
                    i += 1
                lm = _LENGTH_RE.search(dict_bytes)
                if lm is None:
                    # Subset requires direct /Length; fall back to endstream scan.
                    end = data.find(b"endstream", i)
                    if end < 0:
                        raise PdfParseError("stream without Length or endstream")
                    stream = data[i:end].rstrip(b"\r\n")
                    i = end
                else:
                    length = int(lm.group(1))
                    if i + length > n:
                        raise PdfParseError("truncated stream")
                    stream = data[i : i + length]
                    i = i + length
        end_obj = data.find(b"endobj", i)
        pos = end_obj + 6 if end_obj >= 0 else i + 1
        # Incremental updates (ISO 32000-1 §7.5.6) append replacement
        # objects at the END of the file; with xref ignored, the live
        # version is the LAST definition at the highest generation — the
        # same repair heuristic scanning parsers use. A later definition
        # with a LOWER generation is a stale freed object and never wins.
        prior = objects.get(num)
        if prior is None or gen >= prior.gen:
            objects[num] = _PdfObject(num, dict_bytes, stream, gen)
    if not objects:
        raise PdfParseError("no PDF objects found")
    return objects


_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_NAME_VAL_RE = {
    "Root": re.compile(rb"/Root\s+(\d+)\s+\d+\s+R"),
    "Pages": re.compile(rb"/Pages\s+(\d+)\s+\d+\s+R"),
    "Info": re.compile(rb"/Info\s+(\d+)\s+\d+\s+R"),
}
_TYPE_RE = re.compile(rb"/Type\s*/(\w+)")
_KIDS_RE = re.compile(rb"/Kids\s*\[([^\]]*)\]")
_CONTENTS_REF_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_ANNOTS_RE = re.compile(rb"/Annots\s*\[([^\]]*)\]")
_ACTION_REF_RE = re.compile(rb"/A\s+(\d+)\s+\d+\s+R")
_URI_STR_RE = re.compile(rb"/URI\s*\(")
_TITLE_STR_RE = re.compile(rb"/Title\s*\(")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[([^\]]*)\]")
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]"
)
_FILTER_RE = re.compile(rb"/Filter\s*(\d+\s+\d+\s+R|/\w+|\[[^\]]*\])")
_FILTER_NAME_RE = re.compile(rb"/(\w+)")


def _ascii_hex_decode(raw: bytes) -> bytes:
    """ASCIIHexDecode (PDF 1.7 §7.4.2): hex digits, whitespace ignored,
    ``>`` is end-of-data, an odd trailing digit is padded with 0."""
    eod = raw.find(b">")
    if eod != -1:
        raw = raw[:eod]
    compact = bytes(c for c in raw if c not in b" \t\r\n\f\x00")
    if not re.fullmatch(rb"[0-9A-Fa-f]*", compact):
        raise PdfParseError("ASCIIHexDecode: non-hex character")
    if len(compact) % 2:
        compact += b"0"
    return bytes.fromhex(compact.decode("ascii"))


def _ascii85_decode(raw: bytes) -> bytes:
    """ASCII85Decode (PDF 1.7 §7.4.3): base-85 groups of 5 chars -> 4
    bytes, ``z`` shorthand for four zero bytes (only between groups),
    ``~>`` is EOD, whitespace ignored; a trailing partial group of n chars
    (2 <= n <= 4) yields n-1 bytes (pad with 'u', drop the pad bytes)."""
    eod = raw.find(b"~>")
    if eod != -1:
        raw = raw[:eod]
    if raw.startswith(b"<~"):
        raw = raw[2:]
    out = bytearray()
    group: List[int] = []
    for c in raw:
        if c in b" \t\r\n\f\x00":
            continue
        if c == 0x7A:  # 'z'
            if group:
                raise PdfParseError("ASCII85Decode: z inside group")
            out += b"\x00\x00\x00\x00"
            continue
        if not (0x21 <= c <= 0x75):
            raise PdfParseError("ASCII85Decode: character out of range")
        group.append(c - 0x21)
        if len(group) == 5:
            acc = 0
            for d in group:
                acc = acc * 85 + d
            if acc > 0xFFFFFFFF:
                raise PdfParseError("ASCII85Decode: group overflow")
            out += acc.to_bytes(4, "big")
            group = []
    if group:
        n = len(group)
        if n == 1:
            raise PdfParseError("ASCII85Decode: single trailing character")
        acc = 0
        for d in group + [84] * (5 - n):
            acc = acc * 85 + d
        out += acc.to_bytes(4, "big")[: n - 1]
    return bytes(out)


def _lzw_decode(data: bytes) -> bytes:
    """LZWDecode (PDF 1.7 §7.4.4 / TIFF variant, EarlyChange=1 — the
    default; a /DecodeParms override is not emitted by any mainstream
    producer for content streams). Codes start at 9 bits; 256 clears the
    table, 257 is EOD; the code width grows when the table length reaches
    511/1023/2047 (one entry EARLY, matching encoders that bump the width
    one code before the table is actually full)."""
    out = bytearray()
    table: List[bytes] = []
    prev = b""
    width = 9
    bitbuf = 0
    bitcnt = 0

    def _reset() -> List[bytes]:
        return [bytes([c]) for c in range(256)] + [b"", b""]

    table = _reset()
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        bitcnt += 8
        while bitcnt >= width:
            code = (bitbuf >> (bitcnt - width)) & ((1 << width) - 1)
            bitcnt -= width
            if code == 256:
                table = _reset()
                width = 9
                prev = b""
                continue
            if code == 257:
                return bytes(out)
            if not prev:
                if code >= len(table):
                    raise PdfParseError("LZWDecode: literal code out of range")
                entry = table[code]
            else:
                if code < len(table):
                    entry = table[code]
                    table.append(prev + entry[:1])
                elif code == len(table):
                    entry = prev + prev[:1]
                    table.append(entry)
                else:
                    raise PdfParseError("LZWDecode: code out of range")
                n = len(table)
                if n == 511:
                    width = 10
                elif n == 1023:
                    width = 11
                elif n == 2047:
                    width = 12
            out += entry
            prev = entry
    # Truncated stream without an EOD marker: tolerate (real-world PDFs
    # sometimes omit it); everything decoded so far is valid output.
    return bytes(out)


def _run_length_decode(data: bytes) -> bytes:
    """RunLengthDecode (PDF 1.7 §7.4.5): length byte L then either L+1
    literal bytes (L < 128) or one byte repeated 257-L times (L > 128);
    L == 128 is EOD."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        l = data[i]
        if l == 128:
            return bytes(out)
        if l < 128:
            end = i + 1 + l + 1
            if end > n:
                raise PdfParseError("RunLengthDecode: truncated literal run")
            out += data[i + 1:end]
            i = end
        else:
            if i + 1 >= n:
                raise PdfParseError("RunLengthDecode: truncated repeat run")
            out += bytes([data[i + 1]]) * (257 - l)
            i += 2
    raise PdfParseError("RunLengthDecode: missing EOD")


_DECODEPARMS_RE = re.compile(rb"/(?:DecodeParms|DP)\b")
_PRED_RE = re.compile(rb"/Predictor\s+(\d+)")
_COLUMNS_RE = re.compile(rb"/Columns\s+(\d+)")
_COLORS_RE = re.compile(rb"/Colors\s+(\d+)")
_BPC_RE = re.compile(rb"/BitsPerComponent\s+(\d+)")


def _parse_decode_parms(dict_bytes: bytes) -> List[Optional[dict]]:
    """Parse /DecodeParms (or legacy /DP): a dict, an array of dict/null
    aligned with the /Filter array, or absent. Returns one entry per
    position (None = no parms). Indirect parms are out of subset ->
    PdfParseError (counted failure, never silently-wrong bytes)."""
    m = _DECODEPARMS_RE.search(dict_bytes)
    if not m:
        return []
    i = _skip_ws(dict_bytes, m.end())
    out: List[Optional[dict]] = []

    def one(j: int) -> Tuple[Optional[dict], int]:
        j = _skip_ws(dict_bytes, j)
        if dict_bytes[j : j + 2] == b"<<":
            d, j2 = _scan_dict(dict_bytes, j)
            if _REF_RE.search(d):
                raise PdfParseError("indirect value inside /DecodeParms")
            p = _PRED_RE.search(d)
            c = _COLUMNS_RE.search(d)
            k = _COLORS_RE.search(d)
            b = _BPC_RE.search(d)
            return (
                {
                    "predictor": int(p.group(1)) if p else 1,
                    "columns": int(c.group(1)) if c else 1,
                    "colors": int(k.group(1)) if k else 1,
                    "bpc": int(b.group(1)) if b else 8,
                },
                j2,
            )
        if dict_bytes[j : j + 4] == b"null":
            return None, j + 4
        raise PdfParseError("unsupported /DecodeParms value")

    if dict_bytes[i : i + 1] == b"[":
        j = i + 1
        while True:
            j = _skip_ws(dict_bytes, j)
            if j >= len(dict_bytes) or dict_bytes[j : j + 1] == b"]":
                break
            entry, j = one(j)
            out.append(entry)
        return out
    entry, _ = one(i)
    return [entry]


def _apply_predictor(data: bytes, parms: dict) -> bytes:
    """Undo a /Predictor post-filter (ISO 32000-1 §7.4.4.4): 2 = TIFF
    horizontal differencing; 10-15 = PNG row filters (RFC 2083 §6) with a
    per-row filter-type byte. Row geometry from Columns/Colors/BPC."""
    pred = parms["predictor"]
    if pred <= 1:
        return data
    colors, bpc, columns = parms["colors"], parms["bpc"], parms["columns"]
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    if rowlen <= 0:
        raise PdfParseError("predictor with non-positive row length")
    if pred == 2:
        if bpc != 8:
            raise PdfParseError("TIFF predictor supported only at 8 bpc")
        out = bytearray(data)
        for r in range(0, len(out) - rowlen + 1, rowlen):
            for j in range(bpp, rowlen):
                out[r + j] = (out[r + j] + out[r + j - bpp]) & 0xFF
        return bytes(out)
    if pred < 10 or pred > 15:
        raise PdfParseError(f"unsupported /Predictor {pred}")
    if len(data) % (rowlen + 1) != 0:
        raise PdfParseError("PNG-predicted stream not a whole number of rows")
    out = bytearray()
    prev = bytearray(rowlen)
    for r in range(0, len(data), rowlen + 1):
        ft = data[r]
        row = bytearray(data[r + 1 : r + 1 + rowlen])
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for j in range(bpp, rowlen):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif ft == 2:  # Up
            for j in range(rowlen):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:  # Average
            for j in range(rowlen):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + (left + prev[j]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for j in range(rowlen):
                a = row[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred_v = a if (pa <= pb and pa <= pc_) else (b if pb <= pc_ else c)
                row[j] = (row[j] + pred_v) & 0xFF
        else:
            raise PdfParseError(f"unknown PNG row filter {ft}")
        out += row
        prev = row
    return bytes(out)


def _decode_stream(
    obj: "_PdfObject", file_key: Optional[bytes] = None, cfm: str = "V2"
) -> bytes:
    """Apply the object's /Filter chain (in array order) to its stream.

    Supported: FlateDecode (stdlib zlib), LZWDecode, RunLengthDecode,
    ASCIIHexDecode, ASCII85Decode, and chains thereof. Any other filter
    raises PdfParseError, which the document dispatcher turns into a
    counted parse-failure row.

    Decryption (``file_key`` set) is OUTERMOST: stored bytes are
    crypt(filtered(content)), so decrypt first, then defilter (ISO 32000-1
    §7.6.2 — see functions/pdf_crypt.py). ``cfm`` selects the crypt
    filter: "V2" (RC4, /V 1-2 and /V 4 /CFM V2), "AESV2" (/V 4) or
    "AESV3" (/V 5, AES-256 with the file key directly).
    """
    raw = obj.stream
    if file_key is not None:
        from .pdf_crypt import (
            crypt_object_bytes,
            decrypt_object_bytes_aes,
            decrypt_object_bytes_aes256,
        )

        try:
            if cfm == "AESV3":
                raw = decrypt_object_bytes_aes256(file_key, raw)
            elif cfm == "AESV2":
                raw = decrypt_object_bytes_aes(file_key, obj.num, obj.gen, raw)
            else:
                raw = crypt_object_bytes(file_key, obj.num, obj.gen, raw)
        except ValueError as e:
            raise PdfParseError(f"{cfm} stream: {e}")
    m = _FILTER_RE.search(obj.dict_bytes)
    if not m:
        return raw
    spec = m.group(1)
    if spec.endswith(b"R"):
        # An indirect /Filter reference means SOME filter applies but we
        # can't resolve which in this subset — fail the page (counted)
        # rather than feed still-encoded bytes to the tokenizer.
        raise PdfParseError("indirect /Filter reference unsupported")
    if spec.startswith(b"["):
        # Same guarantee for array specs: '[ 5 0 R ]' contains a reference
        # (and yields zero names below), which would silently return the
        # still-encoded bytes. Any 'N N R' inside the array, or a non-empty
        # array with no filter names, is a counted parse failure. An EMPTY
        # array ('/Filter []') legally means "no filters" -> raw bytes.
        body = spec.strip(b"[] \t\r\n\f\x00")
        if _REF_RE.search(spec) or (body and not _FILTER_NAME_RE.search(spec)):
            raise PdfParseError("unresolvable /Filter array")
    parms_list = _parse_decode_parms(obj.dict_bytes)
    for idx, name_m in enumerate(_FILTER_NAME_RE.finditer(spec)):
        name = name_m.group(1)
        parms = parms_list[idx] if idx < len(parms_list) else None
        if name == b"FlateDecode":
            try:
                raw = zlib.decompress(raw)
            except zlib.error as e:
                raise PdfParseError(f"FlateDecode failed: {e}") from e
        elif name == b"ASCIIHexDecode":
            raw = _ascii_hex_decode(raw)
        elif name == b"LZWDecode":
            raw = _lzw_decode(raw)
        elif name == b"RunLengthDecode":
            raw = _run_length_decode(raw)
        elif name == b"ASCII85Decode":
            raw = _ascii85_decode(raw)
        else:
            raise PdfParseError(f"unsupported stream filter /{name.decode('ascii', 'replace')}")
        # /Predictor post-pass applies to the Flate/LZW stages (§7.4.4.4)
        if parms is not None and name in (b"FlateDecode", b"LZWDecode"):
            raw = _apply_predictor(raw, parms)
    return raw


_N_RE = re.compile(rb"/N\s+(\d+)")
_FIRST_RE = re.compile(rb"/First\s+(\d+)")


def _expand_object_streams(
    objects: Dict[int, _PdfObject],
    file_key: Optional[bytes] = None,
    cfm: str = "V2",
) -> None:
    """Unpack PDF 1.5+ object streams (/Type /ObjStm, ISO 32000-1 §7.5.7)
    into the object map, in place.

    Object-stream PDFs keep most non-stream objects (catalog, page tree,
    fonts) compressed INSIDE a stream, so the raw-file scan in
    ``_scan_objects`` cannot see them — this pass decodes each ObjStm and
    parses its ``/N`` header pairs (objnum, offset-from-/First). Contained
    objects never carry streams (§7.5.7 forbids it), so each body is either
    a dictionary or a bare value; both are stored as ``dict_bytes`` (every
    downstream consumer regexes over that field). First definition wins, as
    in the scan: a classic-layout object shadows an ObjStm twin.

    In encrypted documents the ObjStm stream itself is encrypted (strings
    inside it are NOT re-encrypted — the whole stream was), so callers pass
    the armed ``file_key``; PdfDocument defers this pass until the key
    exists. Malformed ObjStm contents raise PdfParseError -> counted
    parse-failure row, never junk objects.
    """
    for num in sorted(objects):
        obj = objects[num]
        tm = _TYPE_RE.search(obj.dict_bytes)
        if tm is None or tm.group(1) != b"ObjStm" or obj.stream is None:
            continue
        data = _decode_stream(obj, file_key, cfm)
        nm = _N_RE.search(obj.dict_bytes)
        fm = _FIRST_RE.search(obj.dict_bytes)
        if nm is None or fm is None:
            raise PdfParseError("ObjStm without direct /N and /First")
        n_objs = int(nm.group(1))
        first = int(fm.group(1))
        if first > len(data):
            raise PdfParseError("ObjStm /First beyond stream end")
        header = data[:first].split()
        if len(header) < 2 * n_objs:
            raise PdfParseError("ObjStm header truncated")
        try:
            pairs = [
                (int(header[2 * i]), int(header[2 * i + 1])) for i in range(n_objs)
            ]
        except ValueError as e:
            raise PdfParseError(f"ObjStm header not integer pairs: {e}") from e
        for i, (inner_num, off) in enumerate(pairs):
            start = first + off
            end = first + pairs[i + 1][1] if i + 1 < n_objs else len(data)
            if start > len(data) or end > len(data) or start > end:
                raise PdfParseError("ObjStm offset out of range")
            body = data[start:end].strip()
            if inner_num in objects:
                continue
            if body.startswith(b"<<"):
                body, _ = _scan_dict(body, 0)
            objects[inner_num] = _PdfObject(inner_num, body, None, 0)


# ---------------------------------------------------------------------------
# Simple-font /Encoding /Differences: glyph-name remapping (ISO 32000-1
# §9.6.6.3). Real generators (TeX, old Office exports) remap byte codes to
# named glyphs; without the table, accented text decodes as the wrong
# latin-1 byte. Glyph name -> char resolution: the uniXXXX convention
# first (covers everything), then an Adobe-Glyph-List subset of the names
# the Latin corpus actually uses.
# ---------------------------------------------------------------------------

_AGL_SUBSET = {
    # ASCII names that differ from the character itself
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    # Latin-1 supplement + common typography
    "exclamdown": "¡", "cent": "¢", "sterling": "£", "yen": "¥",
    "section": "§", "copyright": "©", "registered": "®", "degree": "°",
    "plusminus": "±", "paragraph": "¶", "questiondown": "¿",
    "multiply": "×", "divide": "÷", "germandbls": "ß",
    "Agrave": "À", "Aacute": "Á", "Acircumflex": "Â", "Atilde": "Ã",
    "Adieresis": "Ä", "Aring": "Å", "AE": "Æ", "Ccedilla": "Ç",
    "Egrave": "È", "Eacute": "É", "Ecircumflex": "Ê", "Edieresis": "Ë",
    "Igrave": "Ì", "Iacute": "Í", "Icircumflex": "Î", "Idieresis": "Ï",
    "Ntilde": "Ñ", "Ograve": "Ò", "Oacute": "Ó", "Ocircumflex": "Ô",
    "Otilde": "Õ", "Odieresis": "Ö", "Oslash": "Ø", "Ugrave": "Ù",
    "Uacute": "Ú", "Ucircumflex": "Û", "Udieresis": "Ü", "Yacute": "Ý",
    "agrave": "à", "aacute": "á", "acircumflex": "â", "atilde": "ã",
    "adieresis": "ä", "aring": "å", "ae": "æ", "ccedilla": "ç",
    "egrave": "è", "eacute": "é", "ecircumflex": "ê", "edieresis": "ë",
    "igrave": "ì", "iacute": "í", "icircumflex": "î", "idieresis": "ï",
    "ntilde": "ñ", "ograve": "ò", "oacute": "ó", "ocircumflex": "ô",
    "otilde": "õ", "odieresis": "ö", "oslash": "ø", "ugrave": "ù",
    "uacute": "ú", "ucircumflex": "û", "udieresis": "ü", "yacute": "ý",
    "ydieresis": "ÿ", "OE": "Œ", "oe": "œ", "Scaron": "Š", "scaron": "š",
    "Zcaron": "Ž", "zcaron": "ž", "florin": "ƒ",
    "bullet": "•", "dagger": "†", "daggerdbl": "‡", "ellipsis": "…",
    "emdash": "—", "endash": "–", "quoteleft": "‘",
    "quoteright": "’", "quotedblleft": "“",
    "quotedblright": "”", "quotesinglbase": "‚", "quotedblbase": "„",
    "guilsinglleft": "‹", "guilsinglright": "›", "guillemotleft": "«",
    "guillemotright": "»", "fi": "ﬁ", "fl": "ﬂ", "fraction": "⁄",
    "perthousand": "‰", "trademark": "™", "Euro": "€", "minus": "−",
}


def _glyph_to_char(name: str) -> Optional[str]:
    """Glyph name -> character: single ASCII letters map to themselves,
    ``uniXXXX``/``uXXXX[XX]`` parse directly, the rest via the AGL subset.
    Unknown names return None (the byte keeps its latin-1 default)."""
    if len(name) == 1:
        return name
    if name.startswith("uni") and len(name) == 7:
        try:
            return chr(int(name[3:], 16))
        except ValueError:
            return None
    if name.startswith("u") and len(name) in (5, 7):
        try:
            return chr(int(name[1:], 16))
        except ValueError:
            return None
    return _AGL_SUBSET.get(name)


_ENCODING_REF_RE = re.compile(rb"/Encoding\s+(\d+)\s+\d+\s+R")
_DIFFERENCES_RE = re.compile(rb"/Differences\s*\[")
_DIFF_TOKEN_RE = re.compile(rb"(\d+)|/([^\s/\[\]<>()]+)|(\])")
_BASE_ENC_RE = re.compile(rb"/(?:Base)?Encoding\s*/(\w+)")


def _base_encoding_table(enc_bytes: bytes) -> Dict[int, str]:
    """Byte->char overrides for a named base encoding. latin-1 is the
    decode default, so only the bytes where the named encoding DIFFERS
    need entries: WinAnsi (cp1252) and MacRoman repopulate 0x80-0x9F
    (and beyond, for MacRoman) where latin-1 has control characters —
    curly quotes, the euro sign, em dashes, trademark."""
    m = _BASE_ENC_RE.search(enc_bytes)
    if m is None:
        return {}
    codec = {b"WinAnsiEncoding": "cp1252", b"MacRomanEncoding": "mac_roman"}.get(
        m.group(1)
    )
    if codec is None:
        return {}
    table: Dict[int, str] = {}
    for b in range(0x80, 0x100):
        try:
            ch = bytes([b]).decode(codec)
        except UnicodeDecodeError:
            continue  # undefined code point keeps the latin-1 default
        if ch != chr(b):
            table[b] = ch
    return table


def _parse_differences(enc_bytes: bytes) -> Optional[Dict[int, str]]:
    """Parse ``/Differences [ code /name /name code /name ... ]`` into a
    byte -> char override table (ISO 32000-1 Table 114 semantics: an
    integer sets the next code, each name assigns then increments)."""
    m = _DIFFERENCES_RE.search(enc_bytes)
    if m is None:
        return None
    table: Dict[int, str] = {}
    code = 0
    for tok in _DIFF_TOKEN_RE.finditer(enc_bytes, m.end()):
        if tok.group(3):
            break  # closing ]
        if tok.group(1):
            code = int(tok.group(1))
            continue
        ch = _glyph_to_char(tok.group(2).decode("latin-1"))
        if ch is not None and 0 <= code <= 255:
            table[code] = ch
        code += 1
    return table or None


def _page_simple_encodings(
    objects: Dict[int, _PdfObject],
    resources: Optional[bytes],
) -> Dict[str, Dict[int, str]]:
    """Map font resource name -> byte->char override table for every simple
    (non-Type0) font whose /Encoding carries a /Differences array — inline
    (``/Encoding << ... /Differences [...] >>``) or as an indirect
    encoding object. Bytes absent from the table keep the latin-1 path."""
    if not resources:
        return {}
    fm = _FONT_RES_RE.search(resources)
    if fm is None:
        return {}
    font_dict = _resolve_dict(objects, resources, fm)
    if font_dict is None:
        return {}
    out: Dict[str, Dict[int, str]] = {}
    for name, num in _FONT_ENTRY_RE.findall(font_dict):
        fobj = objects.get(int(num))
        if fobj is None:
            continue
        st = re.search(rb"/Subtype\s*/(\w+)", fobj.dict_bytes)
        if st is not None and st.group(1) == b"Type0":
            continue  # composite fonts use the CMap path
        enc_bytes = fobj.dict_bytes
        rm = _ENCODING_REF_RE.search(fobj.dict_bytes)
        if rm is not None:
            eobj = objects.get(int(rm.group(1)))
            if eobj is None:
                continue
            enc_bytes = eobj.dict_bytes
        table = _base_encoding_table(enc_bytes)
        table.update(_parse_differences(enc_bytes) or {})
        if table:
            out[name.decode("latin-1")] = table
    return out


# ---------------------------------------------------------------------------
# Composite (Type0/CID) fonts: /ToUnicode CMap -> cid -> text mapping
# ---------------------------------------------------------------------------

_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_CMAP_TOKEN_RE = re.compile(rb"<([0-9A-Fa-f]+)>|(\[)|(\])")
_TOUNICODE_CAP = 1 << 16  # one code space; caps degenerate bfranges


def _utf16be(hexs: bytes) -> str:
    if len(hexs) % 2:
        hexs += b"0"
    return bytes.fromhex(hexs.decode("ascii")).decode("utf-16-be", "replace")


def _dst_plus(hexs: bytes, k: int) -> str:
    """bfrange increment rule (Adobe CMap spec): the LAST 16-bit code unit
    of the destination is incremented; earlier units stay fixed."""
    if len(hexs) % 2:
        hexs += b"0"
    raw = bytes.fromhex(hexs.decode("ascii"))
    if len(raw) < 2:
        raw = b"\x00" + raw
    base = int.from_bytes(raw[-2:], "big")
    raw = raw[:-2] + ((base + k) & 0xFFFF).to_bytes(2, "big")
    return raw.decode("utf-16-be", "replace")


def _parse_tounicode(data: bytes) -> Dict[int, str]:
    """Parse a /ToUnicode CMap stream (Adobe CMap syntax, the subset every
    generator emits): ``beginbfchar`` pairs and ``beginbfrange`` triples,
    including the array-destination form. Source codes are big-endian ints
    of any byte width (Identity-H uses 2); destinations are UTF-16BE."""
    out: Dict[int, str] = {}
    for m in _BFCHAR_RE.finditer(data):
        toks = [t[0] for t in _CMAP_TOKEN_RE.findall(m.group(1)) if t[0]]
        for i in range(0, len(toks) - 1, 2):
            out[int(toks[i], 16)] = _utf16be(toks[i + 1])
    for m in _BFRANGE_RE.finditer(data):
        toks = _CMAP_TOKEN_RE.findall(m.group(1))
        i = 0
        while i < len(toks):
            if not (toks[i][0] and i + 2 < len(toks) and toks[i + 1][0]):
                i += 1
                continue
            lo, hi = int(toks[i][0], 16), int(toks[i + 1][0], 16)
            hi = min(hi, lo + _TOUNICODE_CAP)
            if toks[i + 2][1]:  # '[' — explicit destination per code
                i += 3
                for code in range(lo, hi + 1):
                    if i >= len(toks) or toks[i][2]:
                        break
                    if toks[i][0]:
                        out[code] = _utf16be(toks[i][0])
                    i += 1
                while i < len(toks) and not toks[i][2]:
                    i += 1
                i += 1  # skip ']'
            else:
                dst = toks[i + 2][0]
                for k in range(hi - lo + 1):
                    out[lo + k] = _dst_plus(dst, k)
                i += 3
    return out


_FONT_RES_RE = re.compile(rb"/Font\s*(<<|\d+\s+\d+\s+R)")
_FONT_ENTRY_RE = re.compile(rb"/(\w+)\s+(\d+)\s+\d+\s+R")
_XOBJECT_RES_RE = re.compile(rb"/XObject\s*(<<|\d+\s+\d+\s+R)")
_RESOURCES_RE = re.compile(rb"/Resources\s*(<<|\d+\s+\d+\s+R)")
_TOUNICODE_REF_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")


def _resolve_dict(
    objects: Dict[int, _PdfObject], container: bytes, m: "re.Match"
) -> Optional[bytes]:
    """Resolve a ``<< ... >>`` found in place or a ``N 0 R`` reference to
    the dict bytes of the target (None if dangling/malformed)."""
    spec = m.group(1)
    if spec == b"<<":
        try:
            return _scan_dict(container, m.start(1))[0]
        except PdfParseError:
            return None
    ref = objects.get(int(spec.split()[0]))
    return ref.dict_bytes if ref is not None else None


def _page_cid_fonts(
    objects: Dict[int, _PdfObject],
    resources: Optional[bytes],
    file_key: Optional[bytes],
    cfm: str,
) -> Dict[str, Dict[int, str]]:
    """Map font resource name -> cid->text table for every Type0 font with
    a /ToUnicode CMap in the page's resources. Single-byte (simple) fonts
    are absent from the map and keep the latin-1 path; a Type0 font WITHOUT
    /ToUnicode decodes to U+FFFD per code (documented subset boundary — the
    reference's fitz reads the embedded font program instead).
    """
    if not resources:
        return {}
    fm = _FONT_RES_RE.search(resources)
    if fm is None:
        return {}
    font_dict = _resolve_dict(objects, resources, fm)
    if font_dict is None:
        return {}
    fonts: Dict[str, Dict[int, str]] = {}
    for name, num in _FONT_ENTRY_RE.findall(font_dict):
        fobj = objects.get(int(num))
        if fobj is None:
            continue
        st = re.search(rb"/Subtype\s*/(\w+)", fobj.dict_bytes)
        if st is None or st.group(1) != b"Type0":
            continue
        tm = _TOUNICODE_REF_RE.search(fobj.dict_bytes)
        cmap: Dict[int, str] = {}
        if tm is not None:
            cobj = objects.get(int(tm.group(1)))
            if cobj is not None and cobj.stream is not None:
                try:
                    cmap = _parse_tounicode(_decode_stream(cobj, file_key, cfm))
                except PdfParseError:
                    cmap = {}
        fonts[name.decode("latin-1")] = cmap
    return fonts


def _doc_off_ocgs(
    objects: Dict[int, _PdfObject], root_num: Optional[int]
) -> set:
    """Object numbers of optional-content groups switched OFF in the
    default configuration (ISO 32000-1 §8.11.4.3: catalog /OCProperties
    -> /D -> /OFF array). Empty set when the document has no optional
    content."""
    if root_num is None:
        return set()
    root = objects.get(root_num)
    if root is None:
        return set()
    m = re.search(rb"/OCProperties\s*(<<|\d+\s+\d+\s+R)", root.dict_bytes)
    if m is None:
        return set()
    ocp = _resolve_dict(objects, root.dict_bytes, m)
    if ocp is None:
        return set()
    dm = re.search(rb"/D\s*(<<|\d+\s+\d+\s+R)", ocp)
    if dm is None:
        return set()
    cfg = _resolve_dict(objects, ocp, dm)
    if cfg is None:
        return set()
    fm = re.search(rb"/OFF\s*\[", cfg)
    if fm is None:
        return set()
    end = cfg.find(b"]", fm.end() - 1)
    if end < 0:
        return set()
    return {int(r.group(1)) for r in _REF_RE.finditer(cfg[fm.end() - 1 : end])}


_PROPERTIES_RES_RE = re.compile(rb"/Properties\s*(<<|\d+\s+\d+\s+R)")


def _page_hidden_ocs(
    objects: Dict[int, _PdfObject],
    resources: Optional[bytes],
    off_ocgs: set,
) -> set:
    """Resource names in the page's /Properties dict that resolve to an
    OFF optional-content group — the names a ``/OC /name BDC`` mark uses.
    Empty when the page has no /Properties or nothing is switched off."""
    if not resources or not off_ocgs:
        return set()
    pm = _PROPERTIES_RES_RE.search(resources)
    if pm is None:
        return set()
    props = _resolve_dict(objects, resources, pm)
    if props is None:
        return set()
    return {
        name.decode("latin-1")
        for name, num in _FONT_ENTRY_RE.findall(props)
        if int(num) in off_ocgs
    }


def _page_image_xobjects(
    objects: Dict[int, _PdfObject],
    resources: Optional[bytes],
    file_key: Optional[bytes],
    cfm: str,
) -> Dict[str, Dict[str, Any]]:
    """Map XObject resource name -> image record for every /Subtype /Image
    entry in the page's resources (PDF 1.7 §8.9.5) — the scanned-page path
    the OCR fallback rasterizes. Pixel decode subset: 8-bit /DeviceGray
    through the standard filter chain (``gray`` = row-major bytes); any
    other colorspace/depth keeps the placement with ``gray=None`` (the
    rasterizer draws a flat box, and OCR sees no glyphs — the honest
    analogue of an unsupported image)."""
    if not resources:
        return {}
    xm = _XOBJECT_RES_RE.search(resources)
    if xm is None:
        return {}
    xdict = _resolve_dict(objects, resources, xm)
    if xdict is None:
        return {}
    images: Dict[str, Dict[str, Any]] = {}
    for name, num in _FONT_ENTRY_RE.findall(xdict):
        xobj = objects.get(int(num))
        if xobj is None or xobj.stream is None:
            continue
        st = re.search(rb"/Subtype\s*/(\w+)", xobj.dict_bytes)
        if st is None or st.group(1) != b"Image":
            continue
        wm = re.search(rb"/Width\s+(\d+)", xobj.dict_bytes)
        hm = re.search(rb"/Height\s+(\d+)", xobj.dict_bytes)
        if wm is None or hm is None:
            continue
        width, height = int(wm.group(1)), int(hm.group(1))
        gray: Optional[bytes] = None
        bpc = re.search(rb"/BitsPerComponent\s+(\d+)", xobj.dict_bytes)
        cs = re.search(rb"/ColorSpace\s*/(\w+)", xobj.dict_bytes)
        if (
            bpc is not None
            and bpc.group(1) == b"8"
            and cs is not None
            and cs.group(1) == b"DeviceGray"
        ):
            try:
                data = _decode_stream(xobj, file_key, cfm)
                if len(data) >= width * height:
                    gray = data[: width * height]
            except PdfParseError:
                gray = None
        images[name.decode("latin-1")] = {
            "width": width,
            "height": height,
            "gray": gray,
        }
    return images


def _page_form_xobjects(
    objects: Dict[int, _PdfObject],
    resources: Optional[bytes],
    file_key: Optional[bytes],
    cfm: str,
) -> Dict[str, bytes]:
    """Map XObject resource name -> decoded content bytes for every
    /Subtype /Form entry in the page's resources (PDF 1.7 §8.10: reusable
    content streams invoked by the ``Do`` operator — headers/footers/
    letterheads in real corpora). Image XObjects are surfaced separately
    (``_page_image_xobjects``) for the raster/OCR path.
    Subset boundary (documented): the form's own /Resources and /Matrix
    are ignored — forms inherit the page's fonts and draw in page
    coordinates, which is exactly how the synth fixtures emit them."""
    if not resources:
        return {}
    xm = _XOBJECT_RES_RE.search(resources)
    if xm is None:
        return {}
    xdict = _resolve_dict(objects, resources, xm)
    if xdict is None:
        return {}
    forms: Dict[str, bytes] = {}
    for name, num in _FONT_ENTRY_RE.findall(xdict):
        xobj = objects.get(int(num))
        if xobj is None or xobj.stream is None:
            continue
        st = re.search(rb"/Subtype\s*/(\w+)", xobj.dict_bytes)
        if st is None or st.group(1) != b"Form":
            continue
        try:
            forms[name.decode("latin-1")] = _decode_stream(xobj, file_key, cfm)
        except PdfParseError:
            continue
    return forms


def _find_root(data: bytes, objects: Dict[int, _PdfObject]) -> int:
    m = None
    for m in re.finditer(rb"trailer", data):
        pass  # take the last trailer
    if m is not None:
        i = _skip_ws(data, m.end())
        if data[i : i + 2] == b"<<":
            tdict, _ = _scan_dict(data, i)
            rm = _NAME_VAL_RE["Root"].search(tdict)
            if rm:
                return int(rm.group(1))
    # Cross-reference-stream PDFs (1.5+) have no 'trailer' keyword: the
    # trailer fields live in the /Type /XRef stream dictionary (§7.5.8).
    for num in sorted(objects):
        tm = _TYPE_RE.search(objects[num].dict_bytes)
        if tm and tm.group(1) == b"XRef":
            rm = _NAME_VAL_RE["Root"].search(objects[num].dict_bytes)
            if rm:
                return int(rm.group(1))
    # Fallback: first /Type /Catalog object, in object-number order.
    for num in sorted(objects):
        tm = _TYPE_RE.search(objects[num].dict_bytes)
        if tm and tm.group(1) == b"Catalog":
            return num
    raise PdfParseError("no document catalog")


_INFO_KEYS = ("Title", "Author", "Subject", "Producer", "CreationDate")


def document_info(data: bytes, objects: Dict[int, _PdfObject]) -> Dict[str, str]:
    """Document information dictionary (ISO 32000-1 §14.3.3): the /Info
    reference from the LAST ``trailer`` dict (or the /Type /XRef stream
    dict for cross-reference-stream files), with the standard string
    entries decoded latin-1 (PDFDocEncoding's ASCII range; UTF-16 metadata
    strings are out of subset). Missing dict or entries -> absent keys,
    never an error."""
    info_num = None
    m = None
    for m in re.finditer(rb"trailer", data):
        pass
    if m is not None:
        i = _skip_ws(data, m.end())
        if data[i : i + 2] == b"<<":
            tdict, _ = _scan_dict(data, i)
            rm = _NAME_VAL_RE["Info"].search(tdict)
            if rm:
                info_num = int(rm.group(1))
    if info_num is None:
        for num in sorted(objects):
            tm = _TYPE_RE.search(objects[num].dict_bytes)
            if tm and tm.group(1) == b"XRef":
                rm = _NAME_VAL_RE["Info"].search(objects[num].dict_bytes)
                if rm:
                    info_num = int(rm.group(1))
                    break
    obj = objects.get(info_num) if info_num is not None else None
    if obj is None:
        return {}
    out: Dict[str, str] = {}
    for key in _INFO_KEYS:
        s = _parse_string_entry(obj.dict_bytes, key.encode("ascii"))
        if s is not None:
            out[key] = s.decode("latin-1")
    return out


_ROTATE_RE = re.compile(rb"/Rotate\s+(-?\d+)")


def _page_order(objects: Dict[int, _PdfObject], root_num: int) -> List[tuple]:
    """Walk Catalog -> Pages -> Kids recursively, yielding
    ``(page_num, rotate, mediabox | None, resources_dict_bytes | None)``
    in document order.

    /Rotate, /MediaBox and /Resources are INHERITABLE page attributes (PDF
    1.7 §7.7.3.4): a value on an interior Pages node applies to every leaf
    beneath it unless the leaf overrides it, so the walk threads the
    current values down."""
    root = objects.get(root_num)
    if root is None:
        raise PdfParseError("dangling Root reference")
    pm = _NAME_VAL_RE["Pages"].search(root.dict_bytes)
    if pm is None:
        raise PdfParseError("catalog without Pages")

    pages: List[tuple] = []

    def walk(num: int, depth: int = 0, rotate: int = 0, box=None, res=None) -> None:
        if depth > 64:
            raise PdfParseError("page tree too deep")
        obj = objects.get(num)
        if obj is None:
            raise PdfParseError(f"dangling page-tree reference {num}")
        rm = _ROTATE_RE.search(obj.dict_bytes)
        if rm:
            rotate = int(rm.group(1)) % 360
        mb = _MEDIABOX_RE.search(obj.dict_bytes)
        if mb:
            box = tuple(float(x) for x in mb.groups())
        resm = _RESOURCES_RE.search(obj.dict_bytes)
        if resm:
            res = _resolve_dict(objects, obj.dict_bytes, resm) or res
        t = _TYPE_RE.search(obj.dict_bytes)
        tname = t.group(1) if t else b""
        if tname == b"Page":
            pages.append((num, rotate, box, res))
            return
        km = _KIDS_RE.search(obj.dict_bytes)
        if km is None:
            raise PdfParseError("Pages node without Kids")
        for rm2 in _REF_RE.finditer(km.group(1)):
            walk(int(rm2.group(1)), depth + 1, rotate, box, res)

    walk(int(pm.group(1)))
    if not pages:
        raise PdfParseError("empty page tree")
    return pages


def _content_bytes(
    objects: Dict[int, _PdfObject],
    page: _PdfObject,
    file_key: Optional[bytes] = None,
    cfm: str = "V2",
) -> bytes:
    refs: List[int] = []
    cm = _CONTENTS_REF_RE.search(page.dict_bytes)
    if cm:
        refs.append(int(cm.group(1)))
    else:
        am = _CONTENTS_ARR_RE.search(page.dict_bytes)
        if am:
            refs.extend(int(r.group(1)) for r in _REF_RE.finditer(am.group(1)))
    out = bytearray()
    for r in refs:
        obj = objects.get(r)
        if obj is None or obj.stream is None:
            raise PdfParseError(f"missing content stream {r}")
        out += _decode_stream(obj, file_key, cfm)
        out += b"\n"
    return bytes(out)


# --------------------------------------------------------------------------
# Content-stream tokenizer + text-operator interpreter
# --------------------------------------------------------------------------

_NUM_TOKEN_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_OP_TOKEN_RE = re.compile(rb"[A-Za-z'\"*]{1,3}")

_WS_BYTES = (b" ", b"\t", b"\r", b"\n", b"\f", b"\x00")
# binary payload terminator: whitespace + EI + token boundary (§8.9.7)
_INLINE_EI_RE = re.compile(rb"[\s\x00]EI(?![0-9A-Za-z])")


def _skip_inline_image(data: bytes, i: int) -> int:
    """Skip an inline image (ISO 32000-1 §8.9.7): ``BI <params> ID <binary>
    EI``. Called with ``i`` just past the BI operator; returns the offset
    past the closing EI. The parameter dict is consumed at TOKEN
    granularity (names/numbers/strings/arrays via the same readers as the
    main tokenizer), so an ``ID`` inside a string or name can't end the
    scan early; the binary payload then runs to the first
    whitespace-delimited EI. Without this, image bytes that happen to spell
    text operators (``(..) Tj``, ``BT``) would inject junk spans — the
    classic from-scratch-parser trap on scanned/overlay PDFs."""
    n = len(data)
    while i < n:
        c = data[i : i + 1]
        if c in _WS_BYTES:
            i += 1
            continue
        if c == b"(":
            _, i = _read_literal_string(data, i)
            continue
        if c == b"<":
            if data[i : i + 2] == b"<<":
                _, i = _scan_dict(data, i)
            else:
                _, i = _read_hex_string(data, i)
            continue
        if c == b"/":
            m = re.match(rb"/[^\s()<>\[\]/%]*", data[i:])
            i += m.end()
            continue
        if c in (b"[", b"]"):
            i += 1
            continue
        m = _NUM_TOKEN_RE.match(data, i)
        if m and m.end() > i:
            i = m.end()
            continue
        m = _OP_TOKEN_RE.match(data, i)
        if m:
            if m.group(0) == b"ID":
                i = m.end()
                if i < n and data[i : i + 1] in _WS_BYTES:
                    i += 1  # exactly one whitespace byte precedes the data
                e = _INLINE_EI_RE.search(data, i)
                return e.end() if e else n
            i = m.end()
            continue
        i += 1  # unknown byte — skip (tolerant)
    return n

_ESCAPES = {
    0x6E: b"\n",  # n
    0x72: b"\r",  # r
    0x74: b"\t",  # t
    0x62: b"\x08",  # b
    0x66: b"\x0c",  # f
    0x28: b"(",
    0x29: b")",
    0x5C: b"\\",
}


def _read_literal_string(data: bytes, i: int) -> Tuple[bytes, int]:
    """Read a ``(...)`` string starting at '('; returns (decoded bytes, next index)."""
    # Fast path: no escape and no nesting before the first ')' — the string
    # is exactly the raw slice (the overwhelmingly common case).
    end = data.find(b")", i + 1)
    if end >= 0:
        seg = data[i + 1 : end]
        if b"\\" not in seg and b"(" not in seg:
            return seg, end + 1
    out = bytearray()
    depth = 1
    j = i + 1
    n = len(data)
    while j < n:
        c = data[j]
        if c == 0x5C:  # backslash
            if j + 1 >= n:
                break
            e = data[j + 1]
            if e in _ESCAPES:
                out += _ESCAPES[e]
                j += 2
            elif 0x30 <= e <= 0x37:  # octal \ddd (1-3 digits)
                k = j + 1
                oct_digits = bytearray()
                while k < n and len(oct_digits) < 3 and 0x30 <= data[k] <= 0x37:
                    oct_digits.append(data[k])
                    k += 1
                out.append(int(oct_digits.decode(), 8) & 0xFF)
                j = k
            elif e in (0x0A, 0x0D):  # line continuation
                j += 2
                if e == 0x0D and j < n and data[j] == 0x0A:
                    j += 1
            else:
                out.append(e)
                j += 2
            continue
        if c == 0x28:
            depth += 1
            out.append(c)
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), j + 1
            out.append(c)
        else:
            out.append(c)
        j += 1
    raise PdfParseError("unterminated literal string")


def _read_hex_string(data: bytes, i: int) -> Tuple[bytes, int]:
    end = data.find(b">", i)
    if end < 0:
        raise PdfParseError("unterminated hex string")
    # §7.3.4.3 ignores whitespace; real viewers also skip any other
    # non-hex byte (fuzzed/corrupt streams) rather than failing the page.
    hex_digits = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1 : end])
    if len(hex_digits) % 2:
        hex_digits += b"0"
    return bytes.fromhex(hex_digits.decode("ascii")), end + 1


def _tokenize(data: bytes):
    """Yield ('num', float) | ('str', bytes) | ('name', bytes) | ('op', bytes)
    | ('[',) | (']',) tokens."""
    i = 0
    n = len(data)
    while i < n:
        c = data[i : i + 1]
        if c in (b" ", b"\t", b"\r", b"\n", b"\f", b"\x00"):
            i += 1
        elif c == b"(":
            s, i = _read_literal_string(data, i)
            yield ("str", s)
        elif c == b"<":
            if data[i : i + 2] == b"<<":
                d, i = _scan_dict(data, i)
                yield ("dict", d)
            else:
                s, i = _read_hex_string(data, i)
                yield ("str", s)
        elif c == b"[":
            yield ("[", None)
            i += 1
        elif c == b"]":
            yield ("]", None)
            i += 1
        elif c == b"/":
            m = re.match(rb"/[^\s()<>\[\]/%]*", data[i:])
            yield ("name", m.group(0))
            i += m.end()
        elif c == b"%":
            nl = data.find(b"\n", i)
            i = n if nl < 0 else nl + 1
        else:
            m = _NUM_TOKEN_RE.match(data, i)
            if m and m.end() > i:
                yield ("num", float(m.group(0)))
                i = m.end()
                continue
            m = _OP_TOKEN_RE.match(data, i)
            if m:
                if m.group(0) == b"BI":
                    # inline image: never yields tokens (no text content)
                    i = _skip_inline_image(data, m.end())
                    continue
                yield ("op", m.group(0))
                i = m.end()
            else:
                i += 1  # unknown byte — skip (tolerant)


@dataclass
class Span:
    """One emitted text run at a device position (y in PDF bottom-up coords)."""

    text: str
    x: float
    y: float
    size: float
    font: str
    mcid: Optional[int] = None  # innermost marked-content id (§14.6), for
                                # the logical-structure walk; None untagged


_MAX_FORM_DEPTH = 8  # Do-recursion bound (cyclic form refs must not hang)


def _interpret_text(
    content: bytes,
    cid_fonts: Optional[Dict[str, Dict[int, str]]] = None,
    xobjects: Optional[Dict[str, bytes]] = None,
    _depth: int = 0,
    simple_encodings: Optional[Dict[str, Dict[int, str]]] = None,
    hidden_ocs: Optional[set] = None,
    image_xobjects: Optional[Dict[str, Dict[str, Any]]] = None,
    image_out: Optional[List[Dict[str, Any]]] = None,
) -> List[Span]:
    """Execute the text operators of a content stream, emitting spans.

    Implements ``BT ET Tf Td TD Tm T* TL Tj TJ ' "``. Graphics-state
    operators outside text objects are ignored. TJ numbers adjust x by
    ``-n/1000 * size`` (the PDF kerning rule); strings advance x by an
    approximate glyph width (affects bboxes only, not text bytes).

    ``cid_fonts`` maps font resource names (Tf operand) to cid->text
    tables for composite (Type0/Identity-H) fonts: while such a font is
    selected, string bytes are 2-byte big-endian CIDs decoded through the
    table (unmapped cid -> U+FFFD); other fonts keep the single-byte
    latin-1 path. ``simple_encodings`` maps font names to byte->char
    /Differences override tables (bytes absent from the table keep
    latin-1).
    """
    spans: List[Span] = []
    stack: List[Any] = []
    in_array: Optional[List[Any]] = None
    # marked-content nesting (§14.6): one (hidden, mcid) per open BMC/BDC
    # scope; any hidden=True (an OFF optional-content /OC mark) suppresses
    # span output, and the innermost non-None mcid tags emitted spans for
    # the logical-structure (tagged-PDF) walk
    mc_stack: List[Tuple[bool, Optional[int]]] = []

    # Text state (only the translation components of the matrices matter for
    # the subset: no rotation/skew in fixtures; scale from Tm a/d applied to x/y).
    lx = ly = 0.0  # line matrix origin
    cx = cy = 0.0  # current point
    leading = 0.0
    size = 12.0
    font = "F1"
    in_text = False

    # Graphics state for image placement (§8.9.5: an image XObject draws
    # the unit square through the CTM): full 6-tuple affine so q/Q/cm
    # compose correctly even with rotation/shear in the wild.
    ctm = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    gstack: List[tuple] = []

    def emit(raw: bytes) -> None:
        nonlocal cx
        if not raw or any(h for h, _ in mc_stack):
            return
        cmap = cid_fonts.get(font) if cid_fonts else None
        if cmap is not None:
            text = "".join(
                cmap.get(int.from_bytes(raw[i : i + 2], "big"), "�")
                for i in range(0, len(raw) - 1, 2)
            )
        else:
            diff = simple_encodings.get(font) if simple_encodings else None
            if diff is not None:
                text = "".join(
                    diff.get(b, chr(b)) for b in raw
                )
            else:
                text = raw.decode("latin-1")
        if not text:
            return
        mcid = next(
            (m for _, m in reversed(mc_stack) if m is not None), None
        )
        spans.append(Span(text=text, x=cx, y=cy, size=size, font=font,
                          mcid=mcid))
        cx += GLYPH_WIDTH_FACTOR * size * len(text)

    def newline() -> None:
        nonlocal lx, ly, cx, cy
        ly -= leading
        cx, cy = lx, ly

    for tok in _tokenize(content):
        kind = tok[0]
        if kind == "[":
            in_array = []
            continue
        if kind == "]":
            stack.append(in_array)
            in_array = None
            continue
        if in_array is not None:
            if kind in ("num", "str"):
                in_array.append(tok[1] if kind == "num" else tok[1])
                if kind == "str":
                    in_array[-1] = tok[1]
            continue
        if kind in ("num", "str", "name", "dict"):
            stack.append(tok[1])
            continue

        op = tok[1]
        try:
            if op == b"BT":
                in_text = True
                lx = ly = cx = cy = 0.0
            elif op == b"ET":
                in_text = False
            elif op == b"Tf":
                size = float(stack[-1])
                fname = stack[-2]
                font = fname.decode("latin-1").lstrip("/") if isinstance(fname, bytes) else str(fname)
            elif op == b"Td":
                ty, tx = float(stack[-1]), float(stack[-2])
                lx += tx
                ly += ty
                cx, cy = lx, ly
            elif op == b"TD":
                ty, tx = float(stack[-1]), float(stack[-2])
                leading = -ty
                lx += tx
                ly += ty
                cx, cy = lx, ly
            elif op == b"Tm":
                f, e = float(stack[-1]), float(stack[-2])
                lx, ly = e, f
                cx, cy = lx, ly
            elif op == b"TL":
                leading = float(stack[-1])
            elif op == b"T*":
                newline()
            elif op == b"Tj":
                if in_text and isinstance(stack[-1], bytes):
                    emit(stack[-1])
            elif op == b"'":
                newline()
                if in_text and isinstance(stack[-1], bytes):
                    emit(stack[-1])
            elif op == b'"':
                # aw ac string "
                newline()
                if in_text and isinstance(stack[-1], bytes):
                    emit(stack[-1])
            elif op == b"TJ":
                arr = stack[-1]
                if in_text and isinstance(arr, list):
                    for el in arr:
                        if isinstance(el, bytes):
                            emit(el)
                        elif isinstance(el, float):
                            cx += -el / 1000.0 * size
            elif op == b"BMC":
                mc_stack.append((False, None))
            elif op == b"BDC":
                # /OC /name BDC hides the scope when the name resolves to
                # an OFF optional-content group; a <</MCID n>> property
                # dict tags the scope for the structure tree; any other
                # tag stays visible and untagged
                hid = False
                mcid: Optional[int] = None
                if len(stack) >= 2:
                    tag, props = stack[-2], stack[-1]
                    if (
                        hidden_ocs
                        and isinstance(tag, bytes) and tag == b"/OC"
                        and isinstance(props, bytes)
                        and not props.startswith(b"<<")
                        and props.decode("latin-1").lstrip("/") in hidden_ocs
                    ):
                        hid = True
                    if isinstance(props, bytes) and props.startswith(b"<<"):
                        mm = re.search(rb"/MCID\s+(\d+)", props)
                        if mm is not None:
                            mcid = int(mm.group(1))
                mc_stack.append((hid, mcid))
            elif op == b"EMC":
                if mc_stack:
                    mc_stack.pop()
            elif op == b"q":
                gstack.append(ctm)
            elif op == b"Q":
                if gstack:
                    ctm = gstack.pop()
            elif op == b"cm":
                a, b_, c, d, e, f = (float(v) for v in stack[-6:])
                A, B, C, D, E, F = ctm
                ctm = (
                    a * A + b_ * C,
                    a * B + b_ * D,
                    c * A + d * C,
                    c * B + d * D,
                    e * A + f * C + E,
                    e * B + f * D + F,
                )
            elif op == b"Do":
                fname = stack[-1]
                if not isinstance(fname, bytes):
                    pass
                else:
                    key = fname.decode("latin-1").lstrip("/")
                    img = image_xobjects.get(key) if image_xobjects else None
                    if img is not None:
                        # Image XObject: the unit square through the CTM is
                        # the placement rect (PDF-space, bottom-up).
                        if image_out is not None and not any(
                            h for h, _ in mc_stack
                        ):
                            A, B, C, D, E, F = ctm
                            xs = [E, A + E, C + E, A + C + E]
                            ys = [F, B + F, D + F, B + D + F]
                            image_out.append(
                                {
                                    "bbox_pdf": (
                                        min(xs), min(ys), max(xs), max(ys)
                                    ),
                                    "width": img["width"],
                                    "height": img["height"],
                                    "gray": img["gray"],
                                }
                            )
                    elif xobjects and _depth < _MAX_FORM_DEPTH:
                        # Form XObject invocation: interpret the form's
                        # content stream in place (page coordinates —
                        # subset contract of _page_form_xobjects),
                        # emitting into the same span list.
                        form = xobjects.get(key)
                        if form is not None and not any(h for h, _ in mc_stack):
                            spans.extend(
                                _interpret_text(form, cid_fonts, xobjects,
                                                _depth + 1, simple_encodings,
                                                hidden_ocs, image_xobjects,
                                                image_out)
                            )
        except (IndexError, ValueError, TypeError):
            # Malformed operand stack — tolerant skip (per-page failure
            # isolation happens at the caller).
            pass
        if kind == "op":
            stack.clear()

    return spans


# --------------------------------------------------------------------------
# Page assembly: spans -> lines -> columns -> blocks -> text + layout tree
# --------------------------------------------------------------------------


@dataclass
class Line:
    spans: List[Span]
    y_down: float  # top-down baseline

    @property
    def x0(self) -> float:
        return min(s.x for s in self.spans)

    @property
    def text(self) -> str:
        """Spans joined left-to-right; a space is inserted only when the
        horizontal gap between spans exceeds a quarter of the font size
        (TJ kerning adjustments produce sub-threshold gaps and must NOT
        split words)."""
        parts: List[str] = []
        prev_end: Optional[float] = None
        for s in sorted(self.spans, key=lambda s: s.x):
            if (
                parts
                and prev_end is not None
                and s.x - prev_end > 0.25 * s.size
                and not parts[-1].endswith(" ")
                and not s.text.startswith(" ")
            ):
                parts.append(" ")
            parts.append(s.text)
            prev_end = s.x + GLYPH_WIDTH_FACTOR * s.size * len(s.text)
        return "".join(parts)


# A horizontal gap between same-baseline spans larger than this many font
# sizes starts a new line segment (a column gutter, not a word space).
SEGMENT_GAP_FACTOR = 2.0


def _group_lines(spans: List[Span], page_height: float) -> List[Line]:
    """Group spans into visual lines: same baseline (within tolerance), then
    split each baseline run into segments wherever the x-gap exceeds the
    gutter threshold — so two-column text yields one Line per column."""
    by_y: List[List[Span]] = []
    ys: List[float] = []
    for s in sorted(spans, key=lambda s: (-s.y, s.x)):
        y_down = page_height - s.y
        for i, ly in enumerate(ys):
            if abs(ly - y_down) <= LINE_Y_TOLERANCE:
                by_y[i].append(s)
                break
        else:
            by_y.append([s])
            ys.append(y_down)

    lines: List[Line] = []
    for group, y_down in zip(by_y, ys):
        group.sort(key=lambda s: s.x)
        seg: List[Span] = []
        prev_end: Optional[float] = None
        for s in group:
            if seg and prev_end is not None and s.x - prev_end > SEGMENT_GAP_FACTOR * s.size:
                lines.append(Line(spans=seg, y_down=y_down))
                seg = []
            seg.append(s)
            prev_end = s.x + GLYPH_WIDTH_FACTOR * s.size * len(s.text)
        if seg:
            lines.append(Line(spans=seg, y_down=y_down))
    return lines


def _order_lines(lines: List[Line], page_width: float) -> List[Line]:
    """Reading order with gap-based two-column detection (left column first)."""
    if len(lines) < 4:
        return sorted(lines, key=lambda l: (l.y_down, l.x0))
    xs = sorted({round(l.x0, 1) for l in lines})
    best_gap = 0.0
    split_at = None
    for a, b in zip(xs, xs[1:]):
        if b - a > best_gap:
            best_gap = b - a
            split_at = (a + b) / 2.0
    if split_at is not None and best_gap >= COLUMN_GAP_FRACTION * page_width:
        left = [l for l in lines if l.x0 < split_at]
        right = [l for l in lines if l.x0 >= split_at]
        if len(left) >= 2 and len(right) >= 2:
            return sorted(left, key=lambda l: (l.y_down, l.x0)) + sorted(
                right, key=lambda l: (l.y_down, l.x0)
            )
    return sorted(lines, key=lambda l: (l.y_down, l.x0))


def _span_bbox(s: Span, page_height: float) -> List[float]:
    y_down = page_height - s.y
    return [
        round(s.x, 2),
        round(y_down - s.size, 2),
        round(s.x + GLYPH_WIDTH_FACTOR * s.size * len(s.text), 2),
        round(y_down, 2),
    ]


def _union_bbox(bboxes: List[List[float]]) -> List[float]:
    return [
        round(min(b[0] for b in bboxes), 2),
        round(min(b[1] for b in bboxes), 2),
        round(max(b[2] for b in bboxes), 2),
        round(max(b[3] for b in bboxes), 2),
    ]


@dataclass
class PdfPage:
    text: str
    layout: Dict[str, Any]
    # Image placements (scanned-page path): top-down-bbox dicts
    # {bbox, width, height, gray} consumed by the rasterizer/OCR ladder;
    # NOT serialized into layout_json (the layout tree stays
    # reference-shaped — fitz's get_text("dict") has no image pixels).
    images: List[Dict[str, Any]] = field(default_factory=list)


def _assemble_page(
    spans: List[Span], page_width: float, page_height: float, rotation: int = 0
) -> PdfPage:
    if not spans:
        return PdfPage(
            text="",
            layout={"width": page_width, "height": page_height, "rotation": rotation, "blocks": []},
        )

    lines = _order_lines(_group_lines(spans, page_height), page_width)

    # Blocks: consecutive (reading-order) lines with a small vertical gap.
    blocks: List[List[Line]] = []
    for line in lines:
        if blocks:
            prev = blocks[-1][-1]
            mean_size = max(s.size for s in prev.spans)
            same_col_gap = line.y_down - prev.y_down
            if 0 < same_col_gap <= BLOCK_GAP_FACTOR * mean_size:
                blocks[-1].append(line)
                continue
        blocks.append([line])

    layout_blocks = []
    text_lines: List[str] = []
    for blk in blocks:
        line_infos = []
        for line in blk:
            sorted_spans = sorted(line.spans, key=lambda s: s.x)
            span_infos = [
                {
                    "text": s.text,
                    "bbox": _span_bbox(s, page_height),
                    "font": s.font,
                    "size": round(s.size, 2),
                    "flags": 0,
                }
                for s in sorted_spans
            ]
            line_infos.append(
                {"bbox": _union_bbox([si["bbox"] for si in span_infos]), "spans": span_infos}
            )
            text_lines.append(line.text)
        layout_blocks.append(
            {"bbox": _union_bbox([li["bbox"] for li in line_infos]), "lines": line_infos}
        )

    layout = {
        "width": page_width,
        "height": page_height,
        "rotation": rotation,
        "blocks": layout_blocks,
    }
    return PdfPage(text="\n".join(text_lines), layout=layout)


# --------------------------------------------------------------------------
# Encryption (standard security handler, /V 1-2 — see functions/pdf_crypt.py)
# --------------------------------------------------------------------------

_ENCRYPT_REF_RE = re.compile(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R")
_ID_ARR_RE = re.compile(rb"/ID\s*\[\s*<([0-9A-Fa-f\s]*)>")
_INT_ENTRY = {
    name: re.compile(rb"/" + name.encode() + rb"\s+(-?\d+)")
    for name in ("V", "R", "Length", "P")
}


@dataclass
class PdfEncryptInfo:
    """Parsed /Encrypt dictionary (standard handler: RC4, AESV2, AESV3)."""

    v: int
    r: int
    key_len: int  # bytes
    o_entry: bytes
    u_entry: bytes
    p: int
    id0: bytes
    cfm: str = "V2"  # "V2" (RC4), "AESV2" (/V 4) or "AESV3" (/V 5)
    ue_entry: bytes = b""  # /V 5 wrapped file key (user path)
    oe_entry: bytes = b""  # /V 5 wrapped file key (owner path)
    perms_entry: bytes = b""  # /V 5 encrypted permissions echo


def _parse_string_entry(dict_bytes: bytes, name: bytes) -> Optional[bytes]:
    """Read a /Name entry whose value is a literal '(...)' or hex '<...>'
    string (the /O and /U entries)."""
    m = re.search(rb"/" + name + rb"\s*(\(|<)", dict_bytes)
    if m is None:
        return None
    i = m.end() - 1
    if dict_bytes[i : i + 1] == b"(":
        s, _ = _read_literal_string(dict_bytes, i)
        return s
    s, _ = _read_hex_string(dict_bytes, i)
    return s


def _find_encrypt_info(
    data: bytes, objects: Dict[int, _PdfObject]
) -> Optional[PdfEncryptInfo]:
    """Locate and parse the /Encrypt dictionary from the (last) trailer,
    or from a /Type /XRef stream dict when the file has no trailer keyword.

    Returns None for unencrypted documents; raises PdfParseError for
    encryption outside the supported subset (non-Standard handler, /V 5
    AESV3, unknown crypt filters) — counted failure, never junk text.
    Supported: /V 1-2 (RC4) and /V 4 with /StdCF /CFM of V2 (RC4) or AESV2
    (AES-128-CBC, functions/pdf_crypt.py).
    """
    # Trailer-field candidates: the (last) 'trailer' dict, else any
    # /Type /XRef stream dict (cross-reference-stream files, §7.5.8).
    candidates: List[bytes] = []
    m = None
    for m in re.finditer(rb"trailer", data):
        pass
    if m is not None:
        i = _skip_ws(data, m.end())
        if data[i : i + 2] == b"<<":
            candidates.append(_scan_dict(data, i)[0])
    for num in sorted(objects):
        tm = _TYPE_RE.search(objects[num].dict_bytes)
        if tm and tm.group(1) == b"XRef":
            candidates.append(objects[num].dict_bytes)
    tdict = em = None
    for tdict in candidates:
        em = _ENCRYPT_REF_RE.search(tdict)
        if em is not None:
            break
    if em is None:
        return None
    enc_obj = objects.get(int(em.group(1)))
    if enc_obj is None:
        raise PdfParseError("dangling /Encrypt reference")
    d = enc_obj.dict_bytes
    fm = re.search(rb"/Filter\s*/(\w+)", d)
    if fm is None or fm.group(1) != b"Standard":
        raise PdfParseError("unsupported encryption handler")
    v = int(_INT_ENTRY["V"].search(d).group(1)) if _INT_ENTRY["V"].search(d) else 0
    if v not in (1, 2, 4, 5):
        raise PdfParseError(f"unsupported encryption /V {v}")
    cfm = "V2"
    if v in (4, 5):
        cm = re.search(rb"/CFM\s*/(\w+)", d)
        cfm = cm.group(1).decode("ascii") if cm else "V2"
        if (v == 4 and cfm not in ("V2", "AESV2")) or (v == 5 and cfm != "AESV3"):
            raise PdfParseError(f"unsupported crypt filter /CFM {cfm}")
        if re.search(rb"/EncryptMetadata\s+false", d):
            # would append ffffffff to the key hash; outside the subset
            raise PdfParseError("unsupported /EncryptMetadata false")
    r = int(_INT_ENTRY["R"].search(d).group(1)) if _INT_ENTRY["R"].search(d) else 2
    if (v == 5 and r not in (5, 6)) or (v != 5 and r not in (2, 3, 4)):
        raise PdfParseError(f"unsupported encryption /R {r}")
    length_bits = 40
    lm = _INT_ENTRY["Length"].search(d)
    if lm:
        length_bits = int(lm.group(1))
    pm = _INT_ENTRY["P"].search(d)
    if pm is None:
        raise PdfParseError("encryption dictionary without /P")
    o_entry = _parse_string_entry(d, b"O")
    u_entry = _parse_string_entry(d, b"U")
    if o_entry is None or u_entry is None:
        raise PdfParseError("encryption dictionary without /O or /U")
    idm = _ID_ARR_RE.search(tdict)
    id0 = b""
    if idm:
        hex_digits = re.sub(rb"\s", b"", idm.group(1))
        if len(hex_digits) % 2:
            hex_digits += b"0"
        id0 = bytes.fromhex(hex_digits.decode("ascii"))
    ue_entry = oe_entry = perms_entry = b""
    if v == 5:
        ue_entry = _parse_string_entry(d, b"UE") or b""
        oe_entry = _parse_string_entry(d, b"OE") or b""
        perms_entry = _parse_string_entry(d, b"Perms") or b""
        if not ue_entry or not oe_entry:
            raise PdfParseError("/V 5 encryption dictionary without /UE or /OE")
    key_len = 32 if v == 5 else max(5, min(16, length_bits // 8))
    return PdfEncryptInfo(
        v=v, r=r, key_len=key_len,
        o_entry=o_entry, u_entry=u_entry, p=int(pm.group(1)), id0=id0,
        cfm=cfm, ue_entry=ue_entry, oe_entry=oe_entry, perms_entry=perms_entry,
    )


# --------------------------------------------------------------------------
# Public API
# --------------------------------------------------------------------------


class PdfDocument:
    """An opened PDF: scanned objects + page tree + (optional) encryption.

    The surface mirrors the fitz API the reference's password loop drives
    (``core_pdf_processor.py:295-306``): ``needs_pass`` is a static property
    of the document (encrypted AND the empty user password does not open
    it — PDFs encrypted with an empty user password open transparently,
    exactly as fitz reports ``needs_pass == False`` for them), and
    ``authenticate(pwd)`` tries the user then the owner password, arming the
    file key on success.
    """

    def __init__(self, payload: bytes) -> None:
        if payload[:5] != b"%PDF-":
            raise PdfParseError("missing %PDF- header")
        self._payload = payload
        self._objects = _scan_objects(payload)
        self._encrypt = _find_encrypt_info(payload, self._objects)
        self._file_key: Optional[bytes] = None
        if self._encrypt is None:
            _expand_object_streams(self._objects)
        else:
            # Empty-user-password docs open without a prompt. On success,
            # authenticate() expands any (encrypted) object streams and
            # resolves the root with the full object map.
            self.authenticate("")
        self.needs_pass: bool = self._encrypt is not None and self._file_key is None
        if self.needs_pass:
            # The catalog may live inside an encrypted ObjStm — defer root
            # resolution until a later authenticate() arms the key.
            try:
                self._root: Optional[int] = _find_root(payload, self._objects)
            except PdfParseError:
                self._root = None
        else:
            self._root = _find_root(payload, self._objects)

    @property
    def is_encrypted(self) -> bool:
        return self._encrypt is not None

    def info(self) -> Dict[str, str]:
        """Document information dictionary entries (Title/Author/...);
        empty for docs without /Info. Strings in encrypted documents are
        themselves encrypted and are out of subset -> empty dict there."""
        if self._encrypt is not None:
            return {}
        return document_info(self._payload, self._objects)

    def outline(self) -> List[Tuple[int, str]]:
        """Document outline (bookmarks, ISO 32000-1 §12.3.3): ``(depth,
        title)`` in reading order — depth 1 for top-level items. Walks the
        /Outlines -> /First -> /Next chains with a visited-set cycle guard
        and a depth cap (malformed trees terminate, never hang). Encrypted
        documents: titles are encrypted strings — out of subset, empty
        list (same boundary as info()/links())."""
        if self._encrypt is not None or self._root is None:
            return []
        root = self._objects.get(self._root)
        if root is None:
            return []
        om = re.search(rb"/Outlines\s+(\d+)\s+\d+\s+R", root.dict_bytes)
        if om is None:
            return []
        out: List[Tuple[int, str]] = []
        seen: set = set()

        def first_ref(d: bytes, key: bytes) -> Optional[int]:
            m = re.search(key + rb"\s+(\d+)\s+\d+\s+R", d)
            return int(m.group(1)) if m else None

        def walk(num: Optional[int], depth: int) -> None:
            while num is not None and num not in seen and depth <= 16:
                seen.add(num)
                item = self._objects.get(num)
                if item is None:
                    return
                tm = _TITLE_STR_RE.search(item.dict_bytes)
                if tm is not None:
                    raw, _ = _read_literal_string(item.dict_bytes, tm.end() - 1)
                    out.append((depth, raw.decode("latin-1")))
                walk(first_ref(item.dict_bytes, rb"/First"), depth + 1)
                num = first_ref(item.dict_bytes, rb"/Next")

        outlines = self._objects.get(int(om.group(1)))
        if outlines is None:
            return []
        walk(first_ref(outlines.dict_bytes, rb"/First"), 1)
        return out

    def attachments(self) -> List[Tuple[str, bytes]]:
        """Embedded file attachments (ISO 32000-1 §7.11.4 name tree:
        catalog /Names -> /EmbeddedFiles -> tree of /Names [(key) ref ...]
        pairs with optional /Kids nesting -> /Type /Filespec -> /EF /F
        stream). Returns (tree key, decoded bytes) in tree order; the
        stream passes through the normal filter chain (Flate etc.).
        Depth/visited guards terminate malformed trees; encrypted
        documents are out of subset (empty, the info()/links() boundary)."""
        if self._encrypt is not None or self._root is None:
            return []
        root = self._objects.get(self._root)
        if root is None:
            return []

        def dict_of(ref_or_inline: bytes, key: bytes) -> Optional[bytes]:
            """Value of ``key`` in a dict: inline << >> or indirect ref."""
            m = re.search(key + rb"\s+(\d+)\s+\d+\s+R", ref_or_inline)
            if m:
                o = self._objects.get(int(m.group(1)))
                return o.dict_bytes if o is not None else None
            m = re.search(key + rb"\s*<<", ref_or_inline)
            if m:
                d, _ = _scan_dict(ref_or_inline, m.end() - 2)
                return d
            return None

        names_dict = dict_of(root.dict_bytes, rb"/Names")
        if names_dict is None:
            return []
        ef_root = dict_of(names_dict, rb"/EmbeddedFiles")
        if ef_root is None:
            return []

        out: List[Tuple[str, bytes]] = []
        seen: set = set()

        def walk(node: bytes, depth: int) -> None:
            if depth > 8:
                return
            km = re.search(rb"/Kids\s*\[", node)
            if km:
                arr_start = km.end() - 1
                arr_end = node.index(b"]", arr_start)
                for rm in _REF_RE.finditer(node[arr_start:arr_end]):
                    num = int(rm.group(1))
                    if num in seen:
                        continue
                    seen.add(num)
                    child = self._objects.get(num)
                    if child is not None:
                        walk(child.dict_bytes, depth + 1)
                return
            nm = re.search(rb"/Names\s*\[", node)
            if nm is None:
                return
            i = nm.end()
            while i < len(node):
                i = _skip_ws(node, i)
                if i >= len(node) or node[i : i + 1] == b"]":
                    break
                if node[i : i + 1] != b"(":
                    break
                key_raw, i = _read_literal_string(node, i)
                i = _skip_ws(node, i)
                rm = _REF_RE.match(node[i:])
                if rm is None:
                    break
                i += rm.end()
                spec = self._objects.get(int(rm.group(1)))
                if spec is None:
                    continue
                em = re.search(rb"/EF\s*<<", spec.dict_bytes)
                if em is None:
                    continue
                efd, _ = _scan_dict(spec.dict_bytes, em.end() - 2)
                fm = re.search(rb"/F\s+(\d+)\s+\d+\s+R", efd)
                if fm is None:
                    continue
                stream_obj = self._objects.get(int(fm.group(1)))
                if stream_obj is None or stream_obj.stream is None:
                    continue
                try:
                    data = _decode_stream(stream_obj)
                except PdfParseError:
                    continue
                out.append((key_raw.decode("latin-1"), data))
        walk(ef_root, 0)
        return out

    def fonts(self) -> List[Tuple[int, str, str, str, int]]:
        """Font inventory (ISO 32000-1 §9.6-9.7): one ``(page_idx,
        resource_name, base_font, subtype, embedded)`` per /Font resource
        entry, pages in document order, entries in dict order. ``embedded``
        is 1 iff the font's descriptor carries a font program
        (/FontFile | /FontFile2 | /FontFile3); for /Type0 composite fonts
        the descriptor lives on the FIRST descendant CIDFont (§9.7.4) and
        the reported subtype stays Type0. Dangling font refs are skipped;
        /Resources inheritance comes from the _page_order walk. Encrypted
        documents work too (names/refs are not encrypted strings)."""
        if self._root is None:
            return []
        try:
            pages = _page_order(self._objects, self._root)
        except PdfParseError:
            return []
        out: List[Tuple[int, str, str, str, int]] = []
        for idx, (_, _, _, res) in enumerate(pages):
            if not res:
                continue
            fm = _FONT_RES_RE.search(res)
            if fm is None:
                continue
            font_dict = _resolve_dict(self._objects, res, fm)
            if font_dict is None:
                continue
            for name, num in _FONT_ENTRY_RE.findall(font_dict):
                fobj = self._objects.get(int(num))
                if fobj is None:
                    continue
                st = re.search(rb"/Subtype\s*/(\w+)", fobj.dict_bytes)
                bm = re.search(rb"/BaseFont\s*/([^\s/<>\[\]()]+)",
                               fobj.dict_bytes)
                desc_holder = fobj.dict_bytes
                if st is not None and st.group(1) == b"Type0":
                    dm = re.search(rb"/DescendantFonts\s*\[\s*(\d+)\s+\d+\s+R",
                                   fobj.dict_bytes)
                    if dm is not None:
                        child = self._objects.get(int(dm.group(1)))
                        if child is not None:
                            desc_holder = child.dict_bytes
                embedded = 0
                rm = re.search(rb"/FontDescriptor\s+(\d+)\s+\d+\s+R",
                               desc_holder)
                if rm is not None:
                    dobj = self._objects.get(int(rm.group(1)))
                    if dobj is not None and re.search(
                        rb"/FontFile[23]?\b", dobj.dict_bytes
                    ):
                        embedded = 1
                out.append((
                    idx,
                    name.decode("latin-1"),
                    bm.group(1).decode("latin-1") if bm else "",
                    st.group(1).decode("latin-1") if st else "",
                    embedded,
                ))
        return out

    def layers(self) -> List[Tuple[str, int]]:
        """Optional-content groups (ISO 32000-1 §8.11): ``(name, on)`` in
        /OCProperties /OCGs array order; ``on`` is 0 iff the group sits in
        the default configuration's /OFF list. Text inside a ``/OC`` mark
        of an OFF group is suppressed by extract_pages (the watermark /
        hidden-layer drop, the PDF twin of the hidden-HTML-subtree drop).
        Empty for documents without optional content."""
        if self._root is None:
            return []
        root = self._objects.get(self._root)
        if root is None:
            return []
        m = re.search(rb"/OCProperties\s*(<<|\d+\s+\d+\s+R)", root.dict_bytes)
        if m is None:
            return []
        ocp = _resolve_dict(self._objects, root.dict_bytes, m)
        if ocp is None:
            return []
        gm = re.search(rb"/OCGs\s*\[", ocp)
        if gm is None:
            return []
        end = ocp.find(b"]", gm.end() - 1)
        if end < 0:
            return []
        off = _doc_off_ocgs(self._objects, self._root)
        out: List[Tuple[str, int]] = []
        for r in _REF_RE.finditer(ocp[gm.end() - 1 : end]):
            obj = self._objects.get(int(r.group(1)))
            if obj is None:
                continue
            nm = re.search(rb"/Name\s*\(", obj.dict_bytes)
            if nm is None:
                continue
            raw, _ = _read_literal_string(obj.dict_bytes, nm.end() - 1)
            out.append((raw.decode("latin-1"),
                        0 if int(r.group(1)) in off else 1))
        return out

    def form_fields(self) -> List[Tuple[str, str, str, int]]:
        """Interactive form fields (AcroForm, ISO 32000-1 §12.7):
        ``(fully-qualified name, field type, value, flags)`` per TERMINAL
        field in /Fields-array DFS order. A node is terminal when none of
        its /Kids carries its own /T (kids without /T are widget
        annotations of the same field); non-terminal nodes contribute only
        their name segment (dot-joined). /FT and /V are inheritable —
        absent on a kid, the nearest ancestor's applies (§12.7.3.1).
        Values: literal strings decode latin-1; name values (checkbox /Yes,
        radio /opt1) drop the slash. Fields without /T are skipped (no
        addressable name). Encrypted documents are out of subset (empty,
        the info()/outline() boundary); visited/depth guards terminate
        malformed trees."""
        if self._encrypt is not None or self._root is None:
            return []
        root = self._objects.get(self._root)
        if root is None:
            return []

        def sub_dict(d: bytes, key: bytes) -> Optional[bytes]:
            m = re.search(key + rb"\s+(\d+)\s+\d+\s+R", d)
            if m:
                o = self._objects.get(int(m.group(1)))
                return o.dict_bytes if o is not None else None
            m = re.search(key + rb"\s*<<", d)
            if m:
                dd, _ = _scan_dict(d, m.end() - 2)
                return dd
            return None

        acro = sub_dict(root.dict_bytes, rb"/AcroForm")
        if acro is None:
            return []
        fm = re.search(rb"/Fields\s*\[", acro)
        if fm is None:
            return []
        fend = acro.find(b"]", fm.end() - 1)
        if fend < 0:  # unterminated array in a corrupt file
            return []
        arr = acro[fm.end() - 1 : fend + 1]

        def lit(d: bytes, key: bytes) -> Optional[str]:
            m = re.search(key + rb"\s*\(", d)
            if m is None:
                return None
            raw, _ = _read_literal_string(d, m.end() - 1)
            return raw.decode("latin-1")

        def name_tok(d: bytes, key: bytes) -> Optional[str]:
            m = re.search(key + rb"\s*/([^\s/<>\[\]()]+)", d)
            return m.group(1).decode("latin-1") if m else None

        out: List[Tuple[str, str, str, int]] = []
        seen: set = set()

        def kid_refs(d: bytes) -> List[int]:
            m = re.search(rb"/Kids\s*\[", d)
            if m is None:
                return []
            kend = d.find(b"]", m.end() - 1)
            if kend < 0:
                return []
            seg = d[m.end() - 1 : kend + 1]
            return [int(r.group(1)) for r in _REF_RE.finditer(seg)]

        def walk(num: int, prefix: str, ftype: str, value: str,
                 flags: int, depth: int) -> None:
            if depth > 8 or num in seen:
                return
            seen.add(num)
            obj = self._objects.get(num)
            if obj is None:
                return
            d = obj.dict_bytes
            t = lit(d, rb"/T")
            ftype = name_tok(d, rb"/FT") or ftype
            v = lit(d, rb"/V")
            if v is None:
                v = name_tok(d, rb"/V")
            value = v if v is not None else value
            fmatch = re.search(rb"/Ff\s+(\d+)", d)
            if fmatch:  # /Ff is inheritable like /FT and /V
                flags = int(fmatch.group(1))
            kids = kid_refs(d)
            named_kids = []
            for k in kids:
                ko = self._objects.get(k)
                if ko is not None and lit(ko.dict_bytes, rb"/T") is not None:
                    named_kids.append(k)
            qual = (prefix + "." + t if prefix and t else (t or prefix))
            if named_kids:
                for k in kids:
                    walk(k, qual, ftype, value, flags, depth + 1)
            elif t is not None:
                out.append((qual, ftype, value, flags))

        for r in _REF_RE.finditer(arr):
            walk(int(r.group(1)), "", "", "", 0, 0)
        return out

    def xmp(self) -> Dict[str, str]:
        """XMP metadata (ISO 32000-1 §14.3.2: catalog /Metadata -> /Subtype
        /XML stream with an RDF/XML packet). Returns the common provenance
        properties a corpus pipeline keys on: ``dc_title`` (first rdf:Alt
        item), ``dc_creator`` (first rdf:Seq item), ``create_date``
        (xmp:CreateDate text). Extraction is regex over the decoded packet
        — total on arbitrary bytes, no XML parser to error out — and
        whitespace inside property text is preserved verbatim. Missing
        packet/properties -> absent keys; encrypted documents are out of
        subset (empty, the info()/outline() boundary)."""
        if self._encrypt is not None or self._root is None:
            return {}
        root = self._objects.get(self._root)
        if root is None:
            return {}
        m = re.search(rb"/Metadata\s+(\d+)\s+\d+\s+R", root.dict_bytes)
        if m is None:
            return {}
        obj = self._objects.get(int(m.group(1)))
        if obj is None or obj.stream is None:
            return {}
        try:
            data = _decode_stream(obj)
        except PdfParseError:
            return {}
        out: Dict[str, str] = {}
        tm = re.search(
            rb"<dc:title>.*?<rdf:li[^>]*>(.*?)</rdf:li>", data, re.DOTALL
        )
        if tm:
            out["dc_title"] = tm.group(1).decode("utf-8", "replace")
        cm = re.search(
            rb"<dc:creator>.*?<rdf:li[^>]*>(.*?)</rdf:li>", data, re.DOTALL
        )
        if cm:
            out["dc_creator"] = cm.group(1).decode("utf-8", "replace")
        dm = re.search(rb"<xmp:CreateDate>(.*?)</xmp:CreateDate>", data, re.DOTALL)
        if dm:
            out["create_date"] = dm.group(1).decode("utf-8", "replace")
        return out

    def page_labels(self) -> List[str]:
        """Page labels (ISO 32000-1 §12.4.2): the /PageLabels number tree
        maps page-index ranges to label styles — front matter "i, ii, iii"
        then body "1, 2, ..." is the classic. Supported: /S /D (decimal),
        /r /R (roman), /a /A (letters), optional /P prefix and /St start;
        pages before the first range (malformed docs) fall back to their
        1-based decimal index. Returns one label per page in page order."""
        if self._encrypt is not None or self._root is None:
            return []
        root = self._objects.get(self._root)
        if root is None:
            return []
        try:
            n_pages = len(_page_order(self._objects, self._root))
        except PdfParseError:
            return []
        m = re.search(rb"/PageLabels\s+(\d+)\s+\d+\s+R", root.dict_bytes)
        if m:
            node = self._objects.get(int(m.group(1)))
            node_bytes = node.dict_bytes if node is not None else b""
        else:
            m = re.search(rb"/PageLabels\s*<<", root.dict_bytes)
            if not m:
                return []
            node_bytes, _ = _scan_dict(root.dict_bytes, m.end() - 2)

        nm = re.search(rb"/Nums\s*\[", node_bytes)
        if nm is None:
            return []
        i = nm.end()
        ranges: List[tuple] = []  # (start_index, style, prefix, start_num)
        while i < len(node_bytes):
            i = _skip_ws(node_bytes, i)
            if i >= len(node_bytes) or node_bytes[i : i + 1] == b"]":
                break
            im = re.match(rb"(\d+)", node_bytes[i:])
            if im is None:
                break
            idx = int(im.group(1))
            i += im.end()
            i = _skip_ws(node_bytes, i)
            if node_bytes[i : i + 2] == b"<<":
                d, i = _scan_dict(node_bytes, i)
            else:
                rm = _REF_RE.match(node_bytes[i:])
                if rm is None:
                    break
                i += rm.end()
                o = self._objects.get(int(rm.group(1)))
                d = o.dict_bytes if o is not None else b""
            sm = re.search(rb"/S\s*/(\w+)", d)
            style = sm.group(1).decode("ascii") if sm else ""
            pm = re.search(rb"/P\s*\(", d)
            prefix = ""
            if pm:
                raw, _ = _read_literal_string(d, pm.end() - 1)
                prefix = raw.decode("latin-1")
            stm = re.search(rb"/St\s+(\d+)", d)
            start = int(stm.group(1)) if stm else 1
            ranges.append((idx, style, prefix, start))

        ranges.sort()

        def roman(n: int) -> str:
            vals = [(1000, "m"), (900, "cm"), (500, "d"), (400, "cd"),
                    (100, "c"), (90, "xc"), (50, "l"), (40, "xl"),
                    (10, "x"), (9, "ix"), (5, "v"), (4, "iv"), (1, "i")]
            out = []
            for v, sym in vals:
                while n >= v:
                    out.append(sym)
                    n -= v
            return "".join(out)

        def letters(n: int) -> str:
            # a..z, aa..zz, ... (the spec's repetition style)
            q, r = divmod(n - 1, 26)
            return chr(ord("a") + r) * (q + 1)

        labels: List[str] = []
        for p in range(n_pages):
            rng_ = None
            for r in ranges:
                if r[0] <= p:
                    rng_ = r
                else:
                    break
            if rng_ is None:
                labels.append(str(p + 1))
                continue
            idx, style, prefix, start = rng_
            n = start + (p - idx)
            if style == "D":
                body = str(n)
            elif style == "r":
                body = roman(n)
            elif style == "R":
                body = roman(n).upper()
            elif style == "a":
                body = letters(n)
            elif style == "A":
                body = letters(n).upper()
            else:
                body = ""
            labels.append(prefix + body)
        return labels

    def links(self) -> List[Tuple[int, str]]:
        """External URI link annotations, in page order: ``(page_number
        1-based, uri)`` per /Subtype /Link annotation whose action is
        /S /URI (ISO 32000-1 §12.5.6.5, §12.6.4.7) — the PDF twin of the
        HTML outlink extractor, feeding the same web-graph operators.
        Internal GoTo links and non-link annotations contribute nothing.
        Encrypted documents: URI strings are themselves encrypted — out of
        subset, empty list (same boundary as info())."""
        if self._encrypt is not None or self._root is None:
            return []
        out: List[Tuple[int, str]] = []
        for idx, (pnum, _rot, _box, _res) in enumerate(
            _page_order(self._objects, self._root), start=1
        ):
            page = self._objects.get(pnum)
            if page is None:
                continue
            am = _ANNOTS_RE.search(page.dict_bytes)
            if am is None:
                continue
            for rm in _REF_RE.finditer(am.group(1)):
                annot = self._objects.get(int(rm.group(1)))
                if annot is None:
                    continue
                st = re.search(rb"/Subtype\s*/(\w+)", annot.dict_bytes)
                if st is None or st.group(1) != b"Link":
                    continue
                a_bytes = annot.dict_bytes
                aref = _ACTION_REF_RE.search(annot.dict_bytes)
                if aref is not None:
                    aobj = self._objects.get(int(aref.group(1)))
                    if aobj is None:
                        continue
                    a_bytes = aobj.dict_bytes
                if re.search(rb"/S\s*/URI\b", a_bytes) is None:
                    continue
                um = _URI_STR_RE.search(a_bytes)
                if um is None:
                    continue
                raw, _ = _read_literal_string(a_bytes, um.end() - 1)
                out.append((idx, raw.decode("latin-1")))
        return out

    def annotations(self) -> List[Tuple[int, str, str]]:
        """Comment/markup annotations with their /Contents note text, in
        page order: ``(page_number 1-based, subtype, contents)`` per
        annotation whose /Subtype is a markup kind carrying a /Contents
        literal string (ISO 32000-1 §12.5.6.4 /Text notes, §12.5.6.10
        text-markup Highlight/Underline/StrikeOut/Squiggly, §12.5.6.6
        /FreeText). Link/geometry annotations and markup annotations
        WITHOUT /Contents contribute nothing. Encrypted documents: the
        strings are encrypted — out of subset, empty list (the links()
        boundary)."""
        markup = {b"Text", b"Highlight", b"Underline", b"StrikeOut",
                  b"Squiggly", b"FreeText"}
        if self._encrypt is not None or self._root is None:
            return []
        out: List[Tuple[int, str, str]] = []
        for idx, (pnum, _rot, _box, _res) in enumerate(
            _page_order(self._objects, self._root), start=1
        ):
            page = self._objects.get(pnum)
            if page is None:
                continue
            am = _ANNOTS_RE.search(page.dict_bytes)
            if am is None:
                continue
            for rm in _REF_RE.finditer(am.group(1)):
                annot = self._objects.get(int(rm.group(1)))
                if annot is None:
                    continue
                st = re.search(rb"/Subtype\s*/(\w+)", annot.dict_bytes)
                if st is None or st.group(1) not in markup:
                    continue
                cm = re.search(rb"/Contents\s*\(", annot.dict_bytes)
                if cm is None:
                    continue
                raw, _ = _read_literal_string(annot.dict_bytes, cm.end() - 1)
                out.append((idx, st.group(1).decode("ascii"),
                            raw.decode("latin-1")))
        return out

    def authenticate(self, password: Optional[str]) -> bool:
        """Try ``password`` as user then owner password; arm the key on
        success. Idempotent; returns whether the document is now open."""
        if self._encrypt is None:
            return True
        if self._file_key is not None:
            return True
        from .pdf_crypt import (
            authenticate_owner_password,
            authenticate_owner_password_v5,
            authenticate_user_password,
            authenticate_user_password_v5,
        )

        e = self._encrypt
        if e.v == 5:
            pw = (password or "").encode("utf-8")
            key = authenticate_user_password_v5(
                pw, e.u_entry, e.ue_entry, e.r
            ) or authenticate_owner_password_v5(
                pw, e.o_entry, e.u_entry, e.oe_entry, e.r
            )
        else:
            pw = (password or "").encode("latin-1", "replace")
            key = authenticate_user_password(
                pw, e.o_entry, e.u_entry, e.p, e.id0, e.key_len, e.r
            ) or authenticate_owner_password(
                pw, e.o_entry, e.u_entry, e.p, e.id0, e.key_len, e.r
            )
        if key is None:
            return False
        if e.v == 5 and e.perms_entry:
            # Algorithm 13: /Perms echoes /P under the file key — a
            # mismatch means the dictionary was tampered after signing.
            from .pdf_crypt import verify_perms_v5

            if not verify_perms_v5(key, e.perms_entry, e.p):
                raise PdfParseError("/V 5 /Perms does not validate against /P")
        self._file_key = key
        # With the key armed, encrypted object streams become readable:
        # unpack them and resolve a root that was deferred in __init__.
        _expand_object_streams(self._objects, key, cfm=e.cfm)
        if getattr(self, "_root", None) is None:
            self._root = _find_root(self._payload, self._objects)
        return True

    def structure(self) -> List[Tuple[int, str, str]]:
        """Logical structure (tagged PDF, ISO 32000-1 §14.7-14.8):
        ``(index, role, text)`` per structure element in depth-first
        reading order. Roles pass through /RoleMap (one level — custom
        role -> standard); element text is the concatenation of the spans
        carrying the element's marked-content ids (/K integers), in /K
        order. Content OUTSIDE any structure element (/Artifact page
        chrome) never appears here even though plain extraction keeps it —
        the reading-order/accessibility view of the document. Empty for
        untagged PDFs. Subset: MCIDs resolve against the element's /Pg
        page (fixtures: every page), leaf /K forms int | ref | array of
        ints/refs."""
        if self._root is None:
            return []
        root = self._objects.get(self._root)
        if root is None:
            return []
        m = re.search(rb"/StructTreeRoot\s+(\d+)\s+\d+\s+R", root.dict_bytes)
        if m is None:
            return []
        st = self._objects.get(int(m.group(1)))
        if st is None:
            return []
        rolemap: Dict[bytes, bytes] = {}
        rm = re.search(rb"/RoleMap\s*(<<|\d+\s+\d+\s+R)", st.dict_bytes)
        if rm is not None:
            rmd = _resolve_dict(self._objects, st.dict_bytes, rm)
            if rmd is not None:
                for a, b in re.findall(
                    rb"/([^\s/<>\[\]()]+)\s*/([^\s/<>\[\]()]+)", rmd
                ):
                    rolemap[a] = b

        # mcid -> text, per page index (subset: fixture pages are unique
        # owners of their mcids; /Pg selects the page). A broken page tree
        # means no MCID can resolve: empty structure, not an exception
        # (the inventory-method totality contract).
        try:
            page_nums = _page_order(self._objects, self._root)
        except PdfParseError:
            return []
        cfm = self._encrypt.cfm if self._encrypt is not None else "V2"
        off_ocgs = _doc_off_ocgs(self._objects, self._root)
        by_page: Dict[int, Dict[int, str]] = {}
        for pnum, _rot, _box, resources in page_nums:
            texts: Dict[int, str] = {}
            try:
                content = _content_bytes(
                    self._objects, self._objects[pnum], self._file_key, cfm=cfm
                )
                spans = _interpret_text(
                    content,
                    _page_cid_fonts(self._objects, resources, self._file_key, cfm)
                    or None,
                    _page_form_xobjects(self._objects, resources, self._file_key, cfm)
                    or None,
                    simple_encodings=_page_simple_encodings(self._objects, resources)
                    or None,
                    hidden_ocs=_page_hidden_ocs(self._objects, resources, off_ocgs)
                    or None,
                )
            except PdfParseError:
                spans = []
            for sp in spans:
                if sp.mcid is not None:
                    texts[sp.mcid] = texts.get(sp.mcid, "") + sp.text
            by_page[pnum] = texts

        def k_items(dict_bytes: bytes) -> List[Tuple[str, int]]:
            """Parse /K: ('ref', obj) | ('mcid', n) items in order."""
            km = re.search(
                rb"/K\s*(\[[^\]]*\]|\d+\s+\d+\s+R|\d+)", dict_bytes
            )
            if km is None:
                return []
            body = km.group(1)
            if body.startswith(b"["):
                body = body[1:-1]
            items: List[Tuple[str, int]] = []
            for mm in re.finditer(rb"(\d+)\s+\d+\s+R|(\d+)", body):
                if mm.group(1) is not None:
                    items.append(("ref", int(mm.group(1))))
                else:
                    items.append(("mcid", int(mm.group(2))))
            return items

        out: List[Tuple[int, str, str]] = []
        seen: set = set()

        def walk(num: int) -> None:
            if num in seen or len(seen) > 10_000:  # cyclic/huge tree guard
                return
            seen.add(num)
            obj = self._objects.get(num)
            if obj is None:
                return
            sm = re.search(rb"/S\s*/([^\s/<>\[\]()]+)", obj.dict_bytes)
            role_raw = sm.group(1) if sm is not None else b""
            role = rolemap.get(role_raw, role_raw).decode("latin-1")
            pg = re.search(rb"/Pg\s+(\d+)\s+\d+\s+R", obj.dict_bytes)
            pnum = int(pg.group(1)) if pg is not None else (
                page_nums[0][0] if page_nums else -1
            )
            texts = by_page.get(pnum, {})
            mcids = [n for kind, n in k_items(obj.dict_bytes) if kind == "mcid"]
            if mcids:
                out.append((
                    len(out), role,
                    "".join(texts.get(n, "") for n in mcids),
                ))
            for kind, n in k_items(obj.dict_bytes):
                if kind == "ref":
                    walk(n)

        for kind, n in k_items(st.dict_bytes):
            if kind == "ref":
                walk(n)
        return out

    def extract_pages(self, max_pages: Optional[int] = None) -> List[PdfPage]:
        """Pages in document order (text + layout tree).

        Mirrors the reference doc loop (``core_pdf_processor.py:186-218``):
        ``total = len(doc) if max_pages is None else min(len(doc),
        max_pages)``; a failing page yields an empty PdfPage rather than
        poisoning the doc (per-page failure isolation, :202-209).
        """
        if self._encrypt is not None and self._file_key is None:
            raise PdfPasswordError("document requires a password")
        if self._root is None:  # deferred root never resolved (see __init__)
            raise PdfParseError("no document catalog")
        page_nums = _page_order(self._objects, self._root)
        total = len(page_nums) if max_pages is None else min(len(page_nums), max_pages)

        pages: List[PdfPage] = []
        default_box = (0.0, 0.0, 612.0, 792.0)
        cfm = self._encrypt.cfm if self._encrypt is not None else "V2"
        off_ocgs = _doc_off_ocgs(self._objects, self._root)
        for pnum, rotate, box, resources in page_nums[:total]:
            page_obj = self._objects[pnum]
            if box is None:
                box = default_box
            width = box[2] - box[0]
            height = box[3] - box[1]
            try:
                content = _content_bytes(
                    self._objects, page_obj, self._file_key, cfm=cfm,
                )
                cid_fonts = _page_cid_fonts(
                    self._objects, resources, self._file_key, cfm
                )
                xobjects = _page_form_xobjects(
                    self._objects, resources, self._file_key, cfm
                )
                image_xobjs = _page_image_xobjects(
                    self._objects, resources, self._file_key, cfm
                )
                simple_enc = _page_simple_encodings(self._objects, resources)
                hidden = _page_hidden_ocs(self._objects, resources, off_ocgs)
                placements: List[Dict[str, Any]] = []
                spans = _interpret_text(
                    content, cid_fonts or None, xobjects or None,
                    simple_encodings=simple_enc or None,
                    hidden_ocs=hidden or None,
                    image_xobjects=image_xobjs or None,
                    image_out=placements if image_xobjs else None,
                )
                page = _assemble_page(spans, width, height, rotate)
                for pl in placements:
                    x0, y0, x1, y1 = pl.pop("bbox_pdf")
                    pl["bbox"] = [x0, height - y1, x1, height - y0]
                    page.images.append(pl)
                pages.append(page)
            except PdfParseError:
                pages.append(
                    PdfPage(text="", layout={"width": width, "height": height, "rotation": rotate, "blocks": []})
                )
        return pages


def open_pdf(payload: bytes) -> PdfDocument:
    """Open a PDF for the caller's own password loop (the reference's
    ``fitz.open`` analogue). Document-structure failures raise
    ``PdfParseError`` for conversion into a parse_failure row."""
    return PdfDocument(payload)


def parse_pdf(
    payload: bytes,
    max_pages: Optional[int] = None,
    password: Optional[str] = None,
) -> List[PdfPage]:
    """One-shot convenience: open, authenticate with ``password`` (or none),
    extract. Raises ``PdfPasswordError`` if the document needs a password
    this call cannot supply."""
    doc = PdfDocument(payload)
    if doc.needs_pass:
        if password is None or not doc.authenticate(password):
            raise PdfPasswordError("document requires a password")
    return doc.extract_pages(max_pages)
