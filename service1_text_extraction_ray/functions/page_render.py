"""Page -> image rendering (P14: real text raster + placeholder fallback).

The reference renders a PDF page to a base64 PNG via fitz's rasterizer
(``backend/core/pdf_service.py:126-142``: ``page.get_pixmap(dpi=...)`` ->
``base64.b64encode(pix.tobytes("png"))``). This sandbox has no fitz/font
engine, so the raster is built from scratch:

- **Text pages** (layout tree with blocks): a real monochrome rasterization
  — every span's text drawn with the 5x7 bitmap font (functions/bitfont.py)
  at its bbox position, glyph pixel scale derived from the span's font
  size. Emitted with ``render_ok=True``; the same code path (at the
  reference's 2x zoom, ``core_pdf_processor.py:944-960`` ``Matrix(2, 2)``)
  feeds the OCR fallback ladder (functions/ocr.py).
- **Image placements** (scanned pages — image XObjects surfaced by
  functions/pdf_extract.py) are blitted nearest-neighbor into their CTM
  rect; undecodable images draw as a flat gray box.
- **Pages with no layout** keep the round-1 deterministic PLACEHOLDER
  (uniform shade from the text's sha256, ``render_ok=False``).

The PNG codec is stdlib-only (zlib + struct): the writer emits filter-0
rows; the reader handles all five ISO filters so it can round-trip any
well-formed 8-bit grayscale PNG, not just our own.
"""

from __future__ import annotations

import base64
import hashlib
import json
import struct
import zlib
from typing import Any, Dict, List, Optional

import numpy as np
import pyarrow as pa

from .bitfont import ADVANCE, GLYPH_H, GLYPH_W, render_text_bitmap

THUMB_MAX_DIM = 64  # placeholder raster size cap (long edge, pixels)
RENDER_SCALE = 1.0  # render_pages operator: 1 pt = 1 px
OCR_SCALE = 2.0  # OCR ladder: the reference's Matrix(2, 2) 2x zoom
# Font-size (pt) that maps to glyph pixel scale k=1 at scale 1.0: a 10 pt
# span renders its 7-row glyphs 7 px tall, matching small print.
PT_PER_GLYPH_SCALE = 10.0


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def write_gray_png(width: int, height: int, shade: int) -> bytes:
    """Minimal valid 8-bit grayscale PNG of one uniform shade."""
    width, height = max(1, width), max(1, height)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    scanline = b"\x00" + bytes([shade & 0xFF]) * width  # filter 0 per row
    idat = zlib.compress(scanline * height, 6)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def write_gray_png_array(arr: np.ndarray) -> bytes:
    """8-bit grayscale PNG of a 2-D uint8 array (filter 0 every row)."""
    if arr.ndim != 2:
        raise ValueError("expected a 2-D grayscale array")
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = np.empty((h, w + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = a
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def read_gray_png(png: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale PNG to a 2-D uint8 array.

    Stdlib-only inverse of ``write_gray_png_array``; implements all five
    ISO/IEC 15948 scanline filters (None/Sub/Up/Average/Paeth) so any
    conforming encoder's output round-trips, not just our filter-0 rows.
    Raises ValueError on ANY truncated/corrupt input (the per-row
    failure-isolation contract, same wrapper as ``read_gif``): a truncated
    IHDR would otherwise leak struct.error, corrupt IDAT zlib.error.
    """
    try:
        return _read_gray_png_inner(png)
    except (struct.error, zlib.error, IndexError) as e:
        raise ValueError(f"truncated/corrupt PNG: {e}") from e


def _read_gray_png_inner(png: bytes) -> np.ndarray:
    if png[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    i, w, h, idat = 8, None, None, b""
    while i + 8 <= len(png):
        (length,) = struct.unpack(">I", png[i : i + 4])
        tag = png[i + 4 : i + 8]
        payload = png[i + 8 : i + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 0:
                raise ValueError("only 8-bit grayscale supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        i += 12 + length
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(idat)
    if len(raw) != h * (w + 1):
        raise ValueError("IDAT size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, w + 1)
    out = np.zeros((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        ftype, line = int(rows[y, 0]), rows[y, 1:].astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: left-dependent
            cur = np.zeros(w, dtype=np.int32)
            left = 0
            for x in range(w):
                up = int(prev[x])
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) // 2
                else:
                    ul = int(prev[x - 1]) if x else 0
                    p = left + up - ul
                    pa_, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa_ <= pb and pa_ <= pc) else (up if pb <= pc else ul)
                cur[x] = (int(line[x]) + pred) & 0xFF
                left = int(cur[x])
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = out[y]
    return out


def glyph_scale(font_size: float, scale: float) -> int:
    """Integer glyph pixel scale for a span's font size at raster scale."""
    return max(1, int(round(font_size * scale / PT_PER_GLYPH_SCALE)))


def rasterize_page(
    layout: Dict[str, Any],
    images: Optional[List[Dict[str, Any]]] = None,
    scale: float = RENDER_SCALE,
) -> np.ndarray:
    """Rasterize a parsed page (layout tree + image placements) to a 2-D
    uint8 canvas, white=255 / ink=0.

    Spans draw with the 5x7 bitmap font top-aligned at their bbox origin;
    glyph pixel scale ``k = round(size*scale/10)`` so the OCR backend's
    block-reduce downsample inverts the np.kron upsample exactly.
    Non-ASCII characters advance blank (documented raster subset). Image
    placements blit nearest-neighbor; images whose pixels could not be
    decoded fill a flat gray 160 box.
    """
    page_w = float(layout.get("width") or 612.0)
    page_h = float(layout.get("height") or 792.0)
    W = max(1, int(round(page_w * scale)))
    H = max(1, int(round(page_h * scale)))
    canvas = np.full((H, W), 255, dtype=np.uint8)

    for img in images or []:
        bbox = img.get("bbox") or [0, 0, 0, 0]
        x0 = max(0, int(round(bbox[0] * scale)))
        y0 = max(0, int(round(bbox[1] * scale)))
        x1 = min(W, int(round(bbox[2] * scale)))
        y1 = min(H, int(round(bbox[3] * scale)))
        if x1 <= x0 or y1 <= y0:
            continue
        gray = img.get("gray")
        iw, ih = int(img.get("width") or 0), int(img.get("height") or 0)
        if gray is None or iw <= 0 or ih <= 0 or len(gray) < iw * ih:
            canvas[y0:y1, x0:x1] = 160
            continue
        src = np.frombuffer(gray, dtype=np.uint8, count=iw * ih).reshape(ih, iw)
        ys = (np.arange(y1 - y0) * ih // (y1 - y0)).clip(0, ih - 1)
        xs = (np.arange(x1 - x0) * iw // (x1 - x0)).clip(0, iw - 1)
        canvas[y0:y1, x0:x1] = src[np.ix_(ys, xs)]

    for block in layout.get("blocks", []):
        for line in block.get("lines", []):
            for span in line.get("spans", []):
                text = span.get("text") or ""
                if not text.strip():
                    continue
                bbox = span.get("bbox") or [0, 0, 0, 0]
                k = glyph_scale(float(span.get("size") or 12.0), scale)
                bmp = render_text_bitmap(text, k)
                y0 = int(round(bbox[1] * scale))
                x0 = int(round(bbox[0] * scale))
                bh, bw = bmp.shape
                cy0, cx0 = max(0, y0), max(0, x0)
                cy1, cx1 = min(H, y0 + bh), min(W, x0 + bw)
                if cy1 <= cy0 or cx1 <= cx0:
                    continue
                sub = bmp[cy0 - y0 : cy1 - y0, cx0 - x0 : cx1 - x0]
                region = canvas[cy0:cy1, cx0:cx1]
                region[sub] = 0
    return canvas


def render_page_placeholder(text: str, layout_json: str) -> dict:
    """Deterministic placeholder render of one extracted page."""
    page_w, page_h = 612.0, 792.0  # letter default (pdf_extract default box)
    if layout_json:
        try:
            layout = json.loads(layout_json)
            page_w = float(layout.get("width") or page_w)
            page_h = float(layout.get("height") or page_h)
        except (ValueError, TypeError):
            pass
    scale = THUMB_MAX_DIM / max(page_w, page_h, 1.0)
    px_w = max(1, int(round(page_w * scale)))
    px_h = max(1, int(round(page_h * scale)))
    shade = hashlib.sha256(text.encode("utf-8")).digest()[0]
    png = write_gray_png(px_w, px_h, shade)
    return {
        "png_b64": base64.b64encode(png).decode("ascii"),
        "width_px": px_w,
        "height_px": px_h,
        "render_ok": False,  # placeholder, not a real rasterization
    }


RENDER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("page", pa.int32()),
        ("png_b64", pa.string()),
        ("width_px", pa.int32()),
        ("height_px", pa.int32()),
        ("render_ok", pa.bool_()),
    ]
)


def render_page(text: str, layout_json: str) -> dict:
    """Render one extracted page: a real bitmap-font rasterization when a
    layout tree with blocks is available (``render_ok=True``), else the
    deterministic placeholder (``render_ok=False``)."""
    layout = None
    if layout_json:
        try:
            layout = json.loads(layout_json)
        except (ValueError, TypeError):
            layout = None
    if not layout or not layout.get("blocks"):
        return render_page_placeholder(text or "", layout_json or "")
    canvas = rasterize_page(layout, scale=RENDER_SCALE)
    return {
        "png_b64": base64.b64encode(write_gray_png_array(canvas)).decode("ascii"),
        "width_px": int(canvas.shape[1]),
        "height_px": int(canvas.shape[0]),
        "render_ok": True,
    }


def render_pages_batch(batch: pa.Table) -> pa.Table:
    """Batch transform over page-grain extraction output."""
    texts = batch["extracted_text"].to_pylist()
    layouts = batch["layout_json"].to_pylist()
    rows = []
    for url, page, text, lj in zip(
        batch["url"].to_pylist(), batch["page"].to_pylist(), texts, layouts
    ):
        r = render_page(text or "", lj or "")
        r["url"] = url
        r["page"] = page
        rows.append(r)
    return pa.Table.from_pylist(rows, schema=RENDER_SCHEMA)
