"""Page -> image rendering (P14 stub-parity operator).

The reference renders a PDF page to a base64 PNG via fitz's rasterizer
(``backend/core/pdf_service.py:126-142``: ``page.get_pixmap(dpi=...)`` ->
``base64.b64encode(pix.tobytes("png"))``). No rasterizer or font engine
exists in this sandbox, so — mirroring the OCR-stub pattern — the operator
emits a deterministic PLACEHOLDER with ``render_ok=False``: a real, valid
grayscale PNG (written from scratch on stdlib zlib: signature + IHDR + IDAT
+ IEND with CRCs) at the page's aspect ratio, shaded by the page text's
sha256. Swapping in a real rasterizer changes only ``_render_placeholder``;
the Ray plumbing (schema, batch shape, base64 framing) is real and tested.
"""

from __future__ import annotations

import base64
import hashlib
import json
import struct
import zlib

import pyarrow as pa

THUMB_MAX_DIM = 64  # placeholder raster size cap (long edge, pixels)


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


def render_pages_batch(batch: pa.Table) -> pa.Table:
    """Batch transform over page-grain extraction output."""
    texts = batch["extracted_text"].to_pylist()
    layouts = batch["layout_json"].to_pylist()
    rows = []
    for url, page, text, lj in zip(
        batch["url"].to_pylist(), batch["page"].to_pylist(), texts, layouts
    ):
        r = render_page_placeholder(text or "", lj or "")
        r["url"] = url
        r["page"] = page
        rows.append(r)
    return pa.Table.from_pylist(rows, schema=RENDER_SCHEMA)
