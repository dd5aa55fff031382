"""Vendored minimal imaging kernel — pure stdlib (zlib/struct) + numpy.

PNG decode (8-bit gray / RGB / palette / gray+alpha / RGBA, filter
types 0-4, non-interlaced), PNG encode (grayscale/RGB — test fixtures
and small sinks), Pillow's exact grayscale formula, and Pillow's
fixed-point BOX resample, so the REAL perceptual-hash decode path
(operators/multimodal.decode_image_pixels_real) EXECUTES in this
codec-free container instead of skipping. Where Pillow is installed it
is preferred at runtime and this module is pinned bit-exact against it
(tests/test_real_models.py::test_box_resize_matches_pil).

The arithmetic replicates publicly documented Pillow semantics:

- RGB→L (ITU-R 601-2, Pillow ``src/libImaging/Convert.c`` ``L24``):
  ``L = (R*19595 + G*38470 + B*7471 + 0x8000) >> 16``.
- BOX resample (Pillow ``src/libImaging/Resample.c``): per-axis box
  coefficients (support 0.5·scale, kernel 1 on (-0.5, 0.5]),
  normalized then quantized to ``PRECISION_BITS = 22`` fixed point
  (round-half-away), the accumulator seeded with a half ulp
  (``1 << 21``), ``clip8`` on the shift down; horizontal pass then
  vertical pass with an 8-bit intermediate image.

Reference parity context: the reference decodes with PIL before CLIP
(extract_clip_features.py:10-35); this vendored kernel is the engine's
dependency-free floor for the formats its own fixtures use (PNG), not
a general codec — JPEG et al. still require Pillow.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → raw channels per pixel (palette expands after unfilter)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

_PRECISION_BITS = 32 - 8 - 2  # Pillow Resample.c
_HALF = 1 << (_PRECISION_BITS - 1)
_CLIP_HI = 1 << _PRECISION_BITS << 8


# --------------------------------------------------------------------------
# PNG decode
# --------------------------------------------------------------------------


def is_png(data) -> bool:
    return (
        data is not None
        and len(data) >= 8
        and bytes(data[:8]) == _PNG_SIG
    )


def png_dims(data: bytes) -> tuple:
    """(width, height, n_channels) from the IHDR alone — the
    metadata-only parse (no inflate). Channel count follows PIL's
    ``len(img.getbands())`` per color type (palette images report 1,
    the P band, like PIL before a convert)."""
    if not is_png(data):
        raise ValueError("not a PNG payload")
    import struct as _struct

    w, h = _struct.unpack(">II", bytes(data[16:24]))
    color_type = data[25]
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"png: bad color type {color_type}")
    return w, h, channels


def png_decode(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to ``uint8`` pixels:
    ``(H, W)`` for grayscale, ``(H, W, C)`` otherwise (palette images
    expand to RGB). Raises ValueError on anything this minimal decoder
    does not speak (16-bit, interlaced, non-PNG)."""
    if not is_png(data):
        raise ValueError("not a PNG payload")
    data = bytes(data)
    pos = 8
    width = height = bit_depth = color_type = interlace = None
    idat: list[bytes] = []
    plte = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # fixture-grade decoder: CRC not verified
        if ctype == b"IHDR":
            (
                width, height, bit_depth, color_type,
                _comp, _filt, interlace,
            ) = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"PLTE":
            plte = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth}")
    if interlace:
        raise ValueError("interlaced PNG unsupported")
    nch = _CHANNELS.get(color_type)
    if nch is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if color_type == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")

    raw = zlib.decompress(b"".join(idat))
    stride = width * nch
    if len(raw) < (stride + 1) * height:
        raise ValueError("truncated PNG pixel data")

    out = np.empty((height, stride), dtype=np.uint8)
    prev = bytearray(stride)
    bpp = nch
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        cur = bytearray(raw[off + 1:off + 1 + stride])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                cur[x] = (cur[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = np.frombuffer(bytes(cur), dtype=np.uint8)
        prev = cur

    if color_type == 0:
        return out.reshape(height, width)
    if color_type == 3:
        return plte[out.reshape(height, width)]
    return out.reshape(height, width, nch)


# --------------------------------------------------------------------------
# PNG encode (grayscale / RGB)
# --------------------------------------------------------------------------


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def png_encode(arr, filters=0) -> bytes:
    """Encode a ``uint8`` array — ``(H, W)`` grayscale or
    ``(H, W, 3)`` RGB — as a PNG. ``filters`` is one filter type or a
    per-row list (0-4); the mixed-filter option exists so the decoder's
    every unfilter path is exercised by round-trip tests."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color, nch = 0, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color, nch = 2, 3
    else:
        raise ValueError("png_encode takes (H,W) gray or (H,W,3) RGB")
    h, w = arr.shape[:2]
    flat = arr.reshape(h, w * nch).astype(np.int32)
    row_filters = (
        [int(filters)] * h if isinstance(filters, int) else list(filters)
    )
    if len(row_filters) != h:
        raise ValueError("filters list must have one entry per row")

    bpp = nch
    zeros = np.zeros(bpp, dtype=np.int32)
    lines: list[bytes] = []
    prev = np.zeros(w * nch, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        left = np.concatenate([zeros, cur[:-bpp]]) if w * nch > bpp else (
            np.zeros_like(cur)
        )
        ft = row_filters[y]
        if ft == 0:
            enc = cur
        elif ft == 1:
            enc = (cur - left) % 256
        elif ft == 2:
            enc = (cur - prev) % 256
        elif ft == 3:
            enc = (cur - ((left + prev) >> 1)) % 256
        elif ft == 4:
            upleft = (
                np.concatenate([zeros, prev[:-bpp]])
                if w * nch > bpp
                else np.zeros_like(prev)
            )
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pr = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = (cur - pr) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        lines.append(bytes([ft]) + enc.astype(np.uint8).tobytes())
        prev = cur

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _chunk(b"IEND", b"")
    )


# --------------------------------------------------------------------------
# Pillow-parity grayscale + BOX resample
# --------------------------------------------------------------------------


def to_gray(arr: np.ndarray) -> np.ndarray:
    """Pillow ``convert("L")``: identity for single-band, the L band
    for LA, the ITU-R 601-2 fixed-point luma for RGB/RGBA (alpha
    ignored, as Pillow's rgb2l does)."""
    if arr.ndim == 2:
        return arr
    if arr.shape[2] == 2:  # LA
        return arr[:, :, 0]
    a = arr.astype(np.uint32)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(
        np.uint8
    )


def _box_coeffs(in_size: int, out_size: int):
    """Pillow precompute_coeffs + normalize_coeffs_8bpc for the BOX
    filter: per output index, (xmin, quantized int coefficients)."""
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 0.5 * filterscale
    ss = 1.0 / filterscale
    out = []
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        xmin = int(center - support + 0.5)
        if xmin < 0:
            xmin = 0
        xmax = int(center + support + 0.5)
        if xmax > in_size:
            xmax = in_size
        n = xmax - xmin
        k = []
        ww = 0.0
        for x in range(n):
            arg = (x + xmin - center + 0.5) * ss
            w = ss if -0.5 < arg <= 0.5 else 0.0  # box kernel
            k.append(w)
            ww += w
        if ww != 0.0:
            k = [v / ww for v in k]
        kk = np.asarray(
            [
                int(v * (1 << _PRECISION_BITS) + (0.5 if v >= 0 else -0.5))
                for v in k
            ],
            dtype=np.int64,
        )
        out.append((xmin, kk))
    return out


def _resample_cols(img: np.ndarray, out_size: int) -> np.ndarray:
    src = img.astype(np.int64)
    out = np.empty((img.shape[0], out_size), dtype=np.uint8)
    for xx, (xmin, kk) in enumerate(_box_coeffs(img.shape[1], out_size)):
        acc = _HALF + src[:, xmin:xmin + len(kk)] @ kk
        v = np.where(
            acc <= 0, 0, np.where(acc >= _CLIP_HI, 255, acc >> _PRECISION_BITS)
        )
        out[:, xx] = v.astype(np.uint8)
    return out


def box_resize(gray: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Pillow ``img.resize((out_w, out_h), Resampling.BOX)`` on a
    grayscale array: horizontal pass, then vertical, both fixed-point
    with the 8-bit intermediate (the pass order and intermediate
    clipping are part of the bit-exactness contract)."""
    img = np.asarray(gray, dtype=np.uint8)
    if img.shape[1] != out_w:
        img = _resample_cols(img, out_w)
    if img.shape[0] != out_h:
        img = _resample_cols(img.T, out_h).T
    return img


def gray_grid(payload: bytes, cols: int = 9, rows: int = 8) -> np.ndarray:
    """The full perceptual-hash decode kernel, Pillow-free: decode
    (PNG via this module; baseline JPEG via functions/jpeg.py — the
    reference corpus's format, extract_clip_features.py:68-84) →
    grayscale → BOX resize → flat ``int32`` grid of ``rows*cols``.
    Raises on unsupported payloads (callers degrade to the zero grid,
    the documented quarantine bucket)."""
    if is_png(payload):
        arr = png_decode(payload)
    else:
        from . import jpeg as _jpeg

        if not _jpeg.is_jpeg(payload):
            raise ValueError("unsupported image format (PNG/JPEG only)")
        arr = _jpeg.jpeg_decode(payload)
    g = box_resize(to_gray(arr), cols, rows)
    return g.astype(np.int32).reshape(rows * cols)
