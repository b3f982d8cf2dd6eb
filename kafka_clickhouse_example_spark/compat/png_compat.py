"""Vendored minimal PNG codec (pure Python, stdlib zlib only).

Purpose: this container ships no PIL/ffmpeg, so the REAL branch of
operators/multimodal.decode_payload could never execute — only the
synthetic/v1 fallback ran (round-3 verdict gap). PNG is the one raster
format decodable with nothing but the stdlib (DEFLATE via zlib, CRC via
zlib.crc32), so a ~100-line strict decoder makes the real-media plumbing
(decode -> dims -> features) executable and testable everywhere, while
PIL remains the preferred decoder whenever it IS importable
(multimodal._real_decoders tries PIL first).

Scope — deliberately minimal, strict, and honest:
- decode_size: signature + IHDR only (the metadata path; O(33 bytes)).
- decode_rgb: full pixel decode for NON-INTERLACED, 8-bit-depth
  grayscale / RGB / RGBA / gray+alpha (color types 0, 2, 4, 6) — inflate
  IDAT, reverse the five standard scanline filters, return row-major
  bytes. Palette (3) and interlaced images raise NotImplementedError:
  a wrong-pixels silent path is worse than a loud boundary.
- encode_rgb: matching encoder (filter 0, one IDAT) used by tests and
  fixture builders to produce REAL PNGs to decode.

Everything raises ValueError on malformed bytes, so decode_payload's
try/except cleanly falls back to the synthetic path for the synthetic
corpus.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# bytes per pixel for the supported 8-bit color types
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunks(payload: bytes):
    """Yield (type, data) chunks, validating structure and CRC."""
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > n:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _ihdr(payload: bytes) -> tuple[int, int, int, int, int]:
    for ctype, data in _chunks(payload):
        if ctype != b"IHDR":
            raise ValueError("first PNG chunk is not IHDR")
        if len(data) != 13:
            raise ValueError("bad IHDR length")
        w, h, depth, color, _comp, _filt, interlace = struct.unpack(
            ">IIBBBBB", data
        )
        if w < 1 or h < 1:
            raise ValueError("bad PNG dimensions")
        return w, h, depth, color, interlace
    raise ValueError("empty PNG")


def decode_size(payload: bytes) -> tuple[int, int]:
    """(width, height) from the IHDR — the metadata-only decode."""
    w, h, _, _, _ = _ihdr(payload)
    return w, h


def decode_rgb(payload: bytes) -> tuple[int, int, int, bytes]:
    """Full pixel decode -> (width, height, channels, row-major bytes).

    Supports non-interlaced 8-bit gray/RGB/gray+alpha/RGBA; anything else
    raises NotImplementedError (loud boundary, never wrong pixels).
    Malformed bytes — including corrupt DEFLATE streams — raise
    ValueError per the module contract.

    One chunk walk: IHDR is taken from the first chunk and IDAT
    accumulates in the same pass (this runs per row inside mapInPandas —
    a second parse + CRC sweep doubled the per-image fixed cost).
    """
    header = None
    idat = []
    for ctype, data in _chunks(payload):
        if header is None:
            if ctype != b"IHDR":
                raise ValueError("first PNG chunk is not IHDR")
            if len(data) != 13:
                raise ValueError("bad IHDR length")
            header = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
    if header is None:
        raise ValueError("empty PNG")
    w, h, depth, color, _comp, _filt, interlace = header
    if w < 1 or h < 1:
        raise ValueError("bad PNG dimensions")
    if depth != 8:
        raise NotImplementedError(f"bit depth {depth} not supported")
    if color not in _CHANNELS:
        raise NotImplementedError(f"color type {color} (palette?) not supported")
    if interlace != 0:
        raise NotImplementedError("interlaced PNG not supported")
    bpp = _CHANNELS[color]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt IDAT stream: {exc}") from exc
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size does not match dimensions")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                line[i] = (line[i] + pr) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return w, h, bpp, bytes(out)


def encode_rgb(
    width: int, height: int, pixels: bytes, channels: int = 3
) -> bytes:
    """Encode row-major 8-bit pixels as a real PNG (filter 0, one IDAT).

    The inverse of decode_rgb for the supported shapes; used by tests and
    fixture builders so the real-decode branch has real bytes to decode.
    """
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color is None:
        raise ValueError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    stride = width * channels

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )
