"""Stdlib PNG codec (zlib + struct only - no PIL in this container).

Real (not stubbed) image decode for the multimodal stages: parses the
IHDR chunk, inflates the IDAT stream and reverses the five PNG scanline
filters (None/Sub/Up/Average/Paeth, RFC 2083 par.6) for 8-bit
greyscale / RGB / RGBA / greyscale+alpha, non-interlaced images - which
covers every PNG the deterministic media synthesizer emits and the
overwhelming majority of web images after content-type routing.

Unsupported shapes raise ``NotImplementedError`` with the exact reason
(16-bit channels, palette images, Adam7 interlace) - honest gaps, not
silent corruption.

Reference analog: the crawler's media plumbing treats payloads as opaque
binary columns; the decode stage is the Ray-side equivalent of the
content processors that sniff payloads before feature extraction.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(payload: bytes) -> bool:
    return payload[:8] == PNG_MAGIC


def _iter_chunks(payload: bytes):
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def png_info(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, bit_depth, color_type) from IHDR."""
    if not is_png(payload):
        raise ValueError("not a PNG payload")
    for ctype, data in _iter_chunks(payload):
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data[:13]
            )
            if interlace:
                raise NotImplementedError("Adam7-interlaced PNG not supported")
            return w, h, depth, color
    raise ValueError("PNG without IHDR chunk")


def _unfilter(raw: bytes, width: int, height: int, ch: int) -> np.ndarray:
    stride = width * ch
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).copy()
        pos += stride
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub (wrap-add == int cumsum mod 256)
            row = (
                np.cumsum(row.reshape(width, ch).astype(np.int64), axis=0) & 0xFF
            ).astype(np.uint8).reshape(stride)
        elif ftype == 2:  # Up
            row += prev
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(row[x - ch]) if x >= ch else 0
                row[x] = (row[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(row[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa_ = abs(p - a)
                pb = abs(p - b)
                pc = abs(p - c)
                if pa_ <= pb and pa_ <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                row[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError("unknown PNG filter type %d" % ftype)
        out[y] = row
        prev = row
    return out.reshape(height, width, ch)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, channels) uint8 array."""
    w, h, depth, color = png_info(payload)
    if depth != 8:
        raise NotImplementedError("only 8-bit PNG channels supported (got %d)" % depth)
    if color not in _CHANNELS:
        raise NotImplementedError(
            "palette PNG (color type %d) not supported" % color
        )
    ch = _CHANNELS[color]
    idat = b"".join(data for ctype, data in _iter_chunks(payload) if ctype == b"IDAT")
    if not idat:
        raise ValueError("PNG without IDAT data")
    raw = zlib.decompress(idat)
    expected = h * (1 + w * ch)
    if len(raw) != expected:
        raise ValueError("PNG raw stream size %d != expected %d" % (len(raw), expected))
    return _unfilter(raw, w, h, ch)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W) or (H, W, {1,2,3,4}) uint8 array -> PNG bytes (filter 0,
    one zlib stream) - the deterministic writer used by the media
    fixture synthesizer and the codec tests."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )
