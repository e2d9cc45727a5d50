"""Real media codecs from the Python standard library — no external
imaging/audio dependency needed for these two formats:

- **WAV** (RIFF PCM) via ``wave``: sample rate / channels / 16-bit
  PCM frames.
- **PNG** via ``zlib`` + the PNG spec: chunk walk, IDAT inflate, and
  all five scanline filters (None/Sub/Up/Average/Paeth) un-applied,
  8-bit depth, gray/RGB/RGBA/gray+alpha.

These are per-payload pure functions; the distributed shape wraps
them in ``mapInPandas`` (operators/multimodal.py:decode_media), which
is exactly where a PIL/ffmpeg call would sit for the formats that do
need external libs. Encoders exist so tests and queries can
round-trip deterministic payloads without fixtures on disk.
"""

from __future__ import annotations

import array
import io
import struct
import wave
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+alpha, RGBA


def decode_wav_bytes(payload: bytes) -> tuple[int, int, list[int]]:
    """(sample_rate, n_channels, samples) from 16-bit PCM WAV bytes.
    Interleaved channels are returned as-is."""
    with wave.open(io.BytesIO(payload)) as w:
        if w.getsampwidth() != 2:
            raise ValueError(f"only 16-bit PCM supported, got {w.getsampwidth()*8}-bit")
        rate, nch = w.getframerate(), w.getnchannels()
        frames = w.readframes(w.getnframes())
    samples = array.array("h")
    samples.frombytes(frames)
    if array.array("h", [1]).tobytes() != b"\x01\x00":  # big-endian host
        samples.byteswap()
    return rate, nch, samples.tolist()


def encode_wav(samples: list[int], sample_rate: int, n_channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        pcm = array.array("h", samples)
        if array.array("h", [1]).tobytes() != b"\x01\x00":
            pcm.byteswap()
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_png_bytes(payload: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, raster) from 8-bit PNG bytes; raster
    is row-major interleaved samples after defiltering."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, header = 8, b"", None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            header = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if header is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = header
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0 or color not in _CHANNELS:
        raise ValueError(f"unsupported PNG variant (depth={depth} color={color})")
    ch = _CHANNELS[color]
    raw = zlib.decompress(idat)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("bad IDAT length")
    out = bytearray()
    prev = bytearray(stride)
    i = 0
    for _row in range(h):
        ft = raw[i]
        cur = bytearray(raw[i + 1 : i + 1 + stride])
        i += 1 + stride
        if ft == 1:  # Sub
            for x in range(ch, stride):
                cur[x] = (cur[x] + cur[x - ch]) & 0xFF
        elif ft == 2:  # Up
            for x in range(stride):
                cur[x] = (cur[x] + prev[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad filter byte {ft}")
        out += cur
        prev = cur
    return w, h, ch, bytes(out)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    raster: bytes, width: int, height: int, channels: int = 1, filter_type: int = 0
) -> bytes:
    """8-bit PNG encoder (test/fixture path). ``filter_type`` applies
    ONE filter to every scanline (0..4) so the decoder's un-filtering
    of each type can be exercised; real encoders pick per-row."""
    color = {1: 0, 3: 2, 2: 4, 4: 6}[channels]
    stride = width * channels
    if len(raster) != height * stride:
        raise ValueError("raster size mismatch")
    rows = bytearray()
    prev = bytearray(stride)
    for r in range(height):
        cur = bytearray(raster[r * stride : (r + 1) * stride])
        filtered = bytearray(cur)
        if filter_type == 1:
            for x in range(stride - 1, channels - 1, -1):
                filtered[x] = (cur[x] - cur[x - channels]) & 0xFF
        elif filter_type == 2:
            for x in range(stride):
                filtered[x] = (cur[x] - prev[x]) & 0xFF
        elif filter_type == 3:
            for x in range(stride):
                left = cur[x - channels] if x >= channels else 0
                filtered[x] = (cur[x] - ((left + prev[x]) >> 1)) & 0xFF
        elif filter_type == 4:
            for x in range(stride):
                a = cur[x - channels] if x >= channels else 0
                b = prev[x]
                c = prev[x - channels] if x >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                filtered[x] = (cur[x] - pred) & 0xFF
        rows += bytes([filter_type]) + filtered
        prev = cur
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(rows)))
        + _chunk(b"IEND", b"")
    )
