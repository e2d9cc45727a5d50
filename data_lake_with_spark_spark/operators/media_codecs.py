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


# ---------------------------------------------------------------------------
# GIF87a (grayscale palette, real LZW in both directions)
# ---------------------------------------------------------------------------

_GIF_SIG = b"GIF87a"


def decode_gif_bytes(payload: bytes) -> tuple[int, int, bytes]:
    """(width, height, pixels) from an 8-bit grayscale-palette GIF87a/
    89a: header walk, palette read, and a full variable-width LSB-first
    LZW decode (clear/EOI codes, table growth to 12 bits, the KwKwK
    first-use case). Pixels are palette indexes mapped through the
    table's red channel (gray palettes: r==g==b)."""
    if payload[:3] != b"GIF":
        raise ValueError("not a GIF")
    w, h = struct.unpack("<HH", payload[6:10])
    packed = payload[10]
    if not packed & 0x80:
        raise ValueError("missing global color table")
    gct_size = 2 << (packed & 0x07)
    pos = 13
    palette = payload[pos : pos + 3 * gct_size]
    pos += 3 * gct_size
    # skip extension blocks (GIF89a), find the image descriptor
    while payload[pos] == 0x21:
        pos += 2
        while payload[pos] != 0:
            pos += 1 + payload[pos]
        pos += 1
    if payload[pos] != 0x2C:
        raise ValueError("missing image descriptor")
    iw, ih = struct.unpack("<HH", payload[pos + 5 : pos + 9])
    if payload[pos + 9] & 0x80:
        raise ValueError("local color tables unsupported")
    pos += 10
    min_code = payload[pos]
    pos += 1
    data = bytearray()
    while payload[pos] != 0:
        n = payload[pos]
        data += payload[pos + 1 : pos + 1 + n]
        pos += 1 + n

    clear, eoi = 1 << min_code, (1 << min_code) + 1
    table: list[bytes] = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
    width = min_code + 1
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = table[: (1 << min_code) + 2]
                width = min_code + 1
                prev = None
                continue
            if code == eoi:
                nbits = 0
                acc = 0
                break
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]  # KwKwK
            else:
                raise ValueError(f"bad LZW code {code}")
            out += entry
            if prev is not None:
                table.append(prev + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
    if len(out) != iw * ih:
        raise ValueError(f"decoded {len(out)} pixels for {iw}x{ih}")
    return w, h, bytes(palette[3 * p] for p in out)


def encode_gif(raster: bytes, width: int, height: int) -> bytes:
    """Grayscale GIF87a encoder with real greedy-longest-match LZW
    (12-bit cap, clear-code reset) — the encode mirror that lets tests
    and queries round-trip deterministic rasters through the decoder's
    genuine dictionary path."""
    if len(raster) != width * height:
        raise ValueError("raster size mismatch")
    min_code = 8
    clear, eoi = 1 << min_code, (1 << min_code) + 1

    codes: list[int] = [clear]
    table: dict[bytes, int] = {bytes([i]): i for i in range(1 << min_code)}
    next_code = eoi + 1
    run = b""
    for px in raster:
        cand = run + bytes([px])
        if cand in table:
            run = cand
            continue
        codes.append(table[run])
        table[cand] = next_code
        next_code += 1
        run = bytes([px])
        if next_code > 4095:
            codes.append(clear)
            table = {bytes([i]): i for i in range(1 << min_code)}
            next_code = eoi + 1
    if run:
        codes.append(table[run])
    codes.append(eoi)

    # simulate the DECODER's table growth to pick each code's bit
    # width: the decoder adds an entry only from the second post-clear
    # code onward (it lags the encoder's table by one), and widens when
    # its table size reaches 2^width — the emit width must match the
    # width the decoder will use when READING that code.
    out = bytearray()
    acc = nbits = 0
    width_bits = min_code + 1
    sim_size = eoi + 1
    fresh = True
    for code in codes:
        acc |= code << nbits
        nbits += width_bits
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if code == clear:
            width_bits, sim_size, fresh = min_code + 1, eoi + 1, True
        elif code != eoi:
            if fresh:
                fresh = False
            else:
                sim_size += 1
                if sim_size == (1 << width_bits) and width_bits < 12:
                    width_bits += 1
    if nbits:
        out.append(acc & 0xFF)

    blocks = bytearray()
    for i in range(0, len(out), 255):
        chunk = out[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"

    palette = bytes(v for i in range(256) for v in (i, i, i))
    return (
        _GIF_SIG
        + struct.pack("<HHBBB", width, height, 0x80 | 0x70 | 0x07, 0, 0)
        + palette
        + b"\x2C"
        + struct.pack("<HHHHB", 0, 0, width, height, 0)
        + bytes([min_code])
        + bytes(blocks)
        + b"\x3B"
    )
