"""Pure-stdlib media codecs — the real decode step for formats that need
no external libraries: PCM WAV (``wave``), PPM (P6/P3), and uncompressed
24-bit BMP.

This closes the "codecs stubbed" gap as far as the container allows:
compressed formats (PNG/JPEG/MP3/MP4) genuinely need codec libraries and
stay behind the injectable ``decode_fn`` / NotImplementedError stub, but
the mapInPandas pipeline is now demonstrable END-TO-END on real bytes —
parse, per-row error isolation, feature extraction — with no fakes.

Features are deliberately simple, deterministic summaries (the point is
the distributed plumbing, not signal processing):
  - audio: [duration_ms, sample_rate, n_channels, rms, zero_crossing_rate]
  - image: [width, height, mean_r, mean_g, mean_b]
"""

from __future__ import annotations

import io
import struct
import wave
from array import array

_WAV_TYPECODE = {1: "b", 2: "h", 4: "i"}  # sample width bytes -> array code


def decode_wav(payload: bytes) -> list[float]:
    """PCM WAV -> [duration_ms, sample_rate, n_channels, rms, zcr].

    8/16/32-bit integer PCM via ``wave`` + ``array`` (no audioop — removed
    in Python 3.13). Multi-channel audio is analyzed on channel 0.
    """
    with wave.open(io.BytesIO(payload), "rb") as wf:
        n_channels = wf.getnchannels()
        width = wf.getsampwidth()
        rate = wf.getframerate()
        n_frames = wf.getnframes()
        raw = wf.readframes(n_frames)
    code = _WAV_TYPECODE.get(width)
    if code is None:
        raise ValueError(f"unsupported WAV sample width: {width} bytes")
    samples = array(code)
    samples.frombytes(raw[: len(raw) - len(raw) % (width * n_channels)])
    chan0 = samples[::n_channels] if n_channels > 1 else samples
    if width == 1:  # WAV 8-bit is unsigned; recentre around 0
        chan0 = array("i", (s if s >= 0 else s + 256 for s in chan0))
        chan0 = array("i", (s - 128 for s in chan0))
    n = len(chan0)
    duration_ms = 0.0 if rate == 0 else 1000.0 * n_frames / rate
    if n == 0:
        return [duration_ms, float(rate), float(n_channels), 0.0, 0.0]
    full_scale = float(2 ** (8 * width - 1))
    rms = (sum((s / full_scale) ** 2 for s in chan0) / n) ** 0.5
    crossings = sum(
        1 for a, b in zip(chan0, chan0[1:]) if (a >= 0) != (b >= 0)
    )
    zcr = crossings / (n - 1) if n > 1 else 0.0
    return [duration_ms, float(rate), float(n_channels), rms, zcr]


def _ppm_tokens(payload: bytes, count: int, start: int) -> tuple[list[int], int]:
    """Read whitespace/comment-separated ASCII integers from a PNM header."""
    out: list[int] = []
    i = start
    n = len(payload)
    while len(out) < count and i < n:
        c = payload[i : i + 1]
        if c == b"#":
            while i < n and payload[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not payload[j : j + 1].isspace():
                j += 1
            out.append(int(payload[i:j]))
            i = j
    if len(out) < count:
        raise ValueError("truncated PNM header")
    return out, i


def decode_ppm(payload: bytes) -> list[float]:
    """PPM (P6 binary / P3 ASCII) -> [width, height, mean_r, mean_g, mean_b]."""
    magic = payload[:2]
    if magic not in (b"P6", b"P3"):
        raise ValueError(f"not a PPM payload: magic={magic!r}")
    (w, h, maxval), i = _ppm_tokens(payload, 3, 2)
    if maxval <= 0 or maxval > 65535:
        raise ValueError(f"bad PPM maxval: {maxval}")
    n_px = w * h
    if magic == b"P6":
        i += 1  # single whitespace byte after maxval
        per = 2 if maxval > 255 else 1
        raw = payload[i : i + n_px * 3 * per]
        if len(raw) < n_px * 3 * per:
            raise ValueError("truncated PPM pixel data")
        vals = array("H") if per == 2 else array("B")
        if per == 2:
            vals.frombytes(raw)
            if struct.pack(">H", 1) != struct.pack("=H", 1):
                vals.byteswap()  # PPM 16-bit is big-endian
        else:
            vals.frombytes(raw)
    else:
        ints, _ = _ppm_tokens(payload, n_px * 3, i)
        vals = array("i", ints)
    if n_px == 0:
        return [float(w), float(h), 0.0, 0.0, 0.0]
    sums = [0, 0, 0]
    for j, v in enumerate(vals):
        sums[j % 3] += v
    scale = 255.0 / maxval  # normalize to 8-bit range for comparability
    return [float(w), float(h)] + [s * scale / n_px for s in sums]


def decode_bmp(payload: bytes) -> list[float]:
    """Uncompressed 24-bit BMP -> [width, height, mean_r, mean_g, mean_b].

    BITMAPINFOHEADER only (the format every paint tool writes); rows are
    bottom-up, 4-byte aligned, pixels stored BGR.
    """
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size: {header_size}")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp != 24:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    abs_h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    sums = [0, 0, 0]  # b, g, r order as stored
    for row in range(abs_h):
        off = data_offset + row * row_bytes
        px = payload[off : off + w * 3]
        if len(px) < w * 3:
            raise ValueError("truncated BMP pixel data")
        sums[0] += sum(px[0::3])
        sums[1] += sum(px[1::3])
        sums[2] += sum(px[2::3])
    n_px = w * abs_h
    if n_px == 0:
        return [float(w), float(abs_h), 0.0, 0.0, 0.0]
    return [
        float(w),
        float(abs_h),
        sums[2] / n_px,  # r
        sums[1] / n_px,  # g
        sums[0] / n_px,  # b
    ]


_DECODERS = {"wav": decode_wav, "ppm": decode_ppm, "bmp": decode_bmp}


def stdlib_decode(payload: bytes, meta: dict) -> list[float]:
    """Format-dispatching decode_fn for extract_features: real decoding for
    wav/ppm/bmp, honest NotImplementedError for formats that need codec
    libraries this container doesn't ship."""
    fmt = (meta or {}).get("format") or ""
    fn = _DECODERS.get(fmt.lower())
    if fn is None:
        raise NotImplementedError(
            f"format {fmt!r} needs codec libraries not present here; "
            "stdlib codecs cover wav/ppm/bmp"
        )
    return fn(payload)


# --- tiny encoders (test/corpus synthesis; deterministic) -----------------


def encode_wav(samples: list[int], sample_rate: int = 8000, width: int = 2) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(width)
        wf.setframerate(sample_rate)
        wf.writeframes(array(_WAV_TYPECODE[width], samples).tobytes())
    return buf.getvalue()


def encode_ppm(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    header = f"P6\n{width} {height}\n255\n".encode()
    return header + bytes(rgb) * (width * height)


def encode_bmp(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    row = bytes((rgb[2], rgb[1], rgb[0])) * width
    row += b"\x00" * ((-len(row)) % 4)
    pixels = row * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return header + pixels
