"""Pure-stdlib media codecs (multimodal/codecs.py) — no Spark needed."""

import math
import struct

import pytest

from dawis_spark.multimodal.codecs import (
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    stdlib_decode,
)


def test_wav_16bit_sine_rms_and_duration():
    rate, n = 8000, 8000  # exactly 1 s
    amp = 16000
    samples = [int(amp * math.sin(2 * math.pi * 440 * i / rate)) for i in range(n)]
    dur, got_rate, ch, rms, zcr = decode_wav(encode_wav(samples, rate))
    assert (dur, got_rate, ch) == (1000.0, 8000.0, 1.0)
    # sine RMS = amp/sqrt(2) over full scale 32768
    assert abs(rms - amp / math.sqrt(2) / 32768) < 0.01
    # 440 Hz crosses zero ~880 times/s -> zcr ~ 880/7999
    assert abs(zcr - 880 / 7999) < 0.01


def test_wav_8bit_unsigned_recentred():
    # constant 128 in 8-bit unsigned is silence (0 after recentring)
    payload = encode_wav([0] * 100, 8000, width=1)  # array code 'b': signed 0
    dur, rate, ch, rms, zcr = decode_wav(payload)
    # 0 signed bytes read back as unsigned 0 -> recentred to -128: loud DC
    assert rms == pytest.approx(1.0) and zcr == 0.0


def test_ppm_binary_with_comments_and_ascii_variant():
    p6 = b"P6\n# a comment\n2 2\n255\n" + bytes((10, 20, 30)) * 4
    assert decode_ppm(p6) == [2.0, 2.0, 10.0, 20.0, 30.0]
    p3 = b"P3 2 1 255  1 2 3  5 6 7"
    w, h, r, g, b = decode_ppm(p3)
    assert (w, h) == (2.0, 1.0) and (r, g, b) == (3.0, 4.0, 5.0)


def test_ppm_16bit_maxval_scaled_to_8bit_range():
    px = struct.pack(">HHH", 65535, 0, 65535)
    payload = b"P6\n1 1\n65535\n" + px
    w, h, r, g, b = decode_ppm(payload)
    assert (r, g, b) == pytest.approx((255.0, 0.0, 255.0))


def test_bmp_row_padding_and_bgr_order():
    # width 3 -> 9 pixel bytes padded to 12 per row; stored BGR
    payload = encode_bmp(3, 2, (200, 100, 50))
    assert decode_bmp(payload) == [3.0, 2.0, 200.0, 100.0, 50.0]


def test_truncation_and_bad_magic_raise():
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n4 4\n255\n\x00\x00")
    with pytest.raises(ValueError):
        decode_ppm(b"GIF89a")
    with pytest.raises(ValueError):
        decode_bmp(b"XX123")
    with pytest.raises(Exception):
        decode_wav(b"RIFFxxxxWAVE")


def test_stdlib_decode_dispatch_and_unknown_format():
    assert stdlib_decode(encode_ppm(1, 1, (9, 9, 9)), {"format": "PPM"}) == [
        1.0,
        1.0,
        9.0,
        9.0,
        9.0,
    ]
    # mp3 now routes to the frame-header metadata walk (truncated here)
    with pytest.raises(ValueError):
        stdlib_decode(b"\xff\xfb\x90", {"format": "mp3"})
    with pytest.raises(NotImplementedError):
        stdlib_decode(b"", {})


def test_wav_roundtrip_property():
    """encode->decode consistency across widths/rates for deterministic
    pseudo-random PCM: duration and rate exact; RMS matches a direct
    computation on the samples."""
    import random

    rng = random.Random(7)
    for width, full in ((1, 128.0), (2, 32768.0), (4, 2147483648.0)):
        for rate in (8000, 44100):
            n = 500
            hi = int(full) - 1
            samples = [rng.randint(-hi, hi) for _ in range(n)]
            dur, got_rate, ch, rms, zcr = decode_wav(encode_wav(samples, rate, width))
            assert got_rate == float(rate) and ch == 1.0
            assert abs(dur - 1000.0 * n / rate) < 1e-6
            if width == 1:
                # 8-bit WAV stores unsigned; signed negatives wrap, so just
                # bound-check the normalized stats
                assert 0.0 <= rms <= 1.0
            else:
                want = (sum((s / full) ** 2 for s in samples) / n) ** 0.5
                assert abs(rms - want) < 1e-9
            assert 0.0 <= zcr <= 1.0


def test_ppm_bmp_mean_matches_direct_computation():
    import random

    rng = random.Random(11)
    px = [(rng.randint(0, 255), rng.randint(0, 255), rng.randint(0, 255))
          for _ in range(6)]
    body = b"".join(bytes(p) for p in px)
    ppm = b"P6\n3 2\n255\n" + body
    w, h, r, g, b = decode_ppm(ppm)
    n = len(px)
    assert (w, h) == (3.0, 2.0)
    assert abs(r - sum(p[0] for p in px) / n) < 1e-9
    assert abs(g - sum(p[1] for p in px) / n) < 1e-9
    assert abs(b - sum(p[2] for p in px) / n) < 1e-9


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import binascii

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", binascii.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_file(w, h, depth, color_type, raw, plte=b"", interlace=0):
    import zlib

    from dawis_spark.multimodal.codecs import _PNG_MAGIC

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    body = _PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
    if plte:
        body += _png_chunk(b"PLTE", plte)
    return body + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")


def test_png_roundtrip_every_filter_type():
    """A deterministic RGB gradient encoded with each scanline filter
    (None/Sub/Up/Average/Paeth) decodes to the exact per-channel means of
    the source pixels — pins the unfilter pass, not just the happy path."""
    from dawis_spark.multimodal.codecs import decode_png, encode_png

    w, h = 8, 5
    px = bytes(
        (x * 37 + y * 11 + c * 71) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )
    n = w * h
    want = [
        sum(px[i] for i in range(c, len(px), 3)) / n for c in range(3)
    ]
    for filters in ([0] * h, [1] * h, [2] * h, [3] * h, [4] * h, [0, 1, 2, 3, 4]):
        got = decode_png(encode_png(w, h, pixels=px, filters=filters))
        assert got[0] == float(w) and got[1] == float(h)
        for c in range(3):
            assert abs(got[2 + c] - want[c]) < 1e-9, filters


def test_png_gray_rgba_palette_color_types():
    from dawis_spark.multimodal.codecs import decode_png

    # gray (color type 0), 2x1: samples 10, 30 -> mean 20 on all channels
    gray = _png_file(2, 1, 8, 0, bytes([0, 10, 30]))
    assert decode_png(gray) == [2.0, 1.0, 20.0, 20.0, 20.0]
    # gray+alpha (4): alpha ignored in means
    ga = _png_file(2, 1, 8, 4, bytes([0, 10, 255, 30, 0]))
    assert decode_png(ga) == [2.0, 1.0, 20.0, 20.0, 20.0]
    # RGBA (6)
    rgba = _png_file(1, 2, 8, 6, bytes([0, 1, 2, 3, 255, 0, 5, 6, 7, 0]))
    assert decode_png(rgba) == [1.0, 2.0, 3.0, 4.0, 5.0]
    # palette (3): two entries, both pixels hit entry 1
    plte = bytes([0, 0, 0, 9, 8, 7])
    pal = _png_file(2, 1, 8, 3, bytes([0, 1, 1]), plte=plte)
    assert decode_png(pal) == [2.0, 1.0, 9.0, 8.0, 7.0]


def test_png_unsupported_and_corrupt_raise():
    from dawis_spark.multimodal.codecs import decode_png, encode_png

    good = encode_png(2, 2, (1, 2, 3))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\x89PNX" + good[4:])
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(_png_file(1, 1, 8, 2, bytes(4), interlace=1))
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(_png_file(1, 1, 16, 2, bytes(7)))
    with pytest.raises(ValueError, match="truncated PNG pixel"):
        decode_png(_png_file(4, 4, 8, 2, bytes(5)))  # too few scanlines
    with pytest.raises(ValueError, match="palette index"):
        decode_png(_png_file(1, 1, 8, 3, bytes([0, 5]), plte=bytes(3)))


def test_jpeg_roundtrip_solid_and_gradient():
    import numpy as np

    from dawis_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    px = bytes([200, 100, 50]) * (16 * 16)
    for sub in ((1, 1), (2, 2)):
        w, h, r, g, b = decode_jpeg(encode_jpeg(16, 16, px, subsample=sub))
        assert (w, h) == (16.0, 16.0)
        # lossy: quantization moves solid colors by a couple of levels
        assert abs(r - 200) < 3 and abs(g - 100) < 3 and abs(b - 50) < 3

    # gradient with non-multiple-of-8 dims exercises MCU padding + crop
    iw, ih = 21, 13
    arr = np.zeros((ih, iw, 3), dtype=np.uint8)
    for y in range(ih):
        for x in range(iw):
            arr[y, x] = (x * 12 % 256, y * 19 % 256, (x + y) * 7 % 256)
    out = decode_jpeg(encode_jpeg(iw, ih, arr.tobytes(), subsample=(2, 2)))
    assert out[:2] == [float(iw), float(ih)]
    true = [arr[..., c].mean() for c in range(3)]
    for got, want in zip(out[2:], true):
        assert abs(got - want) < 4  # 4:2:0 box filter + quantization


def test_jpeg_dispatch_and_unsupported_raise():
    import pytest as _pytest

    from dawis_spark.multimodal.codecs import stdlib_decode
    from dawis_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    j = encode_jpeg(8, 8, bytes([10, 20, 30]) * 64)
    assert stdlib_decode(j, {"format": "jpg"})[:2] == [8.0, 8.0]
    assert stdlib_decode(j, {"format": "JPEG"})[:2] == [8.0, 8.0]
    with _pytest.raises(ValueError, match="missing SOI"):
        decode_jpeg(b"\x00\x01" + j[2:])
    # flip SOF0 marker to SOF2 (progressive) -> explicit unsupported error
    prog = bytearray(j)
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2
    with _pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(prog))
    with _pytest.raises(NotImplementedError, match="codec"):
        stdlib_decode(b"", {"format": "webm"})


def test_jpeg_multiscan_and_truncated_entropy_raise():
    import struct

    import pytest as _pytest

    from dawis_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    j = encode_jpeg(16, 16, bytes([120, 60, 200]) * 256)

    # Rewrite the SOS header to claim a single-component scan (ns=1) while
    # the frame has 3 components -> legal multi-scan baseline per T.81,
    # which we reject explicitly instead of decoding 1/3 of the planes.
    sos = j.find(b"\xff\xda")
    assert sos > 0
    seglen = struct.unpack_from(">H", j, sos + 2)[0]
    one_comp = b"\xff\xda" + struct.pack(">H", 2 + 1 + 2 + 3) + bytes(
        [1, j[sos + 5], j[sos + 6], 0, 63, 0]
    )
    multi = j[:sos] + one_comp + j[sos + 2 + seglen :]
    with _pytest.raises(ValueError, match="non-interleaved|multi-scan"):
        decode_jpeg(multi)

    # Truncate mid-entropy-stream: ValueError, never IndexError (ADVICE r6)
    trunc = j[: sos + 2 + seglen + 4]
    with _pytest.raises(ValueError, match="truncated JPEG entropy"):
        decode_jpeg(trunc)


def test_mp3_frame_walk_roundtrip():
    import pytest as _pytest

    from dawis_spark.multimodal.codecs import encode_mp3, parse_mp3, stdlib_decode

    # 38 frames of MPEG1 Layer III @ 128 kbps / 44100 Hz ≈ 0.99 s
    mp3 = encode_mp3(38)
    dur_ms, rate, ch, kbps, n = parse_mp3(mp3)
    assert n == 38 and rate == 44100 and ch == 2 and kbps == 128
    assert abs(dur_ms - 38 * 1152 / 44.1) < 1e-6
    # ID3v2 tag skipped; mono flag honored; dispatch via stdlib_decode
    tagged = encode_mp3(5, bitrate_kbps=64, sample_rate=32000, mono=True,
                        id3=b"\x00" * 40)
    out = stdlib_decode(tagged, {"format": "mp3"})
    assert out[4] == 5 and out[1] == 32000 and out[2] == 1 and out[3] == 64
    with _pytest.raises(ValueError, match="frame sync"):
        parse_mp3(b"\x00\x01\x02\x03" * 4)
    with _pytest.raises(ValueError, match="no complete MP3 frames"):
        parse_mp3(encode_mp3(1)[:100])  # truncated mid-frame


def test_mp4_box_walk_roundtrip():
    import pytest as _pytest

    from dawis_spark.multimodal.codecs import encode_mp4, parse_mp4, stdlib_decode

    mp4 = encode_mp4(640, 360, n_frames=240, duration_ms=8000)
    dur_ms, w, h, n_samples, n_tracks = parse_mp4(mp4)
    assert (dur_ms, w, h, n_samples, n_tracks) == (8000.0, 640.0, 360.0, 240.0, 1.0)
    assert stdlib_decode(mp4, {"format": "MP4"})[0] == 8000.0
    with _pytest.raises(ValueError, match="ftyp"):
        parse_mp4(b"\x00\x00\x00\x08free")
    with _pytest.raises(ValueError, match="truncated"):
        parse_mp4(mp4[: len(mp4) // 2])


def test_unknown_format_still_raises_not_implemented():
    import pytest as _pytest

    from dawis_spark.multimodal.codecs import stdlib_decode

    with _pytest.raises(NotImplementedError, match="codec libraries"):
        stdlib_decode(b"", {"format": "webm"})


def test_mp3_mp4_roundtrip_property():
    """encode->parse consistency across the parameter grid: every valid
    MPEG1-L3 bitrate/samplerate/channel combination and a spread of MP4
    geometries round-trip their metadata exactly."""
    from dawis_spark.multimodal.codecs import (
        _MP3_BITRATES_V1,
        _MP3_RATES,
        encode_mp3,
        encode_mp4,
        parse_mp3,
        parse_mp4,
    )

    for kbps in _MP3_BITRATES_V1[1:]:
        for rate in _MP3_RATES[3]:
            for mono in (False, True):
                n = 7
                dur, got_rate, ch, got_kbps, frames = parse_mp3(
                    encode_mp3(n, kbps, rate, mono=mono)
                )
                assert frames == n and got_rate == rate and got_kbps == kbps
                assert ch == (1 if mono else 2)
                assert abs(dur - 1000.0 * n * 1152 / rate) < 1e-9

    for w, h, n, ms, ts in (
        (1, 1, 1, 1, 1000),
        (320, 240, 24, 1001, 90000),
        (3840, 2160, 100000, 3600000, 600),
    ):
        dur, gw, gh, samples, tracks = parse_mp4(
            encode_mp4(w, h, n_frames=n, duration_ms=ms, timescale=ts)
        )
        assert (gw, gh, samples, tracks) == (float(w), float(h), float(n), 1.0)
        # duration survives the timescale conversion within one tick
        assert abs(dur - ms) <= 1000.0 / ts + 1e-9


# --- GIF ------------------------------------------------------------------

def test_gif_solid_and_gradient_means():
    from dawis_spark.multimodal.codecs import decode_gif, encode_gif

    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    assert decode_gif(encode_gif(4, 3, pal, bytes([1] * 12))) == [
        4.0, 3.0, 0.0, 255.0, 0.0,
    ]
    idx = bytes([y % 4 for y in range(10) for _ in range(5)])
    out = decode_gif(encode_gif(5, 10, pal, idx))
    n = 50
    want = [5.0, 10.0] + [sum(pal[i][c] for i in idx) / n for c in range(3)]
    assert out == want


def test_gif_interlaced_equals_progressive():
    from dawis_spark.multimodal.codecs import decode_gif, encode_gif

    pal = [(0, 0, 0), (80, 90, 100), (200, 10, 5), (7, 7, 7)]
    idx = bytes([(x * 3 + y) % 4 for y in range(9) for x in range(7)])
    a = decode_gif(encode_gif(7, 9, pal, idx))
    b = decode_gif(encode_gif(7, 9, pal, idx, interlace=True))
    assert a == b


def test_gif_real_lzw_roundtrip_grows_table_past_width_bumps():
    # greedy LZW on repetitive-but-varied data allocates hundreds of
    # codes, crossing several code-width boundaries and hitting the
    # KwKwK case — the decoder paths the clear-per-symbol stream never
    # exercises
    import random

    from dawis_spark.multimodal.codecs import decode_gif, encode_gif

    pal = [(i, 255 - i, i // 2) for i in (0, 40, 80, 120)]
    rng = random.Random(7)
    idx = bytes(rng.randrange(4) for _ in range(5000))
    out = decode_gif(encode_gif(50, 100, pal, idx, real_lzw=True))
    want = [50.0, 100.0] + [
        sum(pal[i][c] for i in idx) / 5000 for c in range(3)
    ]
    assert all(abs(x - y) < 1e-9 for x, y in zip(out, want))


def test_gif_kwkwk_case_exact():
    # "aaaa...": the second emitted code references the entry being
    # defined (code == next_code) — the textbook KwKwK stream
    from dawis_spark.multimodal.codecs import decode_gif, encode_gif

    pal = [(9, 9, 9), (0, 0, 0)]
    out = decode_gif(encode_gif(8, 2, pal, bytes(16), real_lzw=True))
    assert out == [8.0, 2.0, 9.0, 9.0, 9.0]


def test_gif_error_contract():
    import pytest

    from dawis_spark.multimodal.codecs import decode_gif, encode_gif

    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTGIF" + b"\x00" * 20)
    pal = [(1, 2, 3), (4, 5, 6)]
    good = encode_gif(4, 4, pal, bytes(16))
    with pytest.raises(ValueError, match="truncated|corrupt"):
        # chop the LZW data sub-blocks: keep header + descriptor only
        decode_gif(good[: 13 + 6 + 10 + 1] + b"\x00\x3b")


def test_gif_dispatches_through_stdlib_decode():
    from dawis_spark.multimodal.codecs import encode_gif, stdlib_decode

    pal = [(100, 150, 200), (1, 2, 3)]
    g = encode_gif(3, 3, pal, bytes([0] * 9))
    assert stdlib_decode(g, {"format": "gif"}) == [3.0, 3.0, 100.0, 150.0, 200.0]


def test_tiff_solid_roundtrip_both_endians_and_strips():
    from dawis_spark.multimodal.codecs import decode_tiff, encode_tiff

    for be in (False, True):
        for rps in (None, 3):
            t = encode_tiff(5, 7, (10, 200, 30), big_endian=be, rows_per_strip=rps)
            assert decode_tiff(t) == [5.0, 7.0, 10.0, 200.0, 30.0], (be, rps)


def test_tiff_error_contract():
    import pytest

    from dawis_spark.multimodal.codecs import decode_tiff, encode_tiff

    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"NOTTIFF" + b"\x00" * 20)
    good = encode_tiff(4, 4, (1, 2, 3))
    # flip Compression (tag 259) value to 5 (LZW): entry 4 of the IFD,
    # value at header(8) + count(2) + 3*12 + 8
    mut = bytearray(good)
    off = 8 + 2 + 3 * 12 + 8
    mut[off] = 5
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(bytes(mut))
    with pytest.raises(ValueError, match="truncated"):
        decode_tiff(good[: len(good) - 20])


def test_tiff_dispatches_through_stdlib_decode():
    from dawis_spark.multimodal.codecs import encode_tiff, stdlib_decode

    t = encode_tiff(3, 3, (100, 150, 200))
    assert stdlib_decode(t, {"format": "tiff"}) == [3.0, 3.0, 100.0, 150.0, 200.0]
    assert stdlib_decode(t, {"format": "tif"}) == [3.0, 3.0, 100.0, 150.0, 200.0]
