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
    with pytest.raises(NotImplementedError):
        stdlib_decode(b"\x89PNG", {"format": "png"})
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
