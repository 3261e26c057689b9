"""Perceptual image hashing (multimodal/phash.py): grid decoders,
dHash stability across formats, perturbation locality, and the banded
near-dup recall guarantee."""

import struct
import zlib

import pytest

from dawis_spark.multimodal.phash import (
    GRID_H,
    GRID_W,
    dhash64,
    dhash_features,
    dhash_near_dup_pairs,
    gray_grid_bmp,
    gray_grid_png,
    gray_grid_ppm,
    image_dhash,
)


def _gradient_pixels(w: int, h: int, flip: bool = False, bump: int = 0):
    """Horizontal gray gradient; optional flipped direction or a small
    brightness bump in one corner cell."""
    px = []
    for y in range(h):
        row = []
        for x in range(w):
            v = int(255 * (w - 1 - x) / (w - 1)) if flip else int(255 * x / (w - 1))
            if bump and x < w // 9 and y < h // 8:
                v = min(255, v + bump)
            row.append((v, v, v))
        px.append(row)
    return px


def _ppm_bytes(px):
    h, w = len(px), len(px[0])
    body = bytearray()
    for row in px:
        for r, g, b in row:
            body += bytes((r, g, b))
    return b"P6 %d %d 255\n" % (w, h) + bytes(body)


def _bmp_bytes(px):
    h, w = len(px), len(px[0])
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    for row in reversed(px):  # bottom-up
        line = bytearray()
        for r, g, b in row:
            line += bytes((b, g, r))
        line += b"\x00" * (row_bytes - len(line))
        body += line
    data_offset = 54
    header = b"BM" + struct.pack(
        "<IHHI", data_offset + len(body), 0, 0, data_offset
    )
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    return header + dib + bytes(body)


def _png_bytes(px):
    h, w = len(px), len(px[0])
    raw = bytearray()
    for row in px:
        raw.append(0)  # filter type None
        for r, g, b in row:
            raw += bytes((r, g, b))

    def chunk(ctype, data):
        c = ctype + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_grid_shape_and_cross_format_stability():
    px = _gradient_pixels(36, 24)
    for grid in (
        gray_grid_ppm(_ppm_bytes(px)),
        gray_grid_bmp(_bmp_bytes(px)),
        gray_grid_png(_png_bytes(px)),
    ):
        assert len(grid) == GRID_H and all(len(r) == GRID_W for r in grid)
    h_ppm = image_dhash(_ppm_bytes(px), "ppm")
    h_bmp = image_dhash(_bmp_bytes(px), "bmp")
    h_png = image_dhash(_png_bytes(px), "png")
    # same pixels, three containers -> identical perceptual hash
    assert h_ppm == h_bmp == h_png
    assert h_ppm != 0
    assert -(1 << 63) <= h_ppm < (1 << 63)  # signed-int64 contract


def test_dhash_locality_and_separation():
    base = image_dhash(_ppm_bytes(_gradient_pixels(36, 24)), "ppm")
    bumped = image_dhash(
        _ppm_bytes(_gradient_pixels(36, 24, bump=40)), "ppm"
    )
    flipped = image_dhash(
        _ppm_bytes(_gradient_pixels(36, 24, flip=True)), "ppm"
    )
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(base, bumped) <= 3  # one perturbed grid cell
    assert ham(base, flipped) >= 40  # reversed gradient flips ~all bits


def test_dhash_scale_invariance():
    small = image_dhash(_ppm_bytes(_gradient_pixels(18, 16)), "ppm")
    big = image_dhash(_ppm_bytes(_gradient_pixels(180, 160)), "ppm")
    assert bin((small ^ big) & ((1 << 64) - 1)).count("1") <= 2


def test_dhash_features_and_banded_pairs(spark):
    rows = [
        (1, bytearray(_ppm_bytes(_gradient_pixels(36, 24))), "ppm"),
        (2, bytearray(_bmp_bytes(_gradient_pixels(36, 24))), "bmp"),  # exact dup of 1
        (3, bytearray(_ppm_bytes(_gradient_pixels(36, 24, bump=40))), "ppm"),  # near-dup
        (4, bytearray(_ppm_bytes(_gradient_pixels(36, 24, flip=True))), "ppm"),  # far
        (5, bytearray(b"garbage-not-an-image"), "ppm"),  # decode failure isolated
        (6, bytearray(_png_bytes(_gradient_pixels(36, 24))), "gif"),  # unsupported fmt
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary, format string")
    feats = dhash_features(media).collect()
    byid = {r["media_id"]: r for r in feats}
    assert byid[1]["dhash"] == byid[2]["dhash"]
    assert byid[5]["dhash"] is None and "PPM" in byid[5]["decode_error"]
    assert byid[6]["dhash"] is None and "no pixel-grid decoder" in byid[6]["decode_error"]
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dhash_near_dup_pairs(dhash_features(media), 3).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and 0 < pairs[(1, 3)] <= 3
    assert not any(4 in p for p in pairs)  # flipped image is not a near-dup


def test_banding_recall_exact_under_pigeonhole(spark):
    # adversarial: flip exactly 3 bits spread across DIFFERENT bands —
    # one band must survive intact and the pair must still be found
    base = 0x0123456789ABCDEF
    mutated = base ^ (1 << 0) ^ (1 << 17) ^ (1 << 35)  # bands 0, 1, 2
    hashes = spark.createDataFrame(
        [(1, base, None), (2, mutated, None)],
        "media_id long, dhash long, decode_error string",
    )
    pairs = dhash_near_dup_pairs(hashes, 3).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] == 3
    with pytest.raises(ValueError, match="recall-exact"):
        dhash_near_dup_pairs(hashes, 4)
