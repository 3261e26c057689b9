"""Perceptual image hashing (dHash) over the stdlib decoders — the
bridge between the multimodal family and the dedup family: near-duplicate
IMAGES found the same way near-duplicate documents are (hash -> band ->
bucket join -> exact verify), with the pixel work bounded per row.

dHash (difference hash): box-average the luminance into a 9x8 grid, emit
one bit per horizontal neighbor pair (left < right) — 64 bits, robust to
re-encoding, format conversion, scaling and mild brightness shifts; the
Hamming distance between two dHashes tracks visual difference. The
de-facto standard cheap perceptual hash (same family as pHash/aHash).

Scale design:
  - the grid ACCUMULATES while the decoder walks rows — a 9x8 float
    grid is the entire per-image state, so a 100-megapixel scan costs
    the same memory as a thumbnail (no full-pixel materialization);
  - hashing runs in the same Arrow-batched mapInPandas pass as every
    other multimodal feature (per-row failures -> decode_error);
  - near-dup candidate generation is SimHash-style banding: 4 x 16-bit
    bands, pigeonhole-exact for Hamming <= 3 (any pair within 3 bits
    shares at least one intact band); the band join carries (band_id,
    band_value, media_id) int rows only — never payloads — and the
    exact Hamming verify runs on the 64-bit hashes of candidates.

No DuckDB oracle (binary payloads are outside the relational testdata);
pytest fixtures exercise BMP/PPM/PNG round-trips, cross-format
stability, perturbation locality, and the banding recall guarantee.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

GRID_W, GRID_H = 9, 8  # dHash canonical grid: 9 columns -> 8 bits/row
N_BANDS, BAND_BITS = 4, 16  # pigeonhole: hamming <= N_BANDS-1 recall-exact


class _GridAcc:
    """Streaming box-average accumulator: add_pixel(x, y, lum) per pixel,
    grid() -> GRID_H x GRID_W means. State is 2 small arrays regardless
    of image size."""

    def __init__(self, w: int, h: int) -> None:
        self.w, self.h = w, h
        self.sums = [0.0] * (GRID_W * GRID_H)
        self.counts = [0] * (GRID_W * GRID_H)

    def add_pixel(self, x: int, y: int, lum: float) -> None:
        gx = x * GRID_W // self.w
        gy = y * GRID_H // self.h
        i = gy * GRID_W + gx
        self.sums[i] += lum
        self.counts[i] += 1

    def grid(self) -> list[list[float]]:
        return [
            [
                self.sums[y * GRID_W + x] / max(self.counts[y * GRID_W + x], 1)
                for x in range(GRID_W)
            ]
            for y in range(GRID_H)
        ]


def _lum(r: int, g: int, b: int) -> float:
    # integer Rec.601 weights; /1000 once per pixel
    return (299 * r + 587 * g + 114 * b) / 1000.0


def gray_grid_bmp(payload: bytes) -> list[list[float]]:
    """Uncompressed 24-bit BMP -> 8x9 luminance grid (streaming rows;
    same header contract as codecs.decode_bmp)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    _planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp != 24:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    abs_h = abs(h)
    if w <= 0 or abs_h <= 0:
        raise ValueError("empty BMP")
    row_bytes = (w * 3 + 3) & ~3
    acc = _GridAcc(w, abs_h)
    for row in range(abs_h):
        off = data_offset + row * row_bytes
        px = payload[off : off + w * 3]
        if len(px) < w * 3:
            raise ValueError("truncated BMP pixel data")
        # bottom-up storage unless height is negative
        y = (abs_h - 1 - row) if h > 0 else row
        for x in range(w):
            b, g, r = px[x * 3], px[x * 3 + 1], px[x * 3 + 2]
            acc.add_pixel(x, y, _lum(r, g, b))
    return acc.grid()


def gray_grid_ppm(payload: bytes) -> list[list[float]]:
    """PPM (P6, 8-bit) -> 8x9 luminance grid."""
    from dawis_spark.multimodal.codecs import _ppm_tokens

    if payload[:2] != b"P6":
        raise ValueError("only binary P6 PPM supported for grids")
    (w, h, maxval), i = _ppm_tokens(payload, 3, 2)
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported for grids")
    if w <= 0 or h <= 0:
        raise ValueError("empty PPM")
    i += 1
    raw = payload[i : i + w * h * 3]
    if len(raw) < w * h * 3:
        raise ValueError("truncated PPM pixel data")
    acc = _GridAcc(w, h)
    for y in range(h):
        base = y * w * 3
        for x in range(w):
            j = base + x * 3
            acc.add_pixel(x, y, _lum(raw[j], raw[j + 1], raw[j + 2]))
    return acc.grid()


def gray_grid_png(payload: bytes) -> list[list[float]]:
    """PNG (8-bit, non-interlaced; gray/RGB/palette/alpha) -> grid.
    Reuses codecs._png_unfilter; rows accumulate one at a time."""
    import zlib

    from dawis_spark.multimodal.codecs import (
        _PNG_CHANNELS,
        _PNG_MAGIC,
        _png_unfilter,
    )

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, ihdr, plte, idat = 8, None, b"", bytearray()
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or len(ihdr) < 13:
        raise ValueError("missing PNG IHDR")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13]
    )
    if interlace or depth != 8 or comp != 0 or filt != 0:
        raise ValueError("unsupported PNG variant for grids")
    channels = _PNG_CHANNELS.get(color_type)
    if channels is None:
        raise ValueError(f"bad PNG color type: {color_type}")
    if w <= 0 or h <= 0:
        raise ValueError("empty PNG")
    rows = _png_unfilter(zlib.decompress(bytes(idat)), h, w * channels, channels)
    acc = _GridAcc(w, h)
    for y, row in enumerate(rows):
        for x in range(w):
            j = x * channels
            if color_type == 2 or color_type == 6:  # RGB / RGBA
                lum = _lum(row[j], row[j + 1], row[j + 2])
            elif color_type == 3:  # palette
                p = row[j] * 3
                lum = _lum(plte[p], plte[p + 1], plte[p + 2])
            else:  # gray / gray+alpha
                lum = float(row[j])
            acc.add_pixel(x, y, lum)
    return acc.grid()


_GRID_FNS = {"bmp": gray_grid_bmp, "ppm": gray_grid_ppm, "png": gray_grid_png}


def dhash64(grid: list[list[float]]) -> int:
    """64-bit difference hash: bit set where the right neighbor is
    brighter. Bit order: row-major, MSB first. Returned as SIGNED int64
    (two's complement) so it fits Spark's LongType; XOR/popcount
    Hamming is bit-pattern arithmetic and doesn't care about sign."""
    bits = 0
    for y in range(GRID_H):
        for x in range(GRID_W - 1):
            bits = (bits << 1) | (1 if grid[y][x + 1] > grid[y][x] else 0)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def image_dhash(payload: bytes, fmt: str) -> int:
    fn = _GRID_FNS.get(fmt)
    if fn is None:
        raise NotImplementedError(f"no pixel-grid decoder for format: {fmt}")
    return dhash64(fn(payload))


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("dhash", T.LongType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def dhash_features(media: DataFrame) -> DataFrame:
    """(media_id, payload, format) -> (media_id, dhash, decode_error)
    via Arrow-batched mapInPandas; per-row failures isolate like
    extract_features. The 64-bit hash is the ONLY thing that leaves the
    pass — payloads never reach an exchange."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            hashes, errs = [], []
            for payload, fmt in zip(pdf["payload"], pdf["format"]):
                try:
                    hashes.append(image_dhash(bytes(payload), fmt))
                    errs.append(None)
                except Exception as exc:  # noqa: BLE001 - per-row isolation
                    hashes.append(None)
                    errs.append(str(exc))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dhash": pd.array(hashes, dtype="Int64"),
                    "decode_error": errs,
                }
            )

    return media.mapInPandas(run, DHASH_SCHEMA)


def dhash_near_dup_pairs(
    hashes: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """Near-duplicate image pairs from dHashes: SimHash-style banding —
    split the 64 bits into 4 x 16-bit bands; any pair within Hamming
    ``max_hamming`` <= 3 agrees on at least one band (pigeonhole), so
    the band equi-join is a recall-exact candidate generator. Exact
    popcount verify on candidates; returns (id_a, id_b, hamming) with
    id_a < id_b.

    Scale: the band join carries (band_id, band_value, media_id) int
    rows; hot bands (e.g. black-border television frames) are the same
    skew class the LSH families handle — cap or salt at the call site
    if a band degenerates."""
    if max_hamming >= N_BANDS:
        raise ValueError(
            f"banding is recall-exact only for hamming < {N_BANDS}"
        )
    h = hashes.filter(F.col("dhash").isNotNull()).select("media_id", "dhash")
    bands = h.select(
        "media_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.expr(
                            f"(dhash >> {i * BAND_BITS}) & {(1 << BAND_BITS) - 1}"
                        ).alias("band_value"),
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("b"),
    ).select("media_id", "dhash", "b.band_id", "b.band_value")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_value") == F.col("b.band_value"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.col("a.dhash").alias("ha"),
            F.col("b.dhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("bit_count(ha ^ hb)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
