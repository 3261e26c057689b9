"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

Beyond-reference capability (BASELINE.json north star). Media payloads ride
as ``binary`` columns with a typed metadata struct; decode / feature
extraction / resize / frame-sampling run as Arrow-batched ``mapInPandas``
stages so bytes stream through Python in partition-sized batches and never
surface driver-side.

Codecs: pure-stdlib decoders for PCM WAV, PPM, uncompressed BMP, PNG and
baseline JPEG are REAL (codecs.py / jpeg.py) and run as the default
``decode_fn`` — the mapInPandas path is exercised end-to-end on real
bytes. MP3/MP4 get real METADATA extraction (frame-header walk / ISO-BMFF
box walk: duration, rate, dimensions, frame counts); their full sample
decode genuinely needs codec libraries this container doesn't ship —
inject ``decode_fn`` where they exist.

Scale: media tables are dominated by payload bytes. The iterator form of
mapInPandas keeps peak memory at one Arrow batch; metadata-only queries
never touch the binary column thanks to parquet column pruning — the main
reason payload and metadata share a row rather than a sidecar file.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_META_STRUCT = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("meta", MEDIA_META_STRUCT, False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def default_decode(payload: bytes, meta: dict) -> list[float]:
    """Default decode: pure-stdlib codecs for wav/ppm/bmp/png/jpeg
    (codecs.py / jpeg.py — real parsing, no external libs) and mp3/mp4
    container metadata; unknown formats raise NotImplementedError —
    inject decode_fn= where real codec libraries exist."""
    from dawis_spark.multimodal.codecs import stdlib_decode

    return stdlib_decode(payload, meta)


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, dict], list[float]] = default_decode,
    batch_size_hint: int = 256,
) -> DataFrame:
    """payload -> feature vector via mapInPandas (Arrow batch iterator).

    Per-row failures land in ``decode_error`` instead of failing the task —
    at corpus scale a bad file must not kill a 10k-row batch.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, errs = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                try:
                    meta_d = meta if isinstance(meta, dict) else meta.asDict()
                    feats.append(decode_fn(payload, meta_d))
                    errs.append(None)
                except Exception as exc:  # noqa: BLE001 - per-row isolation
                    feats.append(None)
                    errs.append(str(exc))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "decode_error": errs,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)
