"""Cross-batch NEAR-duplicate admission gate — streaming MinHash-LSH.

``stream_dedup`` (stateful.py) suppresses EXACT duplicates across
micro-batches; a training-data ingest also wants to reject documents that
are near-copies of anything already admitted. The state here is not a
per-key boolean but an inverted LSH index persisted as two warehouse
tables:

  bands table: (band, key, id)   — the admitted corpus' band buckets
  sigs table:  (id, sig)         — admitted MinHash signatures

Each tick (``admit``, drivable from foreachBatch):
  1. signatures for the batch, map-side (operators/dedup machinery);
  2. batch band keys equi-join the admitted bands table — any shared
     bucket is a candidate, verified by estimated Jaccard (fraction of
     equal signature positions, the standard MinHash estimator) against
     the admitted signature;
  3. the same gate WITHIN the batch: a doc matching a lower-id batch
     survivor is rejected (greedy first-wins, deterministic; like any
     greedy pass it can over-reject relative to full clustering when
     near-dup chains are not transitive — documented trade-off);
  4. survivors are emitted and their bands/sigs appended to the index.

Scale: the index grows O(admitted docs x bands) rows of small strings —
never text; the candidate join is an equi-join on (band, key) exactly like
the batch LSH path, and verification touches only candidate signature
pairs. Documents with no shingles (shorter than k) have no signature and
are admitted without near-dup protection (same as the batch operators).
At cluster scale the index side of that join is the recurring cost: land
the bands table bucketed on ``key`` (``Warehouse.write_bucketed``) so each
tick shuffles only the (small) batch side instead of re-exchanging the
whole admitted index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dawis_spark.catalog import Warehouse
from dawis_spark.operators.dedup import minhash_signatures


def _band_rows(sig_df: DataFrame, id_col: str, bands: int, rows_per_band: int):
    band_cols = []
    for b in range(bands):
        parts = [
            f"cast(sig[{b * rows_per_band + r}] as string)"
            for r in range(rows_per_band)
        ]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                F.expr("concat_ws(':', " + ", ".join(parts) + ")").alias("key"),
            )
        )
    return sig_df.select(
        F.col(id_col).alias("id"), F.explode(F.array(*band_cols)).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def _est_jaccard(a: str, b: str, n_perms: int) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> if(x = y, 1, 0)), 0, "
        f"(acc, v) -> acc + v) / cast({n_perms} as double)"
    )


class NearDupIndex:
    """Persistent LSH admission index over a Warehouse root."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_perms: int = 8,
        bands: int = 4,
        shingle_k: int = 3,
        threshold: float = 0.5,
    ):
        if n_perms % bands:
            raise ValueError("n_perms must divide into bands")
        self.spark = spark
        self.wh = Warehouse(spark, root)
        self.n_perms = n_perms
        self.bands = bands
        self.rows_per_band = n_perms // bands
        self.shingle_k = shingle_k
        self.threshold = threshold

    def _read(self, table: str, schema: str) -> DataFrame:
        try:
            return self.wh.read(table)
        except Exception:
            return self.spark.createDataFrame([], schema)

    def admit(self, df: DataFrame, id_col: str, text_col: str) -> DataFrame:
        """Return the rows of ``df`` that are NOT near-dups of anything
        admitted before (or of a lower-id batch survivor), and fold the
        survivors into the index."""
        sigs = minhash_signatures(
            df, id_col, text_col, self.n_perms, self.shingle_k
        ).select(F.col(id_col).alias("id"), "sig")
        idx_sigs = self._read("neardup_sigs", "id bigint, sig array<bigint>")
        idx_bands = self._read("neardup_bands", "id bigint, band int, key string")
        new_bands = _band_rows(sigs, "id", self.bands, self.rows_per_band)

        est = _est_jaccard("n_sig", "o_sig", self.n_perms)
        # vs the admitted index
        cand_prev = (
            new_bands.join(
                idx_bands.select(
                    F.col("band"), F.col("key"), F.col("id").alias("old_id")
                ),
                ["band", "key"],
            )
            .select("id", "old_id")
            .distinct()
        )
        rejected_prev = (
            cand_prev.join(sigs.select("id", F.col("sig").alias("n_sig")), "id")
            .join(
                idx_sigs.select(F.col("id").alias("old_id"), F.col("sig").alias("o_sig")),
                "old_id",
            )
            .filter(F.expr(est) >= self.threshold)
            .select("id")
            .distinct()
        )
        # within the batch: reject any id matching a LOWER id that itself
        # survives the index gate (greedy first-wins)
        left = new_bands.select("band", "key", F.col("id").alias("id_a"))
        right = new_bands.select("band", "key", F.col("id").alias("id_b"))
        pairs = (
            left.join(right, ["band", "key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
            .join(rejected_prev.select(F.col("id").alias("id_a")), "id_a", "left_anti")
            .join(sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("n_sig")), "id_a")
            .join(sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("o_sig")), "id_b")
            .filter(F.expr(est) >= self.threshold)
        )
        rejected = rejected_prev.union(
            pairs.select(F.col("id_b").alias("id"))
        ).distinct()

        survivors = df.join(
            rejected.select(F.col("id").alias(id_col)), id_col, "left_anti"
        )
        keep_ids = survivors.select(F.col(id_col).alias("id"))
        self.wh.write(sigs.join(keep_ids, "id", "left_semi"), "neardup_sigs")
        self.wh.write(new_bands.join(keep_ids, "id", "left_semi"), "neardup_bands")
        return survivors
