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
  3. the same gate WITHIN the batch, with exact greedy semantics: ids are
     processed in ascending order and a doc is rejected iff it matches a
     lower-id doc that itself SURVIVED (both the index gate and the
     within-batch gate) — so in a chain A~B, B~C with A not~ C, B is
     rejected by A but C survives. The decision pass runs on the driver
     over the (batch-bounded) candidate-pair id list; similarity itself
     is computed distributed.
  4. survivors are emitted and their bands/sigs appended to the index.

Scale: the index grows O(admitted docs x bands) rows of small strings —
never text; the candidate join is an equi-join on (band, key) exactly like
the batch LSH path, and verification touches only candidate signature
pairs. Documents with no shingles (shorter than k) have no signature and
are admitted without near-dup protection (same as the batch operators).
At cluster scale the index side of that join is the recurring cost, so the
index lands BUCKETED (``Warehouse.write_bucketed``): bands on (band, key),
sigs on (id). Every per-tick join against the index (candidate lookup,
signature verify, already-indexed dedup) then shuffles ONLY the small
batch side — the admitted corpus is never re-exchanged.

Failure/re-delivery contract (foreachBatch retries): every append is
anti-joined against the already-indexed sig ids first, so re-running a
tick whose writes completed is a no-op. A crash BETWEEN the two appends
(bands landed, sigs not) leaves those docs unprotected until the retry —
their bands produce candidates but the signature verify drops them
(fail-open, never a wrong rejection); the retry then re-appends both
tables for the missing ids, which can duplicate that batch's band rows —
harmless, candidates are de-duplicated before the verify.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

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


def greedy_reject(prev_rejected: set, sim_pairs) -> set:
    """Sequential-greedy within-batch gate, driver-side.

    ``sim_pairs`` are (lower_id, higher_id) similar pairs; a doc is
    rejected iff it matches a lower-id doc that itself survived both the
    index gate (``prev_rejected``) and this pass. Processing ids in
    ascending order decides every predecessor before its dependents, so
    chains resolve exactly (A~B, B~C, A not~C: B rejected, C kept)."""
    rejected = set(prev_rejected)
    preds: dict = defaultdict(list)
    for a, b in sim_pairs:
        preds[b].append(a)
    for b in sorted(preds):
        if b in rejected:
            continue
        if any(a not in rejected for a in preds[b]):
            rejected.add(b)
    return rejected


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
        n_buckets: int = 16,
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
        self.n_buckets = n_buckets
        # session-catalog names are global; scope them to this root so two
        # indexes over different roots don't collide
        self._suffix = hashlib.md5(root.encode()).hexdigest()[:10]

    def _catalog_name(self, table: str) -> str:
        return f"{table}_{self._suffix}"

    def _read_index(self, table: str, schema: str) -> DataFrame:
        """Read an index table: bucketed catalog table when this session
        wrote it (shuffle-free joins), plain parquet when only the path
        exists (fresh session over an existing root — correct, one tick of
        extra shuffle until the next bucketed append re-registers it),
        empty when the index has never been written. Genuine read errors
        (corrupt files, permission) propagate instead of silently
        disabling near-dup protection."""
        cat = self._catalog_name(table)
        if self.spark.catalog.tableExists(cat):
            return self.spark.table(cat)
        if self.wh.exists(table):
            return self.wh.read(table)
        return self.spark.createDataFrame([], schema)

    def admit(self, df: DataFrame, id_col: str, text_col: str) -> DataFrame:
        """Return the rows of ``df`` that are NOT near-dups of anything
        admitted before (or of a lower-id batch survivor), and fold the
        survivors into the index.

        The accept/reject decision is materialized ONCE per tick (the
        rejected id set — batch-bounded, ids only — is collected to the
        driver), so the minhash + LSH join DAG is not re-evaluated per
        index write or when the caller acts on the returned survivors."""
        sigs = minhash_signatures(
            df, id_col, text_col, self.n_perms, self.shingle_k
        ).select(F.col(id_col).alias("id"), "sig")
        sigs = sigs.persist()
        try:
            idx_sigs = self._read_index("neardup_sigs", "id bigint, sig array<bigint>")
            idx_bands = self._read_index("neardup_bands", "id bigint, band int, key string")
            new_bands = _band_rows(sigs, "id", self.bands, self.rows_per_band)

            est = _est_jaccard("n_sig", "o_sig", self.n_perms)
            # vs the admitted index: candidates via shared band buckets,
            # verified against the admitted signature
            cand_prev = (
                new_bands.join(
                    idx_bands.select(
                        F.col("band"), F.col("key"), F.col("id").alias("old_id")
                    ),
                    ["band", "key"],
                )
                # a doc whose OWN id is already indexed is a re-delivered
                # survivor, not a near-dup of itself — keep it idempotent
                .filter(F.col("id") != F.col("old_id"))
                .select("id", "old_id")
                .distinct()
            )
            rejected_prev = {
                r["id"]
                for r in (
                    cand_prev.join(sigs.select("id", F.col("sig").alias("n_sig")), "id")
                    .join(
                        idx_sigs.select(
                            F.col("id").alias("old_id"), F.col("sig").alias("o_sig")
                        ),
                        "old_id",
                    )
                    .filter(F.expr(est) >= self.threshold)
                    .select("id")
                    .distinct()
                    .collect()
                )
            }
            # within the batch: all similar (lower, higher) id pairs,
            # decided by a driver-side greedy pass in ascending id order
            left = new_bands.select("band", "key", F.col("id").alias("id_a"))
            right = new_bands.select("band", "key", F.col("id").alias("id_b"))
            sim_pairs = (
                left.join(right, ["band", "key"])
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b")
                .distinct()
                .join(sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("n_sig")), "id_a")
                .join(sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("o_sig")), "id_b")
                .filter(F.expr(est) >= self.threshold)
                .select("id_a", "id_b")
                .collect()
            )
            rejected = greedy_reject(
                rejected_prev, [(r["id_a"], r["id_b"]) for r in sim_pairs]
            )

            rejected_df = self.spark.createDataFrame(
                [(i,) for i in sorted(rejected)], "id bigint"
            )
            # idempotent re-delivery: skip ids the index already holds
            already = idx_sigs.select("id")
            keep_sigs = (
                sigs.join(rejected_df, "id", "left_anti")
                .join(already, "id", "left_anti")
            )
            keep_bands = (
                new_bands.join(rejected_df, "id", "left_anti")
                .join(already, "id", "left_anti")
            )
            self.wh.write_bucketed(
                keep_bands,
                "neardup_bands",
                ["band", "key"],
                self.n_buckets,
                mode="append",
                catalog_name=self._catalog_name("neardup_bands"),
            )
            self.wh.write_bucketed(
                keep_sigs,
                "neardup_sigs",
                ["id"],
                self.n_buckets,
                mode="append",
                catalog_name=self._catalog_name("neardup_sigs"),
            )
        finally:
            sigs.unpersist()
        # survivors depend only on df and the materialized decision —
        # acting on them re-runs no LSH work
        return df.join(rejected_df.withColumnRenamed("id", id_col), id_col, "left_anti")


class SemanticDupIndex:
    """Persistent SEMANTIC admission index — streaming SemDeDup, the
    embedding-cell twin of :class:`NearDupIndex` (mirrors the batch
    ``operators/similarity.semantic_dedup`` recipe across micro-batches).

    The coarse quantizer (k-means centroids) is trained OFFLINE on a
    bootstrap corpus (``train_kmeans``) and passed in fixed — cells must
    be stable across ticks or the whole index would need re-assignment
    (FAISS production shape: train offline, serve online). State is ONE
    warehouse table, ``semdup_vecs (id, cid, vec)``, bucketed on cid.

    Each tick (``admit``):
      1. batch vectors assigned to cells map-side (kmeans_assign — the
         centroid matrix is config-sized, no shuffle);
      2. vs the admitted index: candidates are in-cell rows (equi-join on
         cid — bucketed, so only the batch side shuffles), verified by
         cosine >= threshold;
      3. within the batch: in-cell lower-id pairs with the same cosine
         gate, resolved by the same sequential-greedy driver pass as the
         MinHash index (chains decide exactly);
      4. survivors are emitted and their (id, cid, vec) rows appended.

    Scale: clustering IS the blocking — candidate verification touches
    ~1/k of the index per batch row instead of all of it, and the state
    holds embeddings (dim floats per admitted doc), never text. Per-tick
    cost is O(batch x avg cell size) cosine folds, all JVM-side. The
    re-delivery contract matches NearDupIndex: a doc whose own id is
    already indexed is skipped on append (left-anti), never self-rejected.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        centroids: list[tuple[int, list[float]]],
        threshold: float = 0.85,
        n_buckets: int = 16,
    ):
        if not centroids:
            raise ValueError("SemanticDupIndex needs a trained quantizer")
        self.spark = spark
        self.wh = Warehouse(spark, root)
        self.centroids = sorted((int(c), list(v)) for c, v in centroids)
        self.threshold = threshold
        self.n_buckets = n_buckets
        self._suffix = hashlib.md5(root.encode()).hexdigest()[:10]

    def _catalog_name(self) -> str:
        return f"semdup_vecs_{self._suffix}"

    def _read_index(self) -> DataFrame:
        cat = self._catalog_name()
        if self.spark.catalog.tableExists(cat):
            return self.spark.table(cat)
        if self.wh.exists("semdup_vecs"):
            return self.wh.read("semdup_vecs")
        return self.spark.createDataFrame([], "id bigint, cid int, vec array<float>")

    def admit(self, df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
        """Return rows of ``df`` that are NOT semantic near-dups of
        anything admitted before (or of a lower-id batch survivor), and
        fold the survivors into the cell index."""
        from dawis_spark.functions import vectors as V
        from dawis_spark.operators.similarity import kmeans_assign

        batch = kmeans_assign(df, id_col, vec_col, self.centroids).persist()
        try:
            idx = self._read_index()
            cos = V.cosine_null("vec", "o_vec", "spark")
            gate = F.coalesce(F.round(F.expr(cos), 6), F.lit(-2.0)) >= F.lit(
                self.threshold
            )
            rejected_prev = {
                r["id"]
                for r in (
                    batch.join(
                        idx.select(
                            "cid",
                            F.col("id").alias("old_id"),
                            F.col("vec").alias("o_vec"),
                        ),
                        "cid",
                    )
                    .filter(F.col("id") != F.col("old_id"))
                    .filter(gate)
                    .select("id")
                    .distinct()
                    .collect()
                )
            }
            sim_pairs = (
                batch.select("cid", F.col("id").alias("id_a"), "vec")
                .join(
                    batch.select(
                        "cid", F.col("id").alias("id_b"), F.col("vec").alias("o_vec")
                    ),
                    "cid",
                )
                .filter(F.col("id_a") < F.col("id_b"))
                .filter(gate)
                .select("id_a", "id_b")
                .distinct()
                .collect()
            )
            rejected = greedy_reject(
                rejected_prev, [(r["id_a"], r["id_b"]) for r in sim_pairs]
            )
            rejected_df = self.spark.createDataFrame(
                [(i,) for i in sorted(rejected)], "id bigint"
            )
            keep = (
                batch.select("id", "cid", "vec")
                .join(rejected_df, "id", "left_anti")
                .join(idx.select("id"), "id", "left_anti")
            )
            self.wh.write_bucketed(
                keep,
                "semdup_vecs",
                ["cid"],
                self.n_buckets,
                mode="append",
                catalog_name=self._catalog_name(),
            )
        finally:
            batch.unpersist()
        rejected_ids = self.spark.createDataFrame(
            [(i,) for i in sorted(rejected)], "id bigint"
        )
        return df.join(
            rejected_ids.select(F.col("id").alias(id_col)), id_col, "left_anti"
        )
