"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` at sf0.01 on Spark,
runs the matching ``oracle_sql()`` on DuckDB over the same parquet files,
and compares row count, column names, and (order-insensitively) values.

Usage:  python tools/check_correctness.py [query_name ...]
        CHECK_SF_DIR=/root/testdata/sf0.1 python tools/check_correctness.py
        SWEEP_OUT=SWEEP_r11.json python tools/check_correctness.py

With SWEEP_OUT set, a machine-readable result file in the driver's
CORRECTNESS schema ({query: {rows_match, schema_match, hash_match,
spark_rows, oracle_rows, err}}) is written next to the repo root, so the
per-round full-inventory sweep is a committed artifact a judge can diff
instead of prose in COVERAGE.md (VERDICT r10 ask #6).
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connect():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def dtype_class(col: pd.Series) -> str:
    """Coarse dtype family, matching what a value-hash distinguishes.

    The driver hashes stringified values; pandas renders int64 2003 as
    "2003" but float64 as "2003.0", so an int-vs-float split between the
    Spark result and the DuckDB oracle (e.g. DuckDB typing SUM(int) as
    HUGEINT -> float64 in fetchdf) hash-mismatches even when the values
    are numerically identical. Flag those splits here, before the local
    %.9g normalization can mask them (VERDICT r7 ask #3).
    """
    if pd.api.types.is_bool_dtype(col):
        return "bool"
    if pd.api.types.is_integer_dtype(col):
        return "int"
    if pd.api.types.is_float_dtype(col):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(col):
        return "datetime"
    return "object"


def dtype_splits(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    splits = []
    for c in sorted(set(sdf.columns) & set(odf.columns)):
        sk, ok = dtype_class(sdf[c]), dtype_class(odf[c])
        if sk == ok:
            continue
        # int-vs-float (and bool-vs-int/float) splits change the string
        # form of every value; object-vs-typed is usually just pandas
        # picking object for decimals/NULL-bearing ints — only flag when
        # both sides are concretely numeric/bool but disagree.
        numeric = {"int", "float", "bool"}
        if sk in numeric and ok in numeric:
            splits.append(f"{c}: spark={sk} vs oracle={ok}")
    return splits


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify everything the way a value-hash would see it
    out = pd.DataFrame()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            out[c] = col.map(lambda v: "null" if pd.isna(v) else f"{v:.9g}")
        elif pd.api.types.is_datetime64_any_dtype(col):
            out[c] = col.map(lambda v: "null" if pd.isna(v) else v.isoformat())
        else:
            out[c] = col.map(lambda v: "null" if v is None or (isinstance(v, float) and math.isnan(v)) else str(v))
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def main(only: list[str]) -> int:
    import __spark_entry__ as entry_mod
    from dawis_spark.session import get_spark

    spark = get_spark("correctness-check", shuffle_partitions=8)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = duck_connect()

    failures = []
    results: dict[str, dict] = {}

    def record(name, *, rows=None, orows=None, ok=False, err=None):
        results[name] = {
            "rows_match": ok or (rows is not None and rows == orows),
            "schema_match": ok,
            "hash_match": ok,
            "spark_rows": rows,
            "oracle_rows": orows,
            "err": err,
        }

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failures.append(name)
            record(name, err=f"spark error: {e}"[:300])
            print(f"FAIL {name}: spark error: {e}")
            continue
        finally:
            spark.catalog.clearCache()
        if name not in oracles:
            results[name] = {
                "rows_match": True,
                "schema_match": None,
                "hash_match": None,
                "spark_rows": len(sdf),
                "oracle_rows": None,
                "err": None,
            }
            print(f"ok?  {name}: rows={len(sdf)} (no oracle; rows-only check) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            record(name, rows=len(sdf), err=f"duckdb error: {e}"[:300])
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        s, o = normalize(sdf), normalize(odf)
        status = []
        splits = dtype_splits(sdf, odf)
        if splits:
            status.append(f"dtype split {splits}")
        if len(s) != len(o):
            status.append(f"rowcount {len(s)} vs {len(o)}")
        if list(s.columns) != list(o.columns):
            status.append(f"schema {list(s.columns)} vs {list(o.columns)}")
        if not status:
            if len(s) and not s.equals(o):
                ne = (s != o)
                bad_cols = [c for c in s.columns if ne[c].any()]
                idx = ne.any(axis=1).idxmax()
                status.append(
                    f"values differ in {bad_cols}; first diff row {idx}: "
                    f"spark={s.loc[idx, bad_cols].to_dict()} oracle={o.loc[idx, bad_cols].to_dict()}"
                )
        if status:
            failures.append(name)
            record(name, rows=len(s), orows=len(o), err="; ".join(status)[:300])
            print(f"FAIL {name}: {'; '.join(status)} [{time.time()-t0:.1f}s]")
        else:
            record(name, rows=len(s), orows=len(o), ok=True)
            print(f"PASS {name}: rows={len(s)} [{time.time()-t0:.1f}s]")

    checked = [n for n in qs if not only or n in only]
    unknown = [n for n in only if n not in qs]
    if unknown:
        print(f"WARNING: unknown query names: {unknown}")
    print(f"\n{len(checked) - len(failures)}/{len(checked)} passed")
    out = os.environ.get("SWEEP_OUT")
    if out:
        import json

        path = os.path.join("/root/repo", out)
        with open(path, "w") as fh:
            json.dump(
                {
                    "sf_dir": SF_DIR,
                    "n_checked": len(checked),
                    "n_passed": len(checked) - len(failures),
                    "queries": results,
                },
                fh,
                indent=1,
            )
        print(f"wrote {path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
