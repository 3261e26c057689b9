"""Subset bench for optimization iteration (round 15).

Times the named queries with the same methodology as bench.py (noop sink,
1 cold + 2-3 warm passes, per-query MEDIAN of warm passes, clearCache
between queries) but over an arbitrary subset, so one query's change can
be re-measured in seconds instead of re-running the full 388-query sweep.

Usage:
    python tools/mini_bench.py name1 name2 ...
    python tools/mini_bench.py --top 20           # slowest 20 per BENCH_LOCAL.json
    MINI_SF_DIR=/root/testdata/sf0.1 python tools/mini_bench.py ...

Prints one JSON object {name: {"cold": s, "warm": s, "raw": [...]}} and a
total; purely a dev tool — the committed numbers come from bench.py.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("MINI_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args and args[0] == "--top":
        n = int(args[1])
        with open(os.path.join(repo, "BENCH_LOCAL.json")) as fh:
            base = json.load(fh)["queries"]
        names = [k for k, _ in sorted(base.items(), key=lambda kv: -kv[1])][:n]
    else:
        names = args

    from dawis_spark import queries as q
    from dawis_spark.catalog import register_testdata
    from dawis_spark.session import get_spark

    spark = get_spark("dawis-mini-bench")
    spark.range(1000).count()
    register_testdata(spark, SF_DIR)

    out: dict[str, dict] = {}
    for name in names:
        fn = q.QUERIES[name]
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.mode("overwrite").format("noop").save()
        cold = time.time() - t0
        runs = []
        for _ in range(2):
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            runs.append(time.time() - t0)
        if (min(runs) > 0.3 and max(runs) / min(runs) > 1.5) or min(
            runs
        ) > cold * 1.2:
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            runs.append(time.time() - t0)
        out[name] = {
            "cold": round(cold, 3),
            "warm": round(statistics.median(runs), 3),
            "raw": [round(r, 3) for r in runs],
        }
        spark.catalog.clearCache()
        print(
            f"{name}: warm={out[name]['warm']} cold={out[name]['cold']}"
            f" raw={out[name]['raw']}",
            file=sys.stderr,
        )
    total = round(sum(v["warm"] for v in out.values()), 3)
    print(json.dumps({"queries": out, "warm_total": total}, indent=1))


if __name__ == "__main__":
    main()
