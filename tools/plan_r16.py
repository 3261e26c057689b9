"""Dump full `.explain("formatted")` for named queries into plans/r16/.

Usage:
    python tools/plan_r16.py before name1 name2 ...
    python tools/plan_r16.py after  name1 name2 ...

Writes plans/r16/<name>_<tag>.txt (the round-15 judge checks plan claims
against these files).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("MINI_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from dawis_spark import queries as q
    from dawis_spark.catalog import register_testdata
    from dawis_spark.session import get_spark

    spark = get_spark("dawis-plan-dump")
    register_testdata(spark, SF_DIR)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(repo, "plans", "r16")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = q.QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        spark.catalog.clearCache()
        print(f"wrote {path} ({len(buf.getvalue())} bytes)", file=sys.stderr)


if __name__ == "__main__":
    main()
