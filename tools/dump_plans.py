"""Dump ``.explain("formatted")`` for named registry queries to files.

Usage:
    python tools/dump_plans.py <outdir> <suffix> <query> [<query>...]

Writes ``<outdir>/<query>_<suffix>.txt`` per query (the optimization-round
evidence files: plans/r12/<query>_before.txt / _after.txt).  The plan is
captured from the same (spark, sf_dir) invocation the bench times, on the
bench session config, so Exchange counts / join strategies / PushedFilters
in the files match what the bench actually ran.

Note: index-lifecycle ops execute their side effects (builds/appends) when
invoked — the dump therefore reflects the plan of the RETURNED DataFrame;
for those ops the interesting sub-plans are documented in
OPTIMIZATION_r12.md instead.
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from sqlite_to_clickhouse_spark.registry import all_queries  # noqa: E402
from sqlite_to_clickhouse_spark.session import get_spark  # noqa: E402


def plan_text(df) -> str:
    jqe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jqe.explainString(mode)


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump-plans")
    registry = all_queries()
    for name in names:
        fn = registry[name].fn
        df = fn(spark, sf_dir)
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan_text(df))
        print(f"wrote {name}_{suffix}.txt", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
