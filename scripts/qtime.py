#!/usr/bin/env python3
"""Per-query timing/plan harness for optimization iteration (guide §1).

Times individual registry queries with bench.py's exact discipline
(clearCache before each pass, drain orphan AQE jobs, warmup pass
excluded, min over N passes) in ONE session, and optionally writes
``.explain("formatted")`` to a file so plan claims are auditable:

    python scripts/qtime.py q368_hits_hubs_authorities q394_label_propagation \
        [--sf /root/testdata/sf0.1] [--passes 3] [--explain-dir plans/r10] \
        [--explain-suffix before]

Timing methodology matches bench.py (count() materialization) so the
numbers are directly comparable to bench_full.json rows.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--explain-suffix", default="before")
    ap.add_argument("--noop", action="store_true",
                    help="materialize via the noop sink instead of count()")
    ap.add_argument("--plan-only", action="store_true",
                    help="only write the explain files, skip timing")
    args = ap.parse_args()

    from aws_datalake_platform_spark.plans.queries import QUERY_REGISTRY
    from aws_datalake_platform_spark.session import get_spark

    spark = get_spark(app_name="qtime",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _noop(s: pd.Series) -> pd.Series:
        return s

    spark.range(0, 10_000, 1, 32).select(_noop(F.col("id"))).count()

    def materialize(df):
        if args.noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    def drain(max_wait: float = 30.0) -> None:
        tracker = spark.sparkContext.statusTracker()
        t0 = time.perf_counter()
        while tracker.getActiveJobsIds() and time.perf_counter() - t0 < max_wait:
            time.sleep(0.05)

    results: dict[str, dict] = {}
    for name in args.names:
        spec = QUERY_REGISTRY.get(name)
        if spec is None:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        if args.explain_dir:
            out = Path(args.explain_dir)
            out.mkdir(parents=True, exist_ok=True)
            df = spec.fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            (out / f"{name}_{args.explain_suffix}.txt").write_text(plan)
        if args.plan_only:
            print(f"{name}: plan written", flush=True)
            continue
        spark.sparkContext.setJobDescription(f"warmup {name}")
        materialize(spec.fn(spark, args.sf))  # warmup (codegen/JIT)
        runs = []
        for i in range(args.passes):
            spark.catalog.clearCache()
            drain()
            spark.sparkContext.setJobDescription(f"{name} pass {i}")
            t0 = time.perf_counter()
            materialize(spec.fn(spark, args.sf))
            runs.append(round(time.perf_counter() - t0, 3))
        results[name] = {"min": min(runs), "runs": runs}
        print(f"{name:45s} min={min(runs):7.3f}  runs={runs}", flush=True)

    print(json.dumps(results))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
