"""Pre-flight mirror of the driver's correctness gate.

Runs the first N queries of ``__spark_entry__.queries()`` (the exact
slice the driver will sample this round) at sf0.01 against the DuckDB
oracle, using the same compare as tests/oracle.py. Run before the round
ends so CORRECTNESS_r{N}.json holds no surprises:

    python scripts/driver_mirror.py [--sf /root/testdata/sf0.01] [--n 50]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--only", nargs="*", default=None, help="query names to run")
    ap.add_argument(
        "--out",
        default=None,
        help="write the full per-query results dict (the CORRECTNESS_r{N} "
        "analogue) to this JSON file",
    )
    args = ap.parse_args()

    # driver memory must be set BEFORE the JVM launches: builder.config
    # has no effect in local mode once the gateway is up (ADVICE r4)
    import os

    submit = os.environ.get("PYSPARK_SUBMIT_ARGS", "")
    if "--driver-memory" not in submit:
        # prepend so an existing trailing "pyspark-shell" stays last
        submit = ("--driver-memory 8g " + submit).strip()
        if "pyspark-shell" not in submit:
            submit += " pyspark-shell"
        os.environ["PYSPARK_SUBMIT_ARGS"] = submit

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from tests.oracle import compare, duckdb_conn

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-mirror")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    con = duckdb_conn(args.sf)
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = args.only if args.only else list(qs)[: args.n]

    results: dict[str, dict] = {}
    bad = 0
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, args.sf)
            sql = oracles.get(name)
            if sql is None:
                n_rows = df.count()
                results[name] = {"status": "rows_only", "spark_rows": n_rows}
                status = f"rows_only({n_rows})"
                if n_rows <= 0:
                    bad += 1
                    status = "rows_only(EMPTY!)"
            else:
                ok, msg = compare(df, con, sql)
                results[name] = {"status": "ok" if ok else "FAIL", "msg": msg}
                status = "ok" if ok else f"FAIL {msg}"
                if not ok:
                    bad += 1
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            results[name] = {"status": "ERROR", "msg": repr(exc)[:300]}
            status = f"ERROR {exc!r}"[:200]
            bad += 1
        print(f"{name:40s} {time.time() - t0:6.1f}s  {status}", flush=True)

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)
    print(json.dumps({"total": len(names), "bad": bad}))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
