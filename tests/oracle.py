"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a Spark query and its DuckDB oracle SQL on the same parquet tables,
then compares row count, column-name set, and an order-insensitive
value representation (columns sorted by name, floats rounded, rows
sorted by their string form). Catching a mismatch here means catching
it before the driver's CORRECTNESS_r{N}.json does.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round to 6 significant-ish decimals; queries already round
        # explicitly, this only smooths representation noise
        return f"{v:.6f}"
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def canonical_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [columns[i] for i in order], out  # name-sorted columns + rows


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    _, s_canon = canonical_rows(s_cols, s_rows)
    _, d_canon = canonical_rows(d_cols, d_rows)
    if s_canon != d_canon:
        diff = [(a, b) for a, b in zip(s_canon, d_canon) if a != b][:3]
        return False, f"value mismatch, first diffs: {diff}"
    return True, "ok"
