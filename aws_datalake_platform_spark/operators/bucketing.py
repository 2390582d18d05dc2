"""Bucketed (co-located) joins: pay the shuffle once at write time.

The reference's serving layer is Athena over Glue tables, which supports
bucketed layouts (``CLUSTERED BY (col) INTO n BUCKETS`` — the Glue DDL
surface the reference's catalog implies; reference:
terraform/modules/glue/main.tf:37-290 declares the table plumbing this
mirrors). Spark's native equivalent is ``bucketBy`` at write time: both
sides of a recurring equi-join are hash-bucketed by the join key into
the same bucket count, and every later join between them plans as a
sort-merge join over matching bucket files with NO Exchange on either
side.

Why this matters at 100 TB: a fact-fact join (lineitem x orders) shuffles
both inputs every time it runs — at 100 TB that shuffle dominates the
query. Bucketing moves that shuffle to ingest: each task then reads
bucket i of both tables, so the join is embarrassingly parallel with
cluster-local I/O only. The bucket count should be sized so one bucket
of the bigger table fits an executor core's working set (e.g. 100 TB /
8192 buckets ~ 12 GB per bucket pre-compression).

Local-mode note: ``saveAsTable`` with the in-memory catalog keeps the
bucket metadata for the session; the parquet files live at the external
``path``. The ``repartition(n_buckets, key)`` before the write yields
exactly one file per bucket, which also lets Spark trust the per-bucket
sort order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Write ``df`` as an external parquet table hash-bucketed (and
    per-bucket sorted) by ``bucket_col``.

    One shuffle — the ``repartition`` on the bucket key — happens here so
    that no later join on ``bucket_col`` against an equally-bucketed table
    needs one. DROP first so repeated calls are idempotent even across
    schema changes."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (
        df.repartition(n_buckets, bucket_col)
        .write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on, how: str = "inner"
) -> DataFrame:
    """Join two bucketed tables on their bucket keys.

    When both tables are bucketed by the join key into the same bucket
    count, Catalyst plans a sort-merge join with ZERO Exchange operators
    (verify with .explain — tests/test_extras.py asserts it). Falls back
    to a normal shuffled join transparently if the layouts don't line up,
    so callers never get wrong answers from a mis-bucketed table."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: spread each hot key of the BIG side over
    ``n_salts`` reducers by joining on (key, salt), replicating the small
    side once per salt. Use when one key dominates (power-law fan-in) and
    the small side is too big to broadcast outright; AQE's skew-join
    split handles sort-merge skew automatically, but salting also covers
    aggregation-after-join and streaming joins where AQE cannot re-plan.

    The big-side salt is a deterministic hash of the whole row (pmod of
    xxhash64), so the join OUTPUT is independent of the salt — provably:
    every (big row, small row) key match still meets exactly once, on the
    big row's one salt value. Cost: small side inflated x n_salts through
    its shuffle; pick n_salts ~ the observed hot-key skew factor, not
    higher.
    """
    salt_big = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("__salt", salt_big.cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, [key, "__salt"], how).drop("__salt")
