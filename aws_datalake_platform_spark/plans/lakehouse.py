"""Lakehouse change-management operators: SCD2 interval build, CDC MERGE
apply, and a count-min frequency sketch.

These are the table-maintenance shapes a curated lake (the reference's
processed zone, transform.py:144-233) needs once data starts CHANGING
instead of only appending: dimension history tracking (SCD type 2),
applying an upsert/delete changelog onto a base snapshot (Delta/Iceberg
MERGE INTO semantics, expressed as pure relational ops so they run on
plain parquet), and a mergeable frequency sketch for hot-key detection.

Complements q73 (snapshot diff), q102 (keep-latest compaction) and q84
(HLL distinct sketch): q142/q143 cover the WRITE side of change
management, q144 covers frequency (count-min) where HLL covers
cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .queries import register

# ── q142: SCD2 validity intervals from an event stream ──────────────────────


@register(
    "q142_scd2_intervals",
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type AS state, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             AS is_current
    FROM changes
    """,
    doc="SCD type-2 dimension build: collapse an event stream into "
    "validity intervals — consecutive same-state events merge "
    "(gaps-and-islands via lag), each state change opens an interval "
    "closed by lead(ts); the open interval is flagged is_current. The "
    "history-tracking write path every warehouse dimension needs.",
)
def q142_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: both windows key on user_id, so the whole build is ONE
    shuffle + sort reused by lag, the filter, and lead (same
    partitioning and ordering — Spark plans a single Window exchange).
    Per-key history length bounds the sort run, not total data."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        .select("user_id", "event_type", "ts", "event_id")
    )
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


# ── q143: CDC MERGE apply (upserts + deletes + inserts) ─────────────────────


@register(
    "q143_cdc_merge_apply",
    """
    WITH changes AS (
      SELECT CASE WHEN o_custkey % 41 = 0 THEN o_custkey + 10000000
                  ELSE o_custkey END AS key,
             CASE WHEN o_custkey % 41 = 0 THEN 'I'
                  WHEN o_custkey % 37 = 0 THEN 'D'
                  ELSE 'U' END AS op,
             ROUND(o_totalprice, 2) AS new_bal,
             o_orderdate AS seq_ts, o_orderkey AS seq_id
      FROM orders
    ),
    latest AS (
      SELECT key, op, new_bal FROM (
        SELECT *, row_number() OVER (PARTITION BY key
                                     ORDER BY seq_ts DESC, seq_id DESC) AS rn
        FROM changes
      ) WHERE rn = 1
    )
    SELECT c.c_custkey, c.c_name,
           CASE WHEN l.op = 'U' THEN l.new_bal
                ELSE ROUND(c.c_acctbal, 2) END AS bal
    FROM customer c LEFT JOIN latest l ON c.c_custkey = l.key
    WHERE l.key IS NULL OR l.op <> 'D'
    UNION ALL
    SELECT l.key AS c_custkey,
           'NEW#' || CAST(l.key AS VARCHAR) AS c_name,
           l.new_bal AS bal
    FROM latest l
    WHERE l.op = 'I'
      AND l.key NOT IN (SELECT c_custkey FROM customer)
    """,
    doc="CDC MERGE apply: collapse a changelog (op in I/U/D, ordered by a "
    "sequence column) to latest-per-key, then apply onto a base "
    "snapshot — matched deletes drop, matched updates overwrite, "
    "unmatched inserts append: MERGE INTO semantics on plain parquet. "
    "Changelog derived deterministically from orders (custkey%41 -> "
    "insert under a shifted key, %37 -> delete, else update balance to "
    "the latest order total).",
)
def q143_cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: latest-per-key is one shuffle on key (WindowGroupLimit
    prunes to rank 1 map-side); the apply is one join of base vs the
    collapsed changelog — churn-sized, usually broadcastable — plus an
    anti-join for inserts that reuses the same collapsed relation. No
    full-table rewrite logic lives driver-side."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    changes = orders.select(
        F.when(F.col("o_custkey") % 41 == 0, F.col("o_custkey") + 10000000)
        .otherwise(F.col("o_custkey"))
        .alias("key"),
        F.when(F.col("o_custkey") % 41 == 0, F.lit("I"))
        .when(F.col("o_custkey") % 37 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.round("o_totalprice", 2).alias("new_bal"),
        F.col("o_orderdate").alias("seq_ts"),
        F.col("o_orderkey").alias("seq_id"),
    )
    w = Window.partitionBy("key").orderBy(F.col("seq_ts").desc(), F.col("seq_id").desc())
    latest = (
        changes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("key", "op", "new_bal")
    )
    survivors = (
        cust.join(latest, cust["c_custkey"] == latest["key"], "left")
        .filter(F.col("key").isNull() | (F.col("op") != "D"))
        .select(
            "c_custkey",
            "c_name",
            F.when(F.col("op") == "U", F.col("new_bal"))
            .otherwise(F.round("c_acctbal", 2))
            .alias("bal"),
        )
    )
    inserts = (
        latest.filter(F.col("op") == "I")
        .join(cust.select("c_custkey"), latest["key"] == cust["c_custkey"], "left_anti")
        .select(
            F.col("key").alias("c_custkey"),
            F.concat(F.lit("NEW#"), F.col("key").cast("string")).alias("c_name"),
            F.col("new_bal").alias("bal"),
        )
    )
    return survivors.unionAll(inserts)


# ── q144: count-min frequency sketch ────────────────────────────────────────

_CMS_DEPTH = 3
_CMS_WIDTH = 64


@register(
    "q144_countmin_sketch",
    f"""
    WITH rows_j AS (SELECT * FROM (VALUES (0), (1), (2)) t(j)),
    cells AS (
      SELECT j,
             ('0x' || substr(md5(j::VARCHAR || '|' || user_id::VARCHAR), 1, 15))::BIGINT
               % {_CMS_WIDTH} AS bucket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events CROSS JOIN rows_j
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS true_cnt
      FROM events GROUP BY user_id
    )
    SELECT t.user_id, t.true_cnt, min(c.cnt) AS cms_cnt
    FROM truth t
    CROSS JOIN rows_j j
    JOIN cells c
      ON c.j = j.j
     AND c.bucket = ('0x' || substr(md5(j.j::VARCHAR || '|' || t.user_id::VARCHAR), 1, 15))::BIGINT
                    % {_CMS_WIDTH}
    GROUP BY t.user_id, t.true_cnt
    """,
    doc="Count-min sketch: a depth-3 x width-64 counter grid over "
    "event user_ids (md5-derived hash rows, engine-portable), probed "
    "back for every key next to the exact count — cms_cnt >= true_cnt "
    "always (one-sided error), equality when a key's three buckets are "
    "collision-free. The mergeable hot-key detector: cells sum across "
    "partitions/days, so frequency is maintained incrementally where "
    "exact counts need a full re-scan.",
)
def q144_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the sketch build is one hash aggregate into at most d*w =
    192 cells (map-side combine does almost all the work — the shuffle
    carries 192 rows per task); probing joins against those 192 rows by
    broadcast. The exact-count branch here exists only to exhibit the
    error bound; production keeps just the cells."""
    ev = load_table(spark, sf_dir, "events")

    def bucket(j_col, key_col):
        return F.conv(
            F.substring(
                F.md5(F.concat(j_col.cast("string"), F.lit("|"), key_col.cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long") % _CMS_WIDTH

    rows_j = F.explode(F.array(*[F.lit(j) for j in range(_CMS_DEPTH)])).alias("j")
    cells = (
        ev.select("user_id").select(rows_j, "user_id")
        .groupBy("j", bucket(F.col("j"), F.col("user_id")).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    truth = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_cnt"))
    probes = truth.select(rows_j, "user_id", "true_cnt").withColumn(
        "bucket", bucket(F.col("j"), F.col("user_id"))
    )
    return (
        probes.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("user_id", "true_cnt")
        .agg(F.min("cnt").alias("cms_cnt"))
    )
