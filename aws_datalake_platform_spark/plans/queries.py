"""Query library: the engine's SQL/DataFrame surface.

The reference's query capability is (a) its fixed PySpark transform
pipeline and (b) the entire Athena SQL surface over cataloged tables
(reference: README.md:128-132, docs/runbook.md:161). Each entry here is
one operator family from SURVEY.md §2, expressed as an idiomatic
DataFrame plan (Catalyst picks the physical strategy) plus a DuckDB
oracle SQL string for the driver's correctness harness.

Conventions (driver hash-compare contract):
- every computed column is aliased identically in Spark and SQL;
- floating aggregates are rounded explicitly on BOTH sides so
  accumulation-order differences between engines can't flip the hash;
- ordered/limited queries carry a total-order tiebreak so ties are
  deterministic;
- DuckDB integer SUMs are cast to BIGINT to match Spark's LongType.

Scale notes are in each docstring: what shuffles, what broadcasts, and
why the plan survives 100 TB.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.core import date_partition, fahrenheit, pseudonymize

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    sql: Optional[str]  # DuckDB oracle; None => rows-only check
    doc: str = ""


QUERY_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: Optional[str], doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        QUERY_REGISTRY[name] = QuerySpec(fn=fn, sql=sql, doc=doc)
        return fn

    return deco


def build_concurrently(*thunks: Callable[[], DataFrame]) -> list[DataFrame]:
    """Build INDEPENDENT eager DataFrames from a small driver thread pool
    (guide §2.6: actions are only sequential because driver code calls
    them sequentially). The multi-detector audit composites each chain
    2-3 detector builds whose internal persist+count / localCheckpoint
    barriers serialized them end-to-end; submitting the builds from
    threads lets each build's job tail back-fill cores the others leave
    idle. Results come back in thunk order, so combination logic — and
    therefore query RESULTS — are unchanged; only job scheduling is.

    ``inheritable_thread_target`` propagates the session's thread-local
    JVM properties (job descriptions/groups) into pool threads, per the
    PySpark docs for driver-side concurrency."""
    if len(thunks) == 1:
        return [thunks[0]()]
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(inheritable_thread_target(t)) for t in thunks]
        return [f.result() for f in futures]


# ─────────────────────────────────────────────────────────────────────────────
# Core aggregation surface (reference A1-A5, Athena-implied §2.7)
# ─────────────────────────────────────────────────────────────────────────────


@register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary. Flagship scan+aggregate.",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: single scan, partial (map-side) aggregation on 2 low-cardinality
    keys -> ~6 groups; shuffle is a few KB regardless of input size. The
    shipdate filter and 7-column projection push into the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q02_group_count",
    "SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type",
    doc="Reference serving query A3: SELECT city, COUNT(*) ... GROUP BY city "
    "(README.md:130-131), over the events table.",
)
def q02_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: map-side partial count then tiny shuffle (one row per type)."""
    return load_table(spark, sf_dir, "events").groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "q03_filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity BETWEEN 1 AND 5 AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
    """,
    doc="Filter + projection (reference F2 range predicate semantics, "
    "transform.py:76-95). Verifies pushdown path.",
)
def q03_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: no shuffle at all — pure scan with pushed predicates and a
    4-column ReadSchema; row-group/page skipping via parquet min-max stats."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(1, 5)
        & (F.col("l_shipdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@register(
    "q04_validation_fused",
    """
    SELECT COUNT(*) AS total_count,
           CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_quantity,
           CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_discount,
           CAST(SUM(CASE WHEN l_quantity < 0 OR l_quantity > 100 THEN 1 ELSE 0 END) AS BIGINT) AS oor_quantity,
           CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS oor_discount,
           CAST(SUM(CASE WHEN l_tax < 0 OR l_tax > 1 THEN 1 ELSE 0 END) AS BIGINT) AS oor_tax
    FROM lineitem
    """,
    doc="The validation suite (F1/F2/F3, transform.py:51-118) fused into ONE "
    "aggregate pass instead of the reference's 13 scans.",
)
def q04_validation_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the key improvement over the reference — N expectations cost one
    scan, not N scans. All conditional sums partial-aggregate map-side."""
    li = load_table(spark, sf_dir, "lineitem")

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    return li.agg(
        F.count(F.lit(1)).alias("total_count"),
        cnt(F.col("l_quantity").isNull()).alias("null_quantity"),
        cnt(F.col("l_discount").isNull()).alias("null_discount"),
        cnt((F.col("l_quantity") < 0) | (F.col("l_quantity") > 100)).alias("oor_quantity"),
        cnt((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).alias("oor_discount"),
        cnt((F.col("l_tax") < 0) | (F.col("l_tax") > 1)).alias("oor_tax"),
    )


# ─────────────────────────────────────────────────────────────────────────────
# Join surface (§2.7: equi inner/outer/semi/anti, broadcast vs shuffle)
# ─────────────────────────────────────────────────────────────────────────────


@register(
    "q05_join_agg",
    """
    SELECT c.c_mktsegment,
           ROUND(SUM(o.o_totalprice), 2) AS revenue,
           COUNT(*) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Equi inner join + aggregation.",
)
def q05_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: customer is ~1/10 of orders; at 100 TB both are large so this is
    a shuffle join on the key — AQE converts to broadcast when the built side
    fits. We join then aggregate on a low-cardinality column (tiny shuffle)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "q06_join_5way",
    """
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5-style 5-way join: big-big shuffle joins + broadcast dims.",
)
def q06_join_5way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: nation/region are tiny forever -> explicit broadcast() so the
    dimension joins never shuffle the fact table; lineitem-orders-customer
    shuffle on their keys. The region filter prunes before the big joins
    (Catalyst pushes it through the broadcast join)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = F.broadcast(nation.join(region, nation.n_regionkey == region.r_regionkey))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(dims, customer.c_nationkey == dims.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "q07_semi_join",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
    doc="Left-semi join (EXISTS).",
)
def q07_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: semi join never duplicates rows and only ships the join key of
    the right side; with AQE it becomes broadcast when the filtered orders
    key set is small."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "q08_anti_join",
    """
    SELECT c_custkey, c_acctbal FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
    doc="Left-anti join (NOT EXISTS): customers with no URGENT orders. "
    "(The unfiltered 'no orders at all' variant is vacuous in this "
    "testdata — every customer has orders at every SF — and a 0-row "
    "oracle proves nothing.)",
)
def q08_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_acctbal")


@register(
    "q09_outer_join",
    """
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders,
           ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS total_spent
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
    doc="Left outer join preserving customers with zero orders.",
)
def q09_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


# ─────────────────────────────────────────────────────────────────────────────
# Window / sort / top-k surface (§2.7)
# ─────────────────────────────────────────────────────────────────────────────


@register(
    "q10_window_topk",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rk
      FROM orders) t
    WHERE rk <= 3
    """,
    doc="Top-k per group via row_number window (deterministic tiebreak).",
)
def q10_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one shuffle on o_custkey; rank filter applied before any
    further stage. Spark pushes a per-partition top-k (WindowGroupLimit)
    below the shuffle so skewed customers don't blow memory."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


@register(
    "q11_window_running",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           ROUND(COALESCE(LAG(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey), 0), 2) AS prev_price
    FROM orders
    """,
    doc="Running sum + lag over per-customer order history.",
)
def q11_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
            2,
        ).alias("running_total"),
        F.round(F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)), 2).alias("prev_price"),
    )


@register(
    "q12_sort_limit",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    doc="Global top-N with deterministic tiebreak.",
)
def q12_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: orderBy+limit compiles to TakeOrderedAndProject — each task
    keeps only its local top-10, driver merges; no global sort ever runs."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# ─────────────────────────────────────────────────────────────────────────────
# Set ops / distinct / grouping sets (§2.7)
# ─────────────────────────────────────────────────────────────────────────────


@register(
    "q13_intersect",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="Set intersection: customers holding both open and filled orders.",
)
def q13_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    filled_c = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_c.intersect(filled_c)


@register(
    "q14_union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="UNION (distinct) across two tables.",
)
def q14_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supplier = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return customer.union(supplier).distinct()


@register(
    "q15_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS cnt
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    HAVING COUNT(*) > 0
    """,
    doc="ROLLUP grouping sets with subtotal + grand-total rows. The "
    "HAVING guard only bites on an EMPTY table, where ANSI emits a "
    "0-count grand-total row but Spark's rollup returns no rows.",
)
def q15_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "q16_cube",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    HAVING COUNT(*) > 0
    """,
    doc="CUBE over order status x priority. HAVING guard: empty-table "
    "grand-total row parity with Spark (see q15).",
)
def q16_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "q17_distinct",
    "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    doc="DISTINCT projection.",
)
def q17_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@register(
    "q60_except_all",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="EXCEPT ALL: multiset difference preserving duplicate multiplicity.",
)
def q60_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference. Spark plans exceptAll as a count-tagged
    aggregate + generate (one shuffle on the key), never a row-by-row
    anti-join — multiplicity arithmetic happens in the aggregate, so the
    plan is a single hash-shuffle regardless of duplicate depth."""
    orders = load_table(spark, sf_dir, "orders")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    filled_c = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_c.exceptAll(filled_c)


@register(
    "q61_intersect_all",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="INTERSECT ALL: multiset intersection with min-multiplicity semantics.",
)
def q61_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    filled_c = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_c.intersectAll(filled_c)


@register(
    "q62_union_by_name",
    """
    SELECT c_custkey AS entity_key, c_nationkey AS nationkey, c_acctbal AS acctbal
    FROM customer
    UNION ALL BY NAME
    SELECT s_nationkey AS nationkey, s_suppkey AS entity_key
    FROM supplier
    """,
    doc="unionByName(allowMissingColumns=True): schema-aligned union across "
    "heterogeneous projections; columns matched by NAME (not position), "
    "missing columns null-padded — DuckDB's UNION ALL BY NAME.",
)
def q62_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: pure union of two scans — no shuffle at all (narrow
    dependency); the null pad is a literal projection."""
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_suppkey").alias("entity_key"),
    )
    return customer.unionByName(supplier, allowMissingColumns=True)


# ─────────────────────────────────────────────────────────────────────────────
# Reference-parity derived columns + pseudonymization (P1-P3, U1)
# ─────────────────────────────────────────────────────────────────────────────


@register(
    "q18_derived_columns",
    """
    SELECT event_id,
           ROUND(value * 9 / 5 + 32, 2) AS value_f,
           strftime(ts, '%Y-%m-%d') AS date,
           CASE WHEN value >= 50 AND props IS NOT NULL THEN 'PASS'
                WHEN value >= 20 THEN 'WARN'
                ELSE 'FAIL' END AS quality_score
    FROM events
    """,
    doc="Reference P1 (fahrenheit, transform.py:171-173), P2 (date partition "
    "via string prefix, :174-177) and P3 (3-way CASE quality, :238-251) "
    "applied to the events table.",
)
def q18_derived_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: pure narrow projection — no shuffle, fully codegen'd."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        fahrenheit(F.col("value")).alias("value_f"),
        F.date_format("ts", "yyyy-MM-dd").alias("date"),
        F.when((F.col("value") >= 50) & F.col("props").isNotNull(), "PASS")
        .when(F.col("value") >= 20, "WARN")
        .otherwise("FAIL")
        .alias("quality_score"),
    )


@register(
    "q19_pseudonymize",
    "SELECT c_custkey, sha256(c_name) AS name_hash FROM customer",
    doc="Reference U1: SHA-256 pseudonymization (transform.py:122-130) as "
    "native sha2 — identical hex, no Python UDF round trip.",
)
def q19_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.select("c_custkey", pseudonymize("c_name").alias("name_hash"))


# ─────────────────────────────────────────────────────────────────────────────
# Statistics + time bucketing (streaming-window analog in batch)
# ─────────────────────────────────────────────────────────────────────────────


@register(
    "q20_agg_stats",
    """
    SELECT event_type,
           ROUND(AVG(value), 4) AS avg_value,
           ROUND(MIN(value), 4) AS min_value,
           ROUND(MAX(value), 4) AS max_value,
           ROUND(STDDEV_SAMP(value), 4) AS std_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
    doc="Statistical aggregate battery incl. exact distinct count.",
)
def q20_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: countDistinct triggers an expand+two-phase agg; acceptable on
    a 5-group key. For high-cardinality groups prefer approx_count_distinct
    (exposed in q21)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.min("value"), 4).alias("min_value"),
        F.round(F.max("value"), 4).alias("max_value"),
        F.round(F.stddev_samp("value"), 4).alias("std_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "q21_time_bucket",
    """
    SELECT date_trunc('hour', ts) AS hour_bucket,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY date_trunc('hour', ts)
    """,
    doc="Tumbling hourly rollup — batch analog of the streaming window "
    "surface (Firehose 60s buffering, kinesis/main.tf:40-42).",
)
def q21_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("hour", "ts").alias("hour_bucket")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
