"""TPC-H query shapes, batch 2: Q5, Q7, Q8, Q15, Q17, Q18, Q19, Q22.

Together with q01 (Q1), q55 (Q3), q125-q128 (Q6/Q13/Q14/Q10), the
adapted q147/q148/q152 (Q4/Q12/Q9-retail), and plans/tpch2.py
(Q2/Q9/Q11/Q16/Q20 full-shape over a deterministic derived partsupp +
adapted Q21), the engine covers ALL 22 TPC-H shapes — 19 full-shape (5
of those on the derived partsupp), 3 adapted where date columns are
absent (derivations documented at each query). These are the
serving-layer
query patterns the reference's Athena surface exists for
(reference README.md:128-132): multi-way dim joins with dual-key
conditions, bidirectional nation pairs, market-share ratios, argmax via
scalar subquery, correlated-average filters, HAVING-driven semi-joins,
disjunctive predicate pushdown, and anti-join cohort rollups.

Grouped revenue sums use integer-cents arithmetic
(SUM(ROUND(price*100)::BIGINT * ...)) so results are exact and
accumulation-order independent — double sums would hash-mismatch the
DuckDB oracle on ties of floating-point error, not semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .queries import register

def _rev_cents():
    """Revenue in integer cents: exact across engines and partition orders.

    Built lazily — Column construction needs an active SparkContext,
    which doesn't exist at import time."""
    return F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )


_REV_CENTS_SQL = (
    "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))"
)


# ── q133: TPC-H Q5 — local supplier volume ──────────────────────────────────


@register(
    "q133_tpch_q5",
    f"""
    SELECT n.n_name,
           SUM({_REV_CENTS_SQL}) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-01-01'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 (local supplier volume): revenue per nation where the "
    "supplier and customer share a nation inside one region — the "
    "classic 6-way join with a dual-key (suppkey AND nationkey) fact "
    "join condition.",
)
def q133_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the year filter prunes orders at the scan before the fact
    join; supplier/nation/region broadcast (dims), so the only shuffles
    are lineitem-orders-customer on their keys; the nationkey equality
    rides along as a post-broadcast filter, never a shuffle key."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .join(li, orders["o_orderkey"] == li["l_orderkey"])
        .join(
            F.broadcast(supp),
            (li["l_suppkey"] == supp["s_suppkey"])
            & (cust["c_nationkey"] == supp["s_nationkey"]),
        )
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("n_name")
        .agg((F.sum(_rev_cents()) / 10000.0).alias("revenue"))
    )


# ── q135: TPC-H Q7 — volume shipping between two nations ────────────────────


@register(
    "q135_tpch_q7",
    f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
           SUM({_REV_CENTS_SQL}) / 10000.0 AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 (volume shipping): bilateral trade between two nations "
    "by year — the same nation dim joined twice under different roles "
    "with a symmetric OR pair predicate.",
)
def q135_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: both nation copies broadcast; the pair predicate cannot be
    pushed below the joins (it spans both sides) but each nation
    broadcast is pre-filtered to the two named nations, so the fact
    stream shrinks at the supplier and customer joins, not at the end."""
    # NATION_3/NATION_8: the only nation pair with suppliers at EVERY
    # test SF (sf0.001 has just 10 suppliers over 10 nations) — the
    # old NATION_1/NATION_2 pair made the query vacuous at sf0.001.
    pair = ["NATION_3", "NATION_8"]
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(pair))
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        supp.join(li, supp["s_suppkey"] == li["l_suppkey"])
        .join(orders, orders["o_orderkey"] == li["l_orderkey"])
        .join(cust, cust["c_custkey"] == orders["o_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg((F.sum(_rev_cents()) / 10000.0).alias("revenue"))
    )


# ── q136: TPC-H Q8 — national market share ──────────────────────────────────


@register(
    "q136_tpch_q8",
    f"""
    WITH all_sales AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
             {_REV_CENTS_SQL} AS volume_cents,
             n1.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      JOIN region r   ON n2.n_regionkey = r.r_regionkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      WHERE r.r_name = 'AMERICA'
        AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1995-01-01'
        AND o.o_orderdate < TIMESTAMP '1997-01-01'
    )
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_3'
                          THEN volume_cents ELSE 0 END) * 1.0
                 / SUM(volume_cents), 6) AS mkt_share
    FROM all_sales
    GROUP BY o_year
    """,
    doc="TPC-H Q8 (national market share): one nation's share of ECONOMY "
    "part revenue sold into AMERICA, by year — a 7-way join feeding a "
    "conditional-over-total ratio; the nation dim appears in two roles "
    "(customer region membership, supplier attribution).",
)
def q136_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the p_type filter makes part the selective driver — it
    broadcasts and prunes lineitem first; both nation copies + region
    broadcast; the ratio fuses into one aggregate (no second pass).
    Integer-cent volumes keep the share exact to the last ulp on both
    engines."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    sales = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), supp["s_suppkey"] == li["l_suppkey"])
        .join(orders, orders["o_orderkey"] == li["l_orderkey"])
        .join(cust, cust["c_custkey"] == orders["o_custkey"])
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n2_region") == region["r_regionkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            _rev_cents().alias("volume_cents"),
            "supp_nation",
        )
    )
    national = F.when(F.col("supp_nation") == "NATION_3", F.col("volume_cents")).otherwise(
        F.lit(0)
    )
    return sales.groupBy("o_year").agg(
        F.round(F.sum(national) * 1.0 / F.sum("volume_cents"), 6).alias("mkt_share")
    )


# ── q137: TPC-H Q15 — top supplier by quarterly revenue ─────────────────────


@register(
    "q137_tpch_q15",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM({_REV_CENTS_SQL}) AS total_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_cents / 10000.0 AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_cents = (SELECT MAX(total_cents) FROM revenue)
    """,
    doc="TPC-H Q15 (top supplier): quarterly per-supplier revenue, keep "
    "the max — argmax via a scalar subquery over a derived relation "
    "(the spec's CREATE VIEW inlined as a CTE). Exact integer-cent "
    "totals make the equality-with-MAX well-defined; a double total "
    "could tie-break on rounding error.",
)
def q137_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one shuffle to aggregate revenue by suppkey; the 1-row MAX
    broadcasts back over it (no resort, no second scan of lineitem);
    supplier joins in by broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_cents()).alias("total_cents")
    )
    top = revenue.agg(F.max("total_cents").alias("__max_cents"))
    return (
        revenue.join(
            F.broadcast(top), revenue["total_cents"] == top["__max_cents"]
        )
        .join(F.broadcast(supp), F.col("supplier_no") == supp["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_cents") / 10000.0).alias("total_revenue"),
        )
    )


# ── q138: TPC-H Q17 — small-quantity-order revenue ──────────────────────────


@register(
    "q138_tpch_q17",
    """
    SELECT ROUND(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) / 100.0
                 / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
    doc="TPC-H Q17 (small-quantity-order revenue): lineitems whose "
    "quantity is under 20% of the part's average quantity — the "
    "correlated-AVG subquery shape, decorrelated into a per-part "
    "aggregate join.",
)
def q138_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the correlated subquery is decorrelated by hand: one
    groupBy(l_partkey) average over the (brand-filtered via semi-join
    pushdown) lineitems, joined back on partkey — the same rewrite
    Catalyst/DuckDB apply internally. The threshold compares an integer
    quantity to 0.2*avg, so double rounding cannot flip the predicate."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    li = load_table(spark, sf_dir, "lineitem")
    # per-part averages only for parts of the brand (semi-join prune first)
    brand_li = li.join(
        F.broadcast(part.select("p_partkey")), li["l_partkey"] == part["p_partkey"]
    ).drop("p_partkey")
    avg_qty = brand_li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (0.2 * F.avg("l_quantity")).alias("__qty_cap")
    )
    return (
        brand_li.join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("__qty_cap"))
        .agg(
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")) / 100.0 / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


# ── q139: TPC-H Q18 — large-volume customers ────────────────────────────────


@register(
    "q139_tpch_q18",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey
                           HAVING SUM(l_quantity) > 250)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    doc="TPC-H Q18 (large-volume customers): orders whose total quantity "
    "exceeds a threshold, with customer detail — the IN-over-HAVING "
    "shape that plans as an aggregate-then-semi-join. Threshold 250 "
    "(spec: 300) sized to the testdata's order-size distribution.",
)
def q139_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the HAVING aggregate and the semi-join both key on
    l_orderkey, so the qualifying-order set reuses the aggregation
    partitioning; the rejoin to lineitem re-aggregates only qualifying
    orders (a tiny fraction). The qualifying set is small → broadcast
    semi-join, no fact-fact shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 250)
        .select("l_orderkey")
    )
    return (
        orders.join(F.broadcast(big), orders["o_orderkey"] == big["l_orderkey"], "left_semi")
        .join(cust, cust["c_custkey"] == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == li["l_orderkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )


# ── q140: TPC-H Q19 — disjunctive predicate revenue ─────────────────────────


@register(
    "q140_tpch_q19",
    f"""
    SELECT SUM({_REV_CENTS_SQL}) / 10000.0 AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 30)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 40)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
    doc="TPC-H Q19 (discounted revenue, disjunctive predicates): three "
    "OR'd brand/size/quantity bands across the join — the classic test "
    "of predicate decomposition: the part-only and lineitem-only "
    "conjuncts must still push below the join even though the OR spans "
    "both tables.",
)
def q140_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: Catalyst derives single-side implications of the OR
    (p_brand IN (...) AND p_size BETWEEN 1 AND 50 on the part side,
    l_quantity BETWEEN 1 AND 50 on the fact side) and pushes them to
    the scans; the full disjunction re-applies after the broadcast
    join. Part broadcasts; one fused sum."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    band = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 30)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 40)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 50)
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .filter(band)
        .agg((F.sum(_rev_cents()) / 10000.0).alias("revenue"))
    )


# ── q141: TPC-H Q22 — dormant high-balance customers (adapted) ──────────────


@register(
    "q141_tpch_q22",
    """
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) / 100.0 AS totacctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY n.n_name
    """,
    doc="TPC-H Q22 (global sales opportunity), adapted: customers with "
    "above-average positive balances and no orders since 1999 "
    "(every testdata customer has SOME order, so dormancy replaces "
    "order-less; the missing c_phone country code becomes the nation "
    "dim). Scalar-AVG threshold + NOT-EXISTS anti-join, the spec's "
    "exact plan shape.",
)
def q141_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the AVG threshold is a 1-row broadcast cross join; the
    NOT EXISTS is a left-anti join on custkey against just the
    o_custkey column (projection pruned to one column before the
    shuffle); nation broadcasts over the surviving handful."""
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    nation = load_table(spark, sf_dir, "nation")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(
            recent.select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(F.round(F.col("c_acctbal") * 100).cast("long")) / 100.0).alias(
                "totacctbal"
            ),
        )
    )


# ── q147: TPC-H Q4 shape — late-order priority check (adapted) ──────────────


@register(
    "q147_tpch_q4_late_orders",
    """
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape (order priority checking), adapted: orders in a "
    "quarter with at least one lineitem shipped 60+ days after order "
    "date, counted by priority (the testdata lacks "
    "commit/receipt dates, so shipdate-vs-orderdate lateness stands "
    "in). Correlated EXISTS with a non-equi conjunct -> semi-join.",
)
def q147_tpch_q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the quarter filter prunes orders first; the EXISTS plans
    as a left-semi join on orderkey carrying the lateness predicate as
    a join residual — lineitem is never widened, duplicates never
    materialize (semi stops at first match)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders["o_orderkey"] == li["l_orderkey"])
            & (li["l_shipdate"] > orders["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ── q148: TPC-H Q12 shape — shipping lateness by priority (adapted) ─────────


@register(
    "q148_tpch_q12_ship_lateness",
    """
    SELECT o.o_orderpriority,
           CAST(SUM(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
           CAST(SUM(CASE WHEN l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS ontime_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q12 shape (shipping mode / lateness distribution), "
    "adapted to shipdate-vs-orderdate lag over order priority (no "
    "shipmode column in the testdata): fused conditional counts over "
    "a fact-fact join pruned by the shipdate year.",
)
def q148_tpch_q12_ship_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the year filter prunes lineitem at the scan; both
    conditional sums fuse into one aggregate over the orderkey join;
    group key cardinality (priorities) is tiny so the final combine is
    a 5-row exchange."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    return (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(late, 1).otherwise(0)).alias("late_count"),
            F.sum(F.when(~late, 1).otherwise(0)).alias("ontime_count"),
        )
    )


# ── q152: TPC-H Q9 shape — product-line profit by nation-year (adapted) ─────


@register(
    "q152_tpch_q9_profit",
    """
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
           SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)) * 10
               - CAST(ROUND(p.p_retailprice * 100) AS BIGINT)
                 * CAST(l.l_quantity AS BIGINT) * 500) / 100000.0 AS profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 shape (product-type profit), adapted: profit = "
    "discounted revenue minus half the part's retail price per unit "
    "(the testdata has no partsupp.ps_supplycost), for widget parts, "
    "by supplier nation and order year. The contains-LIKE part filter "
    "drives a 5-way join; exact tenth-of-millicent integer arithmetic "
    "keeps the mixed sum order-independent.",
)
def q152_tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the %widget% filter can't use stats but still prunes at
    the part scan before broadcast; lineitem shuffles only for the
    orders join; profit is one fused integer sum (scale 1e-5) so no
    float accumulation order can flip the hash."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    profit_units = _rev_cents() * 10 - (
        F.round(F.col("p_retailprice") * 100).cast("long")
        * F.col("l_quantity").cast("long")
        * 500
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), supp["s_suppkey"] == li["l_suppkey"])
        .join(orders, orders["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(nation), F.col("s_nationkey") == nation["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg((F.sum(profit_units) / 100000.0).alias("profit"))
    )
