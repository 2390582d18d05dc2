"""TPC-H query shapes, batch 3: Q2, Q9 (full), Q11, Q16, Q20, Q21 — the shapes
round 2 adjudicated as blocked on the testdata's missing ``partsupp``
table (plans/tpch.py module doc).

Unblocked here the same way q71 synthesizes PII text and q73 synthesizes
a CDC snapshot: a DETERMINISTIC ``partsupp`` derived from the part and
supplier keys with pure integer arithmetic, computed identically by the
Spark plan and the DuckDB oracle —

    for each part p, k in {0,1,2,3}:
      ps_suppkey          = (p_partkey*7 + k*13) mod |supplier|
      ps_availqty         = 1 + (p_partkey*13 + ps_suppkey*7) mod 9999
      ps_supplycost_cents = 10000 + (p_partkey*31 + ps_suppkey*17) mod 90000

(4 suppliers per part like real TPC-H; costs 100.00–999.99 held as exact
BIGINT cents; |supplier| comes from the data so the derivation scales
with SF). Q21's receipt/commit lateness uses the q147/q148 convention:
late == l_shipdate > o_orderdate + 60 days.

Every monetary aggregate stays in integer cents until the final rounded
output — the module-wide determinism contract of plans/tpch.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .queries import register

# shared DuckDB CTE text for the derived partsupp (0-based keys)
_PARTSUPP_CTE = """
    n AS (SELECT COUNT(*) AS n_supp FROM supplier),
    psbase AS (
      SELECT p_partkey, (p_partkey * 7 + k * 13) % n_supp AS ps_suppkey
      FROM part, n, (SELECT unnest([0, 1, 2, 3]) AS k) t
    ),
    partsupp AS (
      SELECT p_partkey AS ps_partkey,
             ps_suppkey,
             1 + (p_partkey * 13 + ps_suppkey * 7) % 9999 AS ps_availqty,
             10000 + (p_partkey * 31 + ps_suppkey * 17) % 90000
               AS ps_supplycost_cents
      FROM psbase
    )
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic partsupp relation (see module doc). Scale: a
    4-way fan-out of the part table against two broadcast singletons —
    map-side only, |part| x 4 rows, no shuffle."""
    part = load_table(spark, sf_dir, "part")
    n = load_table(spark, sf_dir, "supplier").agg(F.count(F.lit(1)).alias("n_supp"))
    ks = spark.range(4).select(F.col("id").alias("k"))
    base = (
        part.select("p_partkey")
        .crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(n))
        .select(
            "p_partkey",
            ((F.col("p_partkey") * 7 + F.col("k") * 13) % F.col("n_supp")).alias(
                "ps_suppkey"
            ),
        )
    )
    return base.select(
        F.col("p_partkey").alias("ps_partkey"),
        "ps_suppkey",
        (1 + (F.col("p_partkey") * 13 + F.col("ps_suppkey") * 7) % 9999).alias(
            "ps_availqty"
        ),
        (10000 + (F.col("p_partkey") * 31 + F.col("ps_suppkey") * 17) % 90000).alias(
            "ps_supplycost_cents"
        ),
    )


# ── q182: TPC-H Q2 — minimum-cost supplier ──────────────────────────────────

_Q182_SQL = f"""
    WITH {_PARTSUPP_CTE},
    eu AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, nt.n_name
      FROM supplier s
      JOIN nation nt ON s.s_nationkey = nt.n_nationkey
      JOIN region r ON nt.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    costs AS (
      SELECT ps.ps_partkey, ps.ps_supplycost_cents, eu.s_suppkey, eu.s_name,
             eu.s_acctbal, eu.n_name,
             MIN(ps.ps_supplycost_cents)
               OVER (PARTITION BY ps.ps_partkey) AS min_cost
      FROM partsupp ps JOIN eu ON ps.ps_suppkey = eu.s_suppkey
    )
    SELECT c.s_acctbal, c.s_name, c.n_name, p.p_partkey, p.p_brand,
           ROUND(c.ps_supplycost_cents / 100.0, 2) AS supplycost
    FROM costs c
    JOIN part p ON p.p_partkey = c.ps_partkey
    WHERE p.p_size % 5 = 0 AND p.p_type = 'LARGE'
      AND c.ps_supplycost_cents = c.min_cost
"""


@register(
    "q182_tpch_q2",
    _Q182_SQL,
    doc="TPC-H Q2 (minimum-cost supplier): for every LARGE part with a "
    "multiple-of-5 size (non-vacuous slice at every SF), "
    "the EUROPE supplier(s) offering the region-wide minimum supply "
    "cost — the correlated-MIN-subquery shape, decorrelated into a "
    "per-part MIN window over the region-filtered partsupp. Derived "
    "deterministic partsupp (module doc) unblocks the shape.",
)
def q182_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: region dims broadcast into the partsupp probe; the per-part
    MIN is a window over the region-filtered relation (one shuffle on
    ps_partkey), and the part filter prunes before the final join.
    All-tie emission (= min) matches the SQL exactly — no arbitrary
    pick."""
    ps = derived_partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    eu = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("ps_partkey")
    costs = (
        ps.join(F.broadcast(eu), ps.ps_suppkey == eu.s_suppkey)
        .withColumn("min_cost", F.min("ps_supplycost_cents").over(w))
        .filter(F.col("ps_supplycost_cents") == F.col("min_cost"))
    )
    return costs.join(
        # p_size % 5 == 0, not == 15: the point filter is vacuous at small
        # SF (0 parts at sf0.001, 1 at sf0.01) and a 0-row oracle proves
        # nothing — the modulo slice keeps ~10/50 sizes at EVERY scale.
        F.broadcast(part.filter((F.col("p_size") % 5 == 0) & (F.col("p_type") == "LARGE"))),
        costs.ps_partkey == F.col("p_partkey"),
    ).select(
        "s_acctbal",
        "s_name",
        "n_name",
        "p_partkey",
        "p_brand",
        F.round(F.col("ps_supplycost_cents") / 100.0, 2).alias("supplycost"),
    )


# ── q183: TPC-H Q11 — important stock identification ───────────────────────

_Q183_SQL = f"""
    WITH {_PARTSUPP_CTE},
    natps AS (
      SELECT ps.ps_partkey,
             ps.ps_supplycost_cents * ps.ps_availqty AS v
      FROM partsupp ps
      JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
      JOIN nation nt ON s.s_nationkey = nt.n_nationkey
      WHERE nt.n_name = 'NATION_3'
    ),
    tot AS (SELECT SUM(v) AS total_v FROM natps)
    SELECT ps_partkey, CAST(SUM(v) AS BIGINT) AS value_cents
    FROM natps, tot
    GROUP BY ps_partkey, total_v
    HAVING SUM(v) > total_v * 0.001
"""


@register(
    "q183_tpch_q11",
    _Q183_SQL,
    doc="TPC-H Q11 (important stock): per-part inventory value "
    "(supplycost x availqty, exact integer cents) for NATION_3 "
    "suppliers, keeping parts above 0.1% of the nation total — the "
    "HAVING-against-global-aggregate shape with a 1-row broadcast "
    "total.",
)
def q183_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: partsupp joins broadcast dims, one groupBy on ps_partkey;
    the total rides a second tiny aggregate of the same relation,
    broadcast back — integer arithmetic end to end."""
    ps = derived_partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    natps = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias("v"),
        )
    )
    tot = natps.agg(F.sum("v").alias("total_v"))
    return (
        natps.groupBy("ps_partkey")
        .agg(F.sum("v").alias("value_cents"))
        .join(F.broadcast(tot))
        .filter(F.col("value_cents") > F.col("total_v") * 0.001)
        .select("ps_partkey", F.col("value_cents").cast("long").alias("value_cents"))
    )


# ── q184: TPC-H Q16 — parts/supplier relationship ──────────────────────────

_Q184_SQL = f"""
    WITH {_PARTSUPP_CTE}
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#2'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND ps.ps_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
"""


@register(
    "q184_tpch_q16",
    _Q184_SQL,
    doc="TPC-H Q16 (parts/supplier relationship): distinct supplier "
    "counts per (brand, type, size) slice, excluding one brand, PROMO "
    "types, and negative-balance suppliers (stand-in for the original's "
    "comment-text exclusion, which the slim supplier schema lacks). "
    "NOT IN over a broadcast-built exclusion set + count-distinct "
    "aggregate.",
)
def q184_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the exclusion set is tiny (anti-join broadcast); part
    filters prune before the join; count-distinct shuffles once on the
    3-column group key."""
    ps = derived_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        ps.join(bad_supp, ps.ps_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("ps_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


# ── q185: TPC-H Q20 — potential part promotion ─────────────────────────────

_Q185_SQL = f"""
    WITH {_PARTSUPP_CTE},
    shipped AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey
    ),
    qualifying AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM partsupp ps
      JOIN part p ON p.p_partkey = ps.ps_partkey AND p.p_name LIKE 'small%'
      LEFT JOIN shipped sh
        ON sh.l_partkey = ps.ps_partkey AND sh.l_suppkey = ps.ps_suppkey
      WHERE ps.ps_availqty > 0.5 * COALESCE(sh.qty, 0)
    )
    SELECT s.s_name, s.s_suppkey
    FROM supplier s
    JOIN nation nt ON s.s_nationkey = nt.n_nationkey
    JOIN qualifying q ON q.ps_suppkey = s.s_suppkey
    WHERE nt.n_name = 'NATION_3'
"""


@register(
    "q185_tpch_q20",
    _Q185_SQL,
    doc="TPC-H Q20 (potential part promotion): NATION_3 suppliers whose "
    "stock of any 'small%' part exceeds half of what they shipped of it "
    "in 1997 — the nested correlated-subquery shape, decorrelated into "
    "an aggregated left join (COALESCE 0 keeps never-shipped stock "
    "qualifying, matching the original's empty-subquery semantics).",
)
def q185_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: lineitem collapses to (part, supplier) sums under a year
    filter pushed to the scan; partsupp probes it with a co-keyed left
    join; everything downstream is dimension-sized."""
    ps = derived_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li = load_table(spark, sf_dir, "lineitem")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    qualifying = (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(
            shipped,
            (F.col("ps_partkey") == shipped.l_partkey)
            & (F.col("ps_suppkey") == shipped.l_suppkey),
            "left",
        )
        .filter(F.col("ps_availqty") > 0.5 * F.coalesce(F.col("qty"), F.lit(0.0)))
        .select("ps_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(qualifying), supp.s_suppkey == F.col("ps_suppkey"))
        .select("s_name", "s_suppkey")
    )


# ── q186: TPC-H Q21 — suppliers who kept orders waiting (adapted) ──────────

_Q186_SQL = """
    WITH lo AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late,
             MIN(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
      FROM lo GROUP BY l_orderkey
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM per_order po
    JOIN supplier s ON s.s_suppkey = po.late_supp
    WHERE po.n_supp >= 2 AND po.n_late = 1
    GROUP BY s.s_name
"""


@register(
    "q186_tpch_q21_adapted",
    _Q186_SQL,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting), adapted to "
    "the q147 lateness convention (shipdate > orderdate + 60d stands in "
    "for receipt-vs-commit): on finished multi-supplier orders, count "
    "per supplier the orders where they were the ONLY late supplier. "
    "The original's EXISTS/NOT-EXISTS pair is rewritten as one "
    "per-order aggregate (distinct suppliers, distinct late suppliers, "
    "the unique late supplier when n_late=1) — same result set, one "
    "pass over lineitem instead of three.",
)
def q186_tpch_q21_adapted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one lineitem->orders join (orders filter pushed), one
    groupBy on orderkey with fused count-distinct aggregates, then a
    dimension-sized supplier join. The triple-self-join formulation
    would scan lineitem three times and shuffle it twice more."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        li.l_orderkey,
        "l_suppkey",
        F.when(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"), 1
        )
        .otherwise(0)
        .alias("late"),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias(
            "n_late"
        ),
        F.min(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(supp), F.col("late_supp") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ── q187: TPC-H Q9 — product-type profit (full shape) ──────────────────────

_Q187_SQL = f"""
    WITH {_PARTSUPP_CTE}
    SELECT nt.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(
             CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
             - ps.ps_supplycost_cents * CAST(l.l_quantity AS BIGINT)
           ) AS BIGINT) AS profit_cents
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                    AND ps.ps_suppkey = l.l_suppkey
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN nation nt ON nt.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nt.n_name, EXTRACT(year FROM o.o_orderdate)
"""


@register(
    "q187_tpch_q9",
    _Q187_SQL,
    doc="TPC-H Q9 (product-type profit), FULL shape: revenue minus "
    "ps_supplycost x quantity by nation and order year for widget "
    "parts, over the derived deterministic partsupp — upgrades q152's "
    "retail-cost adaptation to the real supplycost basis. Exact "
    "integer-cents arithmetic throughout. NOTE: lineitem (partkey, "
    "suppkey) pairs need not exist in the derived partsupp (it assigns "
    "4 suppliers per part), so the inner partsupp join ALSO acts as a "
    "filter — identical in both engines, semantics documented.",
)
def q187_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the fact join chain shuffles lineitem once per fact key;
    part/supplier/nation/partsupp all broadcast (partsupp is |part| x 4
    — dimension-sized). Profit accumulates as exact BIGINT cents."""
    ps = derived_partsupp(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    nation = load_table(spark, sf_dir, "nation")
    rev_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    cost_cents = F.col("ps_supplycost_cents") * F.col("l_quantity").cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(ps),
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(rev_cents - cost_cents).cast("long").alias("profit_cents"))
    )
