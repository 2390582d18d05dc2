"""SQL-parser surface: subqueries, CTEs, set-op compositions, and richer
window functions, submitted as SQL text (spark.sql) over registered views
— the serving role Athena plays in the reference (README.md:128-132,
athena/main.tf:18-38). Catalyst's subquery decorrelation / rewrite rules
do the planning; DuckDB runs the identical statement as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from .queries import register

_VIEW_TABLES = ("customer", "orders", "lineitem", "nation", "region", "events")


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in _VIEW_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


@register(
    "q48_exists_subquery",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
    doc="Correlated EXISTS — Catalyst rewrites to a left-semi hash join.",
)
def q48_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: decorrelates to semi join on o_custkey; the price filter
    pushes into the orders scan before the shuffle."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        """
    )


@register(
    "q49_in_subquery",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
    doc="Uncorrelated IN subquery -> left-semi join.",
)
def q49_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        """
    )


@register(
    "q50_scalar_subquery",
    """
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
    """,
    doc="Uncorrelated scalar subquery (global average) as a filter bound. "
    "Bound is 1.5x avg: the testdata's max/avg price ratio is ~2.0, so "
    "a 2x bound returns 0 rows at sf>=0.01 (vacuous oracle).",
)
def q50_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the scalar subquery executes once and broadcasts as a
    literal — the fact scan stays a single filtered pass."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
        """
    )


@register(
    "q51_correlated_scalar",
    """
    SELECT c_custkey,
           (SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_price
    FROM customer
    """,
    doc="Correlated scalar subquery -> decorrelated aggregate + left outer "
    "join (NULL where the customer has no orders).",
)
def q51_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey,
               (SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_price
        FROM customer
        """
    )


@register(
    "q52_cte_multistep",
    """
    WITH nation_rev AS (
      SELECT n.n_name,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS rev
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    ),
    ranked AS (
      SELECT n_name, rev, ROW_NUMBER() OVER (ORDER BY rev DESC, n_name) AS rk
      FROM nation_rev
    )
    SELECT n_name, ROUND(rev, 2) AS revenue, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 5
    """,
    doc="Multi-step CTE: 4-way join -> aggregate -> window rank -> top-5.",
)
def q52_cte_multistep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: nation/customer broadcast; one shuffle on orderkey for the
    fact join, one tiny one for the 25-row nation aggregate; the window
    runs on 25 rows."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        WITH nation_rev AS (
          SELECT n.n_name,
                 SUM(l.l_extendedprice * (1 - l.l_discount)) AS rev
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY n.n_name
        ),
        ranked AS (
          SELECT n_name, rev, ROW_NUMBER() OVER (ORDER BY rev DESC, n_name) AS rk
          FROM nation_rev
        )
        SELECT n_name, ROUND(rev, 2) AS revenue, CAST(rk AS INT) AS rk
        FROM ranked WHERE rk <= 5
        """
    )


@register(
    "q53_union_except",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT c_custkey AS o_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    """,
    doc="EXCEPT (distinct set difference) across two relations.",
)
def q53_union_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT
        SELECT c_custkey AS o_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        """
    )


@register(
    "q54_window_lag_lead",
    """
    SELECT user_id, event_id,
           ROUND(value - (LAG(value) OVER w), 2) AS delta_prev,
           ROUND((LEAD(value) OVER w) - value, 2) AS delta_next,
           ROUND(FIRST_VALUE(value) OVER w, 2) AS first_val,
           CAST(NTILE(4) OVER w AS INT) AS quartile
    FROM events
    WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="lag/lead/first_value/ntile in one named window.",
)
def q54_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one shuffle on user_id; all four functions share the single
    sorted window pass."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT user_id, event_id,
               ROUND(value - (LAG(value) OVER w), 2) AS delta_prev,
               ROUND((LEAD(value) OVER w) - value, 2) AS delta_next,
               ROUND(FIRST_VALUE(value) OVER w, 2) AS first_val,
               CAST(NTILE(4) OVER w AS INT) AS quartile
        FROM events
        WHERE event_type = 'purchase'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """
    )


@register(
    "q55_shipping_priority",
    """
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-style shipping priority: selective 3-way join, "
    "aggregate, top-10 by revenue.",
)
def q55_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: both date predicates and the segment filter push to the
    scans; customer broadcasts; TakeOrdered caps the result."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l.l_orderkey,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               o.o_orderdate
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
        """
    )
