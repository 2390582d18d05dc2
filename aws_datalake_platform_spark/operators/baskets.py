"""Basket co-occurrence mining with hot-basket skew hardening.

The basket/pair family (q262 lift rules, q271 co-purchase recs) mines a
per-basket item pair join: a basket of B distinct items contributes
B·(B−1) directed pairs. On TPC-H-shaped baskets (≤7 items) that fan-out
is benign; on a real order log one bot/bulk-reseller basket with 10⁴
items contributes 10⁸ pairs and single-handedly dominates the shuffle —
the classic skew failure the verdict's watchlist flagged.

The remedy here is an explicit basket-size cap with a DROPPED-PAIRS
audit (the no-silent-caps rule): baskets above ``max_basket_size`` are
excluded from pair mining entirely — a mega-basket is almost never
co-purchase signal (it is inventory sync, a crawler, or fraud), and
capping it bounds the worst basket's contribution at cap² pairs.
Everything dropped is counted, so the audit relation makes the cap's
bite reviewable (and q303's cap-sweep planner prices candidate caps
from ONE basket-size histogram before any pair join runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def capped_baskets(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_size: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Distinct (basket, item) relation with oversized baskets removed.

    Returns ``(basket, audit)``. ``audit`` is a single-row relation with
    n_baskets, n_baskets_dropped, n_pairs_dropped (the directed pairs
    the dropped baskets would have contributed, sz·(sz−1) each) and
    pairs_total — everything a monitoring job needs to alert on a cap
    that starts biting real traffic.

    Scale: sizes come from one groupBy on the basket key (map-side
    combinable); the cap filter is a broadcast-friendly anti-join of the
    basket relation against the (tiny) oversized-key list, and the pair
    join downstream is then bounded at cap² per basket.
    """
    basket = df.select(basket_col, item_col).distinct()
    sizes = basket.groupBy(basket_col).agg(F.count(F.lit(1)).alias("__sz"))
    if max_basket_size is None:
        audit = sizes.agg(
            F.count(F.lit(1)).cast("long").alias("n_baskets"),
            F.lit(0).cast("long").alias("n_baskets_dropped"),
            F.lit(0).cast("long").alias("n_pairs_dropped"),
            F.sum(F.col("__sz") * (F.col("__sz") - 1))
            .cast("long")
            .alias("pairs_total"),
        )
        return basket, audit
    audit = sizes.agg(
        F.count(F.lit(1)).cast("long").alias("n_baskets"),
        F.sum(F.when(F.col("__sz") > max_basket_size, 1).otherwise(0))
        .cast("long")
        .alias("n_baskets_dropped"),
        F.sum(
            F.when(
                F.col("__sz") > max_basket_size,
                F.col("__sz") * (F.col("__sz") - 1),
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_pairs_dropped"),
        F.sum(F.col("__sz") * (F.col("__sz") - 1))
        .cast("long")
        .alias("pairs_total"),
    )
    hot = sizes.filter(F.col("__sz") > max_basket_size).select(basket_col)
    return basket.join(hot, basket_col, "left_anti"), audit


def copurchase_pairs(
    basket: DataFrame,
    basket_col: str,
    item_col: str,
    min_cooccur: int = 2,
) -> DataFrame:
    """Directed co-occurrence counts (part, rec, c_ab) from a distinct
    (basket, item) relation — q271's pair stage as a reusable operator.
    Feed it :func:`capped_baskets` output to bound hot-basket fan-out."""
    a = basket.select(basket_col, F.col(item_col).alias("part"))
    b = basket.select(basket_col, F.col(item_col).alias("rec"))
    return (
        a.join(b, basket_col)
        .filter(F.col("part") != F.col("rec"))
        .groupBy("part", "rec")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= min_cooccur)
    )
