"""Hot-basket skew hardening (operators/baskets.py + q303 planner)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_datalake_platform_spark.operators.baskets import (
    capped_baskets,
    copurchase_pairs,
)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _toy(spark, mega_size=0):
    rows = []
    # 20 normal baskets of 3-5 items over a 30-item catalog
    for o in range(20):
        for j in range(3 + o % 3):
            rows.append((o, (o * 7 + j * 11) % 30))
    if mega_size:
        rows += [(999, i) for i in range(mega_size)]  # the bot basket
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")


def test_nonbinding_cap_is_identity_with_audit(spark):
    df = _toy(spark)
    basket, audit = capped_baskets(df, "l_orderkey", "l_partkey", 64)
    assert _rows(basket) == _rows(df.distinct())
    [a] = audit.collect()
    assert a["n_baskets"] == 20
    assert a["n_baskets_dropped"] == 0 and a["n_pairs_dropped"] == 0
    # pairs_total = sum sz*(sz-1) over the 20 baskets
    expect = sum(sz * (sz - 1) for sz in (3 + o % 3 for o in range(20)))
    assert a["pairs_total"] == expect
    assert _rows(copurchase_pairs(basket, "l_orderkey", "l_partkey", 1)) == _rows(
        copurchase_pairs(df.distinct(), "l_orderkey", "l_partkey", 1)
    )


def test_mega_basket_dropped_and_counted(spark):
    """A planted 500-item bot basket would contribute 500·499 = 249,500
    directed pairs — the cap excludes it, counts every dropped pair,
    and leaves the normal baskets' pair relation untouched."""
    df = _toy(spark, mega_size=500)
    basket, audit = capped_baskets(df, "l_orderkey", "l_partkey", 64)
    [a] = audit.collect()
    assert a["n_baskets"] == 21
    assert a["n_baskets_dropped"] == 1
    assert a["n_pairs_dropped"] == 500 * 499
    assert basket.filter(F.col("l_orderkey") == 999).count() == 0
    # pair relation identical to the no-mega corpus
    clean = _toy(spark).distinct()
    assert _rows(copurchase_pairs(basket, "l_orderkey", "l_partkey", 1)) == _rows(
        copurchase_pairs(clean, "l_orderkey", "l_partkey", 1)
    )


def test_capped_plan_filters_before_pair_join(spark):
    """Plan pin: the hot-basket exclusion is a LEFT ANTI join applied to
    the basket relation BEFORE the self-join that mines pairs — the
    mega-basket's rows never reach the pair join's shuffle."""
    df = _toy(spark, mega_size=500)
    basket, _ = capped_baskets(df, "l_orderkey", "l_partkey", 64)
    pairs = copurchase_pairs(basket, "l_orderkey", "l_partkey", 1)
    plan = pairs._jdf.queryExecution().optimizedPlan().toString()
    anti = plan.find("LeftAnti")
    self_join = plan.find("Inner")
    assert anti != -1, plan
    assert self_join != -1, plan
    # optimizedPlan prints top-down: the pair join (Inner) appears above
    # the anti-join feeding it
    assert self_join < anti, plan


def test_q303_plan_never_mines_pairs(spark):
    """The cap planner prices every candidate cap from the basket-size
    HISTOGRAM — no self-join of the basket relation anywhere in its
    plan (sweep cost is independent of pair count)."""
    from aws_datalake_platform_spark.plans.queries import QUERY_REGISTRY

    df = QUERY_REGISTRY["q303_basket_cap_plan"].fn(
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # exactly one source scan feeds the size aggregate (the grand
    # pairs_total folds inside the same aggregate); a pair join would
    # need a second scan of the basket relation
    assert plan.count("Relation") == 1, plan
    rows = {r["cap"]: r for r in df.collect()}
    assert set(rows) == {2, 4, 8, 16, 32, 64}
    # monotone: a larger cap never drops more than a smaller one
    caps = sorted(rows)
    for lo, hi in zip(caps, caps[1:]):
        assert rows[hi]["n_pairs_dropped"] <= rows[lo]["n_pairs_dropped"]
