"""Semantic invariant tests for the round-7 wave-3 queries (q379+).

The parametrized oracle test in test_queries_oracle.py already
hash-checks each against DuckDB; these pin the MATH — each query's
statistic recomputed from raw rows by an independent (usually
numpy/collections) implementation.
"""

from __future__ import annotations

import math

from aws_datalake_platform_spark.plans.queries import QUERY_REGISTRY

from .conftest import SF_SMOKE


def _survival_subjects(spark):
    """(t_weeks, event, grp) subjects exactly as q304/q353/q379 define
    them, rebuilt with plain Python from the raw orders rows."""
    from aws_datalake_platform_spark.catalog import load_table

    rows = (
        load_table(spark, SF_SMOKE, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
        .collect()
    )
    mxd = max(r["o_orderdate"] for r in rows)
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    subj = []
    for orders in by_cust.values():
        orders.sort(key=lambda r: (r["o_orderdate"], r["o_orderkey"]))
        for i, r in enumerate(orders):
            nxt = orders[i + 1]["o_orderdate"] if i + 1 < len(orders) else None
            end = nxt if nxt is not None else mxd
            t = (end.date() - r["o_orderdate"].date()).days // 7
            subj.append(
                (
                    t,
                    1 if nxt is not None else 0,
                    1 if r["o_orderpriority"] in ("1-URGENT", "2-HIGH") else 0,
                )
            )
    return subj


def test_q379_cox_against_float_newton(spark):
    """The fixed-point Newton estimate must agree with an independent
    FLOAT Newton solve of the Cox partial likelihood to ~1e-4, the
    score residual must certify convergence, and the Wald z must agree
    in sign (and roughly in size) with q353's log-rank z."""
    out = QUERY_REGISTRY["q379_cox_hazard_newton"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 1
    got = out[0]
    subj = _survival_subjects(spark)
    # risk-set grid
    times = sorted({t for t, _, _ in subj})
    grid = []
    for t in times:
        d1 = sum(1 for tt, e, g in subj if tt == t and e and g)
        d0 = sum(1 for tt, e, g in subj if tt == t and e and not g)
        n1 = sum(1 for tt, _, g in subj if tt >= t and g)
        n0 = sum(1 for tt, _, g in subj if tt >= t and not g)
        grid.append((d1, d0, n1, n0))
    assert got["events_urgent"] == sum(g[0] for g in grid)
    assert got["events_other"] == sum(g[1] for g in grid)
    assert got["n_event_times"] == sum(1 for g in grid if g[0] + g[1] > 0)
    # independent float Newton (no quantization at all)
    beta = 0.0
    for _ in range(30):
        u = i = 0.0
        eb = math.exp(beta)
        for d1, d0, n1, n0 in grid:
            if d1 + d0 == 0:
                continue
            p = n1 * eb / (n0 + n1 * eb)
            u += d1 - (d1 + d0) * p
            i += (d1 + d0) * p * (1 - p)
        beta += u / i
    assert abs(got["beta_hat"] - beta) < 1e-4
    assert abs(got["hazard_ratio"] - math.exp(beta)) < 1e-3
    assert abs(got["std_err"] - 1 / math.sqrt(i)) < 1e-4
    assert abs(got["score_residual"]) < 0.01  # converged
    # Wald z vs the log-rank z: same direction, same ballpark
    lr = QUERY_REGISTRY["q353_logrank_test"].fn(spark, SF_SMOKE).collect()[0]
    assert got["z_stat"] * lr["z_stat"] >= 0
    assert abs(got["z_stat"] - lr["z_stat"]) < 1.0


def test_q380_holt_winters_recompute(spark):
    """The integer recurrence must track a plain float Holt-Winters with
    alpha=beta=gamma=1/2 to within quantization error, fitted must equal
    the pre-update l+b+s state, and residual must be volume - fitted."""
    from collections import Counter

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q380_holt_winters"].fn(spark, SF_SMOKE).collect()
    assert out, "expected >= 2 weeks of daily volume"
    ev = load_table(spark, SF_SMOKE, "events").select("ts").collect()
    daily = Counter(r["ts"].date() for r in ev)
    days = sorted(daily)
    vols = [daily[d] for d in days]
    m = 7
    l = sum(vols[:m]) / m
    b = 0.0
    s = [v - l for v in vols[:m]]
    fitted = {}
    for rn in range(m + 1, len(vols) + 1):
        v = vols[rn - 1]
        idx = (rn - 1) % m
        sprev, lp = s[idx], l
        fitted[rn] = l + b + sprev
        l = (v - sprev + lp + b) / 2
        b = (l - lp + b) / 2
        s[idx] = (v - l + sprev) / 2
    assert len(out) == len(vols) - m
    for row in out:
        rn = row["day_seq"]
        assert row["volume"] == vols[rn - 1]
        # integer micro-arithmetic drifts from float by < ~1e-3 here
        assert abs(row["fitted"] - fitted[rn]) < 1e-2
        assert abs(row["residual"] - (row["volume"] - row["fitted"])) < 2e-4
    # one-step-ahead errors must beat a naive weekly-lag forecast
    sse_hw = sum((r["volume"] - r["fitted"]) ** 2 for r in out)
    sse_naive = sum(
        (vols[rn - 1] - vols[rn - 1 - m]) ** 2
        for rn in range(m + 1, len(vols) + 1)
    )
    assert sse_hw <= sse_naive * 1.5  # adaptive fit is competitive


def test_q381_textrank_recompute(spark):
    """Scores recomputed by an independent float PageRank on the same
    co-occurrence graph: same top word, rank-correlated ordering, and
    the exact integer invariants (scores in (0, ~N], top-20 sorted)."""
    import re
    from collections import Counter

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q381_textrank_keywords"].fn(spark, SF_SMOKE).collect()
    assert out and len(out) <= 20
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    docs = load_table(spark, SF_SMOKE, "documents").select("text").collect()
    edges: Counter = Counter()
    for r in docs:
        toks = [t for t in re.split(r"[^a-z]+", (r["text"] or "").lower()) if len(t) >= 4]
        for a, bb in zip(toks, toks[1:]):
            if a != bb:
                edges[(a, bb)] += 1
                edges[(bb, a)] += 1
    deg: Counter = Counter()
    for (u, _), w in edges.items():
        deg[u] += w
    nodes = sorted(deg)
    sv = {n: 1.0 for n in nodes}
    for _ in range(50):
        nxt = {}
        for v in nodes:
            t = sum(
                w * sv[u] / deg[u] for (u, vv), w in edges.items() if vv == v
            )
            nxt[v] = 0.15 + 0.85 * t
        sv = nxt
    float_rank = sorted(nodes, key=lambda n: (-sv[n], n))
    got_words = [r["word"] for r in out]
    assert got_words[0] == float_rank[0]
    # the two orderings agree on membership of the top-k (ties aside)
    k = min(10, len(got_words))
    assert len(set(got_words[:k]) & set(float_rank[:k])) >= k - 2
    # engine score ~ float score (quantization + fewer iters tolerance)
    by_word = {r["word"]: r["score"] for r in out}
    for wrd in got_words[:k]:
        assert abs(by_word[wrd] - sv[wrd]) / max(sv[wrd], 1e-9) < 0.05


def test_q382_kcore_recompute(spark):
    """Peel trajectory recomputed with a plain Python fixpoint peel;
    the final round must BE the fixpoint (every survivor keeps >= k
    partners), and counts are monotone non-increasing."""
    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q382_kcore_peel"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 8
    for a, b in zip(out, out[1:]):
        assert b["n_edges"] <= a["n_edges"]
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_partkey")
    ed = {
        (r["o_custkey"], r["l_partkey"])
        for r in o.join(li, o["o_orderkey"] == li["l_orderkey"]).collect()
    }
    k = 3
    for rnd in range(1, 9):
        hd: dict = {}
        ad: dict = {}
        for h, a in ed:
            hd[h] = hd.get(h, 0) + 1
            ad[a] = ad.get(a, 0) + 1
        keep_h = {h for h, c in hd.items() if c >= k}
        keep_a = {a for a, c in ad.items() if c >= k}
        ed = {(h, a) for h, a in ed if h in keep_h and a in keep_a}
        row = out[rnd - 1]
        assert row["n_edges"] == len(ed)
        assert row["n_customers"] == len({h for h, _ in ed})
        assert row["n_parts"] == len({a for _, a in ed})
    # fixpoint reached within the unrolled budget at smoke scale
    assert out[-1]["n_edges"] == out[-2]["n_edges"]
    if ed:
        hd2: dict = {}
        ad2: dict = {}
        for h, a in ed:
            hd2[h] = hd2.get(h, 0) + 1
            ad2[a] = ad2.get(a, 0) + 1
        assert min(hd2.values()) >= k and min(ad2.values()) >= k


def test_q383_t_closeness_recompute(spark):
    """Variational distance recomputed with Counters; flags consistent;
    the weighted average of class TVDs is bounded by the max."""
    import math as _m
    from collections import Counter

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q383_t_closeness"].fn(spark, SF_SMOKE).collect()
    assert out
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_mktsegment", "c_acctbal", "c_nationkey"
    ).collect()
    gdist: Counter = Counter(r["c_nationkey"] for r in cust)
    n = len(cust)
    groups: dict = {}
    for r in cust:
        key = (r["c_mktsegment"], _m.floor(r["c_acctbal"] / 2000))
        groups.setdefault(key, Counter())[r["c_nationkey"]] += 1
    assert len(out) == len(groups)
    for row in out:
        cnt = groups[(row["c_mktsegment"], row["bal_bucket"])]
        nc = sum(cnt.values())
        assert row["class_size"] == nc
        assert row["n_sensitive_distinct"] == len(cnt)
        tvd = 0.5 * sum(
            abs(cnt.get(k, 0) / nc - gc / n) for k, gc in gdist.items()
        )
        assert abs(row["tvd"] - tvd) < 1e-5
        assert row["t_ok"] == (1 if tvd <= 0.25 else 0)
        assert 0.0 <= row["tvd"] <= 1.0


def test_q384_rd_recompute(spark):
    """Both local OLS fits recomputed with numpy.polyfit; the effect is
    the intercept jump; TPC-H assigns discount independently of
    quantity so the A/A-null readout must hold (|z| < 4)."""
    import numpy as np

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q384_regression_discontinuity"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 1
    got = out[0]
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_quantity", "l_discount"
    ).collect()
    pts = [
        (int(r["l_quantity"]) - 25, round(r["l_discount"] * 100))
        for r in li
        if 15 <= r["l_quantity"] < 35
    ]
    left = [(x, y) for x, y in pts if x < 0]
    right = [(x, y) for x, y in pts if x >= 0]
    assert got["n_left"] == len(left) and got["n_right"] == len(right)
    sl, il = np.polyfit([x for x, _ in left], [y for _, y in left], 1)
    sr, ir = np.polyfit([x for x, _ in right], [y for _, y in right], 1)
    assert abs(got["intercept_left"] - il / 100) < 1e-4
    assert abs(got["intercept_right"] - ir / 100) < 1e-4
    assert abs(got["slope_left"] - sl / 100) < 1e-4
    assert abs(got["slope_right"] - sr / 100) < 1e-4
    assert abs(got["rd_effect"] - (ir - il) / 100) < 1e-4
    assert got["std_err"] > 0
    assert abs(got["z_stat"]) < 4  # A/A null: no jump hallucinated


def test_q385_periodogram_recompute(spark):
    """Spectrum recomputed with numpy cos/sin sums; shares sum to ~1;
    the dominant flag marks the argmax period."""
    import numpy as np
    from collections import Counter

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q385_periodogram_scan"].fn(spark, SF_SMOKE).collect()
    assert [r["period"] for r in out] == list(range(2, 15))
    ev = load_table(spark, SF_SMOKE, "events").select("ts").collect()
    daily = Counter(r["ts"].date() for r in ev)
    vols = np.array([daily[d] for d in sorted(daily)], dtype=float)
    vc = vols - vols.mean()
    t = np.arange(1, len(vols) + 1)
    ref = {}
    for p in range(2, 15):
        w = 2 * math.pi / p
        ref[p] = ((vc * np.cos(w * t)).sum() ** 2 + (vc * np.sin(w * t)).sum() ** 2) / len(vols)
    tot = sum(ref.values())
    for row in out:
        assert abs(row["power"] - ref[row["period"]]) < max(1e-2, 1e-4 * ref[row["period"]])
        assert abs(row["power_share"] - ref[row["period"]] / tot) < 1e-3
    assert abs(sum(r["power_share"] for r in out) - 1.0) < 1e-3
    best = max(ref, key=lambda p: ref[p])
    dom = [r["period"] for r in out if r["dominant"] == 1]
    assert dom == [best]


def test_q386_brown_forsythe_recompute(spark):
    """F statistic recomputed from raw |y - group median| deviations
    (cents-quantized, deterministic mid-pair medians)."""
    from collections import defaultdict

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q386_brown_forsythe"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 1
    got = out[0]
    rows = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderkey"
    ).collect()
    groups = defaultdict(list)
    for r in rows:
        groups[r["o_orderpriority"]].append((r["o_totalprice"], r["o_orderkey"]))
    assert got["n_groups"] == len(groups)
    assert got["n_total"] == len(rows)
    zs = {}
    for gname, vals in groups.items():
        vals.sort()
        n = len(vals)
        med = (vals[(n + 1) // 2 - 1][0] + vals[n // 2][0]) / 2
        zs[gname] = [math.floor(abs(y - med) * 100 + 0.5) for y, _ in vals]
    allz = [z for v in zs.values() for z in v]
    gmean = sum(allz) / len(allz)
    ssb = sum(len(v) * (sum(v) / len(v) - gmean) ** 2 for v in zs.values())
    ssw = sum((z - sum(v) / len(v)) ** 2 for v in zs.values() for z in v)
    k, nn = len(zs), len(allz)
    f = (ssb / (k - 1)) / (ssw / (nn - k))
    assert abs(got["f_stat"] - f) / max(f, 1e-9) < 1e-3
    assert abs(got["ss_between"] - ssb / 10_000) / max(ssb / 1e4, 1) < 1e-3
    assert abs(got["ss_within"] - ssw / 10_000) / max(ssw / 1e4, 1) < 1e-3
    assert got["reject_equal_spread"] == (1 if f > 2.372 else 0)


def test_q387_fellegi_sunter_recompute(spark):
    """m/u rates recomputed from the q24 pair relation and the stride
    background sample; weights must separate: every field's agreement
    weight exceeds its disagreement weight, and near-dup-pair fields
    (prefix, length) must carry POSITIVE agreement weights."""
    out = QUERY_REGISTRY["q387_fellegi_sunter_weights"].fn(spark, SF_SMOKE).collect()
    assert {r["field"] for r in out} == {"lang", "source", "length", "prefix"}
    from aws_datalake_platform_spark.catalog import load_table

    docs = {
        r["doc_id"]: r
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    dup = {
        (r["doc_a"], r["doc_b"])
        for r in QUERY_REGISTRY["q24_minhash_lsh_dedup"].fn(spark, SF_SMOKE).collect()
    }
    bg = [
        (a, a + off)
        for off in (7, 13, 29)
        for a in docs
        if a + off in docs and (a, a + off) not in dup
    ]

    def agree(field, a, b):
        da, db = docs[a], docs[b]
        if field == "lang":
            return da["lang"] == db["lang"]
        if field == "source":
            return da["source"] == db["source"]
        if field == "length":
            return abs(da["n_chars"] - db["n_chars"]) <= 64
        return (da["text"] or "")[:32] == (db["text"] or "")[:32]

    for row in out:
        f = row["field"]
        ma = sum(1 for a, b in dup if agree(f, a, b))
        ua = sum(1 for a, b in bg if agree(f, a, b))
        m = (2 * ma + 1) / (2 * len(dup) + 2)
        u = (2 * ua + 1) / (2 * len(bg) + 2)
        assert row["n_match_pairs"] == len(dup)
        assert row["n_background_pairs"] == len(bg)
        assert abs(row["m_prob"] - m) < 1e-5
        assert abs(row["u_prob"] - u) < 1e-5
        assert abs(row["weight_agree"] - math.log2(m / u)) < 1e-3
        assert abs(row["weight_disagree"] - math.log2((1 - m) / (1 - u))) < 1e-3
        assert row["weight_agree"] > row["weight_disagree"]
    byf = {r["field"]: r for r in out}
    assert byf["prefix"]["weight_agree"] > 0
    assert byf["length"]["weight_agree"] > 0


def test_q388_friedman_recompute(spark):
    """Tie-corrected Friedman chi2 recomputed from scipy-style midranks
    in plain Python over the (day, event_type) count matrix."""
    from collections import Counter, defaultdict

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q388_friedman_test"].fn(spark, SF_SMOKE).collect()
    assert out
    ev = load_table(spark, SF_SMOKE, "events").select("ts", "event_type").collect()
    cnt = Counter((r["ts"].date(), r["event_type"]) for r in ev)
    days = sorted({d for d, _ in cnt})
    types = sorted({t for _, t in cnt})
    ranks = defaultdict(list)  # type -> midranks
    a2 = 0.0
    for d in days:
        vals = [(cnt.get((d, t), 0), t) for t in types]
        svals = sorted(v for v, _ in vals)
        for v, t in vals:
            lo = sum(1 for x in svals if x < v)
            eq = sum(1 for x in svals if x == v)
            mr = lo + (eq + 1) / 2
            ranks[t].append(mr)
            a2 += mr * mr
    b, k = len(days), len(types)
    c = b * k * (k + 1) ** 2 / 4
    b2 = sum(sum(v) ** 2 for v in ranks.values()) / b
    chi2 = (k - 1) * (b2 - c) / (a2 - c)
    by_t = {r["event_type"]: r for r in out}
    assert set(by_t) == set(types)
    for t in types:
        assert abs(by_t[t]["rank_sum"] - sum(ranks[t])) < 0.02
        assert abs(by_t[t]["mean_rank"] - sum(ranks[t]) / b) < 1e-3
        assert abs(by_t[t]["friedman_chi2"] - chi2) < 1e-3
        assert by_t[t]["reject_equal_treatments"] == (1 if chi2 > 9.488 else 0)


def test_q389_runs_recompute(spark):
    """Runs count and z recomputed from the daily sign sequence."""
    from collections import Counter

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q389_runs_test"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 1
    got = out[0]
    ev = load_table(spark, SF_SMOKE, "events").select("ts").collect()
    daily = Counter(r["ts"].date() for r in ev)
    days = sorted(daily)
    vols = [daily[d] for d in days]
    sv = sorted(vols)
    n = len(sv)
    med = (sv[(n + 1) // 2 - 1] + sv[n // 2]) / 2
    signs = [1 if v > med else 0 for v in vols if v != med]
    n1, n2 = sum(signs), len(signs) - sum(signs)
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    assert got["n_above"] == n1 and got["n_below"] == n2
    assert got["n_runs"] == runs
    mu = 2 * n1 * n2 / (n1 + n2) + 1
    var = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    assert abs(got["expected_runs"] - mu) < 1e-3
    assert abs(got["z_stat"] - (runs - mu) / math.sqrt(var)) < 1e-4
    assert got["reject_random"] == (1 if abs((runs - mu) / math.sqrt(var)) > 1.96 else 0)


def test_q390_lexical_diversity_recompute(spark):
    """Panel recomputed from a raw token Counter per language."""
    import re
    from collections import Counter

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q390_lexical_diversity"].fn(spark, SF_SMOKE).collect()
    assert out
    docs = load_table(spark, SF_SMOKE, "documents").select("lang", "text").collect()
    for row in out:
        tf = Counter(
            t
            for r in docs
            if r["lang"] == row["lang"]
            for t in re.split(r"[^a-z]+", (r["text"] or "").lower())
            if t
        )
        n = sum(tf.values())
        v = len(tf)
        assert row["n_tokens"] == n and row["n_types"] == v
        assert abs(row["type_token_ratio"] - v / n) < 1e-5
        f1 = sum(1 for c in tf.values() if c == 1)
        assert abs(row["hapax_ratio"] - f1 / v) < 1e-5
        yk = 1e4 * (sum(c * c for c in tf.values()) - n) / (n * n)
        assert abs(row["yule_k"] - yk) < 1e-3
        sd = sum(c * (c - 1) for c in tf.values()) / (n * (n - 1))
        assert abs(row["simpson_d"] - sd) < 1e-7
        assert abs(row["herdan_c"] - math.log(v) / math.log(n)) < 1e-5
        # Simpson's D is the repeat probability Yule's K scales: K ~ 1e4*D
        assert abs(row["yule_k"] / 1e4 - sd) < 1e-3


def test_q391_boilerplate_recompute(spark):
    """Shares recomputed from raw sentence splits with a Counter."""
    import re
    from collections import Counter, defaultdict

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q391_boilerplate_detection"].fn(spark, SF_SMOKE).collect()
    assert out
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    sent_docs = defaultdict(set)
    per_doc = {}
    for r in docs:
        ss = [
            s.strip()
            for s in re.split(r"[.!?]", r["text"] or "")
            if len(s.strip()) >= 20
        ]
        per_doc[r["doc_id"]] = (r["source"], ss)
        for s in ss:
            sent_docs[s].add(r["doc_id"])
    stats = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, with, half, bchars, tchars
    for did, (src, ss) in per_doc.items():
        if not ss:
            continue
        tc = sum(len(s) for s in ss)
        bc = sum(len(s) for s in ss if len(sent_docs[s]) >= 3)
        st = stats[src]
        st[0] += 1
        st[1] += 1 if bc > 0 else 0
        st[2] += 1 if 2 * bc >= tc else 0
        st[3] += bc
        st[4] += tc
    for row in out:
        st = stats[row["source"]]
        assert row["n_docs"] == st[0]
        assert row["docs_with_boiler"] == st[1]
        assert row["docs_half_boiler"] == st[2]
        assert abs(row["boiler_char_share"] - st[3] / st[4]) < 1e-5
        assert 0.0 <= row["boiler_char_share"] <= 1.0


def test_q392_weibull_recompute(spark):
    """Shape/scale recomputed with numpy median-rank regression on the
    raw gaps; R^2 in [0,1]; the fitted Weibull median is within a
    factor of ~2 of the empirical median gap (sanity of scale)."""
    import numpy as np

    out = QUERY_REGISTRY["q392_weibull_gap_fit"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 1
    got = out[0]
    subj = _survival_subjects(spark)
    # rebuild day-level gaps (subjects are week-floored; recompute raw)
    from aws_datalake_platform_spark.catalog import load_table

    rows = (
        load_table(spark, SF_SMOKE, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .collect()
    )
    by_cust: dict = {}
    for r in rows:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    gaps = []
    for orders in by_cust.values():
        orders.sort(key=lambda r: (r["o_orderdate"], r["o_orderkey"]))
        for a, b in zip(orders, orders[1:]):
            t = (b["o_orderdate"].date() - a["o_orderdate"].date()).days
            if t >= 1:
                gaps.append(t)
    gaps.sort()
    n = len(gaps)
    assert got["n_gaps"] == n
    x = np.log(np.array(gaps, dtype=float))
    i = np.arange(1, n + 1)
    y = np.log(-np.log((n - i + 0.7) / (n + 0.4)))
    k, icpt = np.polyfit(x, y, 1)
    assert abs(got["shape_k"] - k) < 5e-3
    assert abs(got["scale_days"] - math.exp(-icpt / k)) / math.exp(-icpt / k) < 5e-3
    assert 0.0 <= got["fit_r2"] <= 1.0
    assert got["fit_r2"] > 0.8  # gaps are genuinely Weibull-ish
    assert got["decreasing_hazard"] == (1 if got["shape_k"] < 1 else 0)
    med_fit = got["scale_days"] * math.log(2) ** (1 / got["shape_k"])
    med_emp = gaps[n // 2]
    assert 0.5 < med_fit / med_emp < 2.0


def test_q393_assortativity_recompute(spark):
    """Edge-degree correlation recomputed with numpy.corrcoef."""
    import numpy as np
    from collections import Counter

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q393_degree_assortativity"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 1
    got = out[0]
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_partkey")
    ed = {
        (r["o_custkey"], r["l_partkey"])
        for r in o.join(li, o["o_orderkey"] == li["l_orderkey"]).collect()
    }
    hd = Counter(h for h, _ in ed)
    ad = Counter(a for _, a in ed)
    xs = np.array([hd[h] for h, a in ed], dtype=float)
    ys = np.array([ad[a] for h, a in ed], dtype=float)
    assert got["n_edges"] == len(ed)
    assert abs(got["avg_customer_degree"] - xs.mean()) < 1e-3
    assert abs(got["avg_part_degree"] - ys.mean()) < 1e-3
    r = np.corrcoef(xs, ys)[0, 1]
    assert abs(got["assortativity_r"] - r) < 1e-4
    assert got["disassortative"] == (1 if r < 0 else 0)
    assert -1.0 <= got["assortativity_r"] <= 1.0


def test_q394_label_propagation_recompute(spark):
    """Communities recomputed with a plain Python alternating-half-step
    LPA with (count desc, label asc) argmax."""
    from collections import Counter, defaultdict

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q394_label_propagation"].fn(spark, SF_SMOKE).collect()
    assert out and len(out) <= 15
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_partkey")
    ed = {
        (r["o_custkey"], r["l_partkey"])
        for r in o.join(li, o["o_orderkey"] == li["l_orderkey"]).collect()
    }
    by_auth = defaultdict(list)
    by_hub = defaultdict(list)
    for h, a in ed:
        by_auth[a].append(h)
        by_hub[h].append(a)
    hlbl = {h: h for h, _ in ed}
    albl = {}
    for _ in range(5):
        for a, hubs in by_auth.items():
            cnt = Counter(hlbl[h] for h in hubs)
            top = max(cnt.values())
            albl[a] = min(l for l, c in cnt.items() if c == top)
        for h, auths in by_hub.items():
            cnt = Counter(albl[a] for a in auths)
            top = max(cnt.values())
            hlbl[h] = min(l for l, c in cnt.items() if c == top)
    sizes = defaultdict(lambda: [0, 0])
    for h, l in hlbl.items():
        sizes[l][0] += 1
    for a, l in albl.items():
        sizes[l][1] += 1
    ranked = sorted(sizes.items(), key=lambda kv: (-(kv[1][0] + kv[1][1]), kv[0]))
    for i, row in enumerate(out):
        lbl, (nc, np_) = ranked[i]
        assert row["rank"] == i + 1
        assert row["community"] == lbl
        assert row["n_customers"] == nc
        assert row["n_parts"] == np_


def test_q395_croston_recompute(spark):
    """Croston states recomputed with plain float SES; the integer
    fixed-point tracks it to quantization error; SBA = 0.75 * Croston."""
    from collections import defaultdict

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q395_croston_intermittent"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 1
    got = out[0]
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity"
    ).collect()
    from collections import Counter

    freq = Counter(r["l_partkey"] for r in li)
    top = max(freq.values())
    part = min(k for k, c in freq.items() if c == top)
    daily = defaultdict(int)
    for r in li:
        if r["l_partkey"] == part:
            daily[r["l_shipdate"].date()] += int(r["l_quantity"])
    days = sorted(daily)
    assert got["n_occ"] == len(days)
    assert got["n_days"] == (days[-1] - days[0]).days + 1
    z = float(daily[days[0]])
    p = 1.0
    for a, b in zip(days, days[1:]):
        z = (daily[b] + z) / 2
        p = ((b - a).days + p) / 2
    assert abs(got["smoothed_size"] - z) < 0.01
    assert abs(got["smoothed_interval"] - p) < 0.01
    assert abs(got["croston_forecast"] - z / p) / (z / p) < 0.01
    assert abs(got["sba_forecast"] - 0.75 * got["croston_forecast"]) < 1e-3
    assert abs(got["demand_rate"] - len(days) / got["n_days"]) < 1e-5


def test_q396_sort_key_plan_recompute(spark):
    """Containment counts recomputed with numpy zone maps; sorting by
    the looked-up key must win (rank 1 = l_partkey, ~1 chunk/lookup)."""
    import numpy as np

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q396_sort_key_plan"].fn(spark, SF_SMOKE).collect()
    assert {r["sort_key"] for r in out} == {
        "l_partkey", "l_suppkey", "l_shipdate", "l_quantity"
    }
    rows = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_partkey", "l_suppkey", "l_shipdate", "l_quantity",
        "l_orderkey", "l_linenumber",
    ).collect()
    keys = sorted({r["l_partkey"] for r in rows})
    ka = np.array(keys)
    by = {r["sort_key"]: r for r in out}
    for c in ("l_partkey", "l_suppkey"):
        srt = sorted(rows, key=lambda r: (r[c], r["l_orderkey"], r["l_linenumber"]))
        pk = [r["l_partkey"] for r in srt]
        n = len(pk)
        total = 0
        # NTILE semantics: first (n % 256) chunks get ceil(n/256)
        base, extra = divmod(n, 256)
        pos = 0
        for ci in range(256):
            size = base + (1 if ci < extra else 0)
            if size == 0:
                continue
            chunk = pk[pos:pos + size]
            pos += size
            lo, hi = min(chunk), max(chunk)
            total += int(((ka >= lo) & (ka <= hi)).sum())
        assert abs(by[c]["avg_chunks_scanned"] - total / len(keys)) < 1e-3
    assert by["l_partkey"]["rank"] == 1
    assert by["l_partkey"]["avg_chunks_scanned"] < 2.5
    assert by["l_partkey"]["skip_ratio"] > 0.99
    # unrelated sort keys skip almost nothing
    assert by["l_suppkey"]["avg_chunks_scanned"] > 50


def test_q397_backtest_recompute(spark):
    """MAE/RMSE recomputed from plain float recurrences; all four
    models evaluated on the same days; rank consistent with rmse."""
    from collections import Counter

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q397_forecast_backtest"].fn(spark, SF_SMOKE).collect()
    assert {r["model"] for r in out} == {"naive1", "snaive7", "holt", "holt_winters"}
    assert len({r["n_eval"] for r in out}) == 1  # same eval window
    ranks = sorted(out, key=lambda r: r["rank"])
    rmses = [r["rmse"] for r in ranks]
    assert rmses == sorted(rmses)
    ev = load_table(spark, SF_SMOKE, "events").select("ts").collect()
    daily = Counter(r["ts"].date() for r in ev)
    vols = [daily[d] for d in sorted(daily)]
    m = 7
    # float naive errors as the independent check
    errs = {
        "naive1": [vols[i] - vols[i - 1] for i in range(m, len(vols))],
        "snaive7": [vols[i] - vols[i - 7] for i in range(m, len(vols))],
    }
    by = {r["model"]: r for r in out}
    for mod, es in errs.items():
        mae = sum(abs(e) for e in es) / len(es)
        rmse = math.sqrt(sum(e * e for e in es) / len(es))
        assert abs(by[mod]["mae"] - mae) < 0.02
        assert abs(by[mod]["rmse"] - rmse) < 0.02
        assert by[mod]["n_eval"] == len(es)
    # fitted models must beat or match naive-1 at smoke scale
    assert by["holt_winters"]["rmse"] <= by["naive1"]["rmse"] * 1.5


def test_q398_pagerank_exact_vs_q123(spark):
    """The exact fixed-point PageRank must reproduce q123's float
    readout to ~1e-5 and the same ranking; scores sum to <= 1 (sink
    absorption) and > 0.5 (mass mostly retained)."""
    out = QUERY_REGISTRY["q398_pagerank_exact"].fn(spark, SF_SMOKE).collect()
    assert out
    flo = {r["v"]: r["pagerank"] for r in
           QUERY_REGISTRY["q123_pagerank_transitions"].fn(spark, SF_SMOKE).collect()}
    assert {r["v"] for r in out} == set(flo)
    for r in out:
        assert abs(r["pagerank"] - flo[r["v"]]) < 1e-4
    ordered = sorted(out, key=lambda r: r["rank"])
    float_order = sorted(flo, key=lambda v: (-flo[v], v))
    assert [r["v"] for r in ordered] == float_order
    tot = sum(r["pagerank"] for r in out)
    assert 0.5 < tot <= 1.0 + 1e-6


def test_q399_cmh_recompute(spark):
    """CMH chi2 and MH odds ratio recomputed from raw 2x2 strata; the
    A/A-null holds on TPC-H (priority independent of returns)."""
    from collections import defaultdict

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q399_cmh_test"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 1
    got = out[0]
    o = load_table(spark, SF_SMOKE, "orders").collect()
    cust = {r["c_custkey"]: r["c_nationkey"]
            for r in load_table(spark, SF_SMOKE, "customer").collect()}
    nat = {r["n_nationkey"]: r["n_regionkey"]
           for r in load_table(spark, SF_SMOKE, "nation").collect()}
    reg = {r["r_regionkey"]: r["r_name"]
           for r in load_table(spark, SF_SMOKE, "region").collect()}
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_returnflag"
    ).collect()
    returned = {r["l_orderkey"] for r in li if r["l_returnflag"] == "R"}
    tabs = defaultdict(lambda: [0, 0, 0, 0])
    for r in o:
        s = reg[nat[cust[r["o_custkey"]]]]
        ex = r["o_orderpriority"] in ("1-URGENT", "2-HIGH")
        rt = r["o_orderkey"] in returned
        tabs[s][(0 if ex else 2) + (0 if rt else 1)] += 1
    soe = sv = sorn = sord = 0.0
    for a, b, c, d in tabs.values():
        n = a + b + c + d
        soe += a - (a + b) * (a + c) / n
        sv += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
        sorn += a * d / n
        sord += b * c / n
    chi2 = soe * soe / sv
    assert got["n_strata"] == len(tabs)
    assert abs(got["cmh_chi2"] - chi2) < 1e-3
    assert abs(got["common_or_mh"] - sorn / sord) < 1e-3
    assert got["reject_independence"] == (1 if chi2 > 3.841 else 0)
    # A/A null: TPC-H assigns priorities independently of returns
    assert got["cmh_chi2"] < 8
    assert 0.7 < got["common_or_mh"] < 1.4


def test_q400_mann_kendall_recompute(spark):
    """S, tau, var and z recomputed from raw day pairs."""
    from collections import Counter

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q400_mann_kendall"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 1
    got = out[0]
    ev = load_table(spark, SF_SMOKE, "events").select("ts").collect()
    daily = Counter(r["ts"].date() for r in ev)
    vols = [daily[d] for d in sorted(daily)]
    n = len(vols)
    s = sum(
        (1 if vols[j] > vols[i] else -1 if vols[j] < vols[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(vols)
    tadj = sum(c * (c - 1) * (2 * c + 5) for c in ties.values())
    var = (n * (n - 1) * (2 * n + 5) - tadj) / 18
    scc = s - 1 if s > 0 else s + 1 if s < 0 else 0
    z = scc / math.sqrt(var)
    assert got["n_days"] == n
    assert got["kendall_s"] == s
    assert abs(got["tau"] - s / (n * (n - 1) / 2)) < 1e-5
    assert abs(got["var_s"] - var) < 1e-3
    assert abs(got["z_stat"] - z) < 1e-4
    assert got["reject_no_trend"] == (1 if abs(z) > 1.96 else 0)


def test_q401_gmm_recompute(spark):
    """The fixed-point EM must track an unquantized float EM run from
    the same init to ~1e-2 on every parameter, and basic mixture
    invariants must hold (weights sum to 1, mus ordered by init,
    responsibility-weighted counts sum to N)."""
    from collections import Counter

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q401_gmm_em"].fn(spark, SF_SMOKE).collect()
    assert [r["component"] for r in out] == [1, 2]
    w1, w2 = out[0]["weight"], out[1]["weight"]
    assert abs(w1 + w2 - 1.0) < 1e-5
    docs = load_table(spark, SF_SMOKE, "documents").select("n_chars").collect()
    hist = Counter(r["n_chars"] for r in docs)
    n = sum(hist.values())
    assert abs(out[0]["n_eff"] + out[1]["n_eff"] - n) < 0.1
    lo, hi = min(hist), max(hist)
    pi1 = 0.5
    mu1, mu2 = (3 * lo + hi) / 4, (lo + 3 * hi) / 4
    sg1 = sg2 = max((hi - lo) / 4, 1.0)
    for _ in range(8):
        s1 = sx1 = sxx1 = s2 = sx2 = sxx2 = 0.0
        for x, cnt in hist.items():
            f1 = math.exp(-((x - mu1) ** 2) / (2 * sg1 * sg1)) / (
                sg1 * math.sqrt(2 * math.pi)
            )
            f2 = math.exp(-((x - mu2) ** 2) / (2 * sg2 * sg2)) / (
                sg2 * math.sqrt(2 * math.pi)
            )
            r = pi1 * f1 / (pi1 * f1 + (1 - pi1) * f2)
            s1 += r * cnt
            sx1 += r * cnt * x
            sxx1 += r * cnt * x * x
            s2 += (1 - r) * cnt
            sx2 += (1 - r) * cnt * x
            sxx2 += (1 - r) * cnt * x * x
        pi1 = s1 / (s1 + s2)
        mu1, mu2 = sx1 / s1, sx2 / s2
        sg1 = max(math.sqrt(sxx1 / s1 - mu1 * mu1), 1.0)
        sg2 = max(math.sqrt(sxx2 / s2 - mu2 * mu2), 1.0)
    assert abs(out[0]["weight"] - pi1) < 1e-2
    assert abs(out[0]["mu"] - mu1) / max(abs(mu1), 1) < 1e-2
    assert abs(out[1]["mu"] - mu2) / max(abs(mu2), 1) < 1e-2
    assert abs(out[0]["sigma"] - sg1) / max(sg1, 1) < 2e-2
    assert abs(out[1]["sigma"] - sg2) / max(sg2, 1) < 2e-2
    assert out[0]["mu"] < out[1]["mu"]  # init ordering preserved


def test_q402_poisson_glm_recompute(spark):
    """The fixed-point IRLS must agree with an unquantized float Newton
    solve of the Poisson likelihood; growth rate = exp(b) - 1; the fit
    must satisfy the score equations (sum y = sum mu at optimum)."""
    from collections import Counter

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q402_poisson_trend_glm"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 1
    got = out[0]
    ev = load_table(spark, SF_SMOKE, "events").select("ts").collect()
    daily = Counter(r["ts"].date() for r in ev)
    ys = [daily[d] for d in sorted(daily)]
    n = len(ys)
    assert got["n_days"] == n
    a, b = math.log(sum(ys) / n), 0.0
    for _ in range(30):
        s0 = s1 = s2 = 0.0
        for t, y in enumerate(ys):
            mu = math.exp(a + b * t)
            s0 += mu
            s1 += mu * t
            s2 += mu * t * t
        sy = sum(ys)
        syt = sum(y * t for t, y in enumerate(ys))
        det = s0 * s2 - s1 * s1
        a += ((sy - s0) * s2 - (syt - s1) * s1) / det
        b += ((syt - s1) * s0 - (sy - s0) * s1) / det
    assert abs(got["intercept"] - a) < 1e-4
    assert abs(got["trend_coef"] - b) < 1e-4
    assert abs(got["daily_growth_rate"] - (math.exp(b) - 1)) < 1e-4
    # score equation: fitted total equals observed total at the optimum
    fitted = sum(math.exp(a + b * t) for t in range(n))
    assert abs(fitted - sum(ys)) / sum(ys) < 1e-6
    se = math.sqrt(s0 / det)
    assert abs(got["z_stat"] - b / se) < 1e-3


def test_q403_compaction_recompute(spark):
    """File ledger recomputed from raw rows; invariants: files_after <=
    files_before, reduction in [0,1], avg size grows, and a partition
    never rewrites unless it shrinks."""
    from collections import defaultdict

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q403_compaction_plan"].fn(spark, SF_SMOKE).collect()
    assert out
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_type", "ts", "props"
    ).collect()
    files = defaultdict(int)
    for r in ev:
        files[(r["event_type"], r["ts"].date(), r["ts"].hour)] += (
            len((r["props"] or "").encode()) + 64
        )
    parts = defaultdict(lambda: [0, 0])
    for (et, day, _), b in files.items():
        parts[(et, day)][0] += 1
        parts[(et, day)][1] += b
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for (et, _), (fb, bt) in parts.items():
        fa = math.ceil(bt / 262_144)
        eff = fa if fb > fa else fb
        a = agg[et]
        a[0] += 1
        a[1] += fb
        a[2] += eff
        a[3] += bt if fb > fa else 0
    for row in out:
        a = agg[row["event_type"]]
        assert row["n_partitions"] == a[0]
        assert row["files_before"] == a[1]
        assert row["files_after"] == a[2]
        assert row["bytes_rewritten"] == a[3]
        assert row["files_after"] <= row["files_before"]
        assert 0.0 <= row["file_reduction"] <= 1.0
        assert row["avg_file_kb_after"] >= row["avg_file_kb_before"] - 1e-9


def test_q404_fs_scoring_recompute(spark):
    """Candidate blocking, scores and the precision/recall readout
    recomputed in plain Python from q387's reported weights."""
    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q404_fs_linkage_scoring"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 1
    got = out[0]
    docs = sorted(
        load_table(spark, SF_SMOKE, "documents").collect(),
        key=lambda r: (r["lang"], r["n_chars"], r["doc_id"]),
    )
    cand = set()
    for i, a in enumerate(docs):
        for j in range(i + 1, min(i + 5, len(docs))):
            b = docs[j]
            cand.add((min(a["doc_id"], b["doc_id"]), max(a["doc_id"], b["doc_id"])))
    assert got["n_candidates"] == len(cand)
    w = {
        r["field"]: r
        for r in QUERY_REGISTRY["q387_fellegi_sunter_weights"].fn(spark, SF_SMOKE).collect()
    }
    byid = {r["doc_id"]: r for r in docs}
    dup = {
        (r["doc_a"], r["doc_b"])
        for r in QUERY_REGISTRY["q24_minhash_lsh_dedup"].fn(spark, SF_SMOKE).collect()
    }
    pred = tp = dups = 0
    for da_, db_ in cand:
        a, b = byid[da_], byid[db_]
        s = (
            (w["lang"]["weight_agree"] if a["lang"] == b["lang"] else w["lang"]["weight_disagree"])
            + (w["source"]["weight_agree"] if a["source"] == b["source"] else w["source"]["weight_disagree"])
            + (w["length"]["weight_agree"] if abs(a["n_chars"] - b["n_chars"]) <= 64 else w["length"]["weight_disagree"])
            + (w["prefix"]["weight_agree"] if (a["text"] or "")[:32] == (b["text"] or "")[:32] else w["prefix"]["weight_disagree"])
        )
        isd = (da_, db_) in dup
        dups += isd
        if s > 0:
            pred += 1
            tp += isd
    assert got["n_predicted"] == pred
    assert got["true_positives"] == tp
    assert got["dups_in_block"] == dups
    assert abs(got["precision_"] - tp / pred) < 1e-5
    assert abs(got["recall_in_block"] - tp / dups) < 1e-5
    assert abs(got["f1_in_block"] - 2 * tp / (pred + dups)) < 1e-5
    # the learned weights must beat chance within the block
    assert got["precision_"] > dups / len(cand)


def test_q405_crossentropy_recompute(spark):
    """Matrix recomputed from raw token Counters; Gibbs' inequality:
    every row's diagonal (self) entropy is the row minimum."""
    import re
    from collections import Counter, defaultdict

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q405_source_crossentropy"].fn(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents").select("source", "text").collect()
    tf = defaultdict(Counter)
    for r in docs:
        tf[r["source"]].update(
            t for t in re.split(r"[^a-z]+", (r["text"] or "").lower()) if t
        )
    vocab = len({w for c in tf.values() for w in c})
    srcs = sorted(tf)
    assert len(out) == len(srcs) ** 2
    ref = {}
    for sa in srcs:
        na = sum(tf[sa].values())
        for sb in srcs:
            nb = sum(tf[sb].values())
            h = -sum(
                ca / na * math.log((tf[sb].get(wrd, 0) + 1) / (nb + vocab))
                for wrd, ca in tf[sa].items()
            )
            ref[(sa, sb)] = h
    for row in out:
        h = ref[(row["source_a"], row["source_b"])]
        assert abs(row["cross_entropy"] - h) < 1e-3
        assert abs(row["perplexity"] - math.exp(h)) / math.exp(h) < 1e-3
        assert row["is_self"] == (1 if row["source_a"] == row["source_b"] else 0)
    for sa in srcs:
        rows = [r for r in out if r["source_a"] == sa]
        self_h = next(r["cross_entropy"] for r in rows if r["is_self"] == 1)
        assert self_h <= min(r["cross_entropy"] for r in rows) + 1e-9


def test_q406_cohesion_recompute(spark):
    """Per-source cohesion recomputed from raw adjacent 10-token-window
    Jaccard in plain Python."""
    import re
    from collections import defaultdict

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q406_text_cohesion"].fn(spark, SF_SMOKE).collect()
    assert out
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    agg = defaultdict(lambda: [0, 0, 0.0, 0])  # docs, pairs, coh_sum, hard
    for r in docs:
        toks = [w for w in re.split(r"[^a-z]+", (r["text"] or "").lower()) if len(w) >= 3]
        wins = [set(toks[i:i + 10]) for i in range(0, len(toks), 10)]
        js = []
        for a, b in zip(wins, wins[1:]):
            un = len(a | b)
            if un > 0:
                js.append(len(a & b) / un)
        if not js:
            continue
        st = agg[r["source"]]
        st[0] += 1
        st[1] += len(js)
        st[2] += sum(js)
        st[3] += 1 if min(js) == 0 else 0
    for row in out:
        st = agg[row["source"]]
        assert row["n_docs"] == st[0]
        assert abs(row["avg_cohesion"] - st[2] / st[1]) < 1e-4
        assert abs(row["pct_with_hard_break"] - st[3] / st[0]) < 1e-5
        assert abs(row["avg_pairs_per_doc"] - st[1] / st[0]) < 0.01
        assert 0.0 <= row["avg_cohesion"] <= 1.0


def test_q407_readability_recompute(spark):
    """FK grades recomputed with a plain Python vowel-group counter."""
    import re
    from collections import defaultdict

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q407_readability"].fn(spark, SF_SMOKE).collect()
    assert out
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    agg = defaultdict(lambda: [0, 0, 0, 0.0, 0])  # docs, words, syll+sent? -> custom
    stats = defaultdict(lambda: [0, 0, 0, 0, 0])  # docs, words, syll, sents, gt12
    grades = defaultdict(float)
    for r in docs:
        ws = [w for w in re.split(r"[^a-z]+", (r["text"] or "").lower()) if w]
        sy = sum(max(len(re.findall(r"[aeiouy]+", w)), 1) for w in ws)
        ns = max(
            sum(1 for s in re.split(r"[.!?]", r["text"] or "") if len(s.strip()) >= 2),
            1,
        )
        if not ws:
            continue
        fk = 0.39 * len(ws) / ns + 11.8 * sy / len(ws) - 15.59
        fkq = math.floor((fk + 100) * 100 + 0.5) - 10_000
        st = stats[r["source"]]
        st[0] += 1
        st[1] += len(ws)
        st[2] += sy
        st[3] += ns
        st[4] += 1 if fkq > 1200 else 0
        grades[r["source"]] += fkq
    for row in out:
        st = stats[row["source"]]
        assert row["n_docs"] == st[0]
        assert abs(row["words_per_sentence"] - st[1] / st[3]) < 1e-3
        assert abs(row["syllables_per_word"] - st[2] / st[1]) < 1e-3
        assert abs(row["avg_fk_grade"] - grades[row["source"]] / 100 / st[0]) < 1e-3
        assert abs(row["pct_above_grade12"] - st[4] / st[0]) < 1e-5


def test_q408_next_event_recompute(spark):
    """Split, model, and accuracies recomputed in plain Python with the
    same md5 hash; the bigram model must beat or match the mode
    baseline (it can only add information)."""
    import hashlib
    from collections import Counter, defaultdict

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q408_next_event_accuracy"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 1
    got = out[0]
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    thr = int(0.8 * (1 << 60))
    tr, te = [], []
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        h = int(hashlib.md5(f"next42|{uid}".encode()).hexdigest()[:15], 16)
        dest = tr if h < thr else te
        for a, b in zip(rows, rows[1:]):
            dest.append((a["event_type"], b["event_type"]))
    cnt = Counter(tr)
    model = {}
    for (p, c), n in cnt.items():
        cur = model.get(p)
        if cur is None or (n, ) > (cur[1],) or (n == cur[1] and c < cur[0]):
            if cur is None or n > cur[1] or (n == cur[1] and c < cur[0]):
                model[p] = (c, n)
    base = Counter(c for _, c in tr)
    top = max(base.values())
    bpred = min(c for c, n in base.items() if n == top)
    hits = sum(1 for p, c in te if model[p][0] == c)
    bhits = sum(1 for _, c in te if c == bpred)
    assert got["n_train_transitions"] == len(tr)
    assert got["n_test_transitions"] == len(te)
    assert abs(got["top1_accuracy"] - hits / len(te)) < 1e-5
    assert abs(got["baseline_accuracy"] - bhits / len(te)) < 1e-5
    assert abs(got["lift"] - (hits / len(te)) / (bhits / len(te))) < 1e-3
    assert got["top1_accuracy"] >= got["baseline_accuracy"] - 0.02


def test_q409_newsvendor_recompute(spark):
    """Quantiles recomputed as exact order statistics per brand; the
    service ladder must be monotone."""
    from collections import defaultdict

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q409_newsvendor_plan"].fn(spark, SF_SMOKE).collect()
    assert out
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity"
    ).collect()
    brand = {
        r["p_partkey"]: r["p_brand"]
        for r in load_table(spark, SF_SMOKE, "part").collect()
    }
    daily = defaultdict(int)
    for r in li:
        daily[(brand[r["l_partkey"]], r["l_shipdate"].date())] += int(r["l_quantity"])
    per_brand = defaultdict(list)
    for (b, _), v in daily.items():
        per_brand[b].append(v)
    for row in out:
        vs = sorted(per_brand[row["p_brand"]])
        n = len(vs)
        assert row["n_days"] == n
        assert abs(row["mean_daily"] - sum(vs) / n) < 0.01

        def pick(lvl):
            return vs[min(max((n * lvl + 99) // 100, 1), n) - 1]

        assert row["stock_p80"] == pick(80)
        assert row["stock_p95"] == pick(95)
        assert row["stock_p99"] == pick(99)
        assert row["stock_p80"] <= row["stock_p95"] <= row["stock_p99"]
        assert row["safety_p95"] == pick(95) - math.floor(sum(vs) / n)


def test_q410_granularity_recompute(spark):
    """Read amplification recomputed from raw daily counts for every
    7-day range; daily partitioning must be rank 1 (amp ~ 1.0) and
    amplification must increase with grain width."""
    from collections import Counter, defaultdict

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q410_partition_granularity_plan"].fn(spark, SF_SMOKE).collect()
    by = {r["grain"]: r for r in out}
    assert set(by) == {"day", "week", "month"}
    ev = load_table(spark, SF_SMOKE, "events").select("ts").collect()
    base = __import__("datetime").date(2024, 1, 1)
    daily = Counter((r["ts"].date() - base).days for r in ev)
    lo, hi = min(daily), max(daily)
    for gname, w in (("day", 1), ("week", 7), ("month", 30)):
        parts = defaultdict(int)
        for d, c in daily.items():
            parts[d // w] += c
        scans = needs = 0
        nparts = 0
        for start in range(lo, hi - 5):
            if start + 6 > hi:
                break
            touched = range(start // w, (start + 6) // w + 1)
            scans += sum(parts[p] for p in touched if p in parts)
            needs += sum(daily.get(d, 0) for d in range(start, start + 7))
            nparts += sum(1 for p in touched if p in parts)
        row = by[gname]
        assert row["n_partitions"] == len(parts)
        assert abs(row["read_amplification"] - scans / needs) < 1e-3
    assert by["day"]["rank"] == 1
    assert by["day"]["read_amplification"] <= by["week"]["read_amplification"]
    assert by["week"]["read_amplification"] <= by["month"]["read_amplification"] + 1e-9


def test_q411_margin_recompute(spark):
    """Overlap and Youden threshold recomputed from numpy cosines; the
    embedding space must genuinely separate q59 pairs from background
    (youden high, overlap low)."""
    import numpy as np

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q411_similarity_margin"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 1
    got = out[0]
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=float)
        for r in load_table(spark, SF_SMOKE, "embeddings").collect()
    }
    dup = {
        (r["vec_a"], r["vec_b"])
        for r in QUERY_REGISTRY["q59_embedding_near_dup_lsh"].fn(spark, SF_SMOKE).collect()
    }
    bg = [
        (a, a + s)
        for s in (7, 13, 29)
        for a in emb
        if a + s in emb and (a, a + s) not in dup
    ]
    assert got["n_dup_pairs"] == len(dup)
    assert got["n_background_pairs"] == len(bg)

    def cos(a, b):
        va, vb = emb[a], emb[b]
        return float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))

    hd = [math.floor((cos(a, b) + 1) * 10) for a, b in dup]
    hb = [math.floor((cos(a, b) + 1) * 10) for a, b in bg]
    from collections import Counter

    cd, cb = Counter(hd), Counter(hb)
    ov = sum(
        min(cd.get(k, 0) / len(hd), cb.get(k, 0) / len(hb))
        for k in set(cd) | set(cb)
    )
    assert abs(got["overlap_coef"] - ov) < 1e-4
    best = max(
        (
            (
                sum(1 for x in hd if x >= t) / len(hd)
                - sum(1 for x in hb if x >= t) / len(hb),
                -t,
            )
            for t in set(cd) | set(cb)
        ),
    )
    assert abs(got["youden_j"] - best[0]) < 1e-4
    assert abs(got["best_threshold"] - (-best[1] / 10 - 1)) < 1e-6
    # the detector's pairs must be separable from background
    assert got["youden_j"] > 0.5
    assert got["overlap_coef"] < 0.5


def test_q412_transitivity_recompute(spark):
    """Wedge and closure counts recomputed with plain Python sets over
    the q24 pair graph."""
    from collections import defaultdict

    out = QUERY_REGISTRY["q412_dedup_transitivity"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 1
    got = out[0]
    dup = {
        (r["doc_a"], r["doc_b"])
        for r in QUERY_REGISTRY["q24_minhash_lsh_dedup"].fn(spark, SF_SMOKE).collect()
    }
    adj = defaultdict(set)
    for a, b in dup:
        adj[a].add(b)
        adj[b].add(a)
    wedges = closed = 0
    for mid, nbrs in adj.items():
        for x in nbrs:
            for y in nbrs:
                if y > x and x != mid and y != mid:
                    wedges += 1
                    if (x, y) in dup:
                        closed += 1
    assert got["n_pairs"] == len(dup)
    assert got["n_docs"] == len(adj)
    assert got["n_wedges"] == wedges
    assert got["n_closed"] == closed
    assert got["open_wedges"] == wedges - closed
    assert abs(got["transitivity"] - closed / wedges) < 1e-5
    assert 0.0 <= got["transitivity"] <= 1.0


def test_q413_deseasonalization_recompute(spark):
    """Both eta-squares recomputed from a plain float decomposition;
    subtracting per-weekday means must remove (nearly) all weekday
    variance from the remainder."""
    from collections import Counter, defaultdict

    from aws_datalake_platform_spark.catalog import load_table

    out = QUERY_REGISTRY["q413_deseasonalization_audit"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 1
    got = out[0]
    ev = load_table(spark, SF_SMOKE, "events").select("ts").collect()
    base = __import__("datetime").date(2024, 1, 1)
    daily = Counter((r["ts"].date() - base).days for r in ev)
    days = sorted(daily)
    det = []
    for d in days:
        win = [daily.get(d + k, None) for k in range(-3, 4)]
        if any(d + k not in daily for k in range(-3, 4)):
            continue
        det.append((d % 7, daily[d] - sum(win) / 7))
    assert got["n_days"] == len(det)

    def eta2(vals):
        groups = defaultdict(list)
        for wd, v in vals:
            groups[wd].append(v)
        allv = [v for _, v in vals]
        gm = sum(allv) / len(allv)
        ssb = sum(len(g) * (sum(g) / len(g) - gm) ** 2 for g in groups.values())
        sst = sum((v - gm) ** 2 for v in allv)
        return ssb / sst

    e_raw = eta2(det)
    means = defaultdict(list)
    for wd, v in det:
        means[wd].append(v)
    mu = {wd: sum(v) / len(v) for wd, v in means.items()}
    rem = [(wd, v - mu[wd]) for wd, v in det]
    e_rem = eta2(rem)
    assert abs(got["eta2_detrended"] - e_raw) < 1e-3
    assert abs(got["eta2_remainder"] - e_rem) < 1e-3
    assert got["eta2_remainder"] < 1e-6  # exact weekday means -> zero left
    assert got["seasonality_removed"] > 0.999
    assert got["residual_clean"] == 1
