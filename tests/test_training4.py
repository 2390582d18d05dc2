"""Semantic invariant tests for the round-7 session-5 queries (q414+).

The parametrized oracle test in test_queries_oracle.py already
hash-checks each against DuckDB; these pin the MATH — each query's
statistic recomputed from raw rows by an independent (plain
Python/collections) implementation.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

from aws_datalake_platform_spark.catalog import load_table
from aws_datalake_platform_spark.plans.queries import QUERY_REGISTRY

from .conftest import SF_SMOKE


def _doc_tokens(spark):
    """(doc_id, lang, [tokens]) exactly as q414/q415 tokenize."""
    rows = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "lang", "text")
        .collect()
    )
    out = []
    for r in rows:
        toks = [w for w in re.split(r"\s+", r["text"].strip().lower()) if w]
        out.append((r["doc_id"], r["lang"], toks))
    return out


def _md5_bucket(prefix: str, key: str, mod: int) -> int:
    h = hashlib.md5((prefix + key).encode()).hexdigest()
    return int(h[:15], 16) % mod


def test_q414_dsir_recompute(spark):
    """Top-25 DSIR weights recomputed independently: same ranking, and
    the winners must skew overwhelmingly English (the target domain)."""
    out = QUERY_REGISTRY["q414_dsir_importance_weights"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 25
    docs = _doc_tokens(spark)
    B, SC = 256, 1_000_000
    c_raw: Counter = Counter()
    c_tgt: Counter = Counter()
    for _, lang, toks in docs:
        for w in toks:
            b = _md5_bucket("dsir|", w, B)
            c_raw[b] += 1
            if lang == "en":
                c_tgt[b] += 1
    n_raw = sum(c_raw.values())
    n_tgt = sum(c_tgt.values())
    llr_q = {
        b: math.floor(
            (
                math.log((c_tgt.get(b, 0) + 1.0) / (n_tgt + B))
                - math.log((c_raw[b] + 1.0) / (n_raw + B))
            )
            * SC
            + 0.5
        )
        for b in c_raw
    }
    scored = []
    for doc_id, _, toks in docs:
        if not toks:
            continue
        lw = sum(llr_q[_md5_bucket("dsir|", w, B)] for w in toks)
        scored.append((doc_id, len(toks), lw))
    scored.sort(key=lambda t: (-t[2], t[0]))
    want = scored[:25]
    got = [(r["doc_id"], r["n_tokens"]) for r in out]
    assert got == [(d, n) for d, n, _ in want]
    # winners should be ENRICHED in the target domain: hashed-unigram
    # LLR over 256 buckets is a noisy lang-id at tiny SF, so pin the
    # actual DSIR claim — top-25 English share strictly above the
    # corpus base rate — not an absolute count.
    lang_by_id = {d: lang for d, lang, _ in docs}
    n_en = sum(1 for d, _ in got if lang_by_id[d] == "en")
    base = sum(1 for _, lang, _ in docs if lang == "en") / len(docs)
    assert n_en / 25 > base, (
        f"top-25 English share {n_en}/25 not enriched over base {base:.2f}"
    )
    # rank column is 1..25 in order
    assert [r["rank"] for r in out] == list(range(1, 26))


def test_q415_logistic_against_float_irls(spark):
    """The fixed-point IRLS fit must agree with an independent FLOAT
    Newton solve to ~1e-3, the slope must be positive (longer docs
    pass the word-count gate), and the score residuals must certify
    convergence."""
    out = QUERY_REGISTRY["q415_logistic_quality_irls"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 1
    got = out[0]
    rows = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text", "n_chars")
        .collect()
    )
    grid: Counter = Counter()
    pos: Counter = Counter()
    n_docs = 0
    for r in rows:
        n_docs += 1
        wc = len(re.split(r"\s+", r["text"].strip().lower()))
        y = 1 if wc >= 50 else 0
        x = min(r["n_chars"] // 32, 19)
        grid[x] += 1
        pos[x] += y
    assert got["n_docs"] == n_docs
    assert got["n_positive"] == sum(pos.values())
    assert got["n_buckets"] == len(grid)
    # independent float Newton on the SAME ridge (lambda=1) objective,
    # no quantization
    b0 = b1 = 0.0
    for _ in range(40):
        g0 = g1 = h00 = h01 = h11 = 0.0
        for x, n in grid.items():
            k = pos[x]
            p = 1.0 / (1.0 + math.exp(-(b0 + b1 * x)))
            g0 += k - n * p
            g1 += x * (k - n * p)
            h00 += n * p * (1 - p)
            h01 += x * n * p * (1 - p)
            h11 += x * x * n * p * (1 - p)
        g0 -= b0
        g1 -= b1
        h00 += 1.0
        h11 += 1.0
        det = h00 * h11 - h01 * h01
        b0 += (h11 * g0 - h01 * g1) / det
        b1 += (h00 * g1 - h01 * g0) / det
    assert abs(got["beta0"] - b0) < 1e-3
    assert abs(got["beta1"] - b1) < 1e-3
    assert got["beta1"] > 0  # longer docs pass the word-count gate
    assert abs(got["odds_ratio_per_bucket"] - math.exp(b1)) < 1e-2
    assert got["score_residual0"] < 0.01
    assert got["score_residual1"] < 0.05
    assert got["se_beta1"] > 0
    assert abs(got["z_beta1"] - got["beta1"] / got["se_beta1"]) < 1e-3


def test_q416_hbos_recompute(spark):
    """Top-20 HBOS orders recomputed independently: identical ranking,
    and every reported order must sit in a strictly rarer-or-equal
    density cell than any non-reported order."""
    out = QUERY_REGISTRY["q416_hbos_outliers"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 20
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice"
    ).collect()
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey").collect()
    items: Counter = Counter(r["l_orderkey"] for r in li)
    B, SC = 16, 1_000_000
    feat = [
        (
            r["o_orderkey"],
            math.floor(r["o_totalprice"] * 100 + 0.5),
            items.get(r["o_orderkey"], 0),
        )
        for r in orders
    ]
    n = len(feat)
    c_lo = min(c for _, c, _ in feat)
    c_hi = max(c for _, c, _ in feat)
    i_lo = min(i for _, _, i in feat)
    i_hi = max(i for _, _, i in feat)
    cb_of = lambda c: min(math.floor((c - c_lo) * B * 1.0 / max(c_hi - c_lo + 1, 1)), B - 1)  # noqa: E731
    ib_of = lambda i: min(math.floor((i - i_lo) * B * 1.0 / max(i_hi - i_lo + 1, 1)), B - 1)  # noqa: E731
    chist: Counter = Counter(cb_of(c) for _, c, _ in feat)
    ihist: Counter = Counter(ib_of(i) for _, _, i in feat)
    sc_q = {b: math.floor(-math.log(v / n) * SC + 0.5) for b, v in chist.items()}
    si_q = {b: math.floor(-math.log(v / n) * SC + 0.5) for b, v in ihist.items()}
    scored = [
        (ok, c, i, sc_q[cb_of(c)] + si_q[ib_of(i)]) for ok, c, i in feat
    ]
    scored.sort(key=lambda t: (-t[3], t[0]))
    want = scored[:20]
    got = [(r["o_orderkey"], r["n_items"]) for r in out]
    assert got == [(ok, i) for ok, _, i, _ in want]
    # outlier property: min reported score >= max non-reported score
    min_in = min(s for _, _, _, s in want)
    max_out = max((s for _, _, _, s in scored[20:]), default=0)
    assert min_in >= max_out
    assert [r["rank"] for r in out] == list(range(1, 21))
