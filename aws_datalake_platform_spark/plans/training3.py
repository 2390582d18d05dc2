"""Round-7 wave-3 additions: semiparametric survival regression (Cox),
seasonal adaptive forecasting (Holt-Winters), and graph-based keyword
extraction (TextRank) — each a classically-sequential algorithm run
under the exact-replay discipline (q350/q351/q368): integer fixed-point
state, truncating integer division, micro-quantized float terms, so the
DuckDB oracle replays every iteration bit-for-bit.

Reference tie-in: the reference delegates all analytics to Athena
(README.md:128-132); these extend the engine's analytics surface the
same way q203-q378 did (SURVEY.md north-star ops).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.core import round_half_up
from .queries import register

# ── q379: Cox proportional-hazards fit via exact-replay Newton ───────────────

_Q379_ITERS = 8
_Q379_SCALE = 1_000_000


def _q379_sql() -> str:
    # subjects/grid identical to q353's log-rank construction
    head = f"""
    WITH mx AS (SELECT MAX(o_orderdate) AS mxd FROM orders),
    seq AS (
      SELECT o_custkey, o_orderdate, o_orderpriority,
             LEAD(o_orderdate) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS nxt
      FROM orders
    ),
    subj AS (
      SELECT CAST(FLOOR(date_diff('day', o_orderdate,
               COALESCE(nxt, m.mxd)) / 7) AS BIGINT) AS t_weeks,
             CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS ev,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS grp
      FROM seq CROSS JOIN mx m
    ),
    tot AS (
      SELECT CAST(SUM(grp) AS BIGINT) AS tn1,
             CAST(SUM(1 - grp) AS BIGINT) AS tn0
      FROM subj
    ),
    grid0 AS (
      SELECT t_weeks,
             CAST(SUM(ev * grp) AS BIGINT) AS d1,
             CAST(SUM(ev * (1 - grp)) AS BIGINT) AS d0,
             CAST(SUM((1 - ev) * grp) AS BIGINT) AS c1,
             CAST(SUM((1 - ev) * (1 - grp)) AS BIGINT) AS c0
      FROM subj GROUP BY t_weeks
    ),
    grid AS MATERIALIZED (
      SELECT t_weeks, d1, d0,
             CAST(t.tn1 - COALESCE(SUM(d1 + c1) OVER (ORDER BY t_weeks
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n1,
             CAST(t.tn0 - COALESCE(SUM(d0 + c0) OVER (ORDER BY t_weeks
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n0
      FROM grid0 CROSS JOIN tot t
    ),
    b0 AS (SELECT CAST(0 AS BIGINT) AS bq)"""
    steps = []
    for k in range(1, _Q379_ITERS + 1):
        steps.append(f"""
    p{k} AS (
      SELECT d1, d0,
             (n1 * EXP(b.bq / {_Q379_SCALE}.0))
               / (n0 + n1 * EXP(b.bq / {_Q379_SCALE}.0)) AS p
      FROM grid CROSS JOIN b{k - 1} b WHERE d1 + d0 > 0
    ),
    s{k} AS (
      SELECT CAST(SUM(CAST(FLOOR((d1 - (d1 + d0) * p) * {_Q379_SCALE} + 0.5)
                           AS BIGINT)) AS BIGINT) AS u,
             CAST(SUM(CAST(FLOOR((d1 + d0) * p * (1 - p) * {_Q379_SCALE} + 0.5)
                           AS BIGINT)) AS BIGINT) AS i
      FROM p{k}
    ),
    b{k} AS (
      SELECT CAST(b.bq + CAST(FLOOR(s.u * 1.0 / s.i * {_Q379_SCALE} + 0.5)
                              AS BIGINT) AS BIGINT) AS bq
      FROM s{k} s CROSS JOIN b{k - 1} b
    )""")
    last = _Q379_ITERS
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM grid WHERE d1 + d0 > 0)
             AS n_event_times,
           (SELECT CAST(SUM(d1) AS BIGINT) FROM grid) AS events_urgent,
           (SELECT CAST(SUM(d0) AS BIGINT) FROM grid) AS events_other,
           FLOOR(b.bq / {_Q379_SCALE}.0 * 1000000 + 0.5) / 1000000 AS beta_hat,
           FLOOR(EXP(b.bq / {_Q379_SCALE}.0) * 1000000 + 0.5) / 1000000
             AS hazard_ratio,
           FLOOR(1.0 / SQRT(s.i / {_Q379_SCALE}.0) * 1000000 + 0.5) / 1000000
             AS std_err,
           FLOOR((b.bq / {_Q379_SCALE}.0) * SQRT(s.i / {_Q379_SCALE}.0)
                 * 1000000 + 0.5) / 1000000 AS z_stat,
           FLOOR(s.u / {_Q379_SCALE}.0 * 1000000 + 0.5) / 1000000
             AS score_residual
    FROM b{last} b CROSS JOIN s{last} s
    WHERE (SELECT COUNT(*) FROM grid WHERE d1 + d0 > 0) > 0
    """
    )  # WHERE guard mirrors the fn's n_times == 0 early return: zero
    # event times (empty/censored-only lake) -> zero rows on both sides


@register(
    "q379_cox_hazard_newton",
    _q379_sql(),
    doc="Cox proportional-hazards regression (Cox 1972, Breslow ties) "
    "on the q353 repurchase cohorts: does URGENT/HIGH priority "
    "multiply the reorder hazard? With the single binary covariate "
    "the partial-likelihood score and Fisher information at each "
    "distinct event time reduce to p = n1*e^b/(n0 + n1*e^b): "
    "U = sum d1 - d*p, I = sum d*p*(1-p), Newton step b += U/I. "
    "Eight Newton iterations run under the exact-replay discipline — "
    "beta held as integer micros, per-time terms micro-quantized "
    "before the sum (the q353 idiom), the step ratio floor-pinned — "
    "so the whole OPTIMIZER is hash-exact on both engines. Reports "
    "beta, the hazard ratio e^beta (the MLE refinement of q353's O/E "
    "ratio), the information-based standard error, Wald z, and the "
    "final score residual (~0: the convergence certificate).",
)
def q379_cox_hazard_newton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one LEAD window per customer builds subjects; the risk-set
    grid is bounded by DISTINCT survival weeks, so the Newton loop runs
    on a driver-side copy of the grid (bounded-collect pattern, q350/
    q351) in arithmetic identical to the oracle's unrolled CTEs: libm
    exp on integer-micro beta, floor-quantized terms, integer sums.
    At any corpus size the per-iteration cost is the bounded grid, and
    the corpus-width work (subjects + grid) happens exactly once."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    mx = o.agg(F.max("o_orderdate").alias("mxd"))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    subj = (
        o.withColumn("nxt", F.lead("o_orderdate").over(w))
        .crossJoin(F.broadcast(mx))
        .select(
            F.floor(
                F.datediff(F.coalesce("nxt", "mxd"), F.col("o_orderdate")) / 7
            ).alias("t_weeks"),
            F.when(F.col("nxt").isNotNull(), 1).otherwise(0).alias("ev"),
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
            ).otherwise(0).alias("grp"),
        )
    )
    tot = subj.agg(
        F.sum("grp").cast("long").alias("tn1"),
        F.sum(1 - F.col("grp")).cast("long").alias("tn0"),
    )
    grid0 = subj.groupBy("t_weeks").agg(
        F.sum(F.col("ev") * F.col("grp")).cast("long").alias("d1"),
        F.sum(F.col("ev") * (1 - F.col("grp"))).cast("long").alias("d0"),
        F.sum((1 - F.col("ev")) * F.col("grp")).cast("long").alias("c1"),
        F.sum((1 - F.col("ev")) * (1 - F.col("grp"))).cast("long").alias("c0"),
    )
    wt = Window.orderBy("t_weeks").rowsBetween(Window.unboundedPreceding, -1)
    grid = (
        grid0.crossJoin(F.broadcast(tot))
        .select(
            "t_weeks",
            "d1",
            "d0",
            (
                F.col("tn1")
                - F.coalesce(F.sum(F.col("d1") + F.col("c1")).over(wt), F.lit(0))
            )
            .cast("long")
            .alias("n1"),
            (
                F.col("tn0")
                - F.coalesce(F.sum(F.col("d0") + F.col("c0")).over(wt), F.lit(0))
            )
            .cast("long")
            .alias("n0"),
        )
        .collect()  # bounded by distinct survival weeks
    )
    rows = [(r["d1"], r["d0"], r["n1"], r["n0"]) for r in grid]
    n_times = sum(1 for d1, d0, _, _ in rows if d1 + d0 > 0)
    if n_times == 0:  # empty/censored-only lake: schema-stable empty result
        return spark.createDataFrame(
            [],
            "n_event_times long, events_urgent long, events_other long, "
            "beta_hat double, hazard_ratio double, std_err double, "
            "z_stat double, score_residual double",
        )
    ev1 = sum(d1 for d1, _, _, _ in rows)
    ev0 = sum(d0 for _, d0, _, _ in rows)
    bq = 0
    u = i = 0
    # Mirrors the oracle's NULL propagation exactly: a single-arm risk
    # table (e.g. a constant lake) has p in {0,1} at every event time,
    # so the Fisher information is 0 and DuckDB's u/0 -> NULL turns bq
    # NULL; the NEXT pass then sets u = i = None (the oracle's NULL-beta
    # propagation), so score_residual is NULL whenever information zeroes
    # before the last iteration — the last real u survives only when the
    # failure lands exactly on the final iteration (where the oracle's
    # s8.u is likewise real). beta/hazard/z become NULL either way.
    for _ in range(_Q379_ITERS):
        if bq is None:
            u = i = None
            break
        u = i = 0
        eb = math.exp(bq / float(_Q379_SCALE))
        for d1, d0, n1, n0 in rows:
            if d1 + d0 == 0:
                continue
            p = (n1 * eb) / (n0 + n1 * eb)
            u += math.floor((d1 - (d1 + d0) * p) * _Q379_SCALE + 0.5)
            i += math.floor((d1 + d0) * p * (1 - p) * _Q379_SCALE + 0.5)
        bq = bq + math.floor(u * 1.0 / i * _Q379_SCALE + 0.5) if i else None
    out = spark.createDataFrame(
        [(n_times, ev1, ev0, bq, u, i)],
        "n_times long, ev1 long, ev0 long, bq long, u long, i long",
    )
    sc = float(_Q379_SCALE)
    beta = F.col("bq") / sc
    return out.select(
        F.col("n_times").alias("n_event_times"),
        F.col("ev1").alias("events_urgent"),
        F.col("ev0").alias("events_other"),
        round_half_up(beta, 6).alias("beta_hat"),
        round_half_up(F.exp(beta), 6).alias("hazard_ratio"),
        # try_divide: zero information -> se undefined (NULL, like DuckDB)
        round_half_up(
            F.try_divide(F.lit(1.0), F.sqrt(F.col("i") / sc)), 6
        ).alias("std_err"),
        round_half_up(beta * F.sqrt(F.col("i") / sc), 6).alias("z_stat"),
        round_half_up(F.col("u") / sc, 6).alias("score_residual"),
    )


# ── q380: Holt-Winters additive seasonal smoothing (period 7) ────────────────

_Q380_SCALE = 1_000_000
_Q380_M = 7


def _q380_sql() -> str:
    sc = _Q380_SCALE
    m = _Q380_M
    sprev = (
        "CASE ((d.rn - 1) % 7) + 1 "
        + " ".join(f"WHEN {j} THEN h.s{j}" for j in range(1, m + 1))
        + " END"
    )
    nl = f"(d.v * {sc} - ({sprev}) + h.l + h.b) // 2"
    nb = f"(({nl}) - h.l + h.b) // 2"
    ns = f"(d.v * {sc} - ({nl}) + ({sprev})) // 2"
    supd = ", ".join(
        f"CAST(CASE WHEN ((d.rn - 1) % 7) + 1 = {j} THEN {ns} "
        f"ELSE h.s{j} END AS BIGINT) AS s{j}"
        for j in range(1, m + 1)
    )
    sinit = ", ".join(
        f"CAST((SELECT v FROM daily WHERE rn = {j}) * {sc} "
        f"- (SELECT l0 FROM init) AS BIGINT) AS s{j}"
        for j in range(1, m + 1)
    )
    scur = (
        "CASE ((d.rn - 1) % 7) + 1 "
        + " ".join(f"WHEN {j} THEN h.s{j}" for j in range(1, m + 1))
        + " END"
    )
    return f"""
    WITH RECURSIVE d0 AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM events GROUP BY 1
    ),
    daily AS (SELECT d, v, ROW_NUMBER() OVER (ORDER BY d) AS rn FROM d0),
    init AS (
      SELECT CAST(SUM(v) * {sc} // {m} AS BIGINT) AS l0
      FROM daily WHERE rn <= {m}
    ),
    hw AS (
      SELECT CAST({m} AS BIGINT) AS rn,
             CAST(i.l0 AS BIGINT) AS l, CAST(0 AS BIGINT) AS b,
             CAST(0 AS BIGINT) AS fq, {sinit}
      FROM init i
      UNION ALL
      SELECT d.rn,
             CAST({nl} AS BIGINT) AS l,
             CAST({nb} AS BIGINT) AS b,
             CAST(h.l + h.b + ({sprev}) AS BIGINT) AS fq,
             {supd}
      FROM hw h JOIN daily d ON d.rn = h.rn + 1
    )
    SELECT d.rn AS day_seq, d.d AS day_idx, d.v AS volume,
           FLOOR(h.l / {sc}.0 * 10000 + 0.5) / 10000 AS level,
           FLOOR((h.b / {sc}.0 + 1000000) * 10000 + 0.5) / 10000 - 1000000
             AS trend,
           FLOOR((({scur}) / {sc}.0 + 1000000) * 10000 + 0.5) / 10000
             - 1000000 AS seasonal,
           FLOOR(h.fq / {sc}.0 * 10000 + 0.5) / 10000 AS fitted,
           FLOOR((d.v - h.fq / {sc}.0 + 1000000) * 10000 + 0.5) / 10000
             - 1000000 AS residual
    FROM hw h JOIN daily d ON d.rn = h.rn
    WHERE h.rn > {m}
    ORDER BY day_seq
    """


@register(
    "q380_holt_winters",
    _q380_sql(),
    doc="Additive Holt-Winters (triple exponential) smoothing of daily "
    "event volume with weekly seasonality (m=7) and alpha=beta=gamma="
    "1/2: level/trend as in q351 plus a 7-slot seasonal state, "
    "one-step-ahead fitted = l + b + s(weekday) and residuals. The "
    "genuinely-sequential recurrence runs in EXACT fixed-point "
    "arithmetic — integer micro-units, truncating integer division, "
    "seasonal slots carried as seven recursive-CTE columns — so the "
    "oracle replays every step bit-for-bit (the q351 discipline "
    "extended to vector state). Seasonal init: first-week deviations "
    "from the first-week mean. Negative states round via the "
    "+1e6-offset floor so HALF-UP holds on negative trend/seasonal/"
    "residual values. This is the forecaster to use when q317 finds "
    "real weekly seasonality — q351's trend-only fit aliases it into "
    "residuals.",
)
def q380_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one per-day count over the event log (map-side
    combinable); the recurrence is calendar-bounded and runs on a
    driver-side copy of the daily relation (bounded-collect pattern,
    q350/q351) in exact Python integer arithmetic with truncating
    division matching BIGINT //. Output ratios are Spark column
    expressions mirroring the oracle's floor pins."""
    sc = _Q380_SCALE
    m = _Q380_M
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            .cast("long")
            .alias("d")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
        .orderBy("d")
        .collect()
    )
    days = [(row["d"], row["v"]) for row in daily]
    empty_schema = (
        "day_seq long, day_idx long, volume long, level double, trend double, "
        "seasonal double, fitted double, residual double"
    )
    if len(days) <= m:
        return spark.createDataFrame([], empty_schema)

    def tdiv2(a: int) -> int:  # truncate toward zero, matching BIGINT // 2
        return -((-a) // 2) if a < 0 else a // 2

    l = sum(v for _, v in days[:m]) * sc // m  # nonneg: plain // is exact
    b = 0
    s = [v * sc - l for _, v in days[:m]]  # s[0] = weekday of rn=1
    rows = []
    for rn in range(m + 1, len(days) + 1):
        d, v = days[rn - 1]
        idx = (rn - 1) % m  # 0-based slot, matches ((rn-1)%7)+1 in SQL
        sprev, lp, bp = s[idx], l, b
        fq = lp + bp + sprev
        l = tdiv2(v * sc - sprev + lp + bp)
        b = tdiv2(l - lp + bp)
        s[idx] = tdiv2(v * sc - l + sprev)
        rows.append((rn, d, v, l, b, s[idx], fq))
    df = spark.createDataFrame(
        rows, "rn long, d long, v long, l long, b long, s long, fq long"
    )
    fsc = float(sc)

    def signed_round4(col):  # floor half-up on possibly-negative values
        return (
            F.floor((col + 1_000_000) * 10_000 + 0.5) / 10_000 - 1_000_000
        )

    return df.select(
        F.col("rn").alias("day_seq"),
        F.col("d").alias("day_idx"),
        F.col("v").alias("volume"),
        round_half_up(F.col("l") / fsc, 4).alias("level"),
        signed_round4(F.col("b") / fsc).alias("trend"),
        signed_round4(F.col("s") / fsc).alias("seasonal"),
        round_half_up(F.col("fq") / fsc, 4).alias("fitted"),
        signed_round4(F.col("v") - F.col("fq") / fsc).alias("residual"),
    ).orderBy("day_seq")


# ── q381: TextRank keyword extraction in exact fixed-point arithmetic ────────

_Q381_ITERS = 10
_Q381_SCALE = 1_000_000
_Q381_TOPK = 20
_Q381_MINLEN = 4


def _q381_sql() -> str:
    sc = _Q381_SCALE
    head = f"""
    WITH tok AS (
      SELECT doc_id, w, ROW_NUMBER() OVER (PARTITION BY doc_id
               ORDER BY pos) AS rn
      FROM (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                  t -> len(t) >= {_Q381_MINLEN})) AS w,
               generate_subscripts(
                 list_filter(string_split_regex(lower(text), '[^a-z]+'),
                             t -> len(t) >= {_Q381_MINLEN}), 1) AS pos
        FROM documents
      )
    ),
    adj AS (
      SELECT a.w AS u, b.w AS v
      FROM tok a JOIN tok b
        ON b.doc_id = a.doc_id AND b.rn = a.rn + 1 AND a.w <> b.w
    ),
    edges AS MATERIALIZED (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS wt
      FROM (
        SELECT u AS src, v AS dst FROM adj
        UNION ALL
        SELECT v AS src, u AS dst FROM adj
      ) GROUP BY src, dst
    ),
    deg AS MATERIALIZED (
      SELECT src, CAST(SUM(wt) AS BIGINT) AS t FROM edges GROUP BY src
    ),
    s0 AS (SELECT src AS w, CAST({sc} AS BIGINT) AS sv FROM deg)"""
    steps = []
    for k in range(1, _Q381_ITERS + 1):
        steps.append(f"""
    s{k} AS MATERIALIZED (
      SELECT n.src AS w,
             CAST((15 * {sc} + 85 * COALESCE(t.tv, 0)) // 100 AS BIGINT) AS sv
      FROM deg n LEFT JOIN (
        SELECT e.dst, CAST(SUM((e.wt * s.sv) // g.t) AS BIGINT) AS tv
        FROM edges e
        JOIN s{k - 1} s ON s.w = e.src
        JOIN deg g ON g.src = e.src
        GROUP BY e.dst
      ) t ON t.dst = n.src
    )""")
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT rank, w AS word,
           FLOOR(sv / {sc}.0 * 1000000 + 0.5) / 1000000 AS score
    FROM (
      SELECT w, sv, CAST(ROW_NUMBER() OVER (ORDER BY sv DESC, w)
                         AS BIGINT) AS rank
      FROM s{_Q381_ITERS}
    ) WHERE rank <= {_Q381_TOPK}
    ORDER BY rank
    """
    )


@register(
    "q381_textrank_keywords",
    _q381_sql(),
    doc="TextRank keyword extraction (Mihalcea & Tarau 2004): "
    "undirected word co-occurrence graph over adjacent content tokens "
    "(len >= 4), damping 0.85, 10 power-iteration rounds of "
    "WS(v) = 0.15 + 0.85 * sum_u w_uv/W_u * WS(u), top-20 keywords. "
    "Every iteration runs in EXACT fixed-point arithmetic — integer "
    "scores, per-edge terms (w*s)//W as truncating integer division, "
    "the damped update as an integer affine map — the q368 HITS "
    "discipline, so the whole ranker is hash-exact on both engines. "
    "The graph-centrality counterpart of q326's RAKE (degree/frequency "
    "scoring) and q69's TF-IDF: TextRank rewards words that co-occur "
    "with OTHER central words, not merely frequent ones.",
)
def q381_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: tokenization is map-only; the edge relation is bounded by
    distinct co-occurring word PAIRS (vocabulary-squared worst case,
    zipf-tiny in practice), and each iteration is one equi-join +
    aggregate over it with a localCheckpoint to stop unrolled-lineage
    blowup (q368 discipline). No corpus rescan after the first pass."""
    from pyspark import StorageLevel

    sc = _Q381_SCALE
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.split(F.lower("text"), "[^a-z]+"),
                lambda t: F.length(t) >= _Q381_MINLEN,
            )
        ).alias("pos", "w"),
    )
    wn = Window.partitionBy("doc_id").orderBy("pos")
    adj = (
        tok.select("doc_id", "w", F.lead("w").over(wn).alias("v"))
        .filter(F.col("v").isNotNull() & (F.col("w") != F.col("v")))
        .select(F.col("w").alias("u"), "v")
    )
    edges = (
        adj.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionAll(adj.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("wt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = (
        edges.groupBy("src")
        .agg(F.sum("wt").cast("long").alias("t"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    s = deg.select(F.col("src").alias("w"), F.lit(sc).cast("long").alias("sv"))
    for _ in range(_Q381_ITERS):
        tv = (
            edges.join(s, edges["src"] == s["w"])
            .join(deg.select(F.col("src").alias("gsrc"), "t"),
                  F.col("src") == F.col("gsrc"))
            .groupBy("dst")
            .agg(
                F.sum(F.expr(f"CAST((wt * sv) div t AS BIGINT)"))
                .cast("long")
                .alias("tv")
            )
        )
        s = (
            deg.join(tv, deg["src"] == tv["dst"], "left")
            .select(
                F.col("src").alias("w"),
                F.expr(
                    f"CAST((15 * {sc} + 85 * COALESCE(tv, 0)) div 100 AS BIGINT)"
                ).alias("sv"),
            )
            # node-bounded; truncate lineage each step (q368 discipline)
            .localCheckpoint(eager=True)
        )
    wr = Window.orderBy(F.desc("sv"), "w")
    out = (
        s.select(
            F.row_number().over(wr).cast("long").alias("rank"),
            F.col("w").alias("word"),
            round_half_up(F.col("sv") / float(sc), 6).alias("score"),
        )
        .filter(F.col("rank") <= _Q381_TOPK)
        .orderBy("rank")
        .localCheckpoint(eager=True)
    )
    edges.unpersist()
    deg.unpersist()
    return out


# ── q382: bipartite k-core peel of the customer-part graph ───────────────────

_Q382_K = 3
_Q382_ROUNDS = 8
# q368's driver-side bound (see training2._Q368_DRIVER_EDGE_BOUND);
# module-level so tests can force the distributed path.
_Q382_DRIVER_EDGE_BOUND = 4_000_000


def _q382_sql() -> str:
    k = _Q382_K
    head = """
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey AS hub, l.l_partkey AS auth
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )"""
    steps = []
    for r in range(1, _Q382_ROUNDS + 1):
        steps.append(f"""
    h{r} AS MATERIALIZED (
      SELECT hub FROM e{r - 1} GROUP BY hub HAVING COUNT(*) >= {k}),
    a{r} AS MATERIALIZED (
      SELECT auth FROM e{r - 1} GROUP BY auth HAVING COUNT(*) >= {k}),
    e{r} AS MATERIALIZED (
      SELECT e.hub, e.auth FROM e{r - 1} e
      JOIN h{r} h ON h.hub = e.hub
      JOIN a{r} a ON a.auth = e.auth)""")
    rows = ", ".join(
        f"({r}, (SELECT COUNT(DISTINCT hub) FROM e{r}), "
        f"(SELECT COUNT(DISTINCT auth) FROM e{r}), "
        f"(SELECT COUNT(*) FROM e{r}))"
        for r in range(1, _Q382_ROUNDS + 1)
    )
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT CAST(col0 AS BIGINT) AS round,
           CAST(col1 AS BIGINT) AS n_customers,
           CAST(col2 AS BIGINT) AS n_parts,
           CAST(col3 AS BIGINT) AS n_edges
    FROM (VALUES {rows}) v(col0, col1, col2, col3)
    ORDER BY round
    """
    )


@register(
    "q382_kcore_peel",
    _q382_sql(),
    doc=f"Bipartite {_Q382_K}-core decomposition of the customer-part "
    "purchase graph (Seidman 1983): iteratively peel customers with "
    f"< {_Q382_K} distinct parts and parts with < {_Q382_K} distinct "
    f"buyers until mutual support stabilizes; {_Q382_ROUNDS} peel "
    "rounds with per-round survivor counts (the trajectory SHOWS "
    "convergence — the last rounds repeat once the fixpoint is hit). "
    "Pure integer set algebra, so hash-exact by construction. The "
    "dense-core complement of q368's HITS scores: HITS ranks nodes, "
    "the k-core is the maximal subgraph where EVERY survivor keeps "
    f">= {_Q382_K} connections — the standard basis for dense-cohort "
    "extraction and graph-noise trimming before embedding training.",
)
def q382_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: each peel round is two degree aggregates + two semi-joins
    over the shrinking edge relation, localCheckpoint'ed per round so
    the unrolled plan stays linear (q368 discipline). Edges only ever
    shrink, so round cost is monotonically decreasing."""
    from pyspark import StorageLevel

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("hub"), F.col("l_partkey").alias("auth"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Measured and rejected (r10): broadcasting the degree-filter
    # relations into the two joins. The checkpointed cur relation is
    # AQE-coalesced to ~1 cached partition at sf0.1, so broadcast joins
    # ran the whole peel round in ONE task — 6.0 s -> 10.6 s. The
    # sort-merge exchanges ARE this loop's parallelism; they stay on the
    # distributed (100 TB) path.
    # Driver-side peel below the 4M-edge broadcast bound (r11; guide §8 —
    # q398/union-find precedent): 8 rounds x (checkpoint + collect) =
    # 16 Spark jobs of pure scheduling overhead once the DISTINCT edge
    # relation fits one broadcast-sized buffer (r10 scaling block: 8
    # cores beat 32 at ratio 0.80). The peel is integer set algebra —
    # every output column is an exact count — so the replay is
    # bit-identical by construction.
    n_edges_total = e.count()
    if 0 < n_edges_total <= _Q382_DRIVER_EDGE_BOUND:
        import numpy as np

        pdf = e.toPandas()
        hub_ids, hub_idx = np.unique(
            pdf["hub"].to_numpy(np.int64), return_inverse=True
        )
        auth_ids, auth_idx = np.unique(
            pdf["auth"].to_numpy(np.int64), return_inverse=True
        )
        alive = np.ones(len(hub_idx), dtype=bool)
        out_rows = []
        for r in range(1, _Q382_ROUNDS + 1):
            hd = np.bincount(hub_idx[alive], minlength=len(hub_ids))
            ad = np.bincount(auth_idx[alive], minlength=len(auth_ids))
            alive &= (hd[hub_idx] >= _Q382_K) & (ad[auth_idx] >= _Q382_K)
            ne = int(alive.sum())
            nh = int(np.unique(hub_idx[alive]).size)
            na = int(np.unique(auth_idx[alive]).size)
            out_rows.append((r, nh, na, ne))
        e.unpersist()
        return spark.createDataFrame(
            out_rows, "round long, n_customers long, n_parts long, n_edges long"
        ).orderBy("round")
    rows = []
    cur = e
    for r in range(1, _Q382_ROUNDS + 1):
        h = cur.groupBy("hub").count().filter(F.col("count") >= _Q382_K).select("hub")
        a = (
            cur.groupBy("auth").count().filter(F.col("count") >= _Q382_K).select("auth")
        )
        cur = (
            cur.join(h, "hub").join(a, "auth").select("hub", "auth")
            .localCheckpoint(eager=True)
        )
        agg = cur.agg(
            F.countDistinct("hub").cast("long").alias("nh"),
            F.countDistinct("auth").cast("long").alias("na"),
            F.count(F.lit(1)).cast("long").alias("ne"),
        ).collect()[0]
        rows.append((r, agg["nh"] or 0, agg["na"] or 0, agg["ne"]))
    e.unpersist()
    return spark.createDataFrame(
        rows, "round long, n_customers long, n_parts long, n_edges long"
    ).orderBy("round")


# ── q383: t-closeness privacy audit (variational-distance EMD) ───────────────

_Q383_T = 0.25  # closeness threshold


@register(
    "q383_t_closeness",
    f"""
    WITH base AS (
      SELECT c_mktsegment,
             CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS bal_bucket,
             c_nationkey
      FROM customer
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
    gdist AS (
      SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS gc FROM base GROUP BY 1
    ),
    cls AS (
      SELECT c_mktsegment, bal_bucket, CAST(COUNT(*) AS BIGINT) AS nc
      FROM base GROUP BY 1, 2
    ),
    cdist AS (
      SELECT c_mktsegment, bal_bucket, c_nationkey,
             CAST(COUNT(*) AS BIGINT) AS cc
      FROM base GROUP BY 1, 2, 3
    ),
    spine AS (
      SELECT c.c_mktsegment, c.bal_bucket, c.nc, g.c_nationkey, g.gc
      FROM cls c CROSS JOIN gdist g
    )
    SELECT s.c_mktsegment, s.bal_bucket, MAX(s.nc) AS class_size,
           CAST(SUM(CASE WHEN d.cc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sensitive_distinct,
           FLOOR(SUM(ABS(COALESCE(d.cc, 0) * t.n - s.gc * s.nc))
                 / (2.0 * MAX(s.nc) * MAX(t.n)) * 1000000 + 0.5) / 1000000
             AS tvd,
           CASE WHEN SUM(ABS(COALESCE(d.cc, 0) * t.n - s.gc * s.nc))
                     / (2.0 * MAX(s.nc) * MAX(t.n)) <= {_Q383_T}
                THEN 1 ELSE 0 END AS t_ok
    FROM spine s
    LEFT JOIN cdist d
      ON d.c_mktsegment = s.c_mktsegment AND d.bal_bucket = s.bal_bucket
     AND d.c_nationkey = s.c_nationkey
    CROSS JOIN tot t
    GROUP BY s.c_mktsegment, s.bal_bucket
    ORDER BY s.c_mktsegment, s.bal_bucket
    """,
    doc="t-closeness privacy audit (Li et al. 2007) — the third rung of "
    "the privacy ladder after q194's k-anonymity and q324's entropy "
    "l-diversity: for each quasi-identifier class (mktsegment x 2000-"
    "unit balance bucket, q324's classes), the variational distance "
    "0.5*sum|p_class - p_global| between the class's nationality "
    "distribution and the corpus-wide one. l-diversity can pass while "
    "the class distribution still leaks (skewness attack); t-closeness "
    f"bounds the leak. Classes with tvd > {_Q383_T} fail. The distance "
    "is an EXACT integer ratio — common denominator n_class*N makes "
    "the numerator sum(|cc*N - gc*nc|) pure BIGINT — so the audit is "
    "hash-exact with no float accumulation at all.",
)
def q383_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: three map-side-combinable aggregates over the customer
    relation; the spine is classes x nations (taxonomy-bounded) built
    from the AGGREGATED relations, never row-level data, and the
    global distribution broadcasts."""
    base = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 2000).cast("long").alias("bal_bucket"),
        "c_nationkey",
    )
    tot = base.agg(F.count(F.lit(1)).cast("long").alias("n"))
    gdist = base.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("gc")
    )
    cls = base.groupBy("c_mktsegment", "bal_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("nc")
    )
    cdist = base.groupBy("c_mktsegment", "bal_bucket", "c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("cc")
    )
    spine = cls.crossJoin(F.broadcast(gdist))
    j = (
        spine.join(
            cdist,
            ["c_mktsegment", "bal_bucket", "c_nationkey"],
            "left",
        )
        .crossJoin(F.broadcast(tot))
    )
    num = F.sum(
        F.abs(F.coalesce(F.col("cc"), F.lit(0)) * F.col("n") - F.col("gc") * F.col("nc"))
    )
    den = 2.0 * F.max("nc") * F.max("n")
    return (
        j.groupBy("c_mktsegment", "bal_bucket")
        .agg(
            F.max("nc").alias("class_size"),
            F.sum(F.when(F.col("cc").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_sensitive_distinct"),
            round_half_up(num / den, 6).alias("tvd"),
            F.when(num / den <= _Q383_T, 1).otherwise(0).alias("t_ok"),
        )
        .orderBy("c_mktsegment", "bal_bucket")
    )


# ── q384: regression discontinuity at the quantity-25 cutoff ─────────────────

_Q384_CUT = 25
_Q384_BW = 10


def _q384_side_sql(cond: str, tag: str) -> str:
    return f"""
    {tag} AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xc) AS BIGINT) AS sx,
             CAST(SUM(xc * xc) AS BIGINT) AS sxx,
             CAST(SUM(yq) AS BIGINT) AS sy,
             CAST(SUM(xc * yq) AS BIGINT) AS sxy,
             CAST(SUM(yq * yq) AS BIGINT) AS syy
      FROM rd WHERE {cond}
    )"""


def _q384_sql() -> str:
    c, h = _Q384_CUT, _Q384_BW
    ols = """
      (s.sy * s.sxx - s.sx * s.sxy) * 1.0 / (s.n * s.sxx - s.sx * s.sx)
    """.strip()
    slope = """
      (s.n * s.sxy - s.sx * s.sy) * 1.0 / (s.n * s.sxx - s.sx * s.sx)
    """.strip()
    var_i = f"""
      ((s.syy - ({ols}) * s.sy - ({slope}) * s.sxy) / (s.n - 2))
      * s.sxx / (s.n * s.sxx - s.sx * s.sx)
    """.strip()
    return f"""
    WITH rd AS (
      SELECT CAST(l_quantity AS BIGINT) - {c} AS xc,
             CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS yq
      FROM lineitem
      WHERE l_quantity >= {c - h} AND l_quantity < {c + h}
    ),
    {_q384_side_sql(f"xc < 0", "lft")},
    {_q384_side_sql(f"xc >= 0", "rgt")},
    fit AS (
      SELECT (SELECT n FROM lft) AS n_left, (SELECT n FROM rgt) AS n_right,
             (SELECT {ols} FROM lft s) AS il,
             (SELECT {slope} FROM lft s) AS sl,
             (SELECT {var_i} FROM lft s) AS vl,
             (SELECT {ols} FROM rgt s) AS ir,
             (SELECT {slope} FROM rgt s) AS sr,
             (SELECT {var_i} FROM rgt s) AS vr
    )
    SELECT n_left, n_right,
           FLOOR((il / 100 + 1000) * 1000000 + 0.5) / 1000000 - 1000
             AS intercept_left,
           FLOOR((ir / 100 + 1000) * 1000000 + 0.5) / 1000000 - 1000
             AS intercept_right,
           FLOOR((sl / 100 + 1000) * 1000000 + 0.5) / 1000000 - 1000
             AS slope_left,
           FLOOR((sr / 100 + 1000) * 1000000 + 0.5) / 1000000 - 1000
             AS slope_right,
           FLOOR(((ir - il) / 100 + 1000) * 1000000 + 0.5) / 1000000 - 1000
             AS rd_effect,
           FLOOR(SQRT(vl + vr) / 100 * 1000000 + 0.5) / 1000000 AS std_err,
           FLOOR(((ir - il) / SQRT(vl + vr) + 1000) * 1000000 + 0.5)
             / 1000000 - 1000 AS z_stat
    FROM fit
    """


@register(
    "q384_regression_discontinuity",
    _q384_sql(),
    doc=f"Sharp regression-discontinuity design at the quantity-"
    f"{_Q384_CUT} cutoff (Thistlethwaite & Campbell 1960): local "
    f"linear fits of discount on centered quantity within a +/-"
    f"{_Q384_BW}-unit bandwidth on each side; the causal estimand is "
    "the intercept jump at the cutoff, with the SE from both sides' "
    "OLS intercept variances. Completes the causal family (q316 DiD, "
    "q336 IPW, q371 mediation) with the design for THRESHOLD rules — "
    "exactly how a 'free shipping over N units' policy would be "
    "evaluated. Both OLS fits are closed forms over six exact integer "
    "moments (discount held as integer percent, quantity centered "
    "integer), so every coefficient is one fixed IEEE tree — "
    "hash-exact. TPC-H assigns discounts independently of quantity, "
    "so the expected readout is a NULL effect (the q362/q316 "
    "A/A-calibration convention): |z| < 2 certifies the machinery "
    "does not hallucinate a jump.",
)
def q384_regression_discontinuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one filtered scan -> two 6-number moment aggregates
    (map-side combinable); everything downstream is scalar algebra on
    a broadcast 1-row relation."""
    c, h = _Q384_CUT, _Q384_BW
    li = load_table(spark, sf_dir, "lineitem")
    rd = li.filter(
        (F.col("l_quantity") >= c - h) & (F.col("l_quantity") < c + h)
    ).select(
        (F.col("l_quantity").cast("long") - c).alias("xc"),
        F.floor(F.col("l_discount") * 100 + 0.5).cast("long").alias("yq"),
    )

    def side(cond):
        return rd.filter(cond).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("xc").cast("long").alias("sx"),
            F.sum(F.col("xc") * F.col("xc")).cast("long").alias("sxx"),
            F.sum("yq").cast("long").alias("sy"),
            F.sum(F.col("xc") * F.col("yq")).cast("long").alias("sxy"),
            F.sum(F.col("yq") * F.col("yq")).cast("long").alias("syy"),
        )

    def fit(prefix):
        n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
        sy, sxy, syy = F.col("sy"), F.col("sxy"), F.col("syy")
        # try_divide: a side with < 3 points has den = 0 / zero dof
        den = n * sxx - sx * sx
        icpt = F.try_divide((sy * sxx - sx * sxy) * 1.0, den)
        slope = F.try_divide((n * sxy - sx * sy) * 1.0, den)
        var_i = F.try_divide(
            F.try_divide(syy - icpt * sy - slope * sxy, n - 2) * sxx, den
        )
        return [
            F.col("n").alias(f"n_{prefix}"),
            icpt.alias(f"i{prefix}"),
            slope.alias(f"s{prefix}"),
            var_i.alias(f"v{prefix}"),
        ]

    lft = side(F.col("xc") < 0).select(*fit("l"))
    rgt = side(F.col("xc") >= 0).select(*fit("r"))
    j = lft.crossJoin(F.broadcast(rgt))

    def signed_round6(col):
        return F.floor((col + 1000) * 1_000_000 + 0.5) / 1_000_000 - 1000

    eff = (F.col("ir") - F.col("il")) / 100
    se = F.sqrt(F.col("vl") + F.col("vr")) / 100
    return j.select(
        F.col("n_l").alias("n_left"),
        F.col("n_r").alias("n_right"),
        signed_round6(F.col("il") / 100).alias("intercept_left"),
        signed_round6(F.col("ir") / 100).alias("intercept_right"),
        signed_round6(F.col("sl") / 100).alias("slope_left"),
        signed_round6(F.col("sr") / 100).alias("slope_right"),
        signed_round6(eff).alias("rd_effect"),
        round_half_up(se, 6).alias("std_err"),
        signed_round6(
            F.try_divide(
                F.col("ir") - F.col("il"),
                F.sqrt(F.col("vl") + F.col("vr")),
            )
        ).alias("z_stat"),
    )


# ── q385: periodogram scan for the dominant seasonal period ──────────────────

_Q385_PERIODS = list(range(2, 15))


def _q385_sql() -> str:
    terms = []
    for p in _Q385_PERIODS:
        terms.append(f"""
      SELECT {p} AS period,
             CAST(SUM(CAST(FLOOR(vc * COS(2 * PI() / {p} * rn) * 1000000
                                 + 0.5) AS BIGINT)) AS BIGINT) AS cq,
             CAST(SUM(CAST(FLOOR(vc * SIN(2 * PI() / {p} * rn) * 1000000
                                 + 0.5) AS BIGINT)) AS BIGINT) AS sq,
             CAST(MAX(n) AS BIGINT) AS n
      FROM ctr""")
    return f"""
    WITH d0 AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM events GROUP BY 1
    ),
    daily AS (SELECT v, ROW_NUMBER() OVER (ORDER BY d) AS rn FROM d0),
    mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(v) AS BIGINT) AS sv FROM daily),
    ctr AS MATERIALIZED (
      SELECT rn, v - m.sv * 1.0 / m.n AS vc, m.n
      FROM daily CROSS JOIN mom m
    ),
    pg AS ({" UNION ALL ".join(terms)}),
    -- per-period power quantized to an integer BEFORE the cross-period
    -- share sum: a float SUM over the union is accumulation-order-
    -- dependent across engines (the q386 lesson)
    pq AS (
      SELECT period, n,
             CAST(FLOOR(((cq / 1000000.0) * (cq / 1000000.0)
                         + (sq / 1000000.0) * (sq / 1000000.0)) * 100 + 0.5)
                  AS BIGINT) AS pw_q
      FROM pg
    )
    SELECT period,
           FLOOR(pw_q / 100.0 / n * 10000 + 0.5) / 10000 AS power,
           FLOOR(pw_q * 1.0 / SUM(pw_q) OVER () * 1000000 + 0.5) / 1000000
             AS power_share,
           CASE WHEN ROW_NUMBER() OVER (ORDER BY pw_q DESC, period) = 1
                THEN 1 ELSE 0 END AS dominant
    FROM pq
    ORDER BY period
    """


@register(
    "q385_periodogram_scan",
    _q385_sql(),
    doc="Schuster periodogram scan of daily event volume over candidate "
    "periods 2-14 days: I(p) = (C_p^2 + S_p^2)/n with C_p = sum "
    "(v_t - mean) cos(2 pi t / p), S_p the sine sum — the spectral "
    "detector that FINDS the period q380's Holt-Winters and q317's "
    "eta-squared ASSUME. Per-term products are micro-quantized before "
    "the sum (the q353 idiom; cos/sin on both engines are libm doubles "
    "of identical integer-ratio angles), making the whole spectrum "
    "hash-exact. Reports per-period power, share of total scanned "
    "power, and the dominant-period flag.",
)
def q385_periodogram_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one per-day count (map-side combinable); the spectrum
    itself is |periods| passes over the calendar-bounded daily
    relation — broadcast moments, no corpus rescans."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            .cast("long")
            .alias("d")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
        .select("v", F.row_number().over(Window.orderBy("d")).alias("rn"))
    )
    mom = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("sv"),
    )
    ctr = (
        daily.crossJoin(F.broadcast(mom))
        .select(
            "rn",
            (F.col("v") - F.col("sv") * 1.0 / F.col("n")).alias("vc"),
            "n",
        )
        .localCheckpoint(eager=True)
    )
    parts = []
    for p in _Q385_PERIODS:
        w = 2 * math.pi / p
        parts.append(
            ctr.agg(
                F.lit(p).cast("long").alias("period"),
                F.sum(
                    F.floor(F.col("vc") * F.cos(F.lit(w) * F.col("rn")) * 1_000_000 + 0.5)
                    .cast("long")
                ).cast("long").alias("cq"),
                F.sum(
                    F.floor(F.col("vc") * F.sin(F.lit(w) * F.col("rn")) * 1_000_000 + 0.5)
                    .cast("long")
                ).cast("long").alias("sq"),
                F.max("n").cast("long").alias("n"),
            )
        )
    pg = parts[0]
    for q in parts[1:]:
        pg = pg.unionByName(q)
    pw = (F.col("cq") / 1_000_000.0) * (F.col("cq") / 1_000_000.0) + (
        F.col("sq") / 1_000_000.0
    ) * (F.col("sq") / 1_000_000.0)
    # integer-quantize per-period power BEFORE the cross-period share
    # sum — a float SUM over the union is accumulation-order-dependent
    pq = pg.select(
        "period", "n", F.floor(pw * 100 + 0.5).cast("long").alias("pw_q")
    )
    wall = Window.partitionBy()
    wr = Window.orderBy(F.desc("pw_q"), "period")
    return pq.select(
        "period",
        round_half_up(F.col("pw_q") / 100.0 / F.col("n"), 4).alias("power"),
        # try_divide: a 1-day lake has zero detrended power everywhere
        round_half_up(
            F.try_divide(F.col("pw_q") * 1.0, F.sum("pw_q").over(wall)), 6
        ).alias("power_share"),
        F.when(F.row_number().over(wr) == 1, 1).otherwise(0).alias("dominant"),
    ).orderBy("period")


# ── q386: Brown-Forsythe homogeneity-of-spread test ──────────────────────────


@register(
    "q386_brown_forsythe",
    """
    WITH base AS (
      SELECT o_orderpriority AS grp, o_totalprice AS y, o_orderkey
      FROM orders
    ),
    med AS (
      SELECT grp,
             (MAX(CASE WHEN rn = (n + 1) // 2 THEN y END)
              + MAX(CASE WHEN rn = n // 2 + 1 THEN y END)) / 2 AS med
      FROM (
        SELECT grp, y,
               ROW_NUMBER() OVER (PARTITION BY grp ORDER BY y, o_orderkey)
                 AS rn,
               COUNT(*) OVER (PARTITION BY grp) AS n
        FROM base
      ) GROUP BY grp
    ),
    z AS (
      SELECT b.grp,
             CAST(FLOOR(ABS(b.y - m.med) * 100 + 0.5) AS BIGINT) AS zq
      FROM base b JOIN med m ON m.grp = b.grp
    ),
    -- per-group float terms are quantized to integer 1e4-cents^2 units
    -- BEFORE the cross-group sum (cross-group float SUM accumulation
    -- order differs between engines); zq^2 sums go through DOUBLE via
    -- the exact wide-integer sum (HUGEINT here, DECIMAL(38,0) in Spark)
    -- NOTE every float factor below is forced to DOUBLE (1e4 literal /
    -- CAST AS DOUBLE): DuckDB parses `10000.0` as DECIMAL and keeps
    -- big products exact where Spark's doubles round past 2^53
    g AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(zq) AS BIGINT) AS s,
             CAST(FLOOR(CAST(SUM(zq * zq) AS DOUBLE) / 1e4) AS BIGINT)
               AS q_t
      FROM z GROUP BY grp
    ),
    g2 AS (
      SELECT n, s, q_t,
             CAST(FLOOR(CAST(s AS DOUBLE) * s / n / 1e4) AS BIGINT) AS term_t
      FROM g
    ),
    t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS nn,
             CAST(SUM(s) AS BIGINT) AS ss,
             CAST(SUM(term_t) AS BIGINT) * 1e4 AS sq_over_n,
             CAST(SUM(q_t) AS BIGINT) * 1e4 AS qq
      FROM g2
    )
    SELECT k AS n_groups, nn AS n_total,
           FLOOR((sq_over_n - CAST(ss AS DOUBLE) * ss / nn) / 1e4 * 100 + 0.5)
             / 100 AS ss_between,
           FLOOR((qq - sq_over_n) / 1e4 * 100 + 0.5) / 100 AS ss_within,
           FLOOR(((sq_over_n - CAST(ss AS DOUBLE) * ss / nn) / (k - 1))
                 / ((qq - sq_over_n) / (nn - k)) * 1000000 + 0.5) / 1000000
             AS f_stat,
           CASE WHEN ((sq_over_n - CAST(ss AS DOUBLE) * ss / nn) / (k - 1))
                     / ((qq - sq_over_n) / (nn - k)) > 2.372
                THEN 1 ELSE 0 END AS reject_equal_spread
    FROM t
    """,
    doc="Brown-Forsythe test (1974) for homogeneity of spread in order "
    "totals across the five order-priority groups: one-way ANOVA F on "
    "absolute deviations from each GROUP MEDIAN (the robust variant "
    "of Levene's test — means would make it chase the same skewness "
    "q378 demonstrated). Medians are deterministic mid-pair picks "
    "(ORDER BY y, o_orderkey), deviations are quantized to cents, so "
    "both sums of squares are exact-integer-derived and the F ratio "
    "is one fixed IEEE tree. Critical value 2.372 = F(4, inf) at 5%. "
    "The variance-side companion of q333 (Welch means) and q356 "
    "(Kruskal-Wallis locations): equal-spread is the assumption "
    "classical pooled-variance ANOVA needs, and this is the test "
    "that checks it.",
)
def q386_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one grouped window for the median rank (partitioned by
    group, never global), one join back on the 5-row median relation
    (broadcast), then two map-side-combinable moment aggregates."""
    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").alias("y"),
        "o_orderkey",
    )
    wg = Window.partitionBy("grp").orderBy("y", "o_orderkey")
    wp = Window.partitionBy("grp")
    ranked = base.select(
        "grp",
        "y",
        F.row_number().over(wg).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    lo_pick = F.expr("CAST((n + 1) div 2 AS BIGINT)") == F.col("rn")
    hi_pick = F.expr("CAST(n div 2 + 1 AS BIGINT)") == F.col("rn")
    med = ranked.groupBy("grp").agg(
        (
            (
                F.max(F.when(lo_pick, F.col("y")))
                + F.max(F.when(hi_pick, F.col("y")))
            )
            / 2
        ).alias("med")
    )
    z = base.join(F.broadcast(med), "grp").select(
        "grp",
        F.floor(F.abs(F.col("y") - F.col("med")) * 100 + 0.5)
        .cast("long")
        .alias("zq"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    g = z.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("zq").cast("long").alias("s"),
        F.floor(F.sum(dec("zq") * dec("zq")).cast("double") / 10_000.0)
        .cast("long")
        .alias("q_t"),
    )
    g2 = g.withColumn(
        "term_t",
        F.floor(F.col("s") * 1.0 * F.col("s") / F.col("n") / 10_000.0).cast("long"),
    )
    t = g2.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("s").cast("long").alias("ss"),
        (F.sum("term_t").cast("long") * 10_000.0).alias("sq_over_n"),
        (F.sum("q_t").cast("long") * 10_000.0).alias("qq"),
    )
    ssb = F.col("sq_over_n") - F.col("ss") * 1.0 * F.col("ss") / F.col("nn")
    ssw = F.col("qq") - F.col("sq_over_n")
    # try_divide: one group or one row leaves zero dof on either side
    fstat = F.try_divide(
        F.try_divide(ssb, F.col("k") - 1),
        F.try_divide(ssw, F.col("nn") - F.col("k")),
    )
    return t.select(
        F.col("k").alias("n_groups"),
        F.col("nn").alias("n_total"),
        round_half_up(ssb / 10_000.0, 2).alias("ss_between"),
        round_half_up(ssw / 10_000.0, 2).alias("ss_within"),
        round_half_up(fstat, 6).alias("f_stat"),
        F.when(fstat > 2.372, 1).otherwise(0).alias("reject_equal_spread"),
    )


# ── q387: Fellegi-Sunter probabilistic linkage weights ───────────────────────

_Q387_OFFSETS = (7, 13, 29)  # deterministic background-pair strides
_Q387_LEN_TOL = 64
_Q387_PFX = 32


def _q387_sql() -> str:
    from .queries import QUERY_REGISTRY as _REGISTRY

    dup = _REGISTRY["q24_minhash_lsh_dedup"].sql
    bg = " UNION ALL ".join(
        f"SELECT a.doc_id AS da, b.doc_id AS db FROM documents a "
        f"JOIN documents b ON b.doc_id = a.doc_id + {off}"
        for off in _Q387_OFFSETS
    )
    fields = f"""
      SELECT 'lang' AS field,
             CASE WHEN a.lang = b.lang THEN 1 ELSE 0 END AS agree, kind
        FROM pairs p JOIN documents a ON a.doc_id = p.da
                     JOIN documents b ON b.doc_id = p.db
      UNION ALL
      SELECT 'source' AS field,
             CASE WHEN a.source = b.source THEN 1 ELSE 0 END, kind
        FROM pairs p JOIN documents a ON a.doc_id = p.da
                     JOIN documents b ON b.doc_id = p.db
      UNION ALL
      SELECT 'length' AS field,
             CASE WHEN ABS(a.n_chars - b.n_chars) <= {_Q387_LEN_TOL}
                  THEN 1 ELSE 0 END, kind
        FROM pairs p JOIN documents a ON a.doc_id = p.da
                     JOIN documents b ON b.doc_id = p.db
      UNION ALL
      SELECT 'prefix' AS field,
             CASE WHEN substr(a.text, 1, {_Q387_PFX})
                       = substr(b.text, 1, {_Q387_PFX}) THEN 1 ELSE 0 END,
             kind
        FROM pairs p JOIN documents a ON a.doc_id = p.da
                     JOIN documents b ON b.doc_id = p.db
    """
    return f"""
    WITH dup AS ({dup}),
    pairs AS MATERIALIZED (
      SELECT doc_a AS da, doc_b AS db, 1 AS kind FROM dup
      UNION ALL
      SELECT da, db, 0 AS kind FROM ({bg}) x
      WHERE NOT EXISTS (SELECT 1 FROM dup d
                        WHERE d.doc_a = x.da AND d.doc_b = x.db)
    ),
    cmp AS ({fields}),
    rates AS (
      SELECT field,
             CAST(SUM(CASE WHEN kind = 1 THEN agree ELSE 0 END) AS BIGINT)
               AS ma,
             CAST(SUM(CASE WHEN kind = 1 THEN 1 ELSE 0 END) AS BIGINT) AS mn,
             CAST(SUM(CASE WHEN kind = 0 THEN agree ELSE 0 END) AS BIGINT)
               AS ua,
             CAST(SUM(CASE WHEN kind = 0 THEN 1 ELSE 0 END) AS BIGINT) AS un
      FROM cmp GROUP BY field
    )
    SELECT field, mn AS n_match_pairs, un AS n_background_pairs,
           FLOOR((2 * ma + 1) * 1.0 / (2 * mn + 2) * 1000000 + 0.5) / 1000000
             AS m_prob,
           FLOOR((2 * ua + 1) * 1.0 / (2 * un + 2) * 1000000 + 0.5) / 1000000
             AS u_prob,
           FLOOR((LOG2(((2 * ma + 1) * 1.0 / (2 * mn + 2))
                       / ((2 * ua + 1) * 1.0 / (2 * un + 2))) + 1000)
                 * 10000 + 0.5) / 10000 - 1000 AS weight_agree,
           FLOOR((LOG2((1 - (2 * ma + 1) * 1.0 / (2 * mn + 2))
                       / (1 - (2 * ua + 1) * 1.0 / (2 * un + 2))) + 1000)
                 * 10000 + 0.5) / 10000 - 1000 AS weight_disagree
    FROM rates
    ORDER BY field
    """


@register(
    "q387_fellegi_sunter_weights",
    _q387_sql(),
    doc="Fellegi-Sunter probabilistic record-linkage weights (1969) "
    "learned in-engine: m-probabilities (field agreement among MATCH "
    "pairs = q24's MinHash near-dup relation) vs u-probabilities "
    "(agreement among deterministic stride-sampled background pairs, "
    "doc_id+7/13/29, dup pairs anti-joined out), per comparison field "
    "(lang, source, length-within-64, 32-char prefix). Laplace-"
    "smoothed ((2a+1)/(2n+2)) so log-odds never hit infinity; "
    "agreement weight log2(m/u) and disagreement weight "
    "log2((1-m)/(1-u)) are each one fixed IEEE tree over exact "
    "integer ratios — hash-exact. These weights turn q328's sorted-"
    "neighborhood candidate pairs into SCORED links: sum the per-"
    "field weights and threshold — the statistical upgrade of q83's "
    "hand-set fuzzy rules.",
)
def q387_fellegi_sunter_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: match pairs come from the already-bucketed q24 relation;
    background pairs are stride equi-joins (3N rows, no cross join);
    each comparison is a map-side expression after two broadcast-able
    doc-attribute joins. Rates are one small rollup."""
    from .queries import QUERY_REGISTRY as _REGISTRY

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars", F.col("text")
    )
    dup = (
        _REGISTRY["q24_minhash_lsh_dedup"].fn(spark, sf_dir)
        .select(F.col("doc_a").alias("da"), F.col("doc_b").alias("db"))
        .localCheckpoint(eager=True)
    )
    return _q387_weights_from(docs, dup)


def _q387_weights_from(docs: DataFrame, dup: DataFrame) -> DataFrame:
    """Fellegi-Sunter m/u weight estimation given the (da, db) match-pair
    relation — shared by q387 and q404 (r11: q404 previously rebuilt the
    whole q24 detector a second time just to hand it to q387)."""
    bg = None
    for off in _Q387_OFFSETS:
        a = docs.select(F.col("doc_id").alias("da"))
        b = docs.select((F.col("doc_id") - off).alias("da"), F.col("doc_id").alias("db"))
        part = a.join(b, "da").select("da", "db")
        bg = part if bg is None else bg.unionAll(part)
    bg = bg.join(dup, ["da", "db"], "left_anti")
    pairs = dup.withColumn("kind", F.lit(1)).unionByName(
        bg.withColumn("kind", F.lit(0))
    )
    da = docs.select(
        F.col("doc_id").alias("da"),
        F.col("lang").alias("lang_a"),
        F.col("source").alias("source_a"),
        F.col("n_chars").alias("nc_a"),
        F.substring("text", 1, _Q387_PFX).alias("pfx_a"),
    )
    db = docs.select(
        F.col("doc_id").alias("db"),
        F.col("lang").alias("lang_b"),
        F.col("source").alias("source_b"),
        F.col("n_chars").alias("nc_b"),
        F.substring("text", 1, _Q387_PFX).alias("pfx_b"),
    )
    j = pairs.join(da, "da").join(db, "db")
    cmp = None
    specs = [
        ("lang", F.when(F.col("lang_a") == F.col("lang_b"), 1).otherwise(0)),
        ("source", F.when(F.col("source_a") == F.col("source_b"), 1).otherwise(0)),
        (
            "length",
            F.when(
                F.abs(F.col("nc_a") - F.col("nc_b")) <= _Q387_LEN_TOL, 1
            ).otherwise(0),
        ),
        ("prefix", F.when(F.col("pfx_a") == F.col("pfx_b"), 1).otherwise(0)),
    ]
    for name, expr in specs:
        part = j.select(F.lit(name).alias("field"), expr.alias("agree"), "kind")
        cmp = part if cmp is None else cmp.unionByName(part)
    rates = cmp.groupBy("field").agg(
        F.sum(F.when(F.col("kind") == 1, F.col("agree")).otherwise(0))
        .cast("long")
        .alias("ma"),
        F.sum(F.when(F.col("kind") == 1, 1).otherwise(0)).cast("long").alias("mn"),
        F.sum(F.when(F.col("kind") == 0, F.col("agree")).otherwise(0))
        .cast("long")
        .alias("ua"),
        F.sum(F.when(F.col("kind") == 0, 1).otherwise(0)).cast("long").alias("un"),
    )
    m = (2 * F.col("ma") + 1) * 1.0 / (2 * F.col("mn") + 2)
    u = (2 * F.col("ua") + 1) * 1.0 / (2 * F.col("un") + 2)

    def signed_round4(col):
        return F.floor((col + 1000) * 10_000 + 0.5) / 10_000 - 1000

    return rates.select(
        "field",
        F.col("mn").alias("n_match_pairs"),
        F.col("un").alias("n_background_pairs"),
        round_half_up(m, 6).alias("m_prob"),
        round_half_up(u, 6).alias("u_prob"),
        signed_round4(F.log2(m / u)).alias("weight_agree"),
        signed_round4(F.log2((1 - m) / (1 - u))).alias("weight_disagree"),
    ).orderBy("field")


# ── q388: Friedman test across event types over daily blocks ─────────────────


@register(
    "q388_friedman_test",
    """
    WITH spine AS (
      SELECT d.day, t.event_type
      FROM (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events) d
      CROSS JOIN (SELECT DISTINCT event_type FROM events) t
    ),
    obs AS (
      SELECT s.day, s.event_type,
             CAST(COALESCE(c.v, 0) AS BIGINT) AS v
      FROM spine s LEFT JOIN (
        SELECT CAST(ts AS DATE) AS day, event_type,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM events GROUP BY 1, 2
      ) c ON c.day = s.day AND c.event_type = s.event_type
    ),
    -- doubled midranks stay integer under ties: D = 2*rank + ties - 1
    rk AS (
      SELECT day, event_type,
             CAST(2 * RANK() OVER (PARTITION BY day ORDER BY v)
                  + COUNT(*) OVER (PARTITION BY day, v) - 1 AS BIGINT) AS d2
      FROM obs
    ),
    dims AS (
      SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS b,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
      FROM rk
    ),
    per_t AS (
      SELECT event_type, CAST(SUM(d2) AS BIGINT) AS s2,
             CAST(SUM(d2 * d2) AS BIGINT) AS q2
      FROM rk GROUP BY event_type
    ),
    tot AS (
      SELECT CAST(SUM(s2 * s2) AS BIGINT) AS ss2,
             CAST(SUM(q2) AS BIGINT) AS sq2
      FROM per_t
    )
    SELECT p.event_type,
           FLOOR(p.s2 / 2.0 * 100 + 0.5) / 100 AS rank_sum,
           FLOOR(p.s2 / (2.0 * d.b) * 10000 + 0.5) / 10000 AS mean_rank,
           FLOOR((d.k - 1) * (t.ss2 - d.b * d.b * d.k * (d.k + 1) * (d.k + 1))
                 * 1.0
                 / (d.b * (t.sq2 - d.b * d.k * (d.k + 1) * (d.k + 1)))
                 * 1000000 + 0.5) / 1000000 AS friedman_chi2,
           CASE WHEN (d.k - 1)
                     * (t.ss2 - d.b * d.b * d.k * (d.k + 1) * (d.k + 1)) * 1.0
                     / (d.b * (t.sq2 - d.b * d.k * (d.k + 1) * (d.k + 1)))
                     > 9.488 THEN 1 ELSE 0 END AS reject_equal_treatments
    FROM per_t p CROSS JOIN dims d CROSS JOIN tot t
    ORDER BY p.event_type
    """,
    doc="Friedman rank test (1937, tie-corrected form) for consistent "
    "differences between event types across daily blocks: each day "
    "ranks its five event-type volumes (doubled midranks stay exact "
    "integers under ties — the q299/q306 idiom), and the tie-corrected "
    "statistic (k-1)(sum S_j^2 - b^2 k(k+1)^2) / (b(sum D^2 - "
    "bk(k+1)^2)) is an exact integer ratio, hash-exact with no float "
    "accumulation. Chi-square critical 9.488 = df 4 at 5%. The "
    "repeated-measures member of the test family: q356's Kruskal-"
    "Wallis compares independent groups, this compares treatments "
    "WITHIN matched blocks, killing day-level volume confounding.",
)
def q388_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one (day, type) count (map-side combinable), a taxonomy-
    bounded spine, per-day windows over k=|event types| rows, then
    5-row algebra. Nothing rescans events after the first aggregate."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(F.col("ts").cast("date").alias("day")).distinct()
    types = ev.select("event_type").distinct()
    counts = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("v"))
    obs = (
        days.crossJoin(F.broadcast(types))
        .join(counts, ["day", "event_type"], "left")
        .select(
            "day", "event_type", F.coalesce("v", F.lit(0)).cast("long").alias("v")
        )
    )
    wd = Window.partitionBy("day").orderBy("v")
    wv = Window.partitionBy("day", "v")
    rk = obs.select(
        "day",
        "event_type",
        (2 * F.rank().over(wd) + F.count(F.lit(1)).over(wv) - 1)
        .cast("long")
        .alias("d2"),
    )
    dims = rk.agg(
        F.countDistinct("day").cast("long").alias("b"),
        F.countDistinct("event_type").cast("long").alias("k"),
    )
    per_t = rk.groupBy("event_type").agg(
        F.sum("d2").cast("long").alias("s2"),
        F.sum(F.col("d2") * F.col("d2")).cast("long").alias("q2"),
    )
    tot = per_t.agg(
        F.sum(F.col("s2") * F.col("s2")).cast("long").alias("ss2"),
        F.sum("q2").cast("long").alias("sq2"),
    )
    j = per_t.crossJoin(F.broadcast(dims)).crossJoin(F.broadcast(tot))
    b, k = F.col("b"), F.col("k")
    # try_divide: fully-tied ranks (e.g. a single day per block) give a
    # zero dispersion denominator -> chi2 undefined
    chi2 = F.try_divide(
        (k - 1) * (F.col("ss2") - b * b * k * (k + 1) * (k + 1)) * 1.0,
        b * (F.col("sq2") - b * k * (k + 1) * (k + 1)),
    )
    return j.select(
        "event_type",
        round_half_up(F.col("s2") / 2.0, 2).alias("rank_sum"),
        round_half_up(F.col("s2") / (2.0 * b), 4).alias("mean_rank"),
        round_half_up(chi2, 6).alias("friedman_chi2"),
        F.when(chi2 > 9.488, 1).otherwise(0).alias("reject_equal_treatments"),
    ).orderBy("event_type")


# ── q389: Wald-Wolfowitz runs test on daily volume ───────────────────────────


@register(
    "q389_runs_test",
    """
    WITH d0 AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM events GROUP BY 1
    ),
    daily AS (
      SELECT d, v, ROW_NUMBER() OVER (ORDER BY d) AS rn,
             COUNT(*) OVER () AS n
      FROM d0
    ),
    med AS (
      SELECT (MAX(CASE WHEN rn = (n + 1) // 2 THEN v END)
              + MAX(CASE WHEN rn = n // 2 + 1 THEN v END)) / 2.0 AS med
      FROM (SELECT v, ROW_NUMBER() OVER (ORDER BY v, d) AS rn,
                   COUNT(*) OVER () AS n
            FROM d0)
    ),
    sgn AS (
      SELECT rn, CASE WHEN v > m.med THEN 1 ELSE 0 END AS s
      FROM daily CROSS JOIN med m
      WHERE v <> m.med
    ),
    seq AS (
      SELECT s, LAG(s) OVER (ORDER BY rn) AS prev FROM sgn
    ),
    agg AS (
      SELECT CAST(SUM(s) AS BIGINT) AS n1,
             CAST(SUM(1 - s) AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN prev IS NULL OR s <> prev THEN 1 ELSE 0 END)
                  AS BIGINT) AS r
      FROM seq
    )
    SELECT n1 AS n_above, n2 AS n_below, r AS n_runs,
           FLOOR((2.0 * n1 * n2 / (n1 + n2) + 1) * 10000 + 0.5) / 10000
             AS expected_runs,
           FLOOR(((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
                  / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                         / ((n1 + n2) * 1.0 * (n1 + n2) * (n1 + n2 - 1)))
                  + 1000) * 1000000 + 0.5) / 1000000 - 1000 AS z_stat,
           CASE WHEN ABS((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
                         / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                                / ((n1 + n2) * 1.0 * (n1 + n2)
                                   * (n1 + n2 - 1)))) > 1.96
                THEN 1 ELSE 0 END AS reject_random
    FROM agg
    """,
    doc="Wald-Wolfowitz runs test (1940) for randomness of daily volume "
    "around its median: days above/below the deterministic mid-pair "
    "median form a binary sequence; too FEW runs means trending/"
    "clustered days, too MANY means oscillation. R, n1, n2 are exact "
    "integers from one LAG pass; the normal approximation z is one "
    "fixed IEEE tree. Complements q314 (autocorrelation measures "
    "LINEAR serial dependence; runs catches any sign-level "
    "structure) and q376's Durbin-Watson on residuals.",
)
def q389_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one per-day count; median, signs and the run count all
    run on the calendar-bounded daily relation."""
    ev = load_table(spark, sf_dir, "events")
    d0 = ev.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("v"))
    wv = Window.orderBy("v", "d")
    ranked = d0.select(
        "v",
        F.row_number().over(wv).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    med = ranked.agg(
        (
            (
                F.max(F.when(F.expr("CAST((n + 1) div 2 AS BIGINT)") == F.col("rn"), F.col("v")))
                + F.max(F.when(F.expr("CAST(n div 2 + 1 AS BIGINT)") == F.col("rn"), F.col("v")))
            )
            / 2.0
        ).alias("med")
    )
    wd = Window.orderBy("rn")
    sgn = (
        d0.select("d", "v", F.row_number().over(Window.orderBy("d")).alias("rn"))
        .crossJoin(F.broadcast(med))
        .filter(F.col("v") != F.col("med"))
        .select("rn", F.when(F.col("v") > F.col("med"), 1).otherwise(0).alias("s"))
    )
    seq = sgn.select("s", F.lag("s").over(wd).alias("prev"))
    agg = seq.agg(
        F.sum("s").cast("long").alias("n1"),
        F.sum(1 - F.col("s")).cast("long").alias("n2"),
        F.sum(
            F.when(F.col("prev").isNull() | (F.col("s") != F.col("prev")), 1).otherwise(0)
        )
        .cast("long")
        .alias("r"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1
    sig = F.sqrt(
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * 1.0 * (n1 + n2) * (n1 + n2 - 1))
    )
    z = (r - mu) / sig

    def signed_round6(col):
        return F.floor((col + 1000) * 1_000_000 + 0.5) / 1_000_000 - 1000

    return agg.select(
        n1.alias("n_above"),
        n2.alias("n_below"),
        r.alias("n_runs"),
        round_half_up(mu, 4).alias("expected_runs"),
        signed_round6(z).alias("z_stat"),
        F.when(F.abs(z) > 1.96, 1).otherwise(0).alias("reject_random"),
    )


# ── q390: lexical-diversity panel per language ───────────────────────────────


@register(
    "q390_lexical_diversity",
    """
    WITH tok AS (
      SELECT lang,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                t -> t <> '')) AS w
      FROM documents
    ),
    tf AS (
      SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY lang, w
    )
    SELECT lang,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           FLOOR(COUNT(*) * 1.0 / SUM(c) * 1000000 + 0.5) / 1000000
             AS type_token_ratio,
           FLOOR(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)
                 * 1000000 + 0.5) / 1000000 AS hapax_ratio,
           FLOOR(10000.0 * (SUM(c * c) - SUM(c))
                 / (CAST(SUM(c) AS DOUBLE) * SUM(c)) * 10000 + 0.5) / 10000
             AS yule_k,
           FLOOR(SUM(c * (c - 1)) * 1.0
                 / (SUM(c) * 1.0 * (SUM(c) - 1)) * 100000000 + 0.5)
             / 100000000 AS simpson_d,
           FLOOR(LN(CAST(COUNT(*) AS DOUBLE)) / LN(CAST(SUM(c) AS DOUBLE))
                 * 1000000 + 0.5) / 1000000 AS herdan_c
    FROM tf GROUP BY lang ORDER BY lang
    """,
    doc="Lexical-diversity panel per language over the token-frequency "
    "relation: type-token ratio, hapax ratio, Yule's K = 1e4 * "
    "(sum c^2 - N)/N^2 (repeat-rate characteristic, length-"
    "invariant), Simpson's D = sum c(c-1)/(N(N-1)) (probability two "
    "random tokens are the same type), and Herdan's C = ln V / ln N "
    "(log-log vocabulary slope). Every statistic is an exact integer "
    "ratio (plus LN on exact integers for Herdan), hash-exact. "
    "Completes the vocabulary family: q251 fits GROWTH, q323 bounds "
    "the ASYMPTOTE, this measures CONCENTRATION — the repetitiveness "
    "signal that, unlike q70's within-doc repetition ratios, is "
    "corpus-level and sample-size-robust.",
)
def q390_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one token explode + one (lang, word) count (map-side
    combinable, vocabulary-bounded), then a |langs|-row rollup over
    the frequency spectrum. The q323 shape exactly."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "lang",
            F.explode(
                F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda t: t != "")
            ).alias("w"),
        )
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    n = F.sum("c").cast("long")
    v = F.count(F.lit(1)).cast("long")
    f1 = F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long")
    s2 = F.sum(F.col("c") * F.col("c")).cast("long")
    rep = F.sum(F.col("c") * (F.col("c") - 1)).cast("long")
    return (
        tf.groupBy("lang")
        .agg(
            n.alias("n_tokens"),
            v.alias("n_types"),
            round_half_up(v * 1.0 / n, 6).alias("type_token_ratio"),
            round_half_up(f1 * 1.0 / v, 6).alias("hapax_ratio"),
            round_half_up(
                10_000.0 * (s2 - n) / (n.cast("double") * n), 4
            ).alias("yule_k"),
            round_half_up(rep * 1.0 / (n * 1.0 * (n - 1)), 8).alias("simpson_d"),
            round_half_up(
                F.log(v.cast("double")) / F.log(n.cast("double")), 6
            ).alias("herdan_c"),
        )
        .orderBy("lang")
    )


# ── q391: cross-document boilerplate (template sentence) detection ───────────

_Q391_MIN_SENT = 20  # chars; shorter fragments are too generic to count
_Q391_DF = 3  # sentence appears in >= DF distinct docs => boilerplate


@register(
    "q391_boilerplate_detection",
    f"""
    WITH sent AS (
      SELECT doc_id, source, trim(s) AS s
      FROM (
        SELECT doc_id, source,
               unnest(string_split_regex(text, '[.!?]')) AS s
        FROM documents
      ) WHERE len(trim(s)) >= {_Q391_MIN_SENT}
    ),
    sdf AS (
      SELECT s, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM sent
      GROUP BY s
    ),
    per_doc AS (
      SELECT t.doc_id, t.source,
             CAST(SUM(len(t.s)) AS BIGINT) AS total_chars,
             CAST(SUM(CASE WHEN d.df >= {_Q391_DF} THEN len(t.s) ELSE 0 END)
                  AS BIGINT) AS boiler_chars
      FROM sent t JOIN sdf d ON d.s = t.s
      GROUP BY t.doc_id, t.source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN boiler_chars > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_boiler,
           CAST(SUM(CASE WHEN 2 * boiler_chars >= total_chars
                         THEN 1 ELSE 0 END) AS BIGINT) AS docs_half_boiler,
           FLOOR(SUM(boiler_chars) * 1.0 / SUM(total_chars) * 1000000 + 0.5)
             / 1000000 AS boiler_char_share
    FROM per_doc
    GROUP BY source ORDER BY source
    """,
    doc="Cross-document boilerplate detection (the C4/RefinedWeb "
    "template-sentence filter): sentences (>= 20 chars, [.!?] split) "
    f"appearing in >= {_Q391_DF} DISTINCT documents are boilerplate; "
    "per source, the share of characters that are boilerplate and the "
    "count of docs that are >= half boilerplate (2*b >= t keeps the "
    "comparison integer). Complements q70 (WITHIN-doc repetition), "
    "q113 (exact duplicate lines) and q220 (duplicated n-grams): "
    "this catches header/footer/disclaimer templates that near-dup "
    "detectors miss because the surrounding text differs. All counts "
    "and shares are exact integer ratios — hash-exact.",
)
def q391_boilerplate_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one sentence explode (map-only), a (sentence -> doc
    frequency) aggregate bounded by DISTINCT sentences (the inverted-
    index shape, q196), one join back on the sentence key, and a
    per-source rollup. No pairwise comparisons anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    sent = (
        docs.select(
            "doc_id",
            "source",
            F.explode(F.split(F.col("text"), "[.!?]")).alias("s0"),
        )
        .select("doc_id", "source", F.trim("s0").alias("s"))
        .filter(F.length("s") >= _Q391_MIN_SENT)
    )
    sdf = sent.groupBy("s").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    per_doc = (
        sent.join(sdf, "s")
        .groupBy("doc_id", "source")
        .agg(
            F.sum(F.length("s")).cast("long").alias("total_chars"),
            F.sum(
                F.when(F.col("df") >= _Q391_DF, F.length("s")).otherwise(0)
            )
            .cast("long")
            .alias("boiler_chars"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("boiler_chars") > 0, 1).otherwise(0))
            .cast("long")
            .alias("docs_with_boiler"),
            F.sum(
                F.when(2 * F.col("boiler_chars") >= F.col("total_chars"), 1).otherwise(0)
            )
            .cast("long")
            .alias("docs_half_boiler"),
            round_half_up(
                F.sum("boiler_chars") * 1.0 / F.sum("total_chars"), 6
            ).alias("boiler_char_share"),
        )
        .orderBy("source")
    )


# ── q392: Weibull fit of repurchase gaps via median-rank regression ──────────

_Q392_SCALE = 10_000  # ln-term quantization (1e-4): products stay < 2^63


def _q392_sql() -> str:
    sc = _Q392_SCALE
    return f"""
    WITH seq AS (
      SELECT o_custkey, o_orderdate,
             LEAD(o_orderdate) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS nxt
      FROM orders
    ),
    gaps AS (
      SELECT CAST(date_diff('day', o_orderdate, nxt) AS BIGINT) AS t
      FROM seq WHERE nxt IS NOT NULL
        AND date_diff('day', o_orderdate, nxt) >= 1
    ),
    ranked AS (
      SELECT t, ROW_NUMBER() OVER (ORDER BY t) AS i, COUNT(*) OVER () AS n
      FROM gaps
    ),
    terms AS (
      SELECT CAST(FLOOR(LN(CAST(t AS DOUBLE)) * {sc} + 0.5) AS BIGINT) AS xq,
             CAST(FLOOR((LN(-LN((n - i + 0.7e0) / (n + 0.4e0))) + 100)
                        * {sc} + 0.5) AS BIGINT) - 100 * {sc} AS yq
      FROM ranked
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xq) AS BIGINT) AS sx,
             CAST(SUM(yq) AS BIGINT) AS sy,
             CAST(SUM(xq * yq) AS BIGINT) AS sxy,
             CAST(SUM(xq * xq) AS BIGINT) AS sxx,
             CAST(SUM(yq * yq) AS BIGINT) AS syy
      FROM terms
    ),
    fit AS (
      SELECT n,
             (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS k,
             (CAST(sy AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sxy)
               / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
               / {sc} AS icpt,
             (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                  * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
               AS r2
      FROM mom
    )
    SELECT n AS n_gaps,
           FLOOR(k * 1000000 + 0.5) / 1000000 AS shape_k,
           FLOOR(EXP(-icpt / k) * 10000 + 0.5) / 10000 AS scale_days,
           FLOOR(r2 * 1000000 + 0.5) / 1000000 AS fit_r2,
           CASE WHEN k < 1 THEN 1 ELSE 0 END AS decreasing_hazard
    FROM fit
    """


@register(
    "q392_weibull_gap_fit",
    _q392_sql(),
    doc="Weibull fit of repurchase gaps by median-rank regression "
    "(Bernard's approximation F_i = (i-0.3)/(n+0.4); the standard "
    "reliability-engineering estimator): regress ln(-ln(1-F_i)) on "
    "ln(t_i); the slope IS the shape k, exp(-intercept/k) the scale. "
    "Each log term is 1e-4-quantized BEFORE the moment sums (the "
    "q353/q386 idiom — float literals forced to DOUBLE with e0 "
    "notation), so the whole fit is hash-exact. shape < 1 means "
    "decreasing hazard (long-idle customers keep idling); the "
    "PARAMETRIC summary of the q304 Kaplan-Meier curve, giving the "
    "two-number generative model a synthetic-data pipeline would "
    "sample gaps from.",
)
def q392_weibull_gap_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one LEAD window per customer; the global rank window is
    the q366/q378 documented bounded shape (at true scale a
    deterministic sample of gaps replaces it); moments are map-side
    combinable integer sums."""
    sc = _Q392_SCALE
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.withColumn("nxt", F.lead("o_orderdate").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(F.datediff("nxt", "o_orderdate").cast("long").alias("t"))
        .filter(F.col("t") >= 1)
    )
    ranked = gaps.select(
        "t",
        F.row_number().over(Window.orderBy("t")).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    terms = ranked.select(
        F.floor(F.log(F.col("t").cast("double")) * sc + 0.5)
        .cast("long")
        .alias("xq"),
        (
            F.floor(
                (
                    F.log(-F.log((F.col("n") - F.col("i") + 0.7) / (F.col("n") + 0.4)))
                    + 100
                )
                * sc
                + 0.5
            ).cast("long")
            - 100 * sc
        ).alias("yq"),
    )
    mom = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xq").cast("long").alias("sx"),
        F.sum("yq").cast("long").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).cast("long").alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).cast("long").alias("sxx"),
        F.sum(F.col("yq") * F.col("yq")).cast("long").alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    num = n * F.col("sxy") - sx * F.col("sy")
    den = n * F.col("sxx") - sx * F.col("sx")
    k = num / den
    icpt = (sy * F.col("sxx") - sx * F.col("sxy")) / den / sc
    r2 = num * num / (den * (n * F.col("syy") - sy * F.col("sy")))
    return mom.select(
        F.col("n").alias("n_gaps"),
        round_half_up(k, 6).alias("shape_k"),
        round_half_up(F.exp(-icpt / k), 4).alias("scale_days"),
        round_half_up(r2, 6).alias("fit_r2"),
        F.when(k < 1, 1).otherwise(0).alias("decreasing_hazard"),
    )


# ── q393: degree assortativity of the customer-part graph ────────────────────


@register(
    "q393_degree_assortativity",
    """
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS hub, l.l_partkey AS auth
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    hd AS (SELECT hub, CAST(COUNT(*) AS BIGINT) AS dh FROM e GROUP BY hub),
    ad AS (SELECT auth, CAST(COUNT(*) AS BIGINT) AS da FROM e GROUP BY auth),
    ed AS (
      SELECT h.dh AS x, a.da AS y
      FROM e JOIN hd h ON h.hub = e.hub JOIN ad a ON a.auth = e.auth
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM ed
    )
    SELECT n AS n_edges,
           FLOOR(sx * 1.0 / n * 10000 + 0.5) / 10000 AS avg_customer_degree,
           FLOOR(sy * 1.0 / n * 10000 + 0.5) / 10000 AS avg_part_degree,
           FLOOR(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                  / SQRT((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                         * (CAST(n AS DOUBLE) * syy
                            - CAST(sy AS DOUBLE) * sy)) + 1000)
                 * 1000000 + 0.5) / 1000000 - 1000 AS assortativity_r,
           CASE WHEN (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) < 0
                THEN 1 ELSE 0 END AS disassortative
    FROM mom
    """,
    doc="Degree assortativity (Newman 2002) of the customer-part "
    "purchase graph: the Pearson correlation, over EDGES, between the "
    "customer endpoint's degree and the part endpoint's degree — "
    "positive means heavy buyers concentrate on popular parts, "
    "negative (disassortative, the typical retail shape) means heavy "
    "buyers reach into the long tail. All five moments are exact "
    "integer sums over the distinct-edge relation (degrees are "
    "BIGINTs), the correlation one fixed IEEE tree — hash-exact. "
    "Structural context for q368's HITS and q382's k-core: "
    "assortativity says whether the dense core those find is "
    "hub-hub-connected or hub-periphery.",
)
def q393_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: distinct-edge relation, two degree aggregates, two
    equi-joins back, one 6-number moment rollup (map-side
    combinable). Degree relations broadcast when small."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("hub"), F.col("l_partkey").alias("auth"))
        .distinct()
    )
    hd = e.groupBy("hub").agg(F.count(F.lit(1)).cast("long").alias("dh"))
    ad = e.groupBy("auth").agg(F.count(F.lit(1)).cast("long").alias("da"))
    ed = e.join(hd, "hub").join(ad, "auth").select(
        F.col("dh").alias("x"), F.col("da").alias("y")
    )
    mom = ed.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    num = n * F.col("sxy") - sx * F.col("sy")
    r = num / F.sqrt(
        (n * F.col("sxx") - sx * F.col("sx")) * (n * F.col("syy") - sy * F.col("sy"))
    )

    def signed_round6(col):
        return F.floor((col + 1000) * 1_000_000 + 0.5) / 1_000_000 - 1000

    return mom.select(
        F.col("n").alias("n_edges"),
        round_half_up(F.col("sx") * 1.0 / F.col("n"), 4).alias(
            "avg_customer_degree"
        ),
        round_half_up(F.col("sy") * 1.0 / F.col("n"), 4).alias("avg_part_degree"),
        signed_round6(r).alias("assortativity_r"),
        F.when(num < 0, 1).otherwise(0).alias("disassortative"),
    )


# ── q394: label-propagation communities on the purchase graph ────────────────

_Q394_ROUNDS = 5
_Q394_TOPK = 15
# q368's driver-side bound (see training2._Q368_DRIVER_EDGE_BOUND);
# module-level so tests can force the distributed path.
_Q394_DRIVER_EDGE_BOUND = 4_000_000


def _q394_sql() -> str:
    head = """
    WITH e AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey AS hub, l.l_partkey AS auth
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    h0 AS MATERIALIZED (
      SELECT DISTINCT hub, CAST(hub AS BIGINT) AS lbl FROM e
    )"""
    steps = []
    for k in range(1, _Q394_ROUNDS + 1):
        steps.append(f"""
    a{k} AS MATERIALIZED (
      SELECT auth, lbl FROM (
        SELECT e.auth, h.lbl,
               ROW_NUMBER() OVER (PARTITION BY e.auth
                 ORDER BY COUNT(*) DESC, h.lbl) AS rk
        FROM e JOIN h{k - 1} h ON h.hub = e.hub
        GROUP BY e.auth, h.lbl
      ) WHERE rk = 1
    ),
    h{k} AS MATERIALIZED (
      SELECT hub, lbl FROM (
        SELECT e.hub, a.lbl,
               ROW_NUMBER() OVER (PARTITION BY e.hub
                 ORDER BY COUNT(*) DESC, a.lbl) AS rk
        FROM e JOIN a{k} a ON a.auth = e.auth
        GROUP BY e.hub, a.lbl
      ) WHERE rk = 1
    )""")
    last = _Q394_ROUNDS
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT rank, community, n_customers, n_parts FROM (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY nc + np DESC, lbl) AS BIGINT)
               AS rank,
             CAST(lbl AS BIGINT) AS community,
             CAST(nc AS BIGINT) AS n_customers,
             CAST(np AS BIGINT) AS n_parts
      FROM (
        SELECT lbl, CAST(SUM(is_c) AS BIGINT) AS nc,
               CAST(SUM(is_p) AS BIGINT) AS np
        FROM (
          SELECT lbl, 1 AS is_c, 0 AS is_p FROM h{last}
          UNION ALL
          SELECT lbl, 0 AS is_c, 1 AS is_p FROM a{last}
        ) GROUP BY lbl
      )
    ) WHERE rank <= {_Q394_TOPK}
    ORDER BY rank
    """
    )


@register(
    "q394_label_propagation",
    _q394_sql(),
    doc="Label-propagation community detection (Raghavan et al. 2007) "
    "on the customer-part purchase graph, in the SEMI-SYNCHRONOUS "
    "bipartite schedule: parts adopt the modal label of their buyers, "
    "then customers adopt the modal label of their parts — the "
    "alternating half-steps that kill the 2-cycle oscillation "
    "synchronous LPA exhibits on bipartite graphs. Ties break to the "
    "smallest label, so every round is a deterministic integer "
    "argmax (count desc, label asc) and the whole clustering is "
    "hash-exact with no randomness. Top-15 communities by size. The "
    "communities complement q203's k-means (feature-space) and q68's "
    "connected components (near-dup pairs): LPA finds BEHAVIORAL "
    "market segments from co-purchase structure alone.",
)
def q394_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: each half-step is one equi-join + count + per-node argmax
    over the distinct-edge relation, localCheckpoint'ed so the
    unrolled plan stays linear (q368 discipline)."""
    from pyspark import StorageLevel

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("hub"), F.col("l_partkey").alias("auth"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Broadcast the node-label side of each half-step join while it
    # provably fits (<= distinct hubs/auths <= n_edges rows of two longs;
    # the q368 guard and rationale): the 20 half-step joins then never
    # shuffle the edge relation. Bigger graphs keep the partitioned path.
    n_edges = e.count()
    # Driver-side fixed point below the SAME 4M-edge bound that gates the
    # broadcast variant (r11; guide §8 — q398/union-find precedent): the
    # r10 scaling block measured 8 cores FASTER than 32 here (ratio
    # 0.84), i.e. the 20 half-step join+argmax+checkpoint jobs are
    # job-scheduling overhead, not data work, once the DISTINCT edge
    # relation fits one broadcast-sized buffer. Modal-label argmax
    # (count desc, label asc) is pure integer algebra, so the driver
    # replay is bit-identical; every output column is an exact integer.
    # Bigger graphs keep the distributed loop — the 100 TB path.
    if 0 < n_edges <= _Q394_DRIVER_EDGE_BOUND:
        import numpy as np

        pdf = e.toPandas()
        hub_ids, hub_idx = np.unique(
            pdf["hub"].to_numpy(np.int64), return_inverse=True
        )
        auth_ids, auth_idx = np.unique(
            pdf["auth"].to_numpy(np.int64), return_inverse=True
        )
        # label universe = initial hub labels (labels only ever copy);
        # lbl_pos is ascending in label VALUE, so index order == the
        # (count desc, label asc) tie-break order on values
        lbls = hub_ids  # sorted ascending
        nl = len(lbls)
        h_lbl = np.arange(len(hub_ids), dtype=np.int64)  # position in lbls
        a_lbl = np.zeros(len(auth_ids), dtype=np.int64)

        def _modal(node_idx: np.ndarray, lbl_pos: np.ndarray, n_nodes: int) -> np.ndarray:
            # counts of (node, label) pairs, then per-node argmax with
            # (count desc, label-position asc) — label positions sort
            # identically to label values
            keys, cnts = np.unique(node_idx * nl + lbl_pos, return_counts=True)
            nodes = keys // nl
            labs = keys % nl
            # lexsort: last key is primary — sort by (node asc, cnt desc,
            # lab asc); first row per node is the modal label
            order = np.lexsort((labs, -cnts, nodes))
            nodes_s = nodes[order]
            first = np.ones(len(nodes_s), dtype=bool)
            first[1:] = nodes_s[1:] != nodes_s[:-1]
            out = np.zeros(n_nodes, dtype=np.int64)
            out[nodes_s[first]] = labs[order][first]
            return out

        for _ in range(_Q394_ROUNDS):
            a_lbl = _modal(auth_idx, h_lbl[hub_idx], len(auth_ids))
            h_lbl = _modal(hub_idx, a_lbl[auth_idx], len(hub_ids))
        nc = np.bincount(h_lbl, minlength=nl)
        np_ = np.bincount(a_lbl, minlength=nl)
        tot = nc + np_
        live = np.nonzero(tot)[0]
        ranked = sorted(
            ((int(lbls[i]), int(nc[i]), int(np_[i])) for i in live),
            key=lambda t: (-(t[1] + t[2]), t[0]),
        )[:_Q394_TOPK]
        rows = [
            (rk + 1, lbl, c, p) for rk, (lbl, c, p) in enumerate(ranked)
        ]
        e.unpersist()
        return spark.createDataFrame(
            rows, "rank long, community long, n_customers long, n_parts long"
        ).orderBy("rank")
    bcast = F.broadcast if n_edges <= 4_000_000 else (lambda df: df)
    h = e.select("hub").distinct().select("hub", F.col("hub").cast("long").alias("lbl"))
    a = None
    # Per-node argmax (max count, ties to the smallest label) as a
    # struct-max AGGREGATE instead of row_number over a window: labels
    # are nonnegative longs, so max(struct(cnt, -lbl)) picks exactly the
    # (desc cnt, asc lbl) head — one partially-aggregatable pass, no
    # per-partition sort, and the second exchange carries one row per
    # (node, label) survivor instead of the whole counted relation
    # (guide §2.3: aggregate before you shuffle).
    def _argmax(counted: DataFrame, node: str) -> DataFrame:
        return (
            counted.groupBy(node)
            .agg(
                F.max(
                    F.struct(F.col("cnt"), (-F.col("lbl")).alias("nl"))
                ).alias("m")
            )
            .select(node, (-F.col("m.nl")).alias("lbl"))
        )

    for _ in range(_Q394_ROUNDS):
        a = _argmax(
            e.join(bcast(h), "hub")
            .groupBy("auth", "lbl")
            .agg(F.count(F.lit(1)).alias("cnt")),
            "auth",
        ).localCheckpoint(eager=True)
        h = _argmax(
            e.join(bcast(a), "auth")
            .groupBy("hub", "lbl")
            .agg(F.count(F.lit(1)).alias("cnt")),
            "hub",
        ).localCheckpoint(eager=True)
    sizes = (
        h.select("lbl", F.lit(1).alias("is_c"), F.lit(0).alias("is_p"))
        .unionByName(a.select("lbl", F.lit(0).alias("is_c"), F.lit(1).alias("is_p")))
        .groupBy("lbl")
        .agg(
            F.sum("is_c").cast("long").alias("nc"),
            F.sum("is_p").cast("long").alias("np"),
        )
    )
    wr = Window.orderBy(F.desc(F.col("nc") + F.col("np")), "lbl")
    out = (
        sizes.select(
            F.row_number().over(wr).cast("long").alias("rank"),
            F.col("lbl").cast("long").alias("community"),
            F.col("nc").alias("n_customers"),
            F.col("np").alias("n_parts"),
        )
        .filter(F.col("rank") <= _Q394_TOPK)
        .orderBy("rank")
        .localCheckpoint(eager=True)
    )
    e.unpersist()
    return out


# ── q395: Croston intermittent-demand forecast for the hottest part ──────────

_Q395_SCALE = 1_000_000


def _q395_sql() -> str:
    sc = _Q395_SCALE
    return f"""
    WITH RECURSIVE pick AS (
      SELECT l_partkey FROM lineitem GROUP BY l_partkey
      ORDER BY COUNT(*) DESC, l_partkey LIMIT 1
    ),
    d0 AS (
      SELECT CAST(CAST(l_shipdate AS DATE) - DATE '1992-01-01' AS BIGINT)
               AS d,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem JOIN pick USING (l_partkey)
      GROUP BY 1
    ),
    occ AS (
      SELECT d, q, ROW_NUMBER() OVER (ORDER BY d) AS rn,
             d - COALESCE(LAG(d) OVER (ORDER BY d), d) AS gap
      FROM d0
    ),
    span AS (SELECT MAX(d) - MIN(d) + 1 AS n_days,
                    CAST(COUNT(*) AS BIGINT) AS n_occ FROM occ),
    cro AS (
      SELECT CAST(1 AS BIGINT) AS rn,
             q * {sc} AS z, CAST({sc} AS BIGINT) AS p
      FROM occ WHERE rn = 1
      UNION ALL
      SELECT o.rn,
             (o.q * {sc} + c.z) // 2 AS z,
             (o.gap * {sc} + c.p) // 2 AS p
      FROM cro c JOIN occ o ON o.rn = c.rn + 1
    ),
    last AS (
      SELECT z, p FROM cro ORDER BY rn DESC LIMIT 1
    )
    SELECT s.n_days, s.n_occ,
           FLOOR(s.n_occ * 1.0 / s.n_days * 1000000 + 0.5) / 1000000
             AS demand_rate,
           FLOOR(l.z / {sc}.0 * 10000 + 0.5) / 10000 AS smoothed_size,
           FLOOR(l.p / {sc}.0 * 10000 + 0.5) / 10000 AS smoothed_interval,
           FLOOR(CAST(l.z AS DOUBLE) / l.p * 10000 + 0.5) / 10000
             AS croston_forecast,
           FLOOR(CAST(l.z AS DOUBLE) / l.p * 0.75e0 * 10000 + 0.5) / 10000
             AS sba_forecast
    FROM last l CROSS JOIN span s
    """


@register(
    "q395_croston_intermittent",
    _q395_sql(),
    doc="Croston's method (1972) with the Syntetos-Boylan approximation "
    "for intermittent demand, on the busiest part's daily ship "
    "quantities (deterministic pick: max lineitem count, ties to the "
    "smallest partkey): separate exponential smoothing (alpha = 1/2) "
    "of nonzero demand SIZES and of inter-demand INTERVALS, forecast "
    "= z/p and the bias-corrected SBA (1 - alpha/2) * z/p. The "
    "recurrence runs in exact fixed-point integer arithmetic "
    "(truncating // — the q351 discipline), replayed by a recursive "
    "CTE. Croston is THE standard for sparse series where q351/q380's "
    "level smoothing decays toward zero between demands and "
    "overforecasts right after one.",
)
def q395_croston_intermittent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one per-part count picks the series (map-side
    combinable), one filtered per-day aggregate; the recurrence is
    occurrence-bounded and runs driver-side (bounded-collect pattern,
    q350/q351) in integer arithmetic matching BIGINT //."""
    sc = _Q395_SCALE
    li = load_table(spark, sf_dir, "lineitem")
    pick = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "l_partkey")
        .limit(1)
        .select("l_partkey")
    )
    d0 = (
        li.join(F.broadcast(pick), "l_partkey")
        .groupBy(
            F.datediff(
                F.col("l_shipdate").cast("date"), F.lit("1992-01-01").cast("date")
            )
            .cast("long")
            .alias("d")
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"))
        .orderBy("d")
        .collect()
    )
    days = [(r["d"], r["q"]) for r in d0]
    if not days:
        return spark.createDataFrame(
            [],
            "n_days long, n_occ long, demand_rate double, smoothed_size double, "
            "smoothed_interval double, croston_forecast double, sba_forecast double",
        )
    n_days = days[-1][0] - days[0][0] + 1
    n_occ = len(days)
    z = days[0][1] * sc
    p = sc
    prev_d = days[0][0]
    for d, q in days[1:]:
        gap = d - prev_d
        prev_d = d
        z = (q * sc + z) // 2  # nonneg: plain // matches BIGINT //
        p = (gap * sc + p) // 2
    out = spark.createDataFrame(
        [(n_days, n_occ, z, p)], "n_days long, n_occ long, z long, p long"
    )
    fsc = float(sc)
    fc = F.col("z").cast("double") / F.col("p")
    return out.select(
        "n_days",
        "n_occ",
        round_half_up(F.col("n_occ") * 1.0 / F.col("n_days"), 6).alias(
            "demand_rate"
        ),
        round_half_up(F.col("z") / fsc, 4).alias("smoothed_size"),
        round_half_up(F.col("p") / fsc, 4).alias("smoothed_interval"),
        round_half_up(fc, 4).alias("croston_forecast"),
        round_half_up(fc * 0.75, 4).alias("sba_forecast"),
    )


# ── q396: sort-key data-skipping planner over zone maps ──────────────────────

_Q396_CHUNKS = 256
_Q396_CANDIDATES = ("l_partkey", "l_suppkey", "l_shipdate", "l_quantity")


def _q396_sql() -> str:
    legs = []
    for c in _Q396_CANDIDATES:
        legs.append(f"""
      SELECT '{c}' AS sort_key, chunk,
             CAST(MIN(l_partkey) AS BIGINT) AS lo,
             CAST(MAX(l_partkey) AS BIGINT) AS hi
      FROM (
        SELECT l_partkey,
               NTILE({_Q396_CHUNKS}) OVER (ORDER BY {c}, l_orderkey,
                                           l_linenumber) AS chunk
        FROM lineitem
      ) GROUP BY chunk""")
    return f"""
    WITH keys AS MATERIALIZED (
      SELECT DISTINCT l_partkey AS k FROM lineitem
    ),
    nk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM keys),
    zones AS MATERIALIZED ({" UNION ALL ".join(legs)}),
    hits AS (
      SELECT z.sort_key,
             CAST(COUNT(*) AS BIGINT) AS chunk_key_pairs
      FROM zones z JOIN keys ON keys.k BETWEEN z.lo AND z.hi
      GROUP BY z.sort_key
    )
    SELECT h.sort_key,
           FLOOR(h.chunk_key_pairs * 1.0 / nk.n * 10000 + 0.5) / 10000
             AS avg_chunks_scanned,
           FLOOR((1 - h.chunk_key_pairs * 1.0 / nk.n / {_Q396_CHUNKS})
                 * 1000000 + 0.5) / 1000000 AS skip_ratio,
           CAST(ROW_NUMBER() OVER (ORDER BY h.chunk_key_pairs, h.sort_key)
                AS BIGINT) AS rank
    FROM hits h CROSS JOIN nk
    ORDER BY rank, sort_key
    """


# distributed-sort width FLOOR: the effective width follows the
# session's parallelism (a 1000-executor cluster gets its core count,
# not a laptop constant), and the rank-offset arithmetic is exact at
# any width. The collect stays bounded: <= 4 * width count rows.
_Q396_RANGE_PARTS = 32


def _q396_zone_maps(li: DataFrame) -> DataFrame:
    """Exact zone maps for lineitem under ALL candidate sort layouts
    WITHOUT a single-partition total sort (VERDICT r7 item 2), in ONE
    shuffle: explode each row into (candidate, sort-value) legs — a
    COMPOSITE (vlong, vdbl) sort value: integral candidates (keys,
    epoch days) ride the long leg at full 64-bit precision (ADVICE r8:
    a lone double cast silently reorders integers >= 2^53) with the
    double leg pinned to 0.0, and double candidates (quantity) ride the
    double leg with the long leg pinned to 0 — then repartitionByRange
    on (cand, vlong, vdbl, l_orderkey, l_linenumber). The tuple is
    unique per candidate ((l_orderkey, l_linenumber) is the PK), so
    range partitions are contiguous with no boundary ties;
    spark_partition_id() frozen by localCheckpoint identifies each
    range, per-(cand, pid) counts (a bounded <=4*RANGE_PARTS collect)
    give exact global-rank offsets, and a (cand, pid)-PARTITIONED
    row_number plus the offset reproduces each candidate's global
    rank — the NTILE chunk id is computed exactly while every
    sort/window task holds only ~4N/RANGE_PARTS rows, never the whole
    table."""
    spark = li.sparkSession
    legs = []
    for c in _Q396_CANDIDATES:
        if c == "l_shipdate":
            vlong = F.datediff(F.col(c), F.lit("1970-01-01")).cast("long")
            vdbl = F.lit(0.0)
        elif dict(li.dtypes)[c] in ("double", "float"):
            vlong = F.lit(0).cast("long")
            vdbl = F.col(c).cast("double")
        else:
            vlong = F.col(c).cast("long")
            vdbl = F.lit(0.0)
        legs.append(
            F.struct(
                F.lit(c).alias("cand"),
                vlong.alias("vlong"),
                vdbl.alias("vdbl"),
            )
        )
    part = (
        li.select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            F.explode(F.array(*legs)).alias("cv"),
        )
        .select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            "cv.cand",
            "cv.vlong",
            "cv.vdbl",
        )
        .repartitionByRange(
            max(_Q396_RANGE_PARTS, spark.sparkContext.defaultParallelism),
            F.col("cand"),
            F.col("vlong"),
            F.col("vdbl"),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        )
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        (r["cand"], r["pid"]): r["cnt"]
        for r in part.groupBy("cand", "pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }  # bounded: <= candidates * RANGE_PARTS rows
    n = sum(v for (c, _), v in counts.items() if c == _Q396_CANDIDATES[0])
    off_rows, run = [], {c: 0 for c in _Q396_CANDIDATES}
    for cand, pid in sorted(counts):
        off_rows.append((cand, pid, run[cand]))
        run[cand] += counts[(cand, pid)]
    off_df = spark.createDataFrame(off_rows, "cand string, pid int, off long")
    w = Window.partitionBy("cand", "pid").orderBy(
        "vlong", "vdbl", "l_orderkey", "l_linenumber"
    )
    rank = (F.row_number().over(w) + F.col("off")).alias("rank")
    # exact NTILE(b) of the global rank: first (n % b) chunks hold
    # ceil(n/b) rows, the rest floor(n/b) (matches DuckDB/ANSI NTILE);
    # n is identical across candidates (each is a full copy of lineitem)
    q, r = divmod(n, _Q396_CHUNKS) if n else (0, 0)
    if q == 0:  # fewer rows than chunks: one row per chunk
        chunk = F.col("rank")
    else:
        cut = r * (q + 1)
        chunk = F.when(
            F.col("rank") <= cut, F.floor((F.col("rank") - 1) / (q + 1)) + 1
        ).otherwise(r + F.floor((F.col("rank") - cut - 1) / q) + 1)
    return (
        part.join(F.broadcast(off_df), ["cand", "pid"])
        .select("cand", "l_partkey", rank)
        .select("cand", "l_partkey", chunk.cast("long").alias("chunk"))
        .groupBy("cand", "chunk")
        .agg(
            F.min("l_partkey").cast("long").alias("lo"),
            F.max("l_partkey").cast("long").alias("hi"),
        )
        .select(F.col("cand").alias("sort_key"), "chunk", "lo", "hi")
    )


@register(
    "q396_sort_key_plan",
    _q396_sql(),
    doc=f"Sort-key data-skipping planner: for each candidate layout "
    f"(lineitem sorted by one of {', '.join(_Q396_CANDIDATES)}, "
    f"deterministic tie-break), split into {_Q396_CHUNKS} equal chunks, "
    "take min/max zone maps on l_partkey, and price a point-lookup "
    "workload EXACTLY: avg chunks a random existing partkey cannot "
    "skip = (zone-range/key containment pairs) / |distinct keys|. "
    "Sorting BY l_partkey gives ~1 chunk per lookup; unrelated keys "
    "leave every chunk's range covering everything. Extends the "
    "planner family (q321 partitions, q322 filter order, q337 "
    "z-order vs insert order) with the which-column-to-ORDER-BY "
    "decision, priced from the same zone-map statistics a lakehouse "
    "OPTIMIZE would produce. Exact integer containment counts — "
    "hash-exact.",
)
def q396_sort_key_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: in production the zone maps come free from parquet
    footers; here ALL candidate sorts run DISTRIBUTED in one shuffle
    (exploded legs + repartitionByRange + per-range row_number — see
    _q396_zone_maps; no task ever holds more than ~4N/RANGE_PARTS
    rows) and the containment count is a broadcast range join of
    O(chunks) ranges against the distinct-key relation, never
    row-level data."""
    li = load_table(spark, sf_dir, "lineitem")
    keys = li.select(F.col("l_partkey").alias("k")).distinct().localCheckpoint(
        eager=True
    )
    nk = keys.agg(F.count(F.lit(1)).cast("long").alias("n"))
    zones = _q396_zone_maps(li)
    hits = (
        keys.join(
            F.broadcast(zones),
            (F.col("k") >= F.col("lo")) & (F.col("k") <= F.col("hi")),
        )
        .groupBy("sort_key")
        .agg(F.count(F.lit(1)).cast("long").alias("chunk_key_pairs"))
    )
    wr = Window.orderBy("chunk_key_pairs", "sort_key")
    return (
        hits.crossJoin(F.broadcast(nk))
        .select(
            "sort_key",
            round_half_up(
                F.col("chunk_key_pairs") * 1.0 / F.col("n"), 4
            ).alias("avg_chunks_scanned"),
            round_half_up(
                1 - F.col("chunk_key_pairs") * 1.0 / F.col("n") / _Q396_CHUNKS, 6
            ).alias("skip_ratio"),
            F.row_number().over(wr).cast("long").alias("rank"),
        )
        .orderBy("rank", "sort_key")
    )


# ── q397: rolling one-step forecast backtest (naive/seasonal/Holt/HW) ────────

_Q397_SC = 1_000_000


def _q397_sql() -> str:
    sc = _Q397_SC
    m = _Q380_M
    sprev = (
        "CASE ((d.rn - 1) % 7) + 1 "
        + " ".join(f"WHEN {j} THEN h.s{j}" for j in range(1, m + 1))
        + " END"
    )
    nl = f"(d.v * {sc} - ({sprev}) + h.l + h.b) // 2"
    nb = f"(({nl}) - h.l + h.b) // 2"
    ns = f"(d.v * {sc} - ({nl}) + ({sprev})) // 2"
    supd = ", ".join(
        f"CAST(CASE WHEN ((d.rn - 1) % 7) + 1 = {j} THEN {ns} "
        f"ELSE h.s{j} END AS BIGINT) AS s{j}"
        for j in range(1, m + 1)
    )
    sinit = ", ".join(
        f"CAST((SELECT v FROM daily WHERE rn = {j}) * {sc} "
        f"- (SELECT l0 FROM init) AS BIGINT) AS s{j}"
        for j in range(1, m + 1)
    )
    ec = "FLOOR(({expr} + 1000000) * 100 + 0.5) - 100000000"
    return f"""
    WITH RECURSIVE d0 AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM events GROUP BY 1
    ),
    daily AS (SELECT d, v, ROW_NUMBER() OVER (ORDER BY d) AS rn FROM d0),
    init AS (
      SELECT CAST(SUM(v) * {sc} // {m} AS BIGINT) AS l0
      FROM daily WHERE rn <= {m}
    ),
    ho AS (
      SELECT CAST(2 AS BIGINT) AS rn,
             CAST((SELECT v FROM daily WHERE rn = 2) * {sc} AS BIGINT) AS l,
             CAST(((SELECT v FROM daily WHERE rn = 2)
                   - (SELECT v FROM daily WHERE rn = 1)) * {sc} AS BIGINT)
               AS b
      UNION ALL
      SELECT d.rn,
             CAST((d.v * {sc} + h.l + h.b) // 2 AS BIGINT) AS l,
             CAST((((d.v * {sc} + h.l + h.b) // 2) - h.l + h.b) // 2
                  AS BIGINT) AS b
      FROM ho h JOIN daily d ON d.rn = h.rn + 1
    ),
    hw AS (
      SELECT CAST({m} AS BIGINT) AS rn,
             CAST(i.l0 AS BIGINT) AS l, CAST(0 AS BIGINT) AS b,
             CAST(0 AS BIGINT) AS fq, {sinit}
      FROM init i
      UNION ALL
      SELECT d.rn,
             CAST({nl} AS BIGINT) AS l,
             CAST({nb} AS BIGINT) AS b,
             CAST(h.l + h.b + ({sprev}) AS BIGINT) AS fq,
             {supd}
      FROM hw h JOIN daily d ON d.rn = h.rn + 1
    ),
    errs AS (
      SELECT 'naive1' AS model,
             CAST({ec.format(expr="d.v - p.v")} AS BIGINT) AS ec
      FROM daily d JOIN daily p ON p.rn = d.rn - 1 WHERE d.rn > {m}
      UNION ALL
      SELECT 'snaive7' AS model,
             CAST({ec.format(expr="d.v - p.v")} AS BIGINT) AS ec
      FROM daily d JOIN daily p ON p.rn = d.rn - 7 WHERE d.rn > {m}
      UNION ALL
      SELECT 'holt' AS model,
             CAST({ec.format(expr=f"d.v - (h.l + h.b) / {sc}.0")} AS BIGINT)
               AS ec
      FROM daily d JOIN ho h ON h.rn = d.rn - 1 WHERE d.rn > {m}
      UNION ALL
      SELECT 'holt_winters' AS model,
             CAST({ec.format(expr=f"d.v - h.fq / {sc}.0")} AS BIGINT) AS ec
      FROM daily d JOIN hw h ON h.rn = d.rn WHERE d.rn > {m}
    ),
    agg AS (
      SELECT model, CAST(COUNT(*) AS BIGINT) AS n_eval,
             CAST(SUM(ABS(ec)) AS BIGINT) AS sae,
             CAST(SUM(ec * ec) AS BIGINT) AS sse
      FROM errs GROUP BY model
    )
    SELECT model, n_eval,
           FLOOR(sae / 100.0 / n_eval * 10000 + 0.5) / 10000 AS mae,
           FLOOR(SQRT(sse / 10000.0 / n_eval) * 10000 + 0.5) / 10000 AS rmse,
           CAST(ROW_NUMBER() OVER (ORDER BY sse * 1.0 / n_eval, model)
                AS BIGINT) AS rank
    FROM agg ORDER BY rank
    """


@register(
    "q397_forecast_backtest",
    _q397_sql(),
    doc="Rolling-origin one-step backtest of four volume forecasters on "
    "the SAME evaluation days (every day after the first week): "
    "naive-1 (yesterday), seasonal-naive-7 (same weekday last week), "
    "Holt linear (q351's recurrence) and Holt-Winters (q380's). The "
    "one-step-ahead errors ARE each recurrence's fitted residuals, so "
    "the whole model-selection readout inherits their exact "
    "fixed-point replay; per-day errors are centi-quantized integers, "
    "MAE/RMSE exact ratios, ranking by integer SSE. This is the "
    "empirical answer to 'which forecaster do we ship' that q272/"
    "q351/q380 individually cannot give — and the honest guard "
    "against Holt-Winters overfitting a weak seasonality (q317).",
)
def q397_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one per-day count; recurrences and the error table are
    calendar-bounded and run driver-side (bounded-collect, q350/q351);
    output algebra mirrors the oracle's pins."""
    sc = _Q397_SC
    m = _Q380_M
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            .cast("long")
            .alias("d")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
        .orderBy("d")
        .collect()
    )
    vols = [r["v"] for r in daily]
    if len(vols) <= m:
        return spark.createDataFrame(
            [], "model string, n_eval long, mae double, rmse double, rank long"
        )

    def tdiv2(a: int) -> int:
        return -((-a) // 2) if a < 0 else a // 2

    # Holt states indexed by rn (state AFTER seeing day rn)
    ho = {2: (vols[1] * sc, (vols[1] - vols[0]) * sc)}
    for rn in range(3, len(vols) + 1):
        lp, bp = ho[rn - 1]
        l = tdiv2(vols[rn - 1] * sc + lp + bp)
        ho[rn] = (l, tdiv2(l - lp + bp))
    # Holt-Winters fitted values (q380 recurrence)
    l = sum(vols[:m]) * sc // m
    b = 0
    s = [v * sc - l for v in vols[:m]]
    hw_f = {}
    for rn in range(m + 1, len(vols) + 1):
        v = vols[rn - 1]
        idx = (rn - 1) % m
        sprev, lp, bp = s[idx], l, b
        hw_f[rn] = lp + bp + sprev
        l = tdiv2(v * sc - sprev + lp + bp)
        b = tdiv2(l - lp + bp)
        s[idx] = tdiv2(v * sc - l + sprev)

    def ecq(expr: float) -> int:
        return math.floor((expr + 1_000_000) * 100 + 0.5) - 100_000_000

    rows = []
    for rn in range(m + 1, len(vols) + 1):
        v = vols[rn - 1]
        rows.append(("naive1", ecq(v - vols[rn - 2])))
        rows.append(("snaive7", ecq(v - vols[rn - 8])))
        hl, hb = ho[rn - 1]
        rows.append(("holt", ecq(v - (hl + hb) / float(sc))))
        rows.append(("holt_winters", ecq(v - hw_f[rn] / float(sc))))
    errs = spark.createDataFrame(rows, "model string, ec long")
    agg = errs.groupBy("model").agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.sum(F.abs("ec")).cast("long").alias("sae"),
        F.sum(F.col("ec") * F.col("ec")).cast("long").alias("sse"),
    )
    wr = Window.orderBy(F.col("sse") * 1.0 / F.col("n_eval"), "model")
    return agg.select(
        "model",
        "n_eval",
        round_half_up(F.col("sae") / 100.0 / F.col("n_eval"), 4).alias("mae"),
        round_half_up(F.sqrt(F.col("sse") / 10_000.0 / F.col("n_eval")), 4).alias(
            "rmse"
        ),
        F.row_number().over(wr).cast("long").alias("rank"),
    ).orderBy("rank")


# ── q398: exact fixed-point PageRank (graduates q123's flaky float) ──────────

_Q398_ITERS = 10
_Q398_SCALE = 1_000_000_000  # nano-units: 5-node taxonomy needs headroom


def _q398_sql() -> str:
    sc = _Q398_SCALE
    head = f"""
    WITH ord AS (
      SELECT user_id, event_type AS cur,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    edges AS MATERIALIZED (
      SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS w FROM ord
      WHERE prev IS NOT NULL GROUP BY prev, cur
    ),
    outd AS MATERIALIZED (
      SELECT prev, CAST(SUM(w) AS BIGINT) AS od FROM edges GROUP BY prev
    ),
    nodes AS MATERIALIZED (SELECT DISTINCT event_type AS v FROM events),
    r0 AS (SELECT v, CAST({sc} AS BIGINT) AS r FROM nodes)"""
    steps = []
    for i in range(1, _Q398_ITERS + 1):
        steps.append(f"""
    r{i} AS MATERIALIZED (
      SELECT n.v,
             CAST((15 * CAST({sc} AS BIGINT) + 85 * COALESCE(t.tv, 0)) // 100
                  AS BIGINT) AS r
      FROM nodes n LEFT JOIN (
        SELECT e.cur, CAST(SUM((e.w * p.r) // o.od) AS BIGINT) AS tv
        FROM edges e
        JOIN r{i - 1} p ON p.v = e.prev
        JOIN outd o ON o.prev = e.prev
        GROUP BY e.cur
      ) t ON t.cur = n.v
    )""")
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT v,
           FLOOR(r * 1.0 / ((SELECT COUNT(*) FROM nodes) * {sc})
                 * 1000000 + 0.5) / 1000000 AS pagerank,
           CAST(ROW_NUMBER() OVER (ORDER BY r DESC, v) AS BIGINT) AS rank
    FROM r{_Q398_ITERS}
    ORDER BY rank
    """
    )


@register(
    "q398_pagerank_exact",
    _q398_sql(),
    doc="PageRank over the q123 event-type transition graph, GRADUATED "
    "to exact fixed-point arithmetic: scores held as integer nanos of "
    "N*PageRank, per-edge flow (w*r)//W as truncating integer "
    "division, damped update (15*SC + 85*T)//100 — the q381/q368 "
    "idiom. q123's float power iteration is the engine's one "
    "documented accepted-flakiness class ('integer arithmetic cannot "
    "express the damped fixpoint' — it can, to 1e-9, and this query "
    "does); the readout is bit-identical on both engines by "
    "construction. Sink mass is absorbed (no dangling redistribution; "
    "scores are reported normalized by N*SC, so the ranking and "
    "relative magnitudes match q123's to ~1e-6).",
)
def q398_pagerank_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: edge mining is the only corpus-width work (one lag window
    + aggregate, exactly q123's). The node set is taxonomy-bounded
    (distinct event types) and the edge relation is <= |types|^2 rows,
    so the fixed-point iteration runs on a driver-side copy — the
    documented bounded-collect pattern (q350/q331) — in exact Python
    integer arithmetic identical to the oracle's BIGINT div recurrence
    (all terms nonnegative, so `div` == Python `//`). This replaced
    ten per-iteration join+localCheckpoint Spark jobs over a
    handful-of-rows relation, which were pure job-scheduling overhead
    (guide §1.2: fix the distributed algorithm first — here the right
    'distribution' for taxonomy-sized state is none at all)."""
    sc = _Q398_SCALE
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        F.col("event_type").alias("cur"), F.lag("event_type").over(w).alias("prev")
    )
    edge_rows = (
        ordered.filter(F.col("prev").isNotNull())
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .collect()  # taxonomy-bounded: <= |event types|^2 rows
    )
    node_vals = sorted(
        row["v"]
        for row in ev.select(F.col("event_type").alias("v")).distinct().collect()
    )
    e = [(row["prev"], row["cur"], row["w"]) for row in edge_rows]
    od: dict[str, int] = {}
    for prev, _, wt in e:
        od[prev] = od.get(prev, 0) + wt
    r = {v: sc for v in node_vals}
    for _ in range(_Q398_ITERS):
        tv: dict[str, int] = {}
        for prev, cur, wt in e:
            tv[cur] = tv.get(cur, 0) + (wt * r[prev]) // od[prev]
        r = {v: (15 * sc + 85 * tv.get(v, 0)) // 100 for v in node_vals}
    n_nodes = len(node_vals)
    # node type from the lake schema, not a literal (ADVICE r10): the
    # replaced DataFrame pipeline inherited event_type's type, and this
    # keeps the output stable if the lake schema ever evolves
    rdf = spark.createDataFrame(
        [(v, r[v]) for v in node_vals],
        T.StructType(
            [
                T.StructField("v", ev.schema["event_type"].dataType),
                T.StructField("r", T.LongType()),
            ]
        ),
    )
    wr = Window.orderBy(F.desc("r"), "v")
    return (
        rdf.select(
            "v",
            round_half_up(F.col("r") * 1.0 / (n_nodes * sc), 6).alias("pagerank"),
            F.row_number().over(wr).cast("long").alias("rank"),
        )
        .orderBy("rank")
    )


# ── q399: Cochran-Mantel-Haenszel stratified association test ────────────────


@register(
    "q399_cmh_test",
    """
    WITH strat AS (
      SELECT o.o_orderkey,
             r.r_name AS stratum,
             CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS exposed,
             CASE WHEN EXISTS (SELECT 1 FROM lineitem l
                               WHERE l.l_orderkey = o.o_orderkey
                                 AND l.l_returnflag = 'R')
                  THEN 1 ELSE 0 END AS returned
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
    ),
    tab AS (
      SELECT stratum,
             CAST(SUM(exposed * returned) AS BIGINT) AS a,
             CAST(SUM(exposed * (1 - returned)) AS BIGINT) AS b,
             CAST(SUM((1 - exposed) * returned) AS BIGINT) AS c,
             CAST(SUM((1 - exposed) * (1 - returned)) AS BIGINT) AS d
      FROM strat GROUP BY stratum
    ),
    terms AS (
      SELECT stratum, a, b, c, d, a + b + c + d AS n,
             CAST(FLOOR((a - CAST(a + b AS DOUBLE) * (a + c) / (a + b + c + d)
                        + 1000000) * 1000000 + 0.5) AS BIGINT)
               - 1000000000000 AS oe_q,
             CAST(FLOOR(CAST(a + b AS DOUBLE) * (c + d) * (a + c) * (b + d)
                        / ((a + b + c + d) * 1.0 * (a + b + c + d)
                           * (a + b + c + d - 1)) * 1000000 + 0.5)
                  AS BIGINT) AS v_q,
             CAST(FLOOR(CAST(a AS DOUBLE) * d / (a + b + c + d) * 1000000
                        + 0.5) AS BIGINT) AS orn_q,
             CAST(FLOOR(CAST(b AS DOUBLE) * c / (a + b + c + d) * 1000000
                        + 0.5) AS BIGINT) AS ord_q
      FROM tab
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
           CAST(SUM(a + b) AS BIGINT) AS n_exposed,
           CAST(SUM(a) AS BIGINT) AS n_returned_exposed,
           FLOOR((SUM(oe_q) / 1000000.0) * (SUM(oe_q) / 1000000.0)
                 / (SUM(v_q) / 1000000.0) * 1000000 + 0.5) / 1000000
             AS cmh_chi2,
           FLOOR((SUM(orn_q) * 1.0 / SUM(ord_q)) * 1000000 + 0.5) / 1000000
             AS common_or_mh,
           CASE WHEN (SUM(oe_q) / 1000000.0) * (SUM(oe_q) / 1000000.0)
                     / (SUM(v_q) / 1000000.0) > 3.841
                THEN 1 ELSE 0 END AS reject_independence
    FROM terms
    """,
    doc="Cochran-Mantel-Haenszel test (1959) of urgent-priority vs "
    "any-returned-lineitem association, STRATIFIED by customer region: "
    "per-region 2x2 tables, chi2 = (sum a - E[a])^2 / sum V with the "
    "hypergeometric variance, plus the Mantel-Haenszel common odds "
    "ratio sum(ad/n)/sum(bc/n). Per-stratum terms are micro-quantized "
    "before the cross-strata sums (the q353 idiom; products forced "
    "through DOUBLE — the q386 lesson), so the whole stratified test "
    "is hash-exact. The inferential counterpart of q343's Simpson-"
    "paradox detector: q343 finds strata that FLIP an association, "
    "CMH tests whether a common association EXISTS after controlling "
    "for them. Expected A/A-null on TPC-H (priorities independent of "
    "returns): chi2 < 3.841, OR ~ 1.",
)
def q399_cmh_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: three dimension joins (all broadcast-able), one
    exists-semi-join against lineitem on the order key, one grouped
    2x2 rollup per region, 5-row algebra after that."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    li = load_table(spark, sf_dir, "lineitem")
    ret = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
        .distinct()
        .withColumn("returned", F.lit(1))
    )
    strat = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .join(ret, "o_orderkey", "left")
        .select(
            F.col("r_name").alias("stratum"),
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
            ).otherwise(0).alias("exposed"),
            F.coalesce("returned", F.lit(0)).alias("returned"),
        )
    )
    tab = strat.groupBy("stratum").agg(
        F.sum(F.col("exposed") * F.col("returned")).cast("long").alias("a"),
        F.sum(F.col("exposed") * (1 - F.col("returned"))).cast("long").alias("b"),
        F.sum((1 - F.col("exposed")) * F.col("returned")).cast("long").alias("c"),
        F.sum((1 - F.col("exposed")) * (1 - F.col("returned")))
        .cast("long")
        .alias("d"),
    )
    a, b, c_, d = F.col("a"), F.col("b"), F.col("c"), F.col("d")
    nn = a + b + c_ + d
    e_a = (a + b).cast("double") * (a + c_) / nn
    v = (
        (a + b).cast("double")
        * (c_ + d)
        * (a + c_)
        * (b + d)
        / (nn * 1.0 * nn * (nn - 1))
    )
    terms = tab.select(
        "a",
        "b",
        (
            F.floor((a - e_a + 1_000_000) * 1_000_000 + 0.5).cast("long")
            - 1_000_000_000_000
        ).alias("oe_q"),
        F.floor(v * 1_000_000 + 0.5).cast("long").alias("v_q"),
        F.floor(a.cast("double") * d / nn * 1_000_000 + 0.5)
        .cast("long")
        .alias("orn_q"),
        F.floor(b.cast("double") * c_ / nn * 1_000_000 + 0.5)
        .cast("long")
        .alias("ord_q"),
    )
    soe = F.sum("oe_q") / 1_000_000.0
    chi2 = soe * soe / (F.sum("v_q") / 1_000_000.0)
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum(a + b).cast("long").alias("n_exposed"),
        F.sum("a").cast("long").alias("n_returned_exposed"),
        round_half_up(chi2, 6).alias("cmh_chi2"),
        round_half_up(F.sum("orn_q") * 1.0 / F.sum("ord_q"), 6).alias(
            "common_or_mh"
        ),
        F.when(chi2 > 3.841, 1).otherwise(0).alias("reject_independence"),
    )


# ── q400: Mann-Kendall trend test on daily volume ────────────────────────────


@register(
    "q400_mann_kendall",
    """
    WITH d0 AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END
               AS sgn
      FROM d0 a JOIN d0 b ON b.d > a.d
    ),
    s AS (SELECT CAST(SUM(sgn) AS BIGINT) AS s,
                 CAST(COUNT(*) AS BIGINT) AS n_pairs FROM pairs),
    ties AS (
      SELECT CAST(SUM(c * (c - 1) * (2 * c + 5)) AS BIGINT) AS tie_adj,
             CAST(SUM(c) AS BIGINT) AS n
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM d0 GROUP BY v)
    )
    SELECT t.n AS n_days, s.s AS kendall_s,
           FLOOR(s.s * 1.0 / s.n_pairs * 1000000 + 0.5) / 1000000 AS tau,
           FLOOR((t.n * 1.0 * (t.n - 1) * (2 * t.n + 5) - t.tie_adj) / 18
                 * 10000 + 0.5) / 10000 AS var_s,
           FLOOR(((CASE WHEN s.s > 0 THEN s.s - 1
                        WHEN s.s < 0 THEN s.s + 1 ELSE 0 END)
                  / SQRT((t.n * 1.0 * (t.n - 1) * (2 * t.n + 5) - t.tie_adj)
                         / 18) + 1000) * 1000000 + 0.5) / 1000000 - 1000
             AS z_stat,
           CASE WHEN ABS((CASE WHEN s.s > 0 THEN s.s - 1
                               WHEN s.s < 0 THEN s.s + 1 ELSE 0 END)
                         / SQRT((t.n * 1.0 * (t.n - 1) * (2 * t.n + 5)
                                 - t.tie_adj) / 18)) > 1.96
                THEN 1 ELSE 0 END AS reject_no_trend
    FROM s CROSS JOIN ties t
    """,
    doc="Mann-Kendall trend test (1945/1975, tie-corrected, continuity-"
    "corrected z) on daily event volume: S = sum of pair signs over "
    "all day pairs, Var(S) = (n(n-1)(2n+5) - sum t(t-1)(2t+5))/18. "
    "Everything is exact integer arithmetic until the final z — "
    "hash-exact. The SIGNIFICANCE companion of q339's Theil-Sen "
    "estimator (which gives the robust slope but no test) and the "
    "monotone-trend complement of q389's runs test: MK detects "
    "monotone drift specifically, runs detects any non-randomness.",
)
def q400_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one per-day count; the pair join is calendar-bounded
    (days^2, ~66k pairs/year) — never row-level data."""
    ev = load_table(spark, sf_dir, "events")
    d0 = ev.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("v")).localCheckpoint(eager=True)
    a = d0.select(F.col("d").alias("da"), F.col("v").alias("va"))
    b = d0.select(F.col("d").alias("db"), F.col("v").alias("vb"))
    pairs = a.join(F.broadcast(b), F.col("db") > F.col("da")).select(
        F.when(F.col("vb") > F.col("va"), 1)
        .when(F.col("vb") < F.col("va"), -1)
        .otherwise(0)
        .alias("sgn")
    )
    s = pairs.agg(
        F.sum("sgn").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    ties = (
        d0.groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .agg(
            F.sum(F.col("c") * (F.col("c") - 1) * (2 * F.col("c") + 5))
            .cast("long")
            .alias("tie_adj"),
            F.sum("c").cast("long").alias("n"),
        )
    )
    j = s.crossJoin(F.broadcast(ties))
    n = F.col("n")
    var_s = (n * 1.0 * (n - 1) * (2 * n + 5) - F.col("tie_adj")) / 18
    s_cc = (
        F.when(F.col("s") > 0, F.col("s") - 1)
        .when(F.col("s") < 0, F.col("s") + 1)
        .otherwise(0)
    )
    # try_divide: a single-day lake has var_s = 0 -> z undefined
    z = F.try_divide(s_cc, F.sqrt(var_s))

    def signed_round6(col):
        return F.floor((col + 1000) * 1_000_000 + 0.5) / 1_000_000 - 1000

    return j.select(
        n.alias("n_days"),
        F.col("s").alias("kendall_s"),
        round_half_up(
            F.try_divide(F.col("s") * 1.0, F.col("n_pairs")), 6
        ).alias("tau"),
        round_half_up(var_s, 4).alias("var_s"),
        signed_round6(z).alias("z_stat"),
        F.when(F.abs(z) > 1.96, 1).otherwise(0).alias("reject_no_trend"),
    )


# ── q401: 1-D Gaussian-mixture EM in exact replay ────────────────────────────

_Q401_ITERS = 8
_Q401_SC = 1_000_000  # parameter micro-units


def _q401_phi(mu: str, sg: str) -> str:
    """Normal pdf with micro-quantized params, identical tree both engines."""
    return (
        f"EXP(-(x - {mu} / 1000000.0) * (x - {mu} / 1000000.0)"
        f" / (2 * ({sg} / 1000000.0) * ({sg} / 1000000.0)))"
        f" / (({sg} / 1000000.0) * 2.5066282746310002)"
    )


def _q401_sql() -> str:
    it = _Q401_ITERS
    head = """
    WITH hist AS MATERIALIZED (
      SELECT CAST(n_chars AS DOUBLE) AS x, CAST(n_chars AS BIGINT) AS xi,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM documents GROUP BY n_chars
    ),
    rng AS (
      SELECT CAST(MIN(xi) AS BIGINT) AS lo, CAST(MAX(xi) AS BIGINT) AS hi
      FROM hist
    ),
    p0 AS (
      SELECT CAST(500000 AS BIGINT) AS pi1,
             CAST((lo * 3 + hi) * 1000000 // 4 AS BIGINT) AS mu1,
             CAST((lo + hi * 3) * 1000000 // 4 AS BIGINT) AS mu2,
             CAST(GREATEST((hi - lo) * 1000000 // 4, 1000000) AS BIGINT)
               AS sg1,
             CAST(GREATEST((hi - lo) * 1000000 // 4, 1000000) AS BIGINT)
               AS sg2
      FROM rng
    )"""
    steps = []
    for k in range(1, it + 1):
        phi1 = _q401_phi("p.mu1", "p.sg1")
        phi2 = _q401_phi("p.mu2", "p.sg2")
        steps.append(f"""
    r{k} AS (
      SELECT x, cnt,
             (p.pi1 / 1000000.0) * {phi1}
               / ((p.pi1 / 1000000.0) * {phi1}
                  + (1 - p.pi1 / 1000000.0) * {phi2}) AS r
      FROM hist CROSS JOIN p{k - 1} p
    ),
    m{k} AS (
      SELECT CAST(SUM(CAST(FLOOR(r * cnt * 1000000 + 0.5) AS BIGINT))
                  AS BIGINT) AS s1,
             CAST(SUM(CAST(FLOOR(r * cnt * x * 10000 + 0.5) AS BIGINT))
                  AS BIGINT) AS sx1,
             CAST(SUM(CAST(FLOOR(r * cnt * x * x * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS sxx1,
             CAST(SUM(CAST(FLOOR((1 - r) * cnt * 1000000 + 0.5) AS BIGINT))
                  AS BIGINT) AS s2,
             CAST(SUM(CAST(FLOOR((1 - r) * cnt * x * 10000 + 0.5) AS BIGINT))
                  AS BIGINT) AS sx2,
             CAST(SUM(CAST(FLOOR((1 - r) * cnt * x * x * 100 + 0.5)
                           AS BIGINT)) AS BIGINT) AS sxx2,
             CAST(SUM(cnt) AS BIGINT) AS n
      FROM r{k}
    ),
    p{k} AS (
      SELECT CAST(FLOOR(s1 * 1.0 / (s1 + s2) * 1000000 + 0.5) AS BIGINT)
               AS pi1,
             CAST(FLOOR(sx1 * 100.0 / s1 * 1000000 + 0.5) AS BIGINT) AS mu1,
             CAST(FLOOR(sx2 * 100.0 / s2 * 1000000 + 0.5) AS BIGINT) AS mu2,
             CAST(GREATEST(CAST(FLOOR(SQRT(sxx1 * 10000.0 / s1
                             - (sx1 * 100.0 / s1) * (sx1 * 100.0 / s1))
                             * 1000000 + 0.5) AS BIGINT), 1000000)
                  AS BIGINT) AS sg1,
             CAST(GREATEST(CAST(FLOOR(SQRT(sxx2 * 10000.0 / s2
                             - (sx2 * 100.0 / s2) * (sx2 * 100.0 / s2))
                             * 1000000 + 0.5) AS BIGINT), 1000000)
                  AS BIGINT) AS sg2
      FROM m{k}
    )""")
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT component,
           FLOOR(wq / 1000000.0 * 1000000 + 0.5) / 1000000 AS weight,
           FLOOR(muq / 1000000.0 * 10000 + 0.5) / 10000 AS mu,
           FLOOR(sgq / 1000000.0 * 10000 + 0.5) / 10000 AS sigma,
           FLOOR(nq / 1000000.0 * 100 + 0.5) / 100 AS n_eff
    FROM (
      SELECT 1 AS component, p.pi1 AS wq, p.mu1 AS muq, p.sg1 AS sgq,
             m.s1 AS nq
      FROM p{it} p CROSS JOIN m{it} m
      UNION ALL
      SELECT 2 AS component, 1000000 - p.pi1 AS wq, p.mu2 AS muq,
             p.sg2 AS sgq, m.s2 AS nq
      FROM p{it} p CROSS JOIN m{it} m
    )
    WHERE (SELECT COUNT(*) FROM hist) > 0
    ORDER BY component
    """
    )  # WHERE guard: empty documents table -> zero rows on both sides
    # (the fn's bounded-collect early return), not two NULL components


@register(
    "q401_gmm_em",
    _q401_sql(),
    doc="Two-component 1-D Gaussian-mixture fit of document lengths by "
    "EM, run ENTIRELY under the exact-replay discipline — the EM "
    "algorithm joins Newton (q379), value iteration (q350), Viterbi "
    "(q358), PAVA (q352) and power iteration (q368/q398) in the "
    "graduated class: parameters live as integer micros, "
    "responsibilities are one fixed IEEE tree per distinct value, "
    "per-value moment terms are quantized before the sums (1e6/1e4/"
    "1e2 scales keep every sum in BIGINT), and the M-step ratios are "
    "floor-pinned — so all 8 iterations are hash-exact on both "
    "engines. E-step cost is the LENGTH HISTOGRAM (distinct n_chars "
    "values), never corpus rows — the q240 shape. Deterministic "
    "quartile-of-range init; sigmas floored at 1.0 to keep the "
    "iteration from collapsing on a spike. The soft upgrade of "
    "q203's hard k-means: overlapping short/long-doc populations "
    "get WEIGHTS, the basis for length-stratified sampling (q88).",
)
def q401_gmm_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one n_chars histogram aggregate (map-side combinable,
    value-bounded); the EM loop runs driver-side on the bounded
    histogram (bounded-collect pattern, q350/q351) in arithmetic
    identical to the oracle's unrolled CTEs."""
    sc = _Q401_SC
    docs = load_table(spark, sf_dir, "documents")
    hist = (
        docs.groupBy(F.col("n_chars").cast("long").alias("xi"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .collect()
    )
    hs = [(float(r["xi"]), r["xi"], r["cnt"]) for r in hist]
    if not hs:
        return spark.createDataFrame(
            [], "component int, weight double, mu double, sigma double, n_eff double"
        )
    lo = min(xi for _, xi, _ in hs)
    hi = max(xi for _, xi, _ in hs)
    pi1 = 500_000
    mu1 = (lo * 3 + hi) * sc // 4
    mu2 = (lo + hi * 3) * sc // 4
    sg1 = sg2 = max((hi - lo) * sc // 4, sc)
    s1 = sx1 = sxx1 = s2 = sx2 = sxx2 = 0
    for _ in range(_Q401_ITERS):
        s1 = sx1 = sxx1 = s2 = sx2 = sxx2 = 0
        for x, _, cnt in hs:
            f1 = math.exp(
                -(x - mu1 / 1e6) * (x - mu1 / 1e6) / (2 * (sg1 / 1e6) * (sg1 / 1e6))
            ) / ((sg1 / 1e6) * 2.5066282746310002)
            f2 = math.exp(
                -(x - mu2 / 1e6) * (x - mu2 / 1e6) / (2 * (sg2 / 1e6) * (sg2 / 1e6))
            ) / ((sg2 / 1e6) * 2.5066282746310002)
            r = (pi1 / 1e6) * f1 / ((pi1 / 1e6) * f1 + (1 - pi1 / 1e6) * f2)
            s1 += math.floor(r * cnt * 1_000_000 + 0.5)
            sx1 += math.floor(r * cnt * x * 10_000 + 0.5)
            sxx1 += math.floor(r * cnt * x * x * 100 + 0.5)
            s2 += math.floor((1 - r) * cnt * 1_000_000 + 0.5)
            sx2 += math.floor((1 - r) * cnt * x * 10_000 + 0.5)
            sxx2 += math.floor((1 - r) * cnt * x * x * 100 + 0.5)
        pi1 = math.floor(s1 * 1.0 / (s1 + s2) * 1_000_000 + 0.5)
        mu1 = math.floor(sx1 * 100.0 / s1 * 1_000_000 + 0.5)
        mu2 = math.floor(sx2 * 100.0 / s2 * 1_000_000 + 0.5)
        sg1 = max(
            math.floor(
                math.sqrt(sxx1 * 10_000.0 / s1 - (sx1 * 100.0 / s1) * (sx1 * 100.0 / s1))
                * 1_000_000
                + 0.5
            ),
            sc,
        )
        sg2 = max(
            math.floor(
                math.sqrt(sxx2 * 10_000.0 / s2 - (sx2 * 100.0 / s2) * (sx2 * 100.0 / s2))
                * 1_000_000
                + 0.5
            ),
            sc,
        )
    out = spark.createDataFrame(
        [(1, pi1, mu1, sg1, s1), (2, 1_000_000 - pi1, mu2, sg2, s2)],
        "component int, wq long, muq long, sgq long, nq long",
    )
    return out.select(
        "component",
        round_half_up(F.col("wq") / 1e6, 6).alias("weight"),
        round_half_up(F.col("muq") / 1e6, 4).alias("mu"),
        round_half_up(F.col("sgq") / 1e6, 4).alias("sigma"),
        round_half_up(F.col("nq") / 1e6, 2).alias("n_eff"),
    ).orderBy("component")


# ── q402: Poisson trend GLM via exact-replay IRLS ────────────────────────────

_Q402_ITERS = 8
_Q402_SC = 1_000_000


def _q402_sql() -> str:
    sc = _Q402_SC
    head = """
    WITH d0 AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    daily AS MATERIALIZED (
      SELECT y, ROW_NUMBER() OVER (ORDER BY d) - 1 AS t FROM d0
    ),
    b0 AS (
      SELECT CAST(FLOOR(LN((SELECT AVG(CAST(y AS DOUBLE)) FROM daily))
                        * 1000000 + 0.5) AS BIGINT) AS a,
             CAST(0 AS BIGINT) AS b
    )"""
    steps = []
    for k in range(1, _Q402_ITERS + 1):
        mu = f"EXP(p.a / {sc}.0 + p.b / {sc}.0 * t)"
        steps.append(f"""
    m{k} AS (
      SELECT CAST(SUM(CAST(FLOOR(({mu}) * 1000000 + 0.5) AS BIGINT))
                  AS BIGINT) AS s0,
             CAST(SUM(CAST(FLOOR(({mu}) * t * 10000 + 0.5) AS BIGINT))
                  AS BIGINT) AS s1,
             CAST(SUM(CAST(FLOOR(({mu}) * t * t * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS s2,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(y * t) AS BIGINT) AS syt
      FROM daily CROSS JOIN b{k - 1} p
    ),
    b{k} AS (
      SELECT CAST(p.a + CAST(FLOOR(
               ((sy - s0 / 1000000.0) * (s2 / 100.0)
                - (syt - s1 / 10000.0) * (s1 / 10000.0))
               / ((s0 / 1000000.0) * (s2 / 100.0)
                  - (s1 / 10000.0) * (s1 / 10000.0)) * {sc} + 0.5)
               AS BIGINT) AS BIGINT) AS a,
             CAST(p.b + CAST(FLOOR(
               ((syt - s1 / 10000.0) * (s0 / 1000000.0)
                - (sy - s0 / 1000000.0) * (s1 / 10000.0))
               / ((s0 / 1000000.0) * (s2 / 100.0)
                  - (s1 / 10000.0) * (s1 / 10000.0)) * {sc} + 0.5)
               AS BIGINT) AS BIGINT) AS b
      FROM m{k} CROSS JOIN b{k - 1} p
    )""")
    it = _Q402_ITERS
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
           FLOOR(b.a / {sc}.0 * 1000000 + 0.5) / 1000000 AS intercept,
           FLOOR((b.b / {sc}.0 + 1000) * 1000000 + 0.5) / 1000000 - 1000
             AS trend_coef,
           FLOOR((EXP(b.b / {sc}.0) - 1 + 1000) * 1000000 + 0.5) / 1000000
             - 1000 AS daily_growth_rate,
           FLOOR(((b.b / {sc}.0)
                  / SQRT((m.s0 / 1000000.0)
                         / ((m.s0 / 1000000.0) * (m.s2 / 100.0)
                            - (m.s1 / 10000.0) * (m.s1 / 10000.0)))
                  + 1000) * 1000000 + 0.5) / 1000000 - 1000 AS z_stat
    FROM b{it} b CROSS JOIN m{it} m
    WHERE (SELECT COUNT(*) FROM daily) > 1
    """
    )  # WHERE guard: an empty OR single-day events table -> zero rows on
    # both sides (the fn's bounded-collect early return); with one day
    # the Fisher information is singular, so no trend is defined


@register(
    "q402_poisson_trend_glm",
    _q402_sql(),
    doc="Poisson regression of daily event counts on a linear time "
    "trend, fit by IRLS/Newton on the log link: score equations "
    "sum(y - mu) = 0, sum(t(y - mu)) = 0 with mu = exp(a + b t); each "
    "iteration inverts the 2x2 Fisher information (sums of mu, mu*t, "
    "mu*t^2) in closed form. The IRLS loop joins Newton (q379) and EM "
    "(q401) in the exact-replay class: coefficients as integer "
    "micros, per-day mu terms quantized at three scales before the "
    "sums, the solve one fixed IEEE tree — all 8 iterations "
    "hash-exact. Reports exp(b)-1 as the daily growth rate and the "
    "Wald z from the information matrix. The COUNT-data answer to "
    "q272's Gaussian volume forecast: Poisson variance scales with "
    "the mean, so quiet days stop dominating the fit.",
)
def q402_poisson_trend_glm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one per-day count; all IRLS iterations run driver-side on
    the calendar-bounded daily relation (bounded-collect, q350/q351)
    in arithmetic identical to the oracle's unrolled CTEs."""
    sc = _Q402_SC
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            .cast("long")
            .alias("d")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
        .orderBy("d")
        .collect()
    )
    ys = [r["y"] for r in daily]
    # a trend needs >= 2 days: with one day the 2x2 Fisher information
    # is singular (det 0) on both engines; return schema-stable empty
    # (the oracle's COUNT(daily) > 1 guard is the same condition)
    if len(ys) < 2:
        return spark.createDataFrame(
            [],
            "n_days long, intercept double, trend_coef double, "
            "daily_growth_rate double, z_stat double",
        )
    n = len(ys)
    a = math.floor(math.log(sum(ys) / n) * sc + 0.5)
    b = 0
    s0 = s1 = s2 = 0
    sy = sum(ys)
    syt = sum(y * t for t, y in enumerate(ys))
    for _ in range(_Q402_ITERS):
        s0 = s1 = s2 = 0
        for t, y in enumerate(ys):
            mu = math.exp(a / 1e6 + b / 1e6 * t)
            s0 += math.floor(mu * 1_000_000 + 0.5)
            s1 += math.floor(mu * t * 10_000 + 0.5)
            s2 += math.floor(mu * t * t * 100 + 0.5)
        f0, f1, f2 = s0 / 1e6, s1 / 1e4, s2 / 1e2
        det = f0 * f2 - f1 * f1
        da = ((sy - f0) * f2 - (syt - f1) * f1) / det
        db = ((syt - f1) * f0 - (sy - f0) * f1) / det
        a = a + math.floor(da * sc + 0.5)
        b = b + math.floor(db * sc + 0.5)
    out = spark.createDataFrame(
        [(n, a, b, s0, s1, s2)],
        "n long, a long, b long, s0 long, s1 long, s2 long",
    )
    f0 = F.col("s0") / 1e6
    f1 = F.col("s1") / 1e4
    f2 = F.col("s2") / 1e2
    bb = F.col("b") / float(sc)
    se_b = F.sqrt(f0 / (f0 * f2 - f1 * f1))

    def signed_round6(col):
        return F.floor((col + 1000) * 1_000_000 + 0.5) / 1_000_000 - 1000

    return out.select(
        F.col("n").alias("n_days"),
        round_half_up(F.col("a") / float(sc), 6).alias("intercept"),
        signed_round6(bb).alias("trend_coef"),
        signed_round6(F.exp(bb) - 1).alias("daily_growth_rate"),
        signed_round6(bb / se_b).alias("z_stat"),
    )


# ── q403: small-file compaction planner over ingest-hour files ───────────────

_Q403_TARGET = 262_144  # 256 KiB target object size (testdata scale)
_Q403_ROW_OVERHEAD = 64  # per-row storage overhead proxy


@register(
    "q403_compaction_plan",
    f"""
    WITH files AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             date_part('hour', ts) AS hr,
             CAST(SUM(strlen(COALESCE(props, ''))
                      + {_Q403_ROW_OVERHEAD}) AS BIGINT) AS bytes
      FROM events GROUP BY 1, 2, 3
    ),
    parts AS (
      SELECT event_type, day,
             CAST(COUNT(*) AS BIGINT) AS files_before,
             CAST(SUM(bytes) AS BIGINT) AS bytes_total,
             CAST(CEIL(SUM(bytes) * 1.0 / {_Q403_TARGET}) AS BIGINT)
               AS files_after
      FROM files GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_partitions,
           CAST(SUM(files_before) AS BIGINT) AS files_before,
           CAST(SUM(CASE WHEN files_before > files_after
                         THEN files_after ELSE files_before END)
                AS BIGINT) AS files_after,
           CAST(SUM(CASE WHEN files_before > files_after
                         THEN bytes_total ELSE 0 END) AS BIGINT)
             AS bytes_rewritten,
           FLOOR(SUM(files_before - CASE WHEN files_before > files_after
                                         THEN files_after
                                         ELSE files_before END) * 1.0
                 / SUM(files_before) * 1000000 + 0.5) / 1000000
             AS file_reduction,
           FLOOR(AVG(bytes_total * 1.0 / files_before) / 1024 * 100 + 0.5)
             / 100 AS avg_file_kb_before,
           FLOOR(AVG(bytes_total * 1.0
                     / (CASE WHEN files_before > files_after
                             THEN files_after ELSE files_before END))
                 / 1024 * 100 + 0.5) / 100 AS avg_file_kb_after
    FROM parts
    GROUP BY event_type ORDER BY event_type
    """,
    doc="Small-file compaction planner: ingest-hour objects (one file "
    "per event_type x day x hour, sizes from exact per-row byte "
    "sums) rolled up per daily partition, then the rewrite priced "
    f"against a {_Q403_TARGET // 1024} KiB target — files_after = "
    "ceil(bytes/target), only partitions that actually shrink are "
    "rewritten, and the report gives per-type file reduction, bytes "
    "rewritten and average object size before/after. The lakehouse "
    "housekeeping knob the planner family lacked: q321 prices SHUFFLE "
    "partitions, q396 the sort ORDER, q337 the clustering KEY — this "
    "prices the OPTIMIZE/compact rewrite itself, the fix for the "
    "K3-landing layout's 60-second micro-batch files "
    "(streaming/ingest.py). Exact integer bytes and counts — "
    "hash-exact.",
)
def q403_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: two map-side-combinable aggregates (hour files, then
    daily partitions) and a per-type rollup; in production the file
    relation comes free from the table manifest/listing."""
    ev = load_table(spark, sf_dir, "events")
    files = ev.groupBy(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        F.hour("ts").alias("hr"),
    ).agg(
        F.sum(
            F.octet_length(F.coalesce("props", F.lit(""))) + _Q403_ROW_OVERHEAD
        )
        .cast("long")
        .alias("bytes")
    )
    parts = files.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("files_before"),
        F.sum("bytes").cast("long").alias("bytes_total"),
        F.ceil(F.sum("bytes") * 1.0 / _Q403_TARGET).cast("long").alias(
            "files_after"
        ),
    )
    eff_after = F.when(
        F.col("files_before") > F.col("files_after"), F.col("files_after")
    ).otherwise(F.col("files_before"))
    return (
        parts.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_partitions"),
            F.sum("files_before").cast("long").alias("files_before"),
            F.sum(eff_after).cast("long").alias("files_after"),
            F.sum(
                F.when(
                    F.col("files_before") > F.col("files_after"),
                    F.col("bytes_total"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("bytes_rewritten"),
            round_half_up(
                F.sum(F.col("files_before") - eff_after) * 1.0
                / F.sum("files_before"),
                6,
            ).alias("file_reduction"),
            round_half_up(
                F.avg(F.col("bytes_total") * 1.0 / F.col("files_before")) / 1024, 2
            ).alias("avg_file_kb_before"),
            round_half_up(
                F.avg(F.col("bytes_total") * 1.0 / eff_after) / 1024, 2
            ).alias("avg_file_kb_after"),
        )
        .orderBy("event_type")
    )


# ── q404: Fellegi-Sunter-scored linkage of blocked document pairs ────────────

_Q404_WINDOW = 4


def _q404_sql() -> str:
    fs = _q387_sql()
    from .queries import QUERY_REGISTRY as _REGISTRY

    dup = _REGISTRY["q24_minhash_lsh_dedup"].sql
    leads = "\n".join(
        f"             LEAD(doc_id, {i}) OVER o AS d{i},"
        for i in range(1, _Q404_WINDOW + 1)
    ).rstrip(",")
    pair_legs = "\n      UNION ALL\n".join(
        f"      SELECT LEAST(doc_id, d{i}) AS da, GREATEST(doc_id, d{i}) AS db"
        f" FROM ws WHERE d{i} IS NOT NULL"
        for i in range(1, _Q404_WINDOW + 1)
    )
    return f"""
    WITH w AS ({fs}),
    wp AS (
      SELECT MAX(CASE WHEN field = 'lang' THEN weight_agree END) AS la,
             MAX(CASE WHEN field = 'lang' THEN weight_disagree END) AS ld,
             MAX(CASE WHEN field = 'source' THEN weight_agree END) AS sa,
             MAX(CASE WHEN field = 'source' THEN weight_disagree END) AS sd,
             MAX(CASE WHEN field = 'length' THEN weight_agree END) AS na,
             MAX(CASE WHEN field = 'length' THEN weight_disagree END) AS nd,
             MAX(CASE WHEN field = 'prefix' THEN weight_agree END) AS pa,
             MAX(CASE WHEN field = 'prefix' THEN weight_disagree END) AS pd
      FROM w
    ),
    ws AS (
      SELECT doc_id,
{leads}
      FROM documents WINDOW o AS (ORDER BY lang, n_chars, doc_id)
    ),
    cand AS (
{pair_legs}
    ),
    scored AS (
      SELECT c.da, c.db,
             (CASE WHEN a.lang = b.lang THEN wp.la ELSE wp.ld END)
             + (CASE WHEN a.source = b.source THEN wp.sa ELSE wp.sd END)
             + (CASE WHEN ABS(a.n_chars - b.n_chars) <= {_Q387_LEN_TOL}
                     THEN wp.na ELSE wp.nd END)
             + (CASE WHEN substr(a.text, 1, {_Q387_PFX})
                          = substr(b.text, 1, {_Q387_PFX})
                     THEN wp.pa ELSE wp.pd END) AS score
      FROM cand c
      JOIN documents a ON a.doc_id = c.da
      JOIN documents b ON b.doc_id = c.db
      CROSS JOIN wp
    ),
    dup AS ({dup}),
    ev AS (
      SELECT s.da, s.db, s.score,
             CASE WHEN d.doc_a IS NOT NULL THEN 1 ELSE 0 END AS is_dup
      FROM scored s LEFT JOIN dup d
        ON d.doc_a = s.da AND d.doc_b = s.db
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_predicted,
           CAST(SUM(CASE WHEN score > 0 THEN is_dup ELSE 0 END) AS BIGINT)
             AS true_positives,
           CAST(SUM(is_dup) AS BIGINT) AS dups_in_block,
           FLOOR(SUM(CASE WHEN score > 0 THEN is_dup ELSE 0 END) * 1.0
                 / SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) * 1000000
                 + 0.5) / 1000000 AS precision_,
           FLOOR(SUM(CASE WHEN score > 0 THEN is_dup ELSE 0 END) * 1.0
                 / SUM(is_dup) * 1000000 + 0.5) / 1000000 AS recall_in_block,
           FLOOR(2.0 * SUM(CASE WHEN score > 0 THEN is_dup ELSE 0 END)
                 / (SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) + SUM(is_dup))
                 * 1000000 + 0.5) / 1000000 AS f1_in_block
    FROM ev
    """


@register(
    "q404_fs_linkage_scoring",
    _q404_sql(),
    doc="End-to-end probabilistic record linkage: sorted-neighborhood "
    "BLOCKS over documents (one global sort on (lang, n_chars), LEAD "
    "window 4 — the q328 strategy applied to the corpus), each "
    "candidate pair SCORED with q387's learned Fellegi-Sunter field "
    "weights (sum of agreement/disagreement log-odds; link iff total "
    "> 0, the classic zero-threshold decision), and EVALUATED against "
    "q24's MinHash near-dup relation: precision, recall-in-block, F1. "
    "Composes the linkage story the registry told in pieces — blocks "
    "(q328) -> learned weights (q387) -> scored decisions -> measured "
    "quality (the q209/q296 audit convention). Weights are the 1e-4-"
    "pinned values, so the scores and the whole readout stay "
    "hash-exact.",
)
def q404_fs_linkage_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one entity-catalog sort + LEAD window (q328's shape, w x N
    fan-out), attribute attachment via two doc-key equi-joins, the
    8-number weight row broadcast, and the q24 relation (already
    bucketed) left-joined on the pair key."""
    from .queries import QUERY_REGISTRY as _REGISTRY

    docs = load_table(spark, sf_dir, "documents")
    # ONE q24 detector build serves both consumers (r11): the weights
    # estimation (q387's relation, identical by construction — see
    # _q387_weights_from) and the is_dup label join below. Previously
    # q404 ran the full q24 build twice back-to-back (once inside
    # q387.fn, once for dup) — two eager signature-base barriers plus
    # two verify joins for one identical pair relation.
    dup_pairs = (
        _REGISTRY["q24_minhash_lsh_dedup"].fn(spark, sf_dir)
        .select(F.col("doc_a").alias("da"), F.col("doc_b").alias("db"))
        .localCheckpoint(eager=True)
    )
    w = _q387_weights_from(
        docs.select("doc_id", "lang", "source", "n_chars", F.col("text")),
        dup_pairs,
    )
    wp = w.agg(
        *[
            F.max(
                F.when(F.col("field") == f, F.col(c))
            ).alias(a)
            for f, c, a in [
                ("lang", "weight_agree", "la"),
                ("lang", "weight_disagree", "ld"),
                ("source", "weight_agree", "sa"),
                ("source", "weight_disagree", "sd"),
                ("length", "weight_agree", "na"),
                ("length", "weight_disagree", "nd"),
                ("prefix", "weight_agree", "pa"),
                ("prefix", "weight_disagree", "pd"),
            ]
        ]
    )
    o = Window.orderBy("lang", "n_chars", "doc_id")
    ws = docs.select("doc_id")
    base = docs.select("doc_id", "lang", "n_chars")
    u = base
    for i in range(1, _Q404_WINDOW + 1):
        u = u.withColumn(f"d{i}", F.lead("doc_id", i).over(o))
    cand = None
    for i in range(1, _Q404_WINDOW + 1):
        p = u.filter(F.col(f"d{i}").isNotNull()).select(
            F.least("doc_id", F.col(f"d{i}")).alias("da"),
            F.greatest("doc_id", F.col(f"d{i}")).alias("db"),
        )
        cand = p if cand is None else cand.unionByName(p)
    da = docs.select(
        F.col("doc_id").alias("da"),
        F.col("lang").alias("lang_a"),
        F.col("source").alias("source_a"),
        F.col("n_chars").alias("nc_a"),
        F.substring("text", 1, _Q387_PFX).alias("pfx_a"),
    )
    db = docs.select(
        F.col("doc_id").alias("db"),
        F.col("lang").alias("lang_b"),
        F.col("source").alias("source_b"),
        F.col("n_chars").alias("nc_b"),
        F.substring("text", 1, _Q387_PFX).alias("pfx_b"),
    )
    score = (
        F.when(F.col("lang_a") == F.col("lang_b"), F.col("la")).otherwise(F.col("ld"))
        + F.when(F.col("source_a") == F.col("source_b"), F.col("sa")).otherwise(
            F.col("sd")
        )
        + F.when(
            F.abs(F.col("nc_a") - F.col("nc_b")) <= _Q387_LEN_TOL, F.col("na")
        ).otherwise(F.col("nd"))
        + F.when(F.col("pfx_a") == F.col("pfx_b"), F.col("pa")).otherwise(F.col("pd"))
    )
    dup = dup_pairs.withColumn("is_dup", F.lit(1))
    ev = (
        cand.join(da, "da")
        .join(db, "db")
        .crossJoin(F.broadcast(wp))
        .select("da", "db", score.alias("score"))
        .join(dup, ["da", "db"], "left")
        .select("score", F.coalesce("is_dup", F.lit(0)).alias("is_dup"))
    )
    pred = F.sum(F.when(F.col("score") > 0, 1).otherwise(0)).cast("long")
    tp = F.sum(F.when(F.col("score") > 0, F.col("is_dup")).otherwise(0)).cast("long")
    dups = F.sum("is_dup").cast("long")
    return ev.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        pred.alias("n_predicted"),
        tp.alias("true_positives"),
        dups.alias("dups_in_block"),
        # try_divide: a tiny lake can have zero predicted links and/or
        # zero true dups in the block -> P/R/F1 undefined (NULL, like
        # DuckDB's x/0 -> NULL)
        round_half_up(F.try_divide(tp * 1.0, pred), 6).alias("precision_"),
        round_half_up(F.try_divide(tp * 1.0, dups), 6).alias("recall_in_block"),
        round_half_up(F.try_divide(2.0 * tp, pred + dups), 6).alias(
            "f1_in_block"
        ),
    )


# ── q405: cross-source language-model cross-entropy matrix ───────────────────


@register(
    "q405_source_crossentropy",
    """
    WITH tok AS (
      SELECT source,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                t -> t <> '')) AS w
      FROM documents
    ),
    tf AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM tok
      GROUP BY source, w
    ),
    tot AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM tf GROUP BY source
    ),
    vocab AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM tf),
    terms AS (
      SELECT a.source AS source_a, tb.source AS source_b,
             CAST(SUM(CAST(FLOOR(a.c * LN((COALESCE(b.c, 0) + 1) * 1.0
                                          / (tb.n + vv.v)) * 1000000 - 0.5)
                           AS BIGINT)) AS BIGINT) AS tq,
             CAST(MAX(ta.n) AS BIGINT) AS na
      FROM tf a
      JOIN tot ta ON ta.source = a.source
      CROSS JOIN tot tb
      CROSS JOIN vocab vv
      LEFT JOIN tf b ON b.source = tb.source AND b.w = a.w
      GROUP BY a.source, tb.source
    )
    SELECT source_a, source_b,
           FLOOR(-tq / 1000000.0 / na * 1000000 + 0.5) / 1000000
             AS cross_entropy,
           FLOOR(EXP(-tq / 1000000.0 / na) * 100 + 0.5) / 100 AS perplexity,
           CASE WHEN source_a = source_b THEN 1 ELSE 0 END AS is_self
    FROM terms
    ORDER BY source_a, source_b
    """,
    doc="Cross-source unigram cross-entropy matrix: H(A, B) = "
    "-sum_w p_A(w) ln q_B(w) with add-one-smoothed q_B over the union "
    "vocabulary — how well source B's language model predicts source "
    "A's text, reported with perplexity. The diagonal is each "
    "source's self-entropy (lowest by Gibbs' inequality — pinned in "
    "pytest); off-diagonal asymmetry says which source GENERALIZES "
    "(web text usually predicts wiki better than the reverse). The "
    "model-based upgrade of q198's vocabulary JS drift and the "
    "cross-source member of the LM family (q92 per-doc logprob, q208/"
    "q327 bigram): this is the number behind 'train on A, deploy on "
    "B' mixture decisions (q193/q234). Per-word terms are micro-"
    "quantized (floored toward -inf on the negative logs) before the "
    "sums — hash-exact.",
)
def q405_source_crossentropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one token explode + (source, word) count (vocabulary-
    bounded, map-side combinable); the matrix join is vocab x "
    "|sources| with the totals broadcast — never corpus rows."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "source",
            F.explode(
                F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda t: t != "")
            ).alias("w"),
        )
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    tot = tf.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    vocab = tf.agg(F.countDistinct("w").cast("long").alias("v"))
    a = tf.select(
        F.col("source").alias("source_a"), F.col("w").alias("wa"), F.col("c").alias("ca")
    )
    ta = tot.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    tb = tot.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    b = tf.select(
        F.col("source").alias("source_b"), F.col("w").alias("wb"), F.col("c").alias("cb")
    )
    terms = (
        a.join(F.broadcast(ta), "source_a")
        .crossJoin(F.broadcast(tb))
        .crossJoin(F.broadcast(vocab))
        .join(
            b.withColumnRenamed("source_b", "sb2"),
            (F.col("sb2") == F.col("source_b")) & (F.col("wb") == F.col("wa")),
            "left",
        )
    )
    tq_term = F.floor(
        F.col("ca")
        * F.log(
            (F.coalesce("cb", F.lit(0)) + 1) * 1.0 / (F.col("nb") + F.col("v"))
        )
        * 1_000_000
        - 0.5
    ).cast("long")
    g = terms.groupBy("source_a", "source_b").agg(
        F.sum(tq_term).cast("long").alias("tq"),
        F.max("na").cast("long").alias("na"),
    )
    xent = -F.col("tq") / 1_000_000.0 / F.col("na")
    return g.select(
        "source_a",
        "source_b",
        round_half_up(xent, 6).alias("cross_entropy"),
        round_half_up(F.exp(xent), 2).alias("perplexity"),
        F.when(F.col("source_a") == F.col("source_b"), 1).otherwise(0).alias(
            "is_self"
        ),
    ).orderBy("source_a", "source_b")


# ── q406: intra-document discourse cohesion (TextTiling-lite) ────────────────

_Q406_WIN = 10  # tokens per pseudo-sentence block (Hearst's w)


@register(
    "q406_text_cohesion",
    f"""
    WITH tok0 AS (
      SELECT doc_id, source, w,
             (ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) - 1)
               // {_Q406_WIN} AS win
      FROM (
        SELECT doc_id, source,
               unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                  t -> len(t) >= 3)) AS w,
               generate_subscripts(
                 list_filter(string_split_regex(lower(text), '[^a-z]+'),
                             t -> len(t) >= 3), 1) AS pos
        FROM documents
      )
    ),
    tok AS (SELECT DISTINCT doc_id, source, win, w FROM tok0),
    sizes AS (
      SELECT doc_id, source, win, CAST(COUNT(*) AS BIGINT) AS sz
      FROM tok GROUP BY doc_id, source, win
    ),
    inter AS (
      SELECT a.doc_id, a.win, CAST(COUNT(*) AS BIGINT) AS ov
      FROM tok a JOIN tok b
        ON b.doc_id = a.doc_id AND b.win = a.win + 1 AND b.w = a.w
      GROUP BY a.doc_id, a.win
    ),
    pairs AS (
      SELECT s1.doc_id, s1.source,
             COALESCE(i.ov, 0) AS ov,
             s1.sz + s2.sz - COALESCE(i.ov, 0) AS un
      FROM sizes s1
      JOIN sizes s2 ON s2.doc_id = s1.doc_id AND s2.win = s1.win + 1
      LEFT JOIN inter i ON i.doc_id = s1.doc_id AND i.win = s1.win
    ),
    per_doc AS (
      SELECT doc_id, source,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CAST(FLOOR(ov * 1.0 / un * 1000000 + 0.5) AS BIGINT))
                  AS BIGINT) AS coh_q,
             CAST(MIN(CAST(FLOOR(ov * 1.0 / un * 1000000 + 0.5) AS BIGINT))
                  AS BIGINT) AS min_q
      FROM pairs WHERE un > 0
      GROUP BY doc_id, source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           FLOOR(SUM(coh_q) * 1.0 / SUM(n_pairs) / 1000000 * 1000000 + 0.5)
             / 1000000 AS avg_cohesion,
           FLOOR(SUM(CASE WHEN min_q = 0 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*) * 1000000 + 0.5) / 1000000
             AS pct_with_hard_break,
           FLOOR(AVG(n_pairs * 1.0) * 100 + 0.5) / 100 AS avg_pairs_per_doc
    FROM per_doc
    GROUP BY source ORDER BY source
    """,
    doc=f"Intra-document discourse cohesion (TextTiling, Hearst 1997): "
    f"documents split into {_Q406_WIN}-token pseudo-sentence blocks "
    "(Hearst's w — robust to punctuation-free text), adjacent-block "
    "lexical Jaccard over distinct content tokens (len >= 3), per-doc "
    "average cohesion and hard-break share (a zero-overlap adjacent "
    "pair = a topic discontinuity or a template seam), rolled up per "
    "source. The quality dimension the registry's doc filters lack: "
    "q70 measures repetition, q192 surface rules, q92 token fluency — "
    "cohesion catches DISJOINTED docs (scraped fragments, "
    "concatenated snippets) that pass all three. Per-pair Jaccard is "
    "an exact integer ratio quantized before the per-doc sum — "
    "hash-exact.",
)
def q406_text_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the token explode is map-only; the adjacent-block join is
    keyed on (doc_id, win) — fan-out exactly one pair per block, never
    cross-doc; rollups map-side combinable."""
    docs = load_table(spark, sf_dir, "documents")
    tok0 = docs.select(
        "doc_id",
        "source",
        F.posexplode(
            F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda t: F.length(t) >= 3)
        ).alias("pos", "w"),
    ).select(
        "doc_id",
        "source",
        "w",
        F.expr(
            f"CAST((ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) - 1)"
            f" div {_Q406_WIN} AS BIGINT)"
        ).alias("win"),
    )
    tok = tok0.select("doc_id", "source", "win", "w").distinct()
    sizes = tok.groupBy("doc_id", "source", "win").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    b = tok.select(
        F.col("doc_id").alias("bdoc"), (F.col("win") - 1).alias("bwin"),
        F.col("w").alias("bw"),
    )
    inter = (
        tok.join(
            b,
            (F.col("bdoc") == F.col("doc_id"))
            & (F.col("bwin") == F.col("win"))
            & (F.col("bw") == F.col("w")),
        )
        .groupBy("doc_id", "win")
        .agg(F.count(F.lit(1)).cast("long").alias("ov"))
    )
    s2 = sizes.select(
        F.col("doc_id").alias("d2"), (F.col("win") - 1).alias("i2"),
        F.col("sz").alias("sz2"),
    )
    pairs = (
        sizes.join(
            s2, (F.col("d2") == F.col("doc_id")) & (F.col("i2") == F.col("win"))
        )
        .join(inter, ["doc_id", "win"], "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("ov", F.lit(0)).alias("ov"),
            (F.col("sz") + F.col("sz2") - F.coalesce("ov", F.lit(0))).alias("un"),
        )
        .filter(F.col("un") > 0)
    )
    jq = F.floor(F.col("ov") * 1.0 / F.col("un") * 1_000_000 + 0.5).cast("long")
    per_doc = pairs.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(jq).cast("long").alias("coh_q"),
        F.min(jq).cast("long").alias("min_q"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            round_half_up(
                F.sum("coh_q") * 1.0 / F.sum("n_pairs") / 1_000_000, 6
            ).alias("avg_cohesion"),
            round_half_up(
                F.sum(F.when(F.col("min_q") == 0, 1).otherwise(0)) * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("pct_with_hard_break"),
            round_half_up(F.avg(F.col("n_pairs") * 1.0), 2).alias(
                "avg_pairs_per_doc"
            ),
        )
        .orderBy("source")
    )


# ── q407: Flesch-Kincaid readability per source ──────────────────────────────


@register(
    "q407_readability",
    """
    WITH words AS (
      SELECT doc_id, source,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                w -> w <> '')) AS w
      FROM documents
    ),
    syl AS (
      SELECT doc_id, source,
             CAST(GREATEST(len(regexp_extract_all(w, '[aeiouy]+')), 1)
                  AS BIGINT) AS sy
      FROM words
    ),
    sents AS (
      SELECT doc_id,
             CAST(GREATEST(SUM(CASE WHEN len(trim(s)) >= 2
                                    THEN 1 ELSE 0 END), 1) AS BIGINT)
               AS n_sent
      FROM (SELECT doc_id, unnest(string_split_regex(text, '[.!?]')) AS s
            FROM documents)
      GROUP BY doc_id
    ),
    per_doc AS (
      SELECT y.doc_id, y.source,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM(y.sy) AS BIGINT) AS n_syll,
             CAST(MAX(s.n_sent) AS BIGINT) AS n_sent,
             CAST(FLOOR((0.39e0 * COUNT(*) / MAX(s.n_sent)
                         + 11.8e0 * SUM(y.sy) / COUNT(*) - 15.59e0 + 100)
                        * 100 + 0.5) AS BIGINT) - 10000 AS fk_q
      FROM syl y JOIN sents s ON s.doc_id = y.doc_id
      GROUP BY y.doc_id, y.source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           FLOOR(SUM(n_words) * 1.0 / SUM(n_sent) * 10000 + 0.5) / 10000
             AS words_per_sentence,
           FLOOR(SUM(n_syll) * 1.0 / SUM(n_words) * 10000 + 0.5) / 10000
             AS syllables_per_word,
           FLOOR((SUM(fk_q) / 100.0 / COUNT(*) + 1000) * 10000 + 0.5)
             / 10000 - 1000 AS avg_fk_grade,
           FLOOR(SUM(CASE WHEN fk_q > 1200 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*) * 1000000 + 0.5) / 1000000 AS pct_above_grade12
    FROM per_doc
    GROUP BY source ORDER BY source
    """,
    doc="Flesch-Kincaid grade level per source: FK = 0.39 w/s + 11.8 "
    "sy/w - 15.59, with syllables approximated by vowel-group count "
    "(min 1) — the standard heuristic. Per-doc grades are "
    "centi-quantized before the per-source average (exact ratio), so "
    "the report is hash-exact; float coefficient literals use "
    "e-notation to force DOUBLE on both engines (q386 lesson). The "
    "audience-complexity dimension of the quality family: q192's "
    "Gopher rules gate garbage, q92 fluency, q406 cohesion — FK "
    "answers 'WHO can read this', the knob for grade-targeted "
    "mixture weighting (q234).",
)
def q407_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: two map-only explodes (words, sentences) + per-doc and
    per-source map-side-combinable rollups. No joins beyond the
    doc-keyed sentence-count attach."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda w: w != "")
        ).alias("w"),
    )
    syl = words.select(
        "doc_id",
        "source",
        F.greatest(
            F.size(F.expr("regexp_extract_all(w, '[aeiouy]+', 0)")), F.lit(1)
        )
        .cast("long")
        .alias("sy"),
    )
    sents = (
        docs.select("doc_id", F.explode(F.split("text", "[.!?]")).alias("s"))
        .groupBy("doc_id")
        .agg(
            F.greatest(
                F.sum(F.when(F.length(F.trim("s")) >= 2, 1).otherwise(0)),
                F.lit(1),
            )
            .cast("long")
            .alias("n_sent")
        )
    )
    fk = (
        0.39 * F.count(F.lit(1)) / F.max("n_sent")
        + 11.8 * F.sum("sy") / F.count(F.lit(1))
        - 15.59
    )
    per_doc = (
        syl.join(sents, "doc_id")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("sy").cast("long").alias("n_syll"),
            F.max("n_sent").cast("long").alias("n_sent"),
            (F.floor((fk + 100) * 100 + 0.5).cast("long") - 10_000).alias("fk_q"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            round_half_up(F.sum("n_words") * 1.0 / F.sum("n_sent"), 4).alias(
                "words_per_sentence"
            ),
            round_half_up(F.sum("n_syll") * 1.0 / F.sum("n_words"), 4).alias(
                "syllables_per_word"
            ),
            (
                F.floor(
                    (F.sum("fk_q") / 100.0 / F.count(F.lit(1)) + 1000) * 10_000
                    + 0.5
                )
                / 10_000
                - 1000
            ).alias("avg_fk_grade"),
            round_half_up(
                F.sum(F.when(F.col("fk_q") > 1200, 1).otherwise(0)) * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("pct_above_grade12"),
        )
        .orderBy("source")
    )


# ── q408: next-event prediction accuracy (bigram MLE, held-out users) ────────

_Q408_HASH = (
    "CAST(('0x' || substr(md5('next42|' || CAST(user_id AS VARCHAR)), 1, 15))"
    " AS BIGINT)"
)
_Q408_TRAIN = int(0.8 * (1 << 60))


def _q408_sql() -> str:
    return f"""
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev,
             CASE WHEN {_Q408_HASH} < {_Q408_TRAIN} THEN 1 ELSE 0 END
               AS is_train
      FROM events
    ),
    tr AS (SELECT prev, cur FROM seq WHERE prev IS NOT NULL AND is_train = 1),
    te AS (SELECT prev, cur FROM seq WHERE prev IS NOT NULL AND is_train = 0),
    model AS (
      SELECT prev, cur AS pred FROM (
        SELECT prev, cur,
               ROW_NUMBER() OVER (PARTITION BY prev
                 ORDER BY COUNT(*) DESC, cur) AS rk
        FROM tr GROUP BY prev, cur
      ) WHERE rk = 1
    ),
    base AS (
      SELECT cur AS pred FROM (
        SELECT cur, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, cur) AS rk
        FROM tr GROUP BY cur
      ) WHERE rk = 1
    ),
    ev AS (
      SELECT CASE WHEN m.pred = te.cur THEN 1 ELSE 0 END AS hit,
             CASE WHEN b.pred = te.cur THEN 1 ELSE 0 END AS base_hit
      FROM te JOIN model m ON m.prev = te.prev CROSS JOIN base b
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM tr) AS n_train_transitions,
           CAST(COUNT(*) AS BIGINT) AS n_test_transitions,
           FLOOR(SUM(hit) * 1.0 / COUNT(*) * 1000000 + 0.5) / 1000000
             AS top1_accuracy,
           FLOOR(SUM(base_hit) * 1.0 / COUNT(*) * 1000000 + 0.5) / 1000000
             AS baseline_accuracy,
           FLOOR((SUM(hit) * 1.0 / COUNT(*))
                 / (SUM(base_hit) * 1.0 / COUNT(*)) * 10000 + 0.5) / 10000
             AS lift
    FROM ev
    """


@register(
    "q408_next_event_accuracy",
    _q408_sql(),
    doc="Next-event prediction accuracy of the maximum-likelihood "
    "bigram model on HELD-OUT users: 80/20 user split by the stable "
    "md5 hash range (the q124 idiom, so membership never migrates), "
    "argmax transition per source state with deterministic ties, "
    "top-1 accuracy vs the predict-the-mode baseline and the lift. "
    "The proper out-of-sample EVALUATION the sequence family lacked: "
    "q241 measures transition entropy (how predictable in principle), "
    "q350/q398 rank states — this measures how well the fitted chain "
    "actually predicts unseen users, the go/no-go for shipping "
    "next-action recommendations. Exact integer counts and ratios — "
    "hash-exact.",
)
def q408_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one lag window over events, two taxonomy-bounded model
    aggregates (broadcast), one hash-join of test transitions against
    the <=|types| model relation."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("next42|"), F.col("user_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lag("event_type").over(w).alias("prev"),
        (h < _Q408_TRAIN).cast("int").alias("is_train"),
    ).filter(F.col("prev").isNotNull())
    tr = seq.filter(F.col("is_train") == 1).select("prev", "cur")
    te = seq.filter(F.col("is_train") == 0).select("prev", "cur")
    wm = Window.partitionBy("prev").orderBy(F.desc("cnt"), "cur")
    model = (
        tr.groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("prev", F.col("cur").alias("pred"), F.row_number().over(wm).alias("rk"))
        .filter(F.col("rk") == 1)
        .select("prev", "pred")
    )
    wb = Window.orderBy(F.desc("cnt"), "cur")
    base = (
        tr.groupBy("cur")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("cur").alias("bpred"), F.row_number().over(wb).alias("rk"))
        .filter(F.col("rk") == 1)
        .select("bpred")
    )
    n_train = tr.count()
    evl = (
        te.join(F.broadcast(model), "prev")
        .crossJoin(F.broadcast(base))
        .select(
            F.when(F.col("pred") == F.col("cur"), 1).otherwise(0).alias("hit"),
            F.when(F.col("bpred") == F.col("cur"), 1).otherwise(0).alias(
                "base_hit"
            ),
        )
    )
    acc = F.sum("hit") * 1.0 / F.count(F.lit(1))
    bacc = F.sum("base_hit") * 1.0 / F.count(F.lit(1))
    return evl.agg(
        F.lit(n_train).cast("long").alias("n_train_transitions"),
        F.count(F.lit(1)).cast("long").alias("n_test_transitions"),
        round_half_up(acc, 6).alias("top1_accuracy"),
        round_half_up(bacc, 6).alias("baseline_accuracy"),
        round_half_up(acc / bacc, 4).alias("lift"),
    )


# ── q409: newsvendor service-level stocking plan per brand ───────────────────

_Q409_LEVELS = (80, 95, 99)


def _q409_pick(lvl: int) -> str:
    # order-statistic index at ceil(n * lvl / 100), clamped to [1, n]
    return (
        f"MAX(CASE WHEN rn = LEAST(GREATEST((n * {lvl} + 99) // 100, 1), n)"
        " THEN v END)"
    )


@register(
    "q409_newsvendor_plan",
    f"""
    WITH daily AS (
      SELECT p.p_brand, CAST(l.l_shipdate AS DATE) AS day,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS v
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT p_brand, v,
             ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY v, day) AS rn,
             COUNT(*) OVER (PARTITION BY p_brand) AS n
      FROM daily
    )
    SELECT p_brand,
           CAST(MAX(n) AS BIGINT) AS n_days,
           FLOOR(SUM(v) * 1.0 / MAX(n) * 100 + 0.5) / 100 AS mean_daily,
           CAST({_q409_pick(80)} AS BIGINT) AS stock_p80,
           CAST({_q409_pick(95)} AS BIGINT) AS stock_p95,
           CAST({_q409_pick(99)} AS BIGINT) AS stock_p99,
           CAST({_q409_pick(95)} AS BIGINT)
             - CAST(FLOOR(SUM(v) * 1.0 / MAX(n)) AS BIGINT) AS safety_p95
    FROM ranked
    GROUP BY p_brand ORDER BY p_brand
    """,
    doc="Newsvendor service-level stocking plan per brand: the "
    "critical-fractile solution stocks the demand QUANTILE at the "
    "target service level (order-up-to = F^-1(cu/(cu+co))), so the "
    "plan reports exact order-statistic demand quantiles at 80/95/99% "
    "service plus the p95 safety stock over the mean. Quantiles are "
    "deterministic rank picks (ceil(n*p), ties by day) — no "
    "interpolation, hash-exact. The inventory-economics completion "
    "of the demand family: q272 forecasts the MEAN, q395 handles "
    "intermittence, q357 measures overdispersion — the newsvendor "
    "quantile is what a replenishment system actually orders "
    "against, and overdispersion is exactly why p95 >> mean here.",
)
def q409_newsvendor_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one (brand, day) aggregate (map-side combinable), one
    brand-partitioned rank window over the calendar-bounded daily
    relation, one rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    daily = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", F.col("l_shipdate").cast("date").alias("day"))
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("v"))
    )
    wb = Window.partitionBy("p_brand").orderBy("v", "day")
    wp = Window.partitionBy("p_brand")
    ranked = daily.select(
        "p_brand",
        "v",
        F.row_number().over(wb).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )

    def pick(lvl):
        idx = F.least(
            F.greatest(
                F.expr(f"CAST((n * {lvl} + 99) div 100 AS BIGINT)"), F.lit(1)
            ),
            F.col("n"),
        )
        return F.max(F.when(F.col("rn") == idx, F.col("v"))).cast("long")

    return (
        ranked.groupBy("p_brand")
        .agg(
            F.max("n").cast("long").alias("n_days"),
            round_half_up(F.sum("v") * 1.0 / F.max("n"), 2).alias("mean_daily"),
            pick(80).alias("stock_p80"),
            pick(95).alias("stock_p95"),
            pick(99).alias("stock_p99"),
            (
                pick(95) - F.floor(F.sum("v") * 1.0 / F.max("n")).cast("long")
            ).alias("safety_p95"),
        )
        .orderBy("p_brand")
    )


# ── q410: partition-granularity planner (day / week / month) ─────────────────

_Q410_RANGE_DAYS = 7  # the workload: rolling 7-day range scans


@register(
    "q410_partition_granularity_plan",
    f"""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS rows_
      FROM events GROUP BY 1
    ),
    span AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM daily),
    grains AS (
      SELECT 'day' AS grain, 1 AS w
      UNION ALL SELECT 'week', 7
      UNION ALL SELECT 'month', 30
    ),
    parts AS (
      SELECT g.grain, g.w, daily.d // g.w AS pid,
             CAST(SUM(rows_) AS BIGINT) AS prows
      FROM daily CROSS JOIN grains g
      GROUP BY g.grain, g.w, daily.d // g.w
    ),
    stats AS (
      SELECT grain, w, CAST(COUNT(*) AS BIGINT) AS n_partitions,
             CAST(SUM(prows) AS BIGINT) AS total_rows,
             CAST(MAX(prows) AS BIGINT) AS max_partition_rows
      FROM parts GROUP BY grain, w
    ),
    -- every 7-day range start inside the span; partitions touched =
    -- floor((start + 6) / w) - floor(start / w) + 1, rows scanned =
    -- all rows of touched partitions (exact join on pid range)
    starts AS (
      SELECT s.lo + x.r AS start
      FROM span s
      CROSS JOIN (SELECT UNNEST(range(0, 10000)) AS r) x
      WHERE s.lo + x.r + {_Q410_RANGE_DAYS} - 1 <= s.hi
    ),
    touched AS (
      SELECT g.grain, st.start,
             CAST(SUM(p.prows) AS BIGINT) AS scan_rows,
             CAST(COUNT(*) AS BIGINT) AS scan_parts
      FROM starts st
      CROSS JOIN grains g
      JOIN parts p ON p.grain = g.grain
        AND p.pid BETWEEN st.start // g.w
                      AND (st.start + {_Q410_RANGE_DAYS} - 1) // g.w
      GROUP BY g.grain, st.start
    ),
    need AS (
      SELECT st.start, CAST(SUM(d.rows_) AS BIGINT) AS true_rows
      FROM starts st JOIN daily d
        ON d.d BETWEEN st.start AND st.start + {_Q410_RANGE_DAYS} - 1
      GROUP BY st.start
    )
    SELECT s.grain,
           s.n_partitions,
           s.max_partition_rows,
           FLOOR(AVG(t.scan_parts * 1.0) * 100 + 0.5) / 100
             AS avg_partitions_scanned,
           FLOOR(SUM(t.scan_rows) * 1.0 / SUM(n.true_rows) * 10000 + 0.5)
             / 10000 AS read_amplification,
           CAST(ROW_NUMBER() OVER (
             ORDER BY SUM(t.scan_rows) * 1.0 / SUM(n.true_rows)
                      + s.n_partitions * 0.0001, s.grain) AS BIGINT) AS rank
    FROM touched t
    JOIN stats s ON s.grain = t.grain
    JOIN need n ON n.start = t.start
    GROUP BY s.grain, s.n_partitions, s.max_partition_rows
    ORDER BY rank
    """,
    doc=f"Partition-granularity planner: price daily vs weekly vs "
    f"monthly PARTITION BY for a rolling {_Q410_RANGE_DAYS}-day "
    "range-scan workload, EXACTLY — for every feasible range start, "
    "rows scanned = full contents of every partition the range "
    "touches, so read_amplification = scanned/needed, traded against "
    "partition count (the small-files pressure q403 prices). Daily "
    "partitions scan ~1.0x but make 30x the objects; monthly scans up "
    "to ~5x. The ranking penalizes amplification first, object count "
    "as the tie-breaker. Completes the physical-layout planner "
    "family (q321 shuffle width, q396 sort key, q403 compaction): "
    "this is the PARTITION BY decision, priced from the same daily "
    "volume relation. Exact integer row counts — hash-exact.",
)
def q410_partition_granularity_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one per-day count; everything else (grains x starts x
    partitions) is calendar-bounded algebra on broadcast relations."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            .cast("long")
            .alias("d")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("rows_"))
        .localCheckpoint(eager=True)
    )
    span = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    grains = [("day", 1), ("week", 7), ("month", 30)]
    gdf = None
    for gname, w in grains:
        g = daily.select(
            F.lit(gname).alias("grain"),
            F.lit(w).alias("w"),
            F.expr(f"CAST(d div {w} AS BIGINT)").alias("pid"),
            "rows_",
        )
        gdf = g if gdf is None else gdf.unionByName(g)
    parts = gdf.groupBy("grain", "w", "pid").agg(
        F.sum("rows_").cast("long").alias("prows")
    ).localCheckpoint(eager=True)
    stats = parts.groupBy("grain", "w").agg(
        F.count(F.lit(1)).cast("long").alias("n_partitions"),
        F.max("prows").cast("long").alias("max_partition_rows"),
    )
    r = _Q410_RANGE_DAYS
    starts = (
        span.crossJoin(
            spark.range(0, 10_000).select(F.col("id").alias("rr"))
        )
        .filter(F.col("lo") + F.col("rr") + r - 1 <= F.col("hi"))
        .select((F.col("lo") + F.col("rr")).alias("start"))
        .localCheckpoint(eager=True)
    )
    gr = None
    for gname, w in grains:
        gg = starts.select(
            F.lit(gname).alias("grain"),
            "start",
            F.expr(f"CAST(start div {w} AS BIGINT)").alias("p_lo"),
            F.expr(f"CAST((start + {r} - 1) div {w} AS BIGINT)").alias("p_hi"),
        )
        gr = gg if gr is None else gr.unionByName(gg)
    touched = (
        gr.join(
            parts,
            (parts["grain"] == gr["grain"])
            & (parts["pid"] >= F.col("p_lo"))
            & (parts["pid"] <= F.col("p_hi")),
        )
        .drop(parts["grain"])
        .groupBy("grain", "start")
        .agg(
            F.sum("prows").cast("long").alias("scan_rows"),
            F.count(F.lit(1)).cast("long").alias("scan_parts"),
        )
    )
    d2 = daily.select(F.col("d").alias("dd"), F.col("rows_").alias("nr"))
    need = (
        starts.join(
            F.broadcast(d2),
            (F.col("dd") >= F.col("start")) & (F.col("dd") <= F.col("start") + r - 1),
        )
        .groupBy("start")
        .agg(F.sum("nr").cast("long").alias("true_rows"))
    )
    j = touched.join(stats, "grain").join(need, "start")
    amp = F.sum("scan_rows") * 1.0 / F.sum("true_rows")
    g = j.groupBy("grain", "n_partitions", "max_partition_rows").agg(
        round_half_up(F.avg(F.col("scan_parts") * 1.0), 2).alias(
            "avg_partitions_scanned"
        ),
        round_half_up(amp, 4).alias("read_amplification"),
        (amp + F.col("n_partitions") * 0.0001).alias("_cost"),
    )
    wr = Window.orderBy("_cost", "grain")
    return (
        g.select(
            "grain",
            "n_partitions",
            "max_partition_rows",
            "avg_partitions_scanned",
            "read_amplification",
            F.row_number().over(wr).cast("long").alias("rank"),
        )
        .orderBy("rank")
    )


# ── q411: dup-vs-background cosine-similarity margin audit ───────────────────

_Q411_STRIDES = (7, 13, 29)


def _q411_sql() -> str:
    from .llm_ops import _COS
    from .queries import QUERY_REGISTRY as _REGISTRY

    dup = _REGISTRY["q59_embedding_near_dup_lsh"].sql
    cos = _COS.format(a="a.embedding", b="b.embedding")
    bg = " UNION ALL ".join(
        f"SELECT a.vec_id AS va, b.vec_id AS vb FROM embeddings a "
        f"JOIN embeddings b ON b.vec_id = a.vec_id + {s}"
        for s in _Q411_STRIDES
    )
    return f"""
    WITH dup AS ({dup}),
    dp AS (
      SELECT vec_a AS va, vec_b AS vb, 1 AS kind FROM dup
    ),
    bgp AS (
      SELECT va, vb, 0 AS kind FROM ({bg}) x
      WHERE NOT EXISTS (SELECT 1 FROM dp d WHERE d.va = x.va AND d.vb = x.vb)
    ),
    sims AS (
      SELECT p.kind,
             CAST(FLOOR(({cos} + 1) * 10 ) AS BIGINT) AS bin
      FROM (SELECT * FROM dp UNION ALL SELECT * FROM bgp) p
      JOIN embeddings a ON a.vec_id = p.va
      JOIN embeddings b ON b.vec_id = p.vb
    ),
    hist AS (
      SELECT bin,
             CAST(SUM(kind) AS BIGINT) AS cd,
             CAST(SUM(1 - kind) AS BIGINT) AS cb
      FROM sims GROUP BY bin
    ),
    tot AS (
      SELECT CAST(SUM(cd) AS BIGINT) AS nd, CAST(SUM(cb) AS BIGINT) AS nb
      FROM hist
    ),
    cum AS (
      SELECT bin, cd, cb,
             CAST(SUM(cd) OVER (ORDER BY bin DESC) AS BIGINT) AS tp,
             CAST(SUM(cb) OVER (ORDER BY bin DESC) AS BIGINT) AS fp
      FROM hist
    ),
    best AS (
      SELECT bin, tp, fp FROM (
        SELECT bin, tp, fp, t.nd, t.nb,
               ROW_NUMBER() OVER (
                 ORDER BY tp * 1.0 / t.nd - fp * 1.0 / t.nb DESC, bin) AS rk
        FROM cum CROSS JOIN tot t
      ) WHERE rk = 1
    )
    SELECT t.nd AS n_dup_pairs, t.nb AS n_background_pairs,
           FLOOR((SELECT SUM(LEAST(h.cd * t.nb, h.cb * t.nd)) FROM hist h)
                 * 1.0 / (t.nd * t.nb) * 1000000 + 0.5) / 1000000
             AS overlap_coef,
           FLOOR((b.bin / 10.0 - 1) * 100 + 0.5) / 100 AS best_threshold,
           FLOOR(b.tp * 1.0 / t.nd * 1000000 + 0.5) / 1000000 AS tpr_at_best,
           FLOOR(b.fp * 1.0 / t.nb * 1000000 + 0.5) / 1000000 AS fpr_at_best,
           FLOOR((b.tp * 1.0 / t.nd - b.fp * 1.0 / t.nb) * 1000000 + 0.5)
             / 1000000 AS youden_j
    FROM tot t CROSS JOIN best b
    """


@register(
    "q411_similarity_margin",
    _q411_sql(),
    doc="Cosine-similarity margin audit for the embedding near-dup "
    "detector: exact sequential-fold cosines for q59's LSH pair "
    "relation (the positives) vs deterministic stride background "
    "pairs (vec_id+7/13/29, positives anti-joined out), binned at 0.1 "
    "into histograms; reports the distribution overlap coefficient "
    "(sum of bin-wise minima — an exact integer ratio via the "
    "common-denominator trick, q383) and the Youden-optimal "
    "threshold with its TPR/FPR. A small overlap certifies the "
    "embedding space SEPARATES duplicates from background — the "
    "distributional evidence behind q59's fixed threshold, q221's "
    "dedup threshold curve, and q209's recall audit. Hash-exact "
    "throughout.",
)
def q411_similarity_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: positives come from the already-bucketed q59 relation;
    background pairs are stride equi-joins (3N); cosines are the
    Arrow-batched sequential fold (pair_cosine_arrow — bit-identical to
    the interpreted HOF it replaced); everything after is 21-bin
    histogram algebra."""
    from ..operators.similarity import pair_cosine_arrow
    from .queries import QUERY_REGISTRY as _REGISTRY

    emb = load_table(spark, sf_dir, "embeddings")
    dup = (
        _REGISTRY["q59_embedding_near_dup_lsh"].fn(spark, sf_dir)
        .select(F.col("vec_a").alias("va"), F.col("vec_b").alias("vb"))
        .localCheckpoint(eager=True)
    )
    bg = None
    for s in _Q411_STRIDES:
        a = emb.select(F.col("vec_id").alias("va"))
        b = emb.select(
            (F.col("vec_id") - s).alias("va"), F.col("vec_id").alias("vb")
        )
        part = a.join(b, "va").select("va", "vb")
        bg = part if bg is None else bg.unionAll(part)
    bg = bg.join(dup, ["va", "vb"], "left_anti")
    pairs = dup.withColumn("kind", F.lit(1)).unionByName(
        bg.withColumn("kind", F.lit(0))
    )
    ea = emb.select(F.col("vec_id").alias("va"), F.col("embedding").alias("emb_a"))
    eb = emb.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("emb_b"))
    sims = (
        pairs.join(ea, "va")
        .join(eb, "vb")
        .select(
            "kind",
            # Arrow-batched sequential-fold cosine — bit-identical to the
            # interpreted cosine() HOF (pair_cosine_arrow), ~10x less
            # per-pair overhead on the 3N+dup pair relation
            F.floor((pair_cosine_arrow(F.col("emb_a"), F.col("emb_b")) + 1) * 10)
            .cast("long")
            .alias("bin"),
        )
    )
    hist = sims.groupBy("bin").agg(
        F.sum("kind").cast("long").alias("cd"),
        F.sum(1 - F.col("kind")).cast("long").alias("cb"),
    ).localCheckpoint(eager=True)
    tot = hist.agg(
        F.sum("cd").cast("long").alias("nd"), F.sum("cb").cast("long").alias("nb")
    )
    wc = Window.orderBy(F.desc("bin")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "bin",
        F.sum("cd").over(wc).cast("long").alias("tp"),
        F.sum("cb").over(wc).cast("long").alias("fp"),
    )
    best = (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "tp",
            "fp",
            F.row_number()
            .over(
                Window.orderBy(
                    F.desc(F.col("tp") * 1.0 / F.col("nd") - F.col("fp") * 1.0 / F.col("nb")),
                    "bin",
                )
            )
            .alias("rk"),
        )
        .filter(F.col("rk") == 1)
    )
    ov = (
        hist.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.least(F.col("cd") * F.col("nb"), F.col("cb") * F.col("nd"))
            )
            .cast("long")
            .alias("ov_num")
        )
    )
    return (
        tot.crossJoin(F.broadcast(best))
        .crossJoin(F.broadcast(ov))
        .select(
            F.col("nd").alias("n_dup_pairs"),
            F.col("nb").alias("n_background_pairs"),
            round_half_up(
                F.col("ov_num") * 1.0 / (F.col("nd") * F.col("nb")), 6
            ).alias("overlap_coef"),
            (
                F.floor((F.col("bin") / 10.0 - 1) * 100 + 0.5) / 100
            ).alias("best_threshold"),
            round_half_up(F.col("tp") * 1.0 / F.col("nd"), 6).alias("tpr_at_best"),
            round_half_up(F.col("fp") * 1.0 / F.col("nb"), 6).alias("fpr_at_best"),
            round_half_up(
                F.col("tp") * 1.0 / F.col("nd") - F.col("fp") * 1.0 / F.col("nb"), 6
            ).alias("youden_j"),
        )
    )


# ── q412: dedup-graph transitivity audit ─────────────────────────────────────


def _q412_sql() -> str:
    from .queries import QUERY_REGISTRY as _REGISTRY

    dup = _REGISTRY["q24_minhash_lsh_dedup"].sql
    return f"""
    WITH dup AS ({dup}),
    e AS MATERIALIZED (
      SELECT doc_a AS u, doc_b AS v FROM dup
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM dup
    ),
    wedges AS (
      SELECT a.v AS mid, a.u AS x, b.v AS y
      FROM e a JOIN e b ON b.u = a.v AND b.v > a.u
      WHERE a.u <> b.v
    ),
    closed AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_closed
      FROM wedges w JOIN dup d ON d.doc_a = w.x AND d.doc_b = w.y
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_wedges FROM wedges),
    deg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(COUNT(DISTINCT u) AS BIGINT) AS n_docs
      FROM e
    )
    SELECT d.n_pairs // 2 AS n_pairs, d.n_docs,
           t.n_wedges, c.n_closed,
           FLOOR(c.n_closed * 1.0 / t.n_wedges * 1000000 + 0.5) / 1000000
             AS transitivity,
           t.n_wedges - c.n_closed AS open_wedges
    FROM tot t CROSS JOIN closed c CROSS JOIN deg d
    """


@register(
    "q412_dedup_transitivity",
    _q412_sql(),
    doc="Transitivity audit of the near-dup pair graph: the global "
    "clustering coefficient of q24's MinHash relation — of all wedges "
    "(a~m~b through a shared middle), how many are closed (a~b also "
    "detected)? True duplication is an equivalence relation, so LOW "
    "transitivity means threshold noise: q68's connected components "
    "are chaining through weak links and over-merging (the q172 "
    "span-merge failure mode), and the open-wedge count is exactly "
    "how many pairs a verification pass should re-check. Complements "
    "q349 (agreement with the EXACT partition) and q225 (precision/"
    "recall vs planted truth) with a label-free structural check "
    "that runs on any corpus. Pure integer counting on the "
    "pair-bounded relation — hash-exact.",
)
def q412_dedup_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: both joins are keyed on the pair relation (wedges fan out
    by dup-degree, bounded by the hot-bucket caps upstream in q24),
    never corpus rows."""
    from .queries import QUERY_REGISTRY as _REGISTRY

    dup = (
        _REGISTRY["q24_minhash_lsh_dedup"].fn(spark, sf_dir)
        .select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .localCheckpoint(eager=True)
    )
    e = dup.unionAll(dup.select(F.col("v").alias("u"), F.col("u").alias("v")))
    b = e.select(F.col("u").alias("bu"), F.col("v").alias("bv"))
    wedges = (
        e.join(b, (F.col("bu") == F.col("v")) & (F.col("bv") > F.col("u")))
        .filter(F.col("u") != F.col("bv"))
        .select(F.col("u").alias("x"), F.col("bv").alias("y"))
    )
    d2 = dup.select(F.col("u").alias("x"), F.col("v").alias("y")).withColumn(
        "hit", F.lit(1)
    )
    j = wedges.join(d2, ["x", "y"], "left")
    deg = e.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs2"),
        F.countDistinct("u").cast("long").alias("n_docs"),
    )
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_wedges"),
        # outer coalesce: 0 closed wedges (not NULL) when there are no
        # wedges at all, matching the oracle's SUM-over-empty handling
        F.coalesce(F.sum(F.coalesce("hit", F.lit(0))), F.lit(0))
        .cast("long")
        .alias("n_closed"),
    )
    return agg.crossJoin(F.broadcast(deg)).select(
        F.expr("CAST(n_pairs2 div 2 AS BIGINT)").alias("n_pairs"),
        "n_docs",
        "n_wedges",
        "n_closed",
        # try_divide: transitivity undefined (NULL) with zero wedges
        round_half_up(
            F.try_divide(F.col("n_closed") * 1.0, F.col("n_wedges")), 6
        ).alias("transitivity"),
        (F.col("n_wedges") - F.col("n_closed")).alias("open_wedges"),
    )


# ── q413: deseasonalization-quality audit of the q348 decomposition ──────────


@register(
    "q413_deseasonalization_audit",
    """
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM events GROUP BY 1
    ),
    tr AS (
      SELECT d, v,
             CAST(SUM(v) OVER w AS BIGINT) AS s7,
             CAST(COUNT(*) OVER w AS BIGINT) AS c7
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
      SELECT d, v, d % 7 AS wd,
             CAST(FLOOR((v - s7 / 7.0) * 1000000 + 0.5) AS BIGINT) AS detq
      FROM tr WHERE c7 = 7
    ),
    seas AS (
      SELECT wd, CAST(SUM(detq) AS BIGINT) AS sq,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM det GROUP BY wd
    ),
    rem AS (
      SELECT det.wd,
             det.detq AS rawq,
             CAST(FLOOR((det.detq / 1000000.0
                         - seas.sq * 1.0 / seas.cnt / 1000000) * 1000000
                        + 0.5) AS BIGINT) AS remq
      FROM det JOIN seas ON seas.wd = det.wd
    ),
    -- weekday eta^2 on the detrended series and on the remainder:
    -- ssb/sst from 1e-2-quantized per-group terms (q386 discipline)
    g AS (
      SELECT wd, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rawq) AS BIGINT) AS s_raw,
             CAST(SUM(remq) AS BIGINT) AS s_rem,
             CAST(FLOOR(CAST(SUM(rawq * rawq) AS DOUBLE) / 1e4) AS BIGINT)
               AS q_raw,
             CAST(FLOOR(CAST(SUM(remq * remq) AS DOUBLE) / 1e4) AS BIGINT)
               AS q_rem
      FROM rem GROUP BY wd
    ),
    g2 AS (
      SELECT n, s_raw, s_rem, q_raw, q_rem,
             CAST(FLOOR(CAST(s_raw AS DOUBLE) * s_raw / n / 1e4) AS BIGINT)
               AS t_raw,
             CAST(FLOOR(CAST(s_rem AS DOUBLE) * s_rem / n / 1e4) AS BIGINT)
               AS t_rem
      FROM g
    ),
    t AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(SUM(s_raw) AS BIGINT) AS sr,
             CAST(SUM(s_rem) AS BIGINT) AS sm,
             CAST(SUM(t_raw) AS BIGINT) * 1e4 AS braw,
             CAST(SUM(t_rem) AS BIGINT) * 1e4 AS brem,
             CAST(SUM(q_raw) AS BIGINT) * 1e4 AS qraw,
             CAST(SUM(q_rem) AS BIGINT) * 1e4 AS qrem
      FROM g2
    )
    SELECT nn AS n_days,
           FLOOR((braw - CAST(sr AS DOUBLE) * sr / nn)
                 / (qraw - CAST(sr AS DOUBLE) * sr / nn) * 1000000 + 0.5)
             / 1000000 AS eta2_detrended,
           FLOOR((brem - CAST(sm AS DOUBLE) * sm / nn)
                 / (qrem - CAST(sm AS DOUBLE) * sm / nn) * 1000000 + 0.5)
             / 1000000 AS eta2_remainder,
           FLOOR((1 - ((brem - CAST(sm AS DOUBLE) * sm / nn)
                       / (qrem - CAST(sm AS DOUBLE) * sm / nn))
                      / ((braw - CAST(sr AS DOUBLE) * sr / nn)
                         / (qraw - CAST(sr AS DOUBLE) * sr / nn)))
                 * 1000000 + 0.5) / 1000000 AS seasonality_removed,
           CASE WHEN (brem - CAST(sm AS DOUBLE) * sm / nn)
                     / (qrem - CAST(sm AS DOUBLE) * sm / nn) < 0.1
                THEN 1 ELSE 0 END AS residual_clean
    FROM t
    """,
    doc="Deseasonalization-quality audit of q348's additive "
    "decomposition: weekday eta-squared on the DETRENDED series vs on "
    "the REMAINDER after subtracting the weekday means. A good "
    "decomposition moves eta2 from large to ~0; seasonality_removed "
    "= 1 - eta2_rem/eta2_det is the share of weekday variance the "
    "seasonal component captured, and residual_clean certifies the "
    "remainder is safe input for q283's anomaly fences and q305's "
    "changepoint scan (both assume deseasonalized input). Per-group "
    "sums are integer-quantized before cross-group totals and float "
    "factors forced to DOUBLE (the q385/q386 lessons) — hash-exact.",
)
def q413_deseasonalization_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one per-day count; every window/join/rollup after runs on
    the calendar-bounded days relation (q348's shape)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("v"))
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d",
        "v",
        F.sum("v").over(w7).cast("long").alias("s7"),
        F.count(F.lit(1)).over(w7).cast("long").alias("c7"),
    )
    det = tr.filter(F.col("c7") == 7).select(
        "d",
        (F.col("d") % 7).alias("wd"),
        F.floor((F.col("v") - F.col("s7") / 7.0) * 1_000_000 + 0.5)
        .cast("long")
        .alias("detq"),
    )
    seas = det.groupBy("wd").agg(
        F.sum("detq").cast("long").alias("sq"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    rem = det.join(F.broadcast(seas), "wd").select(
        "wd",
        F.col("detq").alias("rawq"),
        F.floor(
            (F.col("detq") / 1_000_000.0 - F.col("sq") * 1.0 / F.col("cnt") / 1_000_000)
            * 1_000_000
            + 0.5
        )
        .cast("long")
        .alias("remq"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    g = rem.groupBy("wd").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rawq").cast("long").alias("s_raw"),
        F.sum("remq").cast("long").alias("s_rem"),
        F.floor(F.sum(dec("rawq") * dec("rawq")).cast("double") / 10_000.0)
        .cast("long")
        .alias("q_raw"),
        F.floor(F.sum(dec("remq") * dec("remq")).cast("double") / 10_000.0)
        .cast("long")
        .alias("q_rem"),
    )
    g2 = g.select(
        "n",
        "s_raw",
        "s_rem",
        "q_raw",
        "q_rem",
        F.floor(F.col("s_raw") * 1.0 * F.col("s_raw") / F.col("n") / 10_000.0)
        .cast("long")
        .alias("t_raw"),
        F.floor(F.col("s_rem") * 1.0 * F.col("s_rem") / F.col("n") / 10_000.0)
        .cast("long")
        .alias("t_rem"),
    )
    t = g2.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("s_raw").cast("long").alias("sr"),
        F.sum("s_rem").cast("long").alias("sm"),
        (F.sum("t_raw").cast("long") * 10_000.0).alias("braw"),
        (F.sum("t_rem").cast("long") * 10_000.0).alias("brem"),
        (F.sum("q_raw").cast("long") * 10_000.0).alias("qraw"),
        (F.sum("q_rem").cast("long") * 10_000.0).alias("qrem"),
    )
    sr, sm, nn = F.col("sr"), F.col("sm"), F.col("nn")
    e_raw = (F.col("braw") - sr.cast("double") * sr / nn) / (
        F.col("qraw") - sr.cast("double") * sr / nn
    )
    e_rem = (F.col("brem") - sm.cast("double") * sm / nn) / (
        F.col("qrem") - sm.cast("double") * sm / nn
    )
    return t.select(
        nn.alias("n_days"),
        round_half_up(e_raw, 6).alias("eta2_detrended"),
        round_half_up(e_rem, 6).alias("eta2_remainder"),
        round_half_up(1 - e_rem / e_raw, 6).alias("seasonality_removed"),
        F.when(e_rem < 0.1, 1).otherwise(0).alias("residual_clean"),
    )
