"""Round-5 additions (second wave): DSIR-style importance resampling,
power-iteration PCA with plan-time literal model state, and graph-ANN
beam search over the materialized k-NN edge artifact.

Reference context: hotgluexyz/target-parquet implements none of these
(SURVEY.md §2.10 — absent categories); each extends an existing family
with a standard LLM-pipeline stage:

* ``sample_dsir_importance`` — Data Selection via Importance Resampling
  (Xie et al. 2023): hashed-bigram bag features, per-bucket smoothed
  log-likelihood ratio between a target domain and the raw corpus,
  per-document importance weights, deterministic top-N selection.  The
  feature table is CARDINALITY-BOUNDED (``_DSIR_B`` buckets) so the
  scoring join is a broadcast: at 100 TB the corpus is scanned twice
  (once to count, once to score) and never shuffled on a data-sized key.
* ``sim_pca_power_iteration`` — the dominant principal component of the
  embedding matrix by distributed power iteration.  Completes the
  "model state as plan-time literals" family (k-means codebook ->
  logreg weights -> BPE merges -> PCA component): each round collects a
  64-float vector, 6dp-quantized, and the oracle replays the rounds as
  unrolled CTEs.  All cross-row sums are integer-microunit quantized
  (the established integer-cents convention) so engine-dependent float
  summation order cannot move the result.
* ``sim_graph_ann_search`` — greedy beam search over the materialized
  k-NN edge artifact (``queries_r7.knn_edge_artifact``): the navigation
  step of graph-based ANN (HNSW's layer-0 walk).  Each hop is a
  broadcast join of a (queries x beam)-row frontier against the edge
  table — the corpus is never rescanned, only gathered for candidate
  nodes — and the whole search is H bounded self-free joins, which is
  exactly the 100 TB shape (frontier always fits in a broadcast).

Oracle contract as everywhere in this repo: identical expressions in
both engines, every computed column aliased identically, floats rounded
in both engines, ranking always tie-broken on an id column.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from target_parquet_spark.operators import similarity as S
from target_parquet_spark.operators import text as X
from target_parquet_spark.queries import query
from target_parquet_spark.queries_ext import _SQL_DOT, SQL_TOKS, td

# ---------------------------------------------------------------------------
# DSIR-style importance resampling (hashed-ngram log-likelihood ratio)
# ---------------------------------------------------------------------------

_DSIR_B = 512  # hashed-bigram buckets — the bounded feature space
_DSIR_TOP = 100  # selection budget
_DSIR_TARGET = ("src0", "src1")  # the "domain we want more of"

_SQL_BIGRAM_BUCKET = (
    "('0x' || substr(md5(t[i] || ' ' || t[i + 1]), 1, 8))::BIGINT % " + str(_DSIR_B)
)


# The oracle SQL for sample_dsir_importance (registered below — keep the
# decorator IMMEDIATELY above the query function).
_SQL_DSIR = f"""
    WITH tok AS (
      SELECT doc_id, source, {SQL_TOKS.format(c='text')} AS t FROM documents),
    big AS (
      SELECT doc_id, source, {_SQL_BIGRAM_BUCKET} AS b
      FROM tok, unnest(range(1, len(t))) AS u(i)),
    cnt AS (
      SELECT b, CAST(count(*) AS BIGINT) AS cq,
             CAST(count(*) FILTER (WHERE source IN
               {str(tuple(_DSIR_TARGET))}) AS BIGINT) AS ct
      FROM big GROUP BY b),
    tot AS (
      SELECT CAST(sum(cq) AS BIGINT) AS qn, CAST(sum(ct) AS BIGINT) AS tn
      FROM cnt),
    llr AS (
      SELECT b, CAST(round((ln((ct + 1.0) / (tn + {_DSIR_B}))
                            - ln((cq + 1.0) / (qn + {_DSIR_B})))
                           * 1000000) AS BIGINT) AS w
      FROM cnt, tot),
    sc AS (
      SELECT big.doc_id, big.source, CAST(sum(llr.w) AS BIGINT) AS llr_micro
      FROM big JOIN llr USING (b) GROUP BY big.doc_id, big.source)
    SELECT doc_id, source, llr_micro
    FROM sc ORDER BY llr_micro DESC, doc_id LIMIT {_DSIR_TOP}
    """


def _dsir_bucket(g):
    """Hashed-bigram feature bucket (the 32-bit md5 prefix convention)."""
    return (
        F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long") % _DSIR_B
    )


def dsir_llr_state(spark, docs) -> list[tuple[int, int]]:
    """Train the DSIR feature state: per-bucket smoothed log-likelihood
    ratios as integer micro-units — at most ``_DSIR_B`` (bucket, w)
    pairs, i.e. bounded literal model state (the k-means-codebook
    convention).  One corpus scan; the quantization runs through Spark's
    own round so the oracle's arithmetic is matched exactly."""
    toks = docs.select("source", X.tokens(F.col("text")).alias("t"))
    bigrams = X.bigrams(F.col("t"), lambda x, y: F.concat(x, F.lit(" "), y))
    big = toks.select("source", F.explode(bigrams).alias("g")).select(
        "source", _dsir_bucket(F.col("g")).alias("b")
    )
    cnt = big.groupBy("b").agg(
        F.count(F.lit(1)).alias("cq"),
        F.count(
            F.when(F.col("source").isin(*_DSIR_TARGET), F.lit(1))
        ).alias("ct"),
    )
    cnt_rows = [(int(r["b"]), int(r["cq"]), int(r["ct"])) for r in cnt.collect()]
    qn = sum(r[1] for r in cnt_rows)
    tn = sum(r[2] for r in cnt_rows)
    cnt_lit = spark.createDataFrame(cnt_rows, "b long, cq long, ct long")
    tot = spark.createDataFrame([(qn, tn)], "qn long, tn long")
    llr = cnt_lit.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            (
                F.log((F.col("ct") + F.lit(1.0)) / (F.col("tn") + F.lit(_DSIR_B)))
                - F.log(
                    (F.col("cq") + F.lit(1.0)) / (F.col("qn") + F.lit(_DSIR_B))
                )
            )
            * 1000000
        )
        .cast("long")
        .alias("w"),
    )
    return [(int(r["b"]), int(r["w"])) for r in llr.collect()]


def dsir_score_col(llr: list[tuple[int, int]], text_col) -> "F.Column":
    """Stateless per-row DSIR score: sum of per-bigram llr micro-units
    looked up in a LITERAL map — no explode, no join, no shuffle, so the
    identical expression scores a batch scan and a structured stream
    (``streaming/dsir_gate.py``).  Bigram buckets unseen at training
    time contribute 0 (matching the batch inner join, where they simply
    have no llr row)."""
    m = F.map_from_arrays(
        F.array(*[F.lit(b) for b, _ in llr]),
        F.array(*[F.lit(w) for _, w in llr]),
    )
    toks = X.tokens(text_col)
    bigrams = X.bigrams(toks, lambda x, y: F.concat(x, F.lit(" "), y))
    per = F.transform(
        bigrams,
        lambda g: F.coalesce(
            F.element_at(m, _dsir_bucket(g)), F.lit(0).cast("long")
        ),
    )
    return F.aggregate(
        per, F.lit(0).cast("long"), lambda acc, v: acc + v
    )


@query("sample_dsir_importance", _SQL_DSIR)
def sample_dsir_importance(spark, sf_dir):
    """DSIR-style data selection: score every document by the smoothed
    log-likelihood ratio of its hashed-bigram bag under the target
    domain (``_DSIR_TARGET`` sources) vs the raw corpus, then take the
    top ``_DSIR_TOP`` by weight (doc_id tie-break).

    Per-feature log-ratios are quantized to integer micro-units BEFORE
    the per-document sum, so document scores are exact BIGINT sums —
    engine- and partitioning-independent (the integer-cents convention).

    Plan shape for 100 TB: pass 1 (``dsir_llr_state``) aggregates bigram
    instances into a bounded ``_DSIR_B``-row feature table collected as
    literal state; pass 2 scores every doc with a pure column expression
    (``dsir_score_col`` — literal-map lookups folded per row, no explode
    and no join) and TakeOrdered picks the budget.  The ONLY shuffle in
    the whole job is TakeOrdered's final gather.  Docs with no bigrams
    are excluded (matching the oracle's unnest semantics).
    """
    docs = td(spark, sf_dir, "documents").select("doc_id", "source", "text")
    llr = dsir_llr_state(spark, docs)
    score = dsir_score_col(llr, F.col("text"))
    sc = docs.filter(F.size(X.tokens(F.col("text"))) >= 2).select(
        "doc_id", "source", score.alias("llr_micro")
    )
    return sc.orderBy(F.desc("llr_micro"), "doc_id").limit(_DSIR_TOP)


# ---------------------------------------------------------------------------
# power-iteration PCA (distributed linear algebra, literal model state)
# ---------------------------------------------------------------------------

_PCA_DIM = 64
_PCA_ROUNDS = 2
_V0 = [0.125] * _PCA_DIM  # 1/sqrt(64) — exactly representable


def _sql_vec_literal(v: list[float]) -> str:
    return "(" + "[" + ", ".join(repr(x) for x in v) + "]" + ")"


def _sql_pca_round(r: int, prefix: str = "", src: str = "embeddings") -> str:
    """One unrolled power-iteration round: integer-microunit contribution
    sums per dimension, exact-integer norm, 6dp-quantized component.
    ``prefix`` namespaces the CTEs so multiple power-iteration passes
    (the deflation query) can coexist in one WITH chain; ``src`` is the
    vector table the pass iterates over."""
    prev_dot = _SQL_DOT.format(
        a="embedding",
        b=_sql_vec_literal(_V0) if r == 1 else f"v{prefix}{r - 1}.v",
    )
    join_prev = f", v{prefix}{r - 1}" if r > 1 else ""
    return f"""
    d{prefix}{r} AS (SELECT embedding, {prev_dot} AS d FROM {src}{join_prev}),
    r{prefix}{r} AS (SELECT j,
                    sum(CAST(round((d * CAST(embedding[j] AS DOUBLE))
                                   * 1000000) AS BIGINT)) AS s
             FROM d{prefix}{r}, unnest(range(1, len(embedding) + 1)) AS t(j)
             GROUP BY j),
    n{prefix}{r} AS (SELECT sqrt(sum(CAST(round(((s / 1000000.0)
                                                 * (s / 1000000.0))
                                        * 1000000) AS BIGINT))
                         / 1000000.0) AS nrm FROM r{prefix}{r}),
    v{prefix}{r} AS (SELECT list(round(s / 1000000.0 / nrm, 6) ORDER BY j) AS v
             FROM r{prefix}{r}, n{prefix}{r})"""


def _sql_pca() -> str:
    rounds = [_sql_pca_round(r) for r in range(1, _PCA_ROUNDS + 1)]
    final_dot = _SQL_DOT.format(a="embedding", b=f"v{_PCA_ROUNDS}.v")
    return f"""
    WITH {','.join(rounds)},
    p AS (SELECT label,
                 CAST(round(({final_dot}) * 1000000) AS BIGINT) AS pi
          FROM embeddings, v{_PCA_ROUNDS})
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(sum(pi) / 1000000.0 / count(*), 4) AS mean_proj,
           round(sqrt(greatest(
             sum(CAST(round(((pi / 1000000.0) * (pi / 1000000.0))
                            * 1000000) AS BIGINT)) / 1000000.0 / count(*)
             - (sum(pi) / 1000000.0 / count(*))
               * (sum(pi) / 1000000.0 / count(*)), 0)), 4) AS sd_proj
    FROM p GROUP BY label
    """


def _spark_round(x: float, scale: int) -> float:
    """Spark's ``round(double, scale)`` replayed driver-side.

    Spark's Round on DoubleType is ``BigDecimal.valueOf(x).setScale(
    scale, HALF_UP).toDouble`` where ``BigDecimal.valueOf`` parses
    ``Double.toString(x)`` — the shortest decimal that round-trips.
    Python's ``repr(float)`` is the same shortest-round-trip decimal,
    so ``Decimal(repr(x))`` reproduces the BigDecimal and HALF_UP is
    ``decimal.ROUND_HALF_UP`` (round half away from zero, either sign).
    Pinned bit-identical against F.round by
    ``tests/test_r8.py::test_spark_round_matches_f_round``.
    """
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(repr(x)).quantize(
        Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP
    )
    return float(q)


def pca_power_component(spark, sf_dir, n_rounds: int = _PCA_ROUNDS, emb=None):
    """Train the dominant principal component by power iteration and
    return it as a plain Python list (the literal model state).

    Each round: s_j = sum_i round((x_i . v) * x_ij * 1e6) as exact
    BIGINT sums (one scan, posexplode + map-side combine -> 64-row
    shuffle), then v' = round(s / ||s||, 6).  ONE Spark action per
    round: the 64 exact-integer sums are collected and the norm + 6dp
    quantization run driver-side over those 64 longs — pure,
    deterministic double arithmetic (IEEE division and ``math.sqrt``
    are exact; the HALF_UP rounding replays Spark's own ``round`` via
    :func:`_spark_round`, so the values still match the SQL oracle
    bit-for-bit).  Profiled before this change (r10): the two LOCAL
    64-row Spark jobs that previously did this quantization cost as
    much wall-clock per round (~1.1 s) as the corpus scan itself —
    pure plan/launch overhead on 64 rows (guide §5: the driver should
    do no DATA work; 64 longs of model state is not data work).
    Model state per round is 64 floats — bounded, like the k-means
    codebook (`operators/similarity.kmeans_codebook`).

    ``emb`` overrides the vector frame (a single ``embedding`` column) —
    the deflation pass feeds residual vectors through the same rounds.

    A 64-parallel-long-sum agg rewrite of this loop (no posexplode, one
    codegen pass) was benchmarked in the r10 optimization round and
    REGRESSED 2x (sim_pca_power_iteration 3.1s -> 6.9s at sf0.1): the
    64 wide round/cast aggregate expressions re-planned per round (the
    centroid literals change every round) cost more in analysis +
    codegen than the 64x row explosion costs to execute.  The explode
    keeps the per-round plan tiny and the shuffle is 64 rows.
    """
    import math

    if emb is None:
        emb = td(spark, sf_dir, "embeddings").select("embedding")
    v = list(_V0)
    for _ in range(n_rounds):
        lit_v = F.array(*[F.lit(x) for x in v])
        d = S.dot(F.col("embedding"), lit_v)
        ex = emb.select(d.alias("d"), F.posexplode("embedding").alias("j", "x"))
        r = ex.groupBy("j").agg(
            F.sum(
                F.round((F.col("d") * F.col("x").cast("double")) * 1000000)
                .cast("long")
            ).alias("s")
        )
        s = [0] * _PCA_DIM
        for row in r.collect():
            s[int(row["j"])] = int(row["s"])
        # norm: sum of round((s/1e6)^2 * 1e6) as exact longs.  float(sj)
        # FIRST: Spark casts the long to double before dividing, and
        # Python's int/float division is correctly rounded from the
        # exact value — different double-rounding once |s| > 2^53.  The
        # double -> long cast in Spark truncates toward zero, as int()
        # does on a float.
        n2 = sum(
            int(
                _spark_round(
                    (float(sj) / 1000000.0) * (float(sj) / 1000000.0) * 1000000.0,
                    0,
                )
            )
            for sj in s
        )
        # exact long sum, THEN long->double cast (Java order), then divide
        nrm = math.sqrt(float(n2) / 1000000.0)
        v = [_spark_round(float(sj) / 1000000.0 / nrm, 6) for sj in s]
    return v


@query("sim_pca_power_iteration", _sql_pca())
def sim_pca_power_iteration(spark, sf_dir):
    """Dominant-PC projection audit: train the top principal component
    with ``pca_power_component`` (2 power-iteration rounds, literal
    model state), then report per-label projection statistics — the
    drift probe an embedding pipeline runs to see whether the dominant
    direction separates (or has collapsed onto) the label structure.

    Every cross-row float sum is integer-microunit quantized, so the
    result is independent of partitioning and engine; the oracle replays
    the training rounds as unrolled CTEs over the same arithmetic.

    r11: a cut of the scan was tried here (the deflation treatment) and
    measured a small LOSS (abbench 1.68 -> 1.78 s): three cheap
    column-pruned parquet scans beat storing the corpus-sized cut.  The
    cut pays only when the replayed subtree is expensive (deflation's
    residual transform) — left uncut.
    """
    v = pca_power_component(spark, sf_dir)
    emb = td(spark, sf_dir, "embeddings").select("label", "embedding")
    lit_v = F.array(*[F.lit(x) for x in v])
    pi = F.round(S.dot(F.col("embedding"), lit_v, 64) * 1000000).cast("long")
    p = emb.select("label", pi.alias("pi"))
    n = F.count(F.lit(1))
    s1 = F.sum("pi")
    s2 = F.sum(
        F.round(
            ((F.col("pi") / 1000000.0) * (F.col("pi") / 1000000.0)) * 1000000
        ).cast("long")
    )
    mean = s1 / 1000000.0 / n
    return p.groupBy("label").agg(
        n.cast("long").alias("n_vecs"),
        F.round(mean, 4).alias("mean_proj"),
        F.round(
            F.sqrt(F.greatest(s2 / 1000000.0 / n - mean * mean, F.lit(0.0))), 4
        ).alias("sd_proj"),
    )


# ---------------------------------------------------------------------------
# top-2 PCA by deflation (residual power iteration)
# ---------------------------------------------------------------------------


def _sql_pca_deflation() -> str:
    """Two power-iteration passes in one WITH chain: pass a over the raw
    embeddings yields v_a{R}; the residual CTE subtracts each vector's
    v1-projection; pass b over the residuals yields the second
    component; both projections of the ORIGINAL vectors are summarized
    per label."""
    R = _PCA_ROUNDS
    pass_a = [_sql_pca_round(r, prefix="a") for r in range(1, R + 1)]
    pass_b = [_sql_pca_round(r, prefix="b", src="res") for r in range(1, R + 1)]
    dot_v1 = _SQL_DOT.format(a="embedding", b=f"va{R}.v")
    dot_v2 = _SQL_DOT.format(a="embedding", b=f"vb{R}.v")
    return f"""
    WITH {','.join(pass_a)},
    res AS (
      SELECT label,
             list_transform(range(1, len(embedding) + 1),
                            j -> CAST(embedding[j] AS DOUBLE)
                                 - ({dot_v1}) * v[j]) AS embedding
      FROM embeddings, va{R}),
    {','.join(pass_b)},
    p AS (SELECT label,
                 CAST(round(({dot_v1}) * 1000000) AS BIGINT) AS p1,
                 CAST(round(({dot_v2}) * 1000000) AS BIGINT) AS p2
          FROM embeddings, va{R}, vb{R})
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(sum(p1) / 1000000.0 / count(*), 4) AS mean_p1,
           round(sqrt(greatest(
             sum(CAST(round(((p1 / 1000000.0) * (p1 / 1000000.0))
                            * 1000000) AS BIGINT)) / 1000000.0 / count(*)
             - (sum(p1) / 1000000.0 / count(*))
               * (sum(p1) / 1000000.0 / count(*)), 0)), 4) AS sd_p1,
           round(sum(p2) / 1000000.0 / count(*), 4) AS mean_p2,
           round(sqrt(greatest(
             sum(CAST(round(((p2 / 1000000.0) * (p2 / 1000000.0))
                            * 1000000) AS BIGINT)) / 1000000.0 / count(*)
             - (sum(p2) / 1000000.0 / count(*))
               * (sum(p2) / 1000000.0 / count(*)), 0)), 4) AS sd_p2
    FROM p GROUP BY label
    """


def pca_top2_components(spark, sf_dir, emb=None):
    """(v1, v2): dominant component over the raw embeddings, second
    component over the v1-deflated residuals — both via the same
    quantized power rounds (``pca_power_component``).

    ``emb`` overrides the raw vector frame (a single ``embedding``
    column) so a caller holding a lineage cut of the scan can feed both
    passes from it.  The residual table is itself cut (``mat``): pass 2
    referenced it once per power round plus nothing else, but each
    reference replayed the whole scan + v1-projection + 64-wide
    zip_with subtraction (r11 before-plan: the deflation pipeline
    appears twice); with the cut the deflated corpus is derived ONCE
    and both rounds scan the stored blocks (VERDICT r10 #1)."""
    from target_parquet_spark.lineage import mat

    if emb is None:
        emb = td(spark, sf_dir, "embeddings").select("embedding")
    v1 = pca_power_component(spark, sf_dir, emb=emb)
    lit1 = F.array(*[F.lit(x) for x in v1])
    # two-stage select: compute d once per row, THEN subtract — inlining
    # the dot into the zip_with lambda would re-evaluate it per element
    with_d = emb.select(
        "embedding", S.dot(F.col("embedding"), lit1, 64).alias("d")
    )
    res = mat(
        with_d.select(
            F.zip_with(
                F.col("embedding"),
                lit1,
                lambda x, w: x.cast("double") - F.col("d") * w,
            ).alias("embedding")
        )
    )
    v2 = pca_power_component(spark, sf_dir, emb=res)
    return v1, v2


@query("sim_pca_deflation", _sql_pca_deflation())
def sim_pca_deflation(spark, sf_dir):
    """Top-2 principal components by deflation: the 2-D projection map
    per label — the embedding-drift dashboard's scatter axes.  Pass 1 is
    ``sim_pca_power_iteration``'s training; pass 2 runs the identical
    quantized power rounds over the v1-deflated residuals (computed once
    per row, then re-used across all 64 lambda elements).  The oracle
    replays BOTH passes plus the residual transform as one CTE chain.

    At 100 TB each pass is the same 2-scans-per-round shape as the top
    component; deflation adds one projection expression, not a shuffle.

    r11 (VERDICT r10 #1): the residual table is cut inside
    ``pca_top2_components`` so pass 2 derives the deflated corpus ONCE
    (each pass-2 power round previously replayed scan + v1-projection +
    the 64-wide zip_with subtraction).  A cut of the raw (label,
    embedding) scan itself was also tried and reverted: like
    sim_pca_power_iteration, cheap column-pruned parquet scans beat
    storing a corpus-sized cut (abbench A/B).
    """
    v1, v2 = pca_top2_components(spark, sf_dir)
    emb = td(spark, sf_dir, "embeddings").select("label", "embedding")
    lit1 = F.array(*[F.lit(x) for x in v1])
    lit2 = F.array(*[F.lit(x) for x in v2])
    p1 = F.round(S.dot(F.col("embedding"), lit1, 64) * 1000000).cast("long")
    p2 = F.round(S.dot(F.col("embedding"), lit2, 64) * 1000000).cast("long")
    p = emb.select("label", p1.alias("p1"), p2.alias("p2"))
    n = F.count(F.lit(1))

    def stats(c, suffix):
        s1 = F.sum(c)
        s2 = F.sum(
            F.round(((c / 1000000.0) * (c / 1000000.0)) * 1000000).cast("long")
        )
        mean = s1 / 1000000.0 / n
        return [
            F.round(mean, 4).alias(f"mean_{suffix}"),
            F.round(
                F.sqrt(
                    F.greatest(s2 / 1000000.0 / n - mean * mean, F.lit(0.0))
                ),
                4,
            ).alias(f"sd_{suffix}"),
        ]

    return p.groupBy("label").agg(
        n.cast("long").alias("n_vecs"),
        *stats(F.col("p1"), "p1"),
        *stats(F.col("p2"), "p2"),
    )


# ---------------------------------------------------------------------------
# graph-ANN beam search over the materialized k-NN edge artifact
# ---------------------------------------------------------------------------

_ANN_HOPS = 3
_ANN_BEAM = 8
_ANN_K = 5
_ANN_QMOD = 100  # query stratum: vec_id % _ANN_QMOD == 7
_ANN_PROBES = 4  # entry components probed per query (multiprobe routing)


def _sql_ann_score() -> str:
    return (
        "round("
        + _SQL_DOT.format(a="nb.embedding", b="q.qe")
        + " / (q.qn * nb.nrm), 6)"
    )


def _sql_graph_ann_prefix() -> str:
    """The shared CTE chain (graph, queries, multiprobe entries, hop
    frontiers f0..f{H}) composed onto by BOTH the search final SELECT
    and the recall harness — structural reuse, no string surgery."""
    from target_parquet_spark.queries_r6 import _SQL_KNN, _SQL_SYM_DEG

    score = _sql_ann_score()
    hops = []
    for h in range(1, _ANN_HOPS + 1):
        hops.append(f"""
    f{h} AS (
      SELECT qid, node, score FROM (
        SELECT qid, node, score,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY score DESC, node) AS rn
        FROM (SELECT DISTINCT qid, node, score FROM (
                SELECT p.qid, s.v AS node, {score} AS score
                FROM f{h - 1} p
                JOIN sym s ON s.u = p.node
                JOIN b nb ON nb.vec_id = s.v
                JOIN q ON q.qid = p.qid
                UNION ALL
                SELECT qid, node, score FROM f{h - 1}) z)) w
      WHERE rn <= {_ANN_BEAM})""")
    hops_sql = ",".join(hops)
    return f"""
    WITH {_SQL_KNN},
    {_SQL_SYM_DEG},
    q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn
          FROM b WHERE vec_id % {_ANN_QMOD} = 7),
    gnodes AS (SELECT DISTINCT u FROM sym),
    ent AS (SELECT bb.bucket, min(g.u) AS node
            FROM gnodes g JOIN b bb ON bb.vec_id = g.u
            GROUP BY bb.bucket),
    f0 AS (SELECT qid, node, score FROM (
             SELECT qid, node, score,
                    row_number() OVER (PARTITION BY qid
                                       ORDER BY score DESC, node) AS rn
             FROM (SELECT q.qid, nb.vec_id AS node, {score} AS score
                   FROM q CROSS JOIN ent e
                   JOIN b nb ON nb.vec_id = e.node) s) t
           WHERE rn <= {_ANN_PROBES}),
    {hops_sql}"""


def _sql_graph_ann() -> str:
    return f"""{_sql_graph_ann_prefix()}
    SELECT qid, rn AS rk, node, score FROM (
      SELECT qid, node, score,
             row_number() OVER (PARTITION BY qid
                                ORDER BY score DESC, node) AS rn
      FROM f{_ANN_HOPS}) t
    WHERE rn <= {_ANN_K}
    """


def graph_ann_search(
    spark,
    sf_dir,
    hops: int = _ANN_HOPS,
    beam: int = _ANN_BEAM,
    k: int = _ANN_K,
):
    """Greedy beam search over the materialized k-NN graph — HNSW's
    layer-0 navigation re-expressed as H bounded joins.

    Every query is ROUTED to entry nodes by multiprobe: one candidate
    entry per LSH bucket (the min graph-node id), the top
    ``_ANN_PROBES`` by cosine seed the frontier.  The LSH-bucketed kNN
    graph is disconnected across buckets by construction, so a single
    global entry could never leave its component (measured recall ~0
    before routing, 0.32 with own-bucket routing, higher with
    multiprobe); this is the IVF-route-then-walk hybrid production
    graph-ANN systems use.  Each hop expands the current frontier
    through the symmetrized edge table, scores candidates by exact
    cosine, and keeps the top ``beam`` per query (score DESC, node id
    tie-break).  The frontier is (queries x beam) rows, so every hop
    join BROADCASTS the frontier against the edge artifact: the corpus
    is never rescanned — only candidate embeddings are gathered.
    Returns top ``k`` per query.
    """
    from target_parquet_spark.lineage import mat
    from target_parquet_spark.queries_r6 import _symmetrize_degrees
    from target_parquet_spark.queries_r7 import knn_edge_artifact

    edges = knn_edge_artifact(spark, sf_dir)
    sym, _deg = _symmetrize_degrees(edges)
    emb = td(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # b is the routing index (id, vec, bucket, norm): scored against the
    # frontier once per hop — materialized so the bucket/norm expressions
    # run once, not once per lineage copy (r10 audit: 136 parquet scans
    # in this query's plan before the cuts).
    b = mat(
        emb.select(
            "vec_id",
            "embedding",
            S.lsh_bucket(F.col("embedding"), n_planes=4).alias("bucket"),
            S.norm(F.col("embedding"), 64).alias("nrm"),
        )
    )
    q = b.filter(F.col("vec_id") % _ANN_QMOD == 7).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    score = F.round(
        S.dot(F.col("ne"), F.col("qe"), 64) / (F.col("qn") * F.col("nn")), 6
    )
    nodes = b.select(
        F.col("vec_id").alias("node"),
        F.col("embedding").alias("ne"),
        F.col("nrm").alias("nn"),
    )
    gnodes = sym.select("u").distinct()
    ent = (
        gnodes.join(b, gnodes["u"] == b["vec_id"])
        .groupBy("bucket")
        .agg(F.min("u").alias("node"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("node"))
    f = mat(
        q.crossJoin(F.broadcast(ent.select("node")))
        .join(nodes, "node")
        .select("qid", "node", score.alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _ANN_PROBES)
        .drop("rn")
    )
    for _ in range(hops):
        # The frontier is provably <= (queries x beam) rows: broadcast it
        # explicitly so the hop never shuffles the edge artifact or the
        # corpus — at 100 TB the statistics alone would not know this.
        # Each hop's frontier is materialized (`mat`): the loop body
        # references f TWICE (expansion + union), so without the cut the
        # lineage DOUBLES per hop — the r10 plan audit read 2^hops
        # replays (136-144 parquet scans at H=3) of the whole routing
        # pipeline.  The frontier is (queries x beam) rows — trivially
        # block-sized.
        exp = (
            F.broadcast(f).join(sym, f["node"] == sym["u"])
            .select("qid", F.col("v").alias("node"))
        )
        exp = (
            F.broadcast(exp)
            .join(nodes, "node")
            .join(F.broadcast(q), "qid")
            .select("qid", "node", score.alias("score"))
        )
        uni = exp.unionByName(f.select("qid", "node", "score")).distinct()
        f = mat(
            uni.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= beam)
            .drop("rn")
        )
    return (
        f.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", F.col("rn").alias("rk"), "node", "score")
    )


@query("sim_graph_ann_search", _sql_graph_ann())
def sim_graph_ann_search(spark, sf_dir):
    """Graph-based ANN: beam search (H=3 hops, beam 8, top-5) over the
    materialized k-NN edge artifact for the ``vec_id % 100 == 7`` query
    stratum.  See ``graph_ann_search`` for the plan-shape argument; the
    oracle unrolls the hops as CTEs over the SAME edge fragment
    (`queries_r6._SQL_KNN`) used by every other graph op, so the graph
    being searched cannot drift from the graph being audited.
    """
    return graph_ann_search(spark, sf_dir)


def _sql_graph_ann_recall() -> str:
    """Recall@k of the beam search vs the exact top-k over graph nodes:
    compose a brute-force truth CTE and the hit-count join onto the
    shared search CTE chain (``_sql_graph_ann_prefix``)."""
    score = _sql_ann_score()
    return f"""{_sql_graph_ann_prefix()},
    got AS (
      SELECT qid, node FROM (
        SELECT qid, node,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY score DESC, node) AS rn
        FROM f{_ANN_HOPS}) t
      WHERE rn <= {_ANN_K}),
    nodes AS (SELECT DISTINCT u FROM sym),
    truth AS (
      SELECT qid, node FROM (
        SELECT s.qid, s.node,
               row_number() OVER (PARTITION BY s.qid
                                  ORDER BY s.score DESC, s.node) AS rn
        FROM (SELECT q.qid, nb.vec_id AS node, {score} AS score
              FROM q, b nb JOIN nodes n ON n.u = nb.vec_id) s) t
      WHERE rn <= {_ANN_K})
    SELECT t.qid,
           CAST(count(g.node) AS BIGINT) AS hits,
           round(count(g.node) / {_ANN_K}.0, 4) AS recall_at_k
    FROM truth t LEFT JOIN got g USING (qid, node)
    GROUP BY t.qid
    """


@query("sim_graph_ann_recall", _sql_graph_ann_recall())
def sim_graph_ann_recall(spark, sf_dir):
    """The tuning harness for ``sim_graph_ann_search``: recall@k of the
    beam search against the exact cosine top-k over the graph's node
    set (the same disjoint-eval pattern as ``sim_ivf_recall`` and
    ``dedup_lsh_recall``).  The brute-force truth side is the documented
    exact baseline — queries x nodes with the query stratum broadcast —
    and the production path being measured is the H-hop beam walk.
    """
    from target_parquet_spark.queries_r6 import _symmetrize_degrees
    from target_parquet_spark.queries_r7 import knn_edge_artifact

    got = graph_ann_search(spark, sf_dir).select(
        "qid", "node", F.lit(1).alias("hit")
    )
    sym, _deg = _symmetrize_degrees(knn_edge_artifact(spark, sf_dir))
    emb = td(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    b = emb.select(
        "vec_id", "embedding", S.norm(F.col("embedding"), 64).alias("nrm")
    )
    q = b.filter(F.col("vec_id") % _ANN_QMOD == 7).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    cand = sym.select(F.col("u").alias("node")).distinct().join(
        b.select(
            F.col("vec_id").alias("node"),
            F.col("embedding").alias("ne"),
            F.col("nrm").alias("nn"),
        ),
        "node",
    )
    score = F.round(
        S.dot(F.col("ne"), F.col("qe"), 64) / (F.col("qn") * F.col("nn")), 6
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("node"))
    truth = (
        cand.crossJoin(F.broadcast(q))
        .select("qid", "node", score.alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _ANN_K)
        .select("qid", "node")
    )
    return (
        truth.join(got, ["qid", "node"], "left")
        .groupBy("qid")
        .agg(
            F.count("hit").alias("hits"),
            F.round(F.count("hit") / float(_ANN_K), 4).alias("recall_at_k"),
        )
    )


# ---------------------------------------------------------------------------
# held-out bigram LM with stupid backoff (the KenLM-style quality signal)
# ---------------------------------------------------------------------------

_LM_BACKOFF = 0.4  # stupid-backoff discount (Brants et al. 2007)
_LM_FLAG_MICRO = -9000000  # flag docs whose mean token logprob < -9

# The stupid-backoff per-bigram log-probability, quantized to integer
# micro-units — ONE definition shared by text_bigram_logprob and
# text_minkprob_membership (and their Spark twins via _lp_micro_expr)
# so the LM semantics cannot drift between the quality gate and the
# membership probe.
_SQL_LP_CASE = f"""CAST(round(CASE
               WHEN b.c_g IS NOT NULL THEN ln(b.c_g / (u1.c * 1.0))
               ELSE ln({_LM_BACKOFF} * ((coalesce(u2.c, 0) + 1.0)
                                        / (s.n + 1000000)))
             END * 1000000) AS BIGINT)"""


def _lp_micro_expr():
    """Spark twin of ``_SQL_LP_CASE`` (expects columns c_g, c1, c2, n)."""
    return (
        F.round(
            F.when(
                F.col("c_g").isNotNull(),
                F.log(F.col("c_g") / (F.col("c1") * F.lit(1.0))),
            ).otherwise(
                F.log(
                    F.lit(_LM_BACKOFF)
                    * (
                        (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1.0))
                        / (F.col("n") + F.lit(1000000))
                    )
                )
            )
            * 1000000
        )
    ).cast("long")


def _sql_lm_train(train_where: str) -> str:
    """Training-count CTEs (unigram table, total, bigram table) over the
    `d(doc_id, ..., t)` CTE, restricted by ``train_where``."""
    return f"""us AS (
      SELECT {X.SQL_HASH60.format(c='tk')} AS h
      FROM (SELECT unnest(t) AS tk FROM d WHERE {train_where})),
    ug AS (SELECT h, CAST(count(*) AS BIGINT) AS c FROM us GROUP BY h),
    nst AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM ug),
    bg AS (
      SELECT {X.SQL_HASH60.format(c="t[i] || ' ' || t[i+1]")} AS gh,
             CAST(count(*) AS BIGINT) AS c_g
      FROM d, unnest(range(1, len(t))) AS u(i)
      WHERE {train_where}
      GROUP BY gh)"""


@query(
    "text_bigram_logprob",
    f"""
    WITH d AS (
      SELECT doc_id, source, {SQL_TOKS.format(c='text')} AS t FROM documents),
    pr AS (
      SELECT doc_id, source,
             {X.SQL_HASH60.format(c="t[i] || ' ' || t[i+1]")} AS gh,
             {X.SQL_HASH60.format(c='t[i]')} AS h1,
             {X.SQL_HASH60.format(c='t[i+1]')} AS h2
      FROM d, unnest(range(1, len(t))) AS u(i)),
    {_sql_lm_train('doc_id % 2 = 0')},
    lp AS (
      SELECT p.doc_id, p.source,
             {_SQL_LP_CASE} AS lp_micro
      FROM pr p
      LEFT JOIN bg b ON b.gh = p.gh
      LEFT JOIN ug u1 ON u1.h = p.h1
      LEFT JOIN ug u2 ON u2.h = p.h2
      CROSS JOIN nst s),
    docs AS (
      SELECT doc_id, source,
             CAST(round(sum(lp_micro) / count(*)) AS BIGINT) AS tok_lp_micro
      FROM lp GROUP BY doc_id, source)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(sum(tok_lp_micro) / 1000000.0 / count(*), 4) AS mean_logprob,
           CAST(count(*) FILTER (WHERE tok_lp_micro < {_LM_FLAG_MICRO})
                AS BIGINT) AS n_flagged
    FROM docs GROUP BY source
    """,
)
def text_bigram_logprob(spark, sf_dir):
    """Held-out bigram LM quality scoring with stupid backoff: train
    bigram/unigram counts on the EVEN doc_ids, score EVERY document's
    mean per-token log-probability (observed bigrams score
    ln(c_bigram / c_history); unseen bigrams back off to
    0.4 * add-one-smoothed unigram), and summarize per source with a
    perplexity flag count.  The odd half is genuinely held out, so
    unseen-bigram backoff actually fires — the KenLM/CCNet quality
    signal every pretraining pipeline runs.

    Determinism: per-bigram log-probs are quantized to integer
    micro-units before any cross-row sum; per-doc means are re-quantized
    before the per-source mean (integer-cents convention).

    Plan shape for 100 TB: tokens/bigrams are 60-bit md5 hashes at the
    scan stage (narrow exchanges, the established payload convention).
    The bigram count table is data-sized, so the scoring join is an
    honest shuffle on the hashed bigram key; the unigram vocab is
    Zipf-bounded (MBs after hashing) and BROADCASTS onto both the
    history and backoff sides — the pair stream shuffles exactly once.
    """
    from target_parquet_spark.lineage import mat

    # toks feeds three pipelines (the bigram stream twice — train and
    # score — and the train token stream) and ug three consumers (nst,
    # u1, u2); without the cuts each reference re-ran tokenize(+hash)
    # from the scan (r10 plan audit: zero exchange reuse).  Cuts hold
    # doc-sized token arrays and the Zipf-bounded vocab — never the
    # exploded gram stream (the winnowing measurement: gram-sized cuts
    # replay slower than they save).
    toks = mat(
        td(spark, sf_dir, "documents").select(
            "doc_id", "source", X.tokens(F.col("text")).alias("t")
        )
    )
    h60 = X.hash60
    bigrams = X.bigrams(
        F.col("t"),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
        "array<struct<w1:string,w2:string>>",
    )
    pr = (
        toks.select("doc_id", "source", F.explode(bigrams).alias("p"))
        .select(
            "doc_id",
            "source",
            h60(F.concat(F.col("p.w1"), F.lit(" "), F.col("p.w2"))).alias("gh"),
            h60(F.col("p.w1")).alias("h1"),
            h60(F.col("p.w2")).alias("h2"),
        )
    )
    train_tokens = toks.filter(F.col("doc_id") % 2 == 0).select(
        F.explode("t").alias("tk")
    )
    ug = mat(
        train_tokens.select(h60(F.col("tk")).alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nst = ug.agg(F.sum("c").alias("n"))
    bg = (
        pr.filter(F.col("doc_id") % 2 == 0)
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("c_g"))
    )
    u1 = ug.select(F.col("h").alias("h1"), F.col("c").alias("c1"))
    u2 = ug.select(F.col("h").alias("h2"), F.col("c").alias("c2"))
    lp_micro = _lp_micro_expr()
    lp = (
        pr.join(bg, "gh", "left")
        .join(F.broadcast(u1), "h1", "left")
        .join(F.broadcast(u2), "h2", "left")
        .crossJoin(F.broadcast(nst))
        .select("doc_id", "source", lp_micro.alias("lp_micro"))
    )
    docs = lp.groupBy("doc_id", "source").agg(
        F.round(F.sum("lp_micro") / F.count(F.lit(1)))
        .cast("long")
        .alias("tok_lp_micro")
    )
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.sum("tok_lp_micro") / 1000000.0 / F.count(F.lit(1)), 4).alias(
            "mean_logprob"
        ),
        F.count(F.when(F.col("tok_lp_micro") < _LM_FLAG_MICRO, F.lit(1)))
        .cast("long")
        .alias("n_flagged"),
    )


# ---------------------------------------------------------------------------
# deterministic shard assignment (the write-training-shards job)
# ---------------------------------------------------------------------------

_N_SHARDS = 16


@query(
    "sample_shard_assignment",
    f"""
    WITH s AS (
      SELECT doc_id, n_chars,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % {_N_SHARDS} AS shard
      FROM documents)
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
             AS shard_sig
    FROM s GROUP BY shard
    """,
)
def sample_shard_assignment(spark, sf_dir):
    """Deterministic training-shard assignment: every document routes to
    md5(doc_id) % {n} — stable across engines, retries, and cluster
    sizes, so a re-run of the shard writer reproduces byte-identical
    shard membership (the property that makes training-data artifacts
    auditable).  Reports per-shard document/char totals plus an ordered
    membership signature; balanced shard sizes here double as the skew
    check the writer would run before fanning out.

    Plan shape: one scan, one 16-ary hash aggregate (map-side
    combinable); the signature is the only order-sensitive part and is
    sorted per shard group in both engines.
    """
    from target_parquet_spark.queries_ops import _hash_mod

    docs = td(spark, sf_dir, "documents").select("doc_id", "n_chars")
    s = docs.select(
        "doc_id",
        "n_chars",
        _hash_mod(F.col("doc_id"), _N_SHARDS).alias("shard"),
    )
    return s.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
            )
        ).alias("shard_sig"),
    )


# ---------------------------------------------------------------------------
# community detection over the k-NN graph (majority-label propagation)
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 3


def _sql_lpa_rounds(n_rounds: int) -> str:
    """Unrolled majority-label-propagation round CTEs over ``sym`` and
    an ``l0(node, lbl)`` seed — ONE builder shared by the
    graph_communities_lpa and graph_modularity oracles so the partition
    they analyze cannot drift."""
    rounds = []
    for r in range(1, n_rounds + 1):
        rounds.append(f"""
    l{r} AS (
      SELECT n.node, coalesce(m.maj, n.lbl) AS lbl
      FROM l{r - 1} n LEFT JOIN (
        SELECT u AS node, lbl AS maj FROM (
          SELECT s.u, c.lbl, count(*) AS cnt,
                 row_number() OVER (PARTITION BY s.u
                                    ORDER BY count(*) DESC, c.lbl) AS rn
          FROM sym s JOIN l{r - 1} c ON c.node = s.v
          GROUP BY s.u, c.lbl) t
        WHERE rn = 1) m ON m.node = n.node)""")
    return ",".join(rounds)


def _register_lpa_communities():
    """Oracle reuses queries_r6's graph fragments (same contract as
    graph_label_propagation: the graph analyzed cannot drift)."""
    from target_parquet_spark.queries_r6 import _SQL_KNN, _SQL_SYM_DEG

    rounds_sql = _sql_lpa_rounds(_LPA_ROUNDS)

    @query(
        "graph_communities_lpa",
        f"""
    WITH {_SQL_KNN},
    {_SQL_SYM_DEG},
    l0 AS (SELECT u AS node, u AS lbl FROM (SELECT DISTINCT u FROM sym)),
    {rounds_sql}
    SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_nodes
    FROM l{_LPA_ROUNDS} GROUP BY lbl
        """,
    )
    def graph_communities_lpa(spark, sf_dir):
        """Unsupervised community detection on the k-NN graph: majority
        label propagation (``operators/graph.lpa_communities``) for a
        fixed {R} rounds from singleton labels, reported as community
        sizes.  The curation use: communities = topical clusters of the
        corpus without training anything — the grouping a mixture
        sampler or dedup triage reads.  Unlike connected components, a
        single bridge edge does not merge two dense cliques (planted
        test in tests/test_r8.py pins exactly that difference).
        """
        from target_parquet_spark.operators.graph import lpa_communities
        from target_parquet_spark.queries_r6 import _symmetrize_degrees
        from target_parquet_spark.queries_r7 import knn_edge_artifact

        sym, _deg = _symmetrize_degrees(knn_edge_artifact(spark, sf_dir))
        labels = lpa_communities(sym, rounds=_LPA_ROUNDS)
        return labels.groupBy(F.col("lbl").alias("community")).agg(
            F.count(F.lit(1)).alias("n_nodes")
        )

    graph_communities_lpa.__doc__ = graph_communities_lpa.__doc__.format(
        R=_LPA_ROUNDS
    )
    return graph_communities_lpa


_register_lpa_communities()


# ---------------------------------------------------------------------------
# TextRank keyword extraction (PageRank over the word co-occurrence graph)
# ---------------------------------------------------------------------------

_TR_ITERS = 5
_TR_TOPK = 20
_TR_MIN_COOC = 2
_TR_MIN_LEN = 3


def _sql_textrank() -> str:
    from target_parquet_spark.operators.text import STOPWORDS
    from target_parquet_spark.queries_ext import _sql_pagerank_ctes

    swl = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
    WITH d AS (
      SELECT doc_id, {SQL_TOKS.format(c='text')} AS t FROM documents),
    adj AS (
      SELECT t[i] AS w1, t[i + 1] AS w2
      FROM d, unnest(range(1, len(t))) AS u(i)),
    flt AS (
      SELECT least(w1, w2) AS id_a, greatest(w1, w2) AS id_b
      FROM adj
      WHERE length(w1) >= {_TR_MIN_LEN} AND length(w2) >= {_TR_MIN_LEN}
        AND w1 NOT IN ({swl}) AND w2 NOT IN ({swl}) AND w1 <> w2),
    pairs AS (
      SELECT id_a, id_b, CAST(count(*) AS DOUBLE) AS jaccard
      FROM flt GROUP BY id_a, id_b HAVING count(*) >= {_TR_MIN_COOC}),
    {_sql_pagerank_ctes(iters=_TR_ITERS)}
    SELECT keyword, rank_pm FROM (
      SELECT node AS keyword,
             round(rank * 1000.0::DOUBLE, 4) AS rank_pm,
             row_number() OVER (
               ORDER BY round(rank * 1000.0::DOUBLE, 4) DESC, node) AS rn
      FROM r{_TR_ITERS}) t
    WHERE rn <= {_TR_TOPK}
    """


@query("text_textrank_keywords", _sql_textrank())
def text_textrank_keywords(spark, sf_dir):
    """TextRank (Mihalcea & Tarau): corpus keywords as PageRank over the
    word co-occurrence graph — adjacent non-stopword pairs (window 2,
    undirected, min co-occurrence {mc}) weighted by count, 5 power
    iterations, top {k} by rank.  Pure composition of shipped pieces:
    the graph build is one bigram aggregate, the ranking reuses
    ``operators/graph.pagerank`` and the oracle reuses the SAME unrolled
    CTE chain as ``graph_pagerank_dupweb`` (`_sql_pagerank_ctes` over a
    differently-built `pairs` CTE).

    Determinism at the top-k boundary: ranking orders on the ROUNDED
    rank (4dp per-mille) with the word as tie-break — aggregation-order
    ulp drift between engines cannot move the cutoff.  Scale: the graph
    is VOCAB-sized (Zipf-bounded after the min-co-occurrence filter),
    not corpus-sized — the one corpus-linear stage is the bigram count,
    a single map-side-combinable aggregate.
    """
    from target_parquet_spark.operators.graph import pagerank
    from target_parquet_spark.operators.text import STOPWORDS

    toks = td(spark, sf_dir, "documents").select(
        X.tokens(F.col("text")).alias("t")
    )
    adj = toks.select(
        F.explode(
            X.bigrams(
                F.col("t"),
                lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
                "array<struct<w1:string,w2:string>>",
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    flt = adj.filter(
        (F.length("w1") >= _TR_MIN_LEN)
        & (F.length("w2") >= _TR_MIN_LEN)
        & ~F.col("w1").isin(*STOPWORDS)
        & ~F.col("w2").isin(*STOPWORDS)
        & (F.col("w1") != F.col("w2"))
    ).select(
        F.least("w1", "w2").alias("id_a"),
        F.greatest("w1", "w2").alias("id_b"),
    )
    pairs = (
        flt.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        .filter(F.col("w") >= _TR_MIN_COOC)
    )
    sym = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst"), "w"
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"), "w")
    )
    ranks = pagerank(sym, "src", "dst", weight="w", iters=_TR_ITERS)
    out = ranks.select(
        F.col("node").alias("keyword"),
        F.round(F.col("rank") * 1000.0, 4).alias("rank_pm"),
    )
    return out.orderBy(F.desc("rank_pm"), "keyword").limit(_TR_TOPK)


text_textrank_keywords.__doc__ = text_textrank_keywords.__doc__.format(
    mc=_TR_MIN_COOC, k=_TR_TOPK
)


# ---------------------------------------------------------------------------
# embedding standardization (per-dimension whitening, literal state)
# ---------------------------------------------------------------------------


def _sql_standardize() -> str:
    """Per-dim mean/std via integer-microunit sums, then per-row
    standardized-norm audit — the same quantization discipline as the
    PCA rounds (every cross-row float sum is an exact BIGINT sum)."""
    return """
    WITH ex AS (
      SELECT label, embedding FROM embeddings),
    st AS (
      SELECT j,
             sum(CAST(round(CAST(embedding[j] AS DOUBLE) * 1000000)
                      AS BIGINT)) AS s1,
             sum(CAST(round((CAST(embedding[j] AS DOUBLE)
                             * CAST(embedding[j] AS DOUBLE)) * 1000000)
                      AS BIGINT)) AS s2,
             CAST(count(*) AS BIGINT) AS n
      FROM ex, unnest(range(1, len(embedding) + 1)) AS t(j)
      GROUP BY j),
    ms AS (
      SELECT j,
             round(s1 / 1000000.0 / n, 6) AS mu,
             round(sqrt(greatest(
               s2 / 1000000.0 / n
               - (s1 / 1000000.0 / n) * (s1 / 1000000.0 / n), 0)), 6) AS sd
      FROM st),
    mv AS (SELECT list(mu ORDER BY j) AS mus, list(sd ORDER BY j) AS sds
           FROM ms),
    z AS (
      SELECT label,
             CAST(round(list_sum(list_transform(
               range(1, len(embedding) + 1),
               j -> CASE WHEN sds[j] = 0 THEN 0.0::DOUBLE
                    ELSE ((CAST(embedding[j] AS DOUBLE) - mus[j]) / sds[j])
                         * ((CAST(embedding[j] AS DOUBLE) - mus[j]) / sds[j])
                    END)) * 1000000) AS BIGINT) AS zn
      FROM ex, mv)
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(sum(zn) / 1000000.0 / count(*), 4) AS mean_znorm2,
           round(min(zn) / 1000000.0, 4) AS min_znorm2,
           round(max(zn) / 1000000.0, 4) AS max_znorm2
    FROM z GROUP BY label
    """


def embedding_whitening_stats(spark, sf_dir):
    """(mus, sds): per-dimension mean and std of the embedding corpus,
    6dp-quantized through Spark's own round — bounded literal state
    (64+64 floats), one scan + a 64-row exchange."""
    emb = td(spark, sf_dir, "embeddings").select("embedding")
    ex = emb.select(F.posexplode("embedding").alias("j", "x"))
    xd = F.col("x").cast("double")
    st = ex.groupBy("j").agg(
        F.sum(F.round(xd * 1000000).cast("long")).alias("s1"),
        F.sum(F.round((xd * xd) * 1000000).cast("long")).alias("s2"),
        F.count(F.lit(1)).alias("n"),
    )
    rows = (
        st.select(
            "j",
            F.round(F.col("s1") / 1000000.0 / F.col("n"), 6).alias("mu"),
            F.round(
                F.sqrt(
                    F.greatest(
                        F.col("s2") / 1000000.0 / F.col("n")
                        - (F.col("s1") / 1000000.0 / F.col("n"))
                        * (F.col("s1") / 1000000.0 / F.col("n")),
                        F.lit(0.0),
                    )
                ),
                6,
            ).alias("sd"),
        )
        .orderBy("j")
        .collect()
    )
    return [float(r["mu"]) for r in rows], [float(r["sd"]) for r in rows]


@query("sim_embedding_standardize", _sql_standardize())
def sim_embedding_standardize(spark, sf_dir):
    """Embedding whitening audit: per-dimension mean/std trained as
    literal state (``embedding_whitening_stats``), then every vector's
    standardized squared norm summarized per label.  For a
    well-conditioned corpus mean_znorm2 ~ dim; a dimension collapse or
    scale drift (the defects ``audit_embedding_quality`` flags
    per-vector) shows up here as a per-label shift — the preprocessing
    gate to run before cosine ANN, where unstandardized dimensions
    silently dominate the metric.

    Plan: one scan for the stats (posexplode + 64-row agg), one scan to
    score — the z-norm is a pure fold against two literal arrays; zero
    data-sized shuffles (integer-microunit sums make the per-label agg
    exact)."""
    mus, sds = embedding_whitening_stats(spark, sf_dir)
    emb = td(spark, sf_dir, "embeddings").select("label", "embedding")
    lit_mu = F.array(*[F.lit(m) for m in mus])
    lit_sd = F.array(*[F.lit(s) for s in sds])
    zip_z = F.zip_with(
        F.zip_with(
            F.col("embedding"),
            lit_mu,
            lambda x, m: x.cast("double") - m,
        ),
        lit_sd,
        lambda d, s: F.when(s == 0, F.lit(0.0)).otherwise(
            (d / s) * (d / s)
        ),
    )
    zn = F.round(
        F.aggregate(zip_z, F.lit(0.0), lambda acc, v: acc + v) * 1000000
    ).cast("long")
    z = emb.select("label", zn.alias("zn"))
    n = F.count(F.lit(1))
    return z.groupBy("label").agg(
        n.cast("long").alias("n_vecs"),
        F.round(F.sum("zn") / 1000000.0 / n, 4).alias("mean_znorm2"),
        F.round(F.min("zn") / 1000000.0, 4).alias("min_znorm2"),
        F.round(F.max("zn") / 1000000.0, 4).alias("max_znorm2"),
    )


# ---------------------------------------------------------------------------
# leakage-safe train/heldout split (dup groups never straddle the cut)
# ---------------------------------------------------------------------------


def _sql_split_leakage() -> str:
    from target_parquet_spark.queries_ext import (
        SQL_CC_CTES,
        SQL_CORPUS,
        SQL_MINHASH_PAIR_CTES,
    )
    from target_parquet_spark.queries_ops import _SQL_HASH_MOD

    return f"""
    WITH RECURSIVE {SQL_CORPUS},
    {SQL_MINHASH_PAIR_CTES},
    {SQL_CC_CTES},
    asg AS (
      SELECT c.doc_id, coalesce(m.component_id, c.doc_id) AS grp
      FROM (SELECT doc_id FROM corpus) c LEFT JOIN comp m USING (doc_id)),
    lab AS (
      SELECT doc_id, grp,
             CASE WHEN {_SQL_HASH_MOD.format(c='grp', m=10)} < 8
                  THEN 'train' ELSE 'heldout' END AS split
      FROM asg)
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT grp) AS BIGINT) AS n_groups,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
             AS sel_sig
    FROM lab GROUP BY split
    """


@query("split_leakage_safe", _sql_split_leakage())
def split_leakage_safe(spark, sf_dir):
    """Contamination-proof train/heldout split: documents are split by
    their NEAR-DUP GROUP (connected components over the MinHash pair
    graph; singletons are their own group), so a training document's
    near-duplicate can never land in the heldout set — the leakage that
    silently inflates eval scores in LLM pipelines.  The 80/20 cut is
    the deterministic md5-bucket of the group id (same primitive as
    sample_hash_pct), making the split reproducible across engines,
    retries, and cluster sizes.

    Composition of shipped pieces: minhash_lsh_pairs ->
    connected_components -> hash split; the oracle replays the closure
    as the same recursive CTE as dedup_connected_components.  The
    leakage guarantee itself is pinned in tests: every candidate pair
    has both ends on the same side.  Runs over the planted doubled
    corpus so the dup groups are provably non-trivial.
    """
    from target_parquet_spark.queries_ext import corpus_components
    from target_parquet_spark.queries_ops import _hash_mod

    corpus, comp = corpus_components(spark, sf_dir)
    comp = comp.select(
        F.col("node").alias("doc_id"), F.col("component").alias("grp")
    )
    asg = (
        corpus.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("grp", F.col("doc_id")).alias("grp")
        )
    )
    lab = asg.select(
        "doc_id",
        "grp",
        F.when(_hash_mod(F.col("grp"), 10) < 8, F.lit("train"))
        .otherwise(F.lit("heldout"))
        .alias("split"),
    )
    return lab.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("grp").cast("long").alias("n_groups"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
            )
        ).alias("sel_sig"),
    )


# ---------------------------------------------------------------------------
# dedup threshold sweep (the PR-curve harness for choosing the Jaccard cut)
# ---------------------------------------------------------------------------

_SWEEP_THS = [0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9]


def _sql_dedup_sweep() -> str:
    from target_parquet_spark.queries_ext import (
        SQL_CORPUS,
        SQL_MINHASH_PAIR_CTES,
    )

    # ::DOUBLE per literal: a bare 0.55 is DECIMAL in DuckDB (the r2
    # pagerank lesson), which would both type-mismatch the output column
    # and change >= comparison semantics against the double jaccard
    ths = "[" + ", ".join(f"{t!r}::DOUBLE" for t in _SWEEP_THS) + "]"
    return f"""
    WITH {SQL_CORPUS},
    {SQL_MINHASH_PAIR_CTES},
    ths AS (SELECT unnest({ths}) AS threshold)
    SELECT t.threshold,
           CAST(count(*) FILTER (WHERE p.jaccard >= t.threshold)
                AS BIGINT) AS n_pairs,
           CAST(count(*) FILTER (WHERE p.jaccard >= t.threshold
                                   AND p.id_b - p.id_a = 1000000)
                AS BIGINT) AS n_planted,
           round(count(*) FILTER (WHERE p.jaccard >= t.threshold
                                    AND p.id_b - p.id_a = 1000000)
                 / greatest(count(*) FILTER (WHERE p.jaccard >= t.threshold),
                            1) * 1.0, 4) AS planted_share
    FROM ths t CROSS JOIN pairs p
    GROUP BY t.threshold
    """


@query("dedup_threshold_sweep", _sql_dedup_sweep())
def dedup_threshold_sweep(spark, sf_dir):
    """The tuning harness for the near-dup threshold: candidate pairs
    (banded MinHash, verified Jaccard) swept across 9 cut points in one
    pass, reporting pair volume, planted-twin hits (the known-dup pairs
    the doubled corpus guarantees, id offset 1e6), and the planted
    share — the precision proxy that tells an operator where pair
    volume starts buying noise instead of real dups.  Completes the
    eval family (sim_ivf_recall, dedup_lsh_recall, sim_graph_ann_recall)
    for the parameter every dedup run must choose.

    Plan: the pair table is computed ONCE; the sweep is a broadcast
    cross join against 9 literal thresholds folded into one aggregate —
    9 cut points cost one shuffle, not 9 pipeline runs.
    """
    from target_parquet_spark.queries_r7 import minhash_pair_artifact

    pairs = minhash_pair_artifact(spark, sf_dir)
    ths = spark.createDataFrame(
        [(t,) for t in _SWEEP_THS], "threshold double"
    )
    hit = F.col("jaccard") >= F.col("threshold")
    planted = hit & (F.col("id_b") - F.col("id_a") == 1000000)
    return (
        F.broadcast(ths)
        .crossJoin(pairs)
        .groupBy("threshold")
        .agg(
            F.count(F.when(hit, F.lit(1))).alias("n_pairs"),
            F.count(F.when(planted, F.lit(1))).alias("n_planted"),
            F.round(
                F.count(F.when(planted, F.lit(1)))
                / F.greatest(F.count(F.when(hit, F.lit(1))), F.lit(1))
                * 1.0,
                4,
            ).alias("planted_share"),
        )
    )


# ---------------------------------------------------------------------------
# Min-K%-Prob membership inference (benchmark-contamination detection)
# ---------------------------------------------------------------------------

_MINK_FRAC = 0.2  # the K: mean over the lowest 20% of token log-probs
_MINK_MOD = 50  # probe stratum: every 50th doc


def _sql_minkprob() -> str:
    return f"""
    WITH d AS (
      SELECT doc_id, {SQL_TOKS.format(c='text')} AS t FROM documents),
    {_sql_lm_train('TRUE')},
    probes AS (
      SELECT doc_id * 2 AS pid, 'member' AS probe_group, t
      FROM d WHERE doc_id % {_MINK_MOD} = 0
      UNION ALL
      SELECT doc_id * 2 + 1 AS pid, 'nonmember' AS probe_group,
             list_reverse(t) AS t
      FROM d WHERE doc_id % {_MINK_MOD} = 0),
    pp AS (
      SELECT pid, probe_group, i AS pos,
             {X.SQL_HASH60.format(c="t[i] || ' ' || t[i+1]")} AS gh,
             {X.SQL_HASH60.format(c='t[i]')} AS h1,
             {X.SQL_HASH60.format(c='t[i+1]')} AS h2
      FROM probes, unnest(range(1, len(t))) AS u(i)),
    lp AS (
      SELECT p.pid, p.probe_group, p.pos,
             {_SQL_LP_CASE} AS lp_micro
      FROM pp p
      LEFT JOIN bg b ON b.gh = p.gh
      LEFT JOIN ug u1 ON u1.h = p.h1
      LEFT JOIN ug u2 ON u2.h = p.h2
      CROSS JOIN nst s),
    rk AS (
      SELECT pid, probe_group, lp_micro,
             row_number() OVER (PARTITION BY pid
                                ORDER BY lp_micro, pos) AS rn,
             count(*) OVER (PARTITION BY pid) AS cnt
      FROM lp),
    mink AS (
      SELECT pid, probe_group,
             CAST(round(sum(lp_micro) / count(*)) AS BIGINT) AS mk
      FROM rk
      WHERE rn <= greatest(CAST(ceil({_MINK_FRAC}::DOUBLE * cnt) AS BIGINT), 1)
      GROUP BY pid, probe_group)
    SELECT probe_group,
           CAST(count(*) AS BIGINT) AS n_probes,
           round(sum(mk) / 1000000.0 / count(*), 4) AS mean_minkprob
    FROM mink GROUP BY probe_group
    """


@query("text_minkprob_membership", _sql_minkprob())
def text_minkprob_membership(spark, sf_dir):
    """Min-K%-Prob membership inference (Shi et al. 2024): score probe
    documents under a bigram LM trained on the FULL corpus and average
    each probe's LOWEST 20% of token log-probs — text the model trained
    on has no catastrophically surprising tokens, so members score
    measurably higher than non-members.  Probes: every 50th document
    verbatim (a true member) and its token-reversal (same unigrams,
    unseen bigrams — a calibrated non-member).  The separation is the
    contamination signal an eval-suite audit reads; complements
    text_contamination's n-gram-overlap probe with a model-based one.

    Determinism: per-bigram log-probs are integer-microunit ints; the
    min-K subset is selected by (lp, position) rank — fully tie-stable;
    the LM formula is the SAME ``_SQL_LP_CASE`` / ``_lp_micro_expr``
    pair as text_bigram_logprob, so the two LM ops cannot drift.

    Plan: training joins as in text_bigram_logprob (one data-sized
    bigram shuffle, broadcast unigrams); the probe side is corpus/50
    rows; the rank window partitions per probe document.
    """
    from pyspark.sql import Window as W

    h60 = X.hash60
    toks = td(spark, sf_dir, "documents").select(
        "doc_id", X.tokens(F.col("text")).alias("t")
    )
    ug = (
        toks.select(F.explode("t").alias("tk"))
        .select(h60(F.col("tk")).alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nst = ug.agg(F.sum("c").alias("n"))
    allpairs = toks.select(
        F.explode(
            X.bigrams(
                F.col("t"),
                lambda x, y: F.concat(x, F.lit(" "), y),
            )
        ).alias("g")
    )
    bg = (
        allpairs.select(h60(F.col("g")).alias("gh"))
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("c_g"))
    )
    stratum = toks.filter(F.col("doc_id") % _MINK_MOD == 0)
    probes = stratum.select(
        (F.col("doc_id") * 2).alias("pid"),
        F.lit("member").alias("probe_group"),
        F.col("t"),
    ).unionByName(
        stratum.select(
            (F.col("doc_id") * 2 + 1).alias("pid"),
            F.lit("nonmember").alias("probe_group"),
            F.reverse(F.col("t")).alias("t"),
        )
    )
    pairs = X.bigrams(
        F.col("t"),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
        "array<struct<w1:string,w2:string>>",
    )
    pp = probes.select(
        "pid", "probe_group", F.posexplode(pairs).alias("pos0", "p")
    ).select(
        "pid",
        "probe_group",
        (F.col("pos0") + 1).alias("pos"),
        h60(F.concat(F.col("p.w1"), F.lit(" "), F.col("p.w2"))).alias("gh"),
        h60(F.col("p.w1")).alias("h1"),
        h60(F.col("p.w2")).alias("h2"),
    )
    u1 = ug.select(F.col("h").alias("h1"), F.col("c").alias("c1"))
    u2 = ug.select(F.col("h").alias("h2"), F.col("c").alias("c2"))
    lp = (
        pp.join(bg, "gh", "left")
        .join(F.broadcast(u1), "h1", "left")
        .join(F.broadcast(u2), "h2", "left")
        .crossJoin(F.broadcast(nst))
        .select("pid", "probe_group", "pos", _lp_micro_expr().alias("lp_micro"))
    )
    w_rank = W.partitionBy("pid").orderBy("lp_micro", "pos")
    w_all = W.partitionBy("pid")
    rk = lp.select(
        "pid",
        "probe_group",
        "lp_micro",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("cnt"),
    )
    mink = (
        rk.filter(
            F.col("rn")
            <= F.greatest(
                F.ceil(F.lit(_MINK_FRAC) * F.col("cnt")).cast("long"),
                F.lit(1),
            )
        )
        .groupBy("pid", "probe_group")
        .agg(
            F.round(F.sum("lp_micro") / F.count(F.lit(1)))
            .cast("long")
            .alias("mk")
        )
    )
    return mink.groupBy("probe_group").agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.round(F.sum("mk") / 1000000.0 / F.count(F.lit(1)), 4).alias(
            "mean_minkprob"
        ),
    )
