"""Round-5 fourth-wave operators: HITS hubs/authorities over the k-NN
graph, hybrid lexical+dense retrieval fused with Reciprocal Rank Fusion,
sign-bit (binary-quantized) Hamming ANN, and a Bayesian beta-posterior
A/B read-out.

Reference context: hotgluexyz/target-parquet implements none of these
(SURVEY.md §2.10 — the reference's §2 surface is pyarrow ingest glue,
`target_parquet/sinks.py`); all four are standard pieces of a
large-scale training-data / retrieval pipeline:

- HITS (Kleinberg 1999) separates *hub* vectors (whose neighbor lists
  cover many distinct regions) from *authority* vectors (appearing in
  many other vectors' top-k) — on an asymmetric k-NN graph the two
  roles genuinely differ, and authorities are the natural medoid
  candidates for cluster seeding.
- RRF (Cormack et al. 2009) is the default fusion rule for hybrid
  BM25+dense retrieval in every production RAG stack — rank-based, so
  no score calibration between the two retrievers is needed.
- Binary quantization (1 bit/dim + Hamming re-rank) is the cheapest ANN
  index: 64x smaller than float32, distance = one XOR + popcount —
  completing the quantization family next to SQ8 / PQ / IVF-PQ.
- The beta-posterior read-out is the Bayesian twin of the Welch-t
  `events_ab_experiment`: exact integer conversion counts, closed-form
  posterior moments.

Oracle contract as everywhere in this repo: integer micro-unit
quantization before every rank/normalization, every computed column
aliased identically in Spark and DuckDB, deterministic tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from target_parquet_spark.operators import similarity as S
from target_parquet_spark.queries import query, t
from target_parquet_spark.queries_ext import _SQL_DOT, SQL_TOKS, td
from target_parquet_spark.queries_ops import _SQL_HASH_MOD, _hash_mod
from target_parquet_spark.queries_r4 import _B, _BM25_TERMS, _K1
from target_parquet_spark.queries_r6 import _SQL_KNN, _knn_edges
from target_parquet_spark.queries_r9 import (
    _cos_micro,
    _cos_micro_safe,
    _sql_cos_micro,
    _sql_cos_micro_safe,
)

# ---------------------------------------------------------------------------
# HITS hubs & authorities over the directed k-NN graph
# ---------------------------------------------------------------------------

_HITS_ITERS = 3


def _sql_hits_ctes(iters: int) -> str:
    """Unrolled HITS CTE chain over an ``e(u, v)`` edge CTE — the DuckDB
    twin of operators/graph.hits.  Scores are integer micro-units; each
    half-round is an exact BIGINT edge sum, an exact BIGINT total, and
    one float multiply+divide on identical integers — so the serial
    oracle and Spark's parallel sums cannot drift (the reason the L1
    norm is integer, not float)."""
    norm = (
        "{o} AS (SELECT nd.node, CASE WHEN t.s > 0 THEN "
        "CAST(round(coalesce(r.raw, 0) * 1000000.0 / t.s) AS BIGINT) "
        "ELSE 0::BIGINT END AS sc "
        "FROM nd LEFT JOIN {r} r USING (node) CROSS JOIN {t} t)"
    )
    parts = [
        "nd AS (SELECT u AS node FROM e UNION SELECT v AS node FROM e)",
        "h0 AS (SELECT node, 1000000::BIGINT AS sc FROM nd)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"ar{k} AS (SELECT e.v AS node, CAST(sum(h.sc) AS BIGINT) AS raw"
            f" FROM e JOIN h{k - 1} h ON h.node = e.u GROUP BY e.v)"
        )
        parts.append(
            f"at{k} AS (SELECT CAST(sum(raw) AS BIGINT) AS s FROM ar{k})"
        )
        parts.append(norm.format(o=f"a{k}", r=f"ar{k}", t=f"at{k}"))
        parts.append(
            f"hr{k} AS (SELECT e.u AS node, CAST(sum(a.sc) AS BIGINT) AS raw"
            f" FROM e JOIN a{k} a ON a.node = e.v GROUP BY e.u)"
        )
        parts.append(
            f"ht{k} AS (SELECT CAST(sum(raw) AS BIGINT) AS s FROM hr{k})"
        )
        parts.append(norm.format(o=f"h{k}", r=f"hr{k}", t=f"ht{k}"))
    return ",\n    ".join(parts)


@query(
    "graph_hits_knn",
    f"""
    WITH {_SQL_KNN},
    e AS (SELECT src AS u, nbr AS v FROM r WHERE nbr_rank <= 3),
    {_sql_hits_ctes(_HITS_ITERS)}
    SELECT h.node AS vec_id, h.sc AS hub_micro, a.sc AS auth_micro
    FROM h{_HITS_ITERS} h JOIN a{_HITS_ITERS} a USING (node)
    """,
)
def graph_hits_knn(spark, sf_dir):
    """HITS hubs & authorities (3 rounds) over the DIRECTED
    k-NN graph (k=3): the edge u->v ("v is in u's top-3") is asymmetric,
    so hub and authority roles genuinely differ — authorities sit in
    many vectors' neighbor lists (the density medoids a downstream
    cluster-seeding or keep-one policy wants); hubs point at many
    authorities.  Completes the centrality family next to PageRank
    (symmetric dupweb) and TrustRank (seeded).

    Determinism: operators/graph.hits keeps scores in integer
    micro-units with an integer L1 norm per half-round — exact BIGINT
    sums in any order; the single float multiply+divide per node sees
    identical integers in both engines.  Oracle replays the rounds as
    unrolled CTEs over the shared _SQL_KNN edge fragment.

    Plan shape for 100 TB: edge generation is the bucketed k-NN stage
    (one bucket repartition reused by both self-join sides — at scale
    the written edge artifact is read instead, see _knn_edges); each
    HITS half-round is one edge-key join + one groupBy + a broadcast
    1-row integer total.  Per-node state is two 8-byte ints."""
    from target_parquet_spark.operators.graph import hits

    edges = _knn_edges(spark, sf_dir, k=3)
    return hits(edges, src="src", dst="nbr", iters=_HITS_ITERS).select(
        F.col("node").alias("vec_id"), "hub_micro", "auth_micro"
    )


# ---------------------------------------------------------------------------
# hybrid retrieval: BM25 + dense cosine fused with Reciprocal Rank Fusion
# ---------------------------------------------------------------------------

_RRF_K = 60  # the canonical RRF damping constant (Cormack et al. 2009)
_RRF_DEPTH = 50  # per-retriever candidate depth
_RRF_TOPK = 20
_RRF_QVEC = 0  # probe document: dense query = its embedding

_SQL_BM25_MICRO = f"""
    d AS (SELECT doc_id, {SQL_TOKS.format(c='text')} AS toks FROM documents),
    base AS (SELECT doc_id, toks, len(toks) AS dl FROM d WHERE len(toks) > 0),
    stats AS (SELECT count(*) AS n, avg(CAST(dl AS DOUBLE)) AS avgdl
              FROM base),
    tok AS (SELECT doc_id, dl, unnest(toks) AS token FROM base),
    qtf AS (SELECT doc_id, dl, token, count(*) AS tf FROM tok
            WHERE token IN {_BM25_TERMS!r} GROUP BY doc_id, dl, token),
    qdf AS (SELECT token, count(*) AS df FROM qtf GROUP BY token),
    lexs AS (
      SELECT q.doc_id,
             CAST(round(sum(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                 * (q.tf * ({_K1} + 1.0))
                 / (q.tf + {_K1} * (1.0 - {_B} + {_B} * q.dl / s.avgdl)))
                 * 10000) AS BIGINT) AS s_q
      FROM qtf q JOIN qdf d ON q.token = d.token CROSS JOIN stats s
      WHERE q.doc_id <> {_RRF_QVEC}
      GROUP BY q.doc_id)
"""


@query(
    "sim_rrf_hybrid",
    f"""
    WITH {_SQL_BM25_MICRO},
    lex AS (SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY s_q DESC, doc_id)
                        AS BIGINT) AS lex_rank
            FROM lexs
            ORDER BY s_q DESC, doc_id LIMIT {_RRF_DEPTH}),
    qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = {_RRF_QVEC}),
    dens AS (SELECT e.vec_id AS doc_id,
                    {_sql_cos_micro('e.embedding', 'qv.q')} AS sim_micro
             FROM embeddings e CROSS JOIN qv
             WHERE e.vec_id <> {_RRF_QVEC}),
    den AS (SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY sim_micro DESC, doc_id)
                        AS BIGINT) AS dense_rank
            FROM dens
            ORDER BY sim_micro DESC, doc_id LIMIT {_RRF_DEPTH}),
    fused AS (
      SELECT coalesce(l.doc_id, dn.doc_id) AS doc_id,
             l.lex_rank, dn.dense_rank,
             coalesce(CAST(round(1000000.0 / ({_RRF_K} + l.lex_rank))
                           AS BIGINT), 0)
               + coalesce(CAST(round(1000000.0 / ({_RRF_K} + dn.dense_rank))
                               AS BIGINT), 0) AS rrf_micro
      FROM lex l FULL OUTER JOIN den dn ON l.doc_id = dn.doc_id)
    SELECT doc_id, lex_rank, dense_rank, rrf_micro
    FROM fused ORDER BY rrf_micro DESC, doc_id LIMIT {_RRF_TOPK}
    """,
)
def sim_rrf_hybrid(spark, sf_dir):
    """Hybrid retrieval with Reciprocal Rank Fusion: the BM25 lexical
    retriever (fixed 3-term query, text_bm25_search's scoring) and the
    dense cosine retriever (query = doc 0's embedding, the
    probe doc held out of both candidate sets) each produce a
    depth-50 ranking; RRF fuses them as
    sum(1/(60+rank)) — rank-based, so no score calibration
    between retrievers is needed (Cormack et al. 2009).  A doc missing
    from one list simply contributes nothing from that list.

    Determinism: both retrievers rank on micro-quantized scores with a
    doc_id tie-break; each 1/(60+rank) term is micro-quantized
    before the sum, so the fused score is an exact integer.

    Plan shape for 100 TB: each retriever ends in
    TakeOrderedAndProject (distributed top-50, no global
    sort); ranks are assigned by a window over the ALREADY-truncated
    50-row set (single tiny partition by construction, not a
    data-sized window).  The fusion join is 50x50
    rows — driver-scale, broadcast.  BM25's explode keeps only
    query-term matches (3 terms); the dense pass is one broadcast
    vector against the scan."""
    # -- lexical side: BM25 micro-scores (text_bm25_search's pipeline) --
    from target_parquet_spark.operators import text as X

    docs = td(spark, sf_dir, "documents").select(
        "doc_id", X.tokens(F.col("text")).alias("toks")
    )
    base = docs.withColumn("dl", F.size("toks")).filter(F.col("dl") > 0)
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    qtf = (
        base.select("doc_id", "dl", F.explode("toks").alias("token"))
        .filter(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "dl", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # df over the FULL corpus (the probe doc is held out of candidates,
    # not of the collection statistics)
    qdf = qtf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    qtf = qtf.filter(F.col("doc_id") != _RRF_QVEC)
    idf = F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_part = (F.col("tf") * (_K1 + 1.0)) / (
        F.col("tf") + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))
    )
    lexs = (
        qtf.join(F.broadcast(qdf), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            # 4dp, not micro: the per-doc score is a float SUM whose
            # order differs across engines (parallel vs serial) — 1e-4
            # quantization absorbs the ulp drift (text_bm25_search's
            # proven granularity); ties break on doc_id in both engines.
            F.round(F.sum(idf * tf_part) * 10000)
            .cast("long")
            .alias("s_q")
        )
    )
    w_lex = Window.orderBy(F.desc("s_q"), F.asc("doc_id"))
    lex = (
        lexs.orderBy(F.desc("s_q"), "doc_id")
        .limit(_RRF_DEPTH)
        .withColumn("lex_rank", F.row_number().over(w_lex).cast("long"))
        .select("doc_id", "lex_rank")
    )
    # -- dense side: cosine against the probe embedding --
    emb = td(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qv = F.broadcast(
        emb.filter(F.col("vec_id") == _RRF_QVEC).select(
            F.col("embedding").alias("_q")
        )
    )
    dens = (
        emb.filter(F.col("vec_id") != _RRF_QVEC)
        .crossJoin(qv)
        .select(
            F.col("vec_id").alias("doc_id"),
            _cos_micro(F.col("embedding"), F.col("_q")).alias("sim_micro"),
        )
    )
    w_den = Window.orderBy(F.desc("sim_micro"), F.asc("doc_id"))
    den = (
        dens.orderBy(F.desc("sim_micro"), "doc_id")
        .limit(_RRF_DEPTH)
        .withColumn("dense_rank", F.row_number().over(w_den).cast("long"))
        .select("doc_id", "dense_rank")
    )
    # -- fuse --
    rrf_term = lambda r: F.coalesce(  # noqa: E731
        F.round(1000000.0 / (_RRF_K + F.col(r))).cast("long"), F.lit(0)
    )
    fused = lex.join(den, "doc_id", "full").select(
        "doc_id",
        "lex_rank",
        "dense_rank",
        (rrf_term("lex_rank") + rrf_term("dense_rank")).alias("rrf_micro"),
    )
    return fused.orderBy(F.desc("rrf_micro"), "doc_id").limit(_RRF_TOPK)


# ---------------------------------------------------------------------------
# binary-quantized (sign-bit) Hamming ANN
# ---------------------------------------------------------------------------

_BQ_TOPK = 10
_BQ_QVEC = 0

# 64 dims packed as two 32-bit halves (a single 64-bit pack would need
# bit 63 = the BIGINT sign bit; integer SUM of distinct powers stays
# exact and portable only below it).  {v} = array expr, {off} = 0 | 32.
_SQL_PACK32 = (
    "CAST(list_sum(list_transform(range(1, 33), i -> CASE WHEN "
    "{v}[i + {off}] > 0 THEN (1::BIGINT << (i - 1)) ELSE 0::BIGINT END)) "
    "AS BIGINT)"
)


def _sign_pack(v, off: int):
    """Spark twin of _SQL_PACK32: dims [off, off+32) of ``v`` as a
    32-bit sign mask in a BIGINT.  Distinct powers of two — the sum IS
    the bitwise OR, with no overflow below bit 62."""
    powers = F.array(*[F.lit(1 << i).cast("long") for i in range(32)])
    return F.aggregate(
        F.zip_with(
            F.slice(v, off + 1, 32),
            powers,
            lambda x, p: F.when(x > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


@query(
    "sim_binary_hamming_ann",
    f"""
    WITH b AS (SELECT vec_id, embedding,
                      {_SQL_PACK32.format(v='embedding', off=0)} AS lo,
                      {_SQL_PACK32.format(v='embedding', off=32)} AS hi
               FROM embeddings),
    q AS (SELECT embedding AS qv, lo AS qlo, hi AS qhi FROM b
          WHERE vec_id = {_BQ_QVEC})
    SELECT b.vec_id,
           CAST(bit_count(xor(b.lo, q.qlo))
                + bit_count(xor(b.hi, q.qhi)) AS BIGINT) AS hamming,
           CASE WHEN {_sql_cos_micro_safe('b.embedding', 'q.qv')} > -2000000
                THEN round({_sql_cos_micro_safe('b.embedding', 'q.qv')}
                           / 1000000.0, 4) END AS cos_sim
    FROM b CROSS JOIN q
    WHERE b.vec_id <> {_BQ_QVEC}
    ORDER BY hamming, b.vec_id LIMIT {_BQ_TOPK}
    """,
)
def sim_binary_hamming_ann(spark, sf_dir):
    """Binary-quantized ANN: each 64-dim embedding collapses to its
    sign bits (1 bit/dim, a 64x compression over float32), candidate
    distance = Hamming (one XOR + popcount per 32-bit half), top-10
    re-ranked deterministically with exact cosine reported alongside —
    the cheapest member of the quantization family (SQ8 -> PQ -> IVF-PQ
    -> 1-bit), and the standard first-stage filter before float
    re-ranking at corpus scale.

    Packing: dims split into two 32-bit halves because a single 64-bit
    mask would place dim 63 on the BIGINT sign bit — integer sums of
    distinct powers stay exact and engine-portable only below it.

    Plan shape for 100 TB: the pack is a scan-stage codegen fold (the
    index would be materialized once as two BIGINT columns — 16 bytes
    per vector instead of 256); the probe broadcasts one query row;
    distance is XOR+bit_count inside whole-stage codegen; the top-k is
    TakeOrderedAndProject.  No shuffle at all."""
    emb = td(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    b = emb.select(
        "vec_id",
        "embedding",
        _sign_pack(F.col("embedding"), 0).alias("lo"),
        _sign_pack(F.col("embedding"), 32).alias("hi"),
    )
    q = F.broadcast(
        b.filter(F.col("vec_id") == _BQ_QVEC).select(
            F.col("embedding").alias("_qv"),
            F.col("lo").alias("_qlo"),
            F.col("hi").alias("_qhi"),
        )
    )
    ham = F.bit_count(F.col("lo").bitwiseXOR(F.col("_qlo"))) + F.bit_count(
        F.col("hi").bitwiseXOR(F.col("_qhi"))
    )
    return (
        b.filter(F.col("vec_id") != _BQ_QVEC)
        .crossJoin(q)
        .select(
            "vec_id",
            ham.cast("long").alias("hamming"),
            # zero-norm vectors (defective embeddings) report NULL
            # cosine instead of crashing ANSI division
            F.when(
                _cos_micro_safe(F.col("embedding"), F.col("_qv"))
                > -2000000,
                F.round(
                    _cos_micro_safe(F.col("embedding"), F.col("_qv"))
                    / 1000000.0,
                    4,
                ),
            ).alias("cos_sim"),
        )
        .orderBy("hamming", "vec_id")
        .limit(_BQ_TOPK)
    )


# ---------------------------------------------------------------------------
# Bayesian A/B read-out (beta posterior on conversion)
# ---------------------------------------------------------------------------


@query(
    "events_bayesian_ab",
    f"""
    WITH u AS (
      SELECT user_id, {_SQL_HASH_MOD.format(c='user_id', m=2)} AS arm,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id),
    s AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(conv) AS BIGINT) AS x
          FROM u GROUP BY arm),
    p AS (SELECT arm, n, x, x + 1 AS a, n - x + 1 AS b FROM s),
    m AS (SELECT arm, n, x, a, b,
                 1.0 * a / (a + b) AS mean,
                 1.0 * a * b / ((a + b) * (a + b) * (a + b + 1)) AS var
          FROM p),
    ab AS (SELECT
             max(CASE WHEN arm = 0 THEN n END) AS n_a,
             max(CASE WHEN arm = 1 THEN n END) AS n_b,
             max(CASE WHEN arm = 0 THEN x END) AS conv_a,
             max(CASE WHEN arm = 1 THEN x END) AS conv_b,
             max(CASE WHEN arm = 0 THEN mean END) AS mean_a,
             max(CASE WHEN arm = 1 THEN mean END) AS mean_b,
             max(CASE WHEN arm = 0 THEN var END) AS var_a,
             max(CASE WHEN arm = 1 THEN var END) AS var_b
           FROM m),
    z AS (SELECT *, round((mean_b - mean_a) / sqrt(var_a + var_b), 6) AS zq
          FROM ab)
    SELECT n_a, n_b, conv_a, conv_b,
           round(mean_a, 4) AS post_mean_a,
           round(mean_b, 4) AS post_mean_b,
           zq AS z_score,
           round(1.0 / (1.0 + exp(-1.702 * zq)), 4) AS p_b_beats_a
    FROM z
    """,
)
def events_bayesian_ab(spark, sf_dir):
    """Bayesian A/B read-out on CONVERSION (any purchase): users
    hash-assigned to two arms (the same md5 split as
    events_ab_experiment — this is its Bayesian twin), per-arm
    Beta(1,1) posterior over the conversion rate from exact integer
    counts, and P(B beats A) via moment-matched normal approximation
    with the logistic CDF surrogate (sigmoid(1.702*z) — Zelen & Severo
    1964; labeled an approximation, exact closed form needs the
    incomplete beta).  On this hash split it is an A/A test, so
    p_b_beats_a should hover near 0.5 — which is the read-out working.

    Determinism: posterior parameters are integers (counts + prior), so
    both engines compute moments from identical values; z is quantized
    to 6dp BEFORE the sigmoid so both engines take exp of the same
    number.

    Plan shape for 100 TB: one user_id shuffle for per-user conversion
    flags, then a 2-row integer aggregate; everything after is
    driver-scale arithmetic on one row."""
    u = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv")
        )
        .withColumn("arm", _hash_mod(F.col("user_id"), 2))
    )
    s = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conv").cast("long").alias("x"),
    )
    a, b = F.col("x") + 1, F.col("n") - F.col("x") + 1
    mean = 1.0 * a / (a + b)
    var = 1.0 * a * b / ((a + b) * (a + b) * (a + b + 1))
    m = s.select("arm", "n", "x", mean.alias("mean"), var.alias("var"))
    ab = m.agg(
        *[
            F.max(F.when(F.col("arm") == arm, F.col(c))).alias(f"{c2}_{l}")
            for arm, l in ((0, "a"), (1, "b"))
            for c, c2 in (("n", "n"), ("x", "conv"), ("mean", "mean"), ("var", "var"))
        ]
    )
    zq = F.round(
        (F.col("mean_b") - F.col("mean_a"))
        / F.sqrt(F.col("var_a") + F.col("var_b")),
        6,
    )
    return ab.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round("mean_a", 4).alias("post_mean_a"),
        F.round("mean_b", 4).alias("post_mean_b"),
        zq.alias("z_score"),
        F.round(1.0 / (1.0 + F.exp(-1.702 * zq)), 4).alias("p_b_beats_a"),
    )
