"""Round-5 additions (third wave): CCNet-style per-language perplexity
bucketing, contrastive hard-negative mining, an IR-metrics eval harness
(recall@k / MRR / nDCG against exact ground truth), and k-center greedy
coreset selection.

Reference context: hotgluexyz/target-parquet implements none of these
(SURVEY.md §2.10 — absent categories); each extends an existing family
with a standard LLM-pipeline stage:

* ``text_ccnet_buckets`` — CCNet (Wenzek et al. 2020) quality
  bucketing: train the shared held-out bigram LM PER LANGUAGE, score
  every document's mean token log-prob, and split each language into
  head/middle/tail perplexity tertiles — the filtering scheme used to
  build CCNet/RedPajama-style web corpora.  Reuses the exact
  ``_SQL_LP_CASE`` / ``_lp_micro_expr`` stupid-backoff formula from
  ``queries_r8`` so the three LM consumers (quality gate, membership
  probe, bucketer) cannot drift.
* ``sim_hard_negatives`` — contrastive-training data mining: for each
  query vector, the top-k most similar corpus vectors with a DIFFERENT
  label (the "hard negatives" an embedding-model trainer pairs with
  each anchor).  One broadcast of the query block, one per-query
  window.
* ``sim_retrieval_metrics`` — the eval harness every ANN deployment
  runs: recall@10, MRR and nDCG@10 of the LSH-bucket retriever against
  exact brute-force ground truth, per query.  Complements
  ``sim_ivf_recall`` / ``sim_graph_ann_recall`` (recall-only, other
  index families) with ranking-aware metrics.
* ``sim_kcenter_greedy`` — farthest-point (Gonzalez 1985) k-center
  coreset selection: iteratively pick the point farthest from the
  chosen set.  The classic geometric data-selection baseline
  ("coreset" active learning); each round collects exactly ONE row
  (the new center) — bounded model state, the k-means/logreg/BPE/PCA
  literal-state convention — while the oracle replays the argmax
  recurrence as unrolled CTEs with no collected state at all.

Oracle contract as everywhere in this repo: identical expressions in
both engines, every computed column aliased identically, floats
quantized to integer micro-units before any cross-row comparison, and
every rank/argmax tie-broken on an id column in BOTH engines.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from target_parquet_spark.operators import similarity as S
from target_parquet_spark.operators import text as X
from target_parquet_spark.queries import query
from target_parquet_spark.queries_ext import _SQL_DOT, SQL_TOKS, td
from target_parquet_spark.queries_ops import _SQL_HASH_MOD
from target_parquet_spark.queries_r6 import _SQL_BUCKET4
from target_parquet_spark.queries_r8 import _SQL_LP_CASE, _lp_micro_expr

# ---------------------------------------------------------------------------
# CCNet-style per-language perplexity buckets
# ---------------------------------------------------------------------------

_SQL_COS_MICRO = (
    "CAST(round({dot} / (sqrt({na}) * sqrt({nb})) * 1000000) AS BIGINT)"
)


def _sql_cos_micro(a: str, b: str) -> str:
    return _SQL_COS_MICRO.format(
        dot=_SQL_DOT.format(a=a, b=b),
        na=_SQL_DOT.format(a=a, b=a),
        nb=_SQL_DOT.format(a=b, b=b),
    )


def _cos_micro(a, b, dim=None):
    """Spark twin of ``_sql_cos_micro``: cosine quantized to micro-units.
    ``dim`` (statically-known width) selects the unrolled codegen fold —
    bit-identical, see operators/similarity.dot."""
    return F.round(S.cosine(a, b, dim) * 1000000).cast("long")


@query(
    "text_ccnet_buckets",
    f"""
    WITH d AS (
      SELECT doc_id, lang, {SQL_TOKS.format(c='text')} AS t FROM documents),
    us AS (
      SELECT lang, {X.SQL_HASH60.format(c='tk')} AS h
      FROM (SELECT lang, unnest(t) AS tk FROM d WHERE doc_id % 2 = 0)),
    ug AS (SELECT lang, h, CAST(count(*) AS BIGINT) AS c
           FROM us GROUP BY lang, h),
    nst AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM ug GROUP BY lang),
    bg AS (
      SELECT lang, {X.SQL_HASH60.format(c="t[i] || ' ' || t[i+1]")} AS gh,
             CAST(count(*) AS BIGINT) AS c_g
      FROM d, unnest(range(1, len(t))) AS u(i)
      WHERE doc_id % 2 = 0
      GROUP BY lang, gh),
    pr AS (
      SELECT doc_id, lang,
             {X.SQL_HASH60.format(c="t[i] || ' ' || t[i+1]")} AS gh,
             {X.SQL_HASH60.format(c='t[i]')} AS h1,
             {X.SQL_HASH60.format(c='t[i+1]')} AS h2
      FROM d, unnest(range(1, len(t))) AS u(i)),
    lp AS (
      SELECT p.doc_id, p.lang,
             {_SQL_LP_CASE} AS lp_micro
      FROM pr p
      LEFT JOIN bg b ON b.gh = p.gh AND b.lang = p.lang
      LEFT JOIN ug u1 ON u1.h = p.h1 AND u1.lang = p.lang
      LEFT JOIN ug u2 ON u2.h = p.h2 AND u2.lang = p.lang
      JOIN nst s ON s.lang = p.lang),
    docs AS (
      SELECT doc_id, lang,
             CAST(round(sum(lp_micro) / count(*)) AS BIGINT) AS tok_lp_micro
      FROM lp GROUP BY doc_id, lang),
    nt AS (
      SELECT lang, doc_id, tok_lp_micro,
             ntile(3) OVER (PARTITION BY lang
                            ORDER BY tok_lp_micro DESC, doc_id) AS b3
      FROM docs)
    SELECT lang,
           CASE b3 WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                   ELSE 'tail' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(sum(tok_lp_micro) / 1000000.0 / count(*), 4) AS mean_logprob,
           round(min(tok_lp_micro) / 1000000.0, 4) AS cut_logprob
    FROM nt GROUP BY lang, bucket
    """,
)
def text_ccnet_buckets(spark, sf_dir):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): train a
    bigram LM PER LANGUAGE on the even-doc_id half, score every
    document's mean token log-prob under its own language's LM, then
    split each language into head/middle/tail tertiles by perplexity
    (ntile over logprob DESC — the head is the most-fluent third).
    This is the language-stratified quality gate CCNet/RedPajama use to
    keep the best third of each language rather than letting
    high-resource languages crowd out the rest.

    Determinism: per-bigram log-probs are the SAME integer-microunit
    ``_SQL_LP_CASE`` formula as text_bigram_logprob; per-doc means are
    re-quantized before the tertile split; ntile is ordered
    (tok_lp_micro DESC, doc_id) in BOTH engines — the established
    id-tie-break convention.

    Plan shape for 100 TB: identical to text_bigram_logprob (one
    data-sized bigram shuffle; Zipf-bounded unigram table broadcast)
    except every key is (lang, hash) — per-language counts shard the
    exchange further, not wider.  The tertile window partitions by
    language; with ~100 languages the split runs as ~100 independent
    sorted partitions (per-partition sort, no global order)."""
    from target_parquet_spark.lineage import mat

    # Same cuts as text_bigram_logprob (r10): doc-sized token arrays
    # (feed the bigram stream twice plus the train stream) and the
    # Zipf-bounded per-language vocab (feeds nst, u1, u2).
    toks = mat(
        td(spark, sf_dir, "documents").select(
            "doc_id", "lang", X.tokens(F.col("text")).alias("t")
        )
    )
    h60 = X.hash60
    bigram_structs = X.bigrams(
        F.col("t"),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
        "array<struct<w1:string,w2:string>>",
    )
    pr = toks.select(
        "doc_id", "lang", F.explode(bigram_structs).alias("p")
    ).select(
        "doc_id",
        "lang",
        h60(F.concat(F.col("p.w1"), F.lit(" "), F.col("p.w2"))).alias("gh"),
        h60(F.col("p.w1")).alias("h1"),
        h60(F.col("p.w2")).alias("h2"),
    )
    train_tokens = toks.filter(F.col("doc_id") % 2 == 0).select(
        "lang", F.explode("t").alias("tk")
    )
    ug = mat(
        train_tokens.select("lang", h60(F.col("tk")).alias("h"))
        .groupBy("lang", "h")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nst = ug.groupBy("lang").agg(F.sum("c").alias("n"))
    bg = (
        pr.filter(F.col("doc_id") % 2 == 0)
        .groupBy("lang", "gh")
        .agg(F.count(F.lit(1)).alias("c_g"))
    )
    u1 = ug.select("lang", F.col("h").alias("h1"), F.col("c").alias("c1"))
    u2 = ug.select("lang", F.col("h").alias("h2"), F.col("c").alias("c2"))
    lp = (
        pr.join(bg, ["lang", "gh"], "left")
        .join(F.broadcast(u1), ["lang", "h1"], "left")
        .join(F.broadcast(u2), ["lang", "h2"], "left")
        .join(F.broadcast(nst), "lang")
        .select("doc_id", "lang", _lp_micro_expr().alias("lp_micro"))
    )
    docs = lp.groupBy("doc_id", "lang").agg(
        F.round(F.sum("lp_micro") / F.count(F.lit(1)))
        .cast("long")
        .alias("tok_lp_micro")
    )
    w3 = Window.partitionBy("lang").orderBy(
        F.desc("tok_lp_micro"), F.asc("doc_id")
    )
    nt = docs.select(
        "lang", "doc_id", "tok_lp_micro", F.ntile(3).over(w3).alias("b3")
    )
    bucket = (
        F.when(F.col("b3") == 1, F.lit("head"))
        .when(F.col("b3") == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return nt.groupBy("lang", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.sum("tok_lp_micro") / 1000000.0 / F.count(F.lit(1)), 4).alias(
            "mean_logprob"
        ),
        F.round(F.min("tok_lp_micro") / 1000000.0, 4).alias("cut_logprob"),
    )


# ---------------------------------------------------------------------------
# hard-negative mining for contrastive training
# ---------------------------------------------------------------------------

_HN_QUERIES = 8  # anchor set: vec_id < 8 (the established query block)
_HN_K = 5


@query(
    "sim_hard_negatives",
    f"""
    WITH q AS (SELECT vec_id AS query_id, label AS query_label,
                      embedding AS qv
               FROM embeddings WHERE vec_id < {_HN_QUERIES}),
    s AS (SELECT q.query_id, q.query_label, e.vec_id AS neg_id,
                 e.label AS neg_label,
                 {_sql_cos_micro('e.embedding', 'q.qv')} AS sim_micro
          FROM embeddings e CROSS JOIN q
          WHERE e.label <> q.query_label),
    r AS (SELECT query_id, query_label, neg_id, neg_label, sim_micro,
                 CAST(row_number() OVER (PARTITION BY query_id
                                         ORDER BY sim_micro DESC, neg_id)
                      AS INTEGER) AS rank
          FROM s)
    SELECT query_id, query_label, neg_id, neg_label, rank,
           round(sim_micro / 1000000.0, 4) AS sim
    FROM r WHERE rank <= {_HN_K}
    """,
)
def sim_hard_negatives(spark, sf_dir):
    """Hard-negative mining for contrastive embedding training: for each
    of the 8 anchor vectors, the top-5 most-similar corpus vectors whose
    label DIFFERS from the anchor's — the near-miss impostors an InfoNCE
    trainer pairs with each anchor to sharpen the decision boundary.
    (Same-label neighbors are positives, not negatives, so the label
    filter is part of the mining semantics, not an optimization.)

    Determinism: cosine quantized to integer micro-units BEFORE ranking;
    rank ordered (sim_micro DESC, neg_id) in both engines.

    Plan shape for 100 TB: the anchor block broadcasts (8 rows — in
    production, one training batch); the corpus is scanned once with the
    label filter applied at the scan; the only shuffle is the 8-key
    per-anchor window.  At full scale the scan side becomes the
    IVF-pruned candidate set (scan_ivf_partitioned) — the mining query
    itself is unchanged."""
    emb = td(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    q = F.broadcast(
        emb.filter(F.col("vec_id") < _HN_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("query_label"),
            F.col("embedding").alias("_qv"),
        )
    )
    s = (
        emb.crossJoin(q)
        .filter(F.col("label") != F.col("query_label"))
        .select(
            "query_id",
            "query_label",
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            _cos_micro(F.col("embedding"), F.col("_qv"), 64).alias("sim_micro"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim_micro"), F.asc("neg_id")
    )
    return (
        s.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _HN_K)
        .select(
            "query_id",
            "query_label",
            "neg_id",
            "neg_label",
            "rank",
            F.round(F.col("sim_micro") / 1000000.0, 4).alias("sim"),
        )
    )


# ---------------------------------------------------------------------------
# retrieval-metrics eval harness (recall@10 / MRR / nDCG@10)
# ---------------------------------------------------------------------------

_RM_K = 10
# Ideal DCG for K fully-relevant positions, integer micro-units.  A
# plan-time constant shared as a literal by BOTH engines (each position
# term is quantized half-up — floor(x+0.5), the SQL round() semantics,
# NOT Python's banker's round — matching the dcg_micro formula).
_IDCG_MICRO = sum(
    math.floor(1000000.0 / math.log2(k + 1) + 0.5) for k in range(1, _RM_K + 1)
)

# queries_r6's 4-plane family (16 buckets), not the sim_ann family's 8: at
# the eval scale a 256-bucket index leaves ~1 candidate per query and every
# metric is a vacuous 0 — a 16-bucket index retrieves a real candidate set,
# so the metrics measure ranking, not emptiness.
_SQL_BUCKET_RM = _SQL_BUCKET4


@query(
    "sim_retrieval_metrics",
    f"""
    WITH b AS (SELECT vec_id, embedding,
                      {_SQL_BUCKET_RM.format(v='embedding')} AS bucket
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, embedding AS qv, bucket AS qbucket
          FROM b WHERE vec_id < {_HN_QUERIES}),
    ex AS (SELECT q.query_id, e.vec_id,
                  {_sql_cos_micro('e.embedding', 'q.qv')} AS sim_micro
           FROM embeddings e CROSS JOIN q
           WHERE e.vec_id <> q.query_id),
    exr AS (SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim_micro DESC, vec_id) AS rank
            FROM ex),
    truth AS (SELECT query_id, vec_id FROM exr WHERE rank <= {_RM_K}),
    cand AS (SELECT q.query_id, b.vec_id,
                    {_sql_cos_micro('b.embedding', 'q.qv')} AS sim_micro
             FROM b JOIN q ON b.bucket = q.qbucket
             WHERE b.vec_id <> q.query_id),
    ret AS (SELECT query_id, vec_id,
                   CAST(row_number() OVER (PARTITION BY query_id
                                           ORDER BY sim_micro DESC, vec_id)
                        AS INTEGER) AS rank
            FROM cand),
    hits AS (SELECT r.query_id, r.rank,
                    CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END AS rel
             FROM ret r LEFT JOIN truth t
               ON t.query_id = r.query_id AND t.vec_id = r.vec_id
             WHERE r.rank <= {_RM_K}),
    agg AS (SELECT query_id,
                   CAST(count(*) AS BIGINT) AS n_retrieved,
                   CAST(sum(rel) AS BIGINT) AS n_hits,
                   min(CASE WHEN rel = 1 THEN rank END) AS first_hit,
                   CAST(sum(rel * CAST(round(1000000.0 / log2(rank + 1))
                                       AS BIGINT)) AS BIGINT) AS dcg_micro
            FROM hits GROUP BY query_id)
    SELECT q.query_id,
           coalesce(a.n_retrieved, 0) AS n_retrieved,
           coalesce(a.n_hits, 0) AS n_hits,
           round(coalesce(a.n_hits, 0) / {_RM_K}.0, 4) AS recall_at10,
           round(coalesce(1.0 / a.first_hit, 0.0), 4) AS mrr,
           round(coalesce(a.dcg_micro, 0) * 1.0 / {_IDCG_MICRO}, 4) AS ndcg
    FROM q LEFT JOIN agg a USING (query_id)
    """,
)
def sim_retrieval_metrics(spark, sf_dir):
    """The ANN eval harness: recall@10, MRR, and nDCG@10 of the
    4-plane LSH-bucket retriever, per query, against exact brute-force
    ground truth.  Ground truth = exact cosine top-10 (self excluded);
    retrieved = the query-bucket candidates ranked by exact cosine,
    truncated to 10.  A query whose bucket holds no candidates still
    emits a row (all-zero metrics) — silent query dropout is the
    classic recall-eval bug.  Complements sim_ivf_recall /
    sim_graph_ann_recall (recall-only, other index families) with
    ranking-aware metrics: MRR scores the first hit's position, nDCG
    the whole ranking.

    Determinism: cosine quantized to micro-units before EVERY rank;
    both rankings tie-break on vec_id; each DCG position term is
    quantized before the sum and the ideal DCG is the same plan-time
    literal in both engines.

    Plan shape for 100 TB: the query block (8 rows; in production the
    eval set, ~1e3) broadcasts into both the exact pass and the bucket
    probe; the exact pass is the documented eval-only full scan that
    DEFINES ground truth (run once, amortized over every index build);
    the bucket probe joins on the bucket key.  Metric aggregation is
    per-query — cardinality-bounded by the eval set."""
    emb = td(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    b = emb.select(
        "vec_id",
        "embedding",
        S.lsh_bucket(F.col("embedding"), n_planes=4, dim=64).alias("bucket"),
    )
    q = F.broadcast(
        b.filter(F.col("vec_id") < _HN_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("_qv"),
            F.col("bucket").alias("qbucket"),
        )
    )
    ex = (
        emb.crossJoin(q.select("query_id", "_qv"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            _cos_micro(F.col("embedding"), F.col("_qv"), 64).alias("sim_micro"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim_micro"), F.asc("vec_id")
    )
    truth = (
        ex.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _RM_K)
        .select("query_id", "vec_id")
    )
    cand = (
        b.join(q, b["bucket"] == q["qbucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            _cos_micro(F.col("embedding"), F.col("_qv"), 64).alias("sim_micro"),
        )
    )
    ret = (
        cand.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _RM_K)
    )
    hits = ret.join(
        truth.withColumn("rel_hit", F.lit(1)), ["query_id", "vec_id"], "left"
    ).select(
        "query_id",
        "rank",
        F.coalesce(F.col("rel_hit"), F.lit(0)).alias("rel"),
    )
    pos_micro = F.round(F.lit(1000000.0) / F.log2(F.col("rank") + 1)).cast(
        "long"
    )
    agg = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_retrieved"),
        F.sum("rel").cast("long").alias("n_hits"),
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("first_hit"),
        F.sum(F.col("rel") * pos_micro).cast("long").alias("dcg_micro"),
    )
    return q.select("query_id").join(agg, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("n_retrieved"), F.lit(0)).alias("n_retrieved"),
        F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
        F.round(F.coalesce(F.col("n_hits"), F.lit(0)) / _RM_K, 4).alias(
            "recall_at10"
        ),
        F.round(
            F.coalesce(F.lit(1.0) / F.col("first_hit"), F.lit(0.0)), 4
        ).alias("mrr"),
        F.round(
            F.coalesce(F.col("dcg_micro"), F.lit(0)) * 1.0 / _IDCG_MICRO, 4
        ).alias("ndcg"),
    )


# ---------------------------------------------------------------------------
# k-center greedy (farthest-point) coreset selection
# ---------------------------------------------------------------------------

_KC_ROUNDS = 6
_KC_SEED_ID = 0


def _sql_sqdist_micro(a: str, b: str) -> str:
    d = f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
    return (
        f"CAST(round(list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> {d} * {d})) * 1000000) AS BIGINT)"
    )


def _sql_kcenter() -> str:
    dist0 = _sql_sqdist_micro("e.embedding", "s.embedding")
    ctes = [
        "e AS (SELECT vec_id, embedding FROM embeddings)",
        f"""d0 AS (SELECT e.vec_id, e.embedding, {dist0} AS dm
           FROM e, (SELECT embedding FROM e
                    WHERE vec_id = {_KC_SEED_ID}) s)""",
    ]
    for r in range(1, _KC_ROUNDS + 1):
        prev = f"d{r - 1}"
        dist = _sql_sqdist_micro("d.embedding", "c.embedding")
        ctes.append(
            f"""c{r} AS (SELECT vec_id, embedding, dm FROM {prev}
               ORDER BY dm DESC, vec_id LIMIT 1)"""
        )
        if r < _KC_ROUNDS:
            ctes.append(
                f"""d{r} AS (SELECT d.vec_id, d.embedding,
                   least(d.dm, {dist}) AS dm FROM {prev} d, c{r} c)"""
            )
    selects = [
        f"SELECT CAST({r} AS BIGINT) AS sel_round, vec_id, "
        f"dm / 1000000.0 AS sel_dist FROM c{r}"
        for r in range(1, _KC_ROUNDS + 1)
    ]
    return "WITH " + ",\n    ".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


@query("sim_kcenter_greedy", _sql_kcenter())
def sim_kcenter_greedy(spark, sf_dir):
    """k-center greedy (farthest-point traversal, Gonzalez 1985) coreset
    selection: seed with vec_id 0, then 6 rounds of "pick the point
    whose min squared-L2 distance to the chosen set is largest".  The
    geometric data-selection baseline behind coreset active learning
    (Sener & Savarese 2018); each selected point's distance at selection
    time is the coverage radius the 2-approximation guarantee bounds.

    Determinism: squared distances are quantized to integer micro-units
    before the argmax; the argmax tie-breaks (dm DESC, vec_id) in both
    engines.  The Spark side collects ONE row per round (the new
    center — bounded model state, the kmeans/logreg/BPE/PCA literal
    convention) and re-injects its exact float components as literals;
    the oracle replays the same recurrence as unrolled CTEs with no
    collected state at all — the two derivations agree only if every
    round's argmax matches exactly.

    Plan shape for 100 TB: the running min-distance column is the
    standard k-center state — one narrow (id, dm) table updated per
    round with a broadcast literal center (no join, no shuffle);
    localCheckpoint truncates the growing lineage exactly as
    dedup_connected_components does.  k scans of the corpus for k
    centers is the known cost of the exact greedy; the scale variant
    seeds from an IVF codebook and runs rounds inside cells."""
    emb = td(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def sqdist_to(vec):
        arr = F.array(*[F.lit(float(v)) for v in vec])
        diff = F.zip_with(
            F.col("embedding"),
            arr,
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        )
        total = F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v)
        return F.round(total * 1000000).cast("long")

    seed = emb.filter(F.col("vec_id") == _KC_SEED_ID).collect()[0]["embedding"]
    cur = emb.select(
        "vec_id", "embedding", sqdist_to(seed).alias("dm")
    ).localCheckpoint(eager=False)
    chosen = []
    for r in range(1, _KC_ROUNDS + 1):
        top = (
            cur.orderBy(F.desc("dm"), F.asc("vec_id")).limit(1).collect()[0]
        )
        chosen.append((r, top["vec_id"], top["dm"] / 1000000.0))
        if r < _KC_ROUNDS:
            cur = cur.select(
                "vec_id",
                "embedding",
                F.least(
                    F.col("dm"), sqdist_to(top["embedding"])
                ).alias("dm"),
            ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        chosen, "sel_round bigint, vec_id bigint, sel_dist double"
    )


# ---------------------------------------------------------------------------
# CUPED variance-reduced experiment read-out
# ---------------------------------------------------------------------------

_CUPED_CUT = "2024-01-16 00:00:00"
_VM = "CAST(round(value * 1000000) AS BIGINT)"


@query(
    "events_cuped_adjustment",
    f"""
    WITH pu AS (
      SELECT user_id,
             {_SQL_HASH_MOD.format(c='user_id', m=2)} AS arm,
             CAST(round(sum(CASE WHEN ts < TIMESTAMP '{_CUPED_CUT}'
                      THEN {_VM} ELSE 0 END) / 10000.0) AS BIGINT) AS xc,
             CAST(round(sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_CUT}'
                      THEN {_VM} ELSE 0 END) / 10000.0) AS BIGINT) AS yc
      FROM events GROUP BY user_id),
    g AS (SELECT count(*) AS n, CAST(sum(xc) AS BIGINT) AS sx,
                 CAST(sum(yc) AS BIGINT) AS sy,
                 CAST(sum(xc * xc) AS BIGINT) AS sxx,
                 CAST(sum(xc * yc) AS BIGINT) AS sxy
          FROM pu),
    th AS (SELECT CASE WHEN 1.0 * sxx / n
                            - (1.0 * sx / n) * (1.0 * sx / n) > 0 THEN
                    round((1.0 * sxy / n - (1.0 * sx / n) * (1.0 * sy / n))
                        / (1.0 * sxx / n - (1.0 * sx / n) * (1.0 * sx / n)),
                        6)
                  ELSE 0.0 END AS theta,
                  round(sx / (100.0 * n), 6) AS mx
           FROM g),
    adj AS (SELECT arm, yc,
                   CAST(round((yc / 100.0
                               - th.theta * (xc / 100.0 - th.mx)) * 100)
                        AS BIGINT) AS yac
            FROM pu, th),
    s AS (SELECT arm, count(*) AS n, CAST(sum(yc) AS BIGINT) AS s1,
                 CAST(sum(yc * yc) AS BIGINT) AS s2,
                 CAST(sum(yac) AS BIGINT) AS a1,
                 CAST(sum(yac * yac) AS BIGINT) AS a2
          FROM adj GROUP BY arm)
    SELECT arm,
           CAST(n AS BIGINT) AS n_users,
           round(s1 / (100.0 * n), 4) AS mean_metric,
           round(a1 / (100.0 * n), 4) AS mean_adjusted,
           CASE WHEN n > 1 THEN
             round((s2 / (10000.0 * n)
                  - (s1 / (100.0 * n)) * (s1 / (100.0 * n))) * n / (n - 1), 4)
           ELSE 0.0 END AS var_metric,
           CASE WHEN n > 1 THEN
             round((a2 / (10000.0 * n)
                  - (a1 / (100.0 * n)) * (a1 / (100.0 * n))) * n / (n - 1), 4)
           ELSE 0.0 END AS var_adjusted,
           CASE WHEN n > 1 THEN
             CASE WHEN s2 / (10000.0 * n)
                       - (s1 / (100.0 * n)) * (s1 / (100.0 * n)) > 0 THEN
               round(100.0 * (1 - (a2 / (10000.0 * n)
                               - (a1 / (100.0 * n)) * (a1 / (100.0 * n)))
                              / (s2 / (10000.0 * n)
                                 - (s1 / (100.0 * n)) * (s1 / (100.0 * n)))),
                 4)
             ELSE 0.0 END
           ELSE 0.0 END AS var_reduction_pct
    FROM s
    """,
)
def events_cuped_adjustment(spark, sf_dir):
    """CUPED variance reduction (Deng et al. 2013) for the hash-split
    A/B experiment: per-user pre-period covariate x (metric before the
    cut date) and post-period metric y, pooled theta = cov(x,y)/var(x),
    adjusted metric y' = y - theta * (x - mean_x), then per-arm
    mean/variance of both raw and adjusted metrics and the variance
    reduction the covariate buys.  The standard pattern for making
    experiments sensitive: same users, same traffic, smaller variance.

    Determinism: per-event values quantized to integer micro-units
    before the per-user sums, per-user metrics re-quantized to integer
    CENTS, and EVERY cross-row power sum (sx, sxx, sxy, then the per-arm
    moments of the adjusted metric) is an exact integer sum — both
    engines feed identical integers into identical float expressions, so
    theta, mean_x, and every output agree bit-for-bit regardless of
    partial-aggregation order (the integer-cents convention; stricter
    than the events_ab_experiment precedent because theta feeds forward
    into every adjusted row).

    Plan shape for 100 TB: one user_id shuffle builds (x, y) per user;
    theta is a 1-row broadcast back onto the user table; per-arm stats
    are 2-key mergeable power sums.  The user table is scanned twice
    (moments, then adjustment) — at scale persist it, exactly as the
    docstring of the AB read-out family notes."""
    from target_parquet_spark.queries_ops import _hash_mod

    ev = td(spark, sf_dir, "events")
    vm = F.round(F.col("value") * 1000000).cast("long")
    cut = F.lit(_CUPED_CUT).cast("timestamp")
    pu = (
        ev.groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.when(F.col("ts") < cut, vm).otherwise(F.lit(0)))
                / 10000.0
            )
            .cast("long")
            .alias("xc"),
            F.round(
                F.sum(F.when(F.col("ts") >= cut, vm).otherwise(F.lit(0)))
                / 10000.0
            )
            .cast("long")
            .alias("yc"),
        )
        .withColumn("arm", _hash_mod(F.col("user_id"), 2))
    )
    g = pu.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xc").cast("long").alias("sx"),
        F.sum("yc").cast("long").alias("sy"),
        F.sum(F.col("xc") * F.col("xc")).cast("long").alias("sxx"),
        F.sum(F.col("xc") * F.col("yc")).cast("long").alias("sxy"),
    )
    one = F.lit(1.0)
    n_, sx, sy, sxx, sxy = (F.col(c) for c in ("n", "sx", "sy", "sxx", "sxy"))
    th = g.select(
        F.when(
            one * sxx / n_ - (one * sx / n_) * (one * sx / n_) > 0,
            F.round(
                (one * sxy / n_ - (one * sx / n_) * (one * sy / n_))
                / (one * sxx / n_ - (one * sx / n_) * (one * sx / n_)),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("theta"),
        F.round(sx / (100.0 * n_), 6).alias("mx"),
    )
    adj = pu.crossJoin(F.broadcast(th)).select(
        "arm",
        "yc",
        F.round(
            (
                F.col("yc") / 100.0
                - F.col("theta") * (F.col("xc") / 100.0 - F.col("mx"))
            )
            * 100
        )
        .cast("long")
        .alias("yac"),
    )
    s = adj.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("yc").cast("long").alias("s1"),
        F.sum(F.col("yc") * F.col("yc")).cast("long").alias("s2"),
        F.sum("yac").cast("long").alias("a1"),
        F.sum(F.col("yac") * F.col("yac")).cast("long").alias("a2"),
    )
    n, s1, s2, a1, a2 = (F.col(c) for c in ("n", "s1", "s2", "a1", "a2"))
    mean_raw = s1 / (100.0 * n)
    mean_adj = a1 / (100.0 * n)
    var_raw = (s2 / (10000.0 * n) - mean_raw * mean_raw) * n / (n - 1)
    var_adj = (a2 / (10000.0 * n) - mean_adj * mean_adj) * n / (n - 1)
    pop_var_raw = s2 / (10000.0 * n) - mean_raw * mean_raw
    pop_var_adj = a2 / (10000.0 * n) - mean_adj * mean_adj
    return s.select(
        "arm",
        n.cast("long").alias("n_users"),
        F.round(mean_raw, 4).alias("mean_metric"),
        F.round(mean_adj, 4).alias("mean_adjusted"),
        F.when(n > 1, F.round(var_raw, 4)).otherwise(F.lit(0.0)).alias(
            "var_metric"
        ),
        F.when(n > 1, F.round(var_adj, 4)).otherwise(F.lit(0.0)).alias(
            "var_adjusted"
        ),
        F.when(
            n > 1,
            F.when(
                pop_var_raw > 0,
                F.round(100.0 * (1 - pop_var_adj / pop_var_raw), 4),
            ).otherwise(F.lit(0.0)),
        )
        .otherwise(F.lit(0.0))
        .alias("var_reduction_pct"),
    )


# ---------------------------------------------------------------------------
# declarative expectation-suite audit (Great-Expectations shape)
# ---------------------------------------------------------------------------

_EXP_LANG_LIST = ("en", "de", "es", "fr", "zh")
_EXP_TYPE_LIST = ("click", "error", "purchase", "signup", "view")
_EXP_STATUS_LIST = ("O", "F", "P")


def _sql_in(vals):
    return "(" + ", ".join(f"'{v}'" for v in vals) + ")"


_EXP_LANGS = _sql_in(_EXP_LANG_LIST)
_EXP_TYPES = _sql_in(_EXP_TYPE_LIST)
_EXP_STATUSES = _sql_in(_EXP_STATUS_LIST)


@query(
    "audit_expectations",
    f"""
    WITH ev AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (WHERE value < 0) AS BIGINT) AS f_neg,
             CAST(count(*) FILTER (WHERE value > 250) AS BIGINT) AS f_cap,
             CAST(count(*) FILTER (WHERE event_type NOT IN {_EXP_TYPES})
                  AS BIGINT) AS f_cat,
             CAST(count(*) FILTER (WHERE event_type = 'error')
                  AS BIGINT) AS f_err
      FROM events),
    od AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (WHERE o_orderstatus NOT IN {_EXP_STATUSES})
                  AS BIGINT) AS f_status,
             CAST(count(*) FILTER (WHERE o_totalprice <= 0)
                  AS BIGINT) AS f_price
      FROM orders),
    dc AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (WHERE length(text) = 0)
                  AS BIGINT) AS f_empty,
             CAST(count(*) FILTER (WHERE n_chars <> length(text))
                  AS BIGINT) AS f_nchars,
             CAST(count(*) FILTER (WHERE lang NOT IN {_EXP_LANGS})
                  AS BIGINT) AS f_lang
      FROM documents),
    rows_ AS (
      SELECT 'events' AS tbl, 'value_non_negative' AS expectation,
             n AS n_checked, f_neg AS n_failed FROM ev
      UNION ALL SELECT 'events', 'value_below_soft_cap', n, f_cap FROM ev
      UNION ALL SELECT 'events', 'type_in_catalog', n, f_cat FROM ev
      UNION ALL SELECT 'events', 'no_error_events', n, f_err FROM ev
      UNION ALL SELECT 'orders', 'status_in_set', n, f_status FROM od
      UNION ALL SELECT 'orders', 'totalprice_positive', n, f_price FROM od
      UNION ALL SELECT 'documents', 'text_not_empty', n, f_empty FROM dc
      UNION ALL SELECT 'documents', 'n_chars_consistent', n, f_nchars FROM dc
      UNION ALL SELECT 'documents', 'lang_in_catalog', n, f_lang FROM dc)
    SELECT tbl, expectation, n_checked, n_failed,
           CAST(CASE WHEN n_failed = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
    FROM rows_
    """,
)
def audit_expectations(spark, sf_dir):
    """Declarative expectation-suite audit (the Great-Expectations /
    dbt-test shape): a fixed catalog of column expectations — range,
    set-membership, consistency, emptiness — evaluated as conditional
    counts in ONE aggregate per table, then unpivoted to one row per
    expectation with pass/fail status.  The suite is deliberately mixed:
    some expectations pass and some fail on this corpus (the soft cap
    and the no-error-events gate), so the op is non-vacuous in both
    directions — the lesson from the join_anti vacuity finding.

    Plan shape for 100 TB: each table is scanned exactly ONCE — every
    expectation is a conditional count inside the same mergeable
    aggregate (map-side combined), and the unpivot runs on the 1-row
    aggregate, not the data.  Adding an expectation adds a column to
    the agg, never a scan."""
    ev = td(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.when(F.col("value") < 0, 1)).cast("long").alias("f_neg"),
        F.count(F.when(F.col("value") > 250, 1)).cast("long").alias("f_cap"),
        F.count(
            F.when(
                ~F.col("event_type").isin(*_EXP_TYPE_LIST),
                1,
            )
        )
        .cast("long")
        .alias("f_cat"),
        F.count(F.when(F.col("event_type") == "error", 1))
        .cast("long")
        .alias("f_err"),
    )
    od = td(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.when(~F.col("o_orderstatus").isin(*_EXP_STATUS_LIST), 1))
        .cast("long")
        .alias("f_status"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1))
        .cast("long")
        .alias("f_price"),
    )
    dc = td(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.when(F.length("text") == 0, 1)).cast("long").alias("f_empty"),
        F.count(F.when(F.col("n_chars") != F.length("text"), 1))
        .cast("long")
        .alias("f_nchars"),
        F.count(F.when(~F.col("lang").isin(*_EXP_LANG_LIST), 1))
        .cast("long")
        .alias("f_lang"),
    )
    ev_rows = ev.selectExpr(
        "stack(4, 'value_non_negative', f_neg, 'value_below_soft_cap', f_cap,"
        " 'type_in_catalog', f_cat, 'no_error_events', f_err)"
        " AS (expectation, n_failed)",
        "n AS n_checked",
    ).select(F.lit("events").alias("tbl"), "expectation", "n_checked", "n_failed")
    od_rows = od.selectExpr(
        "stack(2, 'status_in_set', f_status, 'totalprice_positive', f_price)"
        " AS (expectation, n_failed)",
        "n AS n_checked",
    ).select(F.lit("orders").alias("tbl"), "expectation", "n_checked", "n_failed")
    dc_rows = dc.selectExpr(
        "stack(3, 'text_not_empty', f_empty, 'n_chars_consistent', f_nchars,"
        " 'lang_in_catalog', f_lang) AS (expectation, n_failed)",
        "n AS n_checked",
    ).select(
        F.lit("documents").alias("tbl"), "expectation", "n_checked", "n_failed"
    )
    return (
        ev_rows.unionByName(od_rows)
        .unionByName(dc_rows)
        .withColumn(
            "passed",
            F.when(F.col("n_failed") == 0, F.lit(1)).otherwise(F.lit(0)).cast("long"),
        )
    )


# ---------------------------------------------------------------------------
# tokenizer fertility audit (per-language tokens-per-word)
# ---------------------------------------------------------------------------


def _sql_bpe_fertility() -> str:
    from target_parquet_spark.operators.text import BPE_PATTERN
    from target_parquet_spark.queries_r7 import _BPE_ROUNDS, _sql_bpe_learn

    train = _sql_bpe_learn()
    ctes = train[: train.rindex("\n    SELECT 1 AS rank")]
    return f"""{ctes}
    , corpus_words AS (
      SELECT lang, unnest(regexp_extract_all(lower(text), '{BPE_PATTERN}'))
        AS word
      FROM documents),
    tok AS (
      SELECT w.lang,
             len(list_filter(str_split(v.enc, chr(31)), x -> x != ''))
               AS n_bpe
      FROM corpus_words w JOIN v{_BPE_ROUNDS} v ON v.word = w.word)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_bpe) AS BIGINT) AS tokens_bpe,
           round(CAST(sum(n_bpe) AS DOUBLE) / count(*), 4) AS fertility
    FROM tok GROUP BY lang
    """


@query("text_bpe_fertility", _sql_bpe_fertility())
def text_bpe_fertility(spark, sf_dir):
    """Tokenizer fertility audit: BPE tokens emitted per whitespace word,
    PER LANGUAGE, under the merge table learned on the full corpus — the
    multilingual-fairness metric every tokenizer report publishes (a
    language with fertility 2x pays twice the context budget per word).
    Same learned vocabulary as text_bpe_apply; the grouping key is the
    audit dimension.

    Plan shape for 100 TB: identical to text_bpe_apply — the corpus
    explodes to its word stream and joins the Zipf-bounded vocabulary
    broadcast; one scan, one broadcast join, a per-language aggregate."""
    from target_parquet_spark.queries_r7 import _BPE_SEP, learn_bpe_merges

    _, vocab = learn_bpe_merges(spark, sf_dir)
    docs = td(spark, sf_dir, "documents")
    words = docs.select(
        "lang", F.explode(X.bpe_tokens(F.col("text"))).alias("word")
    ).filter(~F.col("word").contains(_BPE_SEP))
    enc_len = F.size(
        F.filter(F.split(F.col("enc"), _BPE_SEP), lambda x: x != F.lit(""))
    )
    v = vocab.select("word", enc_len.alias("n_bpe"))
    return (
        words.join(F.broadcast(v), "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_bpe").cast("long").alias("tokens_bpe"),
            F.round(F.sum("n_bpe").cast("double") / F.count(F.lit(1)), 4).alias(
                "fertility"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Matryoshka dimension-truncation recall audit
# ---------------------------------------------------------------------------

_MRL_DIMS = (8, 16, 32, 64)


def _sql_cos_micro_safe(a: str, b: str) -> str:
    """Zero-norm-safe micro cosine: a zero vector (likely for TRUNCATED
    prefixes) ranks at sentinel -2e6 instead of dividing by zero —
    Spark's ANSI mode would raise, DuckDB would emit NaN."""
    na = _SQL_DOT.format(a=a, b=a)
    nb = _SQL_DOT.format(a=b, b=b)
    return (
        f"CASE WHEN {na} > 0 AND {nb} > 0 THEN "
        + _sql_cos_micro(a, b)
        + " ELSE -2000000 END"
    )


def _cos_micro_safe(a, b, dim=None):
    """Spark twin of ``_sql_cos_micro_safe``."""
    return (
        F.when(
            (S.dot(a, a, dim) > 0) & (S.dot(b, b, dim) > 0),
            _cos_micro(a, b, dim),
        )
        .otherwise(F.lit(-2000000))
        .cast("long")
    )


def _sql_matryoshka() -> str:
    sims = ",\n             ".join(
        _sql_cos_micro_safe(f"e.embedding[1:{d}]", f"q.qv[1:{d}]")
        + f" AS s{d}"
        for d in _MRL_DIMS
    )
    parts = [
        f"""q AS (SELECT vec_id AS query_id, embedding AS qv
          FROM embeddings WHERE vec_id < {_HN_QUERIES}),
    pr AS (SELECT q.query_id, e.vec_id,
             {sims}
           FROM embeddings e CROSS JOIN q
           WHERE e.vec_id <> q.query_id),
    truth AS (SELECT query_id, vec_id
              FROM (SELECT query_id, vec_id,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY s{max(_MRL_DIMS)}
                                                DESC, vec_id) AS rank
                    FROM pr)
              WHERE rank <= {_RM_K})"""
    ]
    selects = []
    for d in _MRL_DIMS:
        parts.append(
            f"""r{d} AS (SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY s{d} DESC, vec_id) AS rank
        FROM pr)"""
        )
        parts.append(
            f"""h{d} AS (SELECT r.query_id, CAST(count(*) AS BIGINT) AS hits
        FROM r{d} r JOIN truth t
          ON t.query_id = r.query_id AND t.vec_id = r.vec_id
        WHERE r.rank <= {_RM_K}
        GROUP BY r.query_id)"""
        )
        selects.append(
            f"""SELECT CAST({d} AS BIGINT) AS dim,
           CAST(count(*) AS BIGINT) AS n_queries,
           round(sum(coalesce(h.hits, 0)) / (count(*) * {_RM_K}.0), 4)
             AS mean_recall10
    FROM q LEFT JOIN h{d} h USING (query_id)"""
        )
    return "WITH " + ",\n    ".join(parts) + "\n" + "\nUNION ALL ".join(selects)


@query("sim_matryoshka_recall", _sql_matryoshka())
def sim_matryoshka_recall(spark, sf_dir):
    """Matryoshka-representation audit (Kusupati et al. 2022): recall@10
    of brute-force retrieval using only the FIRST d dimensions of the
    embedding, for d in 8/16/32/64, against full-dimension ground truth.
    The curve tells a pipeline how far it can truncate stored vectors
    (4x-8x memory/bandwidth savings at serving time) before retrieval
    quality collapses — the d=64 row is the identity check (recall 1.0
    by construction: truth ranks by the same s64 column).

    Determinism: every ranking uses micro-quantized cosine with the
    vec_id tie-break; a zero-norm truncated prefix scores the -2e6
    sentinel (ranks last) in BOTH engines instead of dividing by zero
    (Spark ANSI would raise, DuckDB would emit NaN).

    Plan shape for 100 TB: ONE broadcast (query-block) scan computes
    all four truncated sims as sibling projections of the same pair
    stream — audit levels add projected columns, not corpus passes —
    then one rank window per level over the shared exchange.  At scale
    the scan side is the IVF-pruned candidate set."""
    emb = td(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = F.broadcast(
        emb.filter(F.col("vec_id") < _HN_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("_qv"),
        )
    )
    pr = (
        emb.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            *[
                _cos_micro_safe(
                    F.slice(F.col("embedding"), 1, d),
                    F.slice(F.col("_qv"), 1, d),
                    dim=d,
                ).alias(f"s{d}")
                for d in _MRL_DIMS
            ],
        )
    )
    w_truth = Window.partitionBy("query_id").orderBy(
        F.desc(f"s{max(_MRL_DIMS)}"), F.asc("vec_id")
    )
    truth = (
        pr.withColumn("rank", F.row_number().over(w_truth))
        .filter(F.col("rank") <= _RM_K)
        .select("query_id", "vec_id")
    )
    out = None
    for d in _MRL_DIMS:
        w_d = Window.partitionBy("query_id").orderBy(
            F.desc(f"s{d}"), F.asc("vec_id")
        )
        rd = (
            pr.select("query_id", "vec_id", f"s{d}")
            .withColumn("rank", F.row_number().over(w_d))
            .filter(F.col("rank") <= _RM_K)
        )
        hd = rd.join(truth, ["query_id", "vec_id"]).groupBy("query_id").agg(
            F.count(F.lit(1)).cast("long").alias("hits")
        )
        md = (
            q.select("query_id")
            .join(hd, "query_id", "left")
            .agg(
                F.lit(d).cast("long").alias("dim"),
                F.count(F.lit(1)).cast("long").alias("n_queries"),
                F.round(
                    F.sum(F.coalesce(F.col("hits"), F.lit(0)))
                    / (F.count(F.lit(1)) * float(_RM_K)),
                    4,
                ).alias("mean_recall10"),
            )
        )
        out = md if out is None else out.unionByName(md)
    return out


# ---------------------------------------------------------------------------
# difference-in-differences experiment read-out
# ---------------------------------------------------------------------------


@query(
    "events_did_estimate",
    f"""
    WITH pu AS (
      SELECT user_id,
             {_SQL_HASH_MOD.format(c='user_id', m=2)} AS arm,
             CAST(round(sum(CASE WHEN ts < TIMESTAMP '{_CUPED_CUT}'
                      THEN {_VM} ELSE 0 END) / 10000.0) AS BIGINT) AS xc,
             CAST(round(sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_CUT}'
                      THEN {_VM} ELSE 0 END) / 10000.0) AS BIGINT) AS yc
      FROM events GROUP BY user_id),
    d AS (SELECT arm, yc - xc AS dc FROM pu),
    s AS (SELECT arm, count(*) AS n, CAST(sum(dc) AS BIGINT) AS s1,
                 CAST(sum(dc * dc) AS BIGINT) AS s2
          FROM d GROUP BY arm),
    ab AS (SELECT max(CASE WHEN arm = 0 THEN n END) AS n_a,
                  max(CASE WHEN arm = 1 THEN n END) AS n_b,
                  max(CASE WHEN arm = 0 THEN s1 END) AS s1_a,
                  max(CASE WHEN arm = 1 THEN s1 END) AS s1_b,
                  max(CASE WHEN arm = 0 THEN s2 END) AS s2_a,
                  max(CASE WHEN arm = 1 THEN s2 END) AS s2_b
           FROM s)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           round(s1_a / (100.0 * n_a), 4) AS mean_delta_a,
           round(s1_b / (100.0 * n_b), 4) AS mean_delta_b,
           round(s1_b / (100.0 * n_b) - s1_a / (100.0 * n_a), 4) AS did,
           CASE WHEN n_a > 1 AND n_b > 1 THEN
             CASE WHEN ((s2_a / (10000.0 * n_a)
                       - (s1_a / (100.0 * n_a)) * (s1_a / (100.0 * n_a)))
                      * n_a / (n_a - 1)) / n_a
                     + ((s2_b / (10000.0 * n_b)
                         - (s1_b / (100.0 * n_b)) * (s1_b / (100.0 * n_b)))
                        * n_b / (n_b - 1)) / n_b > 0
                THEN round((s1_b / (100.0 * n_b) - s1_a / (100.0 * n_a))
                 / sqrt(((s2_a / (10000.0 * n_a)
                          - (s1_a / (100.0 * n_a)) * (s1_a / (100.0 * n_a)))
                         * n_a / (n_a - 1)) / n_a
                        + ((s2_b / (10000.0 * n_b)
                            - (s1_b / (100.0 * n_b)) * (s1_b / (100.0 * n_b)))
                           * n_b / (n_b - 1)) / n_b), 4)
                ELSE 0.0 END
           ELSE 0.0 END AS welch_t
    FROM ab
    """,
)
def events_did_estimate(spark, sf_dir):
    """Difference-in-differences read-out for the hash-split experiment:
    per-user pre->post metric delta, per-arm mean delta, DiD estimate
    (treatment delta minus control delta) and its Welch t statistic over
    the per-user deltas.  The panel-data shape that separates a
    treatment effect from a shared time trend — on this A/A-like split
    the DiD should be (and is) statistically indistinguishable from 0.

    Determinism: a degenerate split — zero pooled variance OR a
    one-user arm (whose Bessel divisor is 0) — yields t = 0.0 by
    nested explicit guards in BOTH engines — under
    Spark 4's ANSI mode an unguarded division by zero is a runtime
    error, and DuckDB would return inf.  Otherwise the same
    integer-cents pipeline as events_cuped_adjustment — per-user sums micro-exact, deltas exact
    integers, per-arm power sums exact integer sums, floats derived once
    from identical integers in both engines.

    Plan shape for 100 TB: one user_id shuffle, a 2-key mergeable
    power-sum aggregate, a 1-row pivot — the experiment read-out family
    never touches event rows twice."""
    from target_parquet_spark.queries_ops import _hash_mod

    ev = td(spark, sf_dir, "events")
    vm = F.round(F.col("value") * 1000000).cast("long")
    cut = F.lit(_CUPED_CUT).cast("timestamp")
    pu = (
        ev.groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.when(F.col("ts") < cut, vm).otherwise(F.lit(0)))
                / 10000.0
            )
            .cast("long")
            .alias("xc"),
            F.round(
                F.sum(F.when(F.col("ts") >= cut, vm).otherwise(F.lit(0)))
                / 10000.0
            )
            .cast("long")
            .alias("yc"),
        )
        .withColumn("arm", _hash_mod(F.col("user_id"), 2))
    )
    d = pu.select("arm", (F.col("yc") - F.col("xc")).alias("dc"))
    s = d.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dc").cast("long").alias("s1"),
        F.sum(F.col("dc") * F.col("dc")).cast("long").alias("s2"),
    )
    ab = s.agg(
        *[
            F.max(F.when(F.col("arm") == a, F.col(c))).alias(f"{c}_{l}")
            for a, l in ((0, "a"), (1, "b"))
            for c in ("n", "s1", "s2")
        ]
    )
    n_a, n_b, s1_a, s1_b, s2_a, s2_b = (
        F.col(c) for c in ("n_a", "n_b", "s1_a", "s1_b", "s2_a", "s2_b")
    )
    mean_a = s1_a / (100.0 * n_a)
    mean_b = s1_b / (100.0 * n_b)
    var_a = (s2_a / (10000.0 * n_a) - mean_a * mean_a) * n_a / (n_a - 1)
    var_b = (s2_b / (10000.0 * n_b) - mean_b * mean_b) * n_b / (n_b - 1)
    return ab.select(
        n_a.cast("long").alias("n_a"),
        n_b.cast("long").alias("n_b"),
        F.round(mean_a, 4).alias("mean_delta_a"),
        F.round(mean_b, 4).alias("mean_delta_b"),
        F.round(mean_b - mean_a, 4).alias("did"),
        F.when(
            (n_a > 1) & (n_b > 1),
            F.when(
                var_a / n_a + var_b / n_b > 0,
                F.round(
                    (mean_b - mean_a) / F.sqrt(var_a / n_a + var_b / n_b), 4
                ),
            ).otherwise(F.lit(0.0)),
        )
        .otherwise(F.lit(0.0))
        .alias("welch_t"),
    )


# ---------------------------------------------------------------------------
# Kneser-Ney bigram LM (the calibrated-smoothing twin of stupid backoff)
# ---------------------------------------------------------------------------

_KN_D = 0.75  # absolute discount (Chen & Goodman 1999's fixed-D variant)
_KN_FLAG_MICRO = -9000000
# Broadcast ceiling for the hist/cont side-tables (VERDICT r8 #4): both
# are unigram-vocab-sized (one ~24 B row per distinct history / word).
# 2M types ~ 50 MB per table — comfortably broadcastable; a 1e8-type web
# vocab would make them multi-GB, so above the ceiling the scoring
# stream falls back to shuffle (sort-merge) joins on h1/h2 instead.
# Same algebra either way; only the join STRATEGY changes, so the oracle
# hash is unaffected.  tests/test_r14.py forces both sides of the gate
# and asserts the plan (BroadcastHashJoin below, SortMergeJoin above).
_KN_BCAST_MAX_VOCAB = 2_000_000


@query(
    "text_kneser_ney_logprob",
    f"""
    WITH d AS (
      SELECT doc_id, source, {SQL_TOKS.format(c='text')} AS t FROM documents),
    pr AS (
      SELECT doc_id, source,
             {X.SQL_HASH60.format(c="t[i] || ' ' || t[i+1]")} AS gh,
             {X.SQL_HASH60.format(c='t[i]')} AS h1,
             {X.SQL_HASH60.format(c='t[i+1]')} AS h2
      FROM d, unnest(range(1, len(t))) AS u(i)),
    bg AS (
      SELECT gh, h1, h2, CAST(count(*) AS BIGINT) AS c
      FROM pr WHERE doc_id % 2 = 0
      GROUP BY gh, h1, h2),
    hist AS (SELECT h1, CAST(sum(c) AS BIGINT) AS c1,
                    CAST(count(*) AS BIGINT) AS n1fw
             FROM bg GROUP BY h1),
    cont AS (SELECT h2, CAST(count(*) AS BIGINT) AS n1bw FROM bg GROUP BY h2),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS ntypes FROM bg),
    lp AS (
      SELECT p.doc_id, p.source,
             CAST(round(ln(CASE WHEN h.c1 IS NOT NULL THEN
                    greatest(coalesce(b.c, 0) - {_KN_D}, 0.0) / h.c1
                    + ({_KN_D} * h.n1fw / h.c1)
                      * ((coalesce(ct.n1bw, 0) + 1.0) / (t.ntypes + 1000000))
                  ELSE (coalesce(ct.n1bw, 0) + 1.0) / (t.ntypes + 1000000)
                  END) * 1000000) AS BIGINT) AS lp_micro
      FROM pr p
      LEFT JOIN bg b ON b.gh = p.gh
      LEFT JOIN hist h ON h.h1 = p.h1
      LEFT JOIN cont ct ON ct.h2 = p.h2
      CROSS JOIN nt t),
    docs AS (
      SELECT doc_id, source,
             CAST(round(sum(lp_micro) / count(*)) AS BIGINT) AS tok_lp_micro
      FROM lp GROUP BY doc_id, source)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(sum(tok_lp_micro) / 1000000.0 / count(*), 4)
             AS mean_logprob_kn,
           CAST(count(*) FILTER (WHERE tok_lp_micro < {_KN_FLAG_MICRO})
                AS BIGINT) AS n_flagged
    FROM docs GROUP BY source
    """,
)
def text_kneser_ney_logprob(spark, sf_dir):
    """Interpolated Kneser-Ney bigram LM (Chen & Goodman 1999, fixed
    absolute discount D=0.75) trained on the even-doc_id half, scoring
    every document's mean per-token log-prob.  The calibrated complement
    to text_bigram_logprob's stupid backoff: observed bigrams are
    discounted toward a CONTINUATION unigram (how many distinct
    histories precede the word), so a word seen in many contexts earns
    more backoff mass than an equally-frequent word welded to one
    context — the property the planted test pins.

    Determinism: the same integer-microunit quantization and held-out
    split as the other two LM consumers; the continuation denominator is
    add-one smoothed exactly like the backoff unigram.

    Plan shape for 100 TB: the bigram TYPE table (gh, h1, h2, c) is the
    only data-sized state; hist/cont are vocabulary-bounded projections
    of it, BROADCAST onto the scoring stream while the vocabulary stays
    under ``_KN_BCAST_MAX_VOCAB`` types (~50 MB/table at 2M) and joined
    by shuffle (sort-merge on h1/h2) above it — a 1e8-type web vocab
    makes the tables multi-GB, exactly the contamination query's
    fixed-vs-growing side distinction.  The vocab sizes and the bigram
    type count come from ONE aggregate over the type table, collected
    at plan time (the "model state as plan-time literals" convention —
    this also turns the previous ntypes crossJoin into a literal).  The
    scoring stream itself shuffles once on the bigram key — the
    text_bigram_logprob plan with two side-tables."""
    from target_parquet_spark.lineage import mat

    # Doc-sized token arrays, computed once: the bigram stream below is
    # derived twice (train-half type counts and the scoring pass).
    toks = mat(
        td(spark, sf_dir, "documents").select(
            "doc_id", "source", X.tokens(F.col("text")).alias("t")
        )
    )
    h60 = X.hash60
    bigram_structs = X.bigrams(
        F.col("t"),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
        "array<struct<w1:string,w2:string>>",
    )
    pr = toks.select(
        "doc_id", "source", F.explode(bigram_structs).alias("p")
    ).select(
        "doc_id",
        "source",
        h60(F.concat(F.col("p.w1"), F.lit(" "), F.col("p.w2"))).alias("gh"),
        h60(F.col("p.w1")).alias("h1"),
        h60(F.col("p.w2")).alias("h2"),
    )
    # The bigram TYPE table feeds four consumers (the scoring join,
    # hist, cont, and the plan-time stats aggregate); without a lineage
    # cut each one re-ran the whole tokenize+explode+hash60 pipeline
    # (r10 plan audit: zero exchange reuse).  The type table is the LM
    # artifact a production pipeline writes out — vocabulary-bounded,
    # never corpus-sized — so it is the right cut point (lineage.mat
    # notes; cutting the gram-sized ``pr`` stream instead measured
    # slower on the winnowing twin of this shape).
    bg = mat(
        pr.filter(F.col("doc_id") % 2 == 0)
        .groupBy("gh", "h1", "h2")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    hist = bg.groupBy("h1").agg(
        F.sum("c").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1fw"),
    )
    cont = bg.groupBy("h2").agg(F.count(F.lit(1)).cast("long").alias("n1bw"))
    stats = bg.agg(
        F.count(F.lit(1)).cast("long").alias("ntypes"),
        F.countDistinct("h1").alias("v1"),
        F.countDistinct("h2").alias("v2"),
    ).first()
    n_types = stats["ntypes"]
    n_vocab = max(stats["v1"], stats["v2"])
    pc = (F.coalesce(F.col("n1bw"), F.lit(0)) + F.lit(1.0)) / (
        F.lit(n_types) + F.lit(1000000)
    )
    p_kn = F.when(
        F.col("c1").isNotNull(),
        F.greatest(
            F.coalesce(F.col("c"), F.lit(0)) - F.lit(_KN_D), F.lit(0.0)
        )
        / F.col("c1")
        + (F.lit(_KN_D) * F.col("n1fw") / F.col("c1")) * pc,
    ).otherwise(pc)
    if n_vocab <= _KN_BCAST_MAX_VOCAB:
        hist_j, cont_j = F.broadcast(hist), F.broadcast(cont)
    else:  # web-scale vocab: multi-GB side-tables — shuffle join instead
        hist_j, cont_j = hist, cont
    lp = (
        pr.join(bg.select("gh", "c"), "gh", "left")
        .join(hist_j, "h1", "left")
        .join(cont_j, "h2", "left")
        .select(
            "doc_id",
            "source",
            F.round(F.log(p_kn) * 1000000).cast("long").alias("lp_micro"),
        )
    )
    docs = lp.groupBy("doc_id", "source").agg(
        F.round(F.sum("lp_micro") / F.count(F.lit(1)))
        .cast("long")
        .alias("tok_lp_micro")
    )
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.sum("tok_lp_micro") / 1000000.0 / F.count(F.lit(1)), 4).alias(
            "mean_logprob_kn"
        ),
        F.count(F.when(F.col("tok_lp_micro") < _KN_FLAG_MICRO, F.lit(1)))
        .cast("long")
        .alias("n_flagged"),
    )


# ---------------------------------------------------------------------------
# TrustRank: personalized PageRank from a trusted seed set
# ---------------------------------------------------------------------------

_PPR_SEED_MOD = 17
_PPR_ITERS = 5
_PPR_D = 0.85


def _sql_ppr_ctes(iters: int = _PPR_ITERS, damping: float = _PPR_D) -> str:
    """TrustRank twin via the SHARED pagerank CTE builder (queries_ext)
    with a seed-teleport predicate — one chain definition for dupweb /
    TextRank / TrustRank, per the no-drift convention."""
    from target_parquet_spark.queries_ext import _sql_pagerank_ctes

    return _sql_pagerank_ctes(
        iters=iters, damping=damping,
        seed_where=f"node % {_PPR_SEED_MOD} = 0",
    )


def _sql_trustrank() -> str:
    from target_parquet_spark.queries_ext import (
        SQL_CORPUS,
        SQL_MINHASH_PAIR_CTES,
    )

    return f"""
    WITH {SQL_CORPUS},
    {SQL_MINHASH_PAIR_CTES},
    {_sql_ppr_ctes()}
    SELECT node AS doc_id, round(rank * 1000.0::DOUBLE, 4) AS trust_pm
    FROM r{_PPR_ITERS}
    """


@query("graph_trustrank_seeds", _sql_trustrank())
def graph_trustrank_seeds(spark, sf_dir):
    """TrustRank (Gyongyi et al. 2004) over the near-dup similarity
    graph: personalized PageRank whose teleport vector is uniform over a
    trusted seed set (every 17th doc) instead of uniform over all
    nodes.  Rank mass flows outward from the seeds along similarity
    edges — components containing no seed stay at exactly 0, so the
    score doubles as a "connected to anything trusted?" indicator, the
    propagation primitive behind seed-quality corpus curation (and,
    inverted, spam-web demotion).

    Determinism: same fixed-iteration unrolled-CTE oracle discipline as
    graph_pagerank_dupweb; ranks reported per-mille at 4dp.

    Plan shape for 100 TB: identical per-round cost to pagerank — one
    src-key join plus one dst groupBy per iteration, teleport column
    riding the node table with no extra shuffle; localCheckpoint per
    round cuts lineage.  Edges come from the WRITTEN minhash pair
    artifact (queries_r7.minhash_pair_artifact) — the pair stage is
    built once per corpus and amortizes across the whole near-dup
    graph family instead of re-running per query."""
    return trustrank_over(spark, sf_dir)


def trustrank_over(spark, sf_dir, out_cap: int | None = None):
    """The TrustRank body — shared by graph_trustrank_seeds and its
    out-degree-capped twin (queries_r13, r8) so the seed rule, weight
    column, and output projection cannot drift between them.  With
    ``out_cap`` each source keeps only its ``out_cap`` strongest
    out-edges (jaccard desc, neighbor-id tie-break) before the power
    iteration — the SQL twin of _sql_pagerank_ctes(out_cap=...)."""
    from pyspark.sql import Window

    from target_parquet_spark.operators.graph import personalized_pagerank
    from target_parquet_spark.queries_ext import _spark_corpus
    from target_parquet_spark.queries_r7 import minhash_pair_artifact

    corpus = _spark_corpus(spark, sf_dir)
    pairs = minhash_pair_artifact(spark, sf_dir)
    sym = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst"), "jaccard"
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("src"), F.col("id_a").alias("dst"), "jaccard"
        )
    )
    if out_cap is not None:
        wr = Window.partitionBy("src").orderBy(
            F.col("jaccard").desc(), F.col("dst")
        )
        sym = (
            sym.withColumn("_rn", F.row_number().over(wr))
            .filter(F.col("_rn") <= out_cap)
            .drop("_rn")
        )
    seeds = corpus.filter(F.col("doc_id") % _PPR_SEED_MOD == 0).select(
        F.col("doc_id").alias("node")
    )
    ranks = personalized_pagerank(
        sym, seeds, "src", "dst", weight="jaccard", iters=_PPR_ITERS,
        damping=_PPR_D,
    )
    return ranks.select(
        F.col("node").alias("doc_id"),
        F.round(F.col("rank") * 1000.0, 4).alias("trust_pm"),
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival estimate of user retention
# ---------------------------------------------------------------------------

_KM_GAP_H = 24  # a >24h silence closes an activity episode
# Episodes still running in the corpus's final day may be artifacts of
# the observation window ending, not real endings -> censored.
_KM_CENSOR = "2024-01-29 00:00:00"


@query(
    "events_survival_km",
    f"""
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                    OR datediff('second',
                                lag(ts) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id),
                                ts) > {_KM_GAP_H} * 3600
                  THEN 1 ELSE 0 END AS brk
      FROM events),
    sn AS (
      SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS sid
      FROM o),
    sess AS (
      SELECT user_id, sid, min(ts) AS st, max(ts) AS en
      FROM sn GROUP BY user_id, sid),
    dur AS (
      SELECT CAST(floor(datediff('second', st, en) / 3600.0) AS BIGINT) AS t,
             CASE WHEN en <= TIMESTAMP '{_KM_CENSOR}'
                  THEN 1 ELSE 0 END AS churned
      FROM sess),
    et AS (
      SELECT t,
             CAST(count(*) FILTER (WHERE churned = 1) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS ct
      FROM dur GROUP BY t),
    rk AS (
      SELECT t, d,
             CAST(sum(ct) OVER (ORDER BY t DESC) AS BIGINT) AS n_risk
      FROM et),
    tm AS (
      SELECT t, d, n_risk,
             CAST(round(ln(greatest(1.0 - 1.0 * d / n_risk, 0.000000000001))
                        * 1000000) AS BIGINT) AS term_micro
      FROM rk),
    cm AS (
      SELECT t, d, n_risk,
             CAST(sum(term_micro) OVER (ORDER BY t ASC) AS BIGINT) AS cum
      FROM tm)
    SELECT t, n_risk, d AS n_churned,
           round(exp(cum / 1000000.0), 4) AS survival
    FROM cm WHERE d > 0
    """,
)
def events_survival_km(spark, sf_dir):
    """Kaplan-Meier survival curve over ACTIVITY EPISODES: a >24h
    silence closes an episode (sessionization at day scale), the
    subject is the episode, duration is its elapsed hours, and episodes
    still running on the corpus's final day are right-CENSORED (the
    observation window ended, not the episode) — the censoring that
    distinguishes survival analysis from a naive duration histogram.  S(t) steps down by (1 - d/n_at_risk) at each duration
    with observed churn; censored users leave the risk set without
    forcing a step.  The product is computed as exp of a cumulative sum
    of per-step log terms.

    Determinism: the episode-break gap compares SECOND-boundary
    differences in both engines (DuckDB datediff('second') == Spark's
    truncated epoch-cast subtraction — a raw interval comparison would
    diverge on gaps within a second of exactly 24h); each log term is
    micro-quantized BEFORE the cumulative
    sum (exact integer window sum), so the running product is identical
    in both engines; the extinction step (d = n_at_risk) is floored at
    1e-12 in both, rounding survival to 0.0 instead of ln(0).

    Plan shape for 100 TB: one user_id shuffle carries both the
    sessionization windows and the episode aggregate; everything after
    runs on the DURATION table — cardinality-bounded by the observation
    window (hours, not users), so the unpartitioned KM windows are
    metadata-sized (the RFM/Pareto convention)."""
    from pyspark.sql import Window as W

    ev = td(spark, sf_dir, "events")
    w_u = W.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    prev = F.lag("ts").over(w_u)
    brk = (
        F.when(
            prev.isNull()
            | (
                F.col("ts").cast("long") - prev.cast("long")
                > _KM_GAP_H * 3600
            ),
            F.lit(1),
        ).otherwise(F.lit(0))
    )
    sn = ev.select(
        "user_id", "ts", "event_id", brk.alias("brk")
    ).select(
        "user_id",
        "ts",
        F.sum("brk")
        .over(
            W.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
        )
        .alias("sid"),
    )
    sess = sn.groupBy("user_id", "sid").agg(
        F.min("ts").alias("st"), F.max("ts").alias("en")
    )
    # elapsed hours from truncated epoch seconds: cast-to-long floors the
    # sub-second part exactly like DuckDB's second-boundary datediff
    dur = sess.select(
        F.floor(
            (F.col("en").cast("long") - F.col("st").cast("long")) / 3600
        )
        .cast("long")
        .alias("t"),
        F.when(
            F.col("en") <= F.lit(_KM_CENSOR).cast("timestamp"), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("churned"),
    )
    et = dur.groupBy("t").agg(
        F.count(F.when(F.col("churned") == 1, 1)).cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("ct"),
    )
    w_desc = W.orderBy(F.desc("t")).rowsBetween(W.unboundedPreceding, W.currentRow)
    rk = et.select(
        "t", "d", F.sum("ct").over(w_desc).cast("long").alias("n_risk")
    )
    term = F.round(
        F.log(
            F.greatest(
                F.lit(1.0) - F.lit(1.0) * F.col("d") / F.col("n_risk"),
                F.lit(1e-12),
            )
        )
        * 1000000
    ).cast("long")
    tm = rk.select("t", "d", "n_risk", term.alias("term_micro"))
    w_asc = W.orderBy(F.asc("t")).rowsBetween(W.unboundedPreceding, W.currentRow)
    cm = tm.select(
        "t", "d", "n_risk", F.sum("term_micro").over(w_asc).cast("long").alias("cum")
    )
    return cm.filter(F.col("d") > 0).select(
        "t",
        "n_risk",
        F.col("d").alias("n_churned"),
        F.round(F.exp(F.col("cum") / 1000000.0), 4).alias("survival"),
    )


# ---------------------------------------------------------------------------
# topic labeling for embedding clusters (BERTopic's c-TF-IDF step)
# ---------------------------------------------------------------------------

_TOPIC_K = 8
_TOPIC_TOP = 3


def _sql_cluster_topics() -> str:
    from target_parquet_spark.queries_ext import _sql_kmeans_ctes

    # a2 (the trainer's last assignment) is against the ROUND-1
    # centroids; the shipped model assigns against the FINAL c2 — replay
    # that extra assignment here, exactly as ivf_cell does.
    d_fin = (
        f"-({_SQL_DOT.format(a='e.embedding', b='c.c')}"
        f" / sqrt({_SQL_DOT.format(a='c.c', b='c.c')}))"
    )
    return f"""
    WITH {_sql_kmeans_ctes(iters=2, k=_TOPIC_K, metric='cos')},
    dfin AS (SELECT e.vec_id, c.k, {d_fin} AS d
             FROM embeddings e CROSS JOIN c2 c),
    afin AS (SELECT vec_id, k FROM (
               SELECT vec_id, k,
                      row_number() OVER (PARTITION BY vec_id
                                         ORDER BY d, k) AS rn
               FROM dfin) WHERE rn = 1),
    tok AS (
      SELECT doc_id, unnest({SQL_TOKS.format(c='text')}) AS term
      FROM documents),
    j AS (SELECT a.k AS cluster, t.term
          FROM afin a JOIN tok t ON t.doc_id = a.vec_id),
    tf AS (SELECT cluster, term, CAST(count(*) AS BIGINT) AS tf
           FROM j GROUP BY cluster, term),
    fw AS (SELECT term, CAST(sum(tf) AS BIGINT) AS fw FROM tf GROUP BY term),
    tot AS (SELECT CAST(sum(tf) AS BIGINT) AS s FROM tf),
    sc AS (SELECT cluster, term, tf,
                  CAST(round(tf * ln(1.0 + (1.0 * s / {_TOPIC_K}) / fw)
                             * 1000000) AS BIGINT) AS sc_micro
           FROM tf JOIN fw USING (term) CROSS JOIN tot),
    rk AS (SELECT cluster, term, sc_micro,
                  CAST(row_number() OVER (PARTITION BY cluster
                                          ORDER BY sc_micro DESC, term)
                       AS INTEGER) AS rank
           FROM sc)
    SELECT cluster, rank, term,
           round(sc_micro / 1000000.0, 4) AS ctfidf
    FROM rk WHERE rank <= {_TOPIC_TOP}
    """


@query("text_cluster_topics", _sql_cluster_topics())
def text_cluster_topics(spark, sf_dir):
    """Topic labeling for embedding clusters — BERTopic's c-TF-IDF step
    (Grootendorst 2022): spherical k-means over the embeddings (K=8,
    2 Lloyd rounds, the shared trained-codebook seam), then for each
    cluster the top-3 most DISTINCTIVE terms of its documents by
    class-based TF-IDF: tf(w,c) * ln(1 + A / f_w), A = average
    tokens per class.  Embedding row vec_id carries the text of
    document doc_id = vec_id (the corpus pairing).  This is the label
    that turns an opaque cluster id into something a curation reviewer
    can read.

    Determinism: cluster assignment replays the kmeans oracle CTEs
    (6dp-quantized centroids, (d, k) tie-break); c-TF-IDF scores are
    micro-quantized before the per-cluster rank with a term tie-break.

    Plan shape for 100 TB: training as kmeans_codebook (K-row state);
    assignment is a scan-stage argmax; the token join shuffles the word
    stream once on doc_id; tf is (cluster x vocab)-bounded and the
    rank window partitions by cluster."""
    from target_parquet_spark.lineage import mat
    from target_parquet_spark.operators import similarity as S2

    emb = mat(td(spark, sf_dir, "embeddings").select("vec_id", "embedding"))
    cb = S2.kmeans_codebook(emb, n_centroids=_TOPIC_K, n_iters=2, metric="cos")
    assign = emb.select(
        F.col("vec_id").alias("doc_id"),
        S2.ivf_cell(F.col("embedding"), cb).alias("cluster"),
    )
    tok = td(spark, sf_dir, "documents").select(
        "doc_id", F.explode(X.tokens(F.col("text"))).alias("term")
    )
    j = assign.join(tok, "doc_id").select("cluster", "term")
    # tf feeds THREE consumers (fw, the corpus total, and the score
    # join) — without a cut each replays the token explode + doc_id
    # join + (cluster, term) aggregate (r11 plan audit: 28 Exchange /
    # 3 token-join subtrees).  The table is (cluster x vocab)-bounded —
    # model-sized, squarely inside lineage.py's cut posture.
    tf = mat(
        j.groupBy("cluster", "term").agg(
            F.count(F.lit(1)).cast("long").alias("tf")
        )
    )
    fw = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("fw"))
    tot = tf.agg(F.sum("tf").cast("long").alias("s"))
    sc = (
        tf.join(fw, "term")
        .crossJoin(F.broadcast(tot))
        .select(
            "cluster",
            "term",
            F.round(
                F.col("tf")
                * F.log(
                    F.lit(1.0)
                    + (F.lit(1.0) * F.col("s") / _TOPIC_K) / F.col("fw")
                )
                * 1000000
            )
            .cast("long")
            .alias("sc_micro"),
        )
    )
    w = Window.partitionBy("cluster").orderBy(F.desc("sc_micro"), F.asc("term"))
    return (
        sc.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _TOPIC_TOP)
        .select(
            "cluster",
            "rank",
            "term",
            F.round(F.col("sc_micro") / 1000000.0, 4).alias("ctfidf"),
        )
    )


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary-growth audit
# ---------------------------------------------------------------------------

_HEAPS_BUCKETS = 10


@query(
    "text_heaps_law",
    f"""
    WITH d AS (
      SELECT doc_id, {SQL_TOKS.format(c='text')} AS t FROM documents),
    nn AS (SELECT CAST(max(doc_id) + 1 AS BIGINT) AS n FROM d),
    tk AS (
      SELECT doc_id, {X.SQL_HASH60.format(c='tok')} AS h
      FROM (SELECT doc_id, unnest(t) AS tok FROM d)),
    fo AS (SELECT h, CAST(min(doc_id) AS BIGINT) AS fd FROM tk GROUP BY h),
    tok_b AS (
      SELECT CAST(floor(t.doc_id * {_HEAPS_BUCKETS}.0 / n.n) AS BIGINT) AS b,
             CAST(count(*) AS BIGINT) AS c
      FROM tk t CROSS JOIN nn n GROUP BY b),
    voc_b AS (
      SELECT CAST(floor(f.fd * {_HEAPS_BUCKETS}.0 / n.n) AS BIGINT) AS b,
             CAST(count(*) AS BIGINT) AS v
      FROM fo f CROSS JOIN nn n GROUP BY b),
    spine AS (SELECT CAST(i AS BIGINT) AS b
              FROM range(0, {_HEAPS_BUCKETS}) r(i)),
    cum AS (
      SELECT s.b,
             CAST(sum(coalesce(tb.c, 0)) OVER (ORDER BY s.b) AS BIGINT)
               AS tokens_cum,
             CAST(sum(coalesce(vb.v, 0)) OVER (ORDER BY s.b) AS BIGINT)
               AS vocab_cum
      FROM spine s
      LEFT JOIN tok_b tb ON tb.b = s.b
      LEFT JOIN voc_b vb ON vb.b = s.b),
    lg AS (
      SELECT b, tokens_cum, vocab_cum,
             CAST(round(ln(tokens_cum) * 1000000) AS BIGINT) AS lx,
             CAST(round(ln(vocab_cum) * 1000000) AS BIGINT) AS ly
      FROM cum),
    fit AS (
      SELECT round((1.0 * count(*) * sum(lx * ly) - 1.0 * sum(lx) * sum(ly))
                   / (1.0 * count(*) * sum(lx * lx)
                      - 1.0 * sum(lx) * sum(lx)), 4) AS beta
      FROM lg)
    SELECT CAST(l.b + 1 AS BIGINT) AS decile, l.tokens_cum, l.vocab_cum,
           f.beta
    FROM lg l CROSS JOIN fit f
    """,
)
def text_heaps_law(spark, sf_dir):
    """Heaps'-law vocabulary-growth audit: cumulative distinct-token
    count V(N) at ten corpus prefixes (doc_id deciles) plus the fitted
    growth exponent beta from a log-log least-squares over the ten
    points (V ~ K * N^beta; natural text sits near beta ~ 0.5).  The
    curve tells a pipeline whether vocabulary is still growing (novel
    content keeps arriving) or saturating (the crawl is recycling) —
    the corpus-level complement to text_novelty_curve's per-batch view.

    Determinism: "first occurrence" is min(doc_id) per 60-bit token
    hash (exact); prefix totals are exact integer window sums over the
    ten-bucket spine; each log is micro-quantized before the power sums
    in the closed-form slope.

    Plan shape for 100 TB: one token-hash shuffle for first
    occurrences, one scan-stage bucket assignment; everything after
    runs on the TEN-row bucket table (metadata-sized windows and fit).
    The min(doc_id) aggregate partial-combines map-side, so the
    vocabulary table is touched once."""
    from pyspark.sql import Window as W

    d = td(spark, sf_dir, "documents").select(
        "doc_id", X.tokens(F.col("text")).alias("t")
    )
    nn = d.agg((F.max("doc_id") + 1).cast("long").alias("n"))
    tk = d.select("doc_id", F.explode("t").alias("tok")).select(
        "doc_id", X.hash60(F.col("tok")).alias("h")
    )
    fo = tk.groupBy("h").agg(F.min("doc_id").cast("long").alias("fd"))
    bucket = lambda c: F.floor(c * float(_HEAPS_BUCKETS) / F.col("n")).cast(
        "long"
    )
    tok_b = (
        tk.crossJoin(F.broadcast(nn))
        .groupBy(bucket(F.col("doc_id")).alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    voc_b = (
        fo.crossJoin(F.broadcast(nn))
        .groupBy(bucket(F.col("fd")).alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
    )
    spine = spark.range(_HEAPS_BUCKETS).select(F.col("id").cast("long").alias("b"))
    w_cum = W.orderBy(F.asc("b")).rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = (
        spine.join(tok_b, "b", "left")
        .join(voc_b, "b", "left")
        .select(
            "b",
            F.sum(F.coalesce(F.col("c"), F.lit(0)))
            .over(w_cum)
            .cast("long")
            .alias("tokens_cum"),
            F.sum(F.coalesce(F.col("v"), F.lit(0)))
            .over(w_cum)
            .cast("long")
            .alias("vocab_cum"),
        )
    )
    lg = cum.select(
        "b",
        "tokens_cum",
        "vocab_cum",
        F.round(F.log("tokens_cum") * 1000000).cast("long").alias("lx"),
        F.round(F.log("vocab_cum") * 1000000).cast("long").alias("ly"),
    )
    n_, lx, ly = F.count(F.lit(1)), F.col("lx"), F.col("ly")
    fit = lg.agg(
        F.round(
            (
                F.lit(1.0) * n_ * F.sum(lx * ly)
                - F.lit(1.0) * F.sum(lx) * F.sum(ly)
            )
            / (
                F.lit(1.0) * n_ * F.sum(lx * lx)
                - F.lit(1.0) * F.sum(lx) * F.sum(lx)
            ),
            4,
        ).alias("beta")
    )
    return lg.crossJoin(F.broadcast(fit)).select(
        (F.col("b") + 1).cast("long").alias("decile"),
        "tokens_cum",
        "vocab_cum",
        "beta",
    )


# ---------------------------------------------------------------------------
# nearest as-of join (pd.merge_asof direction='nearest')
# ---------------------------------------------------------------------------

_ASOF_TOL_S = 7200


@query(
    "asof_join_nearest",
    f"""
    WITH c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    b AS (SELECT c.event_id, c.user_id, c.ts, pb.ts AS bts
          FROM c ASOF LEFT JOIN p pb
            ON c.user_id = pb.user_id AND c.ts >= pb.ts),
    f AS (SELECT c.event_id, pf.ts AS fts
          FROM c ASOF LEFT JOIN p pf
            ON c.user_id = pf.user_id AND c.ts <= pf.ts),
    j AS (SELECT b.event_id, b.user_id,
                 CASE WHEN epoch(b.ts) - epoch(b.bts) <= {_ASOF_TOL_S}
                      THEN round(epoch(b.ts) - epoch(b.bts), 3) END AS gb,
                 CASE WHEN epoch(f.fts) - epoch(b.ts) <= {_ASOF_TOL_S}
                      THEN round(epoch(f.fts) - epoch(b.ts), 3) END AS gf
          FROM b JOIN f USING (event_id))
    SELECT event_id, user_id,
           CASE WHEN gb IS NOT NULL AND (gf IS NULL OR gb <= gf)
                THEN 'backward'
                WHEN gf IS NOT NULL THEN 'forward' END AS direction,
           CASE WHEN gb IS NOT NULL AND (gf IS NULL OR gb <= gf) THEN gb
                ELSE gf END AS secs_to_nearest
    FROM j
    """,
)
def asof_join_nearest(spark, sf_dir):
    """NEAREST as-of join (pd.merge_asof direction='nearest'): each
    click matched to the user's closest purchase in EITHER direction
    within a 2-hour tolerance — ties go backward (the earlier event),
    matching pandas.  Completes the as-of family
    (backward / forward / tolerance / nearest).

    Implementation: the backward and forward one-shuffle union+window
    passes of operators/asof.asof_join, combined by an event_id join
    that picks the smaller gap.  Two exchanges total (one per
    direction) — nearest fundamentally needs both timelines; at scale
    both passes share the same user_id hash partitioning, so AQE reuses
    the click-side exchange.  Oracle: two native DuckDB ASOF JOINs with
    the same tie/tolerance CASE logic."""
    from target_parquet_spark.operators.asof import asof_join
    from target_parquet_spark.queries import t

    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    b = asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
        direction="backward", tolerance_seconds=_ASOF_TOL_S,
    ).select(
        "event_id",
        "user_id",
        F.round(
            F.col("ts").cast("double") - F.col("ts_right").cast("double"), 3
        ).alias("gb"),
    )
    f = asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
        direction="forward", tolerance_seconds=_ASOF_TOL_S,
    ).select(
        "event_id",
        F.round(
            F.col("ts_right").cast("double") - F.col("ts").cast("double"), 3
        ).alias("gf"),
    )
    j = b.join(f, "event_id")
    back_wins = F.col("gb").isNotNull() & (
        F.col("gf").isNull() | (F.col("gb") <= F.col("gf"))
    )
    return j.select(
        "event_id",
        "user_id",
        F.when(back_wins, F.lit("backward"))
        .when(F.col("gf").isNotNull(), F.lit("forward"))
        .alias("direction"),
        F.when(back_wins, F.col("gb")).otherwise(F.col("gf")).alias(
            "secs_to_nearest"
        ),
    )


# ---------------------------------------------------------------------------
# Neyman (optimal) sampling allocation across strata
# ---------------------------------------------------------------------------

_NEYMAN_BUDGET = 1000


@query(
    "sample_neyman_allocation",
    f"""
    WITH s AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_chars) AS BIGINT) AS s1,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
      FROM documents GROUP BY source),
    w AS (
      SELECT source, n, s1, s2,
             CAST(round(n * sqrt(greatest(1.0 * s2 / n
                                 - (1.0 * s1 / n) * (1.0 * s1 / n), 0))
                        * 1000000) AS BIGINT) AS wm
      FROM s),
    tot AS (SELECT CAST(sum(wm) AS BIGINT) AS sw,
                   CAST(sum(n) AS BIGINT) AS nn
            FROM w)
    SELECT w.source,
           w.n AS n_docs,
           round(sqrt(greatest(1.0 * w.s2 / w.n
                      - (1.0 * w.s1 / w.n) * (1.0 * w.s1 / w.n), 0)), 2)
             AS sd_chars,
           CAST(round({_NEYMAN_BUDGET}.0 * w.n / t.nn) AS BIGINT)
             AS prop_alloc,
           CAST(round({_NEYMAN_BUDGET}.0 * w.wm / t.sw) AS BIGINT)
             AS neyman_alloc
    FROM w CROSS JOIN tot t
    """,
)
def sample_neyman_allocation(spark, sf_dir):
    """Neyman (optimal) allocation for stratified sampling (Neyman
    1934): distribute a fixed labeling/annotation budget across strata
    proportional to N_h * sigma_h instead of N_h alone — high-variance
    strata earn more samples per document, minimizing the estimator's
    variance at fixed cost.  Reported next to proportional allocation
    so the delta (what optimality buys) is visible per stratum; the
    audit a labeling-budget owner runs before sampling.

    Determinism: per-stratum moments are exact integer sums of n_chars;
    each stratum weight N_h*sigma_h is micro-quantized BEFORE the
    cross-strata total, so allocation shares are ratios of identical
    integers in both engines.

    Plan shape for 100 TB: one mergeable power-sum aggregate per
    stratum (map-side combined), a 1-row total broadcast back — the
    corpus is scanned once, nothing data-sized shuffles."""
    docs = td(spark, sf_dir, "documents").select("source", "n_chars")
    st = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("n_chars").cast("long").alias("s1"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("s2"),
    )
    one = F.lit(1.0)
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    # greatest(.., 0): float rounding can push a near-constant
    # stratum's variance a hair negative — sqrt would NaN (Spark) or
    # error (DuckDB); same guard as queries_r3's variance ops
    sd = F.sqrt(
        F.greatest(
            one * s2 / n - (one * s1 / n) * (one * s1 / n), F.lit(0.0)
        )
    )
    w = st.select(
        "source", "n", "s1", "s2",
        F.round(n * sd * 1000000).cast("long").alias("wm"),
    )
    tot = w.agg(
        F.sum("wm").cast("long").alias("sw"),
        F.sum("n").cast("long").alias("nn"),
    )
    return w.crossJoin(F.broadcast(tot)).select(
        "source",
        n.alias("n_docs"),
        F.round(sd, 2).alias("sd_chars"),
        F.round(F.lit(float(_NEYMAN_BUDGET)) * n / F.col("nn"))
        .cast("long")
        .alias("prop_alloc"),
        F.round(F.lit(float(_NEYMAN_BUDGET)) * F.col("wm") / F.col("sw"))
        .cast("long")
        .alias("neyman_alloc"),
    )
