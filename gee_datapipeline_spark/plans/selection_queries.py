"""Data-selection queries: model-based quality filtering, importance
resampling and hybrid retrieval fusion over the ``documents`` /
``embeddings`` tables.

The reference pipeline curates by hand (fixed date ranges, WHO
thresholds — ``DataDownloader_V3.py:40-52``); a 100 TB training-data
pipeline selects *statistically*: score every document against a model
of "good" text, weight it toward a target distribution, and fuse
multiple retrieval signals. Three public-method families:

- **n-gram LM perplexity filter** (CCNet; Wenzek et al., LREC 2020):
  train a bigram LM on the corpus, score each document by per-bigram
  cross-entropy, bucket into head/middle/tail. The LM tables are
  vocabulary-bounded — they BROADCAST, so the corpus is never shuffled
  on a join key: one tokenize pass + one per-doc aggregate.
- **DSIR hashed importance weights** (Xie et al., NeurIPS 2023): hash
  unigrams into B buckets, estimate target/raw bucket distributions,
  log importance weight = Σ_tokens ln(p_target/p_raw). The bucket
  table is B rows — broadcast; per-doc weight is one aggregate.
- **Reciprocal-rank fusion** (Cormack et al., SIGIR 2009): fuse the
  BM25 lexical top-k with the embedding-cosine top-k via
  rrf = Σ 1/(K + rank). Each side ends in a k-bounded
  TakeOrderedAndProject before ranks are assigned, so the windowed
  rank runs over ≤ FUSE_DEPTH rows — never the corpus.

Cross-engine exactness: all counts are integers; probabilities are a
single double division; logs are libm-identical (the BM25/PageRank
precedent); per-doc sums ride DECIMAL(38,12) accumulators so they are
partitioning-independent; final rounding is the deterministic
floor-based half-up (sign-extended here, since log-ratios go negative).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, spread_scan
from ..functions import text as X
from ..functions.similarity import (
    cosine,
    sq_norm,
    sql_cosine,
    sql_decimal_dot,
)
from ..functions.sketches import sql_base_hash, _base_hash
from ..functions.stable import DECIMAL_FINE
from .registry import Query, register

# --------------------------------------------------- shared constants

# Add-alpha smoothing for both LM and DSIR bucket estimates. repr()'d
# into the oracle so both engines start from the identical IEEE double.
ALPHA = 0.1

# Perplexity bucket cut points (nats/bigram). CCNet derives these from
# reference-corpus percentiles; fixed constants keep the operator free
# of any global sort. Chosen so all three buckets are populated on the
# synthetic corpus (observed nll range ~3.2-3.6 nats).
NLL_HEAD = 3.38
NLL_TAIL = 3.45

# DSIR feature space: hashed unigram buckets.
DSIR_BUCKETS = 1024

# RRF fusion: candidate depth per retriever and the standard K=60.
FUSE_DEPTH = 100
RRF_K = 60
RRF_TOP = 10
RRF_PROBE_ID = 0  # embeddings row serving as the query vector


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _signed_round(c: Column, scale: int = 6) -> Column:
    """Half-up-on-magnitude rounding for possibly-negative doubles:
    sign(x)·floor(|x|·10^s + 0.5)/10^s. Every step is a deterministic
    IEEE op, mirrored verbatim in the oracle (``_sql_signed_round``) —
    the signed extension of ``functions.stable.stable_round``."""
    f = float(10**scale)
    return F.signum(c) * (F.floor(F.abs(c) * f + F.lit(0.5)) / f)


def _sql_signed_round(expr: str, scale: int = 6) -> str:
    f = 10**scale
    return (
        f"sign({expr}) * (floor(abs({expr}) * {f}.0 + 0.5) / {f}.0)"
    )


# ------------------------------------------- bigram-LM perplexity filter


def _lm_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram cross-entropy under a corpus-trained LM, with
    head/middle/tail quality buckets (CCNet shape, self-trained LM).

    p(w2|w1) = (c(w1,w2) + α) / (c(w1·) + α·V) — add-α smoothing over
    the conditioning context's outgoing-bigram count, V = vocabulary
    size, so the conditional sums to 1. nll = -Σ ln p / n_bigrams.

    Plan shape: ONE tokenize pass feeds both the LM aggregates and the
    per-doc scoring rows. The LM tables (bigram counts, left-context
    counts) are vocabulary-bounded — broadcast — so the only
    corpus-sized shuffles are the two LM hash-aggregates (map-side
    combinable) and the per-doc nll aggregate. No sort anywhere; the
    buckets are fixed thresholds, not percentile cuts.
    """
    # Unsplittable-input spread (guide §2.5), kept on the sf1.0
    # evidence (r11, VERDICT r10 item 6): reverted at sf0.1 in r10
    # (1.09→1.24 s), but at sf1.0 the bigram build dominates and the
    # revert flips — measured 8.94 s (plain) → 3.55 s (spread)
    # min-of-3 interleaved, the largest sf1.0 flip of the five
    # re-tested reverts.
    docs = spread_scan(_docs(spark, sf_dir), spark, "doc_id")
    toks = docs.select("doc_id", X.tokens(F.col("text")).alias("t"))
    # Empty-string guard: sequence(1, 0) is DESCENDING in Spark
    # (the bpe.chars() lesson), so gate on size >= 2.
    bigr = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> concat(t[i-1], ' ', t[i]))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bg"),
    ).select(
        "doc_id",
        F.substring_index("bg", " ", 1).alias("w1"),
        F.substring_index("bg", " ", -1).alias("w2"),
    )
    bg_counts = bigr.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")
    )
    # Left-context counts are the bigram counts marginalized over w2 —
    # identical values (c1 = Σ_w2 c12 by definition), computed from the
    # vocabulary-bounded bg_counts table instead of a second
    # corpus-sized tokenize+explode pass (guide §2.4; the r9 plan
    # scanned documents 4x: bg_counts, ug_counts, vocab, scoring probe).
    ug_counts = bg_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = toks.select(F.explode("t").alias("w")).agg(
        F.count_distinct("w").alias("v")
    )
    logp = (
        bigr.join(F.broadcast(bg_counts), ["w1", "w2"], "left")
        .join(F.broadcast(ug_counts), "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            (
                -F.log(
                    (F.coalesce("c12", F.lit(0)) + F.lit(ALPHA))
                    / (
                        F.coalesce("c1", F.lit(0))
                        + F.lit(ALPHA) * F.col("v")
                    )
                )
            )
            .cast(DECIMAL_FINE)
            .alias("nl"),
        )
    )
    scored = logp.groupBy("doc_id").agg(
        _signed_round(
            F.sum("nl").cast("double") / F.count(F.lit(1)), 6
        ).alias("nll")
    )
    return scored.select(
        "doc_id",
        "nll",
        F.when(F.col("nll") < NLL_HEAD, F.lit("head"))
        .when(F.col("nll") < NLL_TAIL, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


register(
    Query(
        name="lm_perplexity_buckets",
        spark=_lm_perplexity_buckets,
        oracle=rf"""
            WITH toks AS (
                SELECT doc_id, string_split_regex(
                    lower(trim(text)), '\s+') AS t
                FROM documents
            ),
            bigr AS (
                SELECT doc_id,
                       split_part(bg, ' ', 1) AS w1,
                       split_part(bg, ' ', 2) AS w2
                FROM (
                    SELECT doc_id, unnest(list_transform(
                        generate_series(1, len(t) - 1),
                        i -> t[i] || ' ' || t[i+1])) AS bg
                    FROM toks WHERE len(t) >= 2
                )
            ),
            bg_counts AS (
                SELECT w1, w2, count(*) AS c12 FROM bigr GROUP BY 1, 2
            ),
            ug_counts AS (
                SELECT w1, count(*) AS c1 FROM bigr GROUP BY 1
            ),
            vocab AS (
                SELECT count(DISTINCT w) AS v FROM (
                    SELECT unnest(t) AS w FROM toks
                )
            ),
            logp AS (
                SELECT b.doc_id,
                       CAST(-ln((coalesce(g.c12, 0) + {ALPHA!r})
                                / (coalesce(u.c1, 0) + {ALPHA!r} * v.v))
                            AS DECIMAL(38, 12)) AS nl
                FROM bigr b
                LEFT JOIN bg_counts g ON b.w1 = g.w1 AND b.w2 = g.w2
                LEFT JOIN ug_counts u ON b.w1 = u.w1
                CROSS JOIN vocab v
            ),
            scored AS (
                SELECT doc_id,
                       {_sql_signed_round(
                           'CAST(sum(nl) AS DOUBLE) / count(*)', 6)} AS nll
                FROM logp GROUP BY 1
            )
            SELECT doc_id, nll,
                   CASE WHEN nll < {NLL_HEAD!r} THEN 'head'
                        WHEN nll < {NLL_TAIL!r} THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM scored
        """,
        tags=("text", "selection", "quality"),
        doc="CCNet-style bigram-LM perplexity buckets "
        "(Wenzek et al. 2020); broadcast LM tables, no global sort",
    )
)


# ------------------------------------------- DSIR importance weights


def _dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-n-gram importance weights for target-distribution
    resampling (DSIR; Xie et al., NeurIPS 2023).

    Features are unigrams hashed into ``DSIR_BUCKETS`` buckets with the
    repo's cross-engine md5 base hash. The target slice is the
    ``lang = 'en'`` sub-corpus; raw is the full corpus. Bucket
    log-ratios lr[f] = ln p_target(f) − ln p_raw(f) (add-α smoothed)
    form a B-row table that BROADCASTS; a document's log importance
    weight is Σ_tokens lr[bucket(token)] — one per-doc aggregate over
    the tokenize pass, decimal-accumulated, sign-aware rounding.

    Plan shape at 100 TB: tokenize (narrow) → two B-bounded
    hash-aggregates (map-side combinable; the shuffle carries ≤ B rows
    per input partition) → broadcast join → per-doc aggregate. The
    corpus is never joined on a data-dependent key.
    """
    # Unsplittable-input spread (guide §2.5): tokenize + md5 bucketing
    # otherwise run on ONE task, in both lazy consumers.
    docs = spread_scan(_docs(spark, sf_dir), spark, "doc_id")
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(X.tokens(F.col("text"))).alias("term"),
    ).select(
        "doc_id",
        "lang",
        (_base_hash(F.col("term")) % F.lit(DSIR_BUCKETS)).alias("f"),
    )
    # ONE conditional aggregate replaces the r5 raw/tgt/totals trio
    # (guide §2.4: two aggregations keyed the same way share one pass;
    # the r9 plan tokenized+md5-hashed the corpus FOUR times — raw,
    # tgt, totals, final join — because each consumer re-evaluated the
    # lazy `tok` subtree). c_tgt via sum(CASE) == the old left-joined
    # count (0 instead of NULL for bucket with no target tokens — the
    # coalesce below sees the same value either way), and the corpus
    # totals are exact column sums of the B-row bucket table, so no
    # third corpus pass. Plan: 4 scans → 2 (bucket stats + final probe).
    bucket = tok.groupBy("f").agg(
        F.count(F.lit(1)).alias("c_raw"),
        F.sum(
            F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0))
        ).alias("c_tgt"),
    )
    totals = bucket.agg(
        F.sum("c_raw").alias("n_raw"), F.sum("c_tgt").alias("n_tgt")
    )
    ratios = (
        bucket.crossJoin(F.broadcast(totals))
        .select(
            "f",
            (
                F.log(
                    (F.coalesce("c_tgt", F.lit(0)) + F.lit(ALPHA))
                    / (F.col("n_tgt") + F.lit(ALPHA) * F.lit(DSIR_BUCKETS))
                )
                - F.log(
                    (F.col("c_raw") + F.lit(ALPHA))
                    / (F.col("n_raw") + F.lit(ALPHA) * F.lit(DSIR_BUCKETS))
                )
            ).alias("lr"),
        )
    )
    return (
        tok.join(F.broadcast(ratios), "f")
        .groupBy("doc_id")
        .agg(
            _signed_round(
                F.sum(F.col("lr").cast(DECIMAL_FINE)).cast("double"), 6
            ).alias("log_weight")
        )
    )


register(
    Query(
        name="dsir_importance_weights",
        spark=_dsir_importance_weights,
        oracle=rf"""
            WITH tok AS (
                SELECT doc_id, lang,
                       CAST({sql_base_hash('term')} AS BIGINT)
                           % {DSIR_BUCKETS} AS f
                FROM (
                    SELECT doc_id, lang, unnest(string_split_regex(
                        lower(trim(text)), '\s+')) AS term
                    FROM documents
                )
            ),
            raw AS (SELECT f, count(*) AS c_raw FROM tok GROUP BY 1),
            tgt AS (
                SELECT f, count(*) AS c_tgt FROM tok
                WHERE lang = 'en' GROUP BY 1
            ),
            totals AS (
                SELECT count(*) AS n_raw,
                       sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_tgt
                FROM tok
            ),
            ratios AS (
                SELECT raw.f,
                       ln((coalesce(tgt.c_tgt, 0) + {ALPHA!r})
                          / (totals.n_tgt + {ALPHA!r} * {DSIR_BUCKETS}))
                       - ln((raw.c_raw + {ALPHA!r})
                            / (totals.n_raw + {ALPHA!r} * {DSIR_BUCKETS}))
                           AS lr
                FROM raw
                LEFT JOIN tgt ON raw.f = tgt.f
                CROSS JOIN totals
            )
            SELECT tok.doc_id,
                   {_sql_signed_round(
                       'CAST(sum(CAST(lr AS DECIMAL(38,12))) AS DOUBLE)',
                       6)} AS log_weight
            FROM tok JOIN ratios ON tok.f = ratios.f
            GROUP BY 1
        """,
        tags=("text", "selection", "sampling"),
        doc="DSIR hashed importance weights (Xie et al. 2023); "
        "B-bounded broadcast ratio table",
    )
)


# ------------------------------------------- reciprocal-rank fusion


def _hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: RRF fusion of the BM25 lexical top-FUSE_DEPTH
    and the embedding-cosine top-FUSE_DEPTH (probe = vec_id 0), joined
    on the shared doc_id/vec_id key space.

    rrf(d) = Σ_lists 1/(K + rank_d) with K = 60 (Cormack et al. 2009).
    Ranks are integers and K is an integer, so every rrf term is the
    identical IEEE double in both engines; the two-term sum is a fixed
    evaluation order (lex + vec), not an aggregate — no accumulator
    needed.

    Plan shape: each retriever ends in orderBy+limit — a k-bounded
    TakeOrderedAndProject — BEFORE rank assignment, so the rank windows
    run over ≤ FUSE_DEPTH rows. The fusion join is tiny×tiny. At
    100 TB the corpus cost is exactly one BM25 pass and one cosine
    scan (or their indexed equivalents: postings / ANN buckets).
    """
    from .search_queries import _bm25_topk_scored

    lex = _bm25_topk_scored(spark, sf_dir, limit=FUSE_DEPTH)
    lex_ranked = lex.select(
        "doc_id",
        F.row_number()
        .over(
            Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        )
        .alias("lex_rank"),
    )

    emb = load_table(spark, sf_dir, "embeddings")
    with_norm = emb.withColumn("norm", F.sqrt(sq_norm(F.col("embedding"))))
    probe = with_norm.filter(F.col("vec_id") == RRF_PROBE_ID).select(
        F.col("embedding").alias("q_emb"), F.col("norm").alias("q_norm")
    )
    vec = (
        with_norm.filter(F.col("vec_id") != RRF_PROBE_ID)
        .crossJoin(F.broadcast(probe))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(
                cosine(
                    F.col("q_emb"),
                    F.col("embedding"),
                    F.col("q_norm"),
                    F.col("norm"),
                ),
                6,
            ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("doc_id").asc())
        .limit(FUSE_DEPTH)
    )
    vec_ranked = vec.select(
        "doc_id",
        F.row_number()
        .over(
            Window.orderBy(F.col("cos_sim").desc(), F.col("doc_id").asc())
        )
        .alias("vec_rank"),
    )

    fused = lex_ranked.join(vec_ranked, "doc_id", "full").select(
        "doc_id",
        F.coalesce("lex_rank", F.lit(0)).alias("lex_rank"),
        F.coalesce("vec_rank", F.lit(0)).alias("vec_rank"),
        (
            F.when(
                F.col("lex_rank").isNotNull(),
                F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")),
            ).otherwise(F.lit(0.0))
            + F.when(
                F.col("vec_rank").isNotNull(),
                F.lit(1.0) / (F.lit(RRF_K) + F.col("vec_rank")),
            ).otherwise(F.lit(0.0))
        ).alias("rrf"),
    )
    out = fused.select(
        "doc_id",
        "lex_rank",
        "vec_rank",
        _signed_round(F.col("rrf"), 6).alias("rrf_score"),
    )
    return out.orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    ).limit(RRF_TOP)


def _rrf_oracle() -> str:
    from .search_queries import sql_bm25_scored

    return rf"""
            WITH lex0 AS (
                {sql_bm25_scored(limit=FUSE_DEPTH)}
            ),
            lex AS (
                SELECT doc_id, row_number() OVER (
                    ORDER BY bm25 DESC, doc_id ASC) AS lex_rank
                FROM lex0
            ),
            normed AS (
                SELECT vec_id, embedding,
                       sqrt({sql_decimal_dot('embedding', 'embedding')})
                           AS norm
                FROM embeddings
            ),
            vec0 AS (
                SELECT c.vec_id AS doc_id,
                       round({sql_cosine('q.embedding', 'c.embedding',
                                         'q.norm', 'c.norm')}, 6)
                           AS cos_sim
                FROM normed c, normed q
                WHERE q.vec_id = {RRF_PROBE_ID}
                  AND c.vec_id != {RRF_PROBE_ID}
                ORDER BY cos_sim DESC, doc_id ASC
                LIMIT {FUSE_DEPTH}
            ),
            vec AS (
                SELECT doc_id, row_number() OVER (
                    ORDER BY cos_sim DESC, doc_id ASC) AS vec_rank
                FROM vec0
            ),
            fused AS (
                SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
                       coalesce(lex_rank, 0) AS lex_rank,
                       coalesce(vec_rank, 0) AS vec_rank,
                       (CASE WHEN lex_rank IS NOT NULL
                             THEN 1.0 / ({RRF_K} + lex_rank)
                             ELSE 0.0 END
                        + CASE WHEN vec_rank IS NOT NULL
                               THEN 1.0 / ({RRF_K} + vec_rank)
                               ELSE 0.0 END) AS rrf
                FROM lex FULL JOIN vec ON lex.doc_id = vec.doc_id
            )
            SELECT doc_id, lex_rank, vec_rank,
                   {_sql_signed_round('rrf', 6)} AS rrf_score
            FROM fused
            ORDER BY rrf_score DESC, doc_id ASC
            LIMIT {RRF_TOP}
        """


register(
    Query(
        name="hybrid_rrf_topk",
        spark=_hybrid_rrf_topk,
        oracle=_rrf_oracle(),
        tags=("search", "similarity", "selection"),
        doc="RRF fusion of BM25 and embedding-cosine top-k "
        "(Cormack et al. 2009); rank windows are k-bounded",
    )
)


# -------------------------- weighted sampling without replacement


_WSAMPLE_K = 200
_WSAMPLE_DENOM = (1 << 60) + 1  # u = (h+1)/DENOM ∈ (0,1], never 0


def _weighted_sample_wor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis–
    Spirakis A-ES exponential race (Inf. Proc. Letters 2006): each doc
    draws a deterministic uniform u from its md5, and the k docs with
    the largest pow(u, 1/w) — equivalently largest ln(u)/w — are the
    sample. Inclusion probability is proportional to weight (here
    ``n_chars``: length-biased selection, the curriculum/mixture
    building block), and the whole draw is ONE corpus scan ending in a
    k-bounded TakeOrderedAndProject — no shuffle of the corpus, no
    per-group state, and trivially mergeable across partitions (the
    property that makes A-ES the distributed-sampling standard).

    Cross-engine: u is a 60-bit md5 integer (exact in both engines);
    ln is libm-identical (the BM25/PageRank precedent); boundary
    collisions would need two keys within ~1 ulp, vanishing at corpus
    order-statistic gaps."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(_WSAMPLE_DENOM))
    key = F.log(u) / F.col("n_chars").cast("double")
    return (
        docs.select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("weight"),
            key.alias("_key"),
        )
        .orderBy(F.col("_key").desc())
        .limit(_WSAMPLE_K)
        .drop("_key")
    )


_SQL_DOC_H = " + ".join(
    f"(strpos('0123456789abcdef', "
    f"substr(md5(CAST(doc_id AS VARCHAR)), {i + 1}, 1)) - 1)"
    f" * {16 ** (14 - i)}"
    for i in range(15)
)


register(
    Query(
        name="weighted_sample_wor",
        spark=_weighted_sample_wor,
        oracle=f"""
            SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight
            FROM documents
            ORDER BY ln(CAST(({_SQL_DOC_H}) + 1 AS DOUBLE)
                        / {float(_WSAMPLE_DENOM)!r})
                     / CAST(n_chars AS DOUBLE) DESC
            LIMIT {_WSAMPLE_K}
        """,
        tags=("sampling", "weighted", "llm-pipeline"),
        doc="Efraimidis–Spirakis A-ES weighted reservoir draw: one "
        "corpus scan, k-bounded TakeOrderedAndProject, md5 uniforms",
    )
)


# ------------------------------- hashed linear quality classifier


# fastText-style hashed linear classifier inference (Joulin et al.,
# EACL 2017) — the mechanism behind DCLM/FineWeb-Edu-style model-based
# quality filtering (Li et al. 2024): features are unigrams + word
# bigrams hashed into CLF_BUCKETS buckets; the trained model is a
# B-row (bucket -> weight) artifact that BROADCASTS; a document's
# logit is bias + mean(bucket weights); keep = sigmoid(z) >= 0.5.
# Weights here come from a seeded generator standing in for the
# trained artifact (integer millis, so the broadcast table is
# cross-engine exact); the *engine mechanism* under gate is the
# feature hashing, artifact join, and per-doc scoring pipeline.
CLF_BUCKETS = 512
CLF_SEED = 41
CLF_BIAS = -0.15


def clf_weights_int() -> list[int]:
    """Model-artifact stand-in: CLF_BUCKETS integer milli-weights in
    [-1000, 1000] from a seeded generator (same role as
    ``similarity.plane_matrix_int`` — both engines consume the SAME
    integers, Spark as a broadcast relation, DuckDB as VALUES rows)."""
    import numpy as np

    rng = np.random.default_rng(CLF_SEED)
    return [int(v) for v in rng.integers(-1000, 1001, size=CLF_BUCKETS)]


def _quality_classifier_score(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-document quality score from a hashed linear classifier.

    Plan shape at 100 TB: tokenize (narrow) → unigram+bigram feature
    explode (narrow) → md5 bucket (narrow) → broadcast join against
    the B-row weight artifact → ONE per-doc hash-aggregate. The corpus
    is never shuffled on a data-dependent key; the model artifact is
    bytes-small regardless of corpus size, exactly how a trained
    fastText/DCLM filter deploys on a cluster.

    Cross-engine exactness: bucket weights are integers, the per-doc
    sum rides an exact integer accumulator, and the logit/sigmoid is
    a fixed sequence of IEEE double ops (libm exp — the BM25/PageRank
    precedent) mirrored verbatim in the oracle; ``keep`` compares the
    unrounded double so rounding can never flip it.
    """
    # Unsplittable-input spread (guide §2.5): tokenize + uni/bigram
    # explode + md5 bucketing — the whole per-row cost — otherwise run
    # on ONE task; doc_id keying aligns with the per-doc aggregate.
    docs = spread_scan(_docs(spark, sf_dir), spark, "doc_id")
    toks = docs.select(
        "doc_id", X.tokens(F.col("text")).alias("t")
    ).withColumn("n", F.size("t"))
    feats = toks.select(
        "doc_id",
        F.explode(
            F.concat(
                F.col("t"),
                F.when(
                    F.col("n") >= 2,
                    F.expr(
                        "transform(sequence(2, n),"
                        " i -> concat(t[i-2], '_', t[i-1]))"
                    ),
                ).otherwise(F.expr("cast(array() as array<string>)")),
            )
        ).alias("feat"),
    ).select(
        "doc_id",
        (_base_hash(F.col("feat")) % F.lit(CLF_BUCKETS)).alias("f"),
    )
    weights = spark.createDataFrame(
        list(enumerate(clf_weights_int())), "f long, w_int long"
    )
    scored = (
        feats.join(F.broadcast(weights), "f")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("w_int").alias("s"),
        )
    )
    z = F.lit(CLF_BIAS) + (
        F.col("s").cast("double")
        / (F.lit(1000.0) * F.col("n_feats").cast("double"))
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return scored.select(
        "doc_id",
        "n_feats",
        _signed_round(score, 6).alias("score"),
        (score >= F.lit(0.5)).alias("keep"),
    )


def _clf_weight_values() -> str:
    return ",\n                ".join(
        f"({f}, {w})" for f, w in enumerate(clf_weights_int())
    )


register(
    Query(
        name="quality_classifier_score",
        spark=_quality_classifier_score,
        oracle=rf"""
            WITH weights(f, w_int) AS (VALUES
                {_clf_weight_values()}
            ),
            toks AS (
                SELECT doc_id,
                       string_split_regex(lower(trim(text)), '\s+') AS t
                FROM documents
            ),
            feats AS (
                SELECT doc_id, unnest(t) AS feat FROM toks
                UNION ALL
                SELECT doc_id, concat(t[s - 1], '_', t[s]) AS feat
                FROM (
                    SELECT doc_id, t,
                           unnest(generate_series(2, len(t))) AS s
                    FROM toks
                )
            ),
            bucketed AS (
                SELECT doc_id,
                       CAST({sql_base_hash('feat')} AS BIGINT)
                           % {CLF_BUCKETS} AS f
                FROM feats
            ),
            scored AS (
                SELECT doc_id, count(*) AS n_feats,
                       sum(w_int) AS s
                FROM bucketed JOIN weights USING (f)
                GROUP BY 1
            )
            SELECT doc_id, n_feats,
                   {_sql_signed_round(
                       '1.0 / (1.0 + exp(-(' + repr(CLF_BIAS)
                       + ' + (CAST(s AS DOUBLE)'
                       + ' / (1000.0 * CAST(n_feats AS DOUBLE))))))',
                       6)} AS score,
                   (1.0 / (1.0 + exp(-({CLF_BIAS!r}
                        + (CAST(s AS DOUBLE)
                           / (1000.0 * CAST(n_feats AS DOUBLE))))))
                    >= 0.5) AS keep
            FROM scored
        """,
        tags=("text", "selection", "llm-pipeline"),
        doc="fastText/DCLM-style hashed linear quality filter: "
        "unigram+bigram feature hashing, broadcast B-row model "
        "artifact, one per-doc aggregate",
    )
)
