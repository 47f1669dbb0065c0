r"""Training-batch assembly queries: sequence packing, mixture sampling,
quality-weighted sampling, and deterministic global shuffle-sharding.

These are the operations that sit between a curated corpus and a
training job. All randomness derives from the Knuth multiplicative hash
(``operators.sampling``) so every engine computes the identical batch —
reproducibility is non-negotiable for training-data lineage.

Scale notes per operator are on the docstrings; the common theme: each
one is a single narrow map stage or one hash-shuffle, never a global
sort or driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import text as X
from ..functions.stable import stable_round
from ..operators.sampling import KNUTH, MOD, sample_hash
from .registry import Query, register

SQL_TOKENS = r"len(string_split_regex(lower(trim(text)), '\s+'))"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# ------------------------------------------- concat-and-split packing

CONTEXT_TOKENS = 512  # training context window, in whitespace tokens


def _sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split sequence packing (the GPT-style pretraining
    batch layout): documents are concatenated in deterministic order
    inside each source stream and the stream is cut into
    ``CONTEXT_TOKENS``-sized packs; a document belongs to the pack its
    first token lands in. One running-sum window partitioned by
    ``source``.

    Scale: the window partitions by source, so parallelism = number of
    source streams. At 100 TB you sub-shard the stream key (e.g.
    (source, date_bucket)) to any width you like — the semantics are
    per-stream, so the key choice is a layout decision, not a
    correctness one. Only (id, n_tokens) ride the shuffle; text stays
    columnar-pruned away."""
    docs = _docs(spark, sf_dir)
    n_tok = X.token_count(F.col("text"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        # (r10 measured: a pre-window spread ran 0.24 → 0.41 s
        # interleaved — the tokenize here is too light to pay for an
        # extra exchange — reverted.)
        docs.select("doc_id", "source", n_tok.alias("n_tokens"))
        .withColumn(
            "start_offset",
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long"),
        )
        .withColumn(
            "pack_id",
            F.floor(F.col("start_offset") / F.lit(CONTEXT_TOKENS)).cast(
                "long"
            ),
        )
    )


register(
    Query(
        name="sequence_packing",
        spark=_sequence_packing,
        oracle=f"""
            SELECT doc_id, source,
                   {SQL_TOKENS} AS n_tokens,
                   CAST(sum({SQL_TOKENS}) OVER (
                            PARTITION BY source ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                        ) - {SQL_TOKENS} AS BIGINT) AS start_offset,
                   CAST(floor((sum({SQL_TOKENS}) OVER (
                            PARTITION BY source ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                        ) - {SQL_TOKENS}) / {CONTEXT_TOKENS}.0) AS BIGINT)
                       AS pack_id
            FROM documents
        """,
        tags=("packing", "window", "llm-pipeline"),
    )
)


# --------------------------------- mixture sampling with upsampling

# Target sampling weight per source stream; >1 means deterministic
# upsampling (a doc appears floor(w) or ceil(w) times), <1 is
# subsampling. Unlisted sources keep weight 1.0.
MIXTURE_WEIGHTS: dict[str, float] = {
    "src0": 0.25,
    "src1": 2.5,
    "src2": 0.5,
    "src3": 0.0,
}


def _mixture_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture sampling: re-weight source streams to a
    target mixture, with fractional weights resolved per-document by
    the Knuth hash — weight 2.5 yields 2 copies plus a third for the
    hashed half of documents, weight 0.25 keeps the hashed quarter.
    Output is (doc, copy index), ready to union into an epoch.

    Scale: a narrow filter + bounded explode, no shuffle at all; the
    weight table is a literal CASE (broadcast-join a real config table
    in production). Copies carry distinct ``copy_idx`` so a downstream
    global shuffle spreads them across batches."""
    docs = _docs(spark, sf_dir)
    w_col = F.lit(1.0)
    for src, wt in MIXTURE_WEIGHTS.items():
        w_col = F.when(F.col("source") == src, F.lit(wt)).otherwise(w_col)
    unit = sample_hash("doc_id").cast("double") / F.lit(float(MOD))
    n_copies = (
        F.floor("weight")
        + F.when(unit < F.col("weight") - F.floor("weight"), 1).otherwise(0)
    ).cast("int")
    return (
        docs.select("doc_id", "source", "lang")
        .withColumn("weight", w_col)
        .withColumn("n_copies", n_copies)
        .filter(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "source",
            "lang",
            F.explode(F.sequence(F.lit(0), F.col("n_copies") - 1)).alias(
                "copy_idx"
            ),
        )
    )


_SQL_WEIGHT = "CASE " + " ".join(
    f"WHEN source = '{s}' THEN {w}" for s, w in MIXTURE_WEIGHTS.items()
) + " ELSE 1.0 END"

register(
    Query(
        name="mixture_sampling",
        spark=_mixture_sampling,
        oracle=f"""
            WITH weighted AS (
                SELECT doc_id, source, lang,
                       {_SQL_WEIGHT} AS weight,
                       ((doc_id * {KNUTH}) % {MOD}) / {MOD}.0 AS unit
                FROM documents
            ),
            counted AS (
                SELECT doc_id, source, lang,
                       CAST(floor(weight)
                            + CASE WHEN unit < weight - floor(weight)
                                   THEN 1 ELSE 0 END AS INTEGER) AS n_copies
                FROM weighted
            )
            SELECT doc_id, source, lang, CAST(u AS INTEGER) AS copy_idx
            FROM counted, unnest(range(n_copies)) AS t(u)
            WHERE n_copies > 0
        """,
        tags=("sampling", "mixture", "llm-pipeline"),
    )
)


# ------------------------------------- quality-weighted subsampling


def _quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep each document with probability proportional to a quality
    score (here: token count saturating at 256 — longer docs are
    likelier kept), resolved deterministically by the id hash. The
    standard soft alternative to a hard quality cutoff, and the same
    shape as classifier-score filtering (swap the score expression for
    a model output column).

    Scale: pure narrow filter; the score and the hash are both
    engine-deterministic, so the sample is reproducible and the gate
    checks it value-for-value."""
    docs = _docs(spark, sf_dir)
    n_tok = X.token_count(F.col("text"))
    score = F.least(F.lit(1.0), n_tok.cast("double") / 256.0)
    # floor(score * MOD) is exact: score is a ratio of exact doubles.
    thresh = F.floor(score * F.lit(float(MOD))).cast("long")
    return (
        docs.select(
            "doc_id",
            "source",
            n_tok.alias("n_tokens"),
            stable_round(score, 6).alias("keep_prob"),
        )
        .filter(sample_hash("doc_id") < thresh)
    )


register(
    Query(
        name="quality_weighted_sample",
        spark=_quality_weighted_sample,
        oracle=f"""
            WITH scored AS (
                SELECT doc_id, source,
                       CAST({SQL_TOKENS} AS BIGINT) AS n_tokens,
                       least(1.0, {SQL_TOKENS} / 256.0) AS score
                FROM documents
            )
            SELECT doc_id, source, n_tokens,
                   floor(score * 1000000.0 + 0.5) / 1000000.0 AS keep_prob
            FROM scored
            WHERE (doc_id * {KNUTH}) % {MOD}
                      < CAST(floor(score * {MOD}.0) AS BIGINT)
        """,
        tags=("sampling", "quality", "llm-pipeline"),
    )
)


# ----------------------------- deterministic global shuffle-sharding

N_SHARDS = 64


def _shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle: every document gets a pseudo-random
    shard (hash mod N) and a position within its shard (rank by hash
    with id tie-break) — the layout a training job reads, with
    inter-document order decorrelated from ingest order.

    Scale: one hash-shuffle on the shard key; the per-shard rank window
    sees |corpus|/N rows per partition, and N is chosen so a shard fits
    an output file (~1-4 GB at 100 TB ⇒ N in the tens of thousands —
    the same plan, just a bigger N)."""
    docs = _docs(spark, sf_dir)
    h = sample_hash("doc_id")
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        docs.select(
            "doc_id",
            "source",
            (h % F.lit(N_SHARDS)).cast("int").alias("shard"),
            h.alias("h"),
        )
        .withColumn("shard_pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "source", "shard", "shard_pos")
    )


register(
    Query(
        name="shard_assignment",
        spark=_shard_assignment,
        oracle=f"""
            WITH hashed AS (
                SELECT doc_id, source,
                       CAST(((doc_id * {KNUTH}) % {MOD}) % {N_SHARDS}
                            AS INTEGER) AS shard,
                       (doc_id * {KNUTH}) % {MOD} AS h
                FROM documents
            )
            SELECT doc_id, source, shard,
                   CAST(row_number() OVER (
                            PARTITION BY shard ORDER BY h, doc_id
                        ) AS BIGINT) AS shard_pos
            FROM hashed
        """,
        tags=("sampling", "shuffle", "llm-pipeline"),
    )
)


# ------------------------------ cross-source score calibration


def _score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-rank calibration of a quality score within each source
    stream: raw scores from different sources aren't comparable (one
    crawler's 0.6 is another's 0.9), so curation thresholds are applied
    to the per-source percentile instead. One window per source
    partition; ties broken by doc_id so both engines rank identically.

    Scale: percent_rank needs its partition sorted — partitions are
    per-source, the same width as the packing window; the score is a
    Catalyst expression, so the sort key never leaves the JVM."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    n_tok = X.token_count(F.col("text"))
    raw = F.least(F.lit(1.0), n_tok.cast("double") / 256.0)
    w = Window.partitionBy("source").orderBy(
        F.col("raw_score").asc(), F.col("doc_id").asc()
    )
    return (
        docs.select(
            "doc_id", "source", stable_round(raw, 6).alias("raw_score")
        )
        .withColumn(
            "calibrated", stable_round(F.percent_rank().over(w), 6)
        )
    )


register(
    Query(
        name="score_calibration",
        spark=_score_calibration,
        oracle=f"""
            WITH scored AS (
                SELECT doc_id, source,
                       floor(least(1.0, {SQL_TOKENS} / 256.0)
                             * 1000000.0 + 0.5) / 1000000.0 AS raw_score
                FROM documents
            )
            SELECT doc_id, source, raw_score,
                   floor(percent_rank() OVER (
                       PARTITION BY source
                       ORDER BY raw_score ASC, doc_id ASC
                   ) * 1000000.0 + 0.5) / 1000000.0 AS calibrated
            FROM scored
        """,
        tags=("sampling", "calibration", "llm-pipeline"),
    )
)


# --------------------------- token-budget head (histogram cutoff)

# Sized to BIND at the sf0.01 gate (corpus ~27k tokens): the cutoff +
# boundary-rationing path is what the differential test must exercise;
# the keep-everything regime is covered at sf0.001 by the property
# tests.
TOKEN_BUDGET = 20_000  # whitespace tokens to keep, best-quality-first
SCORE_LEVELS = 1_000


def _token_budget_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select the highest-quality documents until a global token budget
    is filled — the "take the best N tokens" curation step — WITHOUT a
    global sort. The scalable shape: quantize scores to SCORE_LEVELS
    buckets, aggregate token mass per bucket (tiny), compute the running
    mass down the buckets, and keep (a) every doc strictly above the
    cutoff bucket and (b) docs inside the cutoff bucket ranked by
    (hash, doc_id) until the remainder fills. The per-bucket rank
    window only ever sees the boundary bucket's rows — the corpus is
    never globally sorted.
    """
    from pyspark.sql import Window

    from ..operators.sampling import sample_hash

    # (r10 measured: spread + an eager checkpoint of the scored
    # projection ran 0.41 → 0.94 s interleaved — two extra blocking
    # steps against one saved 5 000-doc tokenize pass — reverted; the
    # lazy double-evaluation is the cheaper form at this scale.)
    docs = _docs(spark, sf_dir)
    n_tok = X.token_count(F.col("text"))
    score = F.least(F.lit(1.0), n_tok.cast("double") / 256.0)
    level = F.floor(score * SCORE_LEVELS).cast("long")
    scored = docs.select(
        "doc_id",
        "source",
        n_tok.alias("n_tokens"),
        level.alias("level"),
    )
    per_level = scored.groupBy("level").agg(
        F.sum("n_tokens").alias("mass")
    )
    wl = Window.orderBy(F.desc("level")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # SCORE_LEVELS rows: the running-mass window is bounded, not
    # data-sized. cut = the first level where the running mass reaches
    # the budget; above it everything fits, inside it the remainder
    # fills by deterministic (hash, doc_id) rank.
    levels = per_level.withColumn(
        "cum_mass", F.sum("mass").over(wl).cast("long")
    )
    # cut_level = highest level whose running mass crosses the budget;
    # NULL when the whole corpus fits, in which case everything is kept
    # (cut defaults to -1, below every real level) — "until the budget
    # is filled OR the corpus is exhausted".
    cut = levels.agg(
        F.max(
            F.when(F.col("cum_mass") >= TOKEN_BUDGET, F.col("level"))
        ).alias("raw_cut")
    )
    budget_left = (
        cut.join(
            levels, levels.level == cut.raw_cut, "left_outer"
        ).select(
            F.coalesce(F.col("raw_cut"), F.lit(-1)).alias("cut_level"),
            F.coalesce(
                F.lit(TOKEN_BUDGET) - (F.col("cum_mass") - F.col("mass")),
                F.lit(0),
            ).alias("boundary_budget"),
        )
    )
    wb = Window.partitionBy("level").orderBy(
        sample_hash("doc_id").asc(), F.col("doc_id").asc()
    )
    boundary_ranked = scored.withColumn(
        "run_tokens",
        F.sum("n_tokens").over(
            wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )
    return (
        boundary_ranked.crossJoin(F.broadcast(budget_left))
        .filter(
            (F.col("level") > F.col("cut_level"))
            | (
                (F.col("level") == F.col("cut_level"))
                & (F.col("run_tokens") <= F.col("boundary_budget"))
            )
        )
        .select("doc_id", "source", "n_tokens", "level")
    )


register(
    Query(
        name="token_budget_head",
        spark=_token_budget_head,
        oracle=f"""
            WITH scored AS (
                SELECT doc_id, source,
                       CAST({SQL_TOKENS} AS BIGINT) AS n_tokens,
                       CAST(floor(least(1.0, {SQL_TOKENS} / 256.0)
                                  * {SCORE_LEVELS}) AS BIGINT) AS level
                FROM documents
            ),
            levels AS (
                SELECT level, sum(n_tokens) AS mass,
                       CAST(sum(sum(n_tokens)) OVER (
                           ORDER BY level DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS BIGINT) AS cum_mass
                FROM scored GROUP BY level
            ),
            cut AS (
                SELECT max(CASE WHEN cum_mass >= {TOKEN_BUDGET}
                                THEN level END) AS raw_cut
                FROM levels
            ),
            boundary AS (
                SELECT coalesce(raw_cut, -1) AS cut_level,
                       coalesce({TOKEN_BUDGET} - (cum_mass - mass), 0)
                           AS boundary_budget
                FROM cut LEFT OUTER JOIN levels ON level = raw_cut
            ),
            ranked AS (
                SELECT doc_id, source, n_tokens, level,
                       CAST(sum(n_tokens) OVER (
                           PARTITION BY level
                           ORDER BY (doc_id * 2654435761) % 4294967296,
                                    doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS BIGINT) AS run_tokens
                FROM scored
            )
            SELECT doc_id, source, n_tokens, level
            FROM ranked, boundary
            WHERE level > cut_level
               OR (level = cut_level AND run_tokens <= boundary_budget)
        """,
        tags=("sampling", "budget", "llm-pipeline"),
    )
)


# ------------------------------------------- source token water-filling


def _source_token_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling allocation of a global token budget across sources
    — the mixture-design step that caps over-represented domains
    instead of downsampling everything uniformly: find the largest
    integer cap λ with Σ_s min(T_s, λ) ≤ B, then allocate
    min(T_s, λ) to each source. Sources below the water line keep
    every token; only the heavy tail is cut.

    Scale shape: the ONLY corpus-sized stage is the per-source token
    sum (map-side combinable). The water line is found analytically on
    the |sources|-row table: sort ascending, prefix-sum, pick the last
    rank i0 where capping at T_i0 still fits the budget, and close the
    form with one integer division — no iteration, no budget search
    loop. The two global windows run over |sources| rows (bounded by
    the source vocabulary, never by the corpus). Every quantity is an
    exact int64/integer-division value, so the gate is hash-exact."""
    docs = _docs(spark, sf_dir)
    totals = (
        docs.groupBy("source")
        .agg(F.sum(X.token_count(F.col("text"))).alias("t"))
        # |sources| rows with THREE consumers (ranked, g, the final
        # allocation) — lazily each re-ran the corpus tokenize pass
        # (4 documents scans across this query in the r10 before-plan,
        # 5 through waterfill_apply which reuses this plan). One
        # tokenize pass (guide §2.4).
        .localCheckpoint(eager=True)
    )
    w = Window.orderBy(F.asc("t"), F.asc("source"))
    ranked = totals.select(
        "source",
        "t",
        F.row_number().over(w).alias("i"),
        F.sum("t")
        .over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("cum"),
    )
    g = totals.agg(
        F.count(F.lit(1)).alias("k"), F.sum("t").alias("total")
    ).select("k", "total", F.expr("total div 2").alias("b"))
    # Last ascending rank where capping everything above it at its own
    # total still fits: cum_i + T_i·(k−i) ≤ B. max_by keeps (i0, cum_i0)
    # in one pass over the |sources|-row table.
    sel = (
        ranked.crossJoin(F.broadcast(g))
        .filter(
            F.col("cum") + F.col("t") * (F.col("k") - F.col("i"))
            <= F.col("b")
        )
        .agg(
            F.max_by(F.col("i"), F.col("i")).alias("i0"),
            F.max_by(F.col("cum"), F.col("i")).alias("cum0"),
        )
    )
    params = g.crossJoin(F.broadcast(sel)).select(
        "k",
        "b",
        F.when(
            F.coalesce(F.col("i0"), F.lit(0)) == F.col("k"), F.lit(None)
        )
        .otherwise(
            F.expr(
                "(b - coalesce(cum0, 0)) div (k - coalesce(i0, 0))"
            )
        )
        .alias("cap"),
    )
    return totals.crossJoin(F.broadcast(params)).select(
        "source",
        F.col("t").alias("n_tokens"),
        F.when(F.col("cap").isNull(), F.col("t"))
        .otherwise(F.least(F.col("t"), F.col("cap")))
        .alias("alloc"),
        F.when(F.col("cap").isNull(), F.lit(False))
        .otherwise(F.col("t") > F.col("cap"))
        .alias("capped"),
        F.col("cap").cast("long").alias("cap"),
    )


register(
    Query(
        name="source_token_waterfill",
        spark=_source_token_waterfill,
        oracle=r"""
            WITH totals AS (
                SELECT source,
                       CAST(sum(len(string_split_regex(
                           lower(trim(text)), '\s+'))) AS BIGINT) AS t
                FROM documents GROUP BY 1
            ),
            ranked AS (
                SELECT source, t,
                       row_number() OVER (ORDER BY t, source) AS i,
                       CAST(sum(t) OVER (ORDER BY t, source
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS cum
                FROM totals
            ),
            g AS (
                SELECT count(*) AS k,
                       CAST(sum(t) AS BIGINT) // 2 AS b
                FROM totals
            ),
            sel AS (
                SELECT max_by(i, i) AS i0, max_by(cum, i) AS cum0
                FROM ranked, g
                WHERE cum + t * (k - i) <= b
            ),
            params AS (
                SELECT CASE WHEN coalesce(i0, 0) = k THEN NULL
                            ELSE (b - coalesce(cum0, 0))
                                 // (k - coalesce(i0, 0)) END AS cap
                FROM g, sel
            )
            SELECT source, t AS n_tokens,
                   CASE WHEN cap IS NULL THEN t
                        ELSE least(t, cap) END AS alloc,
                   CASE WHEN cap IS NULL THEN FALSE
                        ELSE t > cap END AS capped,
                   CAST(cap AS BIGINT) AS cap
            FROM totals, params
        """,
        tags=("sampling", "mixture", "llm-pipeline"),
        doc="water-filling token-budget cap across sources: one "
        "per-source token agg, analytic integer water line on the "
        "|sources|-row table (sort + prefix sum + one division)",
    )
)


def _waterfill_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the water-filling cap at the document level: each source
    keeps documents in deterministic (hash, doc_id) order until its
    allocation (``source_token_waterfill``) fills — the executable half
    of the mixture-design step. Reuses the cap plan verbatim (the
    |sources|-row allocation table broadcasts); the per-source running
    token sum is a window PARTITIONED by source, so no task ever sees
    more than one source's documents. Deterministic: the keep set is a
    pure function of the corpus (hash order, no RNG), so retries and
    re-runs rebuild the identical mixture."""
    docs = _docs(spark, sf_dir)
    alloc = _source_token_waterfill(spark, sf_dir).select(
        "source", "alloc"
    )
    per_doc = docs.select(
        "doc_id",
        "source",
        X.token_count(F.col("text")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(sample_hash("doc_id").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = per_doc.withColumn(
        "run_tokens", F.sum("n_tokens").over(w).cast("long")
    )
    return (
        ranked.join(F.broadcast(alloc), "source")
        .filter(F.col("run_tokens") <= F.col("alloc"))
        .select("doc_id", "source", "n_tokens", "run_tokens")
    )


register(
    Query(
        name="waterfill_apply",
        spark=_waterfill_apply,
        oracle=rf"""
            WITH totals AS (
                SELECT source,
                       CAST(sum({SQL_TOKENS}) AS BIGINT) AS t
                FROM documents GROUP BY 1
            ),
            src_ranked AS (
                SELECT source, t,
                       row_number() OVER (ORDER BY t, source) AS i,
                       CAST(sum(t) OVER (ORDER BY t, source
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS cum
                FROM totals
            ),
            g AS (
                SELECT count(*) AS k,
                       CAST(sum(t) AS BIGINT) // 2 AS b
                FROM totals
            ),
            sel AS (
                SELECT max_by(i, i) AS i0, max_by(cum, i) AS cum0
                FROM src_ranked, g
                WHERE cum + t * (k - i) <= b
            ),
            params AS (
                SELECT CASE WHEN coalesce(i0, 0) = k THEN NULL
                            ELSE (b - coalesce(cum0, 0))
                                 // (k - coalesce(i0, 0)) END AS cap
                FROM g, sel
            ),
            alloc AS (
                SELECT source,
                       CASE WHEN cap IS NULL THEN t
                            ELSE least(t, cap) END AS alloc
                FROM totals, params
            ),
            per_doc AS (
                SELECT doc_id, source,
                       CAST({SQL_TOKENS} AS BIGINT) AS n_tokens
                FROM documents
            ),
            rr AS (
                SELECT doc_id, source, n_tokens,
                       CAST(sum(n_tokens) OVER (
                           PARTITION BY source
                           ORDER BY (doc_id * 2654435761) % 4294967296,
                                    doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW
                       ) AS BIGINT) AS run_tokens
                FROM per_doc
            )
            SELECT doc_id, source, n_tokens, run_tokens
            FROM rr JOIN alloc USING (source)
            WHERE run_tokens <= alloc
        """,
        tags=("sampling", "mixture", "llm-pipeline"),
        doc="doc-level application of the water-filling cap: broadcast "
        "|sources|-row allocation, per-source hash-ordered running sum "
        "(window partitioned by source), deterministic keep set",
    )
)
