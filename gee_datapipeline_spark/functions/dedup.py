"""Near-duplicate detection at scale: MinHash + LSH and SimHash.

Why these exist (LLM-data-pipeline surface): exact dedup
(``plans.text_queries.dedup_exact``) and exact n-gram Jaccard
(``ngram_jaccard_pairs``) are the correctness baselines, but the exact
pairwise path is quadratic in candidate density. MinHash-LSH reduces it to
an equi-join on band buckets — the only shape that survives 100 TB:

    shingle → k minhashes (per-row, no shuffle)
    → b bands of r rows each (k = b·r)
    → explode bands → equi-join on (band_id, band_hash)
    → estimate Jaccard from signature agreement, threshold.

Everything is Catalyst higher-order functions over the shingle array —
signatures are computed per row with zero shuffles; the only shuffle is
the band-bucket join, which AQE skew-handles. ``xxhash64(seed, value)``
supplies the k hash families (JVM-side, deterministic).

SimHash: 64-bit fingerprint whose Hamming distance approximates cosine
distance over the token multiset; banded by 16-bit chunks for the same
equi-join trick.

Both operators take a ``family`` parameter: ``xxhash64`` (default,
fastest JVM hash) and ``md5hex`` (cross-engine reproducible — DuckDB's
md5() emits identical hex, letting the gate queries value-hash the FULL
LSH pipelines against a SQL mirror). ``tests/test_text_dedup.py``
additionally verifies the MinHash Jaccard estimate against the exact
Jaccard oracle query and the SimHash/LSH recall on constructed
near-duplicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_HASHES = 32
DEFAULT_BANDS = 8  # 8 bands x 4 rows = 32 hashes


def minhash_signature(
    shingle_arr: Column, num_hashes: int = DEFAULT_NUM_HASHES
) -> Column:
    """k-permutation MinHash signature of a string-array column.

    ``sig[i] = min over shingles of xxhash64(i, shingle)`` — one pass per
    row. Empty shingle sets yield an all-NULL signature.

    PERFORMANCE: nested higher-order functions are interpreted (no
    whole-stage codegen), so this per-row form is only for small inputs
    (tests, ad-hoc). The pipeline path is :func:`minhash_signatures_df`
    — explode + codegen'd hash aggregate — which is both ~100x faster
    per core and shuffle-parallel at cluster scale."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(shingle_arr, lambda s: F.xxhash64(i, s))
        ),
    )


# Universal-hash family for the md5perm mode: mh_i = (A_i·h + B_i) mod P
# over a 32-bit md5-derived base hash. P is the smallest prime > 2^32;
# A_i < 2^30 keeps every product < 2^62 (no int64 overflow in either
# engine). Constants are a fixed LCG so the DuckDB oracle generator can
# emit the identical arithmetic.
MH_PERM_P = 4294967311


def mh_perm_constants(num_hashes: int = DEFAULT_NUM_HASHES):
    a = [((i * 2654435761 + 1013904223) % ((1 << 30) - 1)) + 1
         for i in range(num_hashes)]
    b = [(i * 975319753 + 123456789) % MH_PERM_P for i in range(num_hashes)]
    return a, b


def _mh_hash_sql(i: int, col: str, family: str) -> str:
    """SQL-string form of :func:`_mh_hash` (same operators, one JVM
    parse instead of several py4j calls per hash member)."""
    if family == "xxhash64":
        return f"xxhash64({i}, {col})"
    if family == "md5hex":
        return f"md5(concat('{i}:', {col}))"
    raise ValueError(f"unknown hash family: {family}")


def _mh_hash(i: int, col: Column, family: str) -> Column:
    """One member of the k-hash family.

    ``xxhash64`` (default) is the fast production path. ``md5hex`` is
    cross-engine reproducible: DuckDB's md5() emits the identical
    lowercase hex, and fixed-width lowercase hex compares
    lexicographically == numerically, so ``min()`` picks the same
    element in both engines — which is what lets the LSH gate query
    carry a FULL value-hash oracle instead of a rows-only check."""
    if family == "xxhash64":
        return F.xxhash64(F.lit(i), col)
    if family == "md5hex":
        return F.md5(F.concat(F.lit(f"{i}:"), col))
    raise ValueError(f"unknown hash family: {family}")


def minhash_signatures_df(
    shingle_rows: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    family: str = "xxhash64",
) -> DataFrame:
    """Signatures from (doc_id, shingle) rows via a 32-way min
    hash-aggregate (codegen'd, map-side partial aggregation; the shuffle
    carries one 32-long row per doc per input partition). Returns
    (doc_id, sig array<long>) — array<string> for ``family="md5hex"``.
    Input comes from ``functions.text.shingles_df``.

    ``family="md5perm"`` hashes each shingle ONCE (32-bit md5 prefix)
    and derives the k family members as universal-hash permutations
    (A_i·h + B_i) mod P — pure int64 arithmetic, so it is BOTH as fast
    as the xxhash64 path (one digest per shingle, k cheap mults) AND
    bit-reproducible in DuckDB for the oracle gate."""
    # Aggregates are built as SQL strings (one JVM parse per column)
    # rather than k × ~8 py4j Column calls: driver-side construction of
    # the LSH queries measured 1.9-2.5 s steady-state, almost all py4j
    # round-trips (r10; the simhash_df precedent). Same operators,
    # same values.
    if family == "md5perm":
        a_c, b_c = mh_perm_constants(num_hashes)
        base = shingle_rows.select(
            "doc_id",
            F.expr(
                "cast(conv(substring(md5(shingle), 1, 8), 16, 10)"
                " as bigint)"
            ).alias("__h"),
        )
        mins = base.groupBy("doc_id").agg(
            *[
                F.expr(
                    f"min(({a_c[i]} * __h + {b_c[i]}) % {MH_PERM_P})"
                ).alias(f"mh{i}")
                for i in range(num_hashes)
            ]
        )
    else:
        mins = shingle_rows.groupBy("doc_id").agg(
            *[
                F.expr(f"min({_mh_hash_sql(i, 'shingle', family)})").alias(
                    f"mh{i}"
                )
                for i in range(num_hashes)
            ]
        )
    return mins.select(
        "doc_id",
        F.expr(
            "array(" + ", ".join(f"mh{i}" for i in range(num_hashes)) + ")"
        ).alias("sig"),
    )


def lsh_bands(
    sig: Column | str,
    num_bands: int = DEFAULT_BANDS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> Column:
    """Hash each band (contiguous signature slice) to one bucket key.

    Returns ``array<struct<band_id int, band_hash bigint>>``; explode and
    equi-join on both fields. Two docs collide in a band iff that whole
    slice agrees — the classic (b, r) S-curve. Band indices are Python
    constants, so this is a flat (codegen-friendly) expression — no
    nested lambdas."""
    rows_per_band = num_hashes // num_bands
    if isinstance(sig, str):
        # SQL-string fast path (one JVM parse; see minhash_signatures_df
        # note) — used by the pipeline callers, which always band a
        # named column. try_element_at: NULL (like the Column path's
        # F.get) rather than an ANSI-mode error on a short signature
        # (ADVICE r10 — both paths must degrade identically).
        bands = ", ".join(
            f"struct(cast({b} as int) as band_id, xxhash64({b}, "
            + "concat_ws(',', "
            + ", ".join(
                f"cast(try_element_at({sig}, {b * rows_per_band + j + 1})"
                " as string)"
                for j in range(rows_per_band)
            )
            + ")) as band_hash)"
            for b in range(num_bands)
        )
        return F.expr(f"array({bands})")
    return F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band_id"),
                F.xxhash64(
                    F.lit(b),
                    F.concat_ws(
                        ",",
                        *[
                            F.get(sig, b * rows_per_band + j).cast("string")
                            for j in range(rows_per_band)
                        ],
                    ),
                ).alias("band_hash"),
            )
            for b in range(num_bands)
        ]
    )


def signature_agreement(sig_a: Column, sig_b: Column) -> Column:
    """Estimated Jaccard = fraction of agreeing minhash positions."""
    eq = F.zip_with(
        sig_a, sig_b, lambda x, y: F.when(x == y, 1).otherwise(0)
    )
    return F.aggregate(eq, F.lit(0), lambda acc, v: acc + v) / F.size(sig_a)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: Column,
    threshold: float = 0.5,
    num_hashes: int = DEFAULT_NUM_HASHES,
    num_bands: int | None = None,
    shingle_n: int = 3,
    family: str = "xxhash64",
) -> DataFrame:
    """Candidate near-dup pairs with estimated Jaccard >= threshold.

    ``num_bands=None`` (default) derives the band count from the
    S-curve via :func:`pick_bands_rows`, so the banding tracks the
    requested threshold instead of a hand-tuned constant (at the
    defaults, 0.5 → 8×4 — unchanged from the historical value).

    Plan: shingle rows (codegen, shuffle-parallel) → 32-way min
    aggregate → band explode → self equi-join on (band_id, band_hash) →
    distinct pairs → signature agreement filter. The band join replaces
    the all-pairs cross product; candidate count is driven by the
    (b, r) S-curve, not n²."""
    from .text import shingles_df

    if num_bands is None:
        num_bands, _ = pick_bands_rows(threshold, num_hashes)
    sh = shingles_df(docs, id_col, text_col, shingle_n)
    sigs = minhash_signatures_df(sh, num_hashes, family)

    # Signatures ride along through the band join (they're k longs per
    # row — cheap) so no extra join recomputes them; the two join sides
    # are identical subplans, which Spark's ReuseExchange shares.
    # (r10 measured: an eager localCheckpoint of sigs here ran 1.91 →
    # 2.30 s at sf0.1 — the blocking materialization costs more than
    # the duplicated signature build it saves — so the lazy form
    # deliberately stands.)
    banded = sigs.select(
        "doc_id",
        "sig",
        F.explode(lsh_bands("sig", num_bands, num_hashes)).alias("band"),
    ).select("doc_id", "sig", "band.band_id", "band.band_hash")

    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.round(
            signature_agreement(F.col("sig_a"), F.col("sig_b")), 6
        ).alias("est_jaccard"),
    ).filter(F.col("est_jaccard") >= threshold)


def banded_signatures(
    docs: DataFrame,
    id_col: str,
    text_col: Column,
    num_hashes: int = DEFAULT_NUM_HASHES,
    num_bands: int | None = None,
    shingle_n: int = 3,
    family: str = "xxhash64",
    threshold: float = 0.5,
) -> DataFrame:
    """Banded MinHash signatures: one row per (doc, band) with the full
    signature carried alongside — the schema of the persistable corpus
    index (:func:`minhash_index_write`) and the probe side of
    :func:`minhash_incremental_pairs`."""
    from .text import shingles_df

    if num_bands is None:
        num_bands, _ = pick_bands_rows(threshold, num_hashes)
    sh = shingles_df(docs, id_col, text_col, shingle_n)
    sigs = minhash_signatures_df(sh, num_hashes, family)
    return sigs.select(
        "doc_id",
        "sig",
        F.explode(
            lsh_bands("sig", num_bands, num_hashes)
        ).alias("band"),
    ).select("doc_id", "sig", "band.band_id", "band.band_hash")


def minhash_index_write(
    corpus: DataFrame,
    path: str,
    id_col: str,
    text_col: Column,
    threshold: float = 0.5,
    num_hashes: int = DEFAULT_NUM_HASHES,
    num_bands: int | None = None,
    shingle_n: int = 3,
    family: str = "xxhash64",
) -> None:
    """Persist the corpus's banded MinHash signatures as a build-once
    parquet artifact. At 100 TB the corpus is shingled and hashed
    exactly ONCE; every future ingestion batch probes this table
    (:func:`minhash_index_probe`) instead of recomputing the corpus
    side. Probe-time callers must pass the same (num_hashes, num_bands,
    shingle_n, family) the index was built with — the parameters are
    part of the artifact's identity, like a model checkpoint's config.
    New batches are appended to the index with
    :func:`minhash_index_append` after their own probe pass."""
    banded_signatures(
        corpus,
        id_col,
        text_col,
        num_hashes,
        num_bands,
        shingle_n,
        family,
        threshold,
    ).write.mode("overwrite").parquet(path)


def minhash_index_append(
    batch: DataFrame,
    path: str,
    id_col: str,
    text_col: Column,
    threshold: float = 0.5,
    num_hashes: int = DEFAULT_NUM_HASHES,
    num_bands: int | None = None,
    shingle_n: int = 3,
    family: str = "xxhash64",
) -> None:
    """Fold a probed batch INTO the persisted index
    (:func:`minhash_index_write`) so future batches dedup against it
    too — the second half of the ingestion loop: probe, decide keeps,
    append the keepers. Parquet ``append`` adds new files only; the
    existing corpus signatures are never rewritten, so the operation
    is O(batch) like the probe. Parameters must match the index's
    build parameters (they are the artifact's identity)."""
    banded_signatures(
        batch,
        id_col,
        text_col,
        num_hashes,
        num_bands,
        shingle_n,
        family,
        threshold,
    ).write.mode("append").parquet(path)


def minhash_index_probe(
    spark,
    path: str,
    batch: DataFrame,
    id_col: str,
    text_col: Column,
    threshold: float = 0.5,
    num_hashes: int = DEFAULT_NUM_HASHES,
    num_bands: int | None = None,
    shingle_n: int = 3,
    family: str = "xxhash64",
) -> DataFrame:
    """Probe a persisted corpus index (:func:`minhash_index_write`)
    with a new batch: only the batch is shingled/hashed; its banded
    signatures broadcast into a single pass over the index parquet —
    zero corpus-side shuffle, O(batch) new compute."""
    idx = spark.read.parquet(path)
    probe = F.broadcast(
        banded_signatures(
            batch,
            id_col,
            text_col,
            num_hashes,
            num_bands,
            shingle_n,
            family,
            threshold,
        )
    )
    return _banded_probe(idx, probe, threshold)


def _banded_probe(
    corpus_banded: DataFrame, batch_banded: DataFrame, threshold: float
) -> DataFrame:
    """(band_id, band_hash) equi-join of pre-banded corpus × batch
    signatures → deduped candidate pairs → signature-agreement
    estimate, thresholded."""
    c, b = corpus_banded.alias("c"), batch_banded.alias("b")
    cand = (
        c.join(
            b,
            (F.col("c.band_id") == F.col("b.band_id"))
            & (F.col("c.band_hash") == F.col("b.band_hash")),
        )
        .select(
            F.col("c.doc_id").alias("corpus_id"),
            F.col("b.doc_id").alias("batch_id"),
            F.col("c.sig").alias("sig_c"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["corpus_id", "batch_id"])
    )
    return cand.select(
        "corpus_id",
        "batch_id",
        F.round(
            signature_agreement(F.col("sig_c"), F.col("sig_b")), 6
        ).alias("est_jaccard"),
    ).filter(F.col("est_jaccard") >= threshold)


def minhash_incremental_pairs(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: Column,
    threshold: float = 0.5,
    num_hashes: int = DEFAULT_NUM_HASHES,
    num_bands: int | None = None,
    shingle_n: int = 3,
    family: str = "xxhash64",
) -> DataFrame:
    """Incremental near-dup: match a NEW BATCH against an EXISTING
    corpus index, returning (corpus_id, batch_id, est_jaccard) pairs.

    This is the production ingestion shape at 100 TB: the corpus's
    banded signatures are a build-once artifact
    (:func:`minhash_index_write` persists exactly this plan's corpus
    side); each arriving batch computes only ITS signatures and probes
    the index — the corpus is never self-joined and never re-shingled.
    A daily 100 GB batch against a 100 TB corpus costs O(batch) new
    work plus one index probe, instead of the O(corpus²-candidates)
    full re-dedup.

    The batch side is typically orders of magnitude smaller than the
    corpus, so its exploded bands are broadcast — the corpus-side scan
    joins with zero shuffle. Within-batch duplicates are a separate
    (batch-only) :func:`minhash_lsh_pairs` pass, deliberately not
    duplicated here.
    """
    c = banded_signatures(
        corpus,
        id_col,
        text_col,
        num_hashes,
        num_bands,
        shingle_n,
        family,
        threshold,
    )
    b = F.broadcast(
        banded_signatures(
            batch,
            id_col,
            text_col,
            num_hashes,
            num_bands,
            shingle_n,
            family,
            threshold,
        )
    )
    return _banded_probe(c, b, threshold)


# ------------------------------------------------------------- SimHash


def simhash64(tokens_arr: Column, num_bits: int = 64) -> Column:
    """64-bit SimHash of a token array.

    For each bit b: sum over token hashes of (+1 if bit b set else -1);
    fingerprint bit b is 1 iff the sum is positive. The token array is
    hashed once (``transform``), then each bit's vote is one ``aggregate``
    over the hash array — all JVM-side, per-row, no shuffle. Bit indices
    are compile-time constants (shift amounts must be Python ints), so
    the expression is built with a Python loop, not a SQL lambda."""
    hashes = F.transform(tokens_arr, lambda t: F.xxhash64(t))

    # NB: the bit index must be captured via a closure, not a lambda
    # default arg — PySpark introspects lambda arity and would turn the
    # extra parameter into a phantom higher-order-function variable.
    def vote(b: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(
                F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1),
        )

    fp = F.lit(0).cast("long")
    for b in range(num_bits):
        fp = fp.bitwiseOR(
            F.when(
                vote(b) > 0, F.shiftleft(F.lit(1).cast("long"), b)
            ).otherwise(F.lit(0).cast("long"))
        )
    return fp


def simhash_df(
    docs: DataFrame,
    id_col: str,
    tokens_col: Column,
    num_bits: int = 64,
    family: str = "xxhash64",
) -> DataFrame:
    """SimHash via explode → per-bit vote-sum hash-aggregates
    (codegen'd; the scalable pipeline form of :func:`simhash64`).
    Returns (doc_id, fp long). Docs with no tokens are dropped (no
    content).

    ``family="md5hex"`` derives the token hash from the first 15 hex
    chars of md5 (60 bits, fits a signed long with no sign games) —
    cross-engine reproducible, so callers should pair it with
    ``num_bits=60``. DuckDB reconstructs the same value from md5 hex
    nibbles."""
    if family == "xxhash64":
        h = F.xxhash64("t")
    elif family == "md5hex":
        h = F.conv(F.substring(F.md5(F.col("t")), 1, 15), 16, 10).cast("long")
    else:
        raise ValueError(f"unknown hash family: {family}")
    # Group-then-hash (guide §2.3, do less per row): a token occurring
    # c times in a doc contributes c·bit_b to every vote, so count
    # (doc, token) multiplicities FIRST (a narrow map-side-combinable
    # aggregate), then hash and bit-unpack only the DISTINCT pairs —
    # 2.3× fewer digests and per-bit sums on the r10 corpus, identical
    # votes by the multiset identity v_b = Σ_occ bit_b = Σ_distinct
    # c·bit_b (exact integer arithmetic; the oracle keeps its
    # per-occurrence form and hash-matches).
    # (r11 tried the next rung — digest each DISTINCT corpus token once
    # (vocab table + join-back; md5 is doc-independent) instead of once
    # per (doc, token) pair. 3 750x fewer digests on this corpus
    # (116 231 pairs, 31-token vocab), IDENTICAL output, and still
    # measured SLOWER: interleaved A/B min 1.19 s (this form) vs 1.76 s
    # (vocab join) at sf0.1 — the checkpoint + distinct + join overhead
    # exceeds the digest work it saves, and it breaks the one-exchange
    # pipeline the doc_id spread establishes. Reverted; re-test only on
    # a corpus whose vocabulary digest cost is actually measurable.)
    counted = (
        docs.select(
            F.col(id_col).alias("doc_id"), F.explode(tokens_col).alias("t")
        )
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("__c"))
        .select("doc_id", "__c", h.alias("h"))
    )
    # Vote identity (guide §2.3, narrower per-row work): the ±1 vote sum
    # for bit b is v_b = 2·s_b − n where s_b = Σ c·((h>>b)&1) and n is
    # the token count, so summing the RAW weighted BIT (no compare, no
    # CASE branch per bit per row) and one shared count gives the
    # identical fingerprint via v_b > 0  ⟺  2·s_b > n — exact integer
    # arithmetic, bit-for-bit the same fp in both engines.
    # Expressions are built as SQL strings, ONE JVM parse each, instead
    # of num_bits × ~8 py4j Column calls: driver-side construction of
    # this query measured 1.8 s steady-state (64 % of its bench time)
    # with the Column-by-Column form — py4j round-trips, not Spark
    # work. Semantics unchanged (same operators, bit-disjoint terms so
    # the old bitwiseOR fold equals the + fold).
    votes = counted.groupBy("doc_id").agg(
        F.expr("sum(__c)").alias("__n"),
        *[
            F.expr(f"sum((shiftright(h, {b}) & 1) * __c)").alias(f"v{b}")
            for b in range(num_bits)
        ],
    )
    # shiftleft, not a literal: bit 63 (the xxhash64/64-bit family) is
    # −2^63 via shift exactly as the old bitwiseOR fold computed it; the
    # decimal literal 2^63 would overflow BIGINT. Bits are disjoint, so
    # the sum of shifted bits equals the old OR fold on every input.
    fp_sql = " + ".join(
        f"(CASE WHEN v{b} * 2 > __n "
        f"THEN shiftleft(CAST(1 AS BIGINT), {b}) "
        "ELSE CAST(0 AS BIGINT) END)"
        for b in range(num_bits)
    )
    return votes.select("doc_id", F.expr(fp_sql).alias("fp"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints (bit_count of
    XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_bands(fp: Column, num_bands: int = 4, num_bits: int = 64) -> Column:
    """Split a fingerprint into ``num_bits // num_bands``-wide band
    keys: two docs within Hamming distance (num_bands - 1) share at
    least one band exactly (pigeonhole) — the standard SimHash blocking
    scheme."""
    width = num_bits // num_bands
    mask = (1 << width) - 1
    return F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band_id"),
                F.shiftrightunsigned(fp, b * width)
                .bitwiseAND(F.lit(mask))
                .alias("band_key"),
            )
            for b in range(num_bands)
        ]
    )


def simhash_pairs(
    docs: DataFrame,
    id_col: str,
    tokens_col: Column,
    max_hamming: int = 3,
    num_bands: int = 4,
    num_bits: int = 64,
    family: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash: band-bucket equi-join then exact
    Hamming filter. Guaranteed recall for distance <= num_bands - 1."""
    fps = simhash_df(docs, id_col, tokens_col, num_bits, family)
    banded = fps.select(
        "doc_id",
        "fp",
        F.explode(simhash_bands(F.col("fp"), num_bands, num_bits)).alias("b"),
    ).select("doc_id", "fp", "b.band_id", "b.band_key")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming64(F.col("a.fp"), F.col("b.fp")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def pick_bands_rows(
    threshold: float, num_hashes: int = DEFAULT_NUM_HASHES
) -> tuple[int, int]:
    """S-curve-driven (bands, rows) choice for MinHash LSH (the
    standard construction, Leskovec/Rajaraman/Ullman "Mining of Massive
    Datasets" §3.4): a pair with Jaccard s becomes a candidate with
    probability 1 - (1 - s^r)^b, a sigmoid whose inflection sits near
    (1/b)^(1/r). Among the factorizations b·r = num_hashes, pick the
    one whose inflection lands closest to ``threshold`` (in log space,
    so 0.25-vs-0.5 and 0.5-vs-1.0 count as equal misses).

    This replaces hand-tuned band counts with a measured-target choice:
    callers state the Jaccard level they want candidates at, and the
    curve's steepness then only improves as num_hashes grows.
    """
    if not (0.0 < threshold < 1.0):
        raise ValueError(f"threshold must be in (0,1), got {threshold}")
    import math

    best: tuple[float, int, int] | None = None
    for r in range(1, num_hashes + 1):
        if num_hashes % r:
            continue
        b = num_hashes // r
        inflection = (1.0 / b) ** (1.0 / r)
        miss = abs(math.log(inflection) - math.log(threshold))
        # ties (e.g. symmetric factorizations): prefer more rows —
        # steeper curve, fewer false positives per candidate band
        key = (miss, -r)
        if best is None or key < (best[0], -best[2]):
            best = (miss, b, r)
    assert best is not None
    return best[1], best[2]
