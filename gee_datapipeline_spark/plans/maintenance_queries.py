"""Pipeline-maintenance queries: corpus checksums for lineage/diffing,
and incremental aggregate maintenance (partial-agg combine == full
recompute).

Both serve the same operational need at 100 TB: re-running yesterday's
job must be byte-identical (``functions.stable``), provable without
re-reading the world. A checksum per partition makes drift detectable
with a metadata-sized scan; incremental maintenance makes the daily
update cost proportional to the delta, not the history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.stable import sql_stable_sum, stable_round, stable_sum
from .registry import Query, register

# 60-bit row hash from the md5 hex prefix: fits a signed 64-bit long
# with headroom, identical in both engines.
_HASH_HEX_CHARS = 15
_SUM_MOD = 2**61


def _row_hash(cols_expr) -> F.Column:
    return F.conv(
        F.substring(F.md5(cols_expr), 1, _HASH_HEX_CHARS), 16, 10
    ).cast("long")


def _corpus_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive per-source corpus checksum: a 60-bit md5 row
    fingerprint over (doc_id, text), combined with an order-independent
    modular SUM (exact via DECIMAL, mod 2^61) plus the row count.
    Equal checksums ⇒ equal partitions with overwhelming probability;
    comparing two pipeline runs (or two replicas) costs one
    sources-sized scan of 3 integers each.

    Scale: one narrow map (hash) + one hash-agg on source — map-side
    partials shrink the shuffle to |sources| rows per partition. The
    modular sum (not xor) is used so duplicated rows cannot cancel."""
    docs = load_table(spark, sf_dir, "documents")
    # coalesce NULLs explicitly: concat_ws would silently SKIP a NULL
    # field (hashing "id" instead of "id:"), while the oracle's || would
    # NULL the whole row — coalesce on both sides keeps parity.
    h = _row_hash(
        F.concat_ws(
            ":",
            F.coalesce(F.col("doc_id").cast("string"), F.lit("")),
            F.coalesce(F.col("text"), F.lit("")),
        )
    )
    return (
        docs.select("source", h.alias("h"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum(F.col("h").cast("decimal(38,0)")) % F.lit(_SUM_MOD))
            .cast("long")
            .alias("checksum"),
        )
    )


_SQL_ROW_HASH = " + ".join(
    "(strpos('0123456789abcdef', "
    f"substr(md5(coalesce(CAST(doc_id AS VARCHAR), '') || ':' "
    f"|| coalesce(text, '')), {i + 1}, 1)) - 1) "
    f"* {16 ** (_HASH_HEX_CHARS - 1 - i)}"
    for i in range(_HASH_HEX_CHARS)
)

register(
    Query(
        name="corpus_checksum",
        spark=_corpus_checksum,
        oracle=f"""
            WITH hashed AS (
                SELECT source,
                       CAST({_SQL_ROW_HASH} AS BIGINT) AS h
                FROM documents
            )
            SELECT source, count(*) AS n_rows,
                   CAST(sum(CAST(h AS DECIMAL(38,0))) % {_SUM_MOD}
                        AS BIGINT) AS checksum
            FROM hashed GROUP BY 1
        """,
        tags=("lineage", "checksum", "llm-pipeline"),
    )
)


def _incremental_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: monthly revenue kept as
    DECIMAL partials, updated by aggregating ONLY the newest month and
    combining — the continuous-aggregate / materialized-view pattern.
    The oracle recomputes from scratch; equality holds because decimal
    partial sums form a commutative monoid (the exact property
    ``functions.stable`` exists to provide — float partials would NOT
    satisfy it).

    Scale: the daily update touches one partition of the fact table;
    history is never re-read. Both branches partial-aggregate map-side
    and combine on |months| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("2001-01-01").cast("timestamp")
    month = F.date_format("l_shipdate", "yyyy-MM").alias("ship_month")
    partial = lambda df: df.groupBy(month).agg(  # noqa: E731
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(30,6)"
            )
        ).alias("rev_partial"),
        F.count(F.lit(1)).alias("n_items"),
    )
    base = partial(li.filter(F.col("l_shipdate") < cutoff))
    delta = partial(li.filter(F.col("l_shipdate") >= cutoff))
    return (
        base.unionAll(delta)
        .groupBy("ship_month")
        .agg(
            stable_round(
                F.sum("rev_partial").cast("double"), 2
            ).alias("revenue"),
            F.sum("n_items").alias("n_items"),
        )
    )


register(
    Query(
        name="incremental_revenue",
        spark=_incremental_revenue,
        oracle=f"""
            SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
                   {sql_stable_sum('l_extendedprice * (1 - l_discount)')}
                       AS revenue,
                   count(*) AS n_items
            FROM lineitem
            GROUP BY 1
        """,
        tags=("maintenance", "incremental"),
    )
)


# --------------------------------------- storage-format interop (ORC)


def _orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format-interop gate: day-1 events written to ORC, read back, and
    aggregated — the result must equal the same aggregate computed
    straight from the parquet original (which is what the DuckDB oracle
    does, since DuckDB has no ORC reader: the roundtrip itself is under
    test). Guards against type narrowing / timestamp semantics drifting
    between the columnar formats Spark ships (Parquet + ORC cover the
    lake-format surface; both are splittable + predicate-pushdown
    capable at 100 TB)."""
    import shutil
    import tempfile

    ev = load_table(spark, sf_dir, "events")
    first_day = ev.agg(F.min(F.to_date("ts")).alias("d")).first()["d"]
    day = ev.filter(F.to_date("ts") == F.lit(first_day)).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="gee_orc_roundtrip_")
    try:
        path = f"{root}/events_day1.orc"
        day.write.mode("overwrite").orc(path)
        back = spark.read.orc(path)
        out = (
            back.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.countDistinct("user_id").alias("n_users"),
                F.round(
                    F.sum(F.col("value").cast("decimal(30,6)")).cast(
                        "double"
                    ),
                    6,
                ).alias("sum_value"),
                F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
                .alias("last_ts"),
            )
        )
        # Force materialization before the temp dir disappears.
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


register(
    Query(
        name="orc_roundtrip",
        spark=_orc_roundtrip,
        oracle="""
            SELECT event_type, count(*) AS n_events,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                   round(CAST(sum(CAST(value AS DECIMAL(30,6)))
                              AS DOUBLE), 6) AS sum_value,
                   strftime(CAST(max(ts) AS TIMESTAMP),
                            '%Y-%m-%d %H:%M:%S.%f') AS last_ts
            FROM events
            WHERE CAST(ts AS DATE) = (SELECT min(CAST(ts AS DATE)) FROM events)
            GROUP BY 1
        """,
        tags=("source", "format", "orc"),
    )
)


def _raster_fixture_path() -> str:
    from ..sources.fixtures import ensure_geo_fixtures, fixture_path

    ensure_geo_fixtures()
    return fixture_path("raster_pixels")


def _geotiff_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster-format interop gate, the GeoTIFF analog of
    ``orc_roundtrip``: the fixture pixel table is EXPORTED through the
    S6 GeoTIFF sink (``sinks.writers.write_geotiffs`` — executor-side
    ``applyInPandas`` + the pure-Python tiffcodec), re-ingested with
    the S3 ``read_rasters`` scan, and aggregated; the oracle computes
    the identical aggregate straight from the fixture's parquet twin,
    so the encode→decode cycle (strip layout, Model tags, NaN nodata,
    center-convention georeferencing) is what's under test — DuckDB
    never sees a TIFF. The export uses the DEFLATE+tiled layout, so
    the compressed/tiled codec paths are inside the gate. Value sums
    are decimal-stable; bounds and grid dims pin the geo transform
    bit-for-bit."""
    import os
    import shutil
    import tempfile

    from ..sinks.writers import write_geotiffs
    from ..sources.fixtures import RASTER_PARAMS
    from ..sources.raster import read_rasters

    src = spark.read.parquet(_raster_fixture_path())
    px = src.select(
        F.regexp_extract("file", r"^(.+)_([0-9-]+)\.tif$", 1).alias(
            "dataset"
        ),
        F.regexp_extract("file", r"^(.+)_([0-9-]+)\.tif$", 2).alias(
            "date"
        ),
        "x",
        "y",
        "lon",
        "lat",
        "value",
    )
    root = tempfile.mkdtemp(prefix="gee_tif_roundtrip_")
    try:
        # export in the DEFLATE+tiled layout (GDAL COMPRESS=DEFLATE,
        # TILED=YES — the common real-world GEE-export shape) so the
        # roundtrip gates the compressed/tiled codec paths, not just
        # the reference's own uncompressed strips
        write_geotiffs(
            px, root, RASTER_PARAMS["cell"], compress="deflate", tile=16
        ).collect()
        back = read_rasters(spark, os.path.join(root, "*.tif"))
        out = (
            back.select(
                F.regexp_extract(
                    "path", r"([^/]+\.tif)$", 1
                ).alias("file"),
                "x",
                "y",
                "lon",
                "lat",
                "value",
            )
            .groupBy("file")
            .agg(
                F.count(F.lit(1)).alias("n_px"),
                F.count("value").alias("n_obs"),
                F.round(stable_sum(F.col("value")), 6).alias("sum_v"),
                (F.max("x") + 1).alias("w"),
                (F.max("y") + 1).alias("h"),
                F.round(F.min("lon"), 9).alias("min_lon"),
                F.round(F.max("lat"), 9).alias("max_lat"),
            )
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


register(
    Query(
        name="geotiff_roundtrip",
        spark=_geotiff_roundtrip,
        oracle=f"""
            SELECT file,
                   count(*) AS n_px,
                   count(value) AS n_obs,
                   round({sql_stable_sum('value')}, 6) AS sum_v,
                   max(x) + 1 AS w,
                   max(y) + 1 AS h,
                   round(min(lon), 9) AS min_lon,
                   round(max(lat), 9) AS max_lat
            FROM read_parquet('{_raster_fixture_path()}')
            GROUP BY 1
        """,
        tags=("sink", "format", "geotiff"),
    )
)


def _multiband_fixture_path() -> str:
    from ..sources.fixtures import ensure_geo_fixtures, fixture_path

    ensure_geo_fixtures()
    return fixture_path("raster_multiband_pixels")


def _geotiff_multiband_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 multi-band roundtrip (the ``file_per_band=False`` artifact,
    DataDownloader_V1.py:149 option surface): the 3-band fixture twin
    is exported as ONE stacked GeoTIFF per date
    (``write_geotiffs_multiband`` — SamplesPerPixel=3, chunky,
    deflate+tiled) and re-ingested through ``read_rasters``'s band
    de-interleave; the per-(date, band) aggregate must equal the same
    aggregate straight off the parquet twin. Gates the multi-band
    encode, the sample-unit tile cropping, and the band-indexed
    unpivot as one hash match."""
    import os
    import shutil
    import tempfile

    from ..sinks.writers import write_geotiffs_multiband
    from ..sources.fixtures import MULTIBAND_RASTER_PARAMS
    from ..sources.raster import read_rasters

    src = spark.read.parquet(_multiband_fixture_path())
    px = src.select(
        F.regexp_extract("file", r"([0-9-]+)\.tif$", 1).alias("date"),
        "band",
        "x",
        "y",
        "lon",
        "lat",
        "value",
    )
    root = tempfile.mkdtemp(prefix="gee_tif_mb_roundtrip_")
    try:
        write_geotiffs_multiband(
            px, root, MULTIBAND_RASTER_PARAMS["cell"],
            compress="deflate", tile=16,
        ).collect()
        back = read_rasters(spark, os.path.join(root, "*.tif"))
        out = (
            back.select(
                F.regexp_extract(
                    "path", r"([0-9-]+)\.tif$", 1
                ).alias("date"),
                "band",
                "x",
                "y",
                "lon",
                "lat",
                "value",
            )
            .groupBy("date", "band")
            .agg(
                F.count(F.lit(1)).alias("n_px"),
                F.count("value").alias("n_obs"),
                F.round(stable_sum(F.col("value")), 6).alias("sum_v"),
                (F.max("x") + 1).alias("w"),
                (F.max("y") + 1).alias("h"),
                F.round(F.min("lon"), 9).alias("min_lon"),
                F.round(F.max("lat"), 9).alias("max_lat"),
            )
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


register(
    Query(
        name="geotiff_multiband_roundtrip",
        spark=_geotiff_multiband_roundtrip,
        oracle=f"""
            SELECT regexp_extract(file, '([0-9-]+)\\.tif$', 1) AS date,
                   band,
                   count(*) AS n_px,
                   count(value) AS n_obs,
                   round({sql_stable_sum('value')}, 6) AS sum_v,
                   max(x) + 1 AS w,
                   max(y) + 1 AS h,
                   round(min(lon), 9) AS min_lon,
                   round(max(lat), 9) AS max_lat
            FROM read_parquet('{_multiband_fixture_path()}')
            GROUP BY 1, 2
        """,
        tags=("sink", "format", "geotiff", "multiband"),
    )
)


# ----------------------------------------------- raw-SQL entry surface

# The engine's SQL front door: exactly this text runs on BOTH engines
# (spark.sql over registered views, DuckDB over the same parquet) — the
# ANSI-portable subset with the repo's decimal-stable sum convention.
SQL_SURFACE_REPORT = """
    SELECT l_returnflag,
           month(l_shipdate) AS ship_month,
           count(*) AS n_lines,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(30,6))) AS DOUBLE), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2001-01-01'
    GROUP BY l_returnflag, month(l_shipdate)
"""


def _sql_surface_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw-SQL API surface: users can point ``spark.sql`` at the
    registered table views and run ANSI SQL — the identical text the
    oracle runs. Proves the SQL front door (not just the DataFrame DSL)
    honors the determinism contract."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(SQL_SURFACE_REPORT)


register(
    Query(
        name="sql_surface_report",
        spark=_sql_surface_report,
        oracle=SQL_SURFACE_REPORT,
        tags=("sql-api",),
    )
)


# ------------------------------------------- key-skew diagnostics


def _key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic — the profile to run BEFORE keying a
    100 TB join/agg on a column: per-key cardinalities reduced to the
    deciding stats (hottest key, p50/p99 per-key counts, max/mean skew
    ratio). Two partial-aggregated passes: fact → per-key counts
    (|keys| rows), then counts → one stats row; the fact table is never
    sorted, and the percentile runs over |keys|, not |rows|."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    pct = F.percentile("cnt", F.array(F.lit(0.5), F.lit(0.99)))
    # Deterministic argmax: max over (count, -key) structs — ties break
    # to the smallest key, in one aggregate pass (the Q2 argmin trick).
    hottest = F.max(F.struct(F.col("cnt"), (-F.col("l_partkey")).alias("nk")))
    return counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_count"),
        (-hottest["nk"]).alias("hottest_key"),
        F.round(F.get(pct, 0), 6).alias("p50_count"),
        F.round(F.get(pct, 1), 6).alias("p99_count"),
        F.round(
            F.max("cnt")
            / (F.sum("cnt") / F.count(F.lit(1))),
            6,
        ).alias("skew_ratio"),
    )


register(
    Query(
        name="key_skew_profile",
        spark=_key_skew_profile,
        oracle="""
            WITH counts AS (
                SELECT l_partkey, count(*) AS cnt
                FROM lineitem GROUP BY 1
            )
            SELECT count(*) AS n_keys,
                   max(cnt) AS max_count,
                   -(max({'cnt': cnt, 'nk': -l_partkey}).nk) AS hottest_key,
                   round(quantile_cont(cnt, 0.5), 6) AS p50_count,
                   round(quantile_cont(cnt, 0.99), 6) AS p99_count,
                   round(max(cnt) / (sum(cnt) / count(*)), 6) AS skew_ratio
            FROM counts
        """,
        tags=("diagnostics", "skew"),
    )
)


# --------------------------------------------- data-contract audit


def _contract_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate: declared row-level contracts evaluated in ONE
    scan as conditional counts (violations never materialize as rows —
    at 100 TB you page the on-call with counts, not a copy of the bad
    partition). The unpivoted (contract, violations, checked) layout
    feeds freshness dashboards and CI assertions alike."""
    li = load_table(spark, sf_dir, "lineitem")
    contracts = {
        "quantity_in_range": F.col("l_quantity").between(1, 50),
        "price_positive": F.col("l_extendedprice") > 0,
        "discount_unit_interval": F.col("l_discount").between(0, 1),
        "returnflag_domain": F.col("l_returnflag").isin("A", "N", "R"),
        "shipdate_not_null": F.col("l_shipdate").isNotNull(),
    }
    # coalesce: on an empty fact each violation sum is NULL — DuckDB's
    # UNPIVOT silently drops NULL cells (0 rows) while stack() keeps
    # them, and an audit should report ZERO violations explicitly
    # anyway (caught by the empty-input sweep)
    agg = li.agg(
        F.count(F.lit(1)).alias("checked"),
        *[
            F.coalesce(
                F.sum(F.when(~cond | cond.isNull(), 1).otherwise(0)),
                F.lit(0),
            ).alias(name)
            for name, cond in contracts.items()
        ],
    )
    names = list(contracts)
    stack = ", ".join(f"'{n}', {n}" for n in names)
    return agg.selectExpr(
        "checked",
        f"stack({len(names)}, {stack}) AS (contract, violations)",
    ).select("contract", "violations", "checked")


register(
    Query(
        name="contract_audit",
        spark=_contract_audit,
        oracle="""
            WITH agg AS (
                SELECT count(*) AS checked,
                       coalesce(sum(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50)
                                  OR l_quantity IS NULL
                                THEN 1 ELSE 0 END), 0) AS quantity_in_range,
                       coalesce(sum(CASE WHEN NOT (l_extendedprice > 0)
                                  OR l_extendedprice IS NULL
                                THEN 1 ELSE 0 END), 0) AS price_positive,
                       coalesce(sum(CASE WHEN NOT (l_discount BETWEEN 0 AND 1)
                                  OR l_discount IS NULL
                                THEN 1 ELSE 0 END), 0) AS discount_unit_interval,
                       coalesce(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                                  OR l_returnflag IS NULL
                                THEN 1 ELSE 0 END), 0) AS returnflag_domain,
                       coalesce(sum(CASE WHEN l_shipdate IS NULL
                                THEN 1 ELSE 0 END), 0) AS shipdate_not_null
                FROM lineitem
            )
            SELECT contract, CAST(violations AS BIGINT) AS violations,
                   checked
            FROM agg
            UNPIVOT (violations FOR contract IN (
                quantity_in_range, price_positive, discount_unit_interval,
                returnflag_domain, shipdate_not_null
            ))
        """,
        tags=("diagnostics", "data-quality"),
    )
)


# -------------------------------------------- small-file compaction


_COMPACT_TARGET = 2048  # target bytes per output file (scaled to testdata)


def _compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner (the bin-pack maintenance job an
    Iceberg/Delta table runs): within each partition (``source``),
    files are walked in a deterministic order (doc_id stands in for
    file path) and grouped greedily by cumulative size — a new output
    bin starts whenever the running total crosses the target. The plan
    reports, per (partition, bin): file count, total bytes, and fill
    ratio vs target.

    The assignment is one window running-sum per partition (sort on
    the partition's file listing — metadata-sized, NOT data-sized: a
    100 TB table's file inventory is maybe 10^6 rows) followed by a
    hash-agg. The planner never touches data bytes; executing the plan
    is then an ordinary partitioned rewrite keyed by bin.

    bin = floor(cum_before / target) is the streaming form of greedy
    first-fit on a sorted listing — the same policy Iceberg's
    binpack rewrite uses per file-group."""
    from pyspark.sql import Window

    from ..functions.stable import sql_stable_round, stable_round  # noqa: F401

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.col("n_chars").alias("bytes")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = docs.select(
        "source",
        "bytes",
        F.floor(
            F.coalesce(F.sum("bytes").over(w), F.lit(0))
            / F.lit(float(_COMPACT_TARGET))
        ).alias("bin_id"),
    )
    fill = F.col("bin_bytes").cast("double") / F.lit(
        float(_COMPACT_TARGET)
    )
    return (
        planned.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("bytes").alias("bin_bytes"),
        )
        .select(
            "source",
            "bin_id",
            "n_files",
            "bin_bytes",
            stable_round(fill, 6).alias("fill_ratio"),
        )
    )


register(
    Query(
        name="compaction_plan",
        spark=_compaction_plan,
        oracle=f"""
            WITH planned AS (
                SELECT source, n_chars AS bytes,
                       CAST(floor(
                           coalesce(sum(n_chars) OVER (
                               PARTITION BY source ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING), 0)
                           / {float(_COMPACT_TARGET)!r}) AS BIGINT)
                           AS bin_id
                FROM documents
            )
            SELECT source, bin_id, count(*) AS n_files,
                   CAST(sum(bytes) AS BIGINT) AS bin_bytes,
                   floor((CAST(sum(bytes) AS DOUBLE)
                          / {float(_COMPACT_TARGET)!r})
                         * 1000000.0 + 0.5) / 1000000.0 AS fill_ratio
            FROM planned GROUP BY 1, 2
        """,
        tags=("maintenance", "compaction"),
        doc="greedy cumulative bin-pack over the per-partition file "
        "listing; metadata-sized window + hash-agg, no data movement",
    )
)


# ---------------------------------------------------- snapshot diff


# Cutoffs chosen so all three diff classes are populated at the gate
# scale (added/changed/unchanged at sf0.01).
_SNAP_OLD = "1996-01-01"
_SNAP_NEW = "1998-01-01"


def _snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-state diff between two snapshots (the nightly "what
    changed since yesterday's run" audit): per-part shipped state as of
    cutoff D1 vs cutoff D2, classified added / changed / unchanged,
    with the net quantity delta per class.

    The scale-critical choice: because snapshot OLD is a prefix of
    snapshot NEW (append-only facts), BOTH states fold out of ONE fact
    scan with conditional aggregates — no self-join, no second scan,
    one shuffle on the part key, then a group-sized rollup to the
    3-row report. A diff between two independent stores would instead
    full-outer-join the two per-key state tables (same key shuffle);
    the conditional-agg form is what an engine should plan when one
    side is a filtered superset of the other."""
    li = load_table(spark, sf_dir, "lineitem")
    in_old = F.col("l_shipdate") < F.lit(_SNAP_OLD).cast("timestamp")
    in_new = F.col("l_shipdate") < F.lit(_SNAP_NEW).cast("timestamp")
    dec = "decimal(30,6)"
    per_part = (
        li.filter(in_new)
        .groupBy("l_partkey")
        .agg(
            F.count(F.when(in_old, F.lit(1))).alias("n_old"),
            F.count(F.lit(1)).alias("n_new"),
            F.coalesce(
                F.sum(F.when(in_old, F.col("l_quantity").cast(dec))),
                F.lit(0).cast(dec),
            ).alias("qty_old"),
            F.sum(F.col("l_quantity").cast(dec)).alias("qty_new"),
        )
    )
    status = (
        F.when(F.col("n_old") == 0, F.lit("added"))
        .when(
            (F.col("n_new") == F.col("n_old"))
            & (F.col("qty_new") == F.col("qty_old")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
    )
    return (
        per_part.select(
            status.alias("status"),
            (F.col("qty_new") - F.col("qty_old")).alias("qty_delta"),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            stable_round(F.sum("qty_delta").cast("double"), 2).alias(
                "qty_delta"
            ),
        )
    )


register(
    Query(
        name="snapshot_diff",
        spark=_snapshot_diff,
        oracle=f"""
            WITH per_part AS (
                SELECT l_partkey,
                       count(CASE WHEN l_shipdate
                                       < TIMESTAMP '{_SNAP_OLD}'
                                  THEN 1 END) AS n_old,
                       count(*) AS n_new,
                       coalesce(sum(CASE WHEN l_shipdate
                                              < TIMESTAMP '{_SNAP_OLD}'
                                         THEN CAST(l_quantity
                                                   AS DECIMAL(30,6))
                                    END), 0) AS qty_old,
                       sum(CAST(l_quantity AS DECIMAL(30,6))) AS qty_new
                FROM lineitem
                WHERE l_shipdate < TIMESTAMP '{_SNAP_NEW}'
                GROUP BY 1
            )
            SELECT CASE WHEN n_old = 0 THEN 'added'
                        WHEN n_new = n_old AND qty_new = qty_old
                             THEN 'unchanged'
                        ELSE 'changed' END AS status,
                   count(*) AS n_parts,
                   floor(CAST(sum(qty_new - qty_old) AS DOUBLE)
                         * 100.0 + 0.5) / 100.0
                       AS qty_delta
            FROM per_part GROUP BY 1
        """,
        tags=("maintenance", "snapshot-diff", "conditional-agg"),
        doc="two-snapshot state diff folded from one fact scan via "
        "conditional aggregates (append-only prefix optimization)",
    )
)


# ------------------------------------------------- Benford screen


def _benford_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over order totals — the classic
    fabricated-data / ingestion-corruption smell test: natural
    multi-scale positive amounts follow P(d) = log10(1 + 1/d); a
    uniform or hand-keyed column does not. Reports, per leading digit,
    the observed share, the Benford expectation, and the χ² term;
    plus each row carries the total χ² statistic (8 dof) so the
    report is self-contained.

    One fact scan into a 9-row histogram (map-side combinable), then
    literal math — the cheapest useful audit in the catalog. The
    synthetic o_totalprice is NOT Benford-distributed (bounded uniform
    pricing), which the χ² makes loudly visible: the screen flags, as
    it should; the gate checks the numbers, not the verdict."""
    import math as _math

    orders = load_table(spark, sf_dir, "orders")
    d = F.substring(
        F.abs(F.col("o_totalprice")).cast("decimal(30,6)").cast("string"),
        1,
        1,
    ).cast("int")
    hist = (
        orders.filter(F.col("o_totalprice") > 0)
        .select(d.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
        # The 9-row histogram feeds THREE consumers (tot, the exp_df
        # join, and via `terms` the chi² total) — lazily each re-ran
        # the whole orders scan+aggregate (4 scans in the r10 before-
        # plan). Materializing 9 rows collapses that to ONE fact pass
        # (guide §2.4: remove repeated subtrees); on a 100 TB fact
        # table the re-scan is the whole query cost.
        .localCheckpoint(eager=True)
    )
    tot = hist.agg(F.sum("n").alias("n_tot"))
    # exact literal expectations, identical text in the oracle
    exp_arr = [
        (i, _math.log10(1.0 + 1.0 / i)) for i in range(1, 10)
    ]
    exp_df = spark.createDataFrame(exp_arr, "digit int, p_exp double")
    j = (
        exp_df.join(hist, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).alias("n"),
            "p_exp",
            "n_tot",
        )
    )
    p_obs = F.col("n").cast("double") / F.col("n_tot").cast("double")
    chi_term = (
        (F.col("n").cast("double") - F.col("p_exp") * F.col("n_tot"))
        * (F.col("n").cast("double") - F.col("p_exp") * F.col("n_tot"))
        / (F.col("p_exp") * F.col("n_tot").cast("double"))
    )
    dec = "decimal(38,12)"
    terms = j.select(
        "digit",
        "n",
        p_obs.alias("p_obs_raw"),
        "p_exp",
        chi_term.cast(dec).alias("chi_raw"),
    )
    total_chi = terms.agg(
        F.sum("chi_raw").cast("double").alias("chi2_total_raw")
    )
    from ..functions.stable import stable_round

    return (
        terms.crossJoin(F.broadcast(total_chi))
        .select(
            "digit",
            "n",
            stable_round(F.col("p_obs_raw"), 6).alias("p_obs"),
            stable_round(F.col("p_exp"), 6).alias("p_exp"),
            stable_round(F.col("chi_raw").cast("double"), 4).alias(
                "chi2_term"
            ),
            stable_round(F.col("chi2_total_raw"), 4).alias("chi2_total"),
        )
    )


_BENFORD_EXPECT_SQL = " UNION ALL ".join(
    f"SELECT {i} AS digit, log10(1.0 + 1.0 / {i}) AS p_exp"
    for i in range(1, 10)
)


register(
    Query(
        name="benford_screen",
        spark=_benford_screen,
        oracle=f"""
            WITH hist AS (
                SELECT CAST(substr(CAST(CAST(abs(o_totalprice)
                                AS DECIMAL(30,6)) AS VARCHAR), 1, 1)
                            AS INT) AS digit,
                       count(*) AS n
                FROM orders WHERE o_totalprice > 0
                GROUP BY 1
            ),
            tot AS (SELECT sum(n) AS n_tot FROM hist),
            expd AS ({_BENFORD_EXPECT_SQL}),
            terms AS (
                SELECT e.digit, coalesce(h.n, 0) AS n, e.p_exp,
                       CAST(n_tot AS DOUBLE) AS n_tot,
                       CAST((coalesce(h.n, 0) - e.p_exp * n_tot)
                            * (coalesce(h.n, 0) - e.p_exp * n_tot)
                            / (e.p_exp * CAST(n_tot AS DOUBLE))
                            AS DECIMAL(38,12)) AS chi_raw
                FROM expd e LEFT JOIN hist h ON e.digit = h.digit, tot
            ),
            total AS (
                SELECT CAST(sum(chi_raw) AS DOUBLE) AS chi2_total_raw
                FROM terms
            )
            SELECT digit, n,
                   floor((CAST(n AS DOUBLE) / n_tot) * 1000000.0 + 0.5)
                       / 1000000.0 AS p_obs,
                   floor(p_exp * 1000000.0 + 0.5) / 1000000.0 AS p_exp,
                   floor(CAST(chi_raw AS DOUBLE) * 10000.0 + 0.5)
                       / 10000.0 AS chi2_term,
                   floor(chi2_total_raw * 10000.0 + 0.5) / 10000.0
                       AS chi2_total
            FROM terms, total
        """,
        tags=("diagnostics", "data-quality", "benford"),
        doc="first-digit Benford screen with per-digit chi-square terms; "
        "one scan to a 9-row histogram",
    )
)


# --------------------------------------- storage-format interop (XML)


def _xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format-interop gate #2: day-1 events written to XML (Spark 4's
    built-in XML source), read back with an explicit schema, and
    aggregated — the result must equal the same aggregate computed
    straight from the parquet original (the oracle's view of the world;
    DuckDB has no XML reader, so the roundtrip itself is under test).

    XML is the text-format stressor the columnar gate (ORC) can't
    provide: doubles survive only because the writer emits
    shortest-roundtrip decimal strings, and timestamps are carried as
    explicit formatted strings (written via date_format, parsed back
    with to_timestamp) so no timezone/precision inference is involved.
    Ingest-side XML is row-per-record and splittable by rowTag at
    scale; it is a source/interchange format here, never storage."""
    import shutil
    import tempfile

    ev = load_table(spark, sf_dir, "events")
    first_day = ev.agg(F.min(F.to_date("ts")).alias("d")).first()["d"]
    day = ev.filter(F.to_date("ts") == F.lit(first_day)).select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        "user_id",
        "event_type",
        "value",
    )
    root = tempfile.mkdtemp(prefix="gee_xml_roundtrip_")
    try:
        path = f"{root}/events_day1.xml"
        (
            day.write.mode("overwrite")
            .format("xml")
            .option("rowTag", "event")
            .save(path)
        )
        back = spark.read.format("xml").option("rowTag", "event").schema(
            "event_id long, ts_s string, user_id long, "
            "event_type string, value double"
        ).load(path)
        out = (
            back.select(
                "*", F.to_timestamp("ts_s").alias("ts")
            )
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.countDistinct("user_id").alias("n_users"),
                F.round(
                    F.sum(F.col("value").cast("decimal(30,6)")).cast(
                        "double"
                    ),
                    6,
                ).alias("sum_value"),
                F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
                .alias("last_ts"),
            )
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


register(
    Query(
        name="xml_roundtrip",
        spark=_xml_roundtrip,
        oracle="""
            SELECT event_type, count(*) AS n_events,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                   round(CAST(sum(CAST(value AS DECIMAL(30,6)))
                              AS DOUBLE), 6) AS sum_value,
                   strftime(CAST(max(ts) AS TIMESTAMP),
                            '%Y-%m-%d %H:%M:%S.%f') AS last_ts
            FROM events
            WHERE CAST(ts AS DATE) = (
                SELECT min(CAST(ts AS DATE)) FROM events
            )
            GROUP BY 1
        """,
        tags=("maintenance", "interop", "xml"),
        doc="text-format roundtrip gate: day-1 events through Spark 4 "
        "native XML == the parquet original (oracle's view)",
    )
)


# -------------------- KMV bottom-k sketch: distinct & overlap estimates


_KMV_K = 16
_KMV_SCALE = float(1 << 60)  # 15 hex digits -> h/2^60 uniform in [0,1)

_SQL_TEXT_HASH = " + ".join(
    "(strpos('0123456789abcdef', "
    f"substr(md5(coalesce(text, '')), {i + 1}, 1)) - 1) "
    f"* {16 ** (_HASH_HEX_CHARS - 1 - i)}"
    for i in range(_HASH_HEX_CHARS)
)


def _kmv_estimate(cnt: F.Column, hk: F.Column) -> F.Column:
    """(K-1)/h_K distinct estimate; exact count when the sketch never
    filled (cnt < K, i.e. the group has fewer distinct members than K)."""
    return F.when(cnt < _KMV_K, cnt.cast("double")).otherwise(
        F.lit(float(_KMV_K - 1)) / (hk.cast("double") / F.lit(_KMV_SCALE))
    )


def _sql_kmv_estimate(cnt: str, hk: str) -> str:
    return (
        f"CASE WHEN {cnt} < {_KMV_K} THEN CAST({cnt} AS DOUBLE) "
        f"ELSE {float(_KMV_K - 1)!r} / (CAST({hk} AS DOUBLE) / "
        f"{_KMV_SCALE!r}) END"
    )


def _kmv_distinct_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KMV (bottom-k, k-minimum-values) content sketches, and
    pairwise cross-source distinct/overlap/Jaccard estimates from sketch
    unions (Beyer et al., SIGMOD 2007 "On synopses for distinct-value
    estimation under multiset operations").

    The 100 TB story: the ONLY corpus-sized work is a distinct on
    (source, content-hash) followed by a per-source bottom-k — a
    map-side-combinable rank-k selection (each task keeps its local
    bottom-k, the merge keeps the bottom-k of bottom-ks; Spark's
    window row_number after partial distinct is the declared form and
    AQE sizes the source-keyed exchange). Everything downstream runs on
    |sources| x K rows: sketches are unioned pairwise (the KMV union =
    bottom-k of the merged hash sets), |A∩B| follows by inclusion-
    exclusion, and the estimates ship as a sources^2-sized summary —
    the cross-crawl overlap audit a curation pipeline runs before
    mixing sources, without ever joining fact data against fact data.

    Cross-engine: the 60-bit md5 content hash is exact in both engines
    (the ``corpus_checksum`` precedent); estimates are single-division
    doubles over identical integers."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    h = F.conv(
        F.substring(F.md5(F.coalesce(F.col("text"), F.lit(""))), 1,
                    _HASH_HEX_CHARS),
        16, 10,
    ).cast("long")
    hset = docs.select("source", h.alias("h")).distinct()
    w = Window.partitionBy("source").orderBy("h")
    sk = (
        hset.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_K)
        .select("source", "h")
        # The sketch table is |sources|×K rows, but its subtree is the
        # corpus-sized md5+distinct+bottom-k — and it feeds three
        # consumers (per-source estimates, and BOTH sides of the
        # pairwise union). Lazily that ran the corpus pass three times
        # (8 documents scans in the r10 before-plan); materializing
        # the tiny sketch runs it once (guide §2.4). This is also the
        # 100 TB layout: sketches persist, fact data is read once.
        .localCheckpoint(eager=True)
    )
    per = sk.groupBy("source").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("h").alias("hk")
    )
    est = per.select(
        "source", _kmv_estimate(F.col("cnt"), F.col("hk")).alias("est")
    )
    # |sources|-row summary self-pairing (a < b): tiny BNLJ, never fact.
    a = est.select(
        F.col("source").alias("source_a"), F.col("est").alias("est_a")
    )
    b = est.select(
        F.col("source").alias("source_b"), F.col("est").alias("est_b")
    )
    pairs = a.join(b, F.col("source_a") < F.col("source_b"))
    ha = pairs.select("source_a", "source_b").join(
        sk, sk.source == F.col("source_a")
    ).select("source_a", "source_b", "h")
    hb = pairs.select("source_a", "source_b").join(
        sk, sk.source == F.col("source_b")
    ).select("source_a", "source_b", "h")
    hu = ha.unionByName(hb).distinct()
    wu = Window.partitionBy("source_a", "source_b").orderBy("h")
    sku = (
        hu.withColumn("rn", F.row_number().over(wu))
        .filter(F.col("rn") <= _KMV_K)
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("cntu"), F.max("h").alias("hku"))
    )
    joined = (
        sku.join(pairs, ["source_a", "source_b"])
        .withColumn(
            "est_union", _kmv_estimate(F.col("cntu"), F.col("hku"))
        )
    )
    inter = F.col("est_a") + F.col("est_b") - F.col("est_union")
    inter = F.when(inter < 0, F.lit(0.0)).otherwise(inter)
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return joined.select(
        "source_a",
        "source_b",
        r6(F.col("est_a")).alias("est_a"),
        r6(F.col("est_b")).alias("est_b"),
        r6(F.col("est_union")).alias("est_union"),
        r6(inter).alias("est_intersect"),
        r6(inter / F.col("est_union")).alias("est_jaccard"),
    )


_SQL_KMV_R6 = "floor(({0}) * 1000000.0 + 0.5) / 1000000.0"

register(
    Query(
        name="kmv_distinct_overlap",
        spark=_kmv_distinct_overlap,
        oracle=f"""
            WITH hset AS (
                SELECT DISTINCT source,
                       CAST({_SQL_TEXT_HASH} AS BIGINT) AS h
                FROM documents
            ),
            sk AS (
                SELECT source, h FROM (
                    SELECT source, h, row_number() OVER (
                        PARTITION BY source ORDER BY h) AS rn
                    FROM hset
                ) WHERE rn <= {_KMV_K}
            ),
            per AS (
                SELECT source, count(*) AS cnt, max(h) AS hk
                FROM sk GROUP BY 1
            ),
            est AS (
                SELECT source,
                       {_sql_kmv_estimate('cnt', 'hk')} AS est
                FROM per
            ),
            pairs AS (
                SELECT a.source AS source_a, a.est AS est_a,
                       b.source AS source_b, b.est AS est_b
                FROM est a JOIN est b ON a.source < b.source
            ),
            hu AS (
                SELECT DISTINCT source_a, source_b, h FROM (
                    SELECT p.source_a, p.source_b, s.h
                    FROM pairs p JOIN sk s ON s.source = p.source_a
                    UNION ALL
                    SELECT p.source_a, p.source_b, s.h
                    FROM pairs p JOIN sk s ON s.source = p.source_b
                )
            ),
            sku AS (
                SELECT source_a, source_b,
                       count(*) AS cntu, max(h) AS hku
                FROM (
                    SELECT source_a, source_b, h, row_number() OVER (
                        PARTITION BY source_a, source_b
                        ORDER BY h) AS rn
                    FROM hu
                ) WHERE rn <= {_KMV_K}
                GROUP BY 1, 2
            ),
            fin AS (
                SELECT p.source_a, p.source_b, p.est_a, p.est_b,
                       {_sql_kmv_estimate('u.cntu', 'u.hku')} AS est_union
                FROM sku u
                JOIN pairs p ON u.source_a = p.source_a
                            AND u.source_b = p.source_b
            ),
            clamped AS (
                SELECT source_a, source_b, est_a, est_b, est_union,
                       CASE WHEN est_a + est_b - est_union < 0
                            THEN 0.0
                            ELSE est_a + est_b - est_union
                       END AS est_intersect
                FROM fin
            )
            SELECT source_a, source_b,
                   {_SQL_KMV_R6.format('est_a')} AS est_a,
                   {_SQL_KMV_R6.format('est_b')} AS est_b,
                   {_SQL_KMV_R6.format('est_union')} AS est_union,
                   {_SQL_KMV_R6.format('est_intersect')} AS est_intersect,
                   {_SQL_KMV_R6.format('est_intersect / est_union')}
                       AS est_jaccard
            FROM clamped
        """,
        tags=("sketch", "dedup", "llm-pipeline"),
        doc="per-source KMV bottom-k sketches with pairwise union / "
        "intersection / Jaccard estimates (Beyer et al. 2007); the only "
        "corpus-sized stage is a distinct + per-source bottom-k",
    )
)


# --------------------------------------------- skew-salted shuffles


def _skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key join via ``operators.skew.salted_join``: events keyed on
    ``event_type`` (deliberately low-cardinality — a handful of types
    over millions of rows, so an unsalted shuffle join sends each
    type's entire row set to ONE reducer) joined to a per-type weight
    dimension. The salt fans every type across 8 shuffle keys; the
    dimension replicates 8×; the result is bit-identical to the plain
    join — which is exactly what the oracle computes, so the gate IS
    the semantics proof.

    At 100 TB: use when the dimension exceeds the broadcast threshold
    AND the fact key is hot — AQE's skew-join only re-splits sort-merge
    partitions and cannot help a final single-reducer merge on a
    low-cardinality key. Cost: the dimension shuffles n_salts× its
    (small) size; the fact still shuffles once. Plan shape pinned in
    tests/test_skew.py (join keys = type + salt, explode on the dim
    side only, no cartesian)."""
    from ..operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn("type_weight", F.length("event_type"))
    )
    joined = salted_join(
        ev, dim, on=["event_type"], salt_src=["event_id"], n_salts=8
    )
    return joined.groupBy("event_type", "type_weight").agg(
        F.count(F.lit(1)).alias("n_events"),
        stable_sum(F.col("value") * F.col("type_weight"), 4).alias(
            "weighted_value"
        ),
    )


register(
    Query(
        name="skew_salted_join",
        spark=_skew_salted_join,
        oracle=f"""
            WITH dim AS (
                SELECT DISTINCT event_type,
                       length(event_type) AS type_weight
                FROM events
            )
            SELECT e.event_type,
                   d.type_weight,
                   count(*) AS n_events,
                   {sql_stable_sum('e.value * d.type_weight', 4)}
                       AS weighted_value
            FROM events e
            JOIN dim d USING (event_type)
            GROUP BY 1, 2
        """,
        tags=("skew", "join", "scale"),
        doc="skew-salted fact⋈dim equi-join (deterministic xxhash64 salt, "
        "8-way dim replication) proven bit-identical to the unsalted join "
        "by the oracle itself",
    )
)


def _skew_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type distinct-user counts via
    ``operators.skew.salted_count_distinct``: the distinct set of the
    hot key is split into 32 DISJOINT subsets by ``hash(user_id)``
    (a value always lands in the same salt, so partial distinct counts
    add exactly), then summed — no task ever holds more than
    |users|/32 of any key's state. The unsalted
    ``count(DISTINCT user_id)`` is the oracle, so the gate proves the
    decomposition exact. ``n_events`` rides a separate algebraic
    aggregate (skew-immune already: partial counts combine map-side)
    and joins back on the dimension-sized type table."""
    from ..operators.skew import salted_count_distinct

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id"
    )
    distincts = salted_count_distinct(
        ev, ["event_type"], "user_id", n_salts=32, out="n_distinct_users"
    )
    counts = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return distincts.join(counts, "event_type")


register(
    Query(
        name="skew_salted_distinct",
        spark=_skew_salted_distinct,
        oracle="""
            SELECT event_type,
                   count(DISTINCT user_id) AS n_distinct_users,
                   count(*) AS n_events
            FROM events
            GROUP BY 1
        """,
        tags=("skew", "aggregation", "scale"),
        doc="skew-proof exact count-distinct: salt by hash(value) into "
        "32 disjoint partial distinct sets, sum the partials; oracle is "
        "the plain COUNT(DISTINCT)",
    )
)


# ------------------------------------------- r9: Zipf-keyed skew A/B

# The salted operators above are oracle-gated for CORRECTNESS; this
# pair measures the REASON THEY EXIST. Synthetic Zipf workload: a
# cheap, DuckDB-mirrorable linear-congruential hash routes 60% of an
# inflated lineitem fact onto ONE key (the rest spread over 997), the
# fact is enriched against a per-key weight dimension via a
# shuffle-hash join (the hint models a dimension past the broadcast
# threshold — at 100 TB per-key reference tables are fact-derived and
# big), and every joined row then pays a REAL per-row cost: a 60-bit
# md5 audit fingerprint over the enriched attributes (the
# corpus_checksum idiom, post-enrichment). That per-row work runs in
# the reduce stage, cannot be pushed below the join, and cannot be
# partial-aggregated away — so in the plain plan the hot key's entire
# row set fingerprints on ONE task. AQE's skew-join split does not
# rescue it at this shape: the hot partition is far under
# skewedPartitionThresholdInBytes (256 MB) because the pathology is
# CPU-per-row, not bytes. salted_join fans the hot key across 32
# shuffle keys, so the same fingerprint work spreads over every core.
#
# Measured at sf0.1 on local[32] (min of 3, warmed session):
# plain 3.29 s vs salted 1.84 s (1.8x) — bounded below by total
# CPU/32, while the plain side is bounded by the hot key's rows on
# one thread; the gap widens with the hot share and with cluster
# size. Experiment + earlier null results (AQE DOES rescue the
# byte-heavy join at REP=32, and Spark's two-phase distinct rewrite
# already spreads count_distinct by (key, value)) recorded in
# SCALE.md "skew" section.

_ZIPF_REP = 4          # fact inflation factor
_ZIPF_MOD = 1000003    # prime modulus of the LCG key hash
_ZIPF_HOT = 600000     # h below this => the hot key (60%)
_ZIPF_KEYS = 997       # cold keys 1.._ZIPF_KEYS
_ZIPF_DIM = 998        # dimension rows (hot key 0 + cold keys)


def _zipf_fact_dim(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(fact, dim) of the Zipf A/B: key synthesis is integer-only LCG
    mixing (no md5 in the HOT PATH DENOMINATOR — key-gen must be cheap
    so the measured contrast is the join+fingerprint placement, not
    hash synthesis; products stay < 2^63 for sf <= 10's orderkey
    range, so ANSI mode never overflows)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    rep = li.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(_ZIPF_REP - 1))).alias("rep"),
    )
    h = F.pmod(
        F.lit(2654435761) * (F.col("l_orderkey") * _ZIPF_REP + F.col("rep"))
        + F.lit(40503) * F.col("l_linenumber"),
        F.lit(_ZIPF_MOD),
    )
    zkey = F.when(h < _ZIPF_HOT, F.lit(0).cast("long")).otherwise(
        F.pmod(h, F.lit(_ZIPF_KEYS)) + 1
    )
    fact = rep.select(
        zkey.alias("zkey"), "l_orderkey", "l_linenumber", "rep"
    )
    dim = spark.range(0, _ZIPF_DIM).select(
        F.col("id").alias("zkey"), (F.col("id") % 97 + 1).alias("weight")
    )
    return fact, dim


def _zipf_checksum(joined: DataFrame) -> DataFrame:
    """Per-row 60-bit md5 audit fingerprint of the enriched row, summed
    per key through decimal(38,0) (a raw BIGINT sum of ~1e18 digests
    overflows under ANSI)."""
    dg = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", "zkey", "l_orderkey", "l_linenumber", "rep",
                    "weight",
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return (
        joined.withColumn("dg", dg)
        .groupBy("zkey")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            # terminal cast to string: a 23-digit decimal round-trips
            # pandas as float on the DuckDB side and loses digits; the
            # string form is exact in both engines
            F.sum(F.col("dg").cast("decimal(38,0)"))
            .cast("string")
            .alias("checksum"),
        )
    )


def _skew_zipf_enrich_plain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Control arm: plain shuffle-hash enrich + per-row fingerprint —
    the hot key's 60% of all rows fingerprint on one task."""
    fact, dim = _zipf_fact_dim(spark, sf_dir)
    return _zipf_checksum(fact.join(dim.hint("shuffle_hash"), "zkey"))


def _skew_zipf_enrich_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Treatment arm: operators.skew.salted_join fans the hot key over
    32 salts; identical output (same oracle), fingerprint work spread
    across every core."""
    from ..operators.skew import salted_join

    fact, dim = _zipf_fact_dim(spark, sf_dir)
    joined = salted_join(
        fact,
        dim.hint("shuffle_hash"),
        on=["zkey"],
        salt_src=["l_orderkey", "l_linenumber", "rep"],
        n_salts=32,
    )
    return _zipf_checksum(joined)


def _sql_h60_local(mh: str) -> str:
    """DuckDB mirror of conv(substring(md5,1,15),16,10) — the
    stats_queries._sql_h60 idiom, restated here so the maintenance
    oracles stay self-contained."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({mh}, {i + 1}, 1)) - 1)"
        f" * {16 ** (14 - i)}"
        for i in range(15)
    )


_ZIPF_ORACLE = f"""
    WITH fact AS (
        SELECT l_orderkey, l_linenumber, rep,
               (2654435761 * (l_orderkey * {_ZIPF_REP} + rep)
                + 40503 * l_linenumber) % {_ZIPF_MOD} AS h
        FROM lineitem,
             (SELECT unnest(generate_series(0, {_ZIPF_REP - 1})) AS rep)
    ),
    keyed AS (
        SELECT CASE WHEN h < {_ZIPF_HOT} THEN 0
                    ELSE (h % {_ZIPF_KEYS}) + 1 END AS zkey,
               l_orderkey, l_linenumber, rep
        FROM fact
    ),
    dim AS (
        SELECT g AS zkey, (g % 97) + 1 AS weight
        FROM (SELECT unnest(generate_series(0, {_ZIPF_DIM - 1})) AS g)
    )
    SELECT k.zkey,
           count(*) AS n_rows,
           CAST(sum(CAST({_sql_h60_local(
               "md5(concat_ws('|', k.zkey, k.l_orderkey, "
               "k.l_linenumber, k.rep, d.weight))"
           )} AS DECIMAL(38,0))) AS VARCHAR) AS checksum
    FROM keyed k JOIN dim d USING (zkey)
    GROUP BY 1
"""

register(
    Query(
        name="skew_zipf_enrich_plain",
        spark=_skew_zipf_enrich_plain,
        oracle=_ZIPF_ORACLE,
        tags=("skew", "join", "scale", "bench-ab"),
        doc="Zipf skew A/B control: plain shuffle-hash enrich + per-row "
        "md5 fingerprint (hot key serializes on one task)",
    )
)

register(
    Query(
        name="skew_zipf_enrich_salted",
        spark=_skew_zipf_enrich_salted,
        oracle=_ZIPF_ORACLE,
        tags=("skew", "join", "scale", "bench-ab"),
        doc="Zipf skew A/B treatment: salted_join spreads the hot key's "
        "fingerprint work across all cores; same oracle as the control",
    )
)
