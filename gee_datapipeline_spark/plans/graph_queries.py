"""Graph-analytics queries: weighted PageRank over the trade network.

Iterative algorithms are where a declarative engine must still behave
like one: each power-method step is a join + aggregate whose plan
Catalyst optimizes independently, and the iteration count is a Python
loop over DataFrames — no driver-side data, no RDDs. Cousin of
``operators.graph.connected_components`` (large-star/small-star), which
covers the unbounded-iteration case; PageRank here is the
fixed-iteration case, which makes it expressible in unrolled SQL CTEs —
so unlike most engines' graph extensions it carries a full value-hash
oracle.

Determinism: per-edge contributions are IEEE doubles (deterministic),
per-node sums go through DECIMAL(38,12), and each iteration's rank is
quantized to 12 dp with ``stable_round`` (floor-based half-up — pure
IEEE ops, immune to the string-vs-numeric round-tie divergence the
sf0.1 sweep caught) — so iteration k's input is bit-identical in both
engines and the fixpoint trajectory cannot diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.stable import sql_stable_round, stable_round
from .registry import Query, register

DAMPING = 0.85
ITERATIONS = 3
_DEC = "decimal(38,12)"


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier → customer edges weighted by traded revenue (2 dp).

    Node ids are BIGINT (supplier 2k, customer 2k+1): integer join keys
    hash and compare several times faster than string-typed ids and
    halve the shuffle payload — at 100 TB the edge list is the fact
    table, so key width is a first-order cost."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,6)"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            (F.col("l_suppkey") * 2).alias("src"),
            (F.col("o_custkey") * 2 + 1).alias("dst"),
        )
        # floor-form round: the decimal sum lands on 2-dp midpoints
        # (…9550 endings) routinely; engine round() splits engines there
        .agg(stable_round(F.sum(rev).cast("double"), 2).alias("weight"))
    )


def _pagerank_trade_network(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank, ITERATIONS power-method steps. Each step: one
    equi-join of the edge list with the current rank vector (both keyed
    on the node id — co-partitioned, AQE reuses the exchange) and one
    decimal-stable aggregate per destination. Dangling mass (customers
    have no out-edges) follows the simplified damping formula on both
    engines identically.

    Scale: the rank vector is |nodes| rows (≪ edges); at 100 TB the
    edge list is the fact table and each iteration is exactly one
    fact-sized shuffle — the same cost envelope as one big groupBy, ×k
    iterations. Checkpointing between iterations truncates lineage on a
    real cluster."""
    # The edge list is static across iterations — materialize it ONCE
    # (localCheckpoint truncates lineage), then derive the normalized
    # fractions and node set from the materialized table so no power
    # step ever re-runs the lineitem⋈orders build. On a cluster this is
    # persist(DISK_ONLY) of the edge table, the standard
    # iterative-graph layout.
    edges = _edges(spark, sf_dir).localCheckpoint(eager=True)
    out_w = edges.groupBy("src").agg(
        stable_round(
            F.sum(F.col("weight").cast(_DEC)).cast("double"), 2
        ).alias("out_weight")
    )
    # The normalized-fraction table appears once per power step in the
    # unrolled DAG — materialize it too, or every iteration re-runs the
    # out_w shuffle and the broadcast build (3× repeated work r3 paid).
    e = (
        edges.join(F.broadcast(out_w), "src")
        .select(
            "src",
            "dst",
            (F.col("weight") / F.col("out_weight")).alias("frac"),
        )
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # scalar: node-count, metadata-sized
    if n == 0:
        # empty graph → zero rank rows (the oracle's node CTE is empty
        # too); without the guard the Python-side 1/n teleport constant
        # raised before any plan was built (empty-input sweep)
        return nodes.select("node", F.lit(0.0).alias("rank"))
    base = (1.0 - DAMPING) / n
    # Join-strategy choice, made once from the measured node count: the
    # rank vector (and the per-destination mass table, both |V| rows)
    # broadcast while |V| fits an executor (a 10⁷-node vector is
    # ~160 MB) — then NO power step ever shuffles or sorts the edge
    # list; it streams from the checkpoint through a broadcast-hash
    # probe into a map-side partial aggregate. Beyond the threshold the
    # same code degrades to the shuffle join, the correct plan when the
    # rank vector itself is fact-sized. Arithmetic is unchanged either
    # way (decimal sums are order-independent), so the oracle hash
    # cannot move.
    small_v = n <= 10_000_000
    _b = F.broadcast if small_v else (lambda df: df)
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(ITERATIONS):
        rk = _b(ranks)
        contrib = (
            e.join(rk, e.src == rk.node)
            .groupBy("dst")
            .agg(
                F.sum((F.col("rank") * F.col("frac")).cast(_DEC)).alias(
                    "mass"
                )
            )
        )
        ranks = (
            nodes.join(_b(contrib), nodes.node == contrib.dst, "left_outer")
            .select(
                "node",
                stable_round(
                    F.lit(base)
                    + F.lit(DAMPING)
                    * F.coalesce(F.col("mass").cast("double"), F.lit(0.0)),
                    12,
                ).alias("rank"),
            )
        )
    return ranks.select("node", stable_round("rank", 10).alias("rank"))


def _pagerank_oracle() -> str:
    steps = []
    prev = "r0"
    # repr() of the Python-computed doubles so both engines start from
    # the identical IEEE constants (1.0 - 0.85 != exact-decimal 0.15).
    teleport = sql_stable_round(
        f"CAST({1.0 - DAMPING!r} AS DOUBLE) / (SELECT n FROM nn) "
        f"+ CAST({DAMPING!r} AS DOUBLE) "
        "* coalesce(CAST(m.mass AS DOUBLE), 0.0)",
        12,
    )
    for k in range(1, ITERATIONS + 1):
        steps.append(
            f"""r{k} AS (
                SELECT n.node,
                       {teleport} AS rank
                FROM nodes n LEFT OUTER JOIN (
                    SELECT e.dst,
                           sum(CAST(r.rank * e.frac AS DECIMAL(38,12)))
                               AS mass
                    FROM e JOIN {prev} r ON e.src = r.node
                    GROUP BY e.dst
                ) m ON n.node = m.dst
            )"""
        )
        prev = f"r{k}"
    steps_sql = ",\n            ".join(steps)
    return f"""
        WITH edges AS (
            SELECT l_suppkey * 2 AS src, o_custkey * 2 + 1 AS dst,
                   floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                       AS DECIMAL(30,6))) AS DOUBLE)
                         * 100.0 + 0.5) / 100.0
                       AS weight
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1, 2
        ),
        out_w AS (
            SELECT src,
                   floor(CAST(sum(CAST(weight AS DECIMAL(38,12)))
                              AS DOUBLE) * 100.0 + 0.5) / 100.0
                       AS out_weight
            FROM edges GROUP BY 1
        ),
        e AS (
            SELECT edges.src, dst, weight / out_weight AS frac
            FROM edges JOIN out_w ON edges.src = out_w.src
        ),
        nodes AS (
            SELECT src AS node FROM edges
            UNION
            SELECT dst FROM edges
        ),
        nn AS (SELECT count(*) AS n FROM nodes),
        r0 AS (
            SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank
            FROM nodes
        ),
        {steps_sql}
        SELECT node, {sql_stable_round('rank', 10)} AS rank FROM {prev}
    """


register(
    Query(
        name="pagerank_trade_network",
        spark=_pagerank_trade_network,
        oracle=_pagerank_oracle(),
        tags=("graph", "iterative"),
    )
)


# ------------------------------------------------------ triangle count


def _triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle count over the part co-purchase graph (parts
    appearing in the same order are adjacent; edges deduped, oriented
    a < b), via ADJACENCY INTERSECTION: per edge (a, b), triangles
    through it = |N⁺(a) ∩ N⁺(b)| over forward (out-)neighbor sets.
    Two int-keyed hash joins attach both sorted neighbor arrays to each
    edge row; the intersection size is a per-row column op and the
    global count one partial+final sum.

    This beats explicit wedge enumeration (edge ⋈ edge ⋈ edge) 2.5× at
    sf0.1 because the Σ_b deg⁺·deg⁻ wedge rows (49 M here) are never
    materialized or shuffled — only |E| rows carry arrays. Layout
    (3.7× over the self-join + distinct + groupBy form, 7.4 → 2.0 s
    warm at sf0.1): co-purchase pairs come from ONE groupBy per order
    (sorted part array → i<j combinations via a narrow
    transform/slice explode — the fact table is never self-joined),
    and the ADJACENCY table is built directly from the combos in the
    same shuffle that dedups them (``collect_set``); the deduped edge
    list is then a narrow explode OF the adjacency, so dedup +
    adjacency cost one exchange total instead of three. Adjacency is
    eagerly checkpointed (consumed four times). Forward-adjacency
    arrays are degree-bounded; at 100 TB the degree-ordered
    orientation (edges point toward the higher-degree endpoint) caps
    array length at O(√E) — same two joins, different orientation
    rule. The final single-row stats composition broadcasts 1-row
    aggregates (whitelisted tiny-side BNLJ)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    parts = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    combos = parts.select(
        F.explode(
            F.expr(
                """
                flatten(transform(ps, (x, i) ->
                    transform(slice(ps, i + 2, size(ps) - i - 1),
                              y -> struct(x AS a, y AS b))))
                """
            )
        ).alias("e")
    ).select("e.a", "e.b")
    adj = (
        # partition count derived from the session's core budget
        # (cluster: total executor cores) — was a hard-coded 32 that
        # matched only the local machine (guide §2: scale-adaptive
        # partitioning, not a constant tuned for one box). Explicit N
        # keeps AQE from coalescing the adjacency build down and
        # starving the two downstream join probes of parallelism
        # (measured: the keyless repartition("a") form coalesced and
        # ran 1.85 → 2.45 s at sf0.1).
        combos.repartition(spark.sparkContext.defaultParallelism, "a")
        .groupBy("a")
        .agg(F.sort_array(F.collect_set("b")).alias("nbrs"))
        .localCheckpoint()
    )
    pairs = adj.select("a", F.explode("nbrs").alias("b"))
    n_tri = (
        pairs.alias("e")
        .join(adj.alias("na"), F.col("e.a") == F.col("na.a"))
        .join(adj.alias("nb"), F.col("e.b") == F.col("nb.a"))
        .select(
            F.size(
                F.array_intersect(F.col("na.nbrs"), F.col("nb.nbrs"))
            ).alias("k")
        )
        # coalesce: an edgeless graph (no order holds two distinct
        # parts) makes both sums aggregate zero rows — NULL in Spark,
        # while the oracle's count(*) forms yield 0 (caught by the
        # star-schema differential fuzz).
        .agg(
            F.coalesce(F.sum("k"), F.lit(0)).cast("long").alias(
                "n_triangles"
            )
        )
    )
    n_edge = adj.agg(
        F.coalesce(F.sum(F.size("nbrs")), F.lit(0))
        .cast("long")
        .alias("n_edges")
    )
    n_node = pairs.select(
        F.explode(F.array("a", "b")).alias("n")
    ).agg(F.count_distinct("n").alias("n_nodes"))
    return n_tri.crossJoin(F.broadcast(n_edge)).crossJoin(
        F.broadcast(n_node)
    )


register(
    Query(
        name="triangle_count",
        spark=_triangle_count,
        oracle="""
            WITH pairs AS (
                SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
                FROM lineitem x
                JOIN lineitem y
                  ON x.l_orderkey = y.l_orderkey
                 AND x.l_partkey < y.l_partkey
            ),
            tri AS (
                SELECT count(*) AS n_triangles
                FROM pairs ab
                JOIN pairs bc ON bc.a = ab.b
                JOIN pairs ac ON ac.a = ab.a AND ac.b = bc.b
            ),
            e AS (SELECT count(*) AS n_edges FROM pairs),
            n AS (
                SELECT count(DISTINCT v) AS n_nodes
                FROM (SELECT a AS v FROM pairs
                      UNION ALL SELECT b FROM pairs)
            )
            SELECT n_triangles, n_edges, n_nodes FROM tri, e, n
        """,
        tags=("graph", "triangle"),
    )
)


# --------------------------------------------- label propagation (LPA)


LPA_ROUNDS = 3


def _label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection via synchronous weighted label propagation
    (Raghavan et al. 2007) over the undirected trade graph.

    Every node starts labeled with its own id; each round, a node
    adopts the label carrying the greatest total edge weight among its
    neighbors (ties → smallest label). The synchronous schedule with a
    deterministic tie-break makes the fixed ``LPA_ROUNDS``-round unroll
    exactly reproducible — which is what lets an iterative community
    algorithm carry a full value-hash oracle (unrolled CTEs, like
    PageRank).

    Scale shape: one round = one label join (labels table is |V| rows,
    ≪ |E|) + one (node, label) weighted hash-aggregate + one per-node
    arg-max — all shuffles keyed on int64 node ids, edge table
    checkpointed once and reused. Per-label weight sums ride
    DECIMAL(30,6) so the arg-max compares exact values in both engines
    (double summation order would flake ties). The struct-max arg-max
    is map-side combinable — no row_number window over the corpus.
    """
    edges = _edges(spark, sf_dir)
    und = (
        edges.select("src", "dst", "weight")
        .unionAll(
            edges.select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                "weight",
            )
        )
        .localCheckpoint(eager=True)
    )
    labels = und.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    # Same join-strategy choice as PageRank: the label table is |V|
    # rows (≪ |E|); while it fits an executor, broadcast it so no LPA
    # round shuffles or sorts the checkpointed edge table — the only
    # per-round shuffle left is the (node, label) weighted aggregate,
    # which is irreducible. und is checkpointed, so counting it is a
    # metadata-cheap scan; |V| ≤ |und| makes the |E| threshold a safe
    # proxy. Identical arithmetic either way (decimal sums + exact
    # struct arg-max), so the oracle hash cannot move.
    small_v = und.count() <= 10_000_000
    _b = F.broadcast if small_v else (lambda df: df)
    n_parts = spark.sparkContext.defaultParallelism
    for _ in range(LPA_ROUNDS):
        # ONE exchange per round instead of two (guide §2.4): hash-
        # partitioning the joined edges by src up front satisfies BOTH
        # downstream aggregates — clustering(src, lbl) for the weight
        # sum (subset rule) and clustering(src) for the arg-max — so
        # neither inserts its own shuffle. The r9 shape paid a partial-
        # agg exchange on (node, lbl) AND a second full exchange of the
        # summed rows for the arg-max, every round. Decimal sums and
        # the exact struct arg-max are order-independent, so the
        # partitioning change cannot move the oracle hash. Explicit N
        # (cluster: total cores) keeps AQE from coalescing the round's
        # only exchange and starving the aggregate of parallelism.
        scores = (
            und.join(
                _b(
                    labels.select(
                        F.col("node").alias("dst"), F.col("lbl")
                    )
                ),
                "dst",
            )
            .repartition(n_parts, "src")
            .groupBy(F.col("src").alias("node"), "lbl")
            .agg(
                F.sum(F.col("weight").cast("decimal(30,6)")).alias("w")
            )
        )
        labels = scores.groupBy("node").agg(
            (-F.max(F.struct(F.col("w"), (-F.col("lbl")).alias("neg")))[
                "neg"
            ]).alias("lbl")
        )
    return labels.select("node", F.col("lbl").alias("community"))


def _lpa_oracle() -> str:
    rounds = []
    prev = "labels0"
    for r in range(1, LPA_ROUNDS + 1):
        rounds.append(
            f"""
            scores{r} AS (
                SELECT und.src AS node, l.lbl,
                       sum(CAST(und.weight AS DECIMAL(30,6))) AS w
                FROM und JOIN {prev} l ON und.dst = l.node
                GROUP BY 1, 2
            ),
            labels{r} AS (
                SELECT node, lbl FROM (
                    SELECT node, lbl, row_number() OVER (
                        PARTITION BY node
                        ORDER BY w DESC, lbl ASC) AS rk
                    FROM scores{r}
                ) WHERE rk = 1
            )"""
        )
        prev = f"labels{r}"
    rounds_sql = ",".join(rounds)
    return f"""
            WITH edges AS (
                SELECT l_suppkey * 2 AS src,
                       o_custkey * 2 + 1 AS dst,
                       floor(CAST(sum(CAST(l_extendedprice
                             * (1 - l_discount) AS DECIMAL(30,6)))
                             AS DOUBLE) * 100.0 + 0.5) / 100.0 AS weight
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                GROUP BY 1, 2
            ),
            und AS (
                SELECT src, dst, weight FROM edges
                UNION ALL
                SELECT dst AS src, src AS dst, weight FROM edges
            ),
            labels0 AS (
                SELECT DISTINCT src AS node, src AS lbl FROM und
            ),{rounds_sql}
            SELECT node, lbl AS community FROM {prev}
        """


register(
    Query(
        name="label_propagation",
        spark=_label_propagation,
        oracle=_lpa_oracle(),
        tags=("graph", "community"),
        doc="synchronous weighted LPA, deterministic tie-break, "
        "unrolled-CTE full oracle; per-round cost = one |E| join + "
        "one hash-agg on int64 keys",
    )
)


# ----------------------------------------------- multi-source BFS

_BFS_ROUNDS = 3
_BFS_SEED_MAX = 4  # supplier node ids 0/2/4 = suppkeys 0..2


def _bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source breadth-first shortest hops over the undirected
    trade graph: min link distance from the seed suppliers to every
    node reachable within ``_BFS_ROUNDS`` hops — the classic frontier
    expansion (Pregel-style), unrolled so the oracle can mirror it.

    Per round the work is ONE equi-join of the current frontier (the
    nodes first reached last round — a shrinking set) against the edge
    list, plus a min-hash-agg over (known ∪ neighbors). Distances only
    ever decrease, so keeping min(dist) per node is exactly Dijkstra
    on unit weights. The edge list is localCheckpointed once; no round
    re-derives it.

    At 100 TB: identical envelope to the PageRank/LPA family — k
    fact-sized shuffles on int64 keys, frontier-sized build sides, and
    the undirected doubling is a union, not a shuffle."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            (F.col("l_suppkey") * 2).alias("src"),
            (F.col("o_custkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    und = pairs.unionAll(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    known = (
        pairs.select("src")
        .filter(F.col("src") <= _BFS_SEED_MAX)
        .distinct()
        .select(F.col("src").alias("node"), F.lit(0).alias("dist"))
    )
    for k in range(1, _BFS_ROUNDS + 1):
        frontier = known.filter(F.col("dist") == k - 1).select("node")
        nbrs = und.join(
            frontier, und.src == frontier.node
        ).select(F.col("dst").alias("node"), F.lit(k).alias("dist"))
        known = (
            known.unionAll(nbrs)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return known


def _bfs_oracle() -> str:
    steps = []
    prev = "d0"
    for k in range(1, _BFS_ROUNDS + 1):
        steps.append(
            f"""d{k} AS (
                SELECT node, min(dist) AS dist FROM (
                    SELECT node, dist FROM {prev}
                    UNION ALL
                    SELECT e.dst AS node, {k} AS dist
                    FROM und e JOIN (
                        SELECT node FROM {prev} WHERE dist = {k - 1}
                    ) f ON e.src = f.node
                )
                GROUP BY node
            )"""
        )
        prev = f"d{k}"
    steps_sql = ",\n            ".join(steps)
    return f"""
        WITH pairs AS (
            SELECT DISTINCT l_suppkey * 2 AS src, o_custkey * 2 + 1 AS dst
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        und AS (
            SELECT src, dst FROM pairs
            UNION ALL
            SELECT dst AS src, src AS dst FROM pairs
        ),
        d0 AS (
            SELECT DISTINCT src AS node, 0 AS dist FROM pairs
            WHERE src <= {_BFS_SEED_MAX}
        ),
        {steps_sql}
        SELECT node, dist FROM {prev}
    """


register(
    Query(
        name="bfs_reachability",
        spark=_bfs_reachability,
        oracle=_bfs_oracle(),
        tags=("graph", "bfs"),
        doc="multi-source unit-weight shortest hops, frontier-join "
        "rounds unrolled to mirror the CTE oracle; one |E| shuffle "
        "per round",
    )
)


# --------------------------------------------------- k-core peeling

_KCORE_K = 30
_KCORE_ROUNDS = 3


def _kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate k-core: ``_KCORE_ROUNDS`` rounds of the standard
    peel — drop every node whose current degree is below ``_KCORE_K``,
    restrict the edge list to survivors, repeat. Exact k-core is the
    fixpoint; the unrolled prefix is deterministic, mirrors into CTEs
    for the full oracle, and each extra round is the same one-join
    envelope (run to convergence on a cluster by looping until the
    peeled count is zero — the driver-side loop test is metadata-sized).

    Per round: one degree hash-agg + two semi-joins of the edge list
    against the survivor set (both int64-keyed; the survivor set only
    shrinks). Output is each surviving node with its residual degree.

    At 100 TB this is how dense-community extraction actually runs on
    web graphs (public k-core literature: Batagelj-Zaveršnik peel);
    the edge table is the fact and each round costs ~2 fact shuffles."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            (F.col("l_suppkey") * 2).alias("src"),
            (F.col("o_custkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = pairs.unionAll(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    for _ in range(_KCORE_ROUNDS):
        keep = (
            edges.groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= _KCORE_K)
            .select(F.col("src").alias("node"))
        )
        edges = (
            edges.join(keep, edges.src == keep.node, "left_semi")
            .join(
                keep.select(F.col("node").alias("dnode")),
                F.col("dst") == F.col("dnode"),
                "left_semi",
            )
            .localCheckpoint(eager=True)
        )
    return edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )


def _kcore_oracle() -> str:
    steps = []
    prev = "e0"
    for r in range(1, _KCORE_ROUNDS + 1):
        steps.append(
            f"""k{r} AS (
                SELECT src AS node FROM {prev}
                GROUP BY src HAVING count(*) >= {_KCORE_K}
            ),
            e{r} AS (
                SELECT e.src, e.dst FROM {prev} e
                JOIN k{r} a ON e.src = a.node
                JOIN k{r} b ON e.dst = b.node
            )"""
        )
        prev = f"e{r}"
    steps_sql = ",\n            ".join(steps)
    return f"""
        WITH pairs AS (
            SELECT DISTINCT l_suppkey * 2 AS src, o_custkey * 2 + 1 AS dst
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        e0 AS (
            SELECT src, dst FROM pairs
            UNION ALL
            SELECT dst AS src, src AS dst FROM pairs
        ),
        {steps_sql}
        SELECT src AS node, count(*) AS degree FROM {prev} GROUP BY 1
    """


register(
    Query(
        name="kcore_decomposition",
        spark=_kcore_decomposition,
        oracle=_kcore_oracle(),
        tags=("graph", "kcore"),
        doc="unrolled degree-peel rounds toward the k-core fixpoint; "
        "per round one degree agg + two shrinking semi-joins",
    )
)
