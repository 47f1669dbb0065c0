"""Hypothesis differential fuzz over the embeddings-table battery.

Random small embedding sets — including exact duplicate vectors and
2-dp lattice values that land quantized cosines on boundaries — written
in the catalog's parquet layout (list<float32>), run through Spark AND
DuckDB, value-hash compared. Gates the integer-quantized cosine
contract on data shapes the fixed testdata never produces.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fuzz_common import run_battery

from gee_datapipeline_spark.plans.registry import _load_all

_load_all()

import os as _os

# soak knob: raise for a long exploratory run (examples are drawn
# deterministically, so a bigger budget extends the same sequence)
_FUZZ_EX = int(_os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "0"))

BATTERY = [
    "embedding_norms",
    "embedding_centroids",
    "ann_bruteforce",
    "ann_lsh",
    "embedding_near_dup",
    "embedding_pca_power",
    "embedding_outlier_filter",
    "semantic_dedup",
]

DIM = 64


@st.composite
def embedding_set(draw):
    n = draw(st.integers(30, 70))
    rows = []
    for i in range(n):
        if rows and draw(st.integers(0, 4)) == 0:
            # exact duplicate of an earlier vector: near-dup hit,
            # cosine exactly 1, ANN tie between ids
            emb = rows[draw(st.integers(0, len(rows) - 1))][1]
        else:
            emb = [
                draw(st.integers(-50, 50)) / 100.0 for _ in range(DIM)
            ]
        rows.append((i, emb, draw(st.integers(0, 9))))
    return rows


def _write(rows, path):
    table = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(table, path)


def _compare(spark, rows, names):
    run_battery(
        spark, {"embeddings": lambda p: _write(rows, p)}, names
    )


@settings(
    max_examples=_FUZZ_EX or 6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(embedding_set())
def test_fuzz_embeddings_battery(spark, rows):
    _compare(spark, rows, BATTERY)


def test_fuzz_embeddings_boundary_set(spark):
    """Deterministic worst cases: a probe that duplicates a corpus
    vector (cosine exactly 1), axis-aligned one-hot vectors (cosine
    exactly 0 between them), and a constant-vector pair."""
    one_hot = lambda j: [1.0 if k == j else 0.0 for k in range(DIM)]  # noqa: E731
    rows = [(i, one_hot(i % 8), i % 3) for i in range(8)]
    rows += [(8, one_hot(0), 3)]  # duplicate of vec 0
    rows += [(9, [0.25] * DIM, 4), (10, [0.25] * DIM, 5)]
    rows += [
        (11 + i, [((i * 7 + k) % 11 - 5) / 10.0 for k in range(DIM)], i % 10)
        for i in range(24)
    ]
    _compare(spark, rows, BATTERY)
