"""Edge-case oracle parity for the embedding suite: adversarial vectors
(zero-norm, exact duplicates, antipodes, denormal-tiny, float32-max
magnitudes) replayed through the SAME query↔oracle pairs — the
embedding face of test_text_edge_parity.

The zero vector is the load-bearing row: an unguarded cosine is a
DIVIDE_BY_ZERO crash under ANSI mode (Spark 4 default), and with ANSI
off the 0/0 NaN compares GREATER than every threshold in Spark's NaN
ordering — a zero embedding (a null/failed encoder output, routine at
corpus scale) would either kill the job or "near-dup" every vector it
shares a bucket with. `vectors.cosine` guards the denominator (NULL),
and every oracle mirrors it with NULLIF.
"""

from __future__ import annotations

import pytest

from ods_to_datalake_spark.plans.suite import load_all
from tests.oracle_utils import compare, duckdb_conn

DIM = 64


def _vec(fill: float) -> list[float]:
    return [fill] * DIM


def _ramp(scale: float) -> list[float]:
    return [scale * (i + 1) for i in range(DIM)]


EDGE_VECS = [
    (0, _vec(0.0), 0),            # zero norm — the crash/NaN row
    (1, _vec(1.0), 0),
    (2, _vec(1.0), 1),            # exact duplicate of 1
    (3, [-x for x in _vec(1.0)], 1),   # antipode of 1 (cosine -1)
    (4, _ramp(1e-38), 2),         # denormal-tiny float32
    # 1e15: extreme vs the O(1) outputs of real encoders, yet inside
    # the DECIMAL(28,10) centroid envelope (|Σ component| < 1e18) that
    # the decimal-exact k-means/IVF mean documents as its domain —
    # float32-max magnitudes overflow it by 20 orders of magnitude
    (5, _ramp(1e15), 2),
    (6, _ramp(1.0), 2),
    (7, [(-1.0) ** i for i in range(DIM)], 0),  # alternating signs
    (8, _ramp(-1.0), 1),
    (9, [0.0] * 63 + [1.0], 2),   # single-component
]

EDGE_QUERIES = [
    "x07_cosine_topk",
    "x08_ivf_ann",
    "x13_cosine_near_dup",
    "x14_hyperplane_lsh_near_dup",
    "x29_quantize_embeddings",
    "x32_incremental_embedding_dedup",
    "x35_pq_encode",
    "x36_semantic_dedup",
    "x93_ivf_cell_balance",
]


@pytest.fixture(scope="module")
def emb_edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("emb_edge")
    df = spark.createDataFrame(
        EDGE_VECS, "vec_id bigint, embedding array<float>, label int"
    )
    df.coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def emb_edge_con(emb_edge_dir):
    con = duckdb_conn(emb_edge_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_embedding_edge_parity(spark, emb_edge_dir, emb_edge_con, name):
    q = load_all()[name]
    report = compare(q.fn(spark, emb_edge_dir), emb_edge_con, q.oracle)
    assert report["match"], f"{name}: {report}"
