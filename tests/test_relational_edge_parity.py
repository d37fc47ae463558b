"""Edge-case oracle parity for the relational suite: the sf0.001
corpus AUGMENTED with adversarial fact rows — zero/boundary discounts
and quantities, zero and near-decimal-envelope prices, epoch-0 and
year-2200 dates, an order with 2000 identical-date lines, a customer
with a deeply negative balance — replayed through the TPC-H-shaped
query↔oracle pairs. The relational face of the text/embedding/events
edge tiers: the synthetic generator's well-behaved value ranges never
exercise money-arithmetic boundaries or degenerate groups.
"""

from __future__ import annotations

import datetime as dt

import pytest

from ods_to_datalake_spark.catalog import TESTDATA_TABLES, load_testdata
from ods_to_datalake_spark.plans.suite import load_all
from tests.oracle_utils import compare, duckdb_conn

SF = "/root/testdata/sf0.001"

_EPOCH = dt.datetime(1970, 1, 1)
_FAR = dt.datetime(2200, 12, 31)
_D95 = dt.datetime(1995, 3, 15)

# appended orders: keys far above the generated range
EDGE_ORDERS = [
    (900001, 1, "O", 0.0, _EPOCH, "1-URGENT"),
    (900002, 1, "F", 9.99e12, _FAR, "5-LOW"),
    (900003, 2, "F", 0.01, _D95, "3-MEDIUM"),
    (900004, 3, "P", 1.0, _D95, "2-HIGH"),
]


def _edge_lineitems():
    rows = [
        # zero quantity and zero price
        (900001, 1, 1, 1, 0.0, 0.0, 0.0, 0.0, "N", "O", _EPOCH),
        # 100% discount, 100% tax
        (900001, 2, 2, 2, 1.0, 1000.0, 1.0, 1.0, "R", "F", _EPOCH),
        # near the DECIMAL(18,2) money envelope per line
        (900002, 3, 3, 1, 50.0, 9.99e12, 0.05, 0.08, "A", "F", _FAR),
        # negative quantity/price (a credit/return line)
        (900003, 1, 2, 1, -5.0, -500.25, 0.1, 0.0, "R", "F", _D95),
    ]
    # one order with 2000 lines on ONE date: a degenerate fold group
    # and an ordering that ties on every non-unique key
    rows += [
        (900004, (i % 7) + 1, (i % 5) + 1, i + 1, 1.0, 1.0, 0.0, 0.0,
         "N", "O", _D95)
        for i in range(2000)
    ]
    return rows


# relational queries replayed over the augmented corpus (documents/
# embeddings/events queries have their own edge tiers); x-prefixed
# queries over relational tables opt in by name
EDGE_QUERIES = [n for n in load_all() if n[0] in "qpajwtuf"] + [
    "x58_histogram_quantiles",  # boundary money exercises the clamp
    "x61_fuzzy_name_match",  # edge customers: empty/1-char names (the
    # '' block), duplicate names (distinct-first), unicode names (the
    # byte-vs-codepoint levenshtein divergence — both engines must
    # FILTER them identically), NULLs
    # round-8 opt-ins:
    "x68_target_encoding",  # NULL segments form their own encoder
    # group; boundary labels keep the integer cross-multiplication
    # exact in both engines
    "x69_part_cooccurrence",  # NULL part/order keys dropped before
    # pairing, duplicate parts within a basket count once
    "g02_pagerank_dangling",  # NULL nation keys drop edges; the
    # dangling sum stays integer-exact over the augmented DAG
    "g04_personalized_pagerank",  # seed-set gating over the same
    # augmented DAG (edge customers join nation 0 or drop)
    "g03_triangle_count",  # degree ties resolved by (degree, id)
    # tuple comparison identically in both engines
    "x70_association_rules",  # exact-integer ratio trio over the
    # augmented basket table (HUGEINT lift operands via VARCHAR)
    "x71_also_bought_topk",  # (count DESC, neighbor) rank ties
    # resolve identically beyond the k cut
    "u14_profile_drift",  # boundary-date snapshot split + null-rate
    # deltas on the augmented order rows
]

# appended customers: fuzzy-name edge shapes
EDGE_CUSTOMERS = [
    (900001, "", 1, 0.0, "BUILDING"),
    (900002, "a", 1, 0.0, "BUILDING"),
    (900003, "ab", 2, 0.0, "MACHINERY"),
    (900004, None, 2, 0.0, "MACHINERY"),
    (900005, "Customer#000000001", 3, 0.0, "AUTOMOBILE"),  # dup name
    (900006, "Customér#000000001", 3, 0.0, "AUTOMOBILE"),  # non-ASCII
    (900007, "Customer#00000000", 4, 0.0, "HOUSEHOLD"),  # 1 short
]


@pytest.fixture(scope="module")
def rel_edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("rel_edge")
    cat = load_testdata(spark, SF)
    for t in TESTDATA_TABLES:
        df = cat.table(t)
        if t == "orders":
            df = df.unionByName(
                spark.createDataFrame(EDGE_ORDERS, df.schema)
            )
        elif t == "lineitem":
            df = df.unionByName(
                spark.createDataFrame(_edge_lineitems(), df.schema)
            )
        elif t == "customer":
            df = df.unionByName(
                spark.createDataFrame(EDGE_CUSTOMERS, df.schema)
            )
        df.coalesce(1).write.parquet(str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def rel_edge_con(rel_edge_dir):
    con = duckdb_conn(rel_edge_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(EDGE_QUERIES))
def test_relational_edge_parity(spark, rel_edge_dir, rel_edge_con, name):
    q = load_all()[name]
    report = compare(q.fn(spark, rel_edge_dir), rel_edge_con, q.oracle)
    assert report["match"], f"{name}: {report}"
