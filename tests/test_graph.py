"""Unit coverage for operators/graph.pagerank_integer and
operators/sketch.cms_join_size: known-topology rank order, mass
conservation up to the documented truncation drip, partitioning
invariance, and the join-size upper-bound property."""

from __future__ import annotations

from ods_to_datalake_spark.operators.graph import (
    PR_SCALE,
    pagerank_integer,
)
from ods_to_datalake_spark.operators.sketch import (
    cms_join_size,
    cms_sketch,
)


def _ranks(df):
    return {r.node: r.r for r in df.collect()}


def test_pagerank_cycle_is_uniform(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    r = _ranks(pagerank_integer(edges, iterations=4))
    # a directed cycle is perfectly symmetric: identical ranks
    assert len(set(r.values())) == 1
    assert len(r) == 3


def test_pagerank_star_center_dominates_and_mass_conserved(spark):
    # undirected star: leaves 2..6 <-> center 1
    fwd = [(1, d) for d in range(2, 7)]
    edges = spark.createDataFrame(
        fwd + [(d, s) for s, d in fwd], "src long, dst long"
    )
    r = _ranks(pagerank_integer(edges, iterations=6))
    assert r[1] > max(v for k, v in r.items() if k != 1)
    leaf_ranks = {v for k, v in r.items() if k != 1}
    assert len(leaf_ranks) == 1  # symmetric leaves tie exactly
    # symmetric graph has no dangling mass: total stays within the
    # truncation drip (~iterations * nodes ulps of the scale)
    assert abs(sum(r.values()) - PR_SCALE) < 1000


def test_pagerank_partitioning_invariant(spark):
    fwd = [(i, (i * 7) % 23) for i in range(23)]
    edges = spark.createDataFrame(
        fwd + [(d, s) for s, d in fwd], "src long, dst long"
    )
    a = _ranks(pagerank_integer(edges, iterations=3))
    b = _ranks(pagerank_integer(edges.repartition(13), iterations=3))
    assert a == b  # bit-identical under any partitioning


def test_pagerank_dangling_sink_leaks_documented_mass(spark):
    # 1 -> 2 only: node 2 is a sink; its mass drips out each round
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    r = _ranks(pagerank_integer(edges, iterations=2))
    assert set(r) == {1, 2}
    assert sum(r.values()) < PR_SCALE  # the simplified-variant leak
    assert r[2] > r[1]  # 2 receives 1's mass, 1 only the base


def test_pagerank_dangling_redistribution_conserves_mass(spark):
    # same 1 -> 2 sink graph as the leak test: with the dangling term
    # the sink's mass is re-shared every round, so the total stays
    # within the truncation drip instead of bleeding out
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    r = _ranks(
        pagerank_integer(
            edges, iterations=4, redistribute_dangling=True
        )
    )
    assert set(r) == {1, 2}
    assert abs(sum(r.values()) - PR_SCALE) < 1000
    assert r[2] > r[1]  # 2 still receives 1's direct mass on top


def test_pagerank_dangling_no_sinks_matches_simplified(spark):
    # on a graph where every node has out-degree the dangling sum is
    # 0 every round — both variants must be bit-identical
    fwd = [(i, (i * 5) % 11) for i in range(11)]
    edges = spark.createDataFrame(
        fwd + [(d, s) for s, d in fwd], "src long, dst long"
    )
    a = _ranks(pagerank_integer(edges, iterations=3))
    b = _ranks(
        pagerank_integer(
            edges, iterations=3, redistribute_dangling=True
        )
    )
    assert a == b


def test_pagerank_dangling_partitioning_invariant(spark):
    # asymmetric chain with a sink: 0->1->2->3 (3 is a sink)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    a = _ranks(
        pagerank_integer(
            edges, iterations=3, redistribute_dangling=True
        )
    )
    b = _ranks(
        pagerank_integer(
            edges.repartition(7),
            iterations=3,
            redistribute_dangling=True,
        )
    )
    assert a == b


def test_personalized_seeds_all_nodes_is_classic(spark):
    fwd = [(i, (i * 3) % 7) for i in range(7)]
    edges = spark.createDataFrame(
        fwd + [(d, s) for s, d in fwd], "src long, dst long"
    )
    all_nodes = spark.createDataFrame(
        [(i,) for i in range(7)], "node long"
    )
    a = _ranks(pagerank_integer(edges, iterations=3))
    b = _ranks(pagerank_integer(edges, iterations=3, seeds=all_nodes))
    assert a == b  # seeds=every-node is bit-identical to classic


def test_personalized_concentrates_on_seed(spark):
    # undirected star, teleport to leaf 2 only: the seed leaf must
    # outrank the symmetric non-seed leaves
    fwd = [(1, d) for d in range(2, 7)]
    edges = spark.createDataFrame(
        fwd + [(d, s) for s, d in fwd], "src long, dst long"
    )
    seeds = spark.createDataFrame([(2,)], "node long")
    r = _ranks(pagerank_integer(edges, iterations=6, seeds=seeds))
    assert r[2] > max(r[k] for k in (3, 4, 5, 6))
    non_seed_leaves = {r[k] for k in (3, 4, 5, 6)}
    assert len(non_seed_leaves) == 1  # still symmetric among them


def test_personalized_dangling_mass_returns_to_seeds(spark):
    # chain into a sink, seeded at the head: with redistribution the
    # sink's mass teleports back to the seed, conserving total mass
    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    r = _ranks(
        pagerank_integer(
            edges,
            iterations=4,
            seeds=seeds,
            redistribute_dangling=True,
        )
    )
    assert abs(sum(r.values()) - PR_SCALE) < 1000
    assert r[1] > 0 and r[2] > 0 and r[3] > 0


def test_personalized_disjoint_seeds_raise(spark):
    import pytest as _pytest

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(99,)], "node long")
    with _pytest.raises(ValueError):
        pagerank_integer(edges, iterations=2, seeds=seeds)


def test_pagerank_empty_edges(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert pagerank_integer(edges, iterations=2).count() == 0


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _tri(spark, pairs):
    from ods_to_datalake_spark.operators.graph import triangle_count

    return triangle_count(_edges(spark, pairs)).collect()[0].n_triangles


def test_triangle_count_k4_has_four(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert _tri(spark, k4) == 4


def test_triangle_count_bipartite_has_none(spark):
    # the supplier<->customer trade graph shape: no odd cycles
    bip = [(a, b) for a in (0, 1, 2) for b in (10, 11)]
    assert _tri(spark, bip) == 0


def test_triangle_count_direction_and_dups_irrelevant(spark):
    tri = [(1, 2), (2, 3), (3, 1)]
    messy = tri + [(2, 1), (3, 2), (1, 3), (1, 2), (1, 1)]
    assert _tri(spark, tri) == 1
    assert _tri(spark, messy) == 1  # undirected, deduped, loop-dropped


def test_triangle_count_empty(spark):
    assert _tri(spark, []) == 0


def test_cms_join_size_upper_bounds_exact(spark):
    a = spark.createDataFrame(
        [(k,) for k in [1, 1, 1, 2, 3]], "k long"
    )
    b = spark.createDataFrame(
        [(k,) for k in [1, 2, 2, 4]], "k long"
    )
    est = cms_join_size(
        cms_sketch(a, "k"), cms_sketch(b, "k")
    ).collect()[0]["est_join_size"]
    exact = a.join(b, "k").count()  # 3*1 + 1*2 = 5
    assert exact == 5
    assert est >= exact


def test_cms_join_size_empty_side_is_zero(spark):
    a = spark.createDataFrame([(1,), (2,)], "k long")
    empty = spark.createDataFrame([], "k long")
    est = cms_join_size(
        cms_sketch(a, "k"), cms_sketch(empty, "k")
    ).collect()[0]["est_join_size"]
    assert est == 0


def _core(spark, pairs, k, **kw):
    from ods_to_datalake_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs] or [(0, 0)],
        "src long, dst long",
    )
    if not pairs:
        edges = edges.limit(0)
    return {
        r.node: r.core_degree
        for r in k_core(edges, k=k, **kw).collect()
    }


def _py_k_core(pairs, k):
    """Pure-Python peel reference (the test_bpe pattern)."""
    edges = {
        tuple(sorted((a, b))) for a, b in pairs if a != b
    }
    while True:
        deg: dict = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        bad = {n for n, d in deg.items() if d < k}
        if not bad:
            return deg
        edges = {e for e in edges if bad.isdisjoint(e)}


def test_k_core_triangle_sheds_pendant_chain(spark):
    # triangle 1-2-3 with a pendant chain 3-4-5: a one-shot degree
    # filter keeps node 4 (degree 2); the peel must cascade it away
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]
    assert _core(spark, pairs, 2) == {1: 2, 2: 2, 3: 2}


def test_k_core_path_peels_to_empty(spark):
    # a path graph is the worst-case cascade: one layer per round
    pairs = [(i, i + 1) for i in range(8)]
    assert _core(spark, pairs, 2) == {}


def test_k_core_direction_dups_loops_irrelevant(spark):
    tri = [(1, 2), (2, 3), (3, 1)]
    messy = tri + [(2, 1), (3, 2), (1, 3), (1, 1), (1, 2)]
    assert _core(spark, messy, 2) == {1: 2, 2: 2, 3: 2}


def test_k_core_empty_edges(spark):
    assert _core(spark, [], 2) == {}


def test_k_core_max_rounds_raises(spark):
    import pytest as _pytest

    pairs = [(i, i + 1) for i in range(8)]
    with _pytest.raises(RuntimeError, match="converge"):
        _core(spark, pairs, 2, max_rounds=2)


def test_k_core_matches_python_reference(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=8,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pairs=st.lists(
            st.tuples(st.integers(0, 9), st.integers(0, 9)),
            min_size=0,
            max_size=25,
        ),
        k=st.integers(2, 4),
    )
    def check(pairs, k):
        assert _core(spark, pairs, k) == _py_k_core(pairs, k)

    check()


def test_g05_converges_well_inside_the_oracle_unroll(spark):
    """Driver-data drift canary: the registered g05 oracle unrolls
    K_CORE_ORACLE_ROUNDS peel rounds; the sf0.01 graph must converge
    with a >= 5-round margin so regenerated testdata shows up here
    (a local red) before it could show up as a red driver row."""
    from ods_to_datalake_spark.catalog import load_testdata
    from ods_to_datalake_spark.operators.basket import cooccurrence
    from ods_to_datalake_spark.operators.graph import k_core
    from ods_to_datalake_spark.plans.suite_graph import (
        K_CORE_K,
        K_CORE_ORACLE_ROUNDS,
    )

    cat = load_testdata(spark, "/root/testdata/sf0.01")
    edges = cooccurrence(
        cat.table("lineitem"), "l_orderkey", "l_partkey", min_count=2
    )
    # succeeding under the tightened cap proves convergence depth
    out = k_core(
        edges,
        "item_a",
        "item_b",
        k=K_CORE_K,
        max_rounds=K_CORE_ORACLE_ROUNDS - 5,
    )
    # and the core actually prunes (nodes leave) while staying
    # non-trivial (a core survives) — the "2-core actually prunes"
    # requirement from the round brief
    n_core = out.count()
    n_nodes = (
        edges.select("item_a").union(edges.select("item_b")).distinct().count()
    )
    assert 0 < n_core < n_nodes


def _lpa(spark, pairs, rounds=4):
    from ods_to_datalake_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs] or [(0, 0)],
        "src long, dst long",
    )
    if not pairs:
        edges = edges.limit(0)
    return {
        r.node: r.label
        for r in label_propagation(edges, rounds=rounds).collect()
    }


def _py_lpa(pairs, rounds):
    """Pure-Python synchronous LPA reference: most frequent neighbor
    label, ties to the smallest label."""
    edges = {tuple(sorted((a, b))) for a, b in pairs if a != b}
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        nxt = {}
        for n, nbrs in adj.items():
            freq: dict = {}
            for m in nbrs:
                freq[labels[m]] = freq.get(labels[m], 0) + 1
            nxt[n] = min(freq, key=lambda l: (-freq[l], l))
        labels = nxt
    return labels


def test_lpa_disconnected_cliques_get_one_label_each(spark):
    tri1 = [(1, 2), (2, 3), (3, 1)]
    tri2 = [(10, 11), (11, 12), (12, 10)]
    got = _lpa(spark, tri1 + tri2)
    assert set(got[n] for n in (1, 2, 3)) == {1}
    assert set(got[n] for n in (10, 11, 12)) == {10}


def test_lpa_fixed_rounds_are_the_semantics(spark):
    # a single edge oscillates under synchronous updates: after an
    # even round count each node holds its OWN label again — the
    # documented reason the operator pins fixed-round semantics
    # rather than claiming convergence
    assert _lpa(spark, [(1, 2)], rounds=4) == {1: 1, 2: 2}
    assert _lpa(spark, [(1, 2)], rounds=3) == {1: 2, 2: 1}


def test_lpa_direction_dups_loops_irrelevant(spark):
    tri = [(1, 2), (2, 3), (3, 1)]
    messy = tri + [(2, 1), (3, 2), (1, 3), (1, 1)]
    assert _lpa(spark, messy) == _lpa(spark, tri)


def test_lpa_matches_python_reference(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=8,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pairs=st.lists(
            st.tuples(st.integers(0, 7), st.integers(0, 7)),
            min_size=0,
            max_size=20,
        ),
        rounds=st.integers(1, 4),
    )
    def check(pairs, rounds):
        assert _lpa(spark, pairs, rounds) == _py_lpa(pairs, rounds)

    check()


# --- link prediction (g07) -------------------------------------------


def test_link_prediction_path_graph(spark):
    # P4: 1-2-3-4. Distance-2 non-edges: (1,3) via 2, (2,4) via 3.
    # (1,4) is distance 3 — no common neighbor, excluded.
    from ods_to_datalake_spark.operators.graph import (
        link_prediction_scores,
    )
    import math

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    rows = {
        (r.node_a, r.node_b): r
        for r in link_prediction_scores(edges).collect()
    }
    assert set(rows) == {(1, 3), (2, 4)}
    r13 = rows[(1, 3)]
    assert r13.common_neighbors == 1
    assert (r13.deg_a, r13.deg_b) == (1, 2)
    # jaccard = 1 / (1 + 2 - 1)
    assert r13.jaccard == 0.5
    assert r13.pref_attachment == 2.0
    # adamic_adar = 1/ln(deg(2)) = 1/ln(2), through the quantization
    q = float(round(__import__("decimal").Decimal(math.log(2)), 6))
    assert abs(float(r13.adamic_adar) - round(1.0 / q, 12)) < 1e-9


def test_link_prediction_excludes_existing_edges(spark):
    # triangle: every distance-2 pair is ALSO an edge — empty output
    from ods_to_datalake_spark.operators.graph import (
        link_prediction_scores,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    assert link_prediction_scores(edges).count() == 0


def test_link_prediction_square_counts_both_wedges(spark):
    # 4-cycle 1-2-3-4-1: diagonals (1,3) and (2,4) each have TWO
    # common neighbors
    from ods_to_datalake_spark.operators.graph import (
        link_prediction_scores,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "src long, dst long"
    )
    rows = {
        (r.node_a, r.node_b): r
        for r in link_prediction_scores(edges).collect()
    }
    assert set(rows) == {(1, 3), (2, 4)}
    assert rows[(1, 3)].common_neighbors == 2
    # jaccard = 2 / (2 + 2 - 2) = 1.0 (identical neighborhoods)
    assert rows[(1, 3)].jaccard == 1.0


def test_link_prediction_max_degree_and_hub_report(spark):
    # star center 0 with leaves 1..5 plus a P3 off to the side:
    # capping max_degree=2 drops the hub CENTER, so no leaf pairs
    from ods_to_datalake_spark.operators.graph import (
        link_prediction_scores,
        oversized_hubs,
    )

    star = [(0, leaf) for leaf in range(1, 6)]
    edges = spark.createDataFrame(
        star + [(10, 11), (11, 12)], "src long, dst long"
    )
    uncapped = link_prediction_scores(edges)
    # C(5,2) leaf pairs + (10,12)
    assert uncapped.count() == 11
    capped = link_prediction_scores(edges, max_degree=2)
    assert {
        (r.node_a, r.node_b) for r in capped.collect()
    } == {(10, 12)}
    hubs = oversized_hubs(edges, max_degree=2)
    assert {(r.node, r.degree) for r in hubs.collect()} == {(0, 5)}


def test_link_prediction_degree_one_center_is_guarded(spark):
    # a pendant edge's degree-1 endpoint appears as a wedge CENTER row
    # whose Adamic-Adar term would be 1/ln(1) — the ANSI
    # divide-by-zero the projection guard exists for
    from ods_to_datalake_spark.operators.graph import (
        link_prediction_scores,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "src long, dst long"
    )
    rows = link_prediction_scores(edges).collect()
    assert {(r.node_a, r.node_b) for r in rows} == {(1, 3)}


# --- degree assortativity (g08) ----------------------------------------


def test_assortativity_star_is_minus_one(spark):
    from ods_to_datalake_spark.operators.graph import (
        degree_assortativity,
    )

    edges = spark.createDataFrame(
        [(0, leaf) for leaf in range(1, 6)], "src long, dst long"
    )
    (r,) = degree_assortativity(edges).collect()
    assert (r.n_nodes, r.n_edges) == (6, 5)
    assert r.assortativity == -1.0


def test_assortativity_regular_graph_is_null(spark):
    from ods_to_datalake_spark.operators.graph import (
        degree_assortativity,
    )

    # triangle: every degree equal -> zero variance -> NULL, not crash
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    (r,) = degree_assortativity(edges).collect()
    assert r.assortativity is None


def test_assortativity_path_p3(spark):
    from ods_to_datalake_spark.operators.graph import (
        degree_assortativity,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "src long, dst long"
    )
    (r,) = degree_assortativity(edges).collect()
    # M=4, Sx=6, Sxy=8, Sxx=10 -> (32-36)/(40-36) = -1
    assert r.assortativity == -1.0


def test_assortativity_mixed_graph(spark):
    from ods_to_datalake_spark.operators.graph import (
        degree_assortativity,
    )

    # P4 1-2-3-4: degrees 1,2,2,1; adj pairs x,y:
    # (1,2),(2,1),(2,2),(2,2),(2,1),(1,2) -> M=6, Sx=10, Sxy=16,
    # Sxx=18 -> (96-100)/(108-100) = -0.5
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    (r,) = degree_assortativity(edges).collect()
    assert r.assortativity == -0.5


# --- HITS (g09) ----------------------------------------------------------


def test_hits_star_ordering_and_zero_sides(spark):
    """Hand bipartite graph: buyer 1 spans 3 sellers, buyer 3 spans 1;
    seller 10 has 3 buyers, seller 12 has 1. Hub/authority ORDER must
    follow breadth, the max node reads exactly scale, and nodes
    unreachable on a side score 0 on it."""
    from ods_to_datalake_spark.operators.graph import (
        HITS_SCALE,
        hits_integer,
    )

    edges = spark.createDataFrame(
        [
            (1, 10), (1, 11), (1, 12),
            (2, 10), (2, 11),
            (3, 10),
        ],
        "src long, dst long",
    )
    out = {r.node: r for r in hits_integer(edges).collect()}
    assert set(out) == {1, 2, 3, 10, 11, 12}
    # max-normalization contract: the top node of each side lands in
    # [scale, 2*scale) — m div (m div scale) — and dominates its side
    assert HITS_SCALE <= out[1].hub < 2 * HITS_SCALE
    assert out[1].hub > out[2].hub > out[3].hub > 0
    assert HITS_SCALE <= out[10].authority < 2 * HITS_SCALE
    assert out[10].authority > out[11].authority > out[12].authority
    # bipartite: sellers have no out-edges, buyers no in-edges
    assert all(out[s].hub == 0 for s in (10, 11, 12))
    assert all(out[b].authority == 0 for b in (1, 2, 3))


def test_hits_partition_invariance(spark):
    """Integer arithmetic promise: identical scores under any input
    partitioning (the reason L2 float normalization was rejected)."""
    from ods_to_datalake_spark.operators.graph import hits_integer

    rows = [(i % 7, 100 + (i * 3) % 5) for i in range(40)] + [
        (100 + i, i % 7) for i in range(5)
    ]
    df1 = spark.createDataFrame(rows, "src long, dst long")
    df32 = df1.repartition(32)
    a = sorted(map(tuple, hits_integer(df1, iterations=3).collect()))
    b = sorted(map(tuple, hits_integer(df32, iterations=3).collect()))
    assert a == b


def test_hits_null_and_dup_edges_normalized(spark):
    from ods_to_datalake_spark.operators.graph import hits_integer

    edges = spark.createDataFrame(
        [(1, 10), (1, 10), (None, 10), (1, None), (2, 10)],
        "src long, dst long",
    )
    out = {r.node: r for r in hits_integer(edges).collect()}
    assert set(out) == {1, 2, 10}
    assert out[1].hub == out[2].hub  # the duplicate edge deduped


# --- BFS layers (g10) -----------------------------------------------------


def test_bfs_path_graph_distances(spark):
    """Path 1-2-3-4-5: distances from {1} are the hop counts; the
    hop limit truncates exactly (a correct k-hop query, not an
    approximation)."""
    from ods_to_datalake_spark.operators.graph import bfs_layers

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    full = {
        r.node: r.dist for r in bfs_layers(edges, seeds).collect()
    }
    assert full == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}
    two = {
        r.node: r.dist
        for r in bfs_layers(edges, seeds, max_hops=2).collect()
    }
    assert two == {1: 0, 2: 1, 3: 2}


def test_bfs_multi_source_takes_nearest_seed(spark):
    from ods_to_datalake_spark.operators.graph import bfs_layers

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    seeds = spark.createDataFrame(
        [(1,), (5,), (None,), (5,)], "node long"
    )
    got = {
        r.node: r.dist for r in bfs_layers(edges, seeds).collect()
    }
    assert got == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_bfs_isolated_seed_and_disconnected_component(spark):
    """A seed absent from the edge set is still at distance 0 from
    itself; nodes in other components never appear."""
    from ods_to_datalake_spark.operators.graph import bfs_layers

    edges = spark.createDataFrame(
        [(1, 2), (8, 9)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,), (99,)], "node long")
    got = {
        r.node: r.dist for r in bfs_layers(edges, seeds).collect()
    }
    assert got == {1: 0, 99: 0, 2: 1}


# --- modularity (g11) -------------------------------------------------------


def test_modularity_two_cliques_perfect_partition(spark):
    """Two disjoint triangles, each its own community: Q = 1/2 exactly
    (per triangle: 3/6 − (6/12)² = 1/4)."""
    from ods_to_datalake_spark.operators.graph import modularity

    edges = _edges(
        spark, [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4)]
    )
    labels = spark.createDataFrame(
        [(n, 1) for n in (1, 2, 3)] + [(n, 2) for n in (4, 5, 6)],
        "node long, label long",
    )
    out = modularity(edges, labels).collect()
    assert len(out) == 2
    for r in out:
        assert (r.n_nodes, r.internal_edges, r.degree_sum) == (3, 3, 6)
        assert r.contribution == 0.25
        assert r.modularity == 0.5


def test_modularity_degenerate_partitions(spark):
    """One community holding everything scores exactly 0 (the
    random-graph baseline); singleton communities on a triangle score
    the known −1/3."""
    from ods_to_datalake_spark.operators.graph import modularity

    tri = _edges(spark, [(1, 2), (2, 3), (3, 1)])
    one = spark.createDataFrame(
        [(n, 9) for n in (1, 2, 3)], "node long, label long"
    )
    (r,) = modularity(tri, one).collect()
    assert r.modularity == 0.0 and r.internal_edges == 3
    singles = spark.createDataFrame(
        [(n, n) for n in (1, 2, 3)], "node long, label long"
    )
    out = modularity(tri, singles).collect()
    assert len(out) == 3
    assert all(r.internal_edges == 0 for r in out)
    assert abs(out[0].modularity - (-1.0 / 3.0)) < 1e-15


def test_modularity_unlabeled_endpoint_is_external(spark):
    from ods_to_datalake_spark.operators.graph import modularity

    edges = _edges(spark, [(1, 2), (2, 3)])
    labels = spark.createDataFrame(
        [(1, 1), (2, 1)], "node long, label long"  # 3 unlabeled
    )
    (r,) = modularity(edges, labels).collect()
    # edge (2,3) is external; degrees still count both edges at node 2
    assert (r.n_nodes, r.internal_edges, r.degree_sum) == (2, 1, 3)


# --- rich club (g12) --------------------------------------------------------


def test_rich_club_complete_graph_is_one(spark):
    """K5: every node has degree 4, all edges internal at k < 4 —
    Φ = 1.0 exactly; at k ≥ 4 the club is empty → NULL."""
    from ods_to_datalake_spark.operators.graph import rich_club

    k5 = _edges(
        spark, [(a, b) for a in range(5) for b in range(5) if a < b]
    )
    out = {r.k: r for r in rich_club(k5, [1, 3, 4]).collect()}
    assert out[1].phi == 1.0 and out[3].phi == 1.0
    assert (out[1].n_nodes, out[1].n_internal_edges) == (5, 10)
    assert out[4].n_nodes == 0 and out[4].phi is None


def test_rich_club_star_hub_has_no_club(spark):
    """A star's hub is the only node above degree 1: a 1-node club
    has no possible edges → NULL, never 0 or a crash."""
    from ods_to_datalake_spark.operators.graph import rich_club

    star = _edges(spark, [(0, i) for i in range(1, 6)])
    out = {r.k: r for r in rich_club(star, [1]).collect()}
    assert out[1].n_nodes == 1 and out[1].phi is None


def test_rich_club_validates_ks(spark):
    import pytest as _pytest

    from ods_to_datalake_spark.operators.graph import rich_club

    e = _edges(spark, [(1, 2)])
    with _pytest.raises(ValueError):
        rich_club(e, [])
    with _pytest.raises(ValueError):
        rich_club(e, [1, -2])


# --- round-11 fuzz parity for the round-10 graph family (g09-g12) -----------
# (VERDICT r10 ask #5: hand topologies pin known cases; derandomized
# hypothesis vs a pure-Python reference hunts unknown semantic drift —
# the tier that caught real divergences every round since r5.)


def _mk_edges(spark, pairs):
    edges = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs] or [(0, 0)],
        "src long, dst long",
    )
    return edges.limit(0) if not pairs else edges


def _norm_undirected(pairs):
    """Mirror operators.graph._undirected_edges: NULL-free ints in,
    self-loops dropped, one (min, max) row per undirected edge."""
    return {
        (min(a, b), max(a, b)) for a, b in pairs if a != b
    }


def _py_hits(pairs, iterations, scale):
    """Pure-Python mirror of hits_integer: directed distinct edges,
    synchronous half-steps, integer divide-first max-normalization
    (x_raw div max(1, m div scale)); inner-join semantics — an edge
    whose from-side node is absent from the score frame contributes
    nothing."""
    edges = {(a, b) for a, b in pairs}
    nodes = {n for e in edges for n in e}

    def half(scores, from_idx, to_idx):
        raw: dict = {}
        for e in edges:
            if e[from_idx] in scores:
                raw[e[to_idx]] = raw.get(e[to_idx], 0) + scores[e[from_idx]]
        if not raw:
            return {}
        denom = max(1, max(raw.values()) // scale)
        return {n: v // denom for n, v in raw.items()}

    h = {n: scale for n in nodes}
    a: dict = {}
    for _ in range(iterations):
        a = half(h, 0, 1)
        h = half(a, 1, 0)
    return {n: (h.get(n, 0), a.get(n, 0)) for n in nodes}


def test_hits_matches_python_reference(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from ods_to_datalake_spark.operators.graph import (
        HITS_SCALE,
        hits_integer,
    )

    @settings(
        max_examples=8,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pairs=st.lists(
            st.tuples(st.integers(0, 7), st.integers(0, 7)),
            min_size=0,
            max_size=20,
        ),
        iterations=st.integers(1, 3),
    )
    def check(pairs, iterations):
        got = {
            r.node: (r.hub, r.authority)
            for r in hits_integer(
                _mk_edges(spark, pairs), iterations=iterations
            ).collect()
        }
        assert got == _py_hits(pairs, iterations, HITS_SCALE)

    check()


def _py_bfs(pairs, seeds, max_hops):
    e = _norm_undirected(pairs)
    adj: dict = {}
    for a, b in e:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in set(seeds)}
    frontier = set(dist)
    for r in range(1, max_hops + 1):
        nxt = {
            m for n in frontier for m in adj.get(n, ()) if m not in dist
        }
        if not nxt:
            break
        dist.update({m: r for m in nxt})
        frontier = nxt
    return dist


def test_bfs_layers_matches_python_reference(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from ods_to_datalake_spark.operators.graph import bfs_layers

    @settings(
        max_examples=8,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pairs=st.lists(
            st.tuples(st.integers(0, 7), st.integers(0, 7)),
            min_size=0,
            max_size=20,
        ),
        seeds=st.lists(st.integers(0, 7), min_size=1, max_size=3),
        max_hops=st.integers(0, 4),
    )
    def check(pairs, seeds, max_hops):
        seed_df = spark.createDataFrame(
            [(int(s),) for s in seeds], "node long"
        )
        got = {
            r.node: r.dist
            for r in bfs_layers(
                _mk_edges(spark, pairs), seed_df, max_hops=max_hops
            ).collect()
        }
        assert got == _py_bfs(pairs, seeds, max_hops)

    check()


def _py_modularity(pairs, labels):
    """Mirror operators.graph.modularity: per-community
    (n_nodes, internal_edges, degree_sum, contribution) + global Q;
    only labeled nodes WITH edges count toward n_nodes/degree_sum, an
    edge is internal iff BOTH endpoints carry the same label."""
    e = _norm_undirected(pairs)
    m = len(e)
    deg: dict = {}
    for a, b in e:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    per_c: dict = {}
    for n, d in deg.items():
        if n in labels:
            c = labels[n]
            nn, ds = per_c.get(c, (0, 0))
            per_c[c] = (nn + 1, ds + d)
    internal: dict = {}
    for a, b in e:
        if a in labels and b in labels and labels[a] == labels[b]:
            internal[labels[a]] = internal.get(labels[a], 0) + 1
    num = {
        c: 4 * m * internal.get(c, 0) - ds * ds
        for c, (nn, ds) in per_c.items()
    }
    den = 4 * m * m
    q = sum(num.values()) / den if per_c else None
    return {
        c: (
            nn,
            internal.get(c, 0),
            ds,
            num[c] / den,
            q,
        )
        for c, (nn, ds) in per_c.items()
    }


def test_modularity_matches_python_reference(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from ods_to_datalake_spark.operators.graph import modularity

    @settings(
        max_examples=8,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pairs=st.lists(
            st.tuples(st.integers(0, 7), st.integers(0, 7)),
            min_size=1,
            max_size=20,
        ),
        # partial labeling into 3 communities; unlabeled endpoints are
        # external by definition (the operator's documented rule)
        labeled=st.dictionaries(
            st.integers(0, 7), st.integers(100, 102), max_size=8
        ),
    )
    def check(pairs, labeled):
        lab_df = spark.createDataFrame(
            [(int(n), int(c)) for n, c in labeled.items()] or [(0, 0)],
            "node long, label long",
        )
        if not labeled:
            lab_df = lab_df.limit(0)
        got = {
            r.community: (
                r.n_nodes,
                r.internal_edges,
                r.degree_sum,
                r.contribution,
                r.modularity,
            )
            for r in modularity(_mk_edges(spark, pairs), lab_df).collect()
        }
        assert got == _py_modularity(pairs, labeled)

    check()


def _py_rich_club(pairs, ks):
    e = _norm_undirected(pairs)
    deg: dict = {}
    for a, b in e:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    out = {}
    for k in ks:
        n_k = sum(1 for d in deg.values() if d > k)
        e_k = sum(1 for a, b in e if min(deg[a], deg[b]) > k)
        phi = (2 * e_k) / (n_k * (n_k - 1)) if n_k >= 2 else None
        out[k] = (n_k, e_k, phi)
    return out


def test_rich_club_matches_python_reference(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from ods_to_datalake_spark.operators.graph import rich_club

    @settings(
        max_examples=8,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pairs=st.lists(
            st.tuples(st.integers(0, 7), st.integers(0, 7)),
            min_size=0,
            max_size=20,
        ),
        ks=st.lists(
            st.integers(0, 5), min_size=1, max_size=4, unique=True
        ),
    )
    def check(pairs, ks):
        got = {
            r.k: (r.n_nodes, r.n_internal_edges, r.phi)
            for r in rich_club(_mk_edges(spark, pairs), ks).collect()
        }
        assert got == _py_rich_club(pairs, ks)

    check()


# --- local clustering coefficient (g13) --------------------------------------


def _cc(spark, pairs):
    from ods_to_datalake_spark.operators.graph import (
        clustering_coefficient,
    )

    return {
        r.node: (r.degree, r.n_triangles, r.clustering)
        for r in clustering_coefficient(_mk_edges(spark, pairs)).collect()
    }


def test_clustering_k4_is_all_one(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = _cc(spark, k4)
    assert got == {n: (3, 3, 1.0) for n in range(4)}


def test_clustering_star_is_zero_center_null_leaves(spark):
    star = [(0, i) for i in range(1, 5)]
    got = _cc(spark, star)
    assert got[0] == (4, 0, 0.0)
    for leaf in range(1, 5):
        assert got[leaf] == (1, 0, None)


def test_clustering_triangle_with_pendant(spark):
    # triangle 1-2-3 plus pendant 3-4: node 3 has degree 3, one of
    # its three neighbor pairs connected -> 1/3; the pendant is NULL
    got = _cc(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (2, 1, 1.0)
    assert got[3] == (3, 1, 1.0 / 3.0)
    assert got[4] == (1, 0, None)


def test_clustering_corner_sum_is_three_triangles(spark):
    from ods_to_datalake_spark.operators.graph import triangle_count

    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3), (2, 4)]
    got = _cc(spark, pairs)
    n_tri = triangle_count(_mk_edges(spark, pairs)).collect()[0][0]
    assert sum(t for _, t, _ in got.values()) == 3 * n_tri


def _py_clustering(pairs):
    e = _norm_undirected(pairs)
    adj: dict = {}
    for a, b in e:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for n, nbrs in adj.items():
        d = len(nbrs)
        t = sum(
            1
            for x in nbrs
            for y in nbrs
            if x < y and (min(x, y), max(x, y)) in e
        )
        out[n] = (d, t, 2.0 * t / (d * (d - 1)) if d >= 2 else None)
    return out


def test_clustering_matches_python_reference(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=8,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pairs=st.lists(
            st.tuples(st.integers(0, 7), st.integers(0, 7)),
            min_size=0,
            max_size=20,
        )
    )
    def check(pairs):
        assert _cc(spark, pairs) == _py_clustering(pairs)

    check()


# --- degree histogram (g14) --------------------------------------------------


def test_degree_histogram_path_graph(spark):
    from ods_to_datalake_spark.operators.graph import degree_histogram

    # P4: degrees 1,2,2,1 -> histogram {1: 2, 2: 2}
    got = {
        r.degree: (r.n_nodes, r.node_share, r.ccdf)
        for r in degree_histogram(
            _mk_edges(spark, [(1, 2), (2, 3), (3, 4)])
        ).collect()
    }
    assert got == {1: (2, 0.5, 1.0), 2: (2, 0.5, 0.5)}


def test_degree_histogram_empty_and_dup_edges(spark):
    from ods_to_datalake_spark.operators.graph import degree_histogram

    assert degree_histogram(_mk_edges(spark, [])).count() == 0
    # direction/dup/self-loop normalization shared with every g-op
    got = {
        r.degree: r.n_nodes
        for r in degree_histogram(
            _mk_edges(spark, [(1, 2), (2, 1), (1, 1), (1, 2)])
        ).collect()
    }
    assert got == {1: 2}


def _py_degree_histogram(pairs):
    e = _norm_undirected(pairs)
    deg: dict = {}
    for a, b in e:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    hist: dict = {}
    for d in deg.values():
        hist[d] = hist.get(d, 0) + 1
    n = len(deg)
    out = {}
    for d, c in hist.items():
        ge = sum(cc for dd, cc in hist.items() if dd >= d)
        out[d] = (c, c / n, ge / n)
    return out


def test_degree_histogram_matches_python_reference(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from ods_to_datalake_spark.operators.graph import degree_histogram

    @settings(
        max_examples=8,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pairs=st.lists(
            st.tuples(st.integers(0, 7), st.integers(0, 7)),
            min_size=0,
            max_size=20,
        )
    )
    def check(pairs):
        got = {
            r.degree: (r.n_nodes, r.node_share, r.ccdf)
            for r in degree_histogram(_mk_edges(spark, pairs)).collect()
        }
        assert got == _py_degree_histogram(pairs)

    check()


# --- Katz centrality (g15) -----------------------------------------------


def test_katz_path_hand_case_and_no_in_edges(spark):
    from ods_to_datalake_spark.operators.graph import katz_centrality

    # a -> b -> c, alpha = 1/2, beta = scale = 8, 2 rounds:
    # r1: a=8, b=8+8//2=12, c=8+8//2=12
    # r2: a=8, b=8+r1(a)//2=12, c=8+r1(b)//2=14
    edges = _mk_edges(spark, [(1, 2), (2, 3)])
    out = {
        r.node: r.r
        for r in katz_centrality(
            edges, iterations=2, scale=8, alpha_num=1, alpha_den=2
        ).collect()
    }
    assert out == {1: 8, 2: 12, 3: 14}

    # NULL endpoints dropped; a node with no in-edges holds beta
    e2 = spark.createDataFrame(
        [(1, 2), (None, 9), (9, None)], "src long, dst long"
    )
    out2 = {
        r.node: r.r
        for r in katz_centrality(
            e2, iterations=3, scale=100, alpha_num=1, alpha_den=4
        ).collect()
    }
    assert out2[1] == 100 and out2[2] == 125
    assert 9 not in out2  # both its edges had a NULL endpoint


def _py_katz(pairs, iterations, scale, num, den):
    """Pure-Python mirror of katz_centrality: DIRECTED edges taken as
    given (a repeated edge contributes twice — dedup is the caller's
    contract, like pagerank), x' = scale + (num * sum-in) // den."""
    nodes = {n for e in pairs for n in e}
    r = {n: scale for n in nodes}
    for _ in range(iterations):
        sums: dict = {}
        for a, b in pairs:
            sums[b] = sums.get(b, 0) + r[a]
        r = {
            n: scale + (num * sums.get(n, 0)) // den for n in nodes
        }
    return r


def test_katz_matches_python_reference(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from ods_to_datalake_spark.operators.graph import katz_centrality

    @settings(
        max_examples=8,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pairs=st.lists(
            st.tuples(st.integers(0, 7), st.integers(0, 7)),
            min_size=1,
            max_size=20,
        ),
        iterations=st.integers(1, 3),
    )
    def check(pairs, iterations):
        got = {
            r.node: r.r
            for r in katz_centrality(
                _mk_edges(spark, pairs),
                iterations=iterations,
                scale=1000,
                alpha_num=1,
                alpha_den=8,
            ).collect()
        }
        assert got == _py_katz(pairs, iterations, 1000, 1, 8)

    check()
