"""Iterative graph analytics beyond connected components
(`dedup.connected_components`): PageRank over an edge table, in EXACT
integer arithmetic so the fixed-iteration result is engine- and
partitioning-independent.

Why integer: float PageRank sums contributions in partition order —
no cross-engine (or even run-to-run shuffle-order) bit stability.
Ranks here are BIGINTs scaled by ``scale`` (default 10^12): the
per-edge contribution is ``r div outdeg`` (truncating integer
division — DuckDB's ``//`` and Spark's ``div`` agree for
non-negative operands, CLAUDE.md), the damping is an integer
num/den split, and the BIGINT sum is exact and order-free. The cost
is a deterministic ≤1-ulp-ish truncation drip per node per iteration
(bounded by iterations · outdeg / scale ~ 1e-10 of total mass) —
invisible at ranking granularity, and the same in every engine.

Semantics: the standard damped update
    r'(v) = (1-d)/N + d * Σ_{u→v} r(u)/outdeg(u)
over a fixed iteration count. ``redistribute_dangling=True`` adds the
standard sink-mass term — every node also receives
``d * (Σ_{sinks} r(u)) / N`` — so total mass is conserved on directed
graphs with sinks (web/citation/follower graphs have them on day
one). The dangling-node SET is loop-invariant (nodes absent from the
out-degree table, computed once); only its 1-row rank sum is
re-aggregated per round and broadcast via crossJoin — integer-exact
``dangling_sum div n`` inside the same truncating arithmetic.
Default False keeps the simplified variant (feed symmetric edges if
every node should have out-degree, as the registered g01 trade graph
does; g02 exercises the conserving variant on a DAG whose sinks
would otherwise bleed ~all mass).

Scale shape: each iteration is one src-keyed equi-join (rank ⋈
edges+outdeg) and one dst-keyed partial-aggregated sum — 2 keyed
shuffles per iteration over the edge table, nodes-sized state. At
real scale, bucket the edge table by src (sources/writer bucketed
tables) so the join side of every iteration is co-located, and
localCheckpoint the rank frame every few iterations (the
connected_components rule) — with a small fixed iteration count the
plan stays shallow enough to skip that here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark import StorageLevel as _SL

# Graph-scale checkpoints (edge tables, adjacency, per-round peel/label
# state) store DISK_ONLY: localCheckpoint's default memory-resident
# blocks are never freed across rounds/reps — the g01 e_deg OOM
# precedent (CLAUDE.md), re-confirmed when the 30× g03 stress cell
# OOMed the 8g heap on memory-resident edge checkpoints. Disk blocks
# cost nothing on-heap and each frame is read back at most a few
# times. Nodes-sized PageRank state keeps the default (measured fine).
_DISK_ONLY = _SL.DISK_ONLY

PR_SCALE = 10**12
PR_NUM, PR_DEN = 85, 100  # damping d = 0.85 as an integer split

# Katz: attenuation alpha = 1/8 as an integer split; scale chosen so
# the truncated walk sum stays well inside BIGINT at realistic
# in-degrees (worst value ~ KZ_SCALE * (max_indeg/8)^rounds — see
# katz_centrality's headroom note)
KZ_SCALE = 10**9
KZ_NUM, KZ_DEN = 1, 8


# Edge-count ceiling for broadcasting the oriented edge table into the
# triangle/clustering wedge-closure joins. NOTE the cap covers TWO
# concurrent broadcasts (the probe side o2 with its kv struct AND the
# closing pair set), and hashed-relation overhead is several times the
# raw ~24 B/row — at the ceiling, budget on the order of 1-2 GB
# resident on the driver and every executor (guide §3.1; still well
# under the 8 GB cap, but size deployments accordingly). Overridable
# per deployment; above it the wedge stream falls back to shuffled
# joins.
_BCAST_EDGE_MAX = int(
    os.environ.get("SPARK_GRAFT_TRIANGLE_BCAST_MAX_EDGES", str(8_000_000))
)


def _edge_count(oriented: "DataFrame") -> int:
    """Row count of the (checkpointed) oriented edge table — a cheap
    metadata-ish job, used only to pick the wedge-closure join
    strategy (the same runtime-statistics adaptivity AQE applies to
    ordinary joins, which cannot see through the checkpoint here)."""
    return oriented.count()


def _undirected_edges(
    edges: "DataFrame", src: str, dst: str, assume_distinct: bool = False
) -> "DataFrame":
    """Shared input normalization for every undirected-graph operator
    (triangle_count / label_propagation / link_prediction / k_core /
    assortativity and their reports): any direction/duplication
    accepted, NULL endpoints and self-loops dropped, one row per
    undirected edge as (__a < __b). One definition so the operators
    documented as sharing this normalization cannot drift apart (and
    a report can never count different edges than its capped
    operator drops).

    ``assume_distinct=True`` skips only the final ``.distinct()`` — a
    full edge-stream Exchange — for callers whose input is ALREADY one
    row per undirected edge (e.g. `basket.cooccurrence` output, which
    is a grouped (a < b) pair table by construction). The null/self-
    loop filter and least/greatest orientation are map-side cheap and
    always applied, so a wrong attestation degrades to duplicate
    counting, never to mis-oriented edges."""
    normalized = (
        edges.select(
            F.col(src).alias("__a"), F.col(dst).alias("__b")
        )
        .where(
            F.col(src).isNotNull()
            & F.col(dst).isNotNull()
            & (F.col(src) != F.col(dst))
        )
        .select(
            F.least("__a", "__b").alias("__a"),
            F.greatest("__a", "__b").alias("__b"),
        )
    )
    return normalized if assume_distinct else normalized.distinct()


def pagerank_integer(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    scale: int = PR_SCALE,
    damping_num: int = PR_NUM,
    damping_den: int = PR_DEN,
    redistribute_dangling: bool = False,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Fixed-iteration integer PageRank over ``edges`` (directed,
    deduplicated by the caller). Returns (node, r) with r the scaled
    BIGINT rank. Nodes = src ∪ dst; NULL endpoints are dropped.

    ``seeds`` (a 1-column node frame) switches to PERSONALIZED
    PageRank: the teleport mass — the (1-d) base term, the initial
    distribution, and (with ``redistribute_dangling``) the sink
    redistribution — lands uniformly on the SEED set instead of all
    nodes, so ranks measure importance RELATIVE to the seeds (the
    similar-items / trust-propagation variant). No seeds is exactly
    the seeds=all-nodes special case: the same code path with the
    seed flag constant-1 produces bit-identical ranks to the classic
    update (unit-tested), so g01/g02's oracles are untouched."""
    e = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d")
    ).where(F.col(src).isNotNull() & F.col(dst).isNotNull())
    nodes = (
        e.select(F.col("__s").alias("node"))
        .union(e.select(F.col("__d").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy(F.col("__s").alias("node")).agg(
        F.count(F.lit(1)).alias("__outdeg")
    )
    n = nodes.count()  # one driver-sized number, like k-seeds/minmax
    if n == 0:
        return nodes.select(
            "node", F.lit(0).cast("long").alias("r")
        )
    if seeds is None:
        flagged = nodes.withColumn("__seed", F.lit(1))
        s_count = n
    else:
        seed_nodes = (
            seeds.select(F.col(seeds.columns[0]).alias("node"))
            .where(F.col("node").isNotNull())
            .distinct()
        )
        # nodes-sized, loop-invariant — checkpoint once (the
        # dangling-set rule below)
        flagged = nodes.join(
            seed_nodes.withColumn("__seed", F.lit(1)), "node", "left"
        ).select(
            "node", F.coalesce("__seed", F.lit(0)).alias("__seed")
        ).localCheckpoint()
        s_count = flagged.where(F.col("__seed") == 1).count()
        if s_count == 0:
            raise ValueError("no seed overlaps the graph's nodes")
    base = ((damping_den - damping_num) * scale) // (
        damping_den * s_count
    )
    # edges ⋈ outdeg is loop-invariant: materialize it ONCE so each
    # round pays only the rank join + the dst agg. DISK_ONLY persist,
    # not localCheckpoint: the edge table is corpus-scale (30M rows at
    # the 100x stress cell) and memory-resident checkpoint blocks are
    # never freed across repeated builds — measured OOM of the 8g
    # driver heap on the 6th rebuild; disk blocks cost nothing on-heap
    # and unpersist explicitly below
    from pyspark import StorageLevel

    e_deg = (
        e.join(outdeg, e["__s"] == outdeg["node"])
        .select("__s", "__d", "__outdeg")
        .persist(StorageLevel.DISK_ONLY)
    )
    ranks = flagged.select(
        "node",
        F.when(F.col("__seed") == 1, F.lit(scale // s_count))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("r"),
    )
    if redistribute_dangling:
        # loop-invariant sink set: nodes with no out-edges. Nodes-
        # sized; checkpointed once so each round's semi-join against
        # it reads a materialized frame, not the node-build lineage
        dangling = nodes.join(
            outdeg, "node", "left_anti"
        ).localCheckpoint()
    for _ in range(iterations):
        contrib = (
            e_deg.join(ranks, e_deg["__s"] == ranks["node"])
            .select(
                F.col("__d").alias("node"),
                F.expr("r div __outdeg").alias("__c"),
            )
        )
        sums = contrib.groupBy("node").agg(
            F.sum("__c").alias("__sum")
        )
        if redistribute_dangling:
            # 1-row dangling rank sum, broadcast to every node via
            # crossJoin — the per-iteration "one 1-row broadcast";
            # the semi-join moves sink ranks only
            dang = ranks.join(dangling, "node", "left_semi").agg(
                F.coalesce(F.sum("r"), F.lit(0))
                .cast("long")
                .alias("__dang")
            )
            received = (
                "coalesce(__sum, 0L) + (case when __seed = 1"
                f" then __dang div {s_count} else 0L end)"
            )
            joined = flagged.join(sums, "node", "left").crossJoin(
                F.broadcast(dang)
            )
        else:
            received = "coalesce(__sum, 0L)"
            joined = flagged.join(sums, "node", "left")
        ranks = (
            joined
            .select(
                "node",
                (
                    F.when(
                        F.col("__seed") == 1, F.lit(base)
                    ).otherwise(F.lit(0))
                    + F.expr(
                        f"({damping_num} * ({received}))"
                        f" div {damping_den}"
                    )
                ).cast("long").alias("r"),
            )
            # truncate lineage every round (the connected_components
            # rule, CLAUDE.md): without this, iteration k's plan
            # re-contains iterations 1..k-1 and the Exchange count
            # grows O(k^2) — measured 65 exchanges for 5 iterations
            # vs 2 per round checkpointed; the frame is nodes-sized
            .localCheckpoint()
        )
    # the returned ranks are checkpointed (independent of e_deg) —
    # release the edge blocks instead of leaking one copy per call
    e_deg.unpersist()
    return ranks


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    assume_distinct: bool = False,
) -> DataFrame:
    """Exact global triangle count over an UNDIRECTED edge list (any
    direction/duplication in the input; self-loops dropped) — one row
    ``(n_triangles)``.

    EAGER at construction: building this frame materializes the edge
    and oriented checkpoints and runs a strategy-picking edge count —
    Spark jobs execute before the caller's first action (so plan
    capture is not free for this operator).

    Degree-ordered orientation (the compact-forward / Latapy bound,
    standard since Schank & Wagner 2005): each undirected edge points
    from its lower-(degree, id) endpoint to the higher, so every
    wedge join fans out of a node's HIGHER-degree-or-id neighbors
    only — out-degree is O(√m) on any graph, which is what keeps a
    celebrity node (degree 10⁷ in a follower graph) from emitting
    10¹⁴ wedges the way id-ordering would. Each triangle is counted
    exactly once, at its lowest-ordered corner.

    Plan: degree agg (map-side partial), orientation map, one
    self-join on the wedge apex, one semi-ish join closing (v, w)
    against the oriented edges — all equi-joins on node keys, no
    windows, no driver state. Ordering compares (degree, id) structs
    directly (a global rank would be a single-partition window).
    The edge and oriented tables each feed 2-3 plan legs, so both are
    localCheckpoint-materialized (the x25 funnel-truncation pattern —
    uncheckpointed, every leg re-ran the whole upstream edge build:
    77 Exchanges measured vs 5 checkpointed; in a lake pipeline the
    oriented edge table is the persisted artifact)."""
    e = _undirected_edges(
        edges, src, dst, assume_distinct=assume_distinct
    ).localCheckpoint(eager=True, storageLevel=_DISK_ONLY)
    deg, oriented = _degree_oriented(e)
    o1 = oriented.select("u", "v", "kv")
    o2 = oriented.select(
        F.col("u").alias("u2"),
        F.col("v").alias("w"),
        F.col("kv").alias("kw"),
    )
    closing = oriented.select(
        F.col("u").alias("v"), F.col("v").alias("w")
    )
    # The wedge stream is the quadratic term (Σ C(out_deg, 2) rows —
    # measured 41M rows off 1.2M edges on the dense co-purchase graph
    # at sf0.1) and only the closing join's survivors matter (4.6%
    # there). Shuffling+sorting it for a sort-merge close was ~half of
    # g03's wall clock (guide §2.3/§3.2: never shuffle a stream you
    # can pre-filter with edge-scale state). When the EDGE table is
    # broadcastable, broadcast-hash both the wedge self-join's probe
    # side and the closing edge set: the wedge stream is then never
    # exchanged at all — it is generated, probed against the closing
    # hash and partially counted inside one map stage. The threshold
    # gates on measured edge COUNT (the checkpoint makes the count
    # free), not on local core count: clusters broadcast a few hundred
    # MB routinely (guide §3.1); beyond it (the 100-TB path) the plan
    # falls back to shuffled joins with a shuffled-hash close so the
    # 41M-row stream is at least never SORTED.
    if _edge_count(oriented) <= _BCAST_EDGE_MAX:
        o2, closing = F.broadcast(o2), F.broadcast(closing)
    else:
        closing = closing.hint("shuffle_hash")
    wedges = o1.join(
        o2, (F.col("u") == F.col("u2")) & (F.col("kv") < F.col("kw"))
    ).select("v", "w")
    return wedges.join(closing, ["v", "w"], "inner").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


def _degree_oriented(e: DataFrame):
    """(degree frame, degree-oriented edge frame) shared by
    triangle_count and clustering_coefficient: each undirected edge of
    the pre-normalized ``e`` points from its lower-(degree, id)
    endpoint ``u`` to the higher ``v``, carrying ``kv`` = the (degree,
    id) struct of ``v`` for wedge ordering. The oriented table is
    DISK_ONLY-checkpointed (it feeds 2-3 plan legs — the x25/r9
    rule)."""
    deg = (
        e.select(F.col("__a").alias("node"))
        .union(e.select("__b"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("__deg"))
    )
    with_deg = (
        e.join(deg.withColumnRenamed("node", "__a"), "__a")
        .withColumnRenamed("__deg", "__da")
        .join(
            deg.select(
                F.col("node").alias("__b"),
                F.col("__deg").alias("__db"),
            ),
            "__b",
        )
    )
    lower_first = (
        F.struct(F.col("__da"), F.col("__a"))
        < F.struct(F.col("__db"), F.col("__b"))
    )
    oriented = with_deg.select(
        F.when(lower_first, F.col("__a"))
        .otherwise(F.col("__b"))
        .alias("u"),
        F.when(lower_first, F.col("__b"))
        .otherwise(F.col("__a"))
        .alias("v"),
        F.when(
            lower_first,
            F.struct(
                F.col("__db").alias("d"), F.col("__b").alias("i")
            ),
        )
        .otherwise(
            F.struct(
                F.col("__da").alias("d"), F.col("__a").alias("i")
            )
        )
        .alias("kv"),
    ).localCheckpoint(eager=True, storageLevel=_DISK_ONLY)
    return deg, oriented


def clustering_coefficient(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    assume_distinct: bool = False,
) -> DataFrame:
    """(node, degree, n_triangles, clustering) — exact per-node local
    clustering coefficient C(n) = 2·T(n) / (d(n)·(d(n)−1)) over the
    undirected graph (Watts & Strogatz 1998): of a node's possible
    neighbor pairs, the fraction that are themselves connected — the
    per-node "is my neighborhood a clique or a star" signal behind
    community cores, spam/bot-ring detection (rings are near-cliques),
    and the small-world diagnostic; g03's single global count answers
    "how many triangles", this answers "whose".

    Triangle attribution: the same degree-ordered compact-forward
    wedge join as `triangle_count` (one definition via
    `_degree_oriented` — the O(√m) fan-out bound is what survives a
    celebrity node at 100 TB), but each closed triangle (u, v, w)
    credits ALL THREE corners (explode), so Σ_n T(n) = 3·triangles.
    Nodes in no triangle read 0; degree-1 nodes (and isolated
    endpoints of dropped self-loops) have no neighbor pairs — their
    coefficient is NULL (no evidence), not 0, CASE-guarded like
    rich_club's Φ.

    Exactness: counts exact BIGINTs; the denominator d·(d−1)
    multiplies in DECIMAL(38,0) (crosses int64 at d ~3e9);
    ``clustering`` is ONE IEEE division per node. Scale: degree agg +
    two node-keyed equi-joins + the wedge join (all shared with g03's
    shape), one corner explode (3 rows per triangle), one node-keyed
    count, one node-keyed left join back to the degree table.

    EAGER at construction, like `triangle_count`: checkpoint
    materialization + the strategy-picking edge count run Spark jobs
    before the caller's first action."""
    d38 = "decimal(38,0)"
    e = _undirected_edges(
        edges, src, dst, assume_distinct=assume_distinct
    ).localCheckpoint(eager=True, storageLevel=_DISK_ONLY)
    deg, oriented = _degree_oriented(e)
    o1 = oriented.select("u", "v", "kv")
    o2 = oriented.select(
        F.col("u").alias("u2"),
        F.col("v").alias("w"),
        F.col("kv").alias("kw"),
    )
    # same wedge-closure strategy switch as triangle_count (see there):
    # broadcast the edge-scale sides when they fit so the quadratic
    # wedge stream is generated, closed and partially counted in one
    # map stage instead of shuffled+sorted; shuffled-hash fallback.
    bcast = _edge_count(oriented) <= _BCAST_EDGE_MAX
    if bcast:
        o2 = F.broadcast(o2)
    wedges = o1.join(
        o2, (F.col("u") == F.col("u2")) & (F.col("kv") < F.col("kw"))
    ).select("u", "v", "w")
    closing = oriented.select(
        F.col("u").alias("v"), F.col("v").alias("w")
    )
    if bcast:
        closing = F.broadcast(closing)
    else:
        closing = closing.hint("shuffle_hash")
    corners = (
        wedges.join(closing, ["v", "w"], "inner")
        .select(
            F.explode(
                F.array(F.col("u"), F.col("v"), F.col("w"))
            ).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    return deg.join(corners, "node", "left").select(
        "node",
        F.col("__deg").alias("degree"),
        F.coalesce("n_triangles", F.lit(0))
        .cast("long")
        .alias("n_triangles"),
        F.when(
            F.col("__deg") >= 2,
            (
                F.lit(2).cast(d38)
                * F.coalesce("n_triangles", F.lit(0)).cast(d38)
            ).cast("double")
            / (
                F.col("__deg").cast(d38)
                * (F.col("__deg").cast(d38) - F.lit(1).cast(d38))
            ).cast("double"),
        ).alias("clustering"),
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 4,
) -> DataFrame:
    """(node, label) after ``rounds`` of SYNCHRONOUS label propagation
    (Raghavan et al. 2007) over the undirected graph: labels start as
    node ids; each round every node adopts the label most frequent
    among its neighbors, ties broken to the SMALLEST label. The
    community-detection baseline one step up from connected
    components (which this degenerates to on disconnected cliques).

    Fixed-round semantics on purpose: asynchronous LPA is
    update-order-dependent and synchronous LPA can oscillate on
    bipartite structures, so "run to convergence" is not well-defined
    — the deterministic object is the label state after exactly R
    synchronous rounds, which both the operator and the unrolled
    oracle compute. Determinism inside a round: the (count DESC,
    label ASC) argmax is a total order; all arithmetic is integer.

    Scale shape: per round ONE neighbor-label join (the bidirectional
    edge table against the label frame, node-keyed) + one
    (node, label) partial-agg count + one per-node min-struct argmax
    (never a window over the neighbor stream); labels frame is
    nodes-sized and localCheckpointed per round (the g01/components
    lineage rule). The bidirectional edge table is loop-invariant —
    materialized once, like g01's e_deg."""
    e = _undirected_edges(edges, src, dst)
    ee = (
        e.unionByName(
            e.select(
                F.col("__b").alias("__a"), F.col("__a").alias("__b")
            )
        )
        .localCheckpoint(eager=True, storageLevel=_DISK_ONLY)
    )
    labels = ee.select(F.col("__a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(rounds):
        nb = ee.join(
            labels.select(
                F.col("node").alias("__b"), F.col("label")
            ),
            "__b",
        ).select(F.col("__a").alias("node"), "label")
        cnt = nb.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("__c")
        )
        labels = (
            cnt.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("__c")).alias("__nc"),
                        F.col("label").alias("__l"),
                    )
                ).alias("__top")
            )
            .select("node", F.col("__top.__l").alias("label"))
            .localCheckpoint(eager=True, storageLevel=_DISK_ONLY)
        )
    return labels


def link_prediction_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: int | None = None,
) -> DataFrame:
    """Classic neighborhood link-prediction scores (Liben-Nowell &
    Kleinberg 2003) for every NON-adjacent node pair at distance 2 in
    an undirected graph — the "who should connect next" table behind
    friend/item suggestion and graph completion:

        common_neighbors  |Γ(a) ∩ Γ(b)|           (exact BIGINT)
        jaccard           cn / |Γ(a) ∪ Γ(b)|      (one IEEE division)
        adamic_adar       Σ_w 1/ln(deg w)          (hub-discounted cn)
        pref_attachment   deg(a)·deg(b)            (the null model)

    Input normalization matches `triangle_count`/`k_core`: any
    direction/duplication accepted, self-loops dropped. Candidates are
    generated at wedge centers (each common neighbor w emits its
    C(deg w, 2) neighbor pairs), aggregated per pair, then
    anti-joined against the edge set — only distance-2 non-edges
    survive, which is the standard evaluation universe (an existing
    edge needs no prediction; a pair with no common neighbor scores 0
    on every neighborhood statistic and would be |V|²-sized noise).

    Determinism (cross-engine): counts/degrees are exact BIGINTs;
    jaccard = cn/(deg a + deg b − cn) is ONE IEEE division (union is
    ≥ 1 because cn ≥ 1 — never a 0/0); pref_attachment multiplies in
    DECIMAL(38,0) then casts once (the x70 HUGEINT-product rule).
    adamic_adar sums a TRANSCENDENTAL per common neighbor, and a
    double sum is partition-order-dependent — so each term rides the
    x38/x72 quantization discipline end-to-end: ln(deg w) is quantized
    to DECIMAL(18,6) (deg w ≥ 2 by construction — w has two distinct
    neighbors — so ln ≥ ln 2 > 0, never a 1/0), the reciprocal is one
    IEEE division of identical doubles, re-quantized to DECIMAL(18,12),
    and the SUM is decimal — exact and order-free in both engines.

    Scale shape: degree agg (map-side partial) + one wedge self-join
    + one (a,b) partial-agg + one anti-join + two degree joins, all
    node-keyed — no windows, no driver state. The adjacency table
    feeds three legs and the edge set two, so both are
    localCheckpoint-materialized (the x25/g03 rule). The hazard is the
    wedge fan-out: a degree-d hub emits C(d,2) candidate pairs, and
    unlike `triangle_count` the scores NEED every wedge (orientation
    would undercount cn), so the bound is the opt-in ``max_degree``
    cap — drop hub CENTERS before the self-join (standard in the LP
    literature: a mega-hub's endorsement carries ~no signal, which is
    exactly what Adamic-Adar's 1/ln(deg) already encodes) — with
    `oversized_hubs` reporting what a capped run skipped (the
    cap_bucket_width contract). The registered g07 runs uncapped; its
    oracle matches exactly."""
    e = _undirected_edges(edges, src, dst).localCheckpoint(
        eager=True, storageLevel=_DISK_ONLY
    )
    adj = e.select(
        F.col("__a").alias("node"), F.col("__b").alias("nb")
    ).unionByName(
        e.select(
            F.col("__b").alias("node"), F.col("__a").alias("nb")
        )
    ).localCheckpoint(eager=True, storageLevel=_DISK_ONLY)
    # nodes-sized, feeds THREE legs (centers + both endpoint degree
    # joins) — uncheckpointed each leg re-aggregates adj (x25 rule)
    deg = adj.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("__deg")
    ).localCheckpoint(eager=True, storageLevel=_DISK_ONLY)
    centers = adj.join(deg, "node")
    if max_degree is not None:
        centers = centers.filter(F.col("__deg") <= max_degree)
    # per-wedge Adamic-Adar term, quantized BEFORE the sum. Guarded:
    # only deg >= 2 centers can FORM a wedge, but the projection
    # evaluates on every adjacency row BEFORE the self-join filters
    # degree-1 centers out — unguarded, ln(1) = 0 is an ANSI
    # divide-by-zero on rows that never reach the output (caught at
    # sf0.01; the guard can't change any emitted value)
    aa_term = F.when(
        F.col("__deg") >= 2,
        F.lit(1.0)
        / F.log(F.col("__deg").cast("double"))
        .cast("decimal(18,6)")
        .cast("double"),
    ).otherwise(F.lit(0.0)).cast("decimal(18,12)")
    left = centers.select(
        "node", F.col("nb").alias("__pa"), aa_term.alias("__aa")
    )
    right = centers.select("node", F.col("nb").alias("__pb"))
    cand = (
        left.join(right, "node")
        .where(F.col("__pa") < F.col("__pb"))
        .groupBy(
            F.col("__pa").alias("node_a"),
            F.col("__pb").alias("node_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("common_neighbors"),
            F.sum("__aa").alias("__aasum"),
        )
        .join(
            e.select(
                F.col("__a").alias("node_a"),
                F.col("__b").alias("node_b"),
            ),
            ["node_a", "node_b"],
            "left_anti",
        )
    )
    d38 = "decimal(38,0)"
    return (
        cand.join(
            deg.select(
                F.col("node").alias("node_a"),
                F.col("__deg").alias("deg_a"),
            ),
            "node_a",
        )
        .join(
            deg.select(
                F.col("node").alias("node_b"),
                F.col("__deg").alias("deg_b"),
            ),
            "node_b",
        )
        .select(
            "node_a",
            "node_b",
            "deg_a",
            "deg_b",
            "common_neighbors",
            (
                F.col("common_neighbors").cast("double")
                / (
                    F.col("deg_a")
                    + F.col("deg_b")
                    - F.col("common_neighbors")
                ).cast("double")
            ).alias("jaccard"),
            F.col("__aasum").alias("adamic_adar"),
            (
                F.col("deg_a").cast(d38) * F.col("deg_b").cast(d38)
            ).cast("double").alias("pref_attachment"),
        )
    )


def oversized_hubs(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: int = 1000,
) -> DataFrame:
    """(node, degree) for nodes whose degree exceeds ``max_degree`` —
    the wedge centers `link_prediction_scores(max_degree=...)` would
    skip (a degree-d center emits C(d,2) candidates; a capped pipeline
    reports its spills, never silently reads as complete)."""
    e = _undirected_edges(edges, src, dst)
    return (
        e.select(F.col("__a").alias("node"))
        .union(e.select("__b"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .filter(F.col("degree") > max_degree)
    )


def k_core(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 2,
    max_rounds: int = 100,
) -> DataFrame:
    """(node, core_degree): the k-core of an UNDIRECTED graph — the
    maximal subgraph in which every node has degree ≥ k (Seidman
    1983) — with each surviving node's degree INSIDE the core. The
    density filter behind community mining, spam/bot-ring detection,
    and graph sparsification: a node kept by the raw degree filter can
    still be propped up only by about-to-be-deleted neighbors, which
    is exactly why this must iterate (peel) instead of filtering once.

    Input normalization matches `triangle_count`: any direction /
    duplication accepted, self-loops dropped, edges deduplicated
    undirected. The peel is the standard fixpoint: drop nodes with
    degree < k, drop edges touching them, recompute, repeat until no
    node leaves (possibly an empty graph). Deletion is monotone, so
    extra rounds past the fixpoint are no-ops — which is what makes a
    fixed-depth unrolled-CTE oracle exact as long as it unrolls at
    least as many rounds as convergence takes (the g01/x67 oracle
    pattern; the registered g05 asserts its convergence margin in a
    pytest so driver-data drift is caught locally, not as a red row).

    Determinism: pure integer counting — no floats anywhere, so the
    result is partitioning- and engine-independent by construction.

    Scale shape: each round is one degree aggregate (map-side
    partial) + two semi-joins of the edge table against the
    surviving-node set, all keyed on node ids — never a window, never
    a collect of node/edge data. The edge frame is localCheckpointed
    every round (the connected_components O(k²)-Exchange rule) and
    the convergence probe is one aggregated count per round (the same
    1-row driver check as components' changed-label count). Rounds
    needed is the graph's degeneracy ordering depth — typically tens
    on real graphs; `max_rounds` bounds a pathological chain (a path
    graph peels one layer per round) and raises instead of silently
    returning a non-core."""
    e = _undirected_edges(edges, src, dst).localCheckpoint(
        eager=True, storageLevel=_DISK_ONLY
    )

    def degrees(ed: DataFrame) -> DataFrame:
        return (
            ed.select(F.col("__a").alias("node"))
            .union(ed.select("__b"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
        )

    n_nodes = degrees(e).count()
    for _ in range(max_rounds):
        deg = degrees(e)
        keep = deg.filter(F.col("core_degree") >= k)
        n_keep = keep.count()
        if n_keep == n_nodes:
            return deg.filter(F.col("core_degree") >= k)
        if n_keep == 0:
            return keep.select("node", "core_degree")
        n_nodes = n_keep
        e = (
            e.join(
                keep.select(F.col("node").alias("__a")),
                "__a",
                "left_semi",
            )
            .join(
                keep.select(F.col("node").alias("__b")),
                "__b",
                "left_semi",
            )
            .localCheckpoint(eager=True, storageLevel=_DISK_ONLY)
        )
    raise RuntimeError(
        f"k_core did not converge within {max_rounds} rounds"
    )


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """One row (n_nodes, n_edges, assortativity) — Newman's degree
    assortativity coefficient (Newman 2002): the Pearson correlation
    of the degrees at either end of an edge. Positive = hubs link to
    hubs (social networks), negative = hubs link to leaves
    (technological/biological nets, retail co-purchase) — the one
    scalar that says which regime a graph is in, and the first thing
    to check before trusting a degree-based plan bound.

    Over the symmetric directed edge list (each undirected edge in
    both orientations, M = 2m rows; x = deg(u), y = deg(v); by
    symmetry Σx = Σy):

        r = (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²)

    Determinism: every sum is exact DECIMAL(38,0) (degree products
    overflow int64 near 1e9·1e9; the oracle's HUGEINT sums mirror),
    numerator and denominator are exact integer expressions (M·Σxy ~
    1e30 fits precision 38), each casts once through the
    VARCHAR-round-trip rule, and r is ONE IEEE division. A
    degree-regular graph has zero variance — denominator 0 is
    CASE-guarded to NULL in both engines (the cosine/zero-norm rule).

    Scale shape: degree agg + two node-keyed joins decorating the
    edge list with endpoint degrees + ONE global aggregate — no
    windows, no driver state; adjacency and degree tables are
    localCheckpointed (each feeds 2-3 legs, the x25 rule)."""
    e = _undirected_edges(edges, src, dst).localCheckpoint(
        eager=True, storageLevel=_DISK_ONLY
    )
    adj = e.select(
        F.col("__a").alias("node"), F.col("__b").alias("nb")
    ).unionByName(
        e.select(
            F.col("__b").alias("node"), F.col("__a").alias("nb")
        )
    ).localCheckpoint(eager=True, storageLevel=_DISK_ONLY)
    deg = adj.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("__deg")
    ).localCheckpoint(eager=True, storageLevel=_DISK_ONLY)
    d38 = "decimal(38,0)"
    j = (
        adj.join(deg, "node")
        .withColumnRenamed("__deg", "__dx")
        .join(
            deg.select(
                F.col("node").alias("nb"),
                F.col("__deg").alias("__dy"),
            ),
            "nb",
        )
    )
    sums = j.agg(
        F.count(F.lit(1)).cast(d38).alias("__m"),
        F.sum(F.col("__dx").cast(d38)).alias("__sx"),
        F.sum(
            (F.col("__dx").cast(d38) * F.col("__dy").cast(d38))
        ).alias("__sxy"),
        F.sum(
            (F.col("__dx").cast(d38) * F.col("__dx").cast(d38))
        ).alias("__sxx"),
    )
    num = F.col("__m") * F.col("__sxy") - F.col("__sx") * F.col("__sx")
    den = F.col("__m") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    n_nodes = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    n_edges = e.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges")
    )
    return (
        n_nodes.crossJoin(n_edges)
        .crossJoin(F.broadcast(sums))
        .select(
            "n_nodes",
            "n_edges",
            F.when(
                den != F.lit(0).cast(d38),
                num.cast("double") / den.cast("double"),
            ).alias("assortativity"),
        )
    )


HITS_SCALE = 10**6


def hits_integer(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 4,
    scale: int = HITS_SCALE,
) -> DataFrame:
    """(node, hub, authority) after ``iterations`` rounds of HITS
    (Kleinberg 1999) over the DIRECTED edge set, in EXACT integer
    arithmetic — the hub/authority decomposition behind "who
    aggregates the good sources / who are the good sources"; on a
    bipartite buyer→seller graph the hub side ranks buyers by the
    quality-weighted breadth of their supplier set and the authority
    side ranks suppliers by the hubs that buy from them.

    Update (synchronous, mutual recursion): each round
    ``a_raw(v) = Σ_{u→v} h(u)`` then ``h_raw(u) = Σ_{u→v} a(v)``,
    each half-step max-normalized. The float algorithm L2-normalizes
    — partition-order-dependent float sums, not reproducible — so
    this operator normalizes by INTEGER division with the round's
    maximum:

        x = x_raw div max(1, m div scale),   m = max over nodes

    DIVIDE-FIRST on purpose: the naive ``(x_raw · scale) div m``
    overflows BIGINT once max weighted in-degree × scale² exceeds
    2^63 (in-degree ~9e6 at scale 1e6); dividing by the pre-shrunk
    quotient is exact-integer, deterministic under any partitioning,
    keeps every score in [0, 2·scale) (the max node reads
    m div (m div scale) ∈ [scale, 2·scale) once m ≥ scale — ranking
    POSITIONS, the object HITS is used for, are what the contract
    pins; absolute float values were never comparable across
    implementations anyway), and is safe to weighted in-degrees of
    ~9e12. Nodes unreachable by a side (no in-edges / no out-edges)
    score 0 on it.

    Scale shape: per round TWO node-keyed equi-joins (edges against
    the node-sized score frame) + two partial aggs + two 1-row max
    broadcasts; score frames are nodes-sized and localCheckpointed
    per round (the g01 lineage rule — nodes-sized state keeps the
    default storage); the edge table is loop-invariant, materialized
    once DISK_ONLY (graph-scale, the r9 OOM rule). Cites Kleinberg
    1999 (Authoritative sources in a hyperlinked environment)."""
    e = (
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
        .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .distinct()
        .localCheckpoint(eager=True, storageLevel=_DISK_ONLY)
    )
    nodes = (
        e.select(F.col("__s").alias("node"))
        .unionByName(e.select(F.col("__d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True, storageLevel=_DISK_ONLY)
    )
    h = nodes.select(
        "node", F.lit(scale).cast("long").alias("score")
    )
    a = None
    for _ in range(iterations):
        a = _hits_half_step(e, h, "__s", "__d", scale)
        h = _hits_half_step(e, a, "__d", "__s", scale)
    return (
        nodes.join(
            h.select(F.col("node"), F.col("score").alias("hub")),
            "node",
            "left",
        )
        .join(
            a.select(
                F.col("node"), F.col("score").alias("authority")
            ),
            "node",
            "left",
        )
        .select(
            "node",
            F.coalesce("hub", F.lit(0)).cast("long").alias("hub"),
            F.coalesce("authority", F.lit(0))
            .cast("long")
            .alias("authority"),
        )
    )


def _hits_half_step(
    e: DataFrame, scores: DataFrame, from_col: str, to_col: str,
    scale: int,
) -> DataFrame:
    """One HITS half-step: fold `scores` across edges from `from_col`
    onto `to_col`, then integer max-normalize (module contract)."""
    raw = (
        e.join(
            scores.select(
                F.col("node").alias(from_col), F.col("score")
            ),
            from_col,
        )
        .groupBy(F.col(to_col).alias("node"))
        .agg(F.sum("score").cast("long").alias("__raw"))
    )
    m = raw.agg(F.max("__raw").alias("__m"))
    return (
        raw.crossJoin(F.broadcast(m))
        .select(
            "node",
            F.expr(
                f"__raw div greatest(CAST(1 AS BIGINT),"
                f" __m div CAST({scale} AS BIGINT))"
            ).alias("score"),
        )
        .localCheckpoint(eager=True)
    )


def bfs_layers(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 6,
) -> DataFrame:
    """(node, dist) — exact hop distance from the seed SET over the
    undirected graph, for every node within ``max_hops`` (multi-source
    BFS): the "degrees of separation from a trusted/known cohort"
    feature behind trust propagation, blast-radius analysis, and k-hop
    neighborhood extraction. Deliberately HOP-LIMITED semantics: the
    result is exact for every emitted node and simply omits nodes
    farther than ``max_hops`` — a truncated BFS is a correct k-hop
    query, not an approximation, so there is no fixpoint contract to
    violate (contrast k_core, where stopping early would LIE; here
    rounds past the eccentricity are empty and the loop exits).

    Seeds are distance 0 (deduped, NULLs dropped) whether or not they
    appear in the edge set — an isolated seed is at distance 0 from
    itself. Frontier expansion is level-synchronous: per round ONE
    node-keyed join of the bidirectional edge table against the
    frontier + one anti-join against the visited set — never a
    weighted relaxation (BFS ≡ unit-weight Dijkstra, so layers ARE
    distances). All arithmetic is integers; the result is unique
    regardless of partitioning or visit order.

    Scale: the bidirectional edge table is loop-invariant, DISK_ONLY
    (the r9 rule); visited/frontier are nodes-sized, checkpointed per
    round (the g01 lineage rule); one 1-row emptiness probe per round
    ends the loop at the seed set's eccentricity if that comes before
    ``max_hops``."""
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0: {max_hops}")
    e = _undirected_edges(edges, src, dst)
    ee = (
        e.unionByName(
            e.select(
                F.col("__b").alias("__a"), F.col("__a").alias("__b")
            )
        )
        .localCheckpoint(eager=True, storageLevel=_DISK_ONLY)
    )
    seed_col = seeds.columns[0]
    dist = (
        seeds.select(F.col(seed_col).alias("node"))
        .where(F.col("node").isNotNull())
        .distinct()
        .select("node", F.lit(0).cast("long").alias("dist"))
        .localCheckpoint(eager=True)
    )
    frontier = dist.select("node")
    for r in range(1, max_hops + 1):
        nxt = (
            ee.join(
                frontier.select(F.col("node").alias("__a")), "__a"
            )
            .select(F.col("__b").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .select(
                "node", F.lit(r).cast("long").alias("dist")
            )
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return dist


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
) -> DataFrame:
    """(community, n_nodes, internal_edges, degree_sum, contribution,
    modularity) — Newman–Girvan modularity of a community assignment
    over the undirected graph: per community c,

        Q_c = L_c/m − (D_c / 2m)²

    (L_c intra-community edges, D_c summed degree, m total edges),
    with Q = Σ_c Q_c repeated on every row — the quality number a
    community detector (g06 LPA) ships with, the same
    eval-the-component contract as x78 (LSH recall) and x80 (ANN
    recall): a partition chosen without measuring Q on ITS graph is
    guessing. Q ∈ [−1/2, 1); 0 is the random-graph baseline (Newman
    2004, "Finding and evaluating community structure in networks").

    Exactness: everything is INTEGER until one final division —
    Q_c = (4·m·L_c − D_c²) / (4m²) with the numerator in
    DECIMAL(38,0) (D_c² crosses int64 at D_c ~ 3e9), the per-community
    numerators summed exactly (order-free), and ONE IEEE division per
    emitted value; both operands cross 1e13 at real scale, so the
    oracle VARCHAR-hops its HUGEINT→DOUBLE casts (the u17/CLAUDE
    rule). Edge normalization is the shared `_undirected_edges`
    (dedup, self-loops dropped); only LABELED nodes participate —
    an edge with an unlabeled endpoint is external by definition
    (LPA labels every graph node, so the inner join is total there).

    Scale: the normalized edge table feeds the degree agg and two
    label attachments (3 legs → checkpointed DISK_ONLY, the x25/r9
    rule); labels are node-sized and join node-keyed; everything
    after the two aggs is community-count-sized."""
    e = _undirected_edges(edges, src, dst).localCheckpoint(
        eager=True, storageLevel=_DISK_ONLY
    )
    lab = labels.select(
        F.col(node_col).alias("__n"), F.col(label_col).alias("__c")
    ).where(F.col(node_col).isNotNull())
    m_row = e.agg(F.count(F.lit(1)).cast("long").alias("__m"))
    deg = (
        e.select(F.col("__a").alias("__n"))
        .unionByName(e.select(F.col("__b").alias("__n")))
        .groupBy("__n")
        .agg(F.count(F.lit(1)).cast("long").alias("__d"))
    )
    per_c = (
        deg.join(lab, "__n")
        .groupBy("__c")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("__d").cast("long").alias("degree_sum"),
        )
    )
    la = lab.select(F.col("__n").alias("__a"), F.col("__c").alias("__ca"))
    lb = lab.select(F.col("__n").alias("__b"), F.col("__c").alias("__cb"))
    internal = (
        e.join(la, "__a")
        .join(lb, "__b")
        .where(F.col("__ca") == F.col("__cb"))
        .groupBy(F.col("__ca").alias("__c"))
        .agg(F.count(F.lit(1)).cast("long").alias("internal_edges"))
    )
    d38 = "decimal(38,0)"
    scored = (
        per_c.join(internal, "__c", "left")
        .crossJoin(F.broadcast(m_row))
        .select(
            F.col("__c").alias("community"),
            "n_nodes",
            F.coalesce("internal_edges", F.lit(0))
            .cast("long")
            .alias("internal_edges"),
            "degree_sum",
            (
                F.lit(4).cast(d38)
                * F.col("__m").cast(d38)
                * F.coalesce("internal_edges", F.lit(0)).cast(d38)
                - F.col("degree_sum").cast(d38)
                * F.col("degree_sum").cast(d38)
            ).alias("__num"),
            (
                F.lit(4).cast(d38)
                * F.col("__m").cast(d38)
                * F.col("__m").cast(d38)
            ).alias("__den"),
        )
        .withColumn(
            "contribution",
            F.col("__num").cast("double")
            / F.col("__den").cast("double"),
        )
        .localCheckpoint()  # community-count-sized; feeds report + Q
    )
    q_row = scored.agg(
        F.sum("__num").alias("__qn"), F.max("__den").alias("__qd")
    )
    return scored.crossJoin(F.broadcast(q_row)).select(
        "community",
        "n_nodes",
        "internal_edges",
        "degree_sum",
        "contribution",
        (
            F.col("__qn").cast("double") / F.col("__qd").cast("double")
        ).alias("modularity"),
    )


def rich_club(
    edges: DataFrame,
    ks: list[int],
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(k, n_nodes, n_internal_edges, phi) — rich-club coefficient
    Φ(k) = 2·E_k / (N_k·(N_k−1)) for each degree threshold in ``ks``:
    of the nodes with degree > k, what fraction of their possible
    mutual edges exist (Zhou & Mondragón 2004) — "do the hubs talk to
    each other", the structural question behind core-infrastructure
    detection and influence-concentration audits that degree
    assortativity (g08, a single correlation) summarizes away.

    Exactness: N_k and E_k are exact BIGINT conditional counts; the
    denominator N_k·(N_k−1) multiplies in DECIMAL(38,0) (crosses
    int64 at ~3e9 nodes); Φ is ONE IEEE division per k, CASE-guarded
    NULL when N_k < 2 (no possible edges is no evidence, not Φ = 0).
    An edge is internal iff its MIN endpoint degree > k, so the whole
    k-spine folds in ONE pass over the degree-attached edge table —
    K conditional sums inside a single aggregate, zero per-k joins
    (the table_profile wide-agg shape).

    Scale: the normalized edge table feeds the degree agg and the
    two degree attachments (3 legs → DISK_ONLY checkpoint, the
    x25/r9 rule); after the attachments everything is two 1-row
    aggregates cross-joined and exploded to K rows."""
    if not ks or any(k < 0 for k in ks):
        raise ValueError(f"ks must be non-empty, non-negative: {ks}")
    d38 = "decimal(38,0)"
    e = _undirected_edges(edges, src, dst).localCheckpoint(
        eager=True, storageLevel=_DISK_ONLY
    )
    deg = (
        e.select(F.col("__a").alias("node"))
        .unionByName(e.select(F.col("__b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("__d"))
    )
    da = deg.select(F.col("node").alias("__a"), F.col("__d").alias("__da"))
    db = deg.select(F.col("node").alias("__b"), F.col("__d").alias("__db"))
    em = (
        e.join(da, "__a")
        .join(db, "__b")
        .select(F.least("__da", "__db").alias("__m"))
    )
    # COALESCE each conditional sum: SUM over an EMPTY frame is NULL
    # in Spark while the oracle's COUNT(*) reads 0 (empty-tables tier)
    e_row = em.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("__m") > k, 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias(f"__e_{i}")
            for i, k in enumerate(ks)
        ]
    )
    n_row = deg.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("__d") > k, 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias(f"__n_{i}")
            for i, k in enumerate(ks)
        ]
    )
    wide = e_row.crossJoin(F.broadcast(n_row))
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("long").alias("k"),
                        F.col(f"__n_{i}").alias("n_nodes"),
                        F.col(f"__e_{i}").alias("n_internal_edges"),
                    )
                    for i, k in enumerate(ks)
                ]
            )
        ).alias("r")
    ).select("r.*")
    return stacked.select(
        "k",
        "n_nodes",
        "n_internal_edges",
        F.when(
            F.col("n_nodes") >= 2,
            (F.lit(2).cast(d38) * F.col("n_internal_edges").cast(d38))
            .cast("double")
            / (
                F.col("n_nodes").cast(d38)
                * (F.col("n_nodes").cast(d38) - F.lit(1).cast(d38))
            ).cast("double"),
        ).alias("phi"),
    )


def degree_histogram(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(degree, n_nodes, node_share, ccdf) — the degree distribution of
    the undirected graph with its complementary CDF: what fraction of
    nodes have degree ≥ d — the first plot read off ANY large graph
    (is the tail power-law-ish? where does it cut off? how many
    singletons-after-normalization?) and the panel g08's single
    assortativity number and g12's thresholded Φ(k) both summarize:
    g12 asks "do the top-k hubs interlink", this says how many nodes
    ARE above each k in the first place.

    Exactness: degrees and bucket counts are exact BIGINTs;
    node_share = n_nodes/N and ccdf = (Σ_{d' ≥ d} n_{d'})/N are one
    IEEE division each over exact integers (N ≥ 1 whenever any row
    exists — no guard needed; empty graph → empty histogram). The
    ccdf suffix-sum runs over the HISTOGRAM (max-degree-sized), never
    the node table — a single-partition window there is the e16
    calendar-frame pattern, not a skew hazard.

    Scale: one degree agg over the normalized edge table + one
    degree-keyed rollup; everything after is histogram-sized."""
    from pyspark.sql import Window

    e = _undirected_edges(edges, src, dst)
    deg = (
        e.select(F.col("__a").alias("node"))
        .unionByName(e.select(F.col("__b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("__d"))
    )
    hist = (
        deg.groupBy(F.col("__d").alias("degree"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .localCheckpoint()  # histogram-sized; feeds the 1-row total
        # AND the suffix window — uncheckpointed, each leg re-plans
        # the whole basket/degree build (the x25 rule; measured 11
        # Exchanges → 3)
    )
    total = hist.agg(
        F.sum("n_nodes").cast("long").alias("__n")
    )
    w_suffix = Window.partitionBy().orderBy(F.col("degree").desc())
    return hist.crossJoin(F.broadcast(total)).select(
        "degree",
        "n_nodes",
        (
            F.col("n_nodes").cast("double")
            / F.col("__n").cast("double")
        ).alias("node_share"),
        (
            F.sum("n_nodes")
            .over(
                w_suffix.rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            .cast("double")
            / F.col("__n").cast("double")
        ).alias("ccdf"),
    )


def katz_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 4,
    scale: int = KZ_SCALE,
    alpha_num: int = KZ_NUM,
    alpha_den: int = KZ_DEN,
) -> DataFrame:
    """Fixed-iteration exact-integer Katz centrality over a DIRECTED
    graph (Katz 1953): x_{t+1}(v) = β + α·Σ_{u→v} x_t(u) with β = 1
    — the attenuated count of all walks ENDING at v, the centrality
    that (unlike PageRank) lets a prolific source pass its full
    weight to every out-neighbor instead of splitting it, and the
    standard influence measure on endorsement/citation graphs.
    Returns (node, r) with r the scaled BIGINT rank (β ≡ ``scale``;
    α = alpha_num/alpha_den with integer ``div`` — all values
    non-negative, so Spark ``div`` and DuckDB ``//`` agree). Nodes =
    src ∪ dst; NULL endpoints dropped; a node with no in-edges holds
    exactly β every round.

    Exactness: the per-round in-neighbor fold sums scaled BIGINTs
    through DECIMAL(38,0)/HUGEINT (the intermediate walk mass grows
    like (α·indeg)^t and must not wrap), the α step is ONE integer
    div, and the final cast back to BIGINT THROWS under ANSI if the
    truncated walk count genuinely overflows — loud, never silent.
    Headroom: worst rank ≈ scale·(max_indeg·α)^iterations; at the
    defaults (1e9, α=1/8, 4 rounds) an in-degree of 8000 reaches
    ~1e21 and raises — lower ``scale`` or ``alpha`` for hub-heavy
    graphs (documented trade, like every scaled-BIGINT fold here).

    Scale: the edge list persists DISK_ONLY once (loop-invariant,
    corpus-scale — the e_deg rule); each round is one src-keyed rank
    join + one dst-keyed partial-agg shuffle; the nodes-sized state
    localCheckpoints every round (the connected_components rule —
    otherwise round k replans rounds 1..k-1)."""
    d38 = "decimal(38,0)"
    e = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d")
    ).where(
        F.col(src).isNotNull() & F.col(dst).isNotNull()
    ).persist(_DISK_ONLY)
    nodes = (
        e.select(F.col("__s").alias("node"))
        .union(e.select(F.col("__d").alias("node")))
        .distinct()
        .localCheckpoint()  # nodes-sized, read every round
    )
    ranks = nodes.select(
        "node", F.lit(scale).cast("long").alias("r")
    )
    for _ in range(iterations):
        sums = (
            e.join(ranks, e["__s"] == ranks["node"])
            .groupBy(F.col("__d").alias("node"))
            .agg(F.sum(F.col("r").cast(d38)).alias("__sm"))
        )
        ranks = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                (
                    F.lit(scale).cast("long")
                    + F.expr(
                        f"CAST(({alpha_num} * coalesce(__sm,"
                        f" CAST(0 AS {d38}))) div {alpha_den}"
                        " AS BIGINT)"
                    )
                ).cast("long").alias("r"),
            )
            .localCheckpoint()
        )
    e.unpersist()
    return ranks
