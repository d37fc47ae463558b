"""Property tests for sequence packing (operators/packing.py) — the
newest operator had example coverage only (VERDICT r03 item 8).

Invariants checked against an independent Python reimplementation of
the concat-and-cut semantics, plus physical-layout independence (the
answer must not depend on how the input happens to be partitioned —
the thing that actually varies on a 1000-executor cluster).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ods_to_datalake_spark.operators.packing import pack_sequences

TARGET = 16
SHARDS = 4


def _expected(rows: list[tuple[str, int]]) -> dict[str, tuple[int, int, int]]:
    """Reference packer: group by the SAME md5 shard, concat in id
    order, cut every TARGET tokens."""
    import hashlib

    def shard(doc_id: str) -> int:
        return int(hashlib.md5(doc_id.encode()).hexdigest()[:8], 16) % SHARDS

    out: dict[str, tuple[int, int, int]] = {}
    by_shard: dict[int, list[tuple[str, int]]] = {}
    for doc_id, n in rows:
        by_shard.setdefault(shard(doc_id), []).append((doc_id, n))
    for s, docs in by_shard.items():
        cum = 0
        for doc_id, n in sorted(docs):
            out[doc_id] = (s, cum // TARGET, cum % TARGET)
            cum += n
    return out


docs_strategy = st.dictionaries(
    st.text(alphabet="abcdefgh0123", min_size=1, max_size=6),
    st.integers(min_value=0, max_value=3 * TARGET + 1),
    min_size=1,
    max_size=30,
)


@settings(max_examples=15, deadline=None)
@given(docs=docs_strategy)
def test_pack_sequences_matches_reference(spark, docs):
    rows = sorted(docs.items())
    df = spark.createDataFrame(rows, "doc_id string, n_tok int")
    got = {
        r.doc_id: (r.shard, r.seq_idx, r.offset)
        for r in pack_sequences(df, "doc_id", "n_tok", TARGET, SHARDS).collect()
    }
    assert got == _expected(rows)


@settings(max_examples=10, deadline=None)
@given(docs=docs_strategy, n_parts=st.integers(min_value=1, max_value=7))
def test_pack_sequences_partitioning_invariant(spark, docs, n_parts):
    """Same answer whatever the input's physical partitioning — the
    shard shuffle + in-shard ordering fully determines the result."""
    rows = sorted(docs.items())
    df = spark.createDataFrame(rows, "doc_id string, n_tok int")
    base = {
        tuple(r)
        for r in pack_sequences(df, "doc_id", "n_tok", TARGET, SHARDS).collect()
    }
    reparted = {
        tuple(r)
        for r in pack_sequences(
            df.repartition(n_parts), "doc_id", "n_tok", TARGET, SHARDS
        ).collect()
    }
    assert reparted == base


def test_pack_sequences_boundary_straddle(spark):
    """Docs may straddle window boundaries: offset stays < target and
    the NEXT doc starts exactly at cum+n (concat-and-cut, no padding)."""
    rows = [("a", 10), ("b", 10), ("c", 10)]  # all same shard? force it
    df = spark.createDataFrame(rows, "doc_id string, n_tok int")
    got = {
        r.doc_id: r
        for r in pack_sequences(df, "doc_id", "n_tok", 16, 1).collect()
    }
    # single shard: a@0, b@10 (straddles 16 into window 1), c@20
    assert (got["a"].seq_idx, got["a"].offset) == (0, 0)
    assert (got["b"].seq_idx, got["b"].offset) == (0, 10)
    assert (got["c"].seq_idx, got["c"].offset) == (1, 4)
    assert all(0 <= r.offset < 16 for r in got.values())


# ---------------------------------------------------------------------------
# incremental dedup properties (same reference-reimplementation style)
# ---------------------------------------------------------------------------

TEXT_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


def _ref_incremental(new_rows, seen_rows):
    """Independent Python reimplementation of the two admission tiers
    (content hash over coalesced text; shared MinHash LSH band)."""
    import hashlib

    from ods_to_datalake_spark.functions.text import MINHASH_PRIME

    def tokens(t):
        return (t or "").strip().lower().split()

    def shingles(t, n=3):
        tok = tokens(t)
        return {" ".join(tok[i : i + n]) for i in range(len(tok) - n + 1)}

    def bands(t, k=8, n_bands=4, rows=2):
        sh = shingles(t)
        if not sh:
            return set()
        sig = []
        for s in range(k):
            best = None
            for x in sh:
                d = hashlib.md5(x.encode()).hexdigest()
                a, b = int(d[:14], 16), int(d[14:28], 16)
                h = (a + s * b) % MINHASH_PRIME
                best = h if best is None or h < best else best
            sig.append(best)
        return {
            (bi, hashlib.md5(
                ",".join(str(sig[bi * rows + r]) for r in range(rows)).encode()
            ).hexdigest())
            for bi in range(n_bands)
        }

    seen_hashes = {
        hashlib.md5((t or "").encode()).hexdigest() for _, t in seen_rows
    }
    seen_bands = set().union(*(bands(t) for _, t in seen_rows)) if seen_rows else set()
    admitted = []
    for doc_id, t in new_rows:
        if hashlib.md5((t or "").encode()).hexdigest() in seen_hashes:
            continue
        if bands(t) & seen_bands:
            continue
        admitted.append(doc_id)
    return sorted(admitted)


@settings(max_examples=10, deadline=None)
@given(
    new_texts=st.lists(
        st.lists(st.sampled_from(TEXT_WORDS), min_size=0, max_size=6).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    seen_texts=st.lists(
        st.lists(st.sampled_from(TEXT_WORDS), min_size=0, max_size=6).map(" ".join),
        min_size=0,
        max_size=8,
    ),
)
def test_incremental_dedup_matches_reference(spark, new_texts, seen_texts):
    from ods_to_datalake_spark.operators.dedup import incremental_dedup

    new_rows = [(2 * i + 1, t) for i, t in enumerate(new_texts)]
    seen_rows = [(2 * i, t) for i, t in enumerate(seen_texts)]
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    seen = (
        spark.createDataFrame(seen_rows, "doc_id long, text string")
        if seen_rows
        else spark.createDataFrame([], "doc_id long, text string")
    )
    got = sorted(
        r.doc_id for r in incremental_dedup(new, seen, "doc_id", "text").collect()
    )
    assert got == _ref_incremental(new_rows, seen_rows)


def test_packing_report_straddlers_and_tail_waste(spark):
    """One shard, target 10, docs 6+6+8: doc2 straddles (offset 6 + 6 >
    10), doc3 straddles (offset 2 + 8 = 10 exactly -> does NOT, it ends
    flush at the boundary); 20 tokens cut into 2 full windows =
    utilization 1.0."""
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.operators.packing import (
        pack_sequences,
        packing_report,
    )

    docs = spark.createDataFrame(
        [(1, 6), (2, 6), (3, 8)], "doc_id long, n_tok long"
    )
    packed = pack_sequences(docs, "doc_id", "n_tok", 10, n_shards=1)
    (r,) = packing_report(packed, 10).collect()
    assert (r.n_docs, r.total_tokens, r.n_windows) == (3, 20, 2)
    assert r.utilization == 1.0
    assert r.n_straddlers == 1  # doc2 only; doc3 ends flush
    assert r.straddler_share == 1.0 / 3.0


def test_packing_report_partial_tail_and_zero_token_guard(spark):
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.operators.packing import (
        pack_sequences,
        packing_report,
    )

    docs = spark.createDataFrame(
        [(1, 7), (2, 0), (3, 0)], "doc_id long, n_tok long"
    )
    packed = pack_sequences(docs, "doc_id", "n_tok", 10, n_shards=1)
    (r,) = packing_report(packed, 10).collect()
    assert (r.total_tokens, r.n_windows) == (7, 1)
    assert r.utilization == 0.7
    assert r.n_straddlers == 0  # zero-token docs never straddle

    empty = packing_report(
        pack_sequences(
            docs.where(F.col("n_tok") == 0),
            "doc_id",
            "n_tok",
            10,
            n_shards=1,
        ),
        10,
    ).collect()
    (z,) = empty
    assert (z.total_tokens, z.n_windows) == (0, 0)
    assert z.utilization is None  # 0 windows is no evidence
