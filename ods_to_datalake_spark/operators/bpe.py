"""Byte-pair-encoding tokenizer training as relational dataflow
(Sennrich, Haddow & Birch 2016, ACL — the word-frequency
formulation): learn the top-k merge rules from a corpus.

Why this shape scales: the corpus collapses to a (word, count) table
FIRST (one token-explode + groupBy — the only pass that touches the
100-TB text), and every training iteration then runs over the
VOCABULARY-sized symbol table (|distinct words| · avg word length
rows — millions, not trillions). This is exactly why the reference
BPE implementations train on a word-count dict; here the dict is a
DataFrame and each merge round is two window passes over it.

Round semantics (bit-exact in both engines, no floats anywhere):

1. pair counts: Σ word-count over ADJACENT symbol pairs (overlapping
   occurrences each count, the get_stats convention);
2. argmax pair with (count DESC, left, right) tiebreak — one
   driver-collected row per round (k scalars total, like k-means
   seeds);
3. greedy leftmost non-overlapping rewrite: candidate positions
   that form runs (consecutive positions can only chain when
   left == right, e.g. 'aaaa' merging (a,a)) keep every OTHER
   candidate starting from the first — the gaps-and-islands parity
   trick: candidate ordinal rnc = running count of candidates,
   run id grp = pos − rnc, keep (rnc − min rnc of the run) even;
   the row after a kept candidate is consumed; positions renumber.

Each round: one (word)-partitioned window pass + one (word, grp)
window + the renumber — all sharing the hash partitioning on word —
then localCheckpoint (the iterative-loop lineage rule). The rewrite
is pure integer/string logic: engine-independent by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ods_to_datalake_spark.functions import text as X

BPE_MERGES = 8

MERGE_SCHEMA = (
    "merge_rank int, left_sym string, right_sym string, "
    "merged string, pair_count long"
)


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wcount): the corpus collapsed to its vocabulary — the
    single pass that touches the full text."""
    return (
        docs.select(F.explode(X.tokens(text_col)).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )


def initial_symbols(words: DataFrame) -> DataFrame:
    """Character-level start state: (word, wcount, pos, sym), pos
    1-based contiguous per word. (No end-of-word marker — merges stay
    within words; documented divergence from the paper's </w>.)"""
    return words.select(
        "word",
        "wcount",
        F.explode(
            F.expr("sequence(1, length(word))")
        ).alias("pos"),
    ).withColumn("sym", F.expr("substring(word, pos, 1)"))


def _apply_merge(
    syms: DataFrame, a: str, b: str, keys: tuple = ("word",)
) -> DataFrame:
    """One greedy-leftmost non-overlapping rewrite of (a, b) -> ab,
    per ``keys`` sequence (a word for training, a (doc, token
    instance) for encoding)."""
    w_pos = Window.partitionBy(*keys).orderBy("pos")
    run = Window.partitionBy(*keys, "grp")
    nxt = F.lead("sym").over(w_pos)
    marked = syms.withColumn(
        "is_cand",
        F.coalesce(
            (F.col("sym") == a) & (nxt == b), F.lit(False)
        ),
    )
    marked = marked.withColumn(
        "rnc",
        F.sum(F.col("is_cand").cast("int")).over(
            w_pos.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn(
        "grp", F.when(F.col("is_cand"), F.col("pos") - F.col("rnc"))
    )
    marked = marked.withColumn(
        "kept",
        F.when(
            F.col("is_cand"),
            (
                F.col("rnc")
                - F.min(
                    F.when(F.col("is_cand"), F.col("rnc"))
                ).over(run)
            )
            % 2
            == 0,
        ).otherwise(F.lit(False)),
    ).withColumn(
        "consumed",
        F.coalesce(F.lag("kept").over(w_pos), F.lit(False)),
    )
    carried = [c for c in syms.columns if c not in ("pos", "sym")]
    return (
        marked.where(~F.col("consumed"))
        .select(
            *carried,
            F.row_number().over(w_pos).alias("pos"),
            F.when(F.col("kept"), F.lit(a + b))
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
    )


def bpe_train(
    words: DataFrame, n_merges: int = BPE_MERGES
) -> DataFrame:
    """Learn ``n_merges`` merge rules from a (word, wcount) table.
    Returns (merge_rank, left_sym, right_sym, merged, pair_count) —
    the tokenizer artifact a 100-TB corpus trains once and every
    encode job broadcasts."""
    spark = words.sparkSession
    syms = initial_symbols(words)
    w_pos = Window.partitionBy("word").orderBy("pos")
    merges: list[tuple] = []
    for rank in range(n_merges):
        pairs = (
            syms.withColumn("nxt", F.lead("sym").over(w_pos))
            .where(F.col("nxt").isNotNull())
            .groupBy("sym", "nxt")
            .agg(F.sum("wcount").alias("cnt"))
        )
        top = (
            pairs.orderBy(
                F.desc("cnt"), F.asc("sym"), F.asc("nxt")
            )
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["sym"], top[0]["nxt"], top[0]["cnt"]
        merges.append((rank, a, b, a + b, cnt))
        syms = _apply_merge(syms, a, b).localCheckpoint()
    return spark.createDataFrame(merges, MERGE_SCHEMA)


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply learned merge rules to a corpus: (id, token_pos, pos,
    sym) — the encode side. Each token instance is its own rewrite
    key (merges never cross token boundaries), so the corpus stays
    embarrassingly doc-parallel; the merge list is plan-side constant
    (broadcast by construction), applied as one rewrite pass per rule
    in learned order — the standard BPE encode semantics."""
    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.posexplode(X.tokens(text_col)).alias("token_pos", "__tok"),
    ).where(F.col("__tok") != "")
    syms = toks.select(
        "__id",
        "token_pos",
        F.explode(
            F.expr("sequence(1, length(__tok))")
        ).alias("pos"),
        "__tok",
    ).withColumn(
        "sym", F.expr("substring(__tok, pos, 1)")
    ).drop("__tok")
    out = syms
    for a, b in merges:
        out = _apply_merge(out, a, b, keys=("__id", "token_pos"))
    return out.select(
        F.col("__id").alias(id_col), "token_pos", "pos", "sym"
    )
