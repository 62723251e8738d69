"""Distributed BPE vocabulary induction (byte-pair-encoding merges).

The tokenizer-TRAINING side of a corpus pipeline: learn the first
``n_merges`` BPE merge rules over a document corpus (Sennrich et al.,
"Neural Machine Translation of Rare Words with Subword Units", ACL
2016 — the word-level variant every GPT/Llama-family tokenizer
descends from). The reference delegates all text handling to
Postgres-side SQL; this operator is part of the training-data
extension track.

Spark shape — k UNROLLED rounds, fully declarative, zero driver loops
over data:

* The corpus collapses to the distinct-word frequency table once (one
  shuffle); every subsequent round works on that vocabulary-sized
  frame, NOT the corpus — the classic BPE-training trick, and the
  reason tokenizer training is cheap even over 100 TB of text (the
  vocabulary is bounded; corpus size only changes the counts).
* Per round: bigram explode over the symbol arrays → weighted pair
  count (map-side combinable) → deterministic top-1 (count DESC, then
  lexicographic pair — a total order, so the learned merges are
  engine- and partitioning-independent) → rewrite every word's symbol
  array by one left-to-right merge pass.
* The rewrite is a STRING-ACCUMULATOR fold (``aggregate`` over the
  symbol tail with a ``chr(31)``-joined accumulator) rather than an
  array-accumulator fold, deliberately: DuckDB's ``list_reduce``
  requires accumulator type == element type, so the string fold is the
  one spelling both engines run IDENTICALLY — the oracle replays
  training exactly and the driver value-hashes the learned merges.
* Each round's frames are ``localCheckpoint``-truncated: chaining k
  rounds lazily re-executes every prior round once per new round (the
  DataFrame form of the recursive-CTE re-evaluation trap — measured
  13 s → 3 s at sf0.1).

Left-to-right merge-pass semantics (pinned by test): merging (a, a)
over "a a a a" yields "aa aa" — a freshly-merged token never re-merges
within the same pass, because the fold compares the ACCUMULATOR TAIL
(now the merged token) against the left symbol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: one merge pass over a word's symbol array, as a SQL HOF expression:
#: fold the tail into a chr(31)-joined string, merging accumulator
#: tail ``ml`` with the next symbol ``mr`` on match; split back.
#: ``ml``/``mr`` are columns provided by the 1-row broadcast merge.
_REWRITE = (
    "split(aggregate(slice(s, 2, greatest(size(s) - 1, 0)), element_at(s, 1), "
    "(acc, x) -> CASE WHEN x = mr AND (acc = ml OR endswith(acc, concat(chr(31), ml))) "
    "THEN concat(acc, x) ELSE concat(acc, chr(31), x) END), chr(31))"
)

#: adjacent symbol bigrams of a word, as (l, r) structs
_BIGRAMS = (
    "explode(zip_with(slice(s, 1, size(s) - 1), slice(s, 2, size(s) - 1), "
    "(a, b) -> struct(a AS l, b AS r)))"
)


def word_frequencies(corpus: DataFrame, text_col: str) -> DataFrame:
    """Lower-cased alphabetic word frequency table ``(w, n)`` — the
    single corpus-wide pass BPE training needs."""
    return (
        corpus.select(F.explode(F.split(F.lower(text_col), r"\s+")).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bpe_word_segmentation(
    corpus: DataFrame, text_col: str, n_merges: int = 6
) -> DataFrame:
    """Train ``n_merges`` rules AND apply them: returns the vocabulary
    with each word's post-merge segmentation — ``(w, n, s)`` where
    ``s`` is the subword symbol array. Training and application are
    the same k rewrite passes (rewriting the vocabulary IS applying
    the rules), so this costs exactly the training run. Downstream,
    tokenizing the corpus is a word-table join — tokenization is a
    pure word function, so the 100 TB corpus never re-enters the
    training loop."""
    words = word_frequencies(corpus, text_col)
    syms = words.select(
        "w", "n", F.expr("regexp_extract_all(w, '.', 0)").alias("s")
    ).localCheckpoint()
    for _ in range(n_merges):
        pairs = (
            syms.filter(F.size("s") > 1)
            .select("n", F.expr(_BIGRAMS).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").alias("cnt"))
        )
        top = (
            pairs.orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .select(F.col("l").alias("ml"), F.col("r").alias("mr"))
            .localCheckpoint()
        )
        syms = (
            syms.crossJoin(F.broadcast(top))
            .select("w", "n", F.expr(_REWRITE).alias("s"))
            .localCheckpoint()
        )
    return syms


def learn_bpe_merges(
    corpus: DataFrame, text_col: str, n_merges: int = 6
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules. Returns one row
    per merge: (merge_rank, left_sym, right_sym, merged, pair_count),
    in training order.

    Ties in pair frequency break lexicographically on (left, right),
    making the whole training run a pure function of the corpus.
    """
    words = word_frequencies(corpus, text_col)
    syms = words.select(
        "n", F.expr("regexp_extract_all(w, '.', 0)").alias("s")
    ).localCheckpoint()
    tops = []
    for r in range(n_merges):
        pairs = (
            syms.filter(F.size("s") > 1)
            .select("n", F.expr(_BIGRAMS).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").alias("cnt"))
        )
        top = (
            pairs.orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .select(
                F.col("l").alias("ml"),
                F.col("r").alias("mr"),
                F.col("cnt").alias("mc"),
            )
            .localCheckpoint()  # 1 row; truncates the round's lineage
        )
        tops.append(
            top.select(
                F.lit(r + 1).alias("merge_rank"),
                F.col("ml").alias("left_sym"),
                F.col("mr").alias("right_sym"),
                F.concat("ml", "mr").alias("merged"),
                F.col("mc").alias("pair_count"),
            )
        )
        if r < n_merges - 1:
            syms = (
                syms.crossJoin(F.broadcast(top))
                .select("n", F.expr(_REWRITE).alias("s"))
                .localCheckpoint()
            )
    out = tops[0]
    for t in tops[1:]:
        out = out.unionByName(t)
    return out.orderBy("merge_rank")
