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

import json
import re

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
        # ONE job per round (opt r13): the deterministic top-1 pair is
        # a 1-row collect (was: an eager checkpoint of the 1-row frame
        # PLUS an eager checkpoint of the rewritten vocabulary — two
        # jobs per round on a vocabulary-sized table where per-job
        # overhead dominates). The collected (ml, mr) embeds as string
        # literals — symbols are [a-z]+ by word_frequencies' filter —
        # and the rewrite becomes a pure projection, lazily
        # checkpointed so the next round's aggregate materializes it
        # in the same job. Same merges, same segmentations.
        top_rows = (
            pairs.orderBy(F.desc("cnt"), "l", "r").limit(1).collect()
        )
        if not top_rows:
            # mirror the previous crossJoin-with-empty-top semantics:
            # no mergeable pair leaves an empty vocabulary
            syms = syms.filter(F.lit(False))
            break
        ml, mr = top_rows[0]["l"], top_rows[0]["r"]
        rewrite = re.sub(r"\bml\b", f"'{ml}'", _REWRITE)
        rewrite = re.sub(r"\bmr\b", f"'{mr}'", rewrite)
        syms = syms.select(
            "w", "n", F.expr(rewrite).alias("s")
        ).localCheckpoint(eager=False)
    return syms


#: Alphabet fallback units for longest-match segmentation: with every
#: single letter in the vocabulary, maximal munch always advances ≥1
#: character, so segmentation terminates and never fails on any
#: ``^[a-z]+$`` word regardless of the learned units.
ALPHABET = [chr(c) for c in range(ord("a"), ord("z") + 1)]


def top_ngram_vocab(
    corpus: DataFrame,
    text_col: str,
    n_grams: int = 1000,
    min_len: int = 2,
    max_len: int = 6,
) -> DataFrame:
    """Derive a frozen subword vocabulary deterministically from the
    corpus: the ``n_grams`` highest-frequency character n-grams
    (``min_len``..``max_len``) of the word table, weighted by word
    frequency, ties broken lexicographically — a total order, so the
    artifact is a pure function of the corpus and a SQL engine derives
    the IDENTICAL vocabulary (the registered query's oracle does).
    Returns ``(g, cnt)``.

    Scale: the n-gram explode runs over the DISTINCT-word table (the
    same vocabulary-sized frame BPE training uses — the corpus is
    touched once, for word frequencies), each word emitting ≤
    len·(max_len−min_len+1) grams; the count is one map-combinable
    aggregate and the top-N is a TakeOrdered of vocabulary-bounded
    rows."""
    words = word_frequencies(corpus, text_col)
    grams = words.select(
        "n",
        F.explode(
            F.expr(
                f"flatten(transform("
                f"filter(sequence({min_len}, {max_len}), l -> l <= length(w)), "
                f"l -> transform(sequence(1, length(w) - l + 1), "
                f"i -> substring(w, i, l))))"
            )
        ).alias("g"),
    )
    return (
        grams.groupBy("g")
        .agg(F.sum("n").alias("cnt"))
        .orderBy(F.desc("cnt"), "g")
        .limit(n_grams)
    )


def _longest_match_fold(max_len: int) -> str:
    """The greedy maximal-munch segmentation fold as a SQL HOF string:
    walk the word once, at each consumed position take the LONGEST
    vocabulary unit starting there (WordPiece's algorithm — Wu et al.
    2016 §4.1; the apply-side complement of merge-replay, linear in
    word length instead of merges × length). State rides a 3-field
    string accumulator ``pos|ntok|segs`` because DuckDB's
    ``list_reduce`` requires accumulator type == element type — the
    same cross-engine spelling trick as ``_REWRITE``. Expects columns
    ``w`` (the word) and ``vg`` (the vocabulary array, single letters
    included) in scope."""
    best = (
        f"array_max(filter(sequence(1, {max_len}), "
        f"l -> i + l <= length(w) + 1 AND array_contains(vg, substring(w, i, l))))"
    )
    return (
        "aggregate(sequence(1, length(w)), '1|0|', (acc, i) -> "
        "CASE WHEN i <> CAST(split_part(acc, '|', 1) AS INT) THEN acc ELSE "
        f"concat(CAST(i + {best} AS STRING), '|', "
        "CAST(CAST(split_part(acc, '|', 2) AS INT) + 1 AS STRING), '|', "
        "CASE WHEN split_part(acc, '|', 3) = '' THEN '' "
        "ELSE concat(split_part(acc, '|', 3), chr(31)) END, "
        f"substring(w, i, {best})) END)"
    )


def segment_longest_match(
    words: DataFrame,
    vocab: list[str],
    max_len: int = 6,
    vocab_via: str = "literal",
) -> DataFrame:
    """Apply a FROZEN ≥1k-unit vocabulary to the word table by greedy
    longest-match segmentation — the tokenization-pipeline apply path
    VERDICT r11 item 5 named: training replays merges (see
    ``learn_bpe_merges``), but what a production tokenizer RUNS per
    document is segmentation against the frozen artifact, and at
    realistic vocab sizes that must be one linear pass per word, not
    one rewrite pass per merge. ``vocab`` is broadcast as a single
    plan-literal array (a few KB for 1k units — constant-folded, rides
    every task for free); input ``words`` is the distinct-word table
    ``(w, n)``, so the fold runs vocabulary-many times regardless of
    corpus size, and tokenizing 100 TB reduces to a word equi-join.
    Returns ``(w, n, pieces array<string>, word_tokens)``. Words are
    ``^[a-z]+$`` and the vocabulary is augmented with ``ALPHABET``, so
    segmentation always succeeds.

    ``vocab_via`` picks how the vocabulary array reaches executors
    (VERDICT r12 item 5 — the production-vocab-size question):
    ``"literal"`` embeds it as ONE ``from_json`` string literal that
    Catalyst constant-folds into a single array Literal (the
    ``similarity._matrix_lit`` trick), ``"broadcast"`` ships it once
    per executor as a broadcast 1-row DataFrame cross-joined in (a
    BroadcastNestedLoopJoin with a 1-row build side — sanctioned, the
    vocab rides the broadcast instead of the plan). Measured at sf1
    with the 18,330-unit composite vocabulary (~146 KB; 3-run medians,
    one process, SCALE.md "Vocab apply at production vocab size"):
    json-literal 2.2 s, broadcast 2.9 s, and the element-wise
    ``F.lit(list)`` spelling this function used before 11.8 s (first
    sample 44.6 s) — an 18k-child array expression bloats analysis and
    per-task serialization, the single-string literal does not. The
    json-literal is therefore the default; ``"broadcast"`` is the
    documented escape hatch for vocabularies large enough (≫1M units)
    that even one string literal per task would matter."""
    if vocab_via not in ("literal", "broadcast"):
        raise ValueError(f"vocab_via must be literal|broadcast, got {vocab_via!r}")
    full = sorted(set(vocab) | set(ALPHABET))
    fold = _longest_match_fold(max_len)
    if vocab_via == "broadcast":
        vdf = words.sparkSession.createDataFrame(
            [(full,)], "vg array<string>"
        )
        seeded = words.crossJoin(F.broadcast(vdf))
    else:
        seeded = words.withColumn(
            "vg", F.from_json(F.lit(json.dumps(full)), "array<string>")
        )
    return (
        seeded
        .withColumn("fold", F.expr(fold))
        .select(
            "w",
            "n",
            F.split(F.expr("split_part(fold, '|', 3)"), "\x1f").alias("pieces"),
            F.expr("CAST(split_part(fold, '|', 2) AS BIGINT)").alias(
                "word_tokens"
            ),
        )
    )


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
    # one job per round (the same collect-the-1-row-top restructuring
    # as ``bpe_word_segmentation``, opt r13): the deterministic top
    # pair is collected, the rewrite runs with literal (ml, mr), and
    # the learned rules assemble driver-side — no per-round broadcast
    # or 1-row checkpoint jobs. Merges and counts are unchanged.
    rows: list[tuple] = []
    for r in range(n_merges):
        pairs = (
            syms.filter(F.size("s") > 1)
            .select("n", F.expr(_BIGRAMS).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").alias("cnt"))
        )
        top_rows = (
            pairs.orderBy(F.desc("cnt"), "l", "r").limit(1).collect()
        )
        if not top_rows:
            break  # no mergeable pair: later rounds are empty too
        ml, mr, mc = top_rows[0]["l"], top_rows[0]["r"], top_rows[0]["cnt"]
        rows.append((r + 1, ml, mr, ml + mr, int(mc)))
        if r < n_merges - 1:
            rewrite = re.sub(r"\bml\b", f"'{ml}'", _REWRITE)
            rewrite = re.sub(r"\bmr\b", f"'{mr}'", rewrite)
            syms = syms.select(
                "n", F.expr(rewrite).alias("s")
            ).localCheckpoint(eager=False)
    return corpus.sparkSession.createDataFrame(
        rows,
        "merge_rank INT, left_sym STRING, right_sym STRING, "
        "merged STRING, pair_count BIGINT",
    ).orderBy("merge_rank")
