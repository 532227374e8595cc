"""Byte-pair-encoding vocabulary training + encoding over the corpus
(Sennrich, Haddow & Birch, ACL 2016, "Neural Machine Translation of
Rare Words with Subword Units").

The missing piece between the engine's whitespace token counts
(functions/text.py) and a real training pipeline: learn the subword
merge table FROM the corpus, then encode documents with it — token
budgets (pack_by_token_budget), contamination n-grams and vocab stats
all shift once text is subword-tokenized.

Scale shape (the Sennrich insight this module leans on): BPE training
never iterates over the corpus — it iterates over the WORD-FREQUENCY
table, which is bounded (prune to ``top_words`` like CCNet prunes its
LM tables; the tail it drops contributes negligible pair mass). So:

- ``bpe_train``: ONE distributed explode + combinable word-count
  groupBy + distributed top-m prune (TakeOrderedAndProject, ties by
  word string — deterministic), then the merge loop runs DRIVER-side
  over the bounded table (same doctrine as similarity.py's
  train_ivf_centroids: constant driver memory regardless of corpus
  size). Counting and application are exact integer/greedy rules, so
  the whole loop is bit-replayable — the ``bpe_vocab`` oracle unrolls
  every merge round in SQL (pair counts -> argmax -> greedy rewrite).

- ``bpe_encode``: applies the merge ranks to documents in an
  Arrow-batched ``mapInPandas`` with a PER-UNIQUE-WORD memo per batch
  (web text repeats words heavily; the memo turns per-token work into
  per-distinct-word work). Merges ship broadcast as a plain list.

Determinism contract (shared by trainer, encoder, and oracle):

- pair counts weight EVERY adjacent occurrence by word frequency
  (overlaps included: 'aaa' counts (a,a) twice) — subword-nmt's
  ``get_stats`` rule;
- best pair = max count, ties to the lexicographically SMALLEST
  (left, right) — replaces subword-nmt's dict-order tie which is not
  replayable;
- application is one greedy LEFT-TO-RIGHT non-overlapping pass per
  merge, in rank order. For merges produced by training this equals
  the priority-repeat encode loop (a merge can only reference symbols
  that earlier ranks created), and one-pass-per-rank is expressible
  in vectorized SQL: for left != right overlapping matches are
  impossible; for left == right a run of L merges floor(L/2) pairs at
  even run offsets.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

END_TOKEN = "</w>"

MERGES_SCHEMA = T.StructType(
    [
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("left", T.StringType(), False),
        T.StructField("right", T.StringType(), False),
        T.StructField("pair_count", T.LongType(), False),
    ]
)


def _apply_merge(seg: tuple, a: str, b: str) -> tuple:
    """One greedy left-to-right non-overlapping pass of merge (a, b)."""
    out = []
    i, n = 0, len(seg)
    while i < n:
        if i + 1 < n and seg[i] == a and seg[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seg[i])
            i += 1
    return tuple(out)


def bpe_train(
    docs: DataFrame,
    n_merges: int = 10,
    top_words: int = 100_000,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus. Returns a
    DataFrame (rank, left, right, pair_count) — rank is 1-based merge
    order, pair_count the frequency-weighted adjacency count that won
    the round. Stops early (fewer rows) when no pair is left.

    The distributed part is exactly one explode + one combinable
    groupBy + a top-``top_words`` TakeOrdered; the merge loop touches
    only that bounded table on the driver.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if top_words < 1:
        raise ValueError("top_words must be >= 1")
    from sinew_spark.operators.search import tokenize_expr

    spark = docs.sparkSession
    rows = (
        docs.select(F.explode(tokenize_expr(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(top_words)
        .collect()
    )
    segs: dict[tuple, int] = {}
    for r in rows:
        seg = tuple(r.w) + (END_TOKEN,)
        segs[seg] = segs.get(seg, 0) + r.c
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        counts: Counter = Counter()
        for seg, freq in segs.items():
            for i in range(len(seg) - 1):
                counts[(seg[i], seg[i + 1])] += freq
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, int(c)))
        nxt: dict[tuple, int] = {}
        for seg, freq in segs.items():
            ns = _apply_merge(seg, a, b)
            nxt[ns] = nxt.get(ns, 0) + freq
        segs = nxt
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def _merge_list(merges) -> list[tuple[str, str]]:
    """(left, right) pairs in rank order from a DataFrame or a list."""
    if isinstance(merges, DataFrame):
        return [
            (r.left, r.right)
            for r in sorted(merges.collect(), key=lambda r: r.rank)
        ]
    return [(a, b) for a, b in merges]


def bpe_encode(
    docs: DataFrame,
    merges,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    count_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Encode documents with a learned merge table: adds ``out_col``
    (array<string> of subword symbols, ``</w>`` marking word ends) and
    ``count_col``. Tokenization matches ``bpe_train``'s
    (search.tokenize_expr: lowercase, [a-z0-9] runs).

    Arrow-batched mapInPandas; per-batch memo keyed on the distinct
    word (Zipfian text makes distinct/total tiny, so the Python cost is
    per-type not per-token). The merge list rides the closure —
    broadcast by Spark's task serializer; it is bounded (n_merges
    rows), never corpus-sized.
    """
    import re

    ml = _merge_list(merges)
    schema = T.StructType(
        docs.schema.fields
        + [
            T.StructField(out_col, T.ArrayType(T.StringType())),
            T.StructField(count_col, T.LongType()),
        ]
    )
    tok_re = re.compile(r"[a-z0-9]+")

    def encode_word(word: str, memo: dict) -> tuple:
        got = memo.get(word)
        if got is None:
            seg = tuple(word) + (END_TOKEN,)
            for a, b in ml:
                seg = _apply_merge(seg, a, b)
            memo[word] = got = seg
        return got

    def run(batches):
        memo: dict[str, tuple] = {}
        for pdf in batches:
            toks_out, counts = [], []
            for text in pdf[text_col]:
                syms: list[str] = []
                if text:
                    for w in tok_re.findall(str(text).lower()):
                        syms.extend(encode_word(w, memo))
                toks_out.append(syms)
                counts.append(len(syms))
            pdf = pdf.copy()
            pdf[out_col] = toks_out
            pdf[count_col] = counts
            yield pdf

    return docs.mapInPandas(run, schema)
