"""Interleaved-document linearization: span arrays -> training text.

The engine's document model is the interleaved span array from
BASELINE.json's input_hint — (doc_id, spans:array<struct<kind, text,
media_ref, offset>>) — produced by the parse stage
(operators/parse.py). Training pipelines consume it linearized: one
text string per document where media spans become placeholder tokens
(the multimodal-LM convention, e.g. ``<|image|>``), plus a manifest
mapping each placeholder's character offset back to its media_ref so
the media column can be re-joined at batch-assembly time.

Scale shape: the whole transform is ONE Catalyst projection — a typed
``aggregate`` fold over the offset-sorted span array builds the text
and the manifest in a single pass, per row, JVM-side. Zero shuffle,
zero Python, embarrassingly parallel; the plan is a Project over the
scan no matter the corpus size.
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("pos", T.IntegerType()),
            T.StructField("kind", T.StringType()),
            T.StructField("media_ref", T.StringType()),
        ]
    )
)


def _token_for(kind: Column, tokens: Optional[Mapping[str, str]]) -> Column:
    """Placeholder token for a media kind: explicit mapping first, then
    the ``<|kind|>`` convention."""
    default = F.concat(F.lit("<|"), kind, F.lit("|>"))
    out = default
    for k, tok in (tokens or {}).items():
        out = F.when(kind == k, F.lit(tok)).otherwise(out)
    return out


def linearize_spans(
    docs: DataFrame,
    spans_col: str = "spans",
    sep: str = " ",
    tokens: Optional[Mapping[str, str]] = None,
) -> DataFrame:
    """Add ``text_linear`` + ``media_manifest`` columns.

    Spans are laid out in ascending ``offset`` order, joined by ``sep``
    (between every consecutive pair, even when a text span is empty —
    the rule must be position-deterministic for the manifest to be
    exact). ``kind == 'text'`` contributes its text (null -> empty);
    any other kind contributes its placeholder token and appends
    ``(pos, kind, media_ref)`` to ``media_manifest``, where ``pos`` is
    the 0-based character offset of the token's first character in
    ``text_linear``.

    One fold, one projection: a single ``aggregate`` over the sorted
    array carries (text-so-far, manifest, span-count) through each
    span, so cost is O(total span text) per row with no shuffle and no
    Python. ``text_linear`` of a document with no spans is ''.
    """
    spans = F.array_sort(
        F.col(spans_col), lambda a, b: a["offset"] - b["offset"]
    )
    zero = F.struct(
        F.lit("").alias("t"),
        F.array().cast(MANIFEST_TYPE).alias("m"),
        F.lit(0).alias("n"),
    )

    def step(acc: Column, s: Column) -> Column:
        is_text = s["kind"] == "text"
        piece = F.when(is_text, F.coalesce(s["text"], F.lit(""))).otherwise(
            _token_for(s["kind"], tokens)
        )
        prefix = F.when(acc["n"] == 0, F.lit("")).otherwise(F.lit(sep))
        pos = (F.length(acc["t"]) + F.length(prefix)).cast("int")
        entry = F.struct(
            pos.alias("pos"), s["kind"].alias("kind"), s["media_ref"].alias("media_ref")
        )
        return F.struct(
            F.concat(acc["t"], prefix, piece).alias("t"),
            F.when(is_text, acc["m"]).otherwise(F.concat(acc["m"], F.array(entry))).alias("m"),
            (acc["n"] + 1).alias("n"),
        )

    agg = F.aggregate(spans, zero, step)
    return docs.withColumn("text_linear", agg["t"]).withColumn(
        "media_manifest", agg["m"]
    )


def _span_tokens(s: Column) -> Column:
    t = s["text"]
    return (
        F.when(t.isNull() | (F.trim(t) == ""), F.lit(0))
        .otherwise(F.size(F.split(F.trim(t), r"\s+")))
    )


def main_content_spans(
    docs: DataFrame,
    spans_col: str = "spans",
    min_tokens: int = 10,
    link_min_tokens: int = 3,
    out_col: str = "content_spans",
) -> DataFrame:
    """Boilerplate removal over the interleaved span sequence — the
    jusText/Readability block-classification family (Pomikalek 2011)
    re-expressed on the engine's span model, where each span is a block.

    Two-phase rule, deterministic and order-local:

    1. BASE blocks: every ``title`` span, and every ``text`` span with
       >= ``min_tokens`` whitespace tokens (long prose is content).
    2. Neighbor smoothing: a non-base span is kept iff a base block
       sits immediately adjacent in document order AND the span is
       plausibly part of the article flow — any ``text`` span, any
       ``image`` span (figures ride with their prose), or a ``link``
       span with >= ``link_min_tokens`` tokens (inline references;
       one-word nav chrome like 'home'/'privacy' never survives).

    Scale shape: ONE Catalyst projection — offset-sort + index-aware
    ``filter`` over the array, neighbors read via ``element_at`` under
    lazy ``when`` guards. Zero shuffle, zero Python, per-row cost
    O(spans); the plan is a Project over the scan at any corpus size.
    """
    if min_tokens <= 0 or link_min_tokens <= 0:
        raise ValueError("token thresholds must be positive")
    # materialize the sorted array as a column BEFORE the filter lambda
    # reads it: a free array_sort expression inside the lambda would
    # re-sort the whole array for EVERY element's neighbor probe
    # (higher-order-function lambdas re-evaluate free expression
    # variables per element — same fix as quality.py's bigram_rows)
    tmp = f"__{out_col}_sorted"
    docs = docs.withColumn(
        tmp, F.array_sort(F.col(spans_col), lambda a, b: a["offset"] - b["offset"])
    )
    arr = F.col(tmp)
    n = F.size(arr)

    def base(s: Column) -> Column:
        return (s["kind"] == "title") | (
            (s["kind"] == "text") & (_span_tokens(s) >= min_tokens)
        )

    def keep(s: Column, i: Column) -> Column:
        prev_base = F.when(i > 0, base(F.element_at(arr, i))).otherwise(F.lit(False))
        next_base = F.when(i < n - 1, base(F.element_at(arr, i + 2))).otherwise(
            F.lit(False)
        )
        rides_along = (
            (s["kind"] == "text")
            | (s["kind"] == "image")
            | ((s["kind"] == "link") & (_span_tokens(s) >= link_min_tokens))
        )
        return base(s) | ((prev_base | next_base) & rides_along)

    return docs.withColumn(out_col, F.filter(arr, keep)).drop(tmp)


def strip_media(
    docs: DataFrame, spans_col: str = "spans", sep: str = " "
) -> DataFrame:
    """Text-only projection: ``text_only`` = the text spans joined by
    ``sep`` in offset order, media spans skipped entirely (no
    placeholder, no double separator) — the shape text-only training
    runs consume. Same zero-shuffle single-fold plan."""
    spans = F.array_sort(F.col(spans_col), lambda a, b: a["offset"] - b["offset"])
    texts = F.transform(
        F.filter(spans, lambda s: s["kind"] == "text"),
        lambda s: F.coalesce(s["text"], F.lit("")),
    )
    return docs.withColumn("text_only", F.array_join(texts, sep))


def multimodal_token_cost(
    docs: DataFrame,
    spans_col: str = "spans",
    media_tokens: Optional[Mapping[str, int]] = None,
    default_media_tokens: int = 64,
    out_col: str = "n_tokens",
) -> DataFrame:
    """Training token cost of an interleaved document: text spans count
    whitespace tokens (the ``_span_tokens`` rule shared with
    main_content_spans), every other kind costs a fixed per-kind budget
    — the multimodal-LM packing convention where an image costs its
    patch count (e.g. 576 for ViT-L/14 @ 336px) and audio its frame
    count, regardless of byte size. Feed the result straight into
    ``pipeline.pack_by_token_budget`` for shard assembly whose budgets
    hold for the MODEL's sequence length, not just the text length —
    text-only counting under-packs media-heavy corpora by the whole
    media budget.

    One Catalyst fold per row — zero shuffle, zero Python, a Project
    over the scan at any corpus size.
    """
    mt = media_tokens or {}

    def cost(s: Column) -> Column:
        c: Column = F.lit(int(default_media_tokens))
        for k, v in mt.items():
            c = F.when(s["kind"] == k, F.lit(int(v))).otherwise(c)
        return F.when(s["kind"] == "text", _span_tokens(s)).otherwise(c)

    return docs.withColumn(
        out_col,
        F.aggregate(
            F.col(spans_col),
            F.lit(0).cast("long"),
            lambda acc, s: acc + cost(s).cast("long"),
        ),
    )
