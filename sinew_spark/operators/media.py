"""Media asset operators over interleaved span documents.

A multimodal corpus at crawl scale references the same media object
from many pages (site logos, stock photos, shared CDN assets) and the
same *bytes* from many URLs (mirrors, cache-busting query strings —
the media flavor of DUST). Training pipelines want an asset-level
view: each distinct object stored once, pages holding references, and
reference counts for sampling/weighting decisions.

Two operators on the engine's span model (doc_id, spans:array<struct<
kind, text, media_ref, offset>>):

- ``media_asset_table``: one row per asset with document/spans
  refcounts and a deterministic canonical ref. Identity is the
  media_ref itself, or — when a ``digests`` table (media_ref, digest)
  from the fetch/decode stage is supplied — the content digest, which
  merges byte-identical assets behind different URLs.

- ``canonicalize_media_refs``: rewrite every media span's ref to its
  digest-group canonical (min ref, deterministic). Downstream exact
  dedup / packing then treats mirrored assets as one.

Scale shape: asset stats are explode -> ONE distinct-aggregate on the
asset key (shuffle carries refs/digests, never media bytes). The
rewrite cannot be done inside the array without per-row lookup state,
so it explodes media refs per doc, joins the (ref -> canonical)
mapping — broadcast when the distinct-asset table fits, the default —
regroups to a per-doc map (one shuffle on doc_id), and patches the
span array with a zero-copy Catalyst ``transform`` +
``element_at(map, ref)``. Text spans never leave the array.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _media_spans(spans_col: str) -> Column:
    return F.filter(
        F.col(spans_col),
        lambda s: (s["kind"] != "text") & s["media_ref"].isNotNull(),
    )


def media_asset_table(
    docs: DataFrame,
    digests: Optional[DataFrame] = None,
    doc_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Asset-level stats: ``asset_key, canonical_ref, n_docs, n_spans,
    n_kinds``. Without ``digests`` the key is the media_ref itself
    (canonical_ref == asset_key); with digests, byte-identical assets
    merge and canonical_ref is the lexicographic min of the group's
    refs (deterministic, partition-independent)."""
    ex = docs.select(
        F.col(doc_col).alias("_doc"), F.explode(_media_spans(spans_col)).alias("_s")
    ).select("_doc", F.col("_s")["kind"].alias("kind"), F.col("_s")["media_ref"].alias("media_ref"))
    if digests is not None:
        d = digests.select(
            F.col("media_ref").alias("_dref"), F.col("digest").alias("asset_key")
        )
        ex = ex.join(d, ex["media_ref"] == d["_dref"], "left").select(
            "_doc",
            "kind",
            "media_ref",
            # refs the fetch stage never resolved stay their own asset
            F.coalesce(F.col("asset_key"), F.col("media_ref")).alias("asset_key"),
        )
    else:
        ex = ex.withColumn("asset_key", F.col("media_ref"))
    return ex.groupBy("asset_key").agg(
        F.min("media_ref").alias("canonical_ref"),
        F.countDistinct("_doc").alias("n_docs"),
        F.count(F.lit(1)).alias("n_spans"),
        F.countDistinct("kind").alias("n_kinds"),
    )


def canonicalize_media_refs(
    docs: DataFrame,
    digests: DataFrame,
    doc_col: str = "doc_id",
    spans_col: str = "spans",
    broadcast_mapping: bool = True,
) -> DataFrame:
    """Rewrite media_refs to their digest-group canonical (min ref).
    Returns ``docs`` with ``spans_col`` replaced in place; spans whose
    ref has no digest row, and all text spans, pass through untouched.

    Set ``broadcast_mapping=False`` when the distinct-asset mapping is
    too large to broadcast — the join then shuffles on media_ref.
    """
    canon = digests.groupBy("digest").agg(F.min("media_ref").alias("_canon"))
    # one canonical per media_ref BEFORE the per-doc map fold: a ref that
    # carries two digests (re-fetch with changed bytes) would otherwise
    # produce duplicate map keys, which raise DUPLICATED_MAP_KEY under
    # Spark's default EXCEPTION policy. min keeps the fold deterministic.
    mapping = (
        digests.join(canon, "digest")
        .groupBy(F.col("media_ref").alias("_mref"))
        .agg(F.min("_canon").alias("_canon"))
        .where(F.col("_mref") != F.col("_canon"))
    )
    if broadcast_mapping:
        mapping = F.broadcast(mapping)
    refs = docs.select(
        F.col(doc_col).alias("_doc"),
        F.explode(
            F.array_distinct(
                F.transform(_media_spans(spans_col), lambda s: s["media_ref"])
            )
        ).alias("_ref"),
    )
    per_doc = (
        refs.join(mapping, refs["_ref"] == mapping["_mref"], "inner")
        .groupBy("_doc")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_set(F.struct("_ref", "_canon")))
            ).alias("_remap")
        )
    )
    joined = docs.join(per_doc, docs[doc_col] == per_doc["_doc"], "left").drop(
        "_doc"
    )
    remap = F.coalesce(
        F.col("_remap"), F.create_map().cast("map<string,string>")
    )
    patched = F.transform(
        F.col(spans_col),
        lambda s: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            F.coalesce(
                F.element_at(remap, F.coalesce(s["media_ref"], F.lit(""))),
                s["media_ref"],
            ).alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    return joined.withColumn(spans_col, patched).drop("_remap")


def perceptual_media_groups(
    media: DataFrame,
    max_hamming: int = 3,
    fake: bool = False,
    id_col: str = "media_id",
) -> DataFrame:
    """Collapse near-duplicate IMAGE assets: (media_id, canonical) where
    ``canonical`` is the min media_id of the perceptual-duplicate group.

    The perceptual analogue of ``canonicalize_media_refs``'s digest path:
    digests merge byte-identical mirrors; this merges re-encoded,
    brightness-shifted, lightly-retouched copies — the dominant media
    redundancy in a web corpus, invisible to content digests. Chain:
    dHash signature (multimodal.image_dhash, map-only Arrow batches) ->
    banded Hamming candidate join + exact popcount verify
    (dedup.hamming_block_pairs; pixels never shuffle, signatures do) ->
    connected components (graph.connected_components, min-id contract).
    Undecodable bytes (NULL signature) and singletons stay their own
    canonical. Output is a (ref -> canonical) mapping shaped for
    ``canonicalize_media_refs``'s rewrite join.

    Transitivity note: hamming is not transitive, so a component can span
    pairs whose endpoints differ by more than ``max_hamming`` — the
    standard union-find semantics of near-dup clustering (same contract
    as minhash_dedup's LSH components)."""
    from sinew_spark.multimodal import image_dhash
    from sinew_spark.operators.dedup import hamming_block_pairs
    from sinew_spark.operators.graph import connected_components

    sigs = image_dhash(
        media.select(F.col(id_col).alias("media_id"), "content"), fake=fake
    ).where(F.col("dhash").isNotNull())
    # checkpoint BEFORE the block self-join: left and right project the
    # same lineage differently, so without this the Python decode stage
    # runs twice (once per join side)
    sigs = sigs.localCheckpoint(eager=True)
    pairs = hamming_block_pairs(
        sigs, max_hamming=max_hamming, id_col="media_id", sig_col="dhash", bits=64
    )
    # connected_components re-evaluates its edge plan once per label
    # round — checkpoint so the banded join runs ONCE, not per round
    pairs = pairs.localCheckpoint(eager=True)
    cc = connected_components(pairs, src="a", dst="b")
    return (
        media.select(F.col(id_col).alias("media_id"))
        .join(cc.select(F.col("v").alias("media_id"), "cluster"), "media_id", "left")
        .select(
            "media_id",
            F.coalesce("cluster", F.col("media_id")).alias("canonical"),
        )
    )
