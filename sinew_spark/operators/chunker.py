"""Content-defined chunking (CDC) for shift-tolerant dedup.

Fixed-size blocking breaks the moment one byte is inserted — every
downstream block shifts and nothing matches.  Content-defined
chunking cuts where the CONTENT says to cut (a rolling hash over a
small window hitting a divisor condition), so two documents sharing a
long substring at *different offsets* still produce identical chunks
for the shared region.  This is the standard dedup primitive for
storage systems (LBFS, Venti, restic/borg "gear" chunkers) and for
training-corpus near-dup at sub-document granularity — the reference
has no equivalent (its dedup unit is the whole HTTP response keyed by
url, lib/sinew/base.rb cache); at 100 TB the sub-document layer is
where shifted boilerplate and quoted-reply duplication live.

Chunking spec (deliberately stateless so an oracle can replay it in
SQL):
  - characters are Unicode code points c_1..c_n;
  - for every window start i (1-based, i + w - 1 <= n) the hash is
    H(i) = (sum_j c_{i+j} * B^(w-1-j)) mod M  — a degree-(w-1)
    polynomial in B over Z_M;
  - a cut is placed after position i + w - 1 whenever
    H(i) mod D == 0;  the end of the text is always a cut;
  - chunks are the substrings between consecutive cuts.
  No min/max chunk clamps: clamps make chunk k depend on where chunk
  k-1 ended (sequential state), which would force a per-row walk in
  both engines.  Without them every window is independent, the engine
  side is one vectorized sliding-window dot product, and the expected
  chunk length is still geometric with mean ~D.

Scale shape: chunking is embarrassingly parallel (mapInPandas, numpy
sliding_window_view dot — no Python per-character loop); the dedup
stats are one groupBy(chunk_hash) count-distinct plus one
co-partitioned join back and one groupBy(doc) — chunk_hash keys are
uniform by construction, so no skew.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _cut_positions(
    codes: "np.ndarray", window: int, divisor: int, powers: "np.ndarray", modulus: int
) -> "np.ndarray":
    """1-based end positions of every content-defined cut, final cut
    at len included exactly once."""
    n = codes.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n >= window:
        from numpy.lib.stride_tricks import sliding_window_view

        h = (sliding_window_view(codes, window) @ powers) % modulus
        cuts = np.nonzero(h % divisor == 0)[0] + window  # end of window, 1-based
    else:
        cuts = np.empty(0, dtype=np.int64)
    if cuts.shape[0] == 0 or cuts[-1] != n:
        cuts = np.append(cuts, n)
    return cuts


def cdc_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    divisor: int = 64,
    base: int = 257,
    modulus: int = 1_000_003,
) -> DataFrame:
    """Explode every document into its content-defined chunks.

    Returns (id_col, chunk_idx, chunk_len, chunk_hash) — chunk_hash is
    the md5 hex of the chunk text (md5 is the oracle-facing content
    identity throughout this engine; the engine-internal key space
    uses xxhash64).  Documents with empty text emit no rows.
    """
    if window < 2:
        raise ValueError("window must be >= 2")
    if divisor < 2:
        raise ValueError("divisor must be >= 2 (divisor 1 cuts every window)")
    # the vectorized dot accumulates window terms of (code_point *
    # power) in int64; numpy would WRAP silently past 2^63 and diverge
    # from the documented polynomial-mod spec, so reject parameter
    # combinations whose worst case (all U+10FFFF) cannot fit
    if window * 0x10FFFF * (modulus - 1) >= 2**63:
        raise ValueError(
            f"window={window} x modulus={modulus} overflows the int64 "
            "rolling-hash accumulator (bound: window * 0x10FFFF * "
            "(modulus-1) < 2**63); lower one of them"
        )
    powers = np.array(
        [pow(base, window - 1 - j, modulus) for j in range(window)], dtype=np.int64
    )
    id_type = docs.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("chunk_idx", T.IntegerType()),
            T.StructField("chunk_len", T.LongType()),
            T.StructField("chunk_hash", T.StringType()),
        ]
    )

    def chunk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, hashes = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None or text == "":
                    continue
                # utf-32-le = one uint32 per code point, so the rolling
                # hash sees characters, not utf-8 bytes.
                codes = np.frombuffer(
                    text.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                cuts = _cut_positions(codes, window, divisor, powers, modulus)
                prev = 0
                for k, cut in enumerate(cuts):
                    piece = text[prev:cut]
                    ids.append(doc_id)
                    idxs.append(k)
                    lens.append(cut - prev)
                    hashes.append(hashlib.md5(piece.encode("utf-8")).hexdigest())
                    prev = int(cut)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "chunk_len": pd.Series(lens, dtype="int64"),
                    "chunk_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(chunk_batches, out_schema)


def cdc_dedup_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    divisor: int = 64,
    base: int = 257,
    modulus: int = 1_000_003,
) -> DataFrame:
    """Per-document chunk-level dedup profile against the whole corpus.

    Returns (id_col, n_chunks, total_chars, n_shared_chunks,
    shared_chars): a chunk is *shared* when its content (md5) appears
    in >= 2 distinct documents — exactly the bytes a chunk store would
    not write twice.  shared_chars / total_chars is the shift-tolerant
    dup ratio fixed-block dedup under-reports.

    Plan: chunk explode (map-only) -> groupBy(chunk_hash)
    count_distinct(doc) -> join back on chunk_hash (co-partitioned,
    exchange reused) -> groupBy(doc).  Chunk hashes are uniform, so
    both shuffles are skew-free; nothing is ever collected.
    """
    chunks = cdc_chunks(
        docs,
        text_col=text_col,
        id_col=id_col,
        window=window,
        divisor=divisor,
        base=base,
        modulus=modulus,
    )
    spread = chunks.groupBy("chunk_hash").agg(
        F.count_distinct(id_col).alias("_ndocs")
    )
    shared = F.col("_ndocs") >= 2
    return (
        chunks.join(spread, "chunk_hash")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("chunk_len").alias("total_chars"),
            F.sum(shared.cast("long")).alias("n_shared_chunks"),
            F.coalesce(
                F.sum(F.when(shared, F.col("chunk_len"))), F.lit(0).cast("long")
            ).alias("shared_chars"),
        )
    )
