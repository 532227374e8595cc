"""Parse stage — fetched pages -> interleaved span documents + outlinks.

The reference parses lazily per recipe call (noko/xml/json views,
/root/reference/lib/sinew/response.rb:27-44); the engine parses each
document exactly once into the interleaved span model
(doc_id, spans: array<struct<kind,text,media_ref,offset>>) required by
BASELINE.json's input_hint, plus resolved outlinks for frontier expansion.

mapInPandas (Arrow batches): one Python crossing for the whole batch, no
per-row UDF. Parsing is CPU-bound and embarrassingly parallel — scales
linearly with partitions, no shuffle."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

SPAN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("offset", T.IntegerType()),
        ]
    )
)

PARSED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("final_url", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("spans", SPAN_TYPE),
        T.StructField("links", T.ArrayType(T.StringType())),
    ]
)


def parse_documents(fetched: DataFrame) -> DataFrame:
    """fetched (sources/fetch.FETCHED_SCHEMA) -> parsed span documents.
    Error responses (status>=400) yield empty spans but are kept — the
    reference caches errors too (README.md:115)."""

    cols = ["canonical_url", "final_url", "status", "content_type", "resp_body", "seq", "depth"]

    def parse_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sinew_spark.functions.htmlparse import extract_spans_and_links

        for pdf in it:
            spans_col, links_col = [], []
            for row in pdf.itertuples(index=False):
                ok = row.status is not None and 200 <= row.status < 400 and row.resp_body
                if not ok:
                    spans_col.append([])
                    links_col.append([])
                    continue
                spans, links = extract_spans_and_links(
                    row.resp_body,
                    row.content_type or "text/html",
                    row.final_url or row.canonical_url,
                )
                spans_col.append(
                    [{"kind": k, "text": t, "media_ref": m, "offset": o} for k, t, m, o in spans]
                )
                links_col.append(links)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["canonical_url"],
                    "final_url": pdf["final_url"],
                    "status": pdf["status"],
                    "content_type": pdf["content_type"],
                    "seq": pdf["seq"],
                    "depth": pdf["depth"],
                    "spans": spans_col,
                    "links": links_col,
                }
            )
            yield out

    return fetched.select(cols).mapInPandas(parse_batch, PARSED_SCHEMA)
