"""Extraction operators — recipe-level projection over fetched documents.

The reference's recipes extract with arbitrary Ruby: `body.scan(regex)`,
`noko.css(sel).each { ... }`, `response.url` (/root/reference/test/recipes/
basic.sinew, noko.sinew, xml.sinew, url.sinew; README.md:52-88). The engine
compiles those three extraction shapes into DataFrame operators:

- regex scan   -> pure Catalyst: regexp_extract_all + posexplode (JVM-side,
                  whole-stage codegen; no Python at all)
- css select   -> Arrow-batched mapInPandas using the span parser; one
                  Python crossing per batch
- row project  -> plain select

Each emitted row carries a deterministic (seq, match_idx) pair so the total
emit order replays the reference's single-threaded program order.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# column spec forms: "final_url" | ("regex_group", i) | "text" | "inner_html"
#                    | ("attr", name) | ("const", value) | ("json", "a.b")


def regex_scan(fetched: DataFrame, pattern: str, columns: dict) -> DataFrame:
    """One output row per regex match over the RAW body (Ruby String#scan
    semantics, basic.sinew:2-4). Catalyst-only."""
    groups = sorted({spec[1] for spec in columns.values() if isinstance(spec, tuple) and spec[0] == "regex_group"})
    base = fetched.select(
        "seq",
        "final_url",
        *[
            F.regexp_extract_all(F.col("resp_body"), F.lit(pattern), F.lit(g)).alias(f"_g{g}")
            for g in groups
        ],
    )
    first = f"_g{groups[0]}" if groups else None
    if first is None:
        raise ValueError("regex_scan needs at least one regex_group column")
    ex = base.select("seq", "final_url", F.posexplode(first).alias("match_idx", f"_v{groups[0]}"))
    for g in groups[1:]:
        # align other groups by match index
        other = base.select("seq", F.posexplode(f"_g{g}").alias("match_idx", f"_v{g}"))
        ex = ex.join(other, ["seq", "match_idx"], "left_outer")
    cols = []
    for name, spec in columns.items():
        cols.append(_project(spec, groups_prefix="_v").alias(name))
    return ex.select("seq", "match_idx", *cols)


def css_extract(
    fetched: DataFrame, selector: str, columns: dict, xml: bool = False
) -> DataFrame:
    """One output row per CSS-matched node (noko.sinew/xml.sinew semantics:
    selection over the cleaned html, node text/attr/inner_html projection).
    xml=True parses and matches CASE-SENSITIVELY (Nokogiri::XML parity,
    reference response.rb:42-44 — Nokogiri::HTML lowercases, XML does
    not; diverges only on documents with case-distinct tags)."""
    col_items = list(columns.items())

    out_fields = [
        T.StructField("seq", T.LongType()),
        T.StructField("match_idx", T.IntegerType()),
    ] + [T.StructField(name, T.StringType()) for name, _ in col_items]
    schema = T.StructType(out_fields)

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sinew_spark.functions.htmlparse import css_select, parse_html

        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                root = parse_html(r.resp_body or "", xml=xml)
                for i, node in enumerate(css_select(root, selector, xml=xml)):
                    vals = {"seq": r.seq, "match_idx": i}
                    for name, spec in col_items:
                        if spec == "text":
                            vals[name] = node.text()
                        elif spec == "inner_html":
                            vals[name] = node.inner_html()
                        elif isinstance(spec, tuple) and spec[0] == "attr":
                            vals[name] = node.get(spec[1])
                        elif spec == "final_url":
                            vals[name] = r.final_url
                        elif isinstance(spec, tuple) and spec[0] == "const":
                            vals[name] = str(spec[1])
                        else:
                            raise ValueError(f"bad css column spec {spec!r}")
                    rows.append(vals)
            yield pd.DataFrame(rows, columns=[f.name for f in out_fields])

    return fetched.select("seq", "final_url", "resp_body").mapInPandas(batch, schema)


def extract_canonical(
    fetched: DataFrame,
    url_col: str = "final_url",
    body_col: str = "resp_body",
    content_type_col: str = "content_type",
) -> DataFrame:
    """Per-page declared canonical URL (``<link rel=canonical>``, RFC 6596)
    — (url, canonical) with canonical NULL when the page declares none.
    Arrow-batched mapInPandas over the span parser (one Python crossing
    per batch, same shape as css_extract); relative canonicals resolve
    against the page URL. Feeds collapse_by_canonical."""
    has_ct = content_type_col in fetched.columns
    cols = [F.col(url_col).alias("url"), F.col(body_col).alias("body")]
    cols.append(
        (F.col(content_type_col) if has_ct else F.lit("text/html")).alias("ct")
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("canonical", T.StringType()),
        ]
    )

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sinew_spark.functions.htmlparse import page_canonical

        for pdf in it:
            out = {"url": [], "canonical": []}
            for r in pdf.itertuples(index=False):
                out["url"].append(r.url)
                out["canonical"].append(
                    page_canonical(r.body or "", r.url or "", r.ct or "text/html")
                )
            yield pd.DataFrame(out)

    return fetched.select(cols).mapInPandas(batch, schema)


def row_project(fetched: DataFrame, columns: dict) -> DataFrame:
    """One output row per fetched document (url.sinew semantics)."""
    cols = [_project(spec).alias(name) for name, spec in columns.items()]
    return fetched.select("seq", F.lit(0).alias("match_idx"), *cols)


def _project(spec, groups_prefix: str = "_v"):
    if spec == "final_url":
        return F.col("final_url")
    if isinstance(spec, tuple) and spec[0] == "regex_group":
        return F.col(f"{groups_prefix}{spec[1]}")
    if isinstance(spec, tuple) and spec[0] == "const":
        return F.lit(spec[1]).cast("string")
    if isinstance(spec, tuple) and spec[0] == "json":
        # the reference's json/mash views: symbolized-keys JSON with dotted
        # access (response.rb:27-34, `mash.a.b`). Catalyst-only:
        # get_json_object over the raw body, '$.a.b' path.
        return F.get_json_object(F.col("resp_body"), "$." + spec[1])
    raise ValueError(f"bad column spec {spec!r}")
