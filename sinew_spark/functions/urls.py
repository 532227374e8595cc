"""URL canonicalization + request identity — the crawl dedup contract.

Reimplements the cache-identity semantics of the reference
(/root/reference/lib/sinew/base.rb:108-122 and httpdisk behavior proven by
/root/reference/test/test_base.rb:28-41,87-103):

- identity = (method, canonical url, request body)
- ``ignore_params`` are stripped from the canonical url before hashing
  (test_base.rb:28-34: ?b=1 and ?b=2 collapse to one fetch)
- default params / url_prefix are folded in before canonicalization
  (test_base.rb:37-41)
- GET vs POST distinct; same URL + different body distinct

Engine key = ``xxhash64(method, canonical_url, body)`` via the built-in
Catalyst ``xxhash64`` (JVM-side, whole-stage codegen) — no Python in the
hot path. The canonicalizer itself is a vectorized pandas UDF (urllib
parsing is not expressible in Catalyst); its output is cached in the
frontier table so each URL is canonicalized once per lifetime.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column, functions as F, types as T

DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url_str(
    url: str,
    base: str | None = None,
    default_params: dict | None = None,
    ignore_params: frozenset | None = None,
) -> str | None:
    """Canonicalize one URL. Deterministic, idempotent.

    scheme/host lowercased, default port dropped, dot-segments resolved,
    query params merged with defaults then sorted, ignore_params removed,
    fragment dropped, empty path -> '/'.
    """
    if url is None or url == "":
        return None
    if base:
        url = urljoin(base, url)
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower()
    host = parts.hostname.lower() if parts.hostname else ""
    port = parts.port
    netloc = host
    if port is not None and str(port) != DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    if parts.username:
        cred = parts.username + (f":{parts.password}" if parts.password else "")
        netloc = f"{cred}@{netloc}"
    path = parts.path or "/"
    # resolve /./ and /../ segments
    segs: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(segs) > 1:
                segs.pop()
            continue
        segs.append(seg)
    path = "/".join(segs) or "/"
    q = parse_qsl(parts.query, keep_blank_values=True)
    if default_params:
        have = {k for k, _ in q}
        q += [(k, str(v)) for k, v in default_params.items() if k not in have]
    if ignore_params:
        q = [(k, v) for k, v in q if k not in ignore_params]
    q.sort()
    return urlunsplit((scheme, netloc, path, urlencode(q), ""))


def make_canonicalize_udf(
    url_prefix: str | None = None,
    default_params: dict | None = None,
    ignore_params=(),
):
    """Build a vectorized canonicalize pandas UDF with crawl options baked in
    (mirrors sinew options url_prefix/params/ignore_params,
    /root/reference/lib/sinew/base.rb:40,188-196)."""
    ig = frozenset(ignore_params or ())
    dp = dict(default_params or {})
    prefix = url_prefix

    @F.pandas_udf(T.StringType())
    def canonicalize(urls: pd.Series) -> pd.Series:
        return urls.map(
            lambda u: canonicalize_url_str(u, base=prefix, default_params=dp, ignore_params=ig)
            if u is not None
            else None
        )

    return canonicalize


def host_expr(url: Column) -> Column:
    """Extract lowercase host from a canonical URL — pure Catalyst."""
    return F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)", 1))


def path_expr(url: Column) -> Column:
    """Extract path (with leading /) from a canonical URL — pure Catalyst."""
    p = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)?", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def request_key_expr(method: Column, canonical_url: Column, body: Column) -> Column:
    """Request identity hash: xxhash64(method, canonical_url, body).

    JVM-side 64-bit hash (Catalyst built-in). Identity semantics per
    /root/reference/lib/sinew/base.rb:108-122: body '' and NULL coalesce."""
    return F.xxhash64(
        F.upper(F.coalesce(method, F.lit("GET"))),
        canonical_url,
        F.coalesce(body, F.lit("")),
    )


def request_key_md5_expr(method: Column, canonical_url: Column, body: Column) -> Column:
    """Oracle-checkable variant of the identity key (md5 exists in both Spark
    and DuckDB; xxhash64 does not exist in DuckDB). Same identity semantics."""
    return F.md5(
        F.concat_ws(
            "",
            F.upper(F.coalesce(method, F.lit("GET"))),
            canonical_url,
            F.coalesce(body, F.lit("")),
        )
    )
