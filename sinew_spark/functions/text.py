"""Text analysis operators for training-data pipelines.

All four are pure-Catalyst column expressions (whole-stage codegen, no
Python), each with a documented ANSI-SQL equivalent for oracle checking:

- token_count:     whitespace tokenization + a BPE-ish subword estimate
- quality_score:   length / punctuation-ratio / stopword-ratio heuristics
- lang_id:         n-gram/stopword-hit heuristic over a fixed profile set
- fingerprint:     md5 document fingerprint over normalized text, plus a
                   shingle-based robust fingerprint (first 8 hex of md5 of
                   the sorted distinct token set — word-order independent)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny public stopword profiles (top function words per language)
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "que", "des", "une", "dans", "pour"],
    "es": ["el", "la", "los", "que", "de", "es", "una", "por", "con", "para"],
}


def tokens_expr(text: Column) -> Column:
    """Whitespace tokens of lowercased trimmed text."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def token_count_expr(text: Column) -> Column:
    """Whitespace token count. SQL: len(regexp_split_to_array(trim(text), '\\s+'))."""
    return F.when(F.trim(text) == "", F.lit(0)).otherwise(F.size(tokens_expr(text)))


def subword_count_expr(text: Column) -> Column:
    """BPE-ish subword estimate: count word chunks, digits runs, and
    punctuation marks separately (a cheap proxy for BPE token count).
    SQL: len(regexp_extract_all(lower(text), '[a-z]{1,4}|[0-9]+|[^a-z0-9\\s]', 0))."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(r"[a-z]{1,4}|[0-9]+|[^a-z0-9\s]"), F.lit(0)))


def punct_ratio_expr(text: Column) -> Column:
    """Fraction of non-alnum/non-space characters."""
    stripped = F.regexp_replace(text, r"[a-zA-Z0-9\s]", "")
    return F.when(F.length(text) > 0, F.length(stripped) / F.length(text)).otherwise(F.lit(0.0))


def stopword_hits_expr(text: Column, lang: str = "en") -> Column:
    """Count of profile-stopword token occurrences."""
    words = LANG_PROFILES[lang]
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), F.lit(0)))


def quality_score_expr(text: Column) -> Column:
    """Composite [0,1] quality heuristic: rewards reasonable length, word
    diversity, low punctuation noise, stopword presence. Deterministic and
    SQL-expressible; thresholds are the usual web-corpus filters."""
    n_tok = token_count_expr(text)
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    distinct_ratio = F.when(
        n_tok > 0, F.size(F.array_distinct(tokens_expr(text))) / n_tok
    ).otherwise(F.lit(0.0))
    punct_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio_expr(text) * 4)
    stop_score = F.least(stopword_hits_expr(text) / F.greatest(n_tok, F.lit(1)) * 5, F.lit(1.0))
    return F.round(
        (len_score * 0.3 + distinct_ratio * 0.3 + punct_penalty * 0.2 + stop_score * 0.2), 6
    )


def lang_id_expr(text: Column) -> Column:
    """Pick the language whose stopword profile hits most (ties -> profile
    order, 'und' if zero hits everywhere). Pure CASE over regexp counts."""
    hits = {lang: stopword_hits_expr(text, lang) for lang in LANG_PROFILES}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # reverse order so earlier profiles win ties via later .when overriding
    for lang in reversed(list(LANG_PROFILES)):
        expr = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint_expr(text: Column) -> Column:
    """Exact content fingerprint: md5 of squished lowercased text.
    SQL: md5(regexp_replace(lower(trim(text)), '\\s+', ' '))."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def robust_fingerprint_expr(text: Column) -> Column:
    """Word-order-independent fingerprint: md5 of the sorted distinct token
    set — catches shuffled/duplicated-word copies."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens_expr(text))), " "))


def _md5_int_expr(s: Column) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT — the oracle-facing
    hash (DuckDB: CAST('0x' || substr(md5(s), 1, 15) AS BIGINT))."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def hashed_linear_score_expr(
    text: Column, buckets: int = 4096, seed: str = "qlc"
) -> Column:
    """fastText-style hashed bag-of-words linear scorer, integer-exact.

    Each token hashes into one of ``buckets`` feature ids; each bucket
    carries an integer weight in [-1000, 1000] derived from
    md5(seed|bucket). The document score is the sum of its tokens'
    weights (multi-count) — the dot product w.x over a term-count
    vector, i.e. the linear quality-classifier shape used to filter
    web corpora at scale. In production the weight vector is a trained
    model broadcast as a map-lookup; the md5 derivation stands in here
    so the scorer is exactly replayable by an independent SQL engine.
    Integer sums are order-independent -> scores are bit-identical
    across partitionings.

    Scale shape: zero shuffle, zero Python — tokens -> TRANSFORM to
    weights -> AGGREGATE sum, all whole-stage codegen (no explode, no
    join against a weight table).
    """
    if buckets <= 0:
        raise ValueError("buckets must be positive")
    weights = F.transform(
        tokens_expr(text),
        lambda t: _md5_int_expr(
            F.concat_ws("|", F.lit(seed), (_md5_int_expr(t) % buckets).cast("string"))
        )
        % 2001
        - 1000,
    )
    total = F.aggregate(weights, F.lit(0).cast("long"), lambda a, x: a + x)
    return F.when(F.trim(text) == "", F.lit(0).cast("long")).otherwise(total)


# phrases that betray an error page served with a 200 status (case-folded
# substring hits; deliberately short + public — the classic heuristic set)
SOFT404_PHRASES = [
    "page not found",
    "404 not found",
    "404 error",
    "does not exist",
    "no longer available",
    "cannot be found",
    "nothing found",
]

SOFT404_MAX_TOKENS = 80  # real content pages rarely stay under this


def soft404_expr(status: Column, text: Column) -> Column:
    """Soft-404 detection — pure Catalyst, zero shuffle: TRUE when a page
    answered 200 but its content is an error page (short body carrying a
    not-found phrase). Crawlers that index soft 404s pollute both the
    corpus and the link graph (every dead link looks alive), so this is
    the standard post-fetch gate: drop the row, and optionally mark the
    URL failed so recrawl scheduling treats it like a real 404.

    Heuristic: status == 200 AND token_count <= SOFT404_MAX_TOKENS AND
    any SOFT404_PHRASES substring hits the case-folded text. Phrase hits
    on a LONG page do not trigger (an article about 404s is content).
    SQL-replayable: lower/contains/token-count have exact DuckDB
    equivalents (the ``soft404_detect`` oracle)."""
    low = F.lower(text)
    hit = None
    for p in SOFT404_PHRASES:
        m = low.contains(p)
        hit = m if hit is None else (hit | m)
    return (
        (status == 200)
        & (token_count_expr(text) <= SOFT404_MAX_TOKENS)
        & F.coalesce(hit, F.lit(False))
    )
