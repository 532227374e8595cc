"""Content-defined chunking: spec conformance + shift tolerance."""

import hashlib

import numpy as np
import pytest

from sinew_spark.operators.chunker import (
    _cut_positions,
    cdc_chunks,
    cdc_dedup_stats,
)

W, D, B, M = 8, 64, 257, 1_000_003
POWERS = np.array([pow(B, W - 1 - j, M) for j in range(W)], dtype=np.int64)


def _ref_cuts(text):
    """Straight-line replay of the documented spec."""
    n = len(text)
    cuts = []
    for i in range(0, n - W + 1):
        h = sum(ord(text[i + j]) * pow(B, W - 1 - j, M) for j in range(W)) % M
        if h % D == 0:
            cuts.append(i + W)
    if not cuts or cuts[-1] != n:
        cuts.append(n)
    return cuts


def _codes(text):
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)


@pytest.mark.parametrize(
    "text",
    [
        "",
        "short",
        "exactly8",
        "a" * 100,
        "".join(chr(97 + (i * 7) % 26) for i in range(500)),
        hashlib.md5(b"seed").hexdigest() * 10,
        "unicode é€中 text " * 20,
    ],
)
def test_cut_positions_match_spec(text):
    got = _cut_positions(_codes(text), W, D, POWERS, M).tolist()
    if text == "":
        assert got == []
    else:
        assert got == _ref_cuts(text)


def test_chunks_cover_text_exactly(spark):
    text = hashlib.md5(b"cov").hexdigest() * 8
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(cdc_chunks(df).collect(), key=lambda r: r["chunk_idx"])
    assert sum(r["chunk_len"] for r in rows) == len(text)
    assert rows[0]["chunk_idx"] == 0
    assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
    # Reassemble via hashes: chunk boundaries from the spec replay.
    cuts = _ref_cuts(text)
    prev = 0
    for r, cut in zip(rows, cuts):
        piece = text[prev:cut]
        assert r["chunk_hash"] == hashlib.md5(piece.encode()).hexdigest()
        prev = cut


def test_shift_tolerance(spark):
    # The CDC selling point: identical payload behind different-length
    # prefixes still deduplicates chunk-for-chunk (except the prefix
    # chunk that absorbs the shift).  The payload must be APERIODIC
    # with interior cuts — a repeated md5 has only 32 distinct windows
    # and can land zero cuts (seed "pay0|k" cuts at offsets 82/127/140,
    # verified by the guard below).
    payload = "".join(
        hashlib.md5(f"pay0|{k}".encode()).hexdigest() for k in range(6)
    )  # 192 chars
    interior = [c for c in _ref_cuts(payload) if W < c < len(payload)]
    assert interior and interior[0] <= len(payload) // 2
    docs = [(i, "z" * (3 * i) + payload) for i in range(4)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    stats = {r["doc_id"]: r.asDict() for r in cdc_dedup_stats(df).collect()}
    assert set(stats) == {0, 1, 2, 3}
    for i, row in stats.items():
        assert row["total_chars"] == 3 * i + len(payload)
        # The shared payload dominates: most chars sit in shared chunks.
        assert row["shared_chars"] >= len(payload) // 2
        assert row["n_shared_chunks"] >= 1


def test_unique_docs_share_nothing(spark):
    docs = [(i, hashlib.md5(f"u{i}".encode()).hexdigest() * 4) for i in range(5)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    stats = cdc_dedup_stats(df).collect()
    assert len(stats) == 5
    for r in stats:
        assert r["n_shared_chunks"] == 0
        assert r["shared_chars"] == 0


def test_empty_and_null_text_emit_nothing(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "payload text that is real")],
        ["doc_id", "text"],
    )
    ids = {r["doc_id"] for r in cdc_chunks(df).collect()}
    assert ids == {3}


def test_string_id_column(spark):
    df = spark.createDataFrame(
        [("docA", "x" * 40), ("docB", "x" * 40)], ["doc_id", "text"]
    )
    stats = {r["doc_id"]: r for r in cdc_dedup_stats(df).collect()}
    assert set(stats) == {"docA", "docB"}
    # Identical texts: every chunk shared.
    for r in stats.values():
        assert r["n_shared_chunks"] == r["n_chunks"]
        assert r["shared_chars"] == r["total_chars"] == 40


def test_param_validation(spark):
    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        cdc_chunks(df, window=1)
    with pytest.raises(ValueError):
        cdc_chunks(df, divisor=1)


def test_overflow_prone_params_rejected(spark):
    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="int64"):
        cdc_chunks(df, window=64, modulus=2**40)
