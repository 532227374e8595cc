"""Bucketed postings layout for BM25 serving — bucket-pruning evidence.

At index-serving scale the postings table is the corpus-sized side;
a query touches a handful of terms. Writing postings with
``bucketBy(N, term)`` turns the per-query term in-list into BUCKET
PRUNING: the scan opens only the bucket files whose Murmur3(term)
matches a query term — `SelectedBucketsCount: k out of N` in the plan
— so per-query I/O is ~|query terms|/N of the index regardless of
corpus size. This is the on-disk layout `operators/search.py`
documents as the scale path for `bm25_topk`'s pruned scan.
"""

from pyspark.sql import functions as F

from sinew_spark.operators.search import build_inverted_index, bm25_topk
from sinew_spark.plans.bucketed import read_bucketed, write_bucketed


def _corpus(spark, n=60):
    rows = [
        (f"d{i}", " ".join(f"w{(i + j) % 25}" for j in range(10))) for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_bucketed_postings_prune_and_score_identically(spark, tmpdir_path):
    idx = build_inverted_index(_corpus(spark))
    write_bucketed(
        idx.postings, "bm25_postings_t", ["term"], 8, path=f"{tmpdir_path}/post"
    )
    try:
        bucketed = read_bucketed(spark, "bm25_postings_t")
        # a filter-only query has no join/agg for autoBucketedScan to
        # keep the bucketed layout for — disable it so the scan stays
        # bucketed and the in-list becomes bucket pruning
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        pruned = bucketed.filter(F.col("term").isin(["w1", "w7"]))
        # executedPlan().toString() truncates the FileScan detail where
        # SelectedBucketsCount lives — use the formatted explain string
        jvm = spark._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        plan = pruned._jdf.queryExecution().explainString(mode)
        assert "SelectedBucketsCount" in plan
        # the two terms hash into at most 2 of the 8 buckets
        import re

        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m and int(m.group(1)) <= 2 and int(m.group(2)) == 8
        # scoring over the bucketed postings returns bit-identical results
        from sinew_spark.operators.search import InvertedIndex

        idx2 = InvertedIndex(
            postings=bucketed,
            terms=idx.terms,
            n_docs=idx.n_docs,
            total_dl=idx.total_dl,
        )
        a = [tuple(r) for r in bm25_topk(idx, ["w1", "w7"], k=10).collect()]
        b = [tuple(r) for r in bm25_topk(idx2, ["w1", "w7"], k=10).collect()]
        assert a == b
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
        spark.sql("DROP TABLE IF EXISTS bm25_postings_t")
