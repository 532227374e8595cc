"""sinew_spark — a PySpark-native distributed crawl/analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of gurgeous/sinew (reference at /root/reference, v4.0.1) as a
distributed URL-frontier + fetch scheduler over snapshot-versioned tables:

- frontier rounds as BFS supersteps over DataFrames (no RDDs)
- exactly-once fetch via canonicalized xxhash64 keys checked EXACTLY —
  shard-local sorted-key probe (with a partitioned Bloom fused in as a
  short-circuit) or left-anti join (reference: httpdisk cache semantics,
  /root/reference/lib/sinew/base.rb:217-222, README.md:114-116)
- per-host politeness windows, robots gating, priority queue, retry/redirect
- vectorized Arrow/pandas UDFs for parse + normalize (no per-row Python)
- interleaved text+media span records (kind, text, media_ref, offset)
- byte-exact CSV emit pipeline matching sinew's normalize
  (/root/reference/lib/sinew/csv.rb:57-87)
- resumable from snapshot checkpoints with per-round lineage + metrics
- a training-data analytics suite over the crawled corpus: dedup
  (exact/MinHash/SimHash/embedding + connected-component clusters),
  ANN, exact-integer PageRank and k-means, recrawl scheduling, trap
  detection, boilerplate removal, quality scoring/classification,
  sampling/packing/splits, HLL + count-min sketches — every operator
  backed by an independent DuckDB SQL oracle (see __spark_entry__.py)

Architecture is Spark-first: declarative DataFrame plans optimized by
Catalyst; Python appears only inside Arrow-batched UDFs.
"""

__version__ = "0.1.0"

from sinew_spark.crawl import Crawler, CrawlOptions  # noqa: E402
from sinew_spark.recipes import Recipe, RecipeResult, Step, run_recipe  # noqa: E402
from sinew_spark.session import get_spark  # noqa: E402

__all__ = [
    "Crawler",
    "CrawlOptions",
    "Recipe",
    "RecipeResult",
    "Step",
    "run_recipe",
    "get_spark",
    "__version__",
]
