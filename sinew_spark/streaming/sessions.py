"""Per-host crawl sessions — stateful streaming + batch equivalent.

The reference keeps one cookie-jar/connection per process for the whole run
(/root/reference/lib/sinew/base.rb:84-88,204); a distributed crawler needs
per-host session state that survives micro-batches. Two implementations of
the same semantics:

- ``host_session_stream``: Structured Streaming with
  ``applyInPandasWithState`` — running per-host totals persisted in the
  state store across ``availableNow`` invocations (state = the cookie jar's
  moral equivalent; O(hosts), shuffle on host only).
- ``sessionize_events``: batch gaps-and-islands session assignment over an
  ordered event stream (lag + cumulative sum of gap markers), used as the
  oracle-checked driver query. Two window passes over the same (user)
  partitioning — one shuffle, second window reuses it.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

SESSION_OUTPUT = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("total_fetches", T.LongType()),
        T.StructField("total_errors", T.LongType()),
        T.StructField("last_fetch_at", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("total_fetches", T.LongType()),
        T.StructField("total_errors", T.LongType()),
        T.StructField("last_fetch_at", T.DoubleType()),
    ]
)


def _update_host_session(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (host,) = key
    if state.exists:
        fetches, errors, last_at = state.get
    else:
        fetches, errors, last_at = 0, 0, 0.0
    for pdf in pdfs:
        fetches += len(pdf)
        errors += int((pdf["status"] >= 400).sum())
        if len(pdf):
            last_at = max(last_at, float(pdf["fetched_at"].max()))
    state.update((fetches, errors, last_at))
    yield pd.DataFrame(
        {
            "host": [host],
            "total_fetches": [fetches],
            "total_errors": [errors],
            "last_fetch_at": [last_at],
        }
    )


def host_session_stream(fetched_stream: DataFrame) -> DataFrame:
    """Running per-host totals, state persisted across restarts. Output mode
    must be ``update``."""
    return fetched_stream.groupBy("host").applyInPandasWithState(
        _update_host_session,
        outputStructType=SESSION_OUTPUT,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_events(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign session ids via gaps-and-islands: a new session starts when
    the gap to the previous event of the same user exceeds ``gap_seconds``.
    Exactly expressible in ANSI SQL (the DuckDB oracle) — used to verify the
    streaming session semantics batch-side."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    ts = F.col(ts_col).cast("timestamp").cast("double")
    prev = F.lag(ts).over(w)
    new_sess = (prev.isNull() | ((ts - prev) > gap_seconds)).cast("long")
    with_marks = events.withColumn("_new", new_sess)
    sess_id = F.sum("_new").over(w).alias("session_id")
    return (
        with_marks.select(F.col(user_col), F.col(ts_col), sess_id)
        .groupBy(user_col, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )
