"""CSV sink — header freeze, projection, normalization, ordered emit.

Replicates the reference's CSV semantics (/root/reference/lib/sinew/csv.rb,
base.rb:130-151):

- schema frozen at first write: explicit header list or the first emitted
  row's key order (test/recipes/array_header.sinew, implicit_header.sinew);
  freezing twice raises (csv.rb:16)
- later rows are PROJECTED onto the frozen header: extra keys silently
  dropped, missing keys -> empty cells (csv.rb:34-41, test_base.rb:119-124)
- every cell flows through the normalize pipeline (functions/normalize.py)
- emit order is the replayable total order `seq` (the reference's order is
  program order under a mutex, base.rb:136-151; the engine's is an explicit
  column) — `limit` keeps the first k by seq (base.rb:146-149)
- tally counts non-null cells per column (csv.rb:36-39) == Spark count(col)

Two writers: `csv_bytes` collects ordered rows and renders byte-exact CSV
(golden compare; quoting rules identical to Ruby's CSV — quote iff the cell
contains quote/comma/newline); `write_csv_distributed` uses Spark's CSV
writer for scale (one file per partition, ordered within+across by seq via
repartitionByRange)."""

from __future__ import annotations

import io

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sinew_spark.functions.normalize import normalize_udf


class HeaderFrozenError(RuntimeError):
    pass


def normalize_cell(col, dtype) -> F.Column:
    """N1/N2 coercion + the N3-N10 pipeline for one column."""
    c = F.col(col) if isinstance(col, str) else col
    if isinstance(dtype, T.ArrayType):
        c = F.array_join(c.cast(T.ArrayType(T.StringType())), "|")
    else:
        c = c.cast("string")
    return normalize_udf(c)


def project_emits(df: DataFrame, columns: list[str]) -> DataFrame:
    """Project emitted rows onto the frozen header: normalize present
    columns, NULL-fill missing ones, drop extras. Keeps `seq`."""
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for c in columns:
        if c in dtypes:
            cols.append(normalize_cell(c, dtypes[c]).alias(c))
        else:
            cols.append(F.lit(None).cast("string").alias(c))
    return df.select(*cols, F.col("seq"))


def tally_counts(projected: DataFrame, columns: list[str]) -> tuple[int, dict]:
    """(total rows, per-column non-null counts) — csv.rb:36-42. Spark's
    count(col) skips nulls, matching the reference exactly; one job, one
    partial-aggregated pass."""
    row = projected.agg(
        F.count(F.lit(1)).alias("__total"), *[F.count(c).alias(c) for c in columns]
    ).collect()[0]
    return row["__total"], {c: row[c] for c in columns}


def tally_report(total: int, tally: dict) -> list[tuple[str, int, float]]:
    """Footer report rows sorted by (-count, column) (main.rb:53-60)."""
    if total == 0:
        return []
    return [
        (c, n, n * 100.0 / total)
        for c, n in sorted(tally.items(), key=lambda kv: (-kv[1], str(kv[0])))
    ]


def _ruby_csv_cell(v: str | None) -> str:
    if v is None:
        return ""
    if any(ch in v for ch in (",", '"', "\n", "\r")):
        return '"' + v.replace('"', '""') + '"'
    return v


def csv_bytes(projected: DataFrame, columns: list[str], limit: int | None = None) -> str:
    """Byte-exact CSV (header + rows ordered by seq, limit applied) — the
    golden-compare path. Collect is bounded by `limit`/test scale; use
    write_csv_distributed for big outputs."""
    df = projected.orderBy("seq")
    if limit is not None:
        df = df.limit(limit)
    buf = io.StringIO()
    buf.write(",".join(_ruby_csv_cell(c) for c in columns) + "\n")
    for row in df.select(columns).toLocalIterator():
        buf.write(",".join(_ruby_csv_cell(row[c]) for c in columns) + "\n")
    return buf.getvalue()


def write_csv_distributed(projected: DataFrame, columns: list[str], path: str, n_files: int = 32) -> None:
    """Scale path: range-partition by seq so files sort globally, Spark CSV
    writer (header per file)."""
    (
        projected.repartitionByRange(n_files, "seq")
        .sortWithinPartitions("seq")
        .select(columns)
        .write.mode("overwrite")
        .option("header", True)
        .csv(path)
    )


class CsvSink:
    """Stateful wrapper mirroring sinew's CSV object lifecycle: freeze once,
    emit DataFrames, render/report."""

    def __init__(self, columns: list[str] | None = None):
        self.columns: list[str] | None = list(columns) if columns else None
        self._emits: list[DataFrame] = []

    @property
    def started(self) -> bool:
        return self.columns is not None

    def freeze_header(self, columns: list[str]) -> None:
        if self.started:
            raise HeaderFrozenError("started twice")  # csv.rb:16
        self.columns = list(columns)

    def emit(self, df: DataFrame) -> None:
        """df: emitted rows with a seq column; header freezes on first emit
        from the DataFrame's column order (minus seq)."""
        if not self.started:
            self.freeze_header([c for c in df.columns if c != "seq"])
        self._emits.append(project_emits(df, self.columns))

    def dataframe(self) -> DataFrame:
        if not self._emits:
            raise RuntimeError("nothing emitted")
        out = self._emits[0]
        for e in self._emits[1:]:
            out = out.unionByName(e)
        return out

    def render(self, limit: int | None = None) -> str:
        return csv_bytes(self.dataframe(), self.columns, limit)

    def report(self, limit: int | None = None) -> tuple[int, dict]:
        df = self.dataframe().orderBy("seq")
        if limit is not None:
            df = df.limit(limit)
        return tally_counts(df, self.columns)
