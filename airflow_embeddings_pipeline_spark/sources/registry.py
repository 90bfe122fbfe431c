"""Source registry over parquet table directories.

Replaces the reference's hand-built source plumbing (MongoDB paginated
cursor scan at embeddings-pipeline.py:166-177, GCS staged-parquet scan
with filename pattern at :319-322).  Spark-first: a parquet scan IS the
paginated cursor (splits replace LIMIT/SKIP, reference O2), and Catalyst
pushes filters/projections into the scan the way the reference pushes
`$match`/`$project` into Mongo (S1).

At 100 TB the same code path holds: `spark.sql.files.maxPartitionBytes`
controls split sizing, partition-directory layout gives partition
pruning, and `pathGlobFilter` reproduces the stage `pattern=>` file
filter (S5) without listing-then-filtering on the driver.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession

from ..schemas import FIXTURE_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Per-session memo of the LAZY scan DataFrame built by ``load_table``.
# A DataFrame is an immutable logical plan — handing the same plan to
# every caller caches zero rows and zero results; every action still
# reads the parquet.  What it removes is pure driver overhead repeated
# per call: two pyarrow footer probes, a JVM schema-inference read, the
# layout-cache freshness stat, and a second JVM read of the cached copy
# (~100-170 ms per call, measured — a 7-table query paid ~1.0 s of its
# 1.3 s build in here).  Keyed by source mtime_ns so a regenerated
# fixture invalidates, exactly like the layout cache's ``.m<mtime>``
# directory key; keyed weakly by session so a stopped session's plans
# are dropped rather than resurrected for an unrelated new session.
_TABLE_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict[tuple[str, int], DataFrame]]" = (
    weakref.WeakKeyDictionary()
)

# Physical layout management (the engine's OPTIMIZE analog): fixture
# files arrive as ONE parquet row group, and a row group is Spark's
# minimum split unit — so every scan and its partial aggregation run
# as a single task no matter how many cores exist.  Tables above the
# row threshold are re-chunked once into a local layout cache (same
# rows, same types, multiple files) so scans parallelize.  At 100 TB
# this layer is the ingest/compaction policy; locally it is a tiny
# one-time rewrite under /tmp.
#
# Split sizing is CPU-oriented, not byte-oriented: the expensive tables
# here (documents, embeddings) are small in bytes but carry heavy
# per-row compute (per-shingle hashing, 128-wide vector arithmetic), so
# a byte-balanced layout would still serialize the work.  A ~150-row
# floor per partition keeps task overhead negligible while letting any
# non-trivial table fan out to every core — the local analog of sizing
# spark.sql.files.maxPartitionBytes to the per-row cost of the workload.
LAYOUT_CACHE_DIR = os.environ.get("SPARK_GRAFT_LAYOUT_CACHE", "/tmp/spark_graft_layout")
_LAYOUT_MIN_ROWS = 1_000
_ROWS_PER_PARTITION = 160
_LAYOUT_MAX_BYTES = 2_000_000_000  # never duplicate files bigger than this locally
_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark's reader
    rejects outright (PARQUET_TYPE_ILLEGAL).  Footer-only probe, driver
    side, negligible at any scale."""
    import pyarrow.parquet as pq

    try:
        schema = pq.read_schema(path)
    except Exception:
        return []
    return [f.name for f in schema if str(f.type) == "timestamp[ns]"]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one fixture table (reference S1 analog).

    Nanosecond-timestamp columns are read as raw int64 nanos
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncated to
    microsecond timestamps — the same truncation DuckDB applies when it
    loads ns parquet into its µs-native TIMESTAMP, so oracle comparison
    stays exact.
    """
    from pyspark.sql import functions as F

    # Epoch arithmetic over TIMESTAMP_NTZ columns (cast ntz → timestamp
    # → long) is session-timezone-dependent; the DuckDB oracles treat
    # naive timestamps as-if-UTC.  Pin the session tz so queries stay
    # correct under ANY caller's SparkSession (the driver builds its
    # own, without this engine's session factory).  NOTE: this is a
    # deliberate, documented session-wide side effect — every engine
    # query assumes UTC; a caller needing another timezone for its own
    # work must set it around engine calls.  Guarded so an already-UTC
    # session sees no redundant conf write.
    if spark.conf.get("spark.sql.session.timeZone", None) != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        mtime_ns = os.stat(path).st_mtime_ns
    except OSError:
        mtime_ns = -1
    memo = _TABLE_MEMO.setdefault(spark, {})
    key = (os.path.abspath(path), mtime_ns)
    hit = memo.get(key)
    if hit is not None:
        return hit
    ns_cols = _nanos_timestamp_columns(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    out = _with_layout_cache(spark, df, path)
    memo[key] = out
    return out


def _with_layout_cache(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Re-chunk a big single-row-group file once (atomic dir rename),
    then serve the parallel-scannable copy.  Values/types identical —
    only the physical split structure changes."""
    import pyarrow.parquet as pq

    try:
        meta = pq.ParquetFile(path).metadata
    except Exception:
        return df
    if meta.num_rows < _LAYOUT_MIN_ROWS:
        return df
    # Re-chunk when the file's row groups are too COARSE to parallelize,
    # not only when it's a single group: parquet splits at row-group
    # granularity, so a 1.5M-row file with 5 fat row groups caps every
    # downstream map stage at 5 tasks (measured: a 37M-row explode over
    # it ran 5-wide on 32 cores).  Already-fine files and files too big
    # to duplicate locally are served as-is.
    n_target = max(
        2, min(int(_DEFAULT_CPUS), meta.num_rows // _ROWS_PER_PARTITION + 1)
    )
    if meta.num_row_groups >= max(2, n_target // 2):
        return df
    if os.path.getsize(path) > _LAYOUT_MAX_BYTES:
        return df

    # Cache dir KEYED BY SOURCE MTIME: a rewritten source maps to a new
    # directory instead of refreshing the old one in place, so a stale
    # cache is never renamed away underneath a concurrent reader (two
    # processes sharing the cache — e.g. bench + oracle check — can
    # otherwise race between the freshness probe and the scan).  Stale
    # generations are inert; losing the creation race is fine (the
    # winner's copy has identical content — drop ours, serve theirs).
    key = path.strip("/").replace("/", "_")
    cache = os.path.join(
        LAYOUT_CACHE_DIR, f"{key}.m{int(os.path.getmtime(path) * 1000)}"
    )
    marker = os.path.join(cache, "_SUCCESS")
    if not os.path.exists(marker):
        n_parts = max(2, min(int(_DEFAULT_CPUS), meta.num_rows // _ROWS_PER_PARTITION + 1))
        tmp = f"{cache}.tmp.{os.getpid()}"
        df.repartition(n_parts).write.mode("overwrite").parquet(tmp)
        import shutil

        try:
            os.rename(tmp, cache)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
        _gc_stale_generations(key, keep=cache)
    return spark.read.parquet(cache)


def _gc_stale_generations(key: str, *, keep: str) -> None:
    """Best-effort reclaim of older ``<key>.m*`` cache generations once
    a fresh one is committed — regenerated sources would otherwise
    accumulate unbounded copies.  A stale generation can still be
    mid-scan by a concurrent reader of the OLD source file, so losing
    this race only costs that reader a retry (same contract as the
    creation race above); directory entries vanish atomically."""
    import glob
    import shutil

    for d in glob.glob(os.path.join(LAYOUT_CACHE_DIR, f"{key}.m*")):
        if d != keep and not d.startswith(f"{keep}.tmp"):
            shutil.rmtree(d, ignore_errors=True)


def scan_glob(spark: SparkSession, directory: str, pattern: str) -> DataFrame:
    """Staged-parquet scan with a filename pattern (reference S5,
    embeddings-pipeline.py:319-322): Snowflake's
    ``FROM @stage (pattern=>'.*{filename}')`` becomes a pathGlobFilter,
    applied at file-listing time (no data read for excluded files)."""
    return spark.read.option("pathGlobFilter", pattern).parquet(directory)


class TableRegistry:
    """Lazy per-session view registry for the fixture tables.

    ``register_all`` creates temp views so plans can be written in
    either the DataFrame API or ``spark.sql`` — Catalyst produces the
    same optimized plan for both.
    """

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            self._cache[name] = load_table(self.spark, self.sf_dir, name)
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name in FIXTURE_TABLES:
            return self.table(name)
        raise AttributeError(name)


def register_all(spark: SparkSession, sf_dir: str) -> TableRegistry:
    reg = TableRegistry(spark, sf_dir)
    for name in FIXTURE_TABLES:
        reg.table(name).createOrReplaceTempView(name)
    return reg
