"""Grouped-map (``applyInPandas``) and native session-window coverage.

``applyInPandas`` is the remaining Pandas-UDF execution mode after
scalar ``pandas_udf`` (functions/scalar.py), ``mapInPandas``
(extensions/similarity.py, multimodal.py) and
``applyInPandasWithState`` (streaming/stateful.py): one Arrow-batched
Python call per group, for group-shaped math that built-in aggregates
can't express (here: an element-wise vector mean — numpy does the
whole group in one vectorized reduction).

``session_window`` is the built-in gap-based session operator — same
semantics as the hand-rolled lag-gap-cumsum in t_sessionize, but as a
single native streaming-capable aggregation.
"""

from __future__ import annotations

from typing import Iterator  # noqa: F401  (doc parity with sibling modules)

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .catalog import Query, register


# ------------------------------------------------- grouped-map centroid
# Per-label embedding centroid: mean over array<float> columns is not
# expressible as a built-in aggregate (avg() doesn't lift over arrays);
# the scalable formulations are explode+groupBy(dim) — a 128× row blow-
# up — or one vectorized numpy reduction per group via applyInPandas.
def x_group_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf["embedding"].map(np.asarray).values).astype(np.float64)
        c = mat.mean(axis=0)
        # centroid_head serialized to a fixed-format string: the driver's
        # correctness comparator hashes values via pandas and cannot hash
        # list cells; "%.6f"-join matches DuckDB printf exactly.
        head = ",".join(f"{x:.6f}" for x in c[:4])
        return pd.DataFrame(
            {
                "label": [pdf["label"].iloc[0]],
                "n_vectors": [len(pdf)],
                "centroid_head": [head],
                "centroid_norm": [round(float(np.sqrt((c * c).sum())), 6)],
            }
        )

    out_schema = (
        "label int, n_vectors long, centroid_head string, centroid_norm double"
    )
    return (
        emb.select("label", "embedding")
        .groupBy("label")
        .applyInPandas(centroid, schema=out_schema)
        .orderBy("label")
    )


# Oracle: mean per dimension via unnest (the SQL formulation of the
# same math); centroid_norm recomputed from all dims.  Shared by the
# pandas and Arrow grouped-map variants — the point is that both
# execution modes produce bit-identical results.
_CENTROID_ORACLE = """
        WITH dims AS (
            SELECT label, t.i AS dim, CAST(embedding[t.i] AS DOUBLE) AS v
            FROM embeddings,
                 unnest(range(1, len(embedding) + 1)) AS t(i)
        ), means AS (
            SELECT label, dim, avg(v) AS m
            FROM dims GROUP BY label, dim
        ), agg AS (
            SELECT label, list(m ORDER BY dim) AS centroid
            FROM means GROUP BY label
        ), counts AS (
            SELECT label, count(*) AS n_vectors FROM embeddings GROUP BY label
        )
        SELECT a.label, c.n_vectors,
               array_to_string(list_transform(a.centroid[1:4],
                                              x -> printf('%.6f', x)), ',')
                   AS centroid_head,
               round(sqrt(list_sum(list_transform(a.centroid, x -> x * x))), 6)
                   AS centroid_norm
        FROM agg a JOIN counts c ON a.label = c.label
        ORDER BY a.label
        """

register(
    Query(
        name="x_group_centroids",
        build=x_group_centroids,
        oracle=_CENTROID_ORACLE,
        doc="per-label embedding centroid via applyInPandas grouped-map (vectorized numpy mean)",
        tags=("X3", "pandas-udf", "grouped-map"),
    )
)


# ------------------------------------------- grouped-map, Arrow variant
# Same computation through ``applyInArrow`` — the zero-pandas grouped
# map (one pyarrow.Table per group, no Series conversion overhead).
# Bit-identical output to the pandas variant (same float64 math), so it
# shares the oracle: the catalog proves both Arrow execution modes
# agree with SQL.
def x_group_centroids_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    emb = load_table(spark, sf_dir, "embeddings")

    def centroid(tbl: "pa.Table") -> "pa.Table":
        emb_col = tbl.column("embedding").to_pylist()
        mat = np.asarray(emb_col, dtype=np.float64)
        c = mat.mean(axis=0)
        head = ",".join(f"{x:.6f}" for x in c[:4])
        return pa.table(
            {
                "label": pa.array([tbl.column("label")[0].as_py()], pa.int32()),
                "n_vectors": pa.array([tbl.num_rows], pa.int64()),
                "centroid_head": pa.array([head], pa.string()),
                "centroid_norm": pa.array(
                    [round(float(np.sqrt((c * c).sum())), 6)], pa.float64()
                ),
            }
        )

    out_schema = (
        "label int, n_vectors long, centroid_head string, centroid_norm double"
    )
    return (
        emb.select("label", "embedding")
        .groupBy("label")
        .applyInArrow(centroid, schema=out_schema)
        .orderBy("label")
    )


register(
    Query(
        name="x_group_centroids_arrow",
        build=x_group_centroids_arrow,
        oracle=_CENTROID_ORACLE,
        doc="per-label embedding centroid via applyInArrow grouped-map (zero-pandas Arrow path)",
        tags=("X3", "arrow", "grouped-map"),
    )
)


# ---------------------------------------------------- session_window
def t_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "1 hour").alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("session_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
            "session_value",
        )
        .orderBy("user_id", "session_start")
    )


# Oracle: gap-based sessions via lag + cumulative sum; session end =
# last event + gap, so session_start = min(ts) within each gap-group.
register(
    Query(
        name="t_session_window",
        build=t_session_window,
        oracle="""
        WITH gapped AS (
            SELECT user_id, ts, value,
                   CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                          - lag(CAST(floor(epoch(ts)) AS BIGINT))
                            OVER (PARTITION BY user_id ORDER BY ts) > 3600
                        THEN 1 ELSE 0 END AS brk
            FROM events
        ), grouped AS (
            SELECT user_id, ts, value,
                   sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_id
            FROM gapped
        )
        SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS session_value
        FROM grouped GROUP BY user_id, session_id
        ORDER BY user_id, session_start
        """,
        doc="native session_window gap-sessions, oracled against lag-gap-cumsum SQL",
        tags=("T5", "session"),
    )
)


# -------------------------------------------------------------- variant
# Spark 4 VariantType: parse once into the binary variant encoding,
# extract typed fields — the engine-native form of semi-structured
# access (the reference's `$1:field::TYPE`, SURVEY §1.2 'semi-
# structured' row).  Unlike get_json_object (string re-parse per
# access), the variant is parsed once and field access is a binary
# probe — the 100 TB answer for JSON-heavy columns.
def f_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # try_parse_json: malformed rows become NULL instead of failing the
    # job — on a real corpus one bad props value must not kill the scan
    # (rejects route through sources.sink.quarantine_split when needed).
    v = F.try_parse_json("props")
    return (
        ev.select(
            "event_id",
            F.try_variant_get(v, "$.k", "long").alias("k"),
            F.try_variant_get(v, "$.missing", "string").alias("missing_field"),
        )
        .filter(F.col("k") % 10 == 0)
        .orderBy("event_id")
    )


register(
    Query(
        name="f_variant_extract",
        build=f_variant_extract,
        oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               json_extract_string(props, '$.missing') AS missing_field
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 = 0
        ORDER BY event_id
        """,
        doc="VariantType semi-structured access (parse_json + try_variant_get; Spark 4 native)",
        tags=("P6", "variant"),
    )
)
