"""Flagship query — the reference's MERGE source pipeline re-expressed
Spark-first over the fixture tables (SURVEY §7.1).

Mirrors embeddings-pipeline.py:294-352 stage by stage:
  scan+join raw docs to their embedding vectors   (S1; docs⨝vectors)
  validity filter on the vector                   (P3, :147)
  derive cleaned_ref / main_refco / display_name  (F1-F5, :198-216)
  latest-row-per-key window dedup                 (W1 QUALIFY, :323)
  inner join to a small dim for the surrogate id  (J1, :325-326 —
      broadcast; the inner join's silent drop of unmatched display
      names is reproduced)
  aggregate report                                (A2-A4 analog)

One Catalyst plan: parquet scans with pushed filters → broadcast hash
join → single shuffle for the window dedup (reused by the final agg via
AQE) → broadcast dim join.  No Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import (
    derive_display_name,
    derive_main_refco,
    display_name_sql,
    main_refco_sql,
    normalize_ref,
    normalize_ref_sql,
)
from ..operators.dedup import latest_per_key
from ..sources.registry import load_table
from .catalog import Query, register

REF_PREFIX_LEN = 30  # cleaned_ref analog: normalized head of the document text


def flagship_merge_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    vecs = load_table(spark, sf_dir, "embeddings")

    # S1 + P3: scan, attach vectors, validity-filter the embedding.
    joined = docs.join(vecs, docs["doc_id"] == vecs["vec_id"], "inner").filter(
        F.col("embedding").isNotNull() & (F.size("embedding") > 0)
    )

    # F1-F5: derive the reference's computed columns.  `color` analog:
    # non-'en' lang (exercises both F2 branches and the F5 "(None)"
    # quirk for the null case).
    derived = joined.select(
        F.col("doc_id"),
        F.col("source"),
        F.col("lang"),
        F.col("n_chars"),
        normalize_ref(F.substring("text", 1, REF_PREFIX_LEN)).alias("cleaned_ref"),
        F.nullif(F.col("lang"), F.lit("en")).alias("color"),
    ).select(
        "*",
        derive_main_refco(F.col("cleaned_ref"), F.col("color")).alias("main_refco"),
        derive_display_name(F.col("source"), F.col("color")).alias("display_name"),
    )

    # J1 as a window: the reference joins to a dim derived from the
    # same staged batch (display_name -> surrogate id, names seen ≥2
    # qualify — unmatched rows silently dropped).  Deriving the dim as
    # a separate aggregate would scan+join the docs⨝vectors base
    # TWICE; a window over display_name computes the count and the
    # surrogate min-id in one pass over one shuffle — same rows, same
    # values, half the I/O.  At 100 TB the saved pass is the dominant
    # cost (the base includes the 128-float embedding decode).
    from pyspark.sql import Window

    w_dim = Window.partitionBy("display_name")
    enriched_all = derived.select(
        "*",
        F.count("*").over(w_dim).alias("__n"),
        F.min("doc_id").over(w_dim).alias("display_name_id"),
    )

    # W1: latest row per merge key (doc_id is the event-time analog;
    # unique, so the pick is deterministic).  The dim filter applies
    # AFTER dedup — the reference dedups the staged batch, then the
    # inner join drops unmatched rows (order is observable when a
    # group's latest row has a non-qualifying display_name).
    enriched = (
        latest_per_key(enriched_all, "main_refco", "doc_id")
        .filter(F.col("__n") >= 2)
        .drop("__n")
    )

    # A2-A4: report per (source, lang).
    return (
        enriched.groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_refs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("display_name_id").alias("min_display_name_id"),
            F.max("doc_id").alias("latest_doc_id"),
        )
        .orderBy("source", "lang")
    )


_NORM = normalize_ref_sql(f"substring(text, 1, {REF_PREFIX_LEN})")
_MAIN_REFCO = main_refco_sql("cleaned_ref", "color")
_DISPLAY = display_name_sql("source", "color")

FLAGSHIP_ORACLE = f"""
WITH joined AS (
    SELECT d.doc_id, d.source, d.lang, d.n_chars, d.text
    FROM documents d
    JOIN embeddings e ON d.doc_id = e.vec_id
    WHERE e.embedding IS NOT NULL AND len(e.embedding) > 0
), derived AS (
    SELECT doc_id, source, lang, n_chars,
           {_NORM} AS cleaned_ref,
           nullif(lang, 'en') AS color
    FROM joined
), derived2 AS (
    SELECT *, {_MAIN_REFCO} AS main_refco, {_DISPLAY} AS display_name
    FROM derived
), deduped AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY main_refco ORDER BY doc_id DESC) AS rn
        FROM derived2
    ) WHERE rn = 1
), dim AS (
    SELECT display_name, min(doc_id) AS display_name_id
    FROM derived2 GROUP BY display_name HAVING count(*) >= 2
)
SELECT d.source, d.lang,
       count(*) AS n_refs,
       CAST(sum(d.n_chars) AS BIGINT) AS sum_chars,
       min(m.display_name_id) AS min_display_name_id,
       max(d.doc_id) AS latest_doc_id
FROM deduped d JOIN dim m ON d.display_name = m.display_name
GROUP BY d.source, d.lang
ORDER BY d.source, d.lang
"""

register(
    Query(
        name="flagship_merge_pipeline",
        build=flagship_merge_pipeline,
        oracle=FLAGSHIP_ORACLE,
        doc="MERGE source pipeline: scan→filter→derive→window dedup→broadcast dim join→agg "
        "(embeddings-pipeline.py:294-352)",
        tags=("flagship", "S1", "P3", "F1", "F2", "F3", "F5", "W1", "J1", "A2"),
        bench=True,
    )
)
