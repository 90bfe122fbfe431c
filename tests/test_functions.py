"""Scalar function semantics vs the reference's Python behavior
(embeddings-pipeline.py:63-72,198-216,227)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_embeddings_pipeline_spark.functions.scalar import (
    derive_display_name,
    derive_main_refco,
    first_country,
    iso_to_timestamp,
    normalize_ref,
    normalize_ref_udf,
    timestamp_to_iso,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def _vals(spark, data, colfn, schema="s string"):
    df = spark.createDataFrame(data, schema=schema)
    return [r["v"] for r in df.select(colfn(F.col("s")).alias("v")).collect()]


def test_normalize_ref_builtin(spark):
    # reference: unidecode → strip '.' and '$' → rstrip → lower
    got = _vals(
        spark,
        [("Café.Noir$  ",), ("ÀÉÎÕÜ",), ("plain",), (None,)],
        normalize_ref,
    )
    assert got == ["cafenoir", "aeiou", "plain", None]


def test_normalize_ref_udf_matches_builtin_on_latin(spark):
    rows = [("Crème. Brûlée$ ",), ("SEÑOR.",), ("abc",)]
    b = _vals(spark, rows, normalize_ref)
    u = _vals(spark, rows, normalize_ref_udf)
    assert b == u  # NFKD strip == translate map for these Latin chars


def test_derive_main_refco_branches(spark):
    df = spark.createDataFrame(
        [
            ("ref1", "red"),
            ("ref2", None),
            ("ref3", ""),
            ("x" * 150, "blue"),
            ("Ref4", "RED"),
            ("ref5", "Café$"),
        ],
        schema="ref string, color string",
    )
    got = [
        r["v"]
        for r in df.select(
            derive_main_refco(F.col("ref"), F.col("color")).alias("v")
        ).collect()
    ]
    # f"{ref}_{color}" only when color truthy (embeddings-pipeline.py:198-199)
    assert got[0] == "ref1_red"
    assert got[1] == "ref2"
    assert got[2] == "ref3"
    assert got[3] == ("x" * 150 + "_blue")[:100]  # 100-char truncation (:204-207)
    # normalization applies to the CONCATENATED value (:202), so the
    # color part is case/accent-folded too
    assert got[4] == "ref4_red"
    assert got[5] == "ref5_cafe"


def test_display_name_none_quirk(spark):
    df = spark.createDataFrame(
        [("acme", "US"), ("acme", None)], schema="src string, cc string"
    )
    got = [
        r["v"]
        for r in df.select(
            derive_display_name(F.col("src"), F.col("cc")).alias("v")
        ).collect()
    ]
    # null country renders literally as "(None)" (:216 f-string quirk)
    assert got == ["acme (US)", "acme (None)"]


def test_first_country_fallback(spark):
    df = spark.createDataFrame(
        [(["US", "FR"],), ([],), (None,)], schema="s array<string>"
    )
    got = [
        r["v"] for r in df.select(first_country(F.col("s")).alias("v")).collect()
    ]
    assert got == ["US", None, None]


def test_iso_roundtrip(spark):
    df = spark.createDataFrame(
        [("2024-03-05 06:07:08",)], schema="s string"
    ).select(F.col("s").cast("timestamp").alias("ts"))
    iso = df.select(timestamp_to_iso("ts").alias("v")).collect()[0]["v"]
    assert iso == "2024-03-05T06:07:08"
    back = (
        df.select(timestamp_to_iso("ts").alias("i"))
        .select(iso_to_timestamp("i").alias("v"))
        .collect()[0]["v"]
    )
    assert back.isoformat() == "2024-03-05T06:07:08"


def test_iso_z_suffix(spark):
    # state files may carry 'Z' timestamps (embeddings-pipeline.py:123)
    df = spark.createDataFrame([("2024-01-01T00:00:05Z",)], schema="s string")
    got = df.select(iso_to_timestamp(F.col("s")).alias("v")).collect()[0]["v"]
    assert got is not None and got.second == 5


def test_single_group_is_one_partition_for_any_numeric(spark):
    """single_group must map EVERY row — double fractions, negatives,
    NULLs — to the same partition key, so a global rank window ranks
    across all rows (the double%1-is-fractional-part regression)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from airflow_embeddings_pipeline_spark.functions.ranking import single_group

    df = spark.createDataFrame(
        [(1, 0.25), (2, -3.75), (3, None), (4, 1e9 + 0.5)],
        "id long, score double",
    )
    w = Window.partitionBy(single_group("score")).orderBy(
        F.col("score").desc_nulls_last(), "id"
    )
    ranks = {
        r["id"]: r["rank"]
        for r in df.withColumn("rank", F.row_number().over(w)).collect()
    }
    assert ranks == {4: 1, 1: 2, 2: 3, 3: 4}
