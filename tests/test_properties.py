"""Property-based tests (hypothesis) for the scalar library and core
operators.

Strategy: hypothesis generates a batch of inputs per property, one
Spark job evaluates the whole batch (never one job per example — a
Spark action per hypothesis example would be quadratically slow), and
the property is asserted row-wise against a pure-Python model of the
reference's semantics (embeddings-pipeline.py:63-72,198-216,227).
"""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from airflow_embeddings_pipeline_spark.functions.scalar import (
    derive_display_name,
    derive_main_refco,
    normalize_ref,
    timestamp_to_iso,
    iso_to_timestamp,
)

# printable-ascii-ish text incl. the chars F1 strips
_TEXT = st.text(
    alphabet=string.ascii_letters + string.digits + " .$_-",
    min_size=0,
    max_size=60,
)


def _eval_batch(spark, rows, col_expr, in_type="string"):
    df = spark.createDataFrame([(r,) for r in rows], schema=f"x {in_type}")
    return [r[0] for r in df.select(col_expr.alias("y")).collect()]


@settings(max_examples=20, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=30))
def test_normalize_ref_model(spark, xs):
    """builtin F1 == python model (for ascii inputs: strip .$ → rstrip → lower)"""
    got = _eval_batch(spark, xs, normalize_ref(F.col("x")))
    want = [x.replace(".", "").replace("$", "").rstrip().lower() for x in xs]
    assert got == want


@settings(max_examples=20, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=30))
def test_normalize_ref_idempotent(spark, xs):
    once = _eval_batch(spark, xs, normalize_ref(F.col("x")))
    twice = _eval_batch(spark, once, normalize_ref(F.col("x")))
    assert once == twice


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(_TEXT, st.one_of(st.none(), _TEXT)),
        min_size=1,
        max_size=30,
    )
)
def test_main_refco_model(spark, pairs):
    """F2+F3: conditional concat + truncate matches the reference model."""
    sdf = _spark_pairs(spark, list(pairs))
    got = [
        r[0]
        for r in sdf.select(
            derive_main_refco(F.col("ref"), F.col("color")).alias("y")
        ).collect()
    ]
    # reference order (embeddings-pipeline.py:198-207): conditional
    # concat → mimic_utf8_general_ci on the WHOLE value → truncate
    def _mimic(s: str) -> str:
        return s.replace(".", "").replace("$", "").rstrip().lower()

    want = [
        _mimic(f"{ref}_{color}" if color else ref)[:100] for ref, color in pairs
    ]
    assert got == want


def _spark_pairs(spark, pairs):
    return spark.createDataFrame(
        pairs, schema="ref string, color string"
    )


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(_TEXT, st.one_of(st.none(), _TEXT)),
        min_size=1,
        max_size=30,
    )
)
def test_display_name_none_quirk(spark, pairs):
    """F5: null country renders literally as '(None)' (f-string quirk)."""
    sdf = spark.createDataFrame(pairs, schema="source string, country string")
    got = [
        r[0]
        for r in sdf.select(
            derive_display_name(F.col("source"), F.col("country")).alias("y")
        ).collect()
    ]
    want = [f"{s} ({c})" for s, c in pairs]  # None → "(None)" exactly
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.datetimes(
            min_value=__import__("datetime").datetime(1970, 1, 2),
            max_value=__import__("datetime").datetime(2100, 1, 1),
        ).map(lambda d: d.replace(microsecond=0)),
        min_size=1,
        max_size=30,
    )
)
def test_iso_roundtrip(spark, ts_list):
    """F7∘F8 == identity for whole-second timestamps; ISO strings sort
    like the timestamps they encode (the W1 ordering contract)."""
    sdf = spark.createDataFrame([(t,) for t in ts_list], schema="x timestamp")
    out = sdf.select(
        F.col("x"),
        iso_to_timestamp(timestamp_to_iso(F.col("x"))).alias("rt"),
        timestamp_to_iso(F.col("x")).alias("iso"),
    ).collect()
    for r in out:
        assert r["rt"] == r["x"]
    isos = [r["iso"] for r in out]
    keys = [r["x"] for r in out]
    assert (
        [i for _, i in sorted(zip(keys, isos), key=lambda p: p[0])]
        == sorted(isos)
    )
