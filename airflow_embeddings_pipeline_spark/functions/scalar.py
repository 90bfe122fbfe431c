"""Scalar expression library — SURVEY §2.7 (F1–F12).

The reference's entire per-document Python transform loop
(embeddings-pipeline.py:182-235) decomposes into these expressions.
All but one are pure built-in ``pyspark.sql.functions`` compositions —
JVM-side, inside WholeStageCodegen, no Python in the hot path.  The one
genuine UDF (F1's unicode transliteration, embeddings-pipeline.py:63-72)
ships in two variants:

* ``normalize_ref``      — builtin-only: ``translate`` over an explicit
  accent-fold map + the same ``.``/``$`` strip + rstrip + lower.
  Deterministic and expressible in ANSI SQL → oracle-checkable.
* ``normalize_ref_udf``  — Arrow-vectorized pandas_udf using NFKD
  decomposition + combining-mark strip (stdlib ``unicodedata``), the
  closest public equivalent of the reference's ``unidecode`` call for
  Latin scripts.  Full Unicode coverage, not SQL-expressible.

Every function that has an oracle also exposes a ``*_sql`` builder
producing the equivalent DuckDB SQL fragment, so the Spark plan and the
oracle can never drift apart.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Accent-fold map for the builtin F1 variant: one-to-one char translation
# (Spark `translate` and DuckDB `translate` have identical semantics).
ACCENT_FOLD_SRC = "áàâäãåāéèêëēíìîïīóòôöõøōúùûüūýÿñçćčšžÁÀÂÄÃÅĀÉÈÊËĒÍÌÎÏĪÓÒÔÖÕØŌÚÙÛÜŪÝÑÇĆČŠŽ"
ACCENT_FOLD_DST = "aaaaaaaeeeeeiiiiiooooooouuuuuyyncccszAAAAAAAEEEEEIIIIIOOOOOOOUUUUUYNCCCSZ"
assert len(ACCENT_FOLD_SRC) == len(ACCENT_FOLD_DST)


def normalize_ref(col: Column | str) -> Column:
    """F1 ``mimic_utf8_general_ci`` (embeddings-pipeline.py:63-72),
    builtin variant: accent-fold → drop ``.`` and ``$`` → rstrip → lower.

    The reference applies unidecode → remove '.' → remove '$' →
    rstrip() → lower(); `translate` with the fold map approximates the
    transliteration step for Latin-1/Latin-2 accents, and the
    ``.``/``$`` removal rides the same translate call (empty dst).
    """
    c = F.col(col) if isinstance(col, str) else col
    folded = F.translate(c.cast("string"), ACCENT_FOLD_SRC + ".$", ACCENT_FOLD_DST)
    return F.lower(F.rtrim(folded))


def normalize_ref_sql(expr: str) -> str:
    """DuckDB SQL fragment computing exactly ``normalize_ref``."""
    src = (ACCENT_FOLD_SRC + ".$").replace("'", "''")
    dst = ACCENT_FOLD_DST.replace("'", "''")
    return f"lower(rtrim(translate(CAST({expr} AS VARCHAR), '{src}', '{dst}')))"


def normalize_ref_udf(col: Column | str) -> Column:
    """F1 exact-shape variant: Arrow-batched pandas_udf (never
    row-at-a-time Python).  Use only when full Unicode coverage matters;
    the builtin variant is the hot-path default.

    The UDF body is nested so cloudpickle ships it by value — executor
    Python workers need no access to this package on their sys.path
    (they only import stdlib ``unicodedata``).
    """

    def _fold_series(s: pd.Series) -> pd.Series:
        import unicodedata as _ud

        def fold(x):
            if x is None:
                return None
            # NFKD-decompose and drop combining marks — public-stdlib
            # analog of the reference's unidecode call (Latin scripts).
            decomposed = _ud.normalize("NFKD", str(x))
            ascii_ish = "".join(ch for ch in decomposed if not _ud.combining(ch))
            return ascii_ish.replace(".", "").replace("$", "").rstrip().lower()

        return s.map(fold)

    udf = F.pandas_udf(_fold_series, T.StringType())
    c = F.col(col) if isinstance(col, str) else col
    return udf(c.cast("string"))


def derive_main_refco(cleaned_ref: Column, color: Column, max_length: int = 100) -> Column:
    """F2+F3 (embeddings-pipeline.py:198-207): ``{ref}_{color}`` when a
    non-empty color exists, else bare ref; the CONCATENATED value is
    then normalized (mimic_utf8_general_ci at :202, i.e. the color part
    is case/accent-folded too) and finally truncated to ``max_length``
    (config default 100, CONFIGURATION.md:52) — same operation order as
    the reference."""
    joined = F.when(
        F.length(F.coalesce(color, F.lit(""))) > 0,
        F.concat_ws("_", cleaned_ref, color),
    ).otherwise(cleaned_ref)
    return F.substring(normalize_ref(joined), 1, max_length)


def main_refco_sql(ref_expr: str, color_expr: str, max_length: int = 100) -> str:
    """DuckDB fragment matching ``derive_main_refco``."""
    case = (
        f"CASE WHEN length(coalesce({color_expr}, '')) > 0 "
        f"THEN concat({ref_expr}, '_', {color_expr}) ELSE {ref_expr} END"
    )
    return f"substring({normalize_ref_sql(case)}, 1, {max_length})"


def truncate_ref(col: Column | str, max_length: int = 100) -> Column:
    """F3 standalone (embeddings-pipeline.py:204-207)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, max_length)


def first_country(country: Column) -> Column:
    """F4 (embeddings-pipeline.py:210-214): first element of the
    (normalized-to-array) country field, NULL when empty/absent."""
    return F.when(F.size(country) > 0, F.element_at(country, 1)).otherwise(
        F.lit(None).cast("string")
    )


def derive_display_name(source: Column, country_code: Column) -> Column:
    """F5 (embeddings-pipeline.py:216): ``f"{source} ({country_code})"``.
    A null country renders literally as ``"(None)"`` — a quirk of Python
    f-strings the oracle parity must reproduce."""
    return F.format_string("%s (%s)", source, F.coalesce(country_code, F.lit("None")))


def display_name_sql(source_expr: str, country_expr: str) -> str:
    return f"concat({source_expr}, ' (', coalesce({country_expr}, 'None'), ')')"


def timestamp_to_iso(col: Column | str) -> Column:
    """F7 (embeddings-pipeline.py:227): ``datetime.isoformat()``.
    Fixture timestamps are whole-second, so the second-granular ISO form
    matches; ISO strings sort lexicographically as timestamps, which the
    merge dedup (W1) relies on."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss")


def timestamp_to_iso_sql(expr: str) -> str:
    return f"strftime({expr}, '%Y-%m-%dT%H:%M:%S')"


def iso_to_timestamp(col: Column | str) -> Column:
    """F8 (embeddings-pipeline.py:122-123): ``fromisoformat`` with the
    ``Z`` → ``+00:00`` shim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_timestamp(F.regexp_replace(c, "Z$", "+00:00"))
