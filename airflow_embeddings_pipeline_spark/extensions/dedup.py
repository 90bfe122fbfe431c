"""Deduplication operators (X1/X2): exact content-hash dedup, word
n-gram shingling, MinHash signatures + LSH banding, n-gram Jaccard,
SimHash.

Spark-first design: everything is built-in higher-order array functions
(`transform`/`aggregate`/`slice`) over md5 — JVM-side, no Python UDFs.
MinHash here is the classic Broder construction with k independent
hash functions simulated as ``md5(seed || shingle)``; LSH banding
turns the O(n²) pair problem into a groupBy on (band, band_hash) —
the only shuffle — so at 100 TB the cost is one wide shuffle of
(doc_id, band_hash) pairs, never a cross join.

DuckDB oracles mirror the same md5 arithmetic, so every step is
hash-checkable (md5 is identical everywhere).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import fingerprint


def exact_dedup_stats(df: DataFrame, text_col: str, group_col: str) -> DataFrame:
    """X1: exact dedup accounting per group — total rows vs distinct
    content hashes (hash-groupBy; one shuffle on the hash)."""
    return (
        df.select(F.col(group_col), fingerprint(text_col).alias("fp"))
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("fp").alias("n_unique"),
        )
        .withColumn("n_duplicates", F.col("n_docs") - F.col("n_unique"))
    )


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles, distinct.  `slice` with a column start
    keeps this a single codegen'd expression."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(c, " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def shingles_sql(text_expr: str, n: int = 3) -> str:
    """DuckDB fragment mirroring ``shingles``."""
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len(string_split({text_expr}, ' ')) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(string_split({text_expr}, ' ')[i:i+{n - 1}], ' ')))"
    )


def minhash_signature(shingle_col: Column, num_hashes: int = 8) -> Column:
    """MinHash signature: for each seed s, min over shingles of
    ``md5(s || shingle)`` — k permutations simulated by seeded md5."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda s: F.array_min(
            F.transform(shingle_col, lambda g: F.md5(F.concat(s.cast("string"), g)))
        ),
    )


def minhash_signature_sql(shingles_expr: str, num_hashes: int = 8) -> str:
    return (
        f"list_transform(range({num_hashes}), s -> "
        f"list_min(list_transform({shingles_expr}, g -> md5(concat(CAST(s AS VARCHAR), g)))))"
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 8,
    rows_per_band: int = 1,
    block_col: str | None = None,
) -> DataFrame:
    """X2: LSH candidate pairs.  signature → explode bands → self-join
    on (band_id, band_hash).  ``block_col`` optionally restricts pairs
    to a blocking key (e.g. same source) — at 100 TB blocking bounds
    both the shuffle width and the bucket sizes."""
    num_bands = num_hashes // rows_per_band
    sig = minhash_signature(shingles(text_col), num_hashes)
    base_cols = [F.col(id_col)] + ([F.col(block_col)] if block_col else [])
    banded = df.select(
        *base_cols,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_bands - 1)),
                lambda b: F.md5(
                    F.concat_ws("|", F.slice(sig, b * rows_per_band + 1, rows_per_band))
                ),
            )
        ).alias("band_id", "band_hash"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    cond = (
        (F.col("l.band_id") == F.col("r.band_id"))
        & (F.col("l.band_hash") == F.col("r.band_hash"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
    )
    if block_col:
        cond = cond & (F.col(f"l.{block_col}") == F.col(f"r.{block_col}"))
    pairs = left.join(right, cond).select(
        *( [F.col(f"l.{block_col}").alias(block_col)] if block_col else [] ),
        F.col(f"l.{id_col}").alias("id_a"),
        F.col(f"r.{id_col}").alias("id_b"),
    )
    return pairs.distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    *,
    n: int = 3,
) -> DataFrame:
    """X2 exact variant: n-gram Jaccard similarity for every pair
    within a block.  O(block²) by construction — the LSH path above is
    the scale route; this is the verifier/oracle for it."""
    sh = df.select(
        F.col(block_col),
        F.col(id_col),
        shingles(text_col, n).alias("sh"),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    return (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{block_col}").alias(block_col),
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(inter / union, 6).alias("jaccard"),
        )
    )


def simhash16(text_col: Column | str) -> Column:
    """X2: 16-bit SimHash over whitespace tokens.  Each token hashes to
    16 bits (md5 head); each bit position takes a ±1 vote; the sign
    vector is the fingerprint.  Pure expression arithmetic (`pow`-based
    bit extraction) so both Spark and the SQL oracle compute it
    identically."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    hvs = F.transform(
        F.split(c, " "),
        lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("long"),
    )
    bit = lambda h, j: (h / F.pow(F.lit(2.0), j)).cast("long") % 2  # noqa: E731
    votes = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda j: F.when(
            F.aggregate(
                hvs, F.lit(0).cast("long"), lambda acc, h: acc + bit(h, j) * 2 - 1
            )
            > 0,
            F.pow(F.lit(2.0), j).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(votes, F.lit(0).cast("long"), lambda acc, v: acc + v)


SIMHASH16_SQL = (
    "list_sum(list_transform(range(16), j -> "
    "CASE WHEN list_sum(list_transform(string_split({text}, ' '), t -> "
    "((CAST(concat('0x', substring(md5(t), 1, 4)) AS BIGINT) "
    "// CAST(pow(2, j) AS BIGINT)) % 2) * 2 - 1)) > 0 "
    "THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END))"
)
