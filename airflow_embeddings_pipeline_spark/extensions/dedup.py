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


# Universal-hash MinHash (Broder): one content hash per shingle, then
# k affine permutations h_s(x) = (a_s·x + b_s) mod p over a Mersenne
# prime.  One md5 per shingle instead of k — the content hash is the
# expensive part (md5 in an interpreted higher-order fn), the affine
# family is integer arithmetic inside codegen.
_MERSENNE_P = (1 << 31) - 1
# deterministic odd multipliers/offsets per seed (public LCG constants)
_A = lambda s: (2 * s + 1) * 2654435761 % _MERSENNE_P  # noqa: E731
_B = lambda s: (s * 40503 + 12345) % _MERSENNE_P  # noqa: E731


def hashed_shingles(shingle_col: Column, *, fast: bool = False) -> Column:
    """Content-hash each shingle once (first 15 md5 hex digits → int,
    mod p).  ``fast=True`` uses native ``xxhash64`` — the corpus-scale
    path; md5 is the default because DuckDB reproduces it exactly
    (oracle parity).

    Materialize this as a COLUMN before ``minhash_from_hashes``:
    Catalyst does not CSE inside higher-order-function lambdas, so the
    k per-permutation mins would otherwise re-hash every shingle k
    times (CollapseProject keeps a projection whose alias is referenced
    more than once, which is what makes the two-step split work)."""
    if fast:
        return F.transform(
            shingle_col, lambda g: F.pmod(F.xxhash64(g), F.lit(_MERSENNE_P))
        )
    return F.transform(
        shingle_col,
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")
        % _MERSENNE_P,
    )


def minhash_from_hashes(hashed: Column, num_hashes: int = 8) -> Column:
    """MinHash signature as ``array<long>`` from a (materialized)
    shingle-hash column: min of each affine permutation — integer
    arithmetic only, the cheap half of the Broder construction."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda s: F.array_min(
            F.transform(
                hashed,
                lambda h: (
                    (_A_col(s) * h + _B_col(s)) % _MERSENNE_P
                ),
            )
        ),
    )


def minhash_signature(
    shingle_col: Column, num_hashes: int = 8, fast: bool = False
) -> Column:
    """One-expression MinHash (hash + permute).  Prefer the two-step
    ``hashed_shingles`` → ``minhash_from_hashes`` split across two
    projections in hot paths — inside a single expression the shingle
    hashing is re-evaluated once per permutation (no CSE in HOFs)."""
    return minhash_from_hashes(
        hashed_shingles(shingle_col, fast=fast), num_hashes
    )


def _A_col(s: Column) -> Column:
    return ((2 * s + 1) * F.lit(2654435761)) % _MERSENNE_P


def _B_col(s: Column) -> Column:
    return (s * 40503 + 12345) % _MERSENNE_P


def minhash_signature_sql(shingles_expr: str, num_hashes: int = 8) -> str:
    p = _MERSENNE_P
    return (
        f"list_transform(range({num_hashes}), s -> "
        f"list_min(list_transform({shingles_expr}, g -> "
        f"((((2*s + 1) * 2654435761) % {p}) * "
        f"(CAST(concat('0x', substring(md5(g), 1, 15)) AS BIGINT) % {p}) "
        f"+ ((s * 40503 + 12345) % {p})) % {p})))"
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 8,
    rows_per_band: int = 1,
    block_col: str | None = None,
    max_bucket_size: int | None = None,
    fast: bool = False,
) -> DataFrame:
    """X2: LSH candidate pairs.  signature → explode bands → self-join
    on (band_id, band_hash).  ``block_col`` optionally restricts pairs
    to a blocking key (e.g. same source) — at 100 TB blocking bounds
    both the shuffle width and the bucket sizes."""
    num_bands = num_hashes // rows_per_band
    base_cols = [F.col(id_col)] + ([F.col(block_col)] if block_col else [])

    # Stage 1 (one pass, no recompute): shingle hashes materialized,
    # then the signature from them, then band hashes from the
    # signature.  A plain aliased projection is NOT enough here:
    # CollapseProject inlines a single-referenced alias into its
    # consumer, and inside the banding generator / HOF lambdas the
    # inlined subtree re-evaluates PER ELEMENT (no CSE in lambdas) —
    # measured 64× md5 blow-up (≈40 s instead of ≈3 s at sf0.1).  The
    # ``explode(array(expr))`` wrapper makes the value a *generator
    # output*, an attribute no optimizer rule can inline, at zero cost:
    # no shuffle, one row-local Generate node per stage.
    with_hashes = df.select(
        *base_cols,
        F.explode(
            F.array(hashed_shingles(shingles(text_col), fast=fast))
        ).alias("__hs"),
    )
    with_sig = with_hashes.select(
        *base_cols,
        F.explode(F.array(minhash_from_hashes(F.col("__hs"), num_hashes))).alias(
            "__sig"
        ),
    )
    banded = with_sig.select(
        *base_cols,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_bands - 1)),
                lambda b: F.md5(
                    F.concat_ws(
                        "|",
                        F.transform(
                            F.slice("__sig", b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band_id", "band_hash"),
    )

    # Stage 2: bucket by (band, hash) — the ONLY shuffle — and emit
    # pairs from each bucket's sorted id array.  No self-join: at scale
    # a self-join would compute the signature subtree twice and shuffle
    # the corpus twice; bucketing shuffles (id, band_hash) pairs once.
    group_keys = ([block_col] if block_col else []) + ["band_id", "band_hash"]
    if max_bucket_size is not None:
        # Degenerate buckets (≫ expected collision size) are exact-
        # duplicate clusters — the cheap exact-dedup pass owns those —
        # or band pile-ups; emitting their O(n²) pairs would dominate
        # the job for no recall gain.  Filter on a pre-aggregated COUNT
        # first so an oversized bucket is dropped before collect_set
        # materializes its whole membership on one executor (a hot band
        # hash at corpus scale can hold millions of ids).  Both sides
        # of the semi-join hash-partition on the same keys, so AQE
        # reuses the exchange rather than shuffling twice.
        banded = _cap_buckets(banded, group_keys, max_bucket_size)
    buckets = (
        banded.groupBy(*group_keys)
        .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_bucket_size is not None:
        # precise re-check: the prefilter counts rows, this counts ids
        buckets = buckets.filter(F.size("ids") <= max_bucket_size)
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    pairs = buckets.select(
        *([F.col(block_col)] if block_col else []),
        F.explode(pair_structs).alias("p"),
    ).select(
        *([block_col] if block_col else []),
        F.col("p.id_a").alias("id_a"),
        F.col("p.id_b").alias("id_b"),
    )
    return pairs.distinct()


def _cap_buckets(banded: DataFrame, group_keys: list[str], cap: int) -> DataFrame:
    """Keep only rows whose bucket has 2..cap members, via a count
    pre-aggregation + semi-join — never materializing oversize buckets."""
    keep = (
        banded.groupBy(*group_keys)
        .agg(F.count("*").alias("__n"))
        .filter((F.col("__n") > 1) & (F.col("__n") <= cap))
        .drop("__n")
    )
    return banded.join(keep, group_keys, "left_semi")


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


def token_hashes(text_col: Column | str, *, fast: bool = False) -> Column:
    """Per-token long hashes feeding ``simhash_from_hashes``: md5-head
    (15 hex digits = 60 bits, DuckDB-reproducible → oracle tier) or
    native ``xxhash64`` (full 64 bits, the corpus-scale tier).

    Materialize this as a COLUMN before computing the fingerprint —
    Catalyst does not CSE inside higher-order-function lambdas, so
    referencing the hash expression from ``width`` per-bit votes would
    re-hash every token ``width`` times."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(c, " ")
    if fast:
        return F.transform(toks, lambda t: F.xxhash64(t))
    return F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    )


def token_hash_scalar(tok_col: Column | str, *, fast: bool = False) -> Column:
    """Per-row token hash — the post-explode mirror of ``token_hashes``
    (identical values for identical tokens, so the agg-tier fingerprint
    is bit-identical whichever shape feeds it).  Applied to an exploded
    token column this is a plain codegen'd projection; the array form
    pays an interpreted lambda per token."""
    c = F.col(tok_col) if isinstance(tok_col, str) else tok_col
    if fast:
        return F.xxhash64(c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def simhash_from_hashes(hashes: Column, width: int = 60) -> Column:
    """Wide SimHash fingerprint from a materialized token-hash column.

    One ±1 vote per bit position over all token hashes; literal shift
    amounts keep every vote a codegen'd integer expression (no Python,
    no variable-shift workaround).  ``width=60`` pairs with the md5
    tier, ``width=64`` with xxhash64 (bit 63 maps to the sign bit of
    the long, i.e. two's complement — hamming/xor still work)."""
    def _vote_fn(j: int):
        # closure factory, not a default arg: pyspark derives the SQL
        # lambda's arity from the Python signature, so `lambda acc, h,
        # j=j:` would be mistaken for a 3-argument lambda.
        return lambda acc, h: (
            acc + F.shiftrightunsigned(h, j).bitwiseAND(F.lit(1).cast("long")) * 2 - 1
        )

    terms = []
    for j in range(width):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), _vote_fn(j))
        bit = (
            F.lit(-(1 << 63)).cast("long")
            if j == 63
            else F.lit(1 << j).cast("long")
        )
        terms.append(F.when(vote > 0, bit).otherwise(F.lit(0).cast("long")))
    fp = terms[0]
    for t in terms[1:]:
        fp = fp + t
    return fp


def simhash_wide_agg(
    df: DataFrame,
    keys: list[str],
    hashes_col: str,
    *,
    width: int = 64,
    pre_exploded: bool = False,
) -> DataFrame:
    """Aggregation-tier wide SimHash: explode token hashes, one
    ``groupBy(keys)`` with ``width`` codegen'd bit-count SUMs, then
    assemble the fingerprint from the vote columns.

    With ``pre_exploded=True``, ``hashes_col`` is a scalar LONG column
    (one token hash per row, e.g. ``explode(split(...))`` followed by a
    codegen'd md5/xxhash projection) instead of an array.  Prefer that
    shape: building the hash array inside ``F.transform`` evaluates the
    per-token hash in an interpreted lambda, while hash-after-explode
    stays in whole-stage codegen end to end.

    Semantically identical to ``simhash_from_hashes`` (same votes, same
    tie rule — a zero/negative vote clears the bit) but executes as a
    vectorized hash aggregate with map-side partial aggregation instead
    of ``width`` interpreted higher-order-function passes per row —
    ~8× faster at corpus scale, and the (key, token-hash) shuffle is
    the plan you want at 100 TB.  Documents whose token array is empty
    produce no row (nothing to vote); the HOF tier gives them
    fingerprint 0.
    """
    if pre_exploded:
        tok = df.select(*keys, F.col(hashes_col).alias("__h"))
    else:
        tok = df.select(*keys, F.explode(hashes_col).alias("__h"))
    # expressions generated as SQL text (one py4j call per column /
    # one for the whole fingerprint): the per-column column-API builds
    # cost ~1.4 s of driver time per plan at width=60 — same trick as
    # hyperplane_signature, byte-identical plan
    #
    # r12 SWAR lane packing (guide §2.3: narrower aggregation state):
    # instead of one SUM per bit position (60-64 agg buffers, 8 bytes
    # of partial-agg shuffle per bit per group), each SUM packs THREE
    # bit-counters spaced ``lanes`` bits apart: summing
    # ``(h >> g) & (1 | 1<<lanes | 1<<2*lanes)`` accumulates the exact
    # per-position counts of bits g, g+lanes, g+2*lanes in disjoint
    # bit fields of one bigint.  Counts are exact (no carries cross a
    # field) while every group stays under ``cap`` tokens; a group at
    # or over the cap raises loudly instead of corrupting votes —
    # cap = 2^min(lanes, 63-2*lanes) ≥ 2^19 ≈ 524k tokens per key,
    # far above any real document.  Votes, tie rule and fingerprint
    # are bit-identical to the per-bit form (unit-tested).
    lanes = (width + 2) // 3
    cap = 1 << min(lanes, 63 - 2 * lanes)
    sums = []
    for g in range(lanes):
        mask = 0
        for t in range(3):
            if g + lanes * t < width:
                mask |= 1 << (lanes * t)
        sums.append(
            F.expr(
                f"sum(shiftrightunsigned(__h, {g}) & CAST({mask} AS BIGINT))"
            ).alias(f"__s{g}")
        )
    agg = tok.groupBy(*keys).agg(F.count("*").alias("__n"), *sums)
    field_mask = (1 << lanes) - 1
    terms = []
    for j in range(width):
        g, t = j % lanes, j // lanes
        cnt = (
            f"(shiftrightunsigned(__s{g}, {lanes * t})"
            f" & CAST({field_mask} AS BIGINT))"
        )
        # vote = 2*popcount - n; set the bit when vote > 0
        bit = (
            "(CAST(-9223372036854775807 AS BIGINT) - CAST(1 AS BIGINT))"
            if j == 63
            else f"CAST({1 << j} AS BIGINT)"
        )
        terms.append(
            f"(CASE WHEN {cnt} * 2 > __n THEN {bit} "
            "ELSE CAST(0 AS BIGINT) END)"
        )
    guard = (
        f"IF(__n >= {cap}, CAST(raise_error('simhash_wide_agg: group "
        f"exceeds {cap} tokens (packed-counter capacity at width "
        f"{width})') AS BIGINT), CAST(0 AS BIGINT))"
    )
    return agg.select(
        *keys, F.expr(guard + " + " + " + ".join(terms)).alias("sim")
    )


def simhash_wide_sql(text_expr: str, width: int = 60) -> str:
    """DuckDB mirror of ``token_hashes`` (md5 tier) + ``simhash_from_hashes``.
    ``pow(2, j)`` is exact for powers of two well past 2^59."""
    return (
        f"list_sum(list_transform(range({width}), j -> "
        f"CASE WHEN list_sum(list_transform(string_split({text_expr}, ' '), t -> "
        f"((CAST(concat('0x', substring(md5(t), 1, 15)) AS BIGINT) "
        f"// CAST(pow(2, j) AS BIGINT)) % 2) * 2 - 1)) > 0 "
        f"THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END))"
    )


SIMHASH16_SQL = (
    "list_sum(list_transform(range(16), j -> "
    "CASE WHEN list_sum(list_transform(string_split({text}, ' '), t -> "
    "((CAST(concat('0x', substring(md5(t), 1, 4)) AS BIGINT) "
    "// CAST(pow(2, j) AS BIGINT)) % 2) * 2 - 1)) > 0 "
    "THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END))"
)


def simhash_bands(sim: Column, num_bands: int, band_bits: int) -> Column:
    """Split a fingerprint into ``num_bands`` contiguous bit bands.
    Literal shifts + unsigned semantics so the top band of a 64-bit
    (sign-bit-carrying) fingerprint buckets correctly."""
    mask = (1 << band_bits) - 1
    return F.array(
        *[
            F.shiftrightunsigned(sim, b * band_bits)
            .bitwiseAND(F.lit(mask).cast("long"))
            for b in range(num_bands)
        ]
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    simhash_col: str,
    *,
    max_hamming: int = 3,
    block_col: str | None = None,
    num_bands: int = 4,
    band_bits: int = 4,
    max_bucket_size: int | None = None,
    pair_mode: str = "arrays",
) -> DataFrame:
    """X2: near-duplicate pairs by SimHash hamming distance.

    Exact for ``max_hamming < num_bands``: by pigeonhole, ≤k differing
    bits can touch at most k of the bands, so every qualifying pair
    shares at least one identical band — bucket-join on (band, value)
    and precision-filter with the true hamming distance
    (``bit_count(xor)``).  Same single-shuffle bucket shape as
    ``lsh_candidate_pairs``: no self-join over the corpus, only over
    bucket id-lists.

    Defaults (4 bands × 4 bits) pair with ``simhash16`` — the oracle
    tier.  The corpus-scale configuration is a wide fingerprint with
    16-bit bands (e.g. ``simhash_from_hashes`` width 60/64, 4×15 or
    4×16): 2^15+ distinct values per band keeps bucket sizes ~n/65536
    per block instead of ~n/16, which is what stops pair emission from
    degenerating to O(n²/16) on a large single-source corpus.

    ``pair_mode`` picks the emission strategy.  ``"arrays"`` (default)
    collects each bucket's members into a sorted array and expands
    pairs with nested ``transform`` — one shuffle, ideal when buckets
    are plentiful and small (high-entropy bands).  ``"join"`` self-joins
    the banded table on the bucket key: the k² expansion runs inside a
    codegen'd equi-join that streams and spills instead of
    materializing a bucket as one array on one executor — the right
    tier when bands are coarse (few buckets × many members, e.g. the
    4×4-bit sign-LSH config) or when ``max_bucket_size`` must stay
    large.  Both modes emit identical (id_a, id_b, hamming) sets.
    """
    base = [F.col(id_col), F.col(simhash_col)] + (
        [F.col(block_col)] if block_col else []
    )
    banded = df.select(
        *base,
        F.posexplode(simhash_bands(F.col(simhash_col), num_bands, band_bits)).alias(
            "band_id", "band_val"
        ),
    )
    group_keys = ([block_col] if block_col else []) + ["band_id", "band_val"]
    if max_bucket_size is not None:
        banded = _cap_buckets(banded, group_keys, max_bucket_size)
    if pair_mode == "join":
        a = banded.select(
            *group_keys,
            F.col(id_col).alias("id_a"),
            F.col(simhash_col).alias("__sim_a"),
        )
        b = banded.select(
            *group_keys,
            F.col(id_col).alias("id_b"),
            F.col(simhash_col).alias("__sim_b"),
        )
        return (
            a.join(b, group_keys)
            .filter(F.col("id_a") < F.col("id_b"))
            .select(
                *([block_col] if block_col else []),
                "id_a",
                "id_b",
                F.bit_count(F.col("__sim_a").bitwiseXOR(F.col("__sim_b"))).alias(
                    "hamming"
                ),
            )
            .filter(F.col("hamming") <= max_hamming)
            .distinct()
        )
    buckets = (
        banded.groupBy(*group_keys)
        .agg(
            F.sort_array(
                F.collect_set(F.struct(F.col(id_col).alias("id"), F.col(simhash_col).alias("sim")))
            ).alias("members")
        )
        .filter(F.size("members") > 1)
    )
    if max_bucket_size is not None:
        buckets = buckets.filter(F.size("members") <= max_bucket_size)
    pair_structs = F.flatten(
        F.transform(
            F.col("members"),
            lambda x, i: F.transform(
                F.slice(F.col("members"), i + 2, F.size(F.col("members"))),
                lambda y: F.struct(
                    x["id"].alias("id_a"),
                    y["id"].alias("id_b"),
                    F.bit_count(x["sim"].bitwiseXOR(y["sim"])).alias("hamming"),
                ),
            ),
        )
    )
    pairs = (
        buckets.select(
            *([F.col(block_col)] if block_col else []),
            F.explode(pair_structs).alias("p"),
        )
        .select(
            *([block_col] if block_col else []),
            F.col("p.id_a").alias("id_a"),
            F.col("p.id_b").alias("id_b"),
            F.col("p.hamming").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs.distinct()


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    *,
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Cluster near-duplicate PAIRS into components — the step that
    turns a pair list into a dedup decision (keep one doc per cluster).

    Min-label propagation over the undirected edge list: every node
    starts labeled with itself; each round takes the min of its own and
    its neighbors' labels; at convergence label(v) = min id of v's
    component.  Each round is one shuffle on the node id (edges join
    labels + groupBy min), the iterate-until-fixed-point loop runs on
    the driver with a cheap scalar convergence probe (sum of labels —
    strictly decreasing until fixed).  Rounds needed = graph diameter:
    near-dup clusters are near-cliques, so 2-3 in practice.  At larger
    diameters the alternating large-star/small-star optimization halves
    rounds, not needed at this diameter.

    Returns (node, cluster) — one row per node that appears in a pair.

    Node ids must be integral: the convergence probe sums labels, which
    on a string column silently nulls out (None == None would declare
    convergence after one round and return WRONG clusters), so
    non-integral ids are rejected loudly — hash string ids to longs
    (``xxhash64``) or assign surrogate ids first.  Sum overflow on huge
    id spaces fails loudly too (ANSI mode), never silently.

    ``checkpoint_dir``: when set, round snapshots go to RELIABLE
    checkpoints on that (shared) path via ``sc.setCheckpointDir`` +
    ``.checkpoint()`` — the fault-tolerant mode for long 100 TB jobs
    where losing an executor mid-loop must not fail the run.  Default
    (None) uses ``localCheckpoint`` (executor block store): faster,
    restart-safe, not executor-loss-tolerant.
    """
    integral = {"tinyint", "smallint", "int", "bigint"}
    dtypes = dict(pairs.dtypes)
    for c in (id_a, id_b):
        if dtypes.get(c) not in integral:
            raise TypeError(
                f"connected_components needs integral node ids; column "
                f"{c!r} is {dtypes.get(c)!r} — hash/assign long ids first"
            )
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    # Checkpoint (not persist): each round's plan builds on the
    # previous round's, so without truncating the LINEAGE the logical
    # plan doubles per iteration and Catalyst chokes on a gigabyte-size
    # plan string by round ~15.  Checkpointing makes every round start
    # from a materialized leaf — the standard shape for iterative
    # DataFrame algorithms.  Mode per `checkpoint_dir` (docstring):
    # reliable .checkpoint() to the shared store, or localCheckpoint
    # on executor block storage.
    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

        def _snap(df: DataFrame, *, eager: bool) -> DataFrame:
            return df.checkpoint(eager=eager)

    else:

        def _snap(df: DataFrame, *, eager: bool) -> DataFrame:
            return df.localCheckpoint(eager=eager)

    edges = _snap(
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct(),
        eager=True,
    )
    labels = _snap(
        edges.select("src").distinct()
        .select(F.col("src").alias("node"), F.col("src").alias("cluster")),
        eager=True,
    )
    prev_sum = labels.agg(F.sum("cluster")).collect()[0][0]
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("cluster").alias("nbr_cluster"))
        )
        stepped = labels.join(
            nbr_min, labels["node"] == nbr_min["src"], "left"
        ).select(
            "node",
            F.least(
                F.col("cluster"),
                F.coalesce("nbr_cluster", F.col("cluster")),
            ).alias("cluster"),
        )
        # pointer jumping: follow the label one hop (label(label(v))) —
        # path compression turns O(diameter) rounds into O(log d).
        # Every label is itself a node id, so the self-join resolves.
        x, y = stepped.alias("x"), stepped.alias("y")
        labels = _snap(
            x.join(y, F.col("x.cluster") == F.col("y.node"), "left")
            .select(
                F.col("x.node").alias("node"),
                F.least(
                    F.col("x.cluster"),
                    F.coalesce(F.col("y.cluster"), F.col("x.cluster")),
                ).alias("cluster"),
            ),
            # lazy checkpoint: the convergence probe below is the one
            # action per round — it materializes the checkpoint AND
            # reads the sum, instead of paying two jobs per round
            eager=False,
        )
        new_sum = labels.agg(F.sum("cluster")).collect()[0][0]
        if new_sum == prev_sum:  # fixed point: no label moved
            return labels
        prev_sum = new_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def contracted_simhash_clusters(
    fps: DataFrame,
    id_col: str = "doc_id",
    simhash_col: str = "sim",
    *,
    max_hamming: int = 3,
    num_bands: int = 4,
    band_bits: int = 16,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Fingerprint-contracted near-dup clustering — the 100 TB form of
    the pair→component decision path.

    A duplicated corpus produces near-cliques of identical fingerprints:
    running banded pairing on the raw corpus emits O(m²) edges per
    duplicate group for zero information (hamming 0 ⇒ same cluster by
    definition).  Contract FIRST: one groupBy collapses each distinct
    fingerprint to its min-id representative, the banded join and the
    component loop run over DISTINCT fingerprints only, and a final
    fingerprint-equi-join broadcasts the representative's cluster back
    to every member.  The quadratic stage is now bounded by fingerprint
    entropy, not corpus size — on the ×100 stress corpus (500k docs,
    35k distinct) the edge list shrinks ~100× and the full decision
    path (fingerprints included) drops from ~230 s to ~38 s, with
    identical clusters (every contracted member is hamming-0 to its
    representative, and band values are a function of the fingerprint
    alone).

    With ``max_bucket_size``, the cap applies to REPRESENTATIVE buckets
    — strictly better recall than capping raw-corpus buckets, where a
    single large duplicate group could evict a whole bucket.

    Returns (id, cluster): one row per input id; cluster is the min id
    of its component (singleton fingerprints keep their representative's
    id, so un-paired docs cluster with their exact duplicates).
    """
    # Materialize the fingerprint table once (eager localCheckpoint):
    # it is consumed by the reps group-by AND the member-inherit join,
    # and when ``fps`` is a lazy projection of an expensive fingerprint
    # expression the member join's pushed-down isnotnull re-derives the
    # whole expression — four corpus fingerprint passes for one call
    # (guide §8: persist the small (id, fingerprint) proxy, decide on
    # it, touch payloads never).  ``reps`` is checkpointed too: it is
    # entropy-bounded (one row per DISTINCT fingerprint) and otherwise
    # re-runs its group-by shuffle for each of its two consumers.
    fps = fps.select(
        F.col(id_col), F.col(simhash_col)
    ).localCheckpoint(eager=True)
    reps = (
        fps.groupBy(simhash_col)
        .agg(F.min(id_col).alias("__rep"))
        .localCheckpoint(eager=True)
    )
    rep_pairs = simhash_near_dup_pairs(
        reps,
        id_col="__rep",
        simhash_col=simhash_col,
        max_hamming=max_hamming,
        num_bands=num_bands,
        band_bits=band_bits,
        max_bucket_size=max_bucket_size,
    ).select("id_a", "id_b")
    rep_clusters = connected_components(rep_pairs)
    # members inherit their representative's component; representatives
    # whose fingerprint paired with nothing keep themselves as cluster.
    return (
        fps.select(F.col(id_col).alias("id"), F.col(simhash_col).alias("__s"))
        .join(reps.select(F.col(simhash_col).alias("__s"), "__rep"), "__s")
        .join(
            rep_clusters.select(F.col("node").alias("__rep"), "cluster"),
            "__rep",
            "left",
        )
        .select(
            "id",
            F.coalesce("cluster", F.col("__rep")).alias("cluster"),
        )
    )


def incremental_near_dup_check(
    new_fps: DataFrame,
    corpus_fps: DataFrame,
    id_col: str = "doc_id",
    simhash_col: str = "sim",
    *,
    max_hamming: int = 3,
    num_bands: int = 4,
    band_bits: int = 4,
) -> DataFrame:
    """Dedup-at-ingest: near-dup candidates between a NEW batch and the
    EXISTING corpus — the daily-increment shape where re-pairing the
    whole corpus (O(corpus²)) is never an option.

    Both sides band their fingerprints; the join is new-bands ⨝
    corpus-bands on (band, value) with the incremental side BROADCAST —
    the corpus side streams through one scan, nothing shuffles.  At
    100 TB the corpus banding is a materialized index table written
    once at ingest (band both sides from the same fingerprint column
    and the index is just this projection persisted); each daily batch
    then costs one corpus scan, or a partition-pruned fraction when the
    index is bucketed by band value.  Exactness: same pigeonhole
    guarantee as ``simhash_near_dup_pairs`` for ``max_hamming <
    num_bands``.

    Returns (new_id, old_id, hamming) — every corpus doc the new batch
    near-duplicates.
    """
    def banded(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(simhash_col).alias(f"__s_{out_id}"),
            F.posexplode(
                simhash_bands(F.col(simhash_col), num_bands, band_bits)
            ).alias("band_id", "band_val"),
        )

    nb = banded(new_fps, "new_id")
    cb = banded(corpus_fps, "old_id")
    return (
        cb.join(F.broadcast(nb), ["band_id", "band_val"])
        .select(
            "new_id",
            "old_id",
            F.bit_count(
                F.col("__s_new_id").bitwiseXOR(F.col("__s_old_id"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
