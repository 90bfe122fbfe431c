"""Vector similarity search (X3) over ``array<float>`` embedding
columns.

Three tiers, slowest-correct to scale:

1. ``cosine_topk_bruteforce`` — built-in expressions only: broadcast
   the (small) query set, ``zip_with``+``aggregate`` dot product, window
   top-k.  The correctness baseline; exact.  At 100 TB this is the
   pattern for "few queries × huge corpus": the corpus is scanned once,
   no shuffle until the tiny top-k aggregation.
2. ``cosine_topk_blocked`` — Arrow-batched ``mapInPandas`` with a
   numpy matmul per batch against the broadcast query matrix: same
   exactness, ~10-100× faster per row for wide query sets (BLAS), the
   single-node throughput path.
3. ``ivf_topk`` — IVF-style pruning: assign every vector to its nearest
   of k centroids (one corpus pass), then search only the probe's
   nearest ``nprobe`` cells.  Approximate; the 100 TB path when the
   query set is also large.

All dot products run left-to-right over the array so results are
bit-reproducible; similarity values are rounded before ranking and
ranked with id tiebreaks, so top-k is deterministic.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


# NOTE (r12, measured and rejected): unrolling these folds into flat
# 64-term codegen expressions (0.0 + a[0]*b[0] + a[1]*b[1] + ...) is
# 2.2x SLOWER than the interpreted HOF fold on the t08 verify stage
# (2.31 s vs 1.05 s, single-session interleaved A/B on 56k candidate
# pairs) — the generated method blows past the JIT's huge-method limit
# and runs in the bytecode interpreter, while the HOF's tight fold loop
# stays JIT-compiled.  Keep the HOFs.


def cosine(a: Column, b: Column) -> Column:
    da, db = _as_double(a), _as_double(b)
    return dot(da, db) / (l2_norm(da) * l2_norm(db))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is expected small (broadcast); the corpus side streams
    through one scan.  Excludes self-matches.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("__qv"), F.col("__cv")), round_to).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def cosine_topk_blocked(
    corpus: DataFrame,
    query_rows: list[tuple[int, list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Scale path: numpy matmul per Arrow batch against the broadcast
    query matrix, then a global top-k reduction.  Output matches
    ``cosine_topk_bruteforce`` up to float-accumulation order (use the
    brute-force tier when bit-parity with an oracle matters)."""
    spark = corpus.sparkSession
    qids = [int(i) for i, _ in query_rows]
    qmat = np.asarray([v for _, v in query_rows], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1)
    bc = spark.sparkContext.broadcast((qids, qmat, qnorm))

    out_schema = "query_id long, neighbor_id long, cosine double"

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_qids, b_qmat, b_qnorm = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            cmat = np.stack(pdf[vec_col].map(np.asarray).values).astype(np.float64)
            cnorm = np.linalg.norm(cmat, axis=1)
            sims = (cmat @ b_qmat.T) / np.outer(cnorm, b_qnorm)
            n_ids = pdf[id_col].to_numpy()
            frames = []
            for qi, qid in enumerate(b_qids):
                col = sims[:, qi]
                mask = n_ids != qid
                # per-batch partial top-k: keep k best, reduce globally later
                cand = np.argsort(-col[mask])[: max(k * 4, k)]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": n_ids[mask][cand],
                            "cosine": np.round(col[mask][cand], round_to),
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    from pyspark.sql import Window

    partials = corpus.select(id_col, vec_col).mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def head_embeddings(sf_dir: str, n: int) -> list[tuple[int, list[float]]] | None:
    """The lowest-``n`` ``(vec_id, embedding)`` rows of the embeddings
    fixture, read footer-filtered by pyarrow ON THE DRIVER.

    Every IVF/PQ/blocked-top-k build needs these k rows as plan
    literals (centroid seeds, probe vectors, ADC query head) and
    previously paid a full Spark job (filter + orderBy + collect,
    ~0.2 s of the measured wall) just to fetch them.  Reading k rows of
    a predicate-pruned parquet scan is O(1) row groups at any corpus
    size — the same driver-side cost class as the collect it replaces,
    minus the job.  Value identity: pyarrow's ``as_py()`` widens
    float32 → Python float exactly like Spark's ``collect`` of an
    ``array<float>`` column (IEEE widening is exact), and rows are
    sorted by vec_id as before.  Falls back to the caller's Spark path
    on any read problem by returning None."""
    import os

    try:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        t = pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
            filters=[("vec_id", "<", n)],
        )
        t = t.sort_by("vec_id")
        ids = t.column("vec_id").to_pylist()
        vecs = t.column("embedding").to_pylist()
        if len(ids) != n:
            return None  # unexpected fixture shape — use the Spark path
        return [
            (int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)
        ]
    except Exception:
        return None


def corpus_rowcount(sf_dir: str, name: str = "embeddings") -> int | None:
    """Exact row count of a fixture table from parquet footer metadata
    (no data read, no Spark job).  Identical by definition to
    ``count(*)`` over the unfiltered table — parquet footers carry the
    exact count, and the engine's own manifests keep per-file row
    counts for precisely this purpose at scale.  None on any problem →
    callers keep their 1-row-broadcast aggregate path."""
    import os

    try:
        import pyarrow.parquet as pq

        return int(
            pq.read_metadata(os.path.join(sf_dir, f"{name}.parquet")).num_rows
        )
    except Exception:
        return None


def _cents_sql(centroids: list[list[float]]) -> str:
    """Nested array literal of double components as ONE SQL text —
    ``repr(float)`` round-trips the exact IEEE value and the ``D``
    suffix makes each component a DOUBLE literal, so the parsed tree is
    value-identical to ``F.array(*[F.lit(float(x)) ...])`` while
    costing a single py4j call instead of k×dim (the
    ``hyperplane_signature`` compile-time trick; the per-``F.lit``
    column-API build measured ~0.5 s of driver time per plan at
    4×64 components × 2 call sites)."""
    return (
        "array("
        + ", ".join(
            "array(" + ", ".join(repr(float(x)) + "D" for x in c) + ")"
            for c in centroids
        )
        + ")"
    )


def _dot_sql(a: str, b: str) -> str:
    """SQL text mirror of ``dot`` — same left-fold, same 0.0D seed."""
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"


def _cell_dists_sql(centroids: list[list[float]], vec_col: str) -> str:
    """Per-centroid distance array, the shared assignment expression:
    ``round(c·c - 2·(v·c), 6)`` per centroid over the double-cast
    vector — textually identical semantics to the former column-API
    ``F.transform(cents, lambda c: round(dot(c, c) - 2 * dot(v, c), 6))``."""
    v = f"transform(`{vec_col}`, x -> CAST(x AS DOUBLE))"
    return (
        f"transform({_cents_sql(centroids)}, c -> "
        f"round({_dot_sql('c', 'c')} - 2 * {_dot_sql(v, 'c')}, 6))"
    )


def assign_ivf_cells(
    corpus: DataFrame,
    centroids: list[list[float]],
    *,
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF assignment: nearest-centroid cell id per vector, computed
    with built-in expressions over a literal centroid array (no UDF —
    centroid count is small, the map stage is codegen'd).

    Distance to each centroid, pick argmin (deterministic: first min).
    Rounded to 6dp so an oracle computing the same distances with a
    different float-accumulation order assigns identical cells.  The
    whole expression is generated as SQL text — one py4j call per plan
    instead of one per centroid component — and the argmin is a single
    left-fold with a strict ``<`` (keeps the FIRST minimum, exactly
    ``array_position(d, array_min(d)) - 1``'s first-occurrence rule)
    so the distance array is built once per row instead of twice
    (higher-order functions run interpreted: no codegen'd
    common-subexpression elimination rescues a duplicated tree).

    The cell id is emitted through a generator barrier
    (``explode(array(expr))`` — the repo's established trick, see the
    int8 ``qv`` codes): when ``ivf_cell`` is used as a join key,
    Catalyst pushes an ``isnotnull(ivf_cell)`` filter below the
    projection and inlines the WHOLE argmin expression into the Filter
    — every corpus row paid the k×dim distance fold twice (measured in
    plans/r11/x_ann_ivf*_after.txt before this change).  A one-element
    explode makes ``ivf_cell`` a runtime attribute the filter must
    reference, not re-derive; filters on other columns still push
    through the Generate to the scan.

    Column-order caveat: when the input already HAS an ``ivf_cell``
    column it is replaced value-wise but moves to the LAST position
    (drop-then-append), unlike ``withColumn`` which replaces in place.
    No caller consumes this frame positionally (Spark ``union`` is the
    positional hazard); select by name after reassignment if one ever
    does."""
    d = _cell_dists_sql(centroids, vec_col)
    cell = F.expr(
        f"CAST(aggregate(zip_with({d}, sequence(0, {len(centroids) - 1}), "
        "(x, i) -> named_struct('d', x, 'i', i)), "
        "named_struct('d', CAST('Infinity' AS DOUBLE), 'i', -1), "
        "(acc, x) -> IF(x.d < acc.d, x, acc)).i AS BIGINT)"
    )
    if "ivf_cell" in corpus.columns:  # keep withColumn's replace semantics
        corpus = corpus.drop("ivf_cell")
    return corpus.select("*", F.explode(F.array(cell)).alias("ivf_cell"))


def hyperplane_planes(num_planes: int = 16, dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes for sign-LSH (Charikar
    2002 random-hyperplane rounding): component (j, i) derives from
    ``md5(f"p{j}_{i}")`` mapped into [-1, 1].  No RNG state — the same
    list regenerates anywhere (Python here, literal arrays in the SQL
    oracle), which is what makes the LSH bucketing oracle-checkable."""
    import hashlib

    return [
        [
            (int(hashlib.md5(f"p{j}_{i}".encode()).hexdigest()[:8], 16) % 2001 - 1000)
            / 1000.0
            for i in range(dim)
        ]
        for j in range(num_planes)
    ]


def hyperplane_signature(vec, planes: list[list[float]]) -> Column:
    """Sign-LSH bitmask: bit j set iff ``dot(v, plane_j) > 0``.  For
    unit-ish vectors P[bit differs] = angle/π, so banded bucketing of
    the signature (reuse ``simhash_near_dup_pairs``) yields cosine-LSH
    candidate pairs without any O(n²) join.  Pass a MATERIALIZED
    double-cast vector column — the per-plane dots each re-evaluate
    their input (no CSE in HOFs).  Plane dim MUST equal the vector dim:
    ``zip_with`` pads the shorter side with nulls, which silently turns
    the dot product null (bit cleared) instead of failing.

    ``vec`` as a column NAME takes the fast path: the whole signature
    is ONE SQL expression string (a single py4j call), and since the
    round-5 compile-time fix the plane matrix is a single nested array
    LITERAL folded at runtime rather than 16-32 unrolled per-plane
    dot subtrees — the unrolled form cost ~1.7 s of Catalyst
    compile per plan at 32 planes × 64 dims (measured via the
    build/exec split in BASELINE.md; re-execution of the compiled plan
    is ~0.1 s).  Value-identical to the column-API path: same
    left-fold dot per plane in index order, same literal doubles,
    ``shiftleft(1L, j)`` == the unrolled ``CAST(1<<j AS BIGINT)``."""
    if planes and len({len(p) for p in planes}) != 1:
        raise ValueError("ragged plane matrix")
    if isinstance(vec, str):
        mat = ", ".join(
            "array(" + ", ".join(repr(float(x)) + "D" for x in plane) + ")"
            for plane in planes
        )
        return F.expr(
            f"aggregate(transform(array({mat}), (p, j) -> "
            f"IF(aggregate(zip_with({vec}, p, (a, b) -> a * b), "
            "0.0D, (acc, x) -> acc + x) > 0, "
            "shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT))), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
    bits = []
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(
            F.when(dot(vec, p) > 0, F.lit(1 << j).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig


def recompute_centroids(
    corpus_with_cells: DataFrame,
    centroids: list[list[float]],
    *,
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
    round_to: int = 6,
    scale: int = 1_000_000,
) -> list[list[float]]:
    """One Lloyd's recompute step: per-cell component means.

    Components are scaled to integers (``round(x * scale)``) before
    summing, so the sums are EXACT and order-independent — Spark's
    partial-aggregation order can't perturb the result, which makes the
    retrained centroids deterministic and bit-reproducible by a SQL
    oracle.  Means come back as ``round(sum / (n * scale), round_to)``
    doubles.  Empty cells keep their previous centroid (can't happen
    when centroids are corpus points — a centroid's own cell contains
    at least itself — but guarded anyway).

    Only (cell, pos) partial sums cross the wire: k·dim rows to the
    driver, one shuffle, map-side combine — the 100 TB shape.
    """
    comp = corpus_with_cells.select(
        F.col(cell_col).alias("cell"),
        F.posexplode(_as_double(F.col(vec_col))).alias("pos", "val"),
    )
    agg = comp.groupBy("cell", "pos").agg(
        F.sum(F.round(F.col("val") * scale).cast("long")).alias("s"),
        F.count("*").alias("n"),
    )
    rows = agg.select(
        "cell",
        "pos",
        F.round(F.col("s").cast("double") / (F.col("n") * float(scale)), round_to).alias("m"),
    ).collect()
    per_cell: dict[int, dict[int, float]] = {}
    for r in rows:
        per_cell.setdefault(int(r["cell"]), {})[int(r["pos"])] = float(r["m"])
    out = [list(c) for c in centroids]
    for cell, comps in per_cell.items():
        out[cell] = [comps[i] for i in range(len(comps))]
    return out


def train_ivf_centroids(
    corpus: DataFrame,
    seed_centroids: list[list[float]],
    *,
    vec_col: str = "embedding",
    iters: int = 1,
) -> list[list[float]]:
    """Deterministic k-means for IVF: seed with given points (by
    convention the k lowest-id corpus vectors), run ``iters`` Lloyd
    steps of assign → exact-integer-mean recompute.  Every step is one
    distributed pass; only k·dim means return to the driver."""
    cents = [list(c) for c in seed_centroids]
    for _ in range(iters):
        assigned = assign_ivf_cells(corpus, cents, vec_col=vec_col)
        cents = recompute_centroids(assigned, cents, vec_col=vec_col)
    return cents


def ivf_topk(
    corpus_with_cells: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """Approximate top-k: probe only the ``nprobe`` nearest cells per
    query.  The candidate join is an equi-join on cell id — shuffle on
    a small int key instead of a cross join."""
    from pyspark.sql import Window

    q = assign_ivf_cells(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")),
        centroids,
        vec_col="__qv",
    )
    # nprobe nearest cells per query, as one generated SQL expression
    # (same struct-sort argsort as the former column-API build: sort by
    # (distance, cell id), take the first nprobe cell ids).
    dists = _cell_dists_sql(centroids, "__qv")
    order = (
        f"array_sort(zip_with({dists}, sequence(0, {len(centroids) - 1}), "
        "(d, i) -> struct(d AS d, i AS i)))"
    )
    probe_cells = F.expr(f"slice(transform({order}, s -> s.i), 1, {nprobe})")
    q = q.withColumn("probe_cell", F.explode(probe_cells)).select(
        "query_id", "__qv", "probe_cell"
    )
    c = corpus_with_cells.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.col("ivf_cell"),
    )
    scored = (
        c.join(F.broadcast(q), (F.col("ivf_cell") == F.col("probe_cell"))
               & (F.col("query_id") != F.col("neighbor_id")))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("__qv"), F.col("__cv")), round_to).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )
