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


# ---------------------- round-3 operators: randomized semantic models

_TOK = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"])
_DOC = st.lists(_TOK, min_size=3, max_size=10)


def _py_shingles(text: str, n: int = 3) -> set:
    toks = text.split(" ")
    return {" ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))}


@settings(max_examples=5, deadline=None)
@given(st.lists(_DOC, min_size=2, max_size=10))
def test_setsim_prefix_join_lossless_on_random_corpora(spark, docs):
    """PPJoin completeness/soundness against a pure-Python brute force
    on hypothesis-generated corpora — the lossless-prefix argument must
    hold for ANY token distribution, not just the fixtures."""
    from airflow_embeddings_pipeline_spark.extensions.dedup_queries import (
        setsim_prefix_join,
    )

    t = 0.5
    texts = [" ".join(d) for d in docs]
    corpus = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], schema="doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in setsim_prefix_join(corpus, threshold=t).collect()
    }
    want = set()
    sh = [_py_shingles(s) for s in texts]
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            if not sh[a] or not sh[b]:
                continue
            j = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
            if round(j, 6) >= t:
                want.add((a, b, round(j, 6)))
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_zorder_interleave_bijective(spark, pairs):
    """The z-value must decode back to exactly (cb, db) — bit
    interleaving is a bijection on 8-bit x 8-bit."""
    from airflow_embeddings_pipeline_spark.plans.changes import _z_expr

    df = spark.createDataFrame(pairs, schema="cb int, db int")
    got = [r[0] for r in df.select(F.expr(_z_expr("cb", "db")).alias("z")).collect()]
    for (cb, db), z in zip(pairs, got):
        dec_cb = sum(((z >> (2 * i + 1)) & 1) << i for i in range(8))
        dec_db = sum(((z >> (2 * i)) & 1) << i for i in range(8))
        assert (dec_cb, dec_db) == (cb, db)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.randoms(use_true_random=False),
)
def test_stdlib_png_codec_roundtrips_arbitrary_gray_images(w, h, rnd):
    """Pure-Python property: encode→decode is the identity for every
    8-bit grayscale image (driver-side codec functions, no Spark)."""
    from airflow_embeddings_pipeline_spark.extensions.multimodal import (
        png_decode_gray,
        png_encode_gray,
    )

    pix = bytes(rnd.randrange(256) for _ in range(w * h))
    png = png_encode_gray(w, h, pix)
    dw, dh, back = png_decode_gray(png)
    assert (dw, dh, back) == (w, h, pix)
    # cross-codec parity wherever PIL is installed: the stdlib encoder's
    # output decodes to the same pixels through PIL too
    from airflow_embeddings_pipeline_spark.extensions.multimodal import probe_codecs

    if probe_codecs()["PIL"]:
        import io

        from PIL import Image

        assert Image.open(io.BytesIO(png)).convert("L").tobytes() == pix


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=4, max_value=12000),
    st.integers(min_value=1, max_value=5_000_000),
)
def test_partsupp_assignment_yields_four_distinct_suppliers(S, p):
    """The additive dbgen-variant formula — (p + i*(S div 4) +
    (p-1) div S) mod S + 1 — must yield 4 DISTINCT suppliers in [1, S]
    for EVERY supplier count S >= 4 and part key p (the multiplicative
    spec formula collides at the sf0.001 fixture's S=10; this property
    is why the additive form replaced it)."""
    ks = {(p + i * (S // 4) + (p - 1) // S) % S + 1 for i in range(4)}
    assert len(ks) == 4
    assert all(1 <= k <= S for k in ks)


@given(
    st.lists(
        st.tuples(
            st.booleans(),  # overwrite?
            st.lists(st.integers(0, 99), min_size=0, max_size=5),  # doc_ids
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=30, deadline=None)
def test_document_store_write_sequences_match_model(spark, ops):
    """Property: after ANY sequence of append/overwrite commits, the
    reader sees exactly the model's rows (append = union, overwrite =
    replace), the manifest generation changes iff the commit was an
    overwrite, and no commit ever publishes a block name the previous
    generation referenced (the never-clobber atomicity invariant).
    Driven through the writer/reader classes directly — no Spark job
    per hypothesis example."""
    import json
    import os
    import shutil
    import tempfile

    from pyspark.sql.types import _parse_datatype_string

    from airflow_embeddings_pipeline_spark.sources.document_store import (
        STORE_SCHEMA,
        DocumentStoreReader,
        DocumentStoreWriter,
    )

    class Row:
        def __init__(self, d):
            self._d = d

        def asDict(self):
            return dict(self._d)

    schema = _parse_datatype_string(STORE_SCHEMA)
    root = tempfile.mkdtemp(prefix="docstore_prop_")
    try:
        live_model: list[int] = []
        prev_gen = None
        prev_names: set[str] = set()
        for overwrite, ids in ops:
            w = DocumentStoreWriter({"path": root}, overwrite)
            rows = [
                Row({"doc_id": i, "text": f"t{i}", "lang": "en",
                     "source": "s", "n_chars": 2})
                for i in sorted(ids)
            ]
            # two tasks' worth of staged blocks, like a 2-partition job
            msgs = [w.write(iter(rows[: len(rows) // 2])),
                    w.write(iter(rows[len(rows) // 2 :]))]
            w.commit(msgs)
            live_model = sorted(ids) if overwrite else sorted(live_model + list(ids))

            manifest = json.load(open(os.path.join(root, "manifest.json")))
            gen = manifest["generation"]
            names = {b["file"] for b in manifest["blocks"]}
            if prev_gen is not None:
                if overwrite:
                    assert gen != prev_gen  # streams must detect the swap
                    assert not (names & prev_names)  # never clobber old names
                else:
                    assert gen == prev_gen
                    assert prev_names <= names  # append keeps old blocks
            r = DocumentStoreReader(schema, {"path": root})
            got = sorted(t[0] for b in r.partitions() for t in r.read(b))
            assert got == live_model
            prev_gen, prev_names = gen, names
    finally:
        shutil.rmtree(root, ignore_errors=True)


@given(
    st.lists(
        st.lists(st.integers(0, 99), min_size=0, max_size=5),  # appended ids
        min_size=1,
        max_size=6,
    ),
    st.sampled_from([1, 200, 10_000_000]),  # min_block_bytes tiers
)
@settings(max_examples=30, deadline=None)
def test_document_store_compaction_preserves_rows_and_pruning(spark, batches, thresh):
    """Property: after ANY sequence of appends followed by a compaction
    at ANY threshold, the reader sees exactly the same multiset of
    rows, a pushed doc_id range scan returns exactly the same rows
    (the merged [min_id, max_id] pruning index stays exact), the block
    count never grows, blocks the pass left alone keep their exact
    files, merged names are commit-unique, and the generation id
    changes iff something was merged (positional stream offsets must
    fail loudly, same as overwrite)."""
    import json
    import os
    import shutil
    import tempfile

    from pyspark.sql.types import _parse_datatype_string

    from airflow_embeddings_pipeline_spark.sources.document_store import (
        STORE_SCHEMA,
        DocumentStoreReader,
        DocumentStoreWriter,
        compact_document_store,
    )

    class Row:
        def __init__(self, d):
            self._d = d

        def asDict(self):
            return dict(self._d)

    schema = _parse_datatype_string(STORE_SCHEMA)
    root = tempfile.mkdtemp(prefix="docstore_compact_")
    try:
        model: list[int] = []
        for ids in batches:
            w = DocumentStoreWriter({"path": root}, False)
            rows = [
                Row({"doc_id": i, "text": f"t{i}", "lang": "en",
                     "source": "s", "n_chars": 2})
                for i in sorted(ids)
            ]
            w.commit([w.write(iter(rows[: len(rows) // 2])),
                      w.write(iter(rows[len(rows) // 2 :]))])
            model = sorted(model + list(ids))
        if not os.path.exists(os.path.join(root, "manifest.json")):
            return  # every batch was empty: nothing was ever committed

        before = json.load(open(os.path.join(root, "manifest.json")))
        before_names = {b["file"] for b in before["blocks"]}

        def scan(pushed):
            r = DocumentStoreReader(schema, {"path": root})
            r.pushed = list(pushed)
            return sorted(t[0] for b in r.partitions() for t in r.read(b))

        filt = [("GreaterThanOrEqual", 20), ("LessThan", 70)]
        expect_filtered = scan(filt)

        stats = compact_document_store(root, min_block_bytes=thresh)
        after = json.load(open(os.path.join(root, "manifest.json")))
        after_names = {b["file"] for b in after["blocks"]}

        assert scan([]) == model
        assert scan(filt) == expect_filtered
        assert stats["blocks_after"] <= stats["blocks_before"]
        assert len(after["blocks"]) == stats["blocks_after"]
        merged_names = after_names - before_names
        assert stats["generation_changed"] == (stats["groups_merged"] > 0)
        if stats["groups_merged"]:
            assert after["generation"] != before["generation"]
            assert merged_names  # new commit-unique names, never reused
        else:
            assert after == before  # true no-op, byte-identical manifest
        # untouched blocks keep their exact files on disk
        for b in after["blocks"]:
            assert os.path.exists(os.path.join(root, b["file"]))
        # superseded members are swept
        for name in before_names - after_names:
            assert not os.path.exists(os.path.join(root, name))
        # pruning index stays ordered and exact per block
        for b in after["blocks"]:
            if b["min_id"] is not None and b["max_id"] is not None:
                assert b["min_id"] <= b["max_id"]
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------- CDC history law
@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.fixed_dictionaries(
                {
                    "op": st.just("merge"),
                    "upd": st.lists(
                        st.integers(0, 49), min_size=0, max_size=5,
                        unique=True,
                    ),
                    "ins": st.lists(
                        st.integers(100, 149), min_size=0, max_size=3,
                        unique=True,
                    ),
                    "dele": st.lists(
                        st.integers(0, 49), min_size=0, max_size=3,
                        unique=True,
                    ),
                }
            ),
            st.just({"op": "compact"}),
            st.just({"op": "restore"}),
        ),
        min_size=2,
        max_size=5,
    )
)
def test_cdc_replication_law_random_histories(spark, tmp_path_factory, ops):
    """For ANY history of pruned merges, compactions, and restores, a
    replica consuming the change feed equals the primary — through the
    batch pipe after every commit, and through ONE streaming catch-up
    drain of the whole history at the end."""
    import tempfile

    from pyspark.sql import functions as F

    from airflow_embeddings_pipeline_spark.operators.merge import (
        merge_upsert_write_pruned,
        sync_replica,
        sync_replica_stream,
    )
    from airflow_embeddings_pipeline_spark.sources.versioned import (
        VersionedParquetTable,
    )

    base_dir = tmp_path_factory.mktemp("cdc_law")
    p_path = str(base_dir / "primary")
    r_path = str(base_dir / "replica")
    s_path = str(base_dir / "stream_replica")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(50)], "k long, v string"
    )
    primary = VersionedParquetTable(p_path)
    primary.commit_with_manifest(base, "k", cluster_partitions=2)
    for path in (r_path, s_path):
        VersionedParquetTable(path).commit_with_manifest(
            base, "k", cluster_partitions=2,
            app_metadata={"cdc_last_applied_version": 1},
        )
    replica = VersionedParquetTable(r_path)
    stream_replica = VersionedParquetTable(s_path)

    tag = 0
    for step in ops:
        if step["op"] == "merge":
            tag += 1
            rows = (
                [(k, f"u{tag}") for k in step["upd"] if k not in step["dele"]]
                + [(k, f"i{tag}") for k in step["ins"]]
                + [(k, "DEL") for k in step["dele"]]
            )
            if not rows:
                continue
            merge_upsert_write_pruned(
                p_path,
                spark.createDataFrame(rows, "k long, v string"),
                "k",
                delete_when=F.col("s.v") == "DEL",
                vacuum_keep_last=None,
            )
        elif step["op"] == "compact":
            primary.compact(spark, min_file_bytes=1 << 30)
        else:  # restore to the first version (the deepest rollback)
            if primary.current_version() > 1:
                primary.restore(spark, 1)
        # batch pipe after every commit
        sync_replica(spark, p_path, r_path, "k", vacuum_keep_last=None)
        assert sorted(map(tuple, replica.read(spark).collect())) == sorted(
            map(tuple, primary.read(spark).collect())
        )

    # stream pipe once over the whole history
    q = sync_replica_stream(
        spark, p_path, s_path, "k",
        checkpoint_dir=tempfile.mkdtemp(prefix="ckpt_law_"),
        vacuum_keep_last=None,
    )
    q.awaitTermination()
    assert sorted(
        map(tuple, stream_replica.read(spark).collect())
    ) == sorted(map(tuple, primary.read(spark).collect()))


# ---------------------------------------------------------------- MERGE
# strategy="decompose" (left join + anti insert leg) must be ROW-
# IDENTICAL to the full-outer rewrite on arbitrary inputs — including
# duplicate keys on either side (matched groups multiply m×n both
# ways), NULL keys (never match, target rows carry, source rows
# insert), tombstones, partial update sets, and schema evolution.
_MERGE_ROW = st.tuples(
    st.one_of(st.none(), st.integers(min_value=0, max_value=6)),
    st.integers(min_value=0, max_value=3),
    st.sampled_from(["a", "b", "DEL"]),
)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(_MERGE_ROW, min_size=0, max_size=12),
    st.lists(_MERGE_ROW, min_size=0, max_size=12),
    st.booleans(),
    st.booleans(),
)
def test_merge_decompose_strategy_matches_outer(
    spark, t_rows, s_rows, partial_update, with_delete
):
    from airflow_embeddings_pipeline_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(k, v, f) for k, v, f in t_rows], "k int, v int, flag string"
    )
    # source carries an extra column for the evolution path
    source = spark.createDataFrame(
        [(k, v, f, v * 10) for k, v, f in s_rows],
        "k int, v int, flag string, extra int",
    )
    kwargs = dict(
        update_columns=["v"] if partial_update else None,
        schema_evolution=True,
        delete_when=(F.col("s.flag") == "DEL") if with_delete else None,
    )
    outer = merge_upsert(target, source, "k", strategy="outer", **kwargs)
    dec = merge_upsert(target, source, "k", strategy="decompose", **kwargs)
    assert outer.columns == dec.columns
    key = lambda r: tuple("" if x is None else str(x) for x in r)
    assert sorted(map(tuple, outer.collect()), key=key) == sorted(
        map(tuple, dec.collect()), key=key
    )
