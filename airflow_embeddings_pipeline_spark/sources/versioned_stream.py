"""Streaming change-data-feed source over the versioned table (T4/S9).

Delta's ``spark.readStream.format("delta").option("readChangeFeed",
"true")`` analog: a Structured Streaming source whose offsets are the
table's COMMIT VERSIONS and whose rows are the per-commit net changes
(``insert`` / ``delete`` / ``update_preimage`` / ``update_postimage``
with ``_commit_version``).  The reference consumes the same shape from
Snowflake table streams (embeddings-pipeline.py:294-352); the batch
export half lives in :meth:`VersionedParquetTable.changes_between` —
this source is the always-on consumer half, checkpointed by Spark.

Scale contract (same as the batch CDF): each micro-batch step reads
ONLY the manifest file DIFF of its commit — files carried by reference
through the pruned MERGE are never opened — so per-step read
amplification is bounded by that commit's touched+appended file mass,
never table size.  The parallelism axis is commit steps: a catch-up
replay of N commits fans out N independent partitions.  Each partition
materializes its step's diff in pandas; that is bounded by the same
touched-file mass (a daily batch), which is exactly the design point —
a commit that rewrote the whole table is a full-snapshot diff and
should be exported with the batch API instead.

Semantics notes:

* the feed is PER-COMMIT, not netted across the micro-batch range
  (Delta ``table_changes`` semantics); net-across-range is the batch
  :meth:`changes_between`'s job.
* rows rewritten byte-identical inside a touched file (compaction,
  carried content) appear on both diff sides with equal values and are
  dropped by the null-safe row comparison — maintenance commits emit
  zero changes.
* the source schema is fixed at stream start (current manifest schema
  + the two meta columns).  Evolution the stream SURVIVES (round 10):
  any commit under which the stream-start payload stays a positional
  PREFIX of the evolved schema — PURE RENAMES (same types/positions,
  physical identity intact: the files' bytes are the same columns,
  read by physical name under the stream-start names) and ADD-COLUMN
  commits (the stream continues under the stream-start PROJECTION;
  the pinned physicals are all it ever reads, so a change confined to
  post-start columns emits nothing — the fixed-schema sink could not
  store it anyway).  DROPS, type changes, reorders, and re-keying on
  a post-start column raise loudly in the planning step — restart the
  stream with a fresh checkpoint to pick up the evolved schema (Delta
  fails the same way without schema tracking).
"""

from __future__ import annotations

import json
import math
import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

_MANIFEST = "_MANIFEST.json"

# DV position sets at or below this resolve driver-side and ship BY
# VALUE in partition specs (cheap, and the planner can drop empty
# diffs); bigger sets ship as sidecar REFERENCES the worker resolves —
# a heavily-DV'd file must not pickle millions of ints per spec
_POS_INLINE_MAX = 100_000


def _resolve_positions(spec):
    """A partition spec's position set → sorted int64 numpy array.
    ``spec`` is an inline int list, ``("sc", sidecar_abs, rel)`` (the
    full recorded set), or ``("diff", a_abs, b_abs, rel)`` (positions
    in sidecar a minus those in b; either side None = empty)."""
    import numpy as np
    import pyarrow.parquet as pq

    def _sc(path, rel):
        if path is None:
            return np.empty(0, dtype=np.int64)
        t = pq.read_table(path, filters=[("_path", "=", rel)])
        return np.sort(t.column("_pos").to_numpy(zero_copy_only=False))

    if isinstance(spec, tuple) and spec and spec[0] == "sc":
        return _sc(spec[1], spec[2])
    if isinstance(spec, tuple) and spec and spec[0] == "diff":
        return np.setdiff1d(_sc(spec[1], spec[3]), _sc(spec[2], spec[3]))
    return np.asarray(sorted(spec), dtype=np.int64)


def _read_pointer(root: str) -> int | None:
    """Resolve the table's live version THROUGH the commit-protocol
    seam (auto-detected, so an object-store-protocol table — whose
    ``_CURRENT`` is absent or permanently stale after migration —
    streams correctly).  Self-contained fallback (a direct
    ``_CURRENT`` read) keeps the module importable in the DataSource
    worker, where only planning ever calls this."""
    try:
        from .commit_protocol import resolve_protocol

        name = resolve_protocol(None, root).read_pointer()
    except ImportError:  # pragma: no cover — worker-side safety net
        try:
            with open(os.path.join(root, "_CURRENT")) as fh:
                name = fh.read().strip()
        except OSError:
            return None
    if not name or not (name.startswith("v") and name[1:].isdigit()):
        return None
    return int(name[1:])


class _ChangeStep(InputPartition):
    """One commit step's file diff: everything read() needs, resolved
    driver-side from the two manifests (no table access in the worker
    beyond the listed parquet files)."""

    def __init__(
        self,
        removed: list[str],
        added: list[str],
        keys: list[str],
        payload: list[str],
        v_to: int,
        arrow_schema=None,
        physical: list | None = None,
    ):
        self.removed = removed
        self.added = added
        self.keys = keys
        self.payload = payload
        self.v_to = v_to
        # payload's arrow schema (v_to): aligns the PRE-image side when
        # a column evolved in after v_from (reads as typed nulls, the
        # batch changes_between rule)
        self.arrow_schema = arrow_schema
        # PHYSICAL column name per arrow_schema field (column mapping:
        # data files store physical names; the feed speaks logical)
        self.physical = physical


def _eq_nullsafe(a, b) -> bool:
    """Python-side eqNullSafe: None==None, NaN==NaN (a float column
    holding NaN must not emit an update every commit)."""
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
    return a == b


def _range_components(removed, added, splittable):
    """Split one commit step's file diff into independently-diffable
    KEY-RANGE components — the intra-step parallelism axis.

    Both sides' files are range-clustered on the table's key, so every
    pre/post image of a key lives in files whose [min, max] contain it:
    files whose ranges don't transitively overlap across the UNION of
    both sides can be diffed in separate partitions (a full-rewrite
    commit's feed then fans out across the cluster instead of
    materializing in one task).  Touching ranges (shared boundary
    value — repartitionByRange may split equal keys at a partition
    edge) union into one component.  NULL-key rows sort NULLS FIRST
    into each side's lowest-range file while parquet stats exclude
    nulls, so the two sides' lowest-range files are force-unioned.
    Any file without usable stats, or a reader keyed off a non-
    clustering column (``key`` option override), degrades to a single
    component — grouping is conservative: it only ever costs
    parallelism, never correctness."""
    if not (removed or added):
        return []
    both = [("r", e) for e in removed] + [("a", e) for e in added]
    if not splittable or any(
        e["min"] is None or e["max"] is None for _s, e in both
    ):
        return [(removed, added)]
    items = sorted(both, key=lambda t: (t[1]["min"], t[1]["max"]))
    comps = [[items[0]]]
    hi = items[0][1]["max"]
    for it in items[1:]:
        if it[1]["min"] <= hi:
            comps[-1].append(it)
            hi = max(hi, it[1]["max"])
        else:
            comps.append([it])
            hi = it[1]["max"]

    def lowest_comp(side):
        files = [e for s, e in both if s == side]
        if not files:
            return None
        lowest = min(files, key=lambda e: (e["min"], e["max"]))
        for i, comp in enumerate(comps):
            if any(e is lowest for _s, e in comp):
                return i
        return None

    i_r, i_a = lowest_comp("r"), lowest_comp("a")
    if i_r is not None and i_a is not None and i_r != i_a:
        lo, hi_i = sorted((i_r, i_a))
        comps[lo] = comps[lo] + comps.pop(hi_i)
    return [
        (
            [e for s, e in comp if s == "r"],
            [e for s, e in comp if s == "a"],
        )
        for comp in comps
    ]


class VersionedChangesStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.root = options["path"]
        meta = {"_change_type", "_commit_version"}
        self.fields = [f.name for f in schema.fields]
        self.payload = [c for c in self.fields if c not in meta]
        # full (name, type) signature of the stream-start payload
        # schema: the mid-stream evolution guard must catch TYPE-only
        # changes too (a column widened int->long with unchanged names
        # would otherwise slip past a name-only check and read() would
        # emit RecordBatches typed to the NEW schema while Spark still
        # holds the stream-start schema)
        self._payload_sig = [
            (f.name, f.dataType.json())
            for f in schema.fields
            if f.name not in meta
        ]
        from pyspark.sql.types import StructType as _St

        # the feed always SPEAKS the stream-start names: a mid-stream
        # RENAME (column mapping, physical identity intact) continues
        # under them — Spark holds this schema for the stream's whole
        # life, so emitting the new name would break the sink anyway
        self._start_payload_struct = _St(
            [f for f in schema.fields if f.name not in meta]
        )
        # physical identity of the payload fields BY POSITION, pinned
        # from the first processed step's pre-image manifest (renames
        # never change physical names or field order, so the pin holds
        # across every rename the stream later crosses)
        self._payload_phys: list | None = None
        key_opt = options.get("key")
        self.keys = key_opt.split(",") if key_opt else None
        self.starting = options.get("startingversion")
        # back-pressure: cap how many commit steps one micro-batch may
        # span (a consumer catching up 1000 commits must not material-
        # ize them as ONE batch — Delta's maxFilesPerTrigger analog).
        # None = unbounded (availableNow still drains everything, just
        # in bounded slices when the cap is set).
        mvpb = options.get("maxversionsperbatch")
        self.max_versions = int(mvpb) if mvpb is not None else None
        # byte-mass guardrail: each range COMPONENT of a commit step is
        # what one task materializes in Arrow — bound it by the summed
        # manifest bytes of its file diff, driver-side at planning
        # time.  A component over the bound means a table-scale rewrite
        # landed in the feed; failing loud with batch-API guidance
        # beats OOMing a worker.  <= 0 disables.  Default 8 GiB of
        # compressed parquet per component (~2-4x that in memory).
        mbps = options.get("maxbytesperstep")
        self.max_bytes = int(mbps) if mbps is not None else 8 << 30
        # DV position sets at or below this ship BY VALUE in partition
        # specs; bigger ones ship as sidecar references the worker
        # resolves (option mostly for tests — the default is right)
        pim = options.get("posinlinemax")
        self.pos_inline_max = (
            int(pim) if pim is not None else _POS_INLINE_MAX
        )
        self._last_end: int | None = None  # set by partitions(): true progress
        self._probe_base: int | None = None  # stall detection, see below
        self._stalled_probes = 0

    # -- local manifest/pointer probes (the table contract is local fs)
    def _current(self) -> int | None:
        return _read_pointer(self.root)

    def _table(self):
        # persistent handle (segment loads memoize across
        # micro-batches).  Lazy import: this module stays
        # self-contained for the data-source worker pickle path (only
        # driver-side planning calls it).
        vt = getattr(self, "_vt", None)
        if vt is None:
            from .versioned import VersionedParquetTable

            vt = self._vt = VersionedParquetTable(self.root)
        return vt

    def _manifest(self, v: int) -> dict | None:
        # RAW doc: every field the planner reads (schema, mapping,
        # key identity) is inline in both storage forms — the file
        # lists are consumed only as a per-step DIFF, which
        # _diff_file_maps computes in O(changed segments)
        return self._table()._raw_manifest(v)

    def initialOffset(self) -> dict:
        if self.starting is not None:
            # consumed through startingVersion: the first batch emits
            # startingVersion+1's changes (Delta startingVersion is
            # inclusive-of-changes; ours names the seeded snapshot)
            return {"v": int(self.starting)}
        return {"v": self._current() or 0}

    def latestOffset(self) -> dict:
        head = self._current() or 0
        if self.max_versions is None:
            return {"v": head}
        # The cap's base is the last end this run actually PLANNED
        # (partitions() records it).  Before any planning we only have
        # initialOffset — which on a checkpoint RESUME understates the
        # true committed offset (the JVM offset log is not visible
        # here), so a fixed window could sit forever below it and the
        # stream would stall with "no new data".  Stall-proofing: if
        # repeated probes see no planning progress, widen the window
        # geometrically — it passes any committed offset in O(log)
        # probes, then planning resumes and resets the window.  Head is
        # always an upper bound, so the cap never invents offsets.
        if self._last_end is not None:
            # planning has run: base is TRUE progress, so the fixed
            # window is always correct — and widening here would be
            # actively harmful: a live stream's idle polls would grow
            # the window toward max_versions<<32, so the first
            # post-idle commit burst arrives as one effectively
            # uncapped micro-batch, defeating the back-pressure
            # exactly when a burst needs it.
            return {"v": min(head, self._last_end + self.max_versions)}
        # checkpoint resume: initialOffset understates the committed
        # offset (the JVM offset log is invisible here), so a fixed
        # window could sit forever below it — widen geometrically
        # until planning resumes and _last_end takes over.
        base = self.initialOffset()["v"]
        if base == self._probe_base:
            self._stalled_probes += 1
        else:
            self._stalled_probes = 0
            self._probe_base = base
        window = self.max_versions << min(self._stalled_probes, 32)
        return {"v": min(head, base + window)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        prev = self._last_end
        self._last_end = end["v"] if prev is None else max(prev, end["v"])
        out: list[InputPartition] = []
        for v in range(start["v"] + 1, end["v"] + 1):
            man_f = self._manifest(v - 1)
            man_t = self._manifest(v)
            if man_f is None or man_t is None:
                raise RuntimeError(
                    f"{self.root}: streaming CDF needs keyed manifests on "
                    f"both sides of step v{v - 1}->v{v} (plain or vacuumed "
                    "versions: export that range with the batch "
                    "changes_between / re-seed the consumer)"
                )
            schema_t = StructType.fromJson(man_t["schema"])
            sig_t = [(f.name, f.dataType.json()) for f in schema_t.fields]
            # column mapping: files store PHYSICAL names, the feed and
            # the manifest key/stats_columns relate through it
            cmap = {
                f.name: (man_t.get("column_mapping") or {}).get(
                    f.name, f.name
                )
                for f in schema_t.fields
            }
            phys_t = [cmap[f.name] for f in schema_t.fields]
            # Evolution the stream SURVIVES: every step manifest must
            # share a positional type-identical PREFIX with the
            # stream-start payload, with per-position PHYSICAL
            # identity stable across steps.  That covers, in either
            # temporal direction:
            #
            # * RENAMES — same positions/types, physical identity
            #   intact: the files' bytes are the same columns under
            #   new logical names, and the feed keeps emitting the
            #   stream-start names;
            # * ADD-COLUMN commits AFTER stream start — extra trailing
            #   manifest fields: the stream continues under the
            #   stream-start PROJECTION (the pinned physicals are all
            #   it reads).  Projection semantics, pinned by unit test:
            #   a change confined to post-start columns is INVISIBLE
            #   and emits nothing (the fixed-schema sink could not
            #   store it anyway);
            # * catch-up over steps from BEFORE an add the start
            #   schema already carries — the step manifests are a
            #   prefix of the payload: the worker NULL-backfills the
            #   missing trailing columns (the batch changes_between
            #   rule), and their physicals pin later, at the first
            #   step manifest that carries them.
            #
            # DROPS, type changes and reorders still fail loud: rows
            # the sink holds can no longer be represented — restart
            # with a fresh checkpoint to adopt the evolved schema.
            n0 = len(self._payload_sig)
            if self._payload_phys is None:
                self._payload_phys = [None] * n0
            k = min(len(sig_t), n0)
            types_ok = [t for _n, t in sig_t[:k]] == [
                t for _n, t in self._payload_sig[:k]
            ]
            pin_ok = all(
                p is None or p == phys_t[i]
                for i, p in enumerate(self._payload_phys[:k])
            )
            # a payload column ALREADY PINNED from an earlier step that
            # a narrower later manifest no longer carries is a
            # MID-STREAM DROP — emitting it as nulls would silently
            # corrupt the sink, so that stays loud.  (An unpinned tail
            # is the catch-up-before-add case: the column does not
            # exist yet at this step and typed nulls are exactly the
            # batch backfill rule.)
            dropped_pinned = len(sig_t) < n0 and any(
                p is not None for p in self._payload_phys[len(sig_t):]
            )
            if not (types_ok and pin_ok) or dropped_pinned:
                raise RuntimeError(
                    f"{self.root}: schema changed at v{v} "
                    f"({sig_t} != {self._payload_sig}) beyond a "
                    "rename/add-column evolution; restart the "
                    "stream with a fresh checkpoint to adopt the "
                    "evolved schema"
                )
            for i in range(k):  # extend the physical-identity pin
                if self._payload_phys[i] is None:
                    self._payload_phys[i] = phys_t[i]
            start_names = [n for n, _t in self._payload_sig]
            inv_start = dict(zip(self._payload_phys, start_names))
            start_phys = dict(zip(start_names, self._payload_phys))
            if self.keys:
                keys = list(self.keys)  # user option: stream-start names
            else:
                # same identity rule as batch changes_between: the
                # recorded key_columns win; stats_columns (which may
                # carry skip-only columns) are the legacy fallback —
                # mapped to STREAM-START names via physical identity
                phys_keys = (
                    man_t.get("key_columns")
                    or man_t.get("stats_columns")
                    or [man_t["key"]]
                )
                if isinstance(phys_keys, str):
                    phys_keys = [phys_keys]
                keys = [inv_start.get(k, k) for k in phys_keys]
            bad = [k for k in keys if k not in start_names]
            if bad:
                raise RuntimeError(
                    f"{self.root}: step v{v - 1}->v{v}'s row identity "
                    f"{bad} is not part of the stream-start schema — "
                    "the table was re-keyed on a post-start column; "
                    "restart the stream with a fresh checkpoint"
                )
            from pyspark.sql.pandas.types import to_arrow_schema

            # O(changed segments): segments shared by ref between the
            # step's two manifests hold byte-identical entries and
            # never materialize (see VersionedParquetTable
            # ._diff_file_maps — exactness argued there)
            ent_f, ent_t = self._table()._diff_file_maps(v - 1, v)
            # deletion vectors: a removed/added entry carrying a DV is
            # read MINUS its deleted positions ("_dv_skip"); a file
            # present on both sides whose DV changed contributes ONLY
            # the delta positions ("_dv_take") — rows newly deleted are
            # pre-image-side deletes, rows un-deleted (a restore) are
            # post-image-side inserts.  SMALL position sets (manifest
            # dv.rows ≤ the inline cap) resolve driver-side and ship
            # by value; anything bigger ships as a sidecar REFERENCE
            # the worker resolves itself — a heavily-DV'd file must
            # not pickle millions of ints into every partition spec.
            from .versioned import _dv_read_positions

            def _pos(ent):
                return _dv_read_positions(
                    self.root, ent["dv"]["path"], ent["path"]
                )

            def _sc_abs(ent):
                return os.path.join(self.root, ent["dv"]["path"])

            def _with_skip(ent):
                if not ent.get("dv"):
                    return ent
                if ent["dv"]["rows"] <= self.pos_inline_max:
                    return {
                        **ent, "_dv_skip": [int(i) for i in _pos(ent)]
                    }
                return {
                    **ent,
                    "_dv_skip": ("sc", _sc_abs(ent), ent["path"]),
                }

            removed = [
                _with_skip(ent_f[p])
                for p in sorted(set(ent_f) - set(ent_t))
            ]
            added = [
                _with_skip(ent_t[p])
                for p in sorted(set(ent_t) - set(ent_f))
            ]
            for p in sorted(set(ent_f) & set(ent_t)):
                dv_f = ent_f[p].get("dv") or None
                dv_t = ent_t[p].get("dv") or None
                if dv_f == dv_t:
                    continue
                rows_f = dv_f["rows"] if dv_f else 0
                rows_t = dv_t["rows"] if dv_t else 0
                if max(rows_f, rows_t) <= self.pos_inline_max:
                    import numpy as np

                    po = (
                        _pos(ent_f[p])
                        if dv_f
                        else np.empty(0, dtype=np.int64)
                    )
                    pn = (
                        _pos(ent_t[p])
                        if dv_t
                        else np.empty(0, dtype=np.int64)
                    )
                    gone = np.setdiff1d(pn, po)
                    back = np.setdiff1d(po, pn)
                    if len(gone):
                        removed.append(
                            {**ent_f[p], "_dv_take": [int(i) for i in gone]}
                        )
                    if len(back):
                        added.append(
                            {**ent_t[p], "_dv_take": [int(i) for i in back]}
                        )
                else:
                    # big sets: ship both sidecar refs; the worker
                    # computes the setdiff (an empty diff direction
                    # costs one filtered sidecar read, nothing more)
                    sf = _sc_abs(ent_f[p]) if dv_f else None
                    st = _sc_abs(ent_t[p]) if dv_t else None
                    removed.append(
                        {**ent_f[p], "_dv_take": ("diff", st, sf, p)}
                    )
                    added.append(
                        {**ent_t[p], "_dv_take": ("diff", sf, st, p)}
                    )
            # emitted schema = STREAM-START names (+ identical types);
            # the PINNED physical names drive the file reads, so a
            # renamed column surfaces under the name the sink has held
            # all along and a post-start ADDED column is never read
            arrow = to_arrow_schema(self._start_payload_struct)
            # snapshot (the pin list extends as later steps process;
            # this step must ship what was known AT its manifests —
            # an unpinned tail reads as typed nulls in the worker)
            physical = list(self._payload_phys)
            for rem_c, add_c in _range_components(
                removed, added,
                start_phys.get(keys[0], keys[0])
                == (man_t.get("key") or start_phys.get(keys[0], keys[0])),
            ):
                comp_bytes = sum(
                    e.get("bytes") or 0 for e in rem_c
                ) + sum(e.get("bytes") or 0 for e in add_c)
                if self.max_bytes > 0 and comp_bytes > self.max_bytes:
                    raise RuntimeError(
                        f"{self.root}: commit step v{v - 1}->v{v} has a "
                        f"range component whose file diff is "
                        f"{comp_bytes} bytes (> maxBytesPerStep="
                        f"{self.max_bytes}) — a table-scale rewrite "
                        "does not belong in the streaming feed. Export "
                        "that commit range with the batch "
                        "changes_between API (or raise the "
                        "maxBytesPerStep option if the workers have "
                        "the memory for it)."
                    )
                def _spec(e):
                    return (
                        os.path.join(self.root, e["path"]),
                        e.get("_dv_take"),
                        e.get("_dv_skip"),
                    )

                out.append(
                    _ChangeStep(
                        removed=[_spec(e) for e in rem_c],
                        added=[_spec(e) for e in add_c],
                        keys=list(keys),
                        payload=self.payload,
                        v_to=v,
                        arrow_schema=arrow,
                        physical=physical,
                    )
                )
        return out or [_ChangeStep([], [], [], self.payload, end["v"])]

    def read(self, partition: _ChangeStep):
        """Vectorized per-step diff, yielded as Arrow RecordBatches.

        The two file sets are loaded as Arrow tables; only the KEY
        columns round-trip through pandas (for the outer merge that
        classifies insert/delete/update candidates by row index) — the
        payload never leaves Arrow, so values and types reach Spark
        exactly as parquet stored them (``take`` by index, no per-row
        Python objects).  Row-difference for update candidates is
        computed null-safely in pyarrow.compute with NaN==NaN treated
        as equal (a float NaN must not emit an update every commit).
        Assumes the table invariant that a key is unique within a
        version (what MERGE maintains); rewritten-unchanged rows
        (compaction carry-through) compare equal and emit nothing.
        """
        if not partition.removed and not partition.added:
            return
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        target = partition.arrow_schema

        phys = partition.physical or [f.name for f in target]

        def load(specs):
            # align each file to the v_to payload schema BEFORE concat
            # (files may differ from each other after a type widening):
            # files store PHYSICAL column names (column mapping) and
            # the feed speaks logical; evolved columns absent on the
            # pre-image side surface as typed nulls (the batch
            # changes_between rule); shared columns cast if the parquet
            # physical type differs from the declared one (widening
            # upcasts here).  Each spec is (path, take, skip): "take"
            # keeps ONLY those row positions (a DV delta — the rows a
            # deletion-vector commit logically removed or restored),
            # "skip" drops them (the file's deleted rows).
            if not specs:
                return None
            tabs = []
            for p, take, skip in specs:
                if take is not None:
                    # resolve the positions BEFORE touching the data
                    # file: a ("diff", ...) direction is often empty
                    # (a pure MoR delete has no un-deleted rows), and
                    # reading a full data file to take zero rows would
                    # double the step's I/O for nothing
                    pos = _resolve_positions(take)
                    if len(pos) == 0:
                        continue
                    t = pq.read_table(p).take(pa.array(pos))
                elif skip is not None:
                    t = pq.read_table(p)
                    keep = np.setdiff1d(
                        np.arange(t.num_rows, dtype=np.int64),
                        _resolve_positions(skip),
                    )
                    t = t.take(pa.array(keep))
                else:
                    t = pq.read_table(p)
                cols = []
                for f, pn in zip(target, phys):
                    if pn in t.column_names:
                        col = t.column(pn)
                        if col.type != f.type:
                            col = pc.cast(col, f.type)
                    else:
                        col = pa.nulls(t.num_rows, type=f.type)
                    cols.append(col)
                tabs.append(pa.table(cols, schema=target))
            # every spec may have resolved empty (all-empty diff
            # directions): an absent side, same as no specs at all
            return pa.concat_tables(tabs) if tabs else None

        old_t, new_t = load(partition.removed), load(partition.added)
        keys, payload = partition.keys, partition.payload
        vals = [c for c in payload if c not in keys]

        def key_frame(t, tag):
            df = t.select(keys).to_pandas()
            df[f"_idx_{tag}"] = np.arange(len(df), dtype=np.int64)
            return df

        if old_t is None:
            ins_idx = np.arange(new_t.num_rows, dtype=np.int64)
            del_idx = np.array([], dtype=np.int64)
            pair_o = pair_n = np.array([], dtype=np.int64)
        elif new_t is None:
            ins_idx = np.array([], dtype=np.int64)
            del_idx = np.arange(old_t.num_rows, dtype=np.int64)
            pair_o = pair_n = np.array([], dtype=np.int64)
        else:
            m = key_frame(old_t, "o").merge(
                key_frame(new_t, "n"), on=keys, how="outer", indicator=True
            )
            ins_idx = m.loc[
                m["_merge"] == "right_only", "_idx_n"
            ].to_numpy(dtype=np.int64)
            del_idx = m.loc[
                m["_merge"] == "left_only", "_idx_o"
            ].to_numpy(dtype=np.int64)
            both = m[m["_merge"] == "both"]
            pair_o = both["_idx_o"].to_numpy(dtype=np.int64)
            pair_n = both["_idx_n"].to_numpy(dtype=np.int64)

        def stamped(t, idx, ctype):
            sub = t.take(pa.array(idx)).select(payload)
            n = sub.num_rows
            return sub.append_column(
                "_change_type", pa.array([ctype] * n, pa.string())
            ).append_column(
                "_commit_version",
                pa.array(np.full(n, partition.v_to, dtype=np.int64)),
            )

        out = []
        if len(del_idx):
            out.append(stamped(old_t, del_idx, "delete"))
        if len(ins_idx):
            out.append(stamped(new_t, ins_idx, "insert"))
        if len(pair_o):
            o_sub = old_t.take(pa.array(pair_o))
            n_sub = new_t.take(pa.array(pair_n))
            changed = None
            for c in vals:
                a, b = o_sub.column(c), n_sub.column(c)
                try:
                    eq = pc.fill_null(pc.equal(a, b), False)
                    both_null = pc.and_(pc.is_null(a), pc.is_null(b))
                    same = pc.or_(eq, both_null)
                    if pa.types.is_floating(a.type):
                        # NULL-safe is not enough for floats: NaN != NaN
                        both_nan = pc.and_(
                            pc.fill_null(pc.is_nan(a), False),
                            pc.fill_null(pc.is_nan(b), False),
                        )
                        same = pc.or_(same, both_nan)
                except pa.lib.ArrowNotImplementedError:
                    # nested types (array/struct payloads, e.g. an
                    # embedding column) have no kernel — compare
                    # row-wise for THIS column only
                    same = pa.array(
                        [
                            _eq_nullsafe(x, y)
                            for x, y in zip(a.to_pylist(), b.to_pylist())
                        ],
                        pa.bool_(),
                    )
                diff = pc.invert(same)
                changed = diff if changed is None else pc.or_(changed, diff)
            if changed is not None:
                mask = changed.combine_chunks() if isinstance(
                    changed, pa.ChunkedArray
                ) else changed
                upd_o = o_sub.filter(mask)
                upd_n = n_sub.filter(mask)
                if upd_o.num_rows:
                    out.append(
                        stamped(upd_o, np.arange(upd_o.num_rows),
                                "update_preimage")
                    )
                    out.append(
                        stamped(upd_n, np.arange(upd_n.num_rows),
                                "update_postimage")
                    )
        for t in out:
            yield from t.to_batches(max_chunksize=65536)

    def commit(self, end: dict) -> None:
        pass  # progress lives in Spark's checkpoint, nothing external


class VersionedChangesDataSource(DataSource):
    """``spark.readStream.format("versioned_changes").option("path",
    root)`` — options: ``path`` (table root, required), ``key``
    (comma-separated key columns; default = manifest key /
    stats_columns), ``startingVersion`` (emit changes AFTER this
    committed snapshot; default = table head at stream start, i.e.
    only new commits), ``maxVersionsPerBatch`` (back-pressure: cap the
    commit steps one micro-batch spans — a 1000-commit catch-up
    becomes bounded slices instead of one giant batch; Delta's
    ``maxFilesPerTrigger`` analog), ``maxBytesPerStep`` (guardrail:
    max summed manifest bytes one step range-component may
    materialize in a worker; over it the stream FAILS LOUD at
    planning time with batch-API guidance instead of OOMing —
    default 8 GiB, <= 0 disables)."""

    @classmethod
    def name(cls) -> str:
        return "versioned_changes"

    def schema(self) -> StructType:
        root = self.options["path"]
        try:
            v = _read_pointer(root)
            if v is None:
                raise FileNotFoundError("no _CURRENT pointer")
            with open(os.path.join(root, f"v{v:08d}", _MANIFEST)) as fh:
                man = json.load(fh)
        except (FileNotFoundError, ValueError) as e:
            raise ValueError(
                f"{root}: streaming CDF needs a committed keyed manifest "
                "version to derive the feed schema"
            ) from e
        base = StructType.fromJson(man["schema"])
        return StructType(
            list(base.fields)
            + [
                StructField("_change_type", StringType(), False),
                StructField("_commit_version", LongType(), False),
            ]
        )

    def streamReader(self, schema: StructType) -> VersionedChangesStreamReader:
        return VersionedChangesStreamReader(schema, self.options)


def register_versioned_changes(spark) -> None:
    """Idempotent per-session registration (ships this module by value
    into the DataSource worker — same rationale as the document store:
    the worker process does not inherit the driver's in-process
    sys.path mutations)."""
    if not getattr(spark, "_versioned_changes_registered", False):
        try:
            from pyspark import cloudpickle

            import airflow_embeddings_pipeline_spark.sources.versioned_stream as _m

            cloudpickle.register_pickle_by_value(_m)
        except Exception:
            pass
        spark.dataSource.register(VersionedChangesDataSource)
        spark._versioned_changes_registered = True


def read_changes_stream(
    spark,
    path: str,
    *,
    starting_version: int | None = None,
    max_versions_per_batch: int | None = None,
    max_bytes_per_step: int | None = None,
):
    """Convenience: a streaming DataFrame of the table's change feed."""
    register_versioned_changes(spark)
    r = spark.readStream.format("versioned_changes").option("path", path)
    if starting_version is not None:
        r = r.option("startingVersion", str(starting_version))
    if max_versions_per_batch is not None:
        r = r.option("maxVersionsPerBatch", str(max_versions_per_batch))
    if max_bytes_per_step is not None:
        r = r.option("maxBytesPerStep", str(max_bytes_per_step))
    return r.load()
