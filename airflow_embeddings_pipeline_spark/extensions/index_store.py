"""Persisted ANN index artifacts: train once, probe many times.

The trained ANN tiers (IVF centroids, PQ codebooks) are deterministic
driver-side artifacts of bounded size (k×dim floats for IVF,
m×ncents×subdim for PQ — a few KB).  At fixture scale retraining per
query is free; at 100 TB the training pass scans the full corpus, so a
real deployment trains ONCE and reuses the artifact across every probe
query.  This module is that reuse surface.

Persistence follows the engine's state-file contract (the reference's
watermark JSON, embeddings-pipeline.py:128-130, generalized in
streaming/incremental.py): a single JSON document written tmp-then-
``os.replace`` so readers see either the old artifact or the new one,
never a torn write.  Floats round-trip exactly — Python's json emits
``repr``-faithful doubles, and the trained artifacts are already
6 dp-rounded by the exact-integer-mean trainers — so a probe over a
LOADED index is bit-identical to a probe over the freshly-trained one
(asserted by the ``x_ann_ivf_persisted`` catalog entry, which shares
``x_ann_ivf_trained``'s full DuckDB oracle).

Version/kind checks fail loudly: probing an IVF corpus with PQ
codebooks is a silent-wrong-results bug, not a recoverable condition.
"""

from __future__ import annotations

import json
import os

_FORMAT_VERSION = 1
_KINDS = ("ivf_centroids", "pq_codebooks")


def save_index(path: str, kind: str, vectors, *, meta: dict | None = None) -> None:
    """Atomically persist a trained index artifact.

    ``vectors`` is the trainer's output verbatim: ``list[list[float]]``
    for IVF centroids, ``list[list[list[float]]]`` for PQ codebooks.
    ``meta`` carries whatever the caller wants to re-check at load time
    (corpus fingerprint, dim, ncents, training params).
    """
    if kind not in _KINDS:
        raise ValueError(f"unknown index kind {kind!r}; expected one of {_KINDS}")
    doc = {
        "format_version": _FORMAT_VERSION,
        "kind": kind,
        "meta": dict(meta or {}),
        "vectors": vectors,
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(doc, fh)
    os.replace(tmp, path)


class StaleIndexError(ValueError):
    """The persisted artifact's recorded meta does not match the
    current run's expectation — the index was trained on a different
    corpus (or with different parameters) than the one being probed.
    Callers retrain; serving the artifact anyway would be silent wrong
    results."""


def corpus_fingerprint(parquet_path: str) -> dict:
    """Cheap footer-only corpus identity: total row count + total bytes
    of the parquet source (file or directory).  Row counts come from
    parquet footers — no data pages are read — so this is safe to
    compute per probe even on a 100 TB corpus (one footer per file).
    Catches what a filename+mtime cache key alone cannot: an
    mtime-preserving replacement (``cp -p`` / ``tar -x``) or a ``/tmp``
    cache directory shared across users pointing the key at a
    different corpus."""
    import pyarrow.parquet as pq

    if os.path.isdir(parquet_path):
        paths = sorted(
            os.path.join(d, f)
            for d, _dirs, files in os.walk(parquet_path)
            for f in files
            if f.endswith(".parquet")
        )
    else:
        paths = [parquet_path]
    n_rows = sum(pq.ParquetFile(p).metadata.num_rows for p in paths)
    n_bytes = sum(os.path.getsize(p) for p in paths)
    return {"n_rows": n_rows, "n_bytes": n_bytes}


def load_index(
    path: str, *, expect_kind: str | None = None, expect_meta: dict | None = None
):
    """Load a persisted artifact; returns ``(kind, vectors, meta)``.

    Raises on format-version or kind mismatch — a wrong-kind artifact
    must never silently feed a probe plan.  ``expect_meta`` keys are
    checked against the stored meta; any mismatch (or absence) raises
    :class:`StaleIndexError` so the caller retrains instead of probing
    a stale or foreign index.
    """
    with open(path) as fh:
        doc = json.load(fh)
    if doc.get("format_version") != _FORMAT_VERSION:
        raise ValueError(
            f"index artifact {path} has format_version "
            f"{doc.get('format_version')!r}, expected {_FORMAT_VERSION}"
        )
    kind = doc.get("kind")
    if kind not in _KINDS:
        raise ValueError(f"index artifact {path} has unknown kind {kind!r}")
    if expect_kind is not None and kind != expect_kind:
        raise ValueError(
            f"index artifact {path} is {kind!r}, caller expected {expect_kind!r}"
        )
    meta = doc.get("meta", {})
    if expect_meta:
        for k, v in expect_meta.items():
            if meta.get(k) != v:
                raise StaleIndexError(
                    f"index artifact {path} meta[{k!r}] = {meta.get(k)!r} "
                    f"!= expected {v!r}; retrain (stale or foreign index)"
                )
    return kind, doc["vectors"], meta


def load_index_if_valid(path: str, kind: str, expect_meta: dict):
    """``load_index`` that answers ``None`` instead of raising when the
    artifact is absent, unreadable, wrong-kind, or stale — the
    load-or-retrain probe pattern."""
    try:
        _kind, vectors, _meta = load_index(
            path, expect_kind=kind, expect_meta=expect_meta
        )
        return vectors
    except (OSError, ValueError):  # StaleIndexError is a ValueError
        return None
