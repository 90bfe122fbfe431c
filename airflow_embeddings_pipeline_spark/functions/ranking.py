"""Global-rank helper for BOUNDED relations.

A ``Window.orderBy(...)`` with an empty partition spec routes WindowExec
through its all-data-to-one-partition path and logs a loud warning even
when the input is a ≤k-row top-k or a bounded rollup.  Spark folds a
literal partition key (``partitionBy(lit(0))``) right back to the empty
spec, so :func:`single_group` builds the constant key from a real
column instead — ``coalesce(col % 1, 0)`` is 0 for every row (including
NULLs), non-foldable, and costs one trivial projection — giving the
same single global frame through WindowExec's partitioned path.

Use ONLY over inputs that are bounded by construction (post
``orderBy().limit(k)``, a capped alphabet, a per-label rollup).  For
unbounded inputs the right idiom is ``orderBy().limit(k)`` first
(TakeOrderedAndProject — distributed partial top-k), then rank the
survivors with this helper.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def single_group(key: Column | str) -> Column:
    """A constant-0, non-foldable partition key derived from ``key``
    (any numeric column); partitions every row into one group without
    tripping WindowExec's empty-spec warning path.

    The cast to long is load-bearing: ``double % 1`` is the FRACTIONAL
    PART, not 0 — ``long % 1`` is 0 for every value, and the coalesce
    covers NULLs (and strings that fail the cast)."""
    col = F.col(key) if isinstance(key, str) else key
    return F.coalesce(col.cast("long") % F.lit(1), F.lit(0))
