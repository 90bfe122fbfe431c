"""Custom stateful streaming operator (SURVEY §2.8 'no stateful
mapGroupsWithState analog' — provided here as engine capability):
cross-micro-batch first-seen dedup via ``applyInPandasWithState``.

The reference dedups only *within* a staged batch (W1 QUALIFY) and
relies on the MERGE key for cross-run idempotency.  A streaming engine
needs the general form: per-key state that remembers what it has seen
across micro-batches and emits each key's first occurrence exactly
once.

Scale posture: state is one tiny row per key in the state store,
partitioned by the grouping key (the shuffle that
``applyInPandasWithState`` induces is the same one any keyed
aggregation pays).  A state TTL (``stateTimeout``) would bound the
store for unbounded key domains; fixture keys are bounded so the test
uses no timeout.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def first_seen_dedup(
    stream: DataFrame,
    *,
    key_col: str,
    output_schema: str | StructType,
) -> DataFrame:
    """Emit only the first-arriving row per key across all micro-batches.

    Within a micro-batch the earliest row (by arrival order in the
    group iterator) wins; state stores one boolean per key thereafter.
    Output columns = ``output_schema`` (must be a subset of the input
    columns plus the key).
    """

    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return  # key already emitted in an earlier batch
        for pdf in pdfs:
            if len(pdf):
                state.update((True,))
                yield pdf.head(1)
                return

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
