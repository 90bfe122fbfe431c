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


def stateful_user_stats(stream: DataFrame, *, key_col: str = "user_id") -> DataFrame:
    """Per-key running statistics via ``applyInPandasWithState`` —
    the general custom-stateful-aggregation shape (count / value sum /
    max event time per key held in the state store across
    micro-batches, current totals emitted each batch).

    Unlike ``first_seen_dedup`` (whose winner depends on within-batch
    arrival order) the emitted totals are order-INDEPENDENT — count,
    sum and max commute — so under ``AvailableNow`` the settled output
    is deterministic and SQL-oracle-checkable: this is the catalog's
    proof that the stateful execution mode computes what the equivalent
    batch aggregation computes.  Value sums are accumulated in integer
    micro-units (×1e6) so cross-batch accumulation order can't perturb
    the float result.
    """

    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, micros, max_sec = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += int(len(pdf))
            # round per VALUE, not per batch sum: the micro-unit total is
            # then independent of how rows split across batches/chunks.
            # Half-UP via floor(x+0.5) on the absolute value: pandas
            # .round() is banker's (half-to-even) while the DuckDB
            # oracle's round() is half-away-from-zero — they only agree
            # while fixture values carry <=6dp (x*1e6 integral); this
            # makes exact-.5 micro-units match on any future fixture.
            import numpy as np

            scaled = pdf["value"].mul(1_000_000.0)
            half_up = np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)
            micros += int(half_up.astype("int64").sum())
            max_sec = max(max_sec, int(pdf["sec"].max()))
        state.update((n, micros, max_sec))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(micros / 1_000_000.0, 4)],
                "last_sec": [max_sec],
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=(
            "user_id long, n_events long, total_value double, last_sec long"
        ),
        stateStructType="n long, micros long, max_sec long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    # the abstract StatefulProcessor API is importable WITHOUT
    # google.protobuf — only the worker-side wire client
    # (stateful_processor_api_client) needs it, so the processor class
    # below executes in-process even in this protobuf-free container
    StatefulProcessor,
    StatefulProcessorHandle,
)


class RunningStatsProcessor(StatefulProcessor):
    """The ``transformWithStateInPandas`` processor behind
    :func:`tws_user_stats`, hoisted to module level so its SEMANTICS
    (state accumulation, micro-unit rounding, emitted frame shape) are
    directly unit-testable in this container: the wire transport
    between the Python worker and the JVM state server requires
    google.protobuf (absent here), but everything this class does —
    our code — runs and is asserted in-process against the batch
    aggregation (tests/test_streaming.py)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "n long, micros long, max_sec long"
        )

    def handleInputRows(self, key, rows, timerValues):
        import numpy as np

        n, micros, max_sec = (
            tuple(self._totals.get()) if self._totals.exists() else (0, 0, 0)
        )
        for pdf in rows:
            if not len(pdf):
                continue
            n += int(len(pdf))
            # half-UP per value (see stateful_user_stats: pandas
            # .round is banker's, the oracle's round() is half-away)
            scaled = pdf["value"].mul(1_000_000.0)
            half_up = np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)
            micros += int(half_up.astype("int64").sum())
            max_sec = max(max_sec, int(pdf["sec"].max()))
        self._totals.update((n, micros, max_sec))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(micros / 1_000_000.0, 4)],
                "last_sec": [max_sec],
            }
        )

    def close(self) -> None:
        pass


def tws_user_stats(stream: DataFrame, *, key_col: str = "user_id") -> DataFrame:
    """Per-key running statistics via ``transformWithStateInPandas`` —
    Spark 4's arbitrary-state API (SPARK-49214), the successor to
    ``applyInPandasWithState``: named state variables on a
    ``StatefulProcessorHandle`` instead of one packed tuple, RocksDB
    state store required.  Same order-independent totals contract as
    ``stateful_user_stats`` (count/sum/max commute; micro-unit integer
    accumulation), so the settled AvailableNow output is
    SQL-oracle-checkable against the batch aggregation.
    """
    return stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningStatsProcessor(),
        outputStructType=(
            "user_id long, n_events long, total_value double, last_sec long"
        ),
        outputMode="Update",
        timeMode="None",
    )
