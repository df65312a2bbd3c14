"""Arbitrary stateful processing via the Spark 4 state-v2 API
(transformWithStateInPandas + StatefulProcessor).

The applyInPandasWithState operators in streaming/windows.py carry the
WHOLE group state through every invocation (one state row per group,
re-serialized each batch). The v2 API exposes typed state primitives
(ValueState / ListState / MapState) backed by the RocksDB state store
with native TTL — the engine-level replacement for the hand-rolled
eviction in topk_user_spend_with_ttl. This module provides the same
running-totals semantics as windows.running_user_totals on the new API
so both state backends sit under the correctness gate.

transformWithState REQUIRES the RocksDB state-store provider; callers
set `spark.sql.streaming.stateStore.providerClass` to
`org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`
before starting the query.

ENVIRONMENT-BLOCKED in this container: the state-v2 Python worker
speaks protobuf to the JVM (`pyspark.sql.streaming.proto`), and the
`protobuf` package is not installed (verified: the query starts, the
driver worker crashes on `import google.protobuf`). Same carry status
as the Delta/Iceberg jars — the operator is complete and
capability-gated (:func:`state_v2_available`); the applyInPandasWithState
twins in streaming/windows.py carry the gate coverage meanwhile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def running_user_totals_v2(events: DataFrame) -> DataFrame:
    """Per-user running totals on the state-v2 API: ValueState holds
    (count, scaled-integer sum) per user; each micro-batch folds its
    rows in and emits the updated totals — bit-identical semantics to
    windows.running_user_totals (same scaled-int determinism pattern),
    different state machinery.
    """
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class TotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n long, scaled long"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._totals.exists():
                n, scaled = self._totals.get()
            else:
                n, scaled = 0, 0
            for pdf in rows:
                n += len(pdf)
                scaled += int(
                    (pdf["value"] * 10000).round().astype("int64").sum()
                )
            self._totals.update((n, scaled))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [scaled / 10000.0],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=TotalsProcessor(),
            outputStructType="user_id long, n_events long, total_value double",
            outputMode="Update",
            timeMode="None",
        )
    )


def state_v2_available() -> bool:
    """True when the transformWithState Python worker can run (the
    state-v2 protocol needs the protobuf package)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False
