"""Observability parity with the reference's print-trace layer.

The reference's de-facto debugging surface is stdout: ``[AGG ADD]`` /
``[AGG MERGE]`` per accumulator update (flink/error_rate_detector.py:51-54,
67), ``[WINDOW FIRED]`` per window close (:82-87,
flink/latency_slo_monitor.py:62), ``[PROCESS_ELEMENT]`` / ``[ESCALATION]``
per keyed-state transition (flink/incident_aggregator.py:42-61).  Printing
per row from executors is exactly what does NOT scale (driver log volume ~
input volume, and it forces row-at-a-time side effects into codegen'd
operators), so the Spark-idiomatic re-expression is ``DataFrame.observe``:
named aggregate expressions evaluated INSIDE the existing plan (no extra
pass, no shuffle, codegen-fused) whose values surface per action (batch,
via ``Observation``) or per micro-batch (streaming, via
``StreamingQueryListener`` → ``progress.observedMetrics``).

The counters below reproduce the reference's trace semantics as metrics:
rows/errors seen (the AGG ADD stream, collapsed to its sum), alerts
emitted per batch (each WINDOW FIRED print becomes +1), escalations per
batch.  At 100 TB the cost stays one scalar per metric per task —
partial-aggregated alongside the query's own aggregates.
"""

from __future__ import annotations

import threading
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

#: Metric-set names (one observe() node per stage, mirroring which
#: reference operator printed the trace).
INGEST_METRICS = "ingest"        # [AGG ADD]: rows/errors entering the detector
ALERT_METRICS = "alerts"         # [WINDOW FIRED]: alerts leaving a detector
ESCALATION_METRICS = "escalations"  # [ESCALATION]


def observe_ingest(logs: DataFrame, name: str = INGEST_METRICS) -> DataFrame:
    """Count rows/errors/latency mass flowing into a detector — the
    reference's per-element [AGG ADD] trace as three fused aggregates."""
    return logs.observe(
        name,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("is_error").alias("n_errors"),
        F.sum("latency_ms").alias("latency_mass_ms"),
    )


def observe_emitted(alerts: DataFrame, name: str = ALERT_METRICS) -> DataFrame:
    """Count rows leaving a detector/escalator — each [WINDOW FIRED] /
    [ESCALATION] print becomes +1 on a per-batch counter."""
    return alerts.observe(name, F.count(F.lit(1)).alias("n_emitted"))


class MetricsRecorder(StreamingQueryListener):
    """Collects every micro-batch's observed metrics keyed by observe()
    name — the structured replacement for grepping driver stdout.
    Thread-safe: listener callbacks run on Spark's listener bus thread.
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.batches: list[dict[str, dict[str, Any]]] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        om = dict(event.progress.observedMetrics)
        if om:
            with self._lock:
                self.batches.append(
                    {k: row.asDict() for k, row in om.items()})

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def total(self, metric_set: str, field: str) -> int:
        """Sum a counter across all recorded micro-batches."""
        with self._lock:
            return sum(
                b[metric_set][field] for b in self.batches
                if metric_set in b and b[metric_set][field] is not None)
