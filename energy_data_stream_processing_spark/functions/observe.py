"""Observable pipeline metrics (reference S10: Prometheus counters/histogram,
producer/producer.py:14, consumer/consumer.py:30-37).

Spark-first: ``df.observe`` attaches metric expressions that the engine
computes DURING the job (no second pass); batch jobs read them from an
``Observation``, streaming queries surface them per-batch through
``StreamingQueryListener.onQueryProgress`` / ``lastProgress`` — which also
covers the reference's rate/latency histograms via the built-in progress
metrics (inputRowsPerSecond, batchDuration, stateOperators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_ingest(valid_invalid: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach success/failure counters to a validated envelope frame
    (pre-split, with ``reason``): the engine-native events_processed
    {status} counters."""
    obs = Observation("ingest")
    df = valid_invalid.observe(
        obs,
        F.count(F.lit(1)).alias("events_total"),
        F.count(F.when(F.col("reason").isNull(), 1)).alias("events_valid"),
        F.count(F.when(F.col("reason").isNotNull(), 1)).alias("events_failed"),
        F.count(F.when(F.col("reason") == "Malformed JSON", 1)).alias("events_malformed"),
    )
    return df, obs


class ProgressCapture:
    """StreamingQueryListener capture of per-batch progress (S10 streaming
    half): numInputRows / batchDuration per micro-batch — the engine-native
    events_processed counters and latency histogram the reference exports
    through Prometheus."""

    def __init__(self, spark):
        from pyspark.sql.streaming import StreamingQueryListener

        capture = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                capture.batches.append(
                    {
                        "batchId": p.batchId,
                        "numInputRows": p.numInputRows,
                        "durationMs": dict(p.durationMs or {}),
                    }
                )

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        self.batches: list[dict] = []
        self._listener = _L()
        self._spark = spark
        spark.streams.addListener(self._listener)

    def close(self) -> None:
        self._spark.streams.removeListener(self._listener)

    @property
    def total_rows(self) -> int:
        return sum(b["numInputRows"] for b in self.batches)
