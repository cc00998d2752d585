"""The library send API: ``Tranquilizer`` (S3) restated for Spark.

Reference: ``core/.../tranquilizer/Tranquilizer.scala`` (~400 LoC) — per-event
``send(event): Future[Unit]`` with batching (``maxBatchSize`` default 2000),
bounded in-flight batches (``maxPendingBatches`` 5) and ``lingerMillis`` (0);
dropped events resolve their future with ``MessageDroppedException``.

Spark restatement: ``send`` buffers dict events; a flush builds ONE DataFrame
for the batch, applies the ingest spec's timestamp extraction + window-period
acceptance, and hands the survivors to a Beam (``SegmentSink.write_batch`` or
``MemoryBeam``). Each event's future resolves True, or raises
``MessageDroppedException`` if its timestamp was out of window / unparseable —
per-event disposition is computed vectorized (one filter), never row-by-row in
Python.

Flushes are synchronous and deterministic (the default lingerMillis=0 was
latency-biased anyway); ``maxPendingBatches`` back-pressure is therefore a
no-op, which only strengthens delivery semantics.
"""

from __future__ import annotations

import datetime as _dt
from concurrent.futures import Future
from typing import Callable, Optional

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tranquility_spark.operators.window_filter import two_sided_window_filter
from tranquility_spark.specs import IngestSpec

DEFAULT_MAX_BATCH_SIZE = 2000  # ref: Tranquilizer#DefaultMaxBatchSize


class MessageDroppedException(Exception):
    """Raised (via the send future) for events rejected by the window filter.

    Reference: ``com.metamx.tranquility.tranquilizer.MessageDroppedException``.
    """


class SendResult:
    def __init__(self, sent: bool):
        self.sent = sent


class Tranquilizer:
    def __init__(
        self,
        spark: SparkSession,
        spec: IngestSpec,
        beam,  # Beam (streaming/beams.py) or SegmentSink
        max_batch_size: int = DEFAULT_MAX_BATCH_SIZE,
        window_period: Optional[str] = "PT10M",
        clock: Optional[Callable[[], _dt.datetime]] = None,
    ):
        self.spark = spark
        self.spec = spec
        self.beam = beam
        self.max_batch_size = max_batch_size
        self.window_period = window_period
        self.clock = clock
        self._buffer: list[tuple[dict, Future]] = []
        # Resume past any batch markers a previous run left in the sink:
        # _batch_id is in-memory, but SegmentSink.write_batch skips ids whose
        # marker exists — starting from 0 after a daemon restart would make
        # early flushes collide with the old run's markers and be silently
        # discarded while their futures still resolved sent=True.
        self._batch_id = beam.max_batch_id() if hasattr(beam, "max_batch_id") else 0
        self.sent_count = 0
        self.dropped_count = 0

    def send(self, event: dict) -> Future:
        """Buffer one event; returns a future resolving to SendResult(sent=True)
        or raising MessageDroppedException. Auto-flushes at maxBatchSize."""
        fut: Future = Future()
        self._buffer.append((event, fut))
        if len(self._buffer) >= self.max_batch_size:
            self.flush()
        return fut

    def flush(self) -> None:
        if not self._buffer:
            return
        events = [e for e, _ in self._buffer]
        futures = [f for _, f in self._buffer]
        self._buffer = []

        idx_col = "__send_idx"
        df = self.spark.createDataFrame(
            [{**e, idx_col: i} for i, e in enumerate(events)]
        )
        ts_out = self.spec.timestamp_spec.output
        parsed = df.withColumn(ts_out, self.spec.timestamp_spec.extract(df)).filter(
            F.col(ts_out).isNotNull()
        )
        if self.window_period is not None:
            now = self.clock() if self.clock else None
            parsed = two_sided_window_filter(parsed, ts_out, self.window_period, now=now)

        accepted_idx = {r[idx_col] for r in parsed.select(idx_col).collect()}
        batch = parsed.drop(idx_col)

        self._batch_id += 1
        if hasattr(self.beam, "write_batch"):
            self.beam.write_batch(batch, self._batch_id)
        else:
            self.beam.send_all(batch)

        for i, fut in enumerate(futures):
            if i in accepted_idx:
                self.sent_count += 1
                fut.set_result(SendResult(sent=True))
            else:
                self.dropped_count += 1
                fut.set_exception(
                    MessageDroppedException(f"event {i} outside windowPeriod {self.window_period}")
                )

    def close(self) -> None:
        self.flush()
        if hasattr(self.beam, "close"):
            self.beam.close()
