"""Custom stateful streaming operators via ``applyInPandasWithState``.

This is the escape hatch SURVEY.md §7 reserves for semantics no built-in
streaming operator expresses: per-key state that must survive across
micro-batches with arbitrary update logic. The demo operator is a per-key
exponentially-weighted moving average (EWMA) — the classic "needs true
state" case: unlike sum/count (built-in aggs) the update is order-dependent
and non-decomposable, so it cannot be a windowed aggregation.

Scale shape: state lives in Spark's state store partitioned by the grouping
key (one shuffle on key per batch, same as any streaming agg); each group's
update is a few numpy ops on an Arrow batch. State size is O(distinct keys) ×
a 3-field struct — bounded and checkpointed.

NOTE: no ``from __future__ import annotations`` — pandas-facing signatures
need real type hints at decoration time (same policy as operators/pandas_fns).
"""

import math
from typing import Any, Iterator, Tuple

import pandas as pd

EWMA_OUTPUT_SCHEMA = "user_id long, n_events long, ewma double"
EWMA_STATE_SCHEMA = "n long, ewma double"


def _ewma_update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state,
) -> Iterator[pd.DataFrame]:
    """Fold this batch's events (ts order) into the running EWMA state."""
    alpha = 0.5
    if state.exists:
        n, ewma = state.get
    else:
        n, ewma = 0, math.nan

    # a key group may arrive as several Arrow chunks in arbitrary order —
    # concatenate ALL chunks before sorting, or the order-dependent fold
    # becomes nondeterministic across chunk boundaries for large groups
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        merged = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        for v in merged.sort_values("ts")["value"]:
            ewma = float(v) if n == 0 else alpha * float(v) + (1 - alpha) * ewma
            n += 1

    state.update((n, ewma))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "ewma": [ewma]})


def stream_ewma(stream_df, key: str = "user_id", ts_col: str = "ts"):
    """Per-key streaming EWMA; emits (key, n_events, ewma) once per key per batch.

    Works only on streaming DataFrames (state requires a streaming query).
    Batch equivalent for tests/oracles: sort by ts and fold — see
    ``ewma_batch``.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream_df.groupBy(key).applyInPandasWithState(
        _ewma_update,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ewma_batch(rows: list, alpha: float = 0.5) -> float:
    """Reference fold for tests: EWMA of values in timestamp order."""
    ewma = math.nan
    for i, v in enumerate(rows):
        ewma = float(v) if i == 0 else alpha * float(v) + (1 - alpha) * ewma
    return ewma
