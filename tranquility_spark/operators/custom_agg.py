"""Custom user-defined aggregation (A9: the `javascript` aggregator analog).

Reference: Druid ``JavaScriptAggregatorFactory`` in metricsSpec — arbitrary
user fold/combine snippets over event fields (deprecated in Druid but accepted
by the spec). Spark mapping: an Arrow-batched GROUPED_AGG pandas UDF — the
batch arrives as a pandas Series, the fold is vectorized numpy, and Spark
handles partial aggregation per partition before the shuffle.

NOTE: no ``from __future__ import annotations`` here — pyspark resolves the
pandas UDF type hints at decoration time and needs real types, not strings.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def fold_floor_sum(v: pd.Series) -> int:
    """Example user fold: sum of floor(value) — exact integer arithmetic so
    the DuckDB oracle can hash-check it (SURVEY.md §2.4 A9 policy)."""
    return int(np.floor(v.to_numpy()).astype("int64").sum())


@pandas_udf("long")
def fold_count(v: pd.Series) -> int:
    """Count fold (Spark forbids mixing GROUPED_AGG pandas UDFs with built-in
    aggregates in one agg(), so the count is a pandas fold too)."""
    return int(len(v))
