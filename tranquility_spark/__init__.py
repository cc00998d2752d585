"""tranquility_spark — a PySpark-native analytics engine with the data-processing
capabilities of druid-io/tranquility (streaming ingest: timestamp extraction,
schema application, time bucketing, ingest-time rollup, window-period filters,
partitioning, segment-style sinks), extended with the relational and
LLM-data-pipeline operators a 100 TB training-data platform needs.

Architecture: everything is declared with the DataFrame/SQL API so Catalyst
picks the physical plan (predicate pushdown, partial aggregation, broadcast
joins, AQE). Python UDFs appear only where built-ins genuinely cannot express
the semantics, and then always as Arrow-batched pandas UDFs.

Reference parity map: see SURVEY.md §2 (operator inventory). Reference
citations in docstrings use the public repo layout of druid-io/tranquility
(`path#Symbol` anchors — see SURVEY.md citation caveat).
"""

__version__ = "0.1.0"

from tranquility_spark.specs import (  # noqa: F401
    Count,
    DimensionsSpec,
    DoubleMax,
    DoubleMin,
    DoubleSum,
    Filtered,
    GranularitySpec,
    HyperUnique,
    IngestSpec,
    LongMax,
    LongMin,
    LongSum,
    TimestampSpec,
)
from tranquility_spark.plans.rollup import build_rollup, rollup_oracle_sql  # noqa: F401
from tranquility_spark.specs import Cardinality, Granularity, parse_druid_spec  # noqa: F401
from tranquility_spark.operators.window_filter import two_sided_window_filter  # noqa: F401
from tranquility_spark.operators.partitioning import (  # noqa: F401
    portable_shard,
    rollup_repartition,
    salted_join,
)
from tranquility_spark.sources.files import TABLES, load_all, load_table  # noqa: F401
