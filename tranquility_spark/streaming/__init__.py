from tranquility_spark.streaming.pipeline import stream_exact_dedup, stream_rollup  # noqa: F401
from tranquility_spark.streaming.sink import SegmentSink  # noqa: F401
from tranquility_spark.streaming.tranquilizer import (  # noqa: F401
    MessageDroppedException,
    SendResult,
    Tranquilizer,
)
