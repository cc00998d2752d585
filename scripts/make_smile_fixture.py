"""Generate tests/fixtures/events_sample.smile from events_sample.csv.

Same pairing discipline as make_avro_fixture.py: the Smile fixture
encodes the SAME 200 logical rows as the committed CSV fixture (one
stream, back-to-back records, shared property names — the Jackson
event-sequence shape), so the p12 entry oracles Spark's Smile decode
against DuckDB's read of the CSV. The codec itself is anchored to
hand-computed spec token vectors in tests/test_sources.py. Timestamps
encode as int64 epoch micros (Smile has no timestamp type; the source
layer converts per the events schema). Byte-reproducible.
"""

import csv
import os
import sys
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tranquility_spark.operators.smile_codec import encode_stream  # noqa: E402

FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
)


def _rows() -> list[dict]:
    rows = []
    with open(
        os.path.join(FIXTURES, "events_sample.csv"), newline="", encoding="utf-8"
    ) as fh:
        for r in csv.DictReader(fh):
            ts = datetime.strptime(r["ts"], "%Y-%m-%d %H:%M:%S").replace(
                tzinfo=timezone.utc
            )
            rows.append(
                {
                    "event_id": int(r["event_id"]),
                    "ts": int(ts.timestamp()) * 1_000_000,
                    "user_id": int(r["user_id"]) if r["user_id"] else None,
                    "event_type": r["event_type"] or None,
                    "value": float(r["value"]) if r["value"] else None,
                    "note": r["note"] or None,
                }
            )
    return rows


def main() -> None:
    rows = _rows()
    out = os.path.join(FIXTURES, "events_sample.smile")
    data = encode_stream(rows, shared_names=True)
    with open(out, "wb") as fh:
        fh.write(data)
    print(f"wrote {len(rows)} records to {out} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
