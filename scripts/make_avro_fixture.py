"""Generate tests/fixtures/events_sample.avro from events_sample.csv.

The Avro fixture encodes the SAME 200 logical rows as the committed CSV
fixture (types per files.CSV_EVENTS_SCHEMA, empty fields → NULL → the
["null", T] union's null branch, timestamps → UTC epoch micros), written
as an Object Container File with the null codec and a deterministic sync
marker — rerunning this script is byte-reproducible.

That pairing is what lets the p11 entry carry a REAL DuckDB oracle for a
format DuckDB cannot read: the oracle reads the CSV, Spark decodes the
Avro, and a green hash certifies the two decodes of the same logical data
agree byte-for-byte. The codec itself is anchored against hand-computed
spec byte vectors in tests/test_sources.py (not just round-trips), so an
encoder/decoder pair sharing one spec misreading cannot slip through.
"""

import csv
import os
import sys
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tranquility_spark.operators.avro_codec import write_ocf  # noqa: E402
from tranquility_spark.sources.avro_source import EVENTS_AVRO_SCHEMA  # noqa: E402

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
        reader = csv.DictReader(fh)
        for r in reader:
            ts = datetime.strptime(r["ts"], "%Y-%m-%d %H:%M:%S").replace(
                tzinfo=timezone.utc
            )
            rows.append(
                {
                    "event_id": int(r["event_id"]),
                    "ts": int(ts.timestamp()) * 1_000_000,
                    # empty unquoted CSV fields are NULL in both engines
                    # (the load_csv_events contract) — map '' to the null
                    # union branch for every nullable field
                    "user_id": int(r["user_id"]) if r["user_id"] else None,
                    "event_type": r["event_type"] or None,
                    "value": float(r["value"]) if r["value"] else None,
                    "note": r["note"] or None,
                }
            )
    return rows


def main() -> None:
    rows = _rows()
    out = os.path.join(FIXTURES, "events_sample.avro")
    with open(out, "wb") as fh:
        # two blocks on purpose: the reader's multi-block path (sync-marker
        # verification between blocks) is exercised by the fixture itself
        write_ocf(fh, rows, EVENTS_AVRO_SCHEMA, block_records=128)
    print(f"wrote {len(rows)} records to {out} ({os.path.getsize(out)} bytes)")


# --- v0 fixture (p11b: the schema-evolution read) -------------------------

V0_SCHEMA: dict = {
    "type": "record",
    "name": "Event",
    "fields": [
        # the "last year's producer" shape: 32-bit ids, millis timestamps,
        # a legacy field the current reader dropped, and NO note field yet
        {"name": "event_id", "type": "int"},
        {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-millis"}},
        {"name": "user_id", "type": ["null", "int"], "default": None},
        {"name": "event_type", "type": ["null", "string"], "default": None},
        {"name": "value", "type": ["null", "double"], "default": None},
        {"name": "legacy_tag", "type": "string"},
    ],
}


def make_v0() -> None:
    rows = []
    for r in _rows():
        rows.append(
            {
                "event_id": r["event_id"],
                "ts": r["ts"] // 1000,  # micros -> millis
                "user_id": r["user_id"],
                "event_type": r["event_type"],
                "value": r["value"],
                "legacy_tag": f"v0-{r['event_id']}",
            }
        )
    out = os.path.join(FIXTURES, "events_sample_v0.avro")
    with open(out, "wb") as fh:
        write_ocf(fh, rows, V0_SCHEMA, block_records=128)
    print(f"wrote {len(rows)} v0 records to {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
    make_v0()
