"""Regenerate tranquility_spark/certified_fingerprints.json.

Run this ONLY when folding a new round's driver-green keys into
``catalog._CERTIFIED`` (i.e. in the same commit that edits the ledger).
Running it to silence a fingerprint-mismatch test failure defeats the
staleness guard — that failure means a certified entry's fn or oracle
changed and the entry must be rotated back into the driver window instead.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tranquility_spark.catalog import _CERTIFIED, certification_fingerprint  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tranquility_spark",
    "certified_fingerprints.json",
)


def main() -> None:
    fingerprints = {k: certification_fingerprint(k) for k in sorted(_CERTIFIED)}
    with open(OUT, "w", encoding="utf-8") as fh:
        json.dump(fingerprints, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {len(fingerprints)} fingerprints to {OUT}")


if __name__ == "__main__":
    main()
