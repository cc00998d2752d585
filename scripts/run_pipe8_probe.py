"""pipe8 composition decades (r16) — the cross-family pipeline's own
scale measurement.

The fixture entry certifies CORRECTNESS of the five-gate composition
(constant-oracle booleans, three SFs). This probe answers the 100 TB
question: does the COMPOSED decide pass hold when the corpus grows
100×, with every gate reading its persisted index? Three corpora:
sf0.1 (5k docs), /tmp/spark_graft_sf1 (50k), /tmp/spark_graft_sf10
(500k — regenerate via make_scale_probe.py with
SPARK_GRAFT_PROBE_TABLES=documents,events if /tmp was wiped).

Per corpus:
- ingest: first-touch build walls for the five indexes (content-hash,
  MinHash LSH, dHash, audio-fp, video-frame) — paid once, cached on
  disk by corpus digest;
- decide: min-of-3 wall for the full composed pass (4 CC gates + 5
  audits) with the video gate at max_df=64, the production setting the
  r15b video study prescribes;
- booleans: the same five contract booleans the entry certifies — the
  probe asserts ALL true at every size (correctness does not decay
  with scale);
- guard demo at 500k: the UNCAPPED video gate must RAISE via
  _VIDEO_UNCAPPED_DF_LIMIT at exactly the corpus size where the r15b
  study measured join divergence (max df 20,088 > 4096). The probe
  asserts the raise fires (bounded by the guard, not by divergence).

Results -> SCALE.md.

Usage: python3 scripts/run_pipe8_probe.py [sf_dir ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

DEFAULT_DIRS = [
    "/root/testdata/sf0.1",
    "/tmp/spark_graft_sf1",
    "/tmp/spark_graft_sf10",
]


def main() -> None:
    dirs = sys.argv[1:] or DEFAULT_DIRS
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        # the decade corpora need real heap (the audio/video probes'
        # setting; the 1g default OOMs reading the 50k minhash index)
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tranquility_spark.catalog_llm import (
        _audio_fp_index_table,
        _content_hash_index_table,
        _dhash_index_table,
        _minhash_index_table,
        _pipe8_decide,
        _video_index_table,
    )

    # warm UDF workers once (the r15b probe lesson: cold-worker spin-up
    # contaminates the first timed row by ~8 s)
    spark.range(1000).select(F.sum(F.col("id"))).count()

    for sf_dir in dirs:
        if not os.path.isdir(sf_dir):
            print(f"{sf_dir}: MISSING (regenerate via make_scale_probe.py)")
            continue
        n_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
        print(f"\n=== {sf_dir} ({n_docs} docs) ===")
        builds = {}
        for kind, fn in (
            ("cxhash", _content_hash_index_table),
            ("minhash", _minhash_index_table),
            ("dhash", _dhash_index_table),
            ("audio", _audio_fp_index_table),
            ("video", _video_index_table),
        ):
            t0 = time.time()
            fn(spark, sf_dir)  # first touch builds; later touches register
            builds[kind] = round(time.time() - t0, 2)
        print("index builds (first touch):", builds)

        best = float("inf")
        row = None
        for _ in range(3):
            t0 = time.time()
            row = _pipe8_decide(spark, sf_dir, video_max_df=64).collect()[0]
            best = min(best, time.time() - t0)
        bools = row.asDict()
        print(f"decide pass (video max_df=64): {best:.2f} s  booleans={bools}")
        assert all(v == 1 for v in bools.values()), f"contract violated: {bools}"

        if n_docs >= 100_000:
            # the structural guard must fire where the r15b study
            # measured divergence — bounded by the raise, not by the job
            t0 = time.time()
            try:
                _pipe8_decide(spark, sf_dir, video_max_df=None).collect()
                raise AssertionError(
                    "uncapped 500k run completed — the df guard did not fire"
                )
            except AssertionError:
                raise
            except Exception as exc:  # noqa: BLE001 — the raise IS the pass
                msg = str(exc)
                assert "max_df" in msg or "diverges" in msg, msg[:300]
                print(
                    f"uncapped guard fired in {time.time() - t0:.2f} s "
                    "(loud raise, not divergence) ✓"
                )

    spark.stop()


if __name__ == "__main__":
    main()
