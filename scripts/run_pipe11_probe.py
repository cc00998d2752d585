"""pipe11/pipe12 decades (r17) — the registry-update loop's own scale
measurement (the pipe8-probe discipline on the new entries).

pipe11 certifies CORRECTNESS of two admission cycles with a registry
update (constant-oracle booleans, three SFs); pipe12 certifies the
delta→base compaction. This probe answers the 100 TB question: does the
per-cycle cost stay batch-shaped as the corpus grows 10×, and where does
the composition hit its documented bound?

Corpora: sf0.1 (5k docs) and /tmp/spark_graft_sf1 (50k — regenerate via
make_scale_probe.py if /tmp was wiped). Per corpus:

- first_touch: wall of the first pipe11 run (pays any registry-index
  builds this box hasn't cached for the corpus digest, plus the
  mhcompact write for pipe12);
- decide: min-of-3 wall for pipe11 and pipe12 with all layouts warm;
- booleans: asserted ALL 1 at every size (correctness does not decay).
  Since the r18 headline/certification split (VERDICT r17 #2) the
  counterfactual-rerun and rebuild-equality booleans live in
  pipe11b/pipe12b — asserted once per corpus here (no min-of-3: they
  are certification passes, not the production cost being measured).

At /tmp/spark_graft_sf10 (500k) the probe asserts the composed ctx
RAISES via `_VIDEO_UNCAPPED_DF_LIMIT`: pipe11/pipe12's cross-family
cycle calls dd30's UNCAPPED video probe verbatim, and the 500k video
registry carries the 20,088-df boilerplate digest the r15b study
measured as divergent — the loop is bounded by the structural guard,
loudly, not by join divergence. The capped escape hatch then runs
pipe13 (r18): per-cycle snapshot probes with the production
video_max_df=64, the driver-certified composition — not the r17 ctx
hook, whose one-pass df reuse was non-certifiable by design.

Results -> SCALE.md r17 (decades), r18 (pipe13 swap).

Usage: python3 scripts/run_pipe11_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

MEASURE_DIRS = ["/root/testdata/sf0.1", "/tmp/spark_graft_sf1"]
GUARD_DIR = "/tmp/spark_graft_sf10"


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tranquility_spark.catalog_llm import (
        pipe11_registry_update_cycles,
        pipe11b_update_cycle_probes,
        pipe12_registry_compaction,
        pipe12b_compaction_probes,
        pipe13_capped_update_cycles,
        pipe13b_capped_cycle_probes,
    )

    print("corpus | entry | first_touch_s | decide_min3_s | booleans")
    for sf_dir in MEASURE_DIRS:
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        for name, fn in (
            ("pipe11", pipe11_registry_update_cycles),
            ("pipe12", pipe12_registry_compaction),
            ("pipe13", pipe13_capped_update_cycles),
        ):
            t0 = time.time()
            row = fn(spark, sf_dir).collect()[0]
            first = time.time() - t0
            assert all(v == 1 for v in row.asDict().values()), (
                f"{sf_dir} {name}: boolean failed: {row}"
            )
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                fn(spark, sf_dir).collect()
                best = min(best, time.time() - t0)
            print(
                f"{sf_dir} ({n_docs} docs) | {name} | {first:.1f} | "
                f"{best:.2f} | all 1"
            )
        # certification entries: booleans only (one run — they are the
        # expensive correctness passes the headline split out, not the
        # production cost this probe measures)
        for name, fn in (
            ("pipe11b", pipe11b_update_cycle_probes),
            ("pipe12b", pipe12b_compaction_probes),
            ("pipe13b", pipe13b_capped_cycle_probes),
        ):
            t0 = time.time()
            row = fn(spark, sf_dir).collect()[0]
            wall = time.time() - t0
            assert all(v == 1 for v in row.asDict().values()), (
                f"{sf_dir} {name}: boolean failed: {row}"
            )
            print(
                f"{sf_dir} ({n_docs} docs) | {name} | {wall:.1f} | "
                f"(certification, single run) | all 1"
            )

    if os.path.exists(f"{GUARD_DIR}/documents.parquet"):
        # the completed-without-raising sentinel must live OUTSIDE the
        # try (r17 review: an inner AssertionError whose message mentions
        # the guard would be swallowed by the same except and pass the
        # substring check — the leg could never fail)
        guard_msg = None
        try:
            pipe11_registry_update_cycles(spark, GUARD_DIR).collect()
        except Exception as exc:  # noqa: BLE001 — asserting the guard
            guard_msg = str(exc)
        assert guard_msg is not None, (
            "500k: pipe11 completed — expected the _VIDEO_UNCAPPED_DF_LIMIT"
            " raise"
        )
        # match the guard's OWN raise text (ADVICE r17 #2 — a loose
        # 'video' substring would let an unrelated failure, e.g. a
        # missing registry table at GUARD_DIR, pass as the guard):
        # both raise branches in _video_pairs_core / the incremental
        # probe emit "(> {limit})" and end "offending fhash=<hex>"
        from tranquility_spark.operators.dedup import _VIDEO_UNCAPPED_DF_LIMIT

        assert (
            f"(> {_VIDEO_UNCAPPED_DF_LIMIT})" in guard_msg
            and "offending fhash=" in guard_msg
        ), f"500k raised, but not the video df guard: {guard_msg[:300]}"
        print(f"{GUARD_DIR} (500k) | pipe11 | GUARD RAISED (bounded, loud)")

        # the capped escape hatch, r18 form: pipe13's PER-CYCLE snapshot
        # composition (driver-certified at 3 SFs) lets the SAME loop run
        # past the guard's bound — video_max_df=64 is the r15b-prescribed
        # production cap. (The r17 leg ran _pipe11_impl with the capped
        # ctx hook, whose one-pass df reuse was documented as
        # non-certifiable; pipe13 replaced it.)
        from tranquility_spark.catalog_llm import _pipe13_impl

        t0 = time.time()
        row = _pipe13_impl(spark, GUARD_DIR, video_max_df=64).collect()[0]
        first = time.time() - t0
        assert all(v == 1 for v in row.asDict().values()), (
            f"500k capped: boolean failed: {row}"
        )
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            _pipe13_impl(spark, GUARD_DIR, video_max_df=64).collect()
            best = min(best, time.time() - t0)
        print(
            f"{GUARD_DIR} (500k) | pipe13 capped(video_max_df=64) | "
            f"{first:.1f} | {best:.2f} | all 1"
        )

        # the certification split's booleans also hold at 500k (single
        # run — per-cycle-population equality + cap engagement)
        from tranquility_spark.catalog_llm import _pipe13b_impl

        t0 = time.time()
        row = _pipe13b_impl(spark, GUARD_DIR, video_max_df=64).collect()[0]
        wall = time.time() - t0
        assert all(v == 1 for v in row.asDict().values()), (
            f"500k capped pipe13b: boolean failed: {row}"
        )
        print(
            f"{GUARD_DIR} (500k) | pipe13b capped(video_max_df=64) | "
            f"{wall:.1f} | (certification, single run) | all 1"
        )
    else:
        print(f"{GUARD_DIR} missing — regenerate via make_scale_probe.py")


if __name__ == "__main__":
    main()
