"""admission serving + streaming-fold decades (r18) — the serving-side
twin of run_admission_probe's r17 ingest decades.

r17 measured the INGEST loop (per-batch decide+update wall flat as the
registries grow). This probe measures the two r18 additions end to end
at the same decades (sf0.1's 5k docs and /tmp/spark_graft_sf1's 50k —
10 controlled batches each):

1. **Fold-invariance at scale**: the same corpus runs through the sink
   twice — plain and ``compact_every=3`` — and the decisions frames
   must be row-identical (the e2e's invariance assertion, re-checked at
   the decade sizes where a horizon bug would actually bite).
2. **The fold's cost in the cycle walls**: per-batch walls for both
   runs; the folded run's spikes at fold batches ARE the amortized
   maintenance cost the cadence helper trades against probe latency.
3. **Warm serving cost vs registry state**: min-of-3
   ``admission_served_pairs`` wall per family (video at the adm1
   near-miss threshold, text at the loose 0.2, image/audio at gate
   thresholds) served from the UNFOLDED (10 delta partitions) and the
   FOLDED (≤3 partitions) layout — the partition-count overhead the
   fold buys back at serve time, and how serving scales across the
   corpus decade (expected: bound by ADMITTED index rows, not ingest
   volume — the same bound the registries themselves obey).

Grep for the RESULT prefix (the r17 tail-eats-measurement lesson).
Results -> SCALE.md r18 serving addendum.

Usage: python3 scripts/run_admission_serving_probe.py [sf_dir ...]
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

# ADM_PROBE_BATCHES=100 runs the LONG-STREAM leg (the r18 10-batch run
# measured folded-vs-plain serving as a wash; the fold's claim is the
# BOUND, which only bites when a stream accumulates partitions the
# 10-batch run never reaches — same corpus, many more batches)
N_BATCHES = int(os.environ.get("ADM_PROBE_BATCHES", "10"))
COMPACT_EVERY = 3
DEFAULT_DIRS = ["/root/testdata/sf0.1", "/tmp/spark_graft_sf1"]


def main() -> None:
    dirs = sys.argv[1:] or DEFAULT_DIRS
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tranquility_spark.operators.admission import (
        admission_served_pairs,
        admission_sink,
        count_batch_partitions,
    )
    from tranquility_spark.sources.files import load_table

    for sf_dir in dirs:
        if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
            print(f"{sf_dir} missing — regenerate via make_scale_probe.py")
            continue
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        n_docs = docs.count()
        root = tempfile.mkdtemp(prefix="admission_serving_probe_")
        try:
            _probe_one(
                spark, sf_dir, docs, n_docs, root,
                admission_sink, admission_served_pairs, count_batch_partitions,
            )
        finally:
            # the invariance assert firing is exactly when the 50k-doc
            # registry tree must NOT be left behind in /tmp (r18 review)
            shutil.rmtree(root, ignore_errors=True)


def _probe_one(
    spark, sf_dir, docs, n_docs, root,
    admission_sink, admission_served_pairs, count_batch_partitions,
) -> None:
    runs = {}
    for mode, compact_every in (("plain", None), ("folded", COMPACT_EVERY)):
        index_root = os.path.join(root, mode, "idx")
        decisions_dir = os.path.join(root, mode, "decisions")
        sink = admission_sink(
            index_root, decisions_dir, compact_every=compact_every
        )
        walls = []
        for b in range(N_BATCHES):
            batch = docs.filter(F.col("doc_id") % N_BATCHES == b)
            t0 = time.time()
            sink(batch, b)
            walls.append(round(time.time() - t0, 2))
        runs[mode] = (index_root, decisions_dir, walls)

    # 1. fold-invariance at the decade size
    dec = {
        m: spark.read.parquet(d).select("doc_id", "admitted", "reason")
        for m, (_, d, _) in runs.items()
    }
    mismatch = (
        dec["plain"].exceptAll(dec["folded"]).count()
        + dec["folded"].exceptAll(dec["plain"]).count()
    )
    assert mismatch == 0, f"fold changed decisions at {sf_dir}!"
    n_adm = dec["plain"].filter(F.col("admitted") == 1).count()

    # 3. warm serving min-of-3 per family, both layouts
    serve_kw = {
        "video": dict(video_min_shared=1),
        "text": dict(minhash_threshold=0.2),
        "image": {},
        "audio": {},
    }
    report = {}
    for mode, (index_root, _, walls) in runs.items():
        nparts = {
            fam: count_batch_partitions(os.path.join(index_root, fam))
            for fam in serve_kw
        }
        times = {}
        for fam, kw in serve_kw.items():
            best = float("inf")
            n_pairs = -1
            for _ in range(3):
                t0 = time.time()
                n_pairs = admission_served_pairs(
                    spark, index_root, fam, **kw
                ).count()
                best = min(best, time.time() - t0)
            times[fam] = (round(best, 3), n_pairs)
        report[mode] = (walls, nparts, times)

    print(
        f"\nRESULT {sf_dir} ({n_docs} docs, {N_BATCHES} batches, "
        f"admitted={n_adm}, fold_invariant=True):"
    )
    for mode, (walls, nparts, times) in report.items():
        print(f"RESULT   {mode}: cycle_walls={walls}")
        print(
            f"RESULT   {mode}: partitions={nparts} "
            f"serve_min3={{"
            + ", ".join(
                f"{fam}: {t}s/{n} pairs" for fam, (t, n) in times.items()
            )
            + "}"
        )


if __name__ == "__main__":
    main()
