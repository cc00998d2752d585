"""Delta-compaction cadence knee (r17) — how many deltas before folding.

pipe11 serves base+delta; pipe12 folds the delta into the base. The
production question between them is CADENCE: each admission cycle adds
one batch-sized delta index, and probing costs one extra bucket join per
accumulated delta — at what delta count D does the accumulated per-cycle
probe overhead justify paying the compaction write? (The salt-buckets
study's shape: measure the knee, prescribe the rule.)

Method (MinHash family, 50k-doc corpus /tmp/spark_graft_sf1; falls back
to sf0.1's 5k docs):

- base = the persisted 80% registry band index (bucketed table);
- the 20% batch splits into 9 equal slices by id arithmetic: slice 0 is
  the fixed PROBE batch, slices 1..8 become small delta band-row
  parquets (written + read back, the production delta shape) — probe
  and deltas DISJOINT, since production gates a batch before it can
  become a delta;
- per cycle i: the probe batch is SIGNATURED ONCE (lsh_band_index +
  localCheckpoint — the per-cycle fixed cost production pays anyway),
  then joined against base and against each of the i accumulated
  deltas. The script mirrors incremental_neardup_pairs' probe join
  (band+bhash equi-join, canonical pair, estimate filter) on the
  pre-banded frame so the D-delta marginal cost is the JOIN only —
  calling the operator D times would re-shingle the batch D times and
  bias the knee early;
- compaction cost = the bucketed row-union write (pipe12's shape),
  measured once; post-compaction probe cost = base'-only join.

Output: per-D probe walls, the compaction wall, and the break-even
cadence D* = ceil(compact_wall / marginal delta-join cost), with the
marginal taken as the endpoint average (walls[8] - walls[0]) / 8 —
fold every D* cycles. Results -> SCALE.md r17.

Usage: python3 scripts/run_compaction_cadence_probe.py [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

N_DELTAS = 8


def probe_join(new_banded, index_df, num_hashes, threshold):
    """incremental_neardup_pairs' index-probe join, replicated on a
    PRE-BANDED new frame (operators/dedup.py cand_old shape) so the
    signature pass is paid once per cycle, not once per delta."""
    from tranquility_spark.operators.dedup import _estimate_and_filter

    cand = (
        new_banded.alias("l")
        .join(
            index_df.select("id", "sig", "band", "bhash").alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bhash") == F.col("r.bhash"))
            & (F.col("l.id") != F.col("r.id")),
        )
        .select(
            F.least("l.id", "r.id").alias("id_a"),
            F.greatest("l.id", "r.id").alias("id_b"),
            F.when(F.col("l.id") < F.col("r.id"), F.col("l.sig"))
            .otherwise(F.col("r.sig"))
            .alias("sig_a"),
            F.when(F.col("l.id") < F.col("r.id"), F.col("r.sig"))
            .otherwise(F.col("l.sig"))
            .alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return _estimate_and_filter(cand, num_hashes, threshold)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else (
        "/tmp/spark_graft_sf1"
        if os.path.exists("/tmp/spark_graft_sf1/documents.parquet")
        else "/root/testdata/sf0.1"
    )
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import tranquility_spark.operators.dedup as dd
    from tranquility_spark.catalog_llm import (
        _MINHASH_INDEX_PARAMS as P,
        _minhash_registry_table,
        _t,
    )
    from tranquility_spark.sources.bucketed import write_bucketed

    docs = _t(spark, sf_dir, "documents")
    base = spark.table(_minhash_registry_table(spark, sf_dir))
    num_hashes, threshold = P["num_hashes"], 0.5

    # N_DELTAS + 1 slices of the 20% batch: slice 0 is the PROBE batch,
    # slices 1..N are the deltas — DISJOINT (r17 review: an earlier draft
    # reused slice 0 as delta_0, so every D>=1 cycle near-self-joined the
    # probe batch against its own band rows, a shape production never
    # runs — a batch is gated BEFORE becoming a delta)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    sub = [
        batch.filter((F.col("doc_id") / 5).cast("long") % (N_DELTAS + 1) == i)
        for i in range(N_DELTAS + 1)
    ]
    import tempfile

    root = tempfile.mkdtemp(prefix="cadence_")
    deltas = []
    for i, s in enumerate(sub[1:]):
        path = os.path.join(root, f"delta_{i}")
        dd.lsh_band_index(s, **P).write.parquet(path)
        deltas.append(spark.read.parquet(path))

    probe_docs = sub[0]  # fixed probe batch; deltas accumulate behind it
    banded = dd.lsh_band_index(probe_docs, **P).localCheckpoint(eager=True)

    def cycle_wall(n_deltas: int) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            total = probe_join(banded, base, num_hashes, threshold).count()
            for d in deltas[:n_deltas]:
                total += probe_join(banded, d, num_hashes, threshold).count()
            best = min(best, time.time() - t0)
        return best

    print(f"corpus={sf_dir} probe_batch={probe_docs.count()} docs")
    print("accumulated_deltas | per_cycle_probe_wall_s")
    walls = {}
    for n in (0, 1, 2, 4, 8):
        walls[n] = cycle_wall(n)
        print(f"{n:18d} | {walls[n]:.2f}")

    # compaction: base + all 8 deltas row-union, bucketed write
    union = base
    for d in deltas:
        union = union.unionByName(d)
    t0 = time.time()
    write_bucketed(
        union, "cadence_compacted", ["band", "bhash"], 8,
        path=os.path.join(root, "compacted"),
    )
    compact_wall = time.time() - t0
    post = float("inf")
    for _ in range(3):
        t0 = time.time()
        probe_join(
            banded, spark.table("cadence_compacted"), num_hashes, threshold
        ).count()
        post = min(post, time.time() - t0)
    marginal = (walls[8] - walls[0]) / 8.0
    # the knee rule lives in the library since r18 (VERDICT r17 #5) — the
    # probe feeds its own measurements through the helper deployments use
    dstar = dd.suggest_compaction_cadence(compact_wall, max(marginal, 1e-9))
    print(f"compaction_write_s={compact_wall:.2f}")
    print(f"post_compaction_probe_s={post:.2f}")
    print(f"marginal_delta_join_s={marginal:.3f}")
    print(f"break_even_cadence_D*={dstar} cycles")


if __name__ == "__main__":
    main()
