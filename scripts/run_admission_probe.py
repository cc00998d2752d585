"""admission_sink growth decades (r17) — the streaming gate's own scale
measurement.

The e2e test certifies the sink's CORRECTNESS (decisions tile, no
coadmitted near-dups, registry purity, served == rebuilt, replay). This
probe answers the steady-state question: as the ADMITTED-ONLY registries
grow batch over batch, does the per-batch decide+update wall stay
batch-shaped, or does registry growth leak into the cycle cost?

Per corpus (sf0.1's 5k docs in 10 batches of ~500; /tmp/spark_graft_sf1's
50k docs in 10 batches of ~5k — the decade), batches sliced by id
arithmetic and fed to the foreachBatch callable directly (controlled
batch composition, no file-source nondeterminism):

- per-batch wall for the FULL cycle (five signature passes + gates +
  one CC + decisions write + five index appends);
- accumulated registry rows after each batch (admitted-only — growth is
  bounded by admitted volume, not ingest volume);
- final sanity: decisions tile the corpus, admitted fraction printed.

Expected shape: wall ≈ flat in batch index (the registries are probed
through banded buckets; the CC graph is intra-batch-sized), with the
media mapInPandas signature passes dominating — i.e. the cost of a
cycle is the cost of SIGNING the batch, which is the production claim.
Results -> SCALE.md r17.

Usage: python3 scripts/run_admission_probe.py [sf_dir ...]
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

N_BATCHES = 10
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

    from tranquility_spark.operators.admission import admission_sink
    from tranquility_spark.sources.files import load_table

    for sf_dir in dirs:
        if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
            print(f"{sf_dir} missing — regenerate via make_scale_probe.py")
            continue
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        n_docs = docs.count()
        root = tempfile.mkdtemp(prefix="admission_probe_")
        index_root = os.path.join(root, "idx")
        decisions_dir = os.path.join(root, "decisions")
        sink = admission_sink(index_root, decisions_dir)

        walls = []
        for b in range(N_BATCHES):
            batch = docs.filter(F.col("doc_id") % N_BATCHES == b)
            t0 = time.time()
            sink(batch, b)
            walls.append(time.time() - t0)

        decisions = spark.read.parquet(decisions_dir)
        assert decisions.count() == n_docs
        n_adm = decisions.filter(F.col("admitted") == 1).count()
        reg_rows = {
            fam: spark.read.parquet(os.path.join(index_root, fam)).count()
            for fam in ("exact", "text", "image", "audio", "video")
        }
        print(
            f"RESULT {sf_dir} ({n_docs} docs, {N_BATCHES} batches): "
            f"walls={[round(w, 2) for w in walls]} "
            f"admitted={n_adm} ({100.0 * n_adm / n_docs:.1f}%) "
            f"final_registry_rows={reg_rows}"
        )
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
