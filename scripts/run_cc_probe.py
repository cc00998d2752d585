"""Connected-components diameter decades (r16) — the pointer-doubling
rewrite's own scale measurement (VERDICT r15 #2's "Done" condition).

neardup_survivors_converged's r15 form propagated the min label ONE hop
per round, so an adversarial chain made round count (and wall time)
linear in graph diameter: sf0.1's 39-hop video chain cost 39 rounds of
join+groupBy+checkpoint+count = the suite's long pole at 16.3 s. The
r16 _cc_pointer_doubling form hooks trees together and pointer-jumps
twice per round, so the label frontier moves ~4x the distance each
round — round count should grow as LOG of the diameter, not linearly.

This probe builds pure chain graphs (the worst case: diameter = n-1,
every round's frontier fully serialized) at decade lengths and records:

- rounds: doubling rounds actually used (the helper's own counter);
- wall: end-to-end _cc_pointer_doubling + a full label collect;
- labels_ok: every node resolved to the single component min (0).

Plus the same chain through the OLD one-hop loop (neardup_clusters with
an explicit diameter-sized budget) for the linear-vs-log comparison —
at chain 1000 the old loop's 999 rounds are prohibitive, so the old
form is only timed up to the length where a run stays under ~2 min.

Usage: python3 scripts/run_cc_probe.py [chain_len ...]
       (default: 10 100 1000)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

OLD_FORM_MAX_CHAIN = 100  # 999 one-hop rounds would run for many minutes


def main() -> None:
    lens = [int(a) for a in sys.argv[1:]] or [10, 100, 1000]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tranquility_spark.operators.dedup import (
        _cc_pointer_doubling,
        neardup_clusters,
    )

    print("chain_len | doubling_rounds | doubling_wall_s | old_onehop_wall_s")
    for n in lens:
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "id_a bigint, id_b bigint"
        ).localCheckpoint(eager=True)

        t0 = time.time()
        labels, rounds = _cc_pointer_doubling(pairs)
        got = {r.cluster_id for r in labels.collect()}
        wall = time.time() - t0
        assert got == {0}, f"chain {n}: wrong labels {sorted(got)[:5]}"

        old_wall = None
        if n <= OLD_FORM_MAX_CHAIN:
            t0 = time.time()
            old = neardup_clusters(pairs, max_iterations=n)
            old_got = {r.cluster_id for r in old.collect()}
            old_wall = time.time() - t0
            assert old_got == {0}, f"old form chain {n}: wrong labels"

        print(
            f"{n:9d} | {rounds:15d} | {wall:15.2f} | "
            + (f"{old_wall:.2f}" if old_wall is not None else "skipped (linear rounds)")
        )

    spark.stop()


if __name__ == "__main__":
    main()
