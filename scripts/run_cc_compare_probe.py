"""CC algorithm comparison (r17) — pointer doubling vs alternating
large-star/small-star on diverse graph topologies.

The r16 chain-decade probe (run_cc_probe.py) measured _cc_pointer_doubling
on the topology that is WORST for label propagation (a pure chain) and
best-case-flat (dense blobs). HANDOFF r16 flagged the open question: would
the GraphFrames-style alternating large-star/small-star algorithm (Kiveris
et al., SoCC'14 — O(log^2 n) rounds, edge-set rewriting) beat the
Shiloach–Vishkin-style hooking + pointer jumping (log4(diameter) rounds,
fixed edge set) on DENSER or mixed topologies? This probe answers it with
measurements instead of citations.

Topologies (all seeded/deterministic):

- chain 1000       — diameter 999; pointer doubling's worst case;
- blobs 50x40      — 50 components of 40 docs with FULL intra-cluster pair
                     sets (39k edges, diameter 1) — the shape real near-dup
                     families have;
- random 20k/30k   — sparse Erdős–Rényi-ish (n=20k, m=30k, seed 7): mixed
                     component sizes and diameters, the organic shape;
- star 1x50k       — one hub, 50k leaves: max-degree stress (the hub's
                     neighborhood materializes in large-star's groupBy);
- lollipop 200+200 — a 200-clique with a 200-node chain hanging off it:
                     dense core + long tail in ONE component.

Per (topology, algorithm): rounds, wall seconds (graph build excluded;
label collect included), and a label-equality assertion between the two
algorithms — correctness is a precondition of the comparison, not a claim.

Results -> SCALE.md r17. The production CC stays whichever wins; the loser
stays in the tree as the documented study arm.

Usage: python3 scripts/run_cc_compare_probe.py
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def topologies() -> "dict[str, list[tuple[int, int]]]":
    random.seed(7)
    tops: dict[str, list[tuple[int, int]]] = {}
    tops["chain_1000"] = [(i, i + 1) for i in range(999)]
    blob = []
    for c in range(50):
        base = c * 1000
        members = [base + i for i in range(40)]
        blob += [
            (members[i], members[j])
            for i in range(40)
            for j in range(i + 1, 40)
        ]
    tops["blobs_50x40"] = blob
    n, m = 20_000, 30_000
    rnd = set()
    while len(rnd) < m:
        a, b = random.randrange(n), random.randrange(n)
        if a != b:
            rnd.add((min(a, b), max(a, b)))
    tops["random_20k_30k"] = sorted(rnd)
    tops["star_1x50k"] = [(0, i) for i in range(1, 50_001)]
    lolli = [
        (i, j) for i in range(200) for j in range(i + 1, 200)
    ]  # 200-clique
    lolli += [(199 + i, 200 + i) for i in range(200)]  # chain off node 199
    tops["lollipop_200c_200ch"] = lolli
    return tops


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tranquility_spark.operators.dedup import (
        _cc_alternating_star,
        _cc_pointer_doubling,
    )

    print(
        "topology | edges | pd_rounds | pd_wall_s | star_rounds | "
        "star_wall_s | labels_equal"
    )
    for name, es in topologies().items():
        pairs = spark.createDataFrame(
            es, "id_a bigint, id_b bigint"
        ).localCheckpoint(eager=True)
        n_edges = pairs.count()

        t0 = time.time()
        pd_labels, pd_rounds, _ = _cc_pointer_doubling(pairs)
        pd_map = {r.id: r.cluster_id for r in pd_labels.collect()}
        pd_wall = time.time() - t0

        t0 = time.time()
        st_labels, st_rounds = _cc_alternating_star(pairs)
        st_map = {r.id: r.cluster_id for r in st_labels.collect()}
        st_wall = time.time() - t0

        equal = pd_map == st_map
        print(
            f"{name} | {n_edges} | {pd_rounds} | {pd_wall:.2f} | "
            f"{st_rounds} | {st_wall:.2f} | {equal}"
        )
        assert equal, f"{name}: label mismatch between the two algorithms"


if __name__ == "__main__":
    main()
