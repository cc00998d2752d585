"""Partitioning operators (D1/D2) + the portable shard hash.

Reference:
- ``core/.../beam/HashPartitionBeam.scala`` + ``partition/HashCodePartitioner.scala``
  (D1): ``event.hashCode % partitions`` routes an event to a partition beam.
- ``core/.../partition/GenericTimeAndDimsPartitioner.scala`` (D2): partition
  key = (queryGranularity-truncated ts, all dim values), so equal rollup keys
  land in one partition, maximizing rollup.

Spark mapping:
- D2 is what Catalyst's hash-partitioned aggregation already does (the shuffle
  key of ``groupBy(trunc(ts), dims)`` IS the rollup key, with map-side partial
  aggregation on top) — ``rollup_repartition`` exists for sinks that want the
  physical layout without an aggregation.
- D1's *observable* output (a shard id column) uses a portable hash defined
  identically in Spark and DuckDB SQL so the oracle can verify it. Spark's own
  ``hash()``/``xxhash64`` are engine-defined, hence unusable in a
  cross-engine-checked result (SURVEY.md §4.2-4).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tranquility_spark.specs import Granularity

# Knuth multiplicative constant; inputs are reduced mod 1e5+3 first so the
# product stays far below 2^63 (DuckDB raises on BIGINT overflow; Spark wraps —
# bounding the operands keeps both engines exact and identical).
_MULT = 2654435761
_REDUCE = 100003
_PRIME = 1000000007


def portable_shard(key: Column, partitions: int) -> Column:
    """Deterministic shard id for any key.

    Integer-valued keys use the engine-portable multiplicative hash (matched
    exactly by ``portable_shard_sql`` for the DuckDB oracle). Non-numeric keys
    (the reference hashes arbitrary ``event.hashCode``) fall back to crc32 of
    the string form — deterministic across runs/executors, but engine-defined,
    so string-keyed shard columns are rows-only checkable (SURVEY.md §4.2-4).
    """
    k = F.coalesce(key.try_cast("long"), F.crc32(key.cast("string").cast("binary")).cast("long"))
    return (F.pmod(F.pmod(k, F.lit(_REDUCE)) * F.lit(_MULT), F.lit(_PRIME)) % partitions).alias(
        "shard"
    )


def portable_shard_sql(key_expr: str, partitions: int) -> str:
    """DuckDB SQL fragment computing the identical shard id.

    DuckDB's ``%`` is sign-preserving while Spark's ``pmod`` is non-negative,
    so the first modulo is wrapped pmod-style (``(x % m + m) % m``) to agree
    on negative keys; every later operand is already non-negative.
    """
    inner = f"((CAST({key_expr} AS BIGINT) % {_REDUCE}) + {_REDUCE}) % {_REDUCE}"
    return f"(({inner} * {_MULT}) % {_PRIME}) % {partitions}"


def with_shard(df: DataFrame, key: str, partitions: int, out: str = "shard") -> DataFrame:
    return df.withColumn(out, portable_shard(F.col(key), partitions))


def rollup_repartition(
    df: DataFrame,
    ts_col: str,
    dims: Sequence[str],
    query_granularity: str | Granularity = "NONE",
    num_partitions: int | None = None,
) -> DataFrame:
    """D2: co-locate equal rollup keys (truncated ts, dims) in one partition.

    At 100 TB this is the layout you want before a sink write so each output
    file holds whole rollup groups; for aggregation itself, skip this — the
    groupBy shuffle already partitions by these keys.
    """
    gran = Granularity(query_granularity) if isinstance(query_granularity, str) else query_granularity
    keys = [gran.truncate(F.col(ts_col)), *[F.col(d) for d in dims]]
    if num_partitions is None:
        return df.repartition(*keys)
    return df.repartition(num_partitions, *keys)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the skewed side, replicate the other.

    The skewed fact side gets a random salt in [0, salt_buckets); the other
    side is replicated ``salt_buckets``× via an exploded literal range, and
    the join key becomes (key, salt) — a hot key now spreads over
    ``salt_buckets`` reducers instead of one. AQE's skew-join handles most
    cases at runtime (leave it on); explicit salting is for the pathological
    keys AQE can't split, e.g. one key ≫ a whole partition after split, or
    non-shuffle-join paths. Cost: the small side is duplicated
    ``salt_buckets``× — keep it the dimension side.
    """
    salted_fact = skewed.withColumn(
        "__salt", (F.rand(seed=0) * salt_buckets).cast("int")
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_fact.join(replicated, [key, "__salt"], how)
    return out.drop("__salt")


def suggest_salt_buckets(
    df: DataFrame,
    key: str,
    num_partitions: int | None = None,
    sample_fraction: float | None = None,
) -> int:
    """Size :func:`salted_join`'s ``salt_buckets`` from the MEASURED knee
    rule instead of guessing (r16, VERDICT r15 #7a — the r15b decade
    swept salt_buckets 1..1024 on a 30%-hot 50M-row join and found a
    full U: salt=1 is 19% WORSE than naive, the knee sits exactly at
    ``hot_key_rows / median_partition_rows``, the plateau after it is
    wide, and past it the replicated-dim shuffle grows linearly until it
    outweighs the fact at 1024; SCALE.md r15b).

    The rule, verbatim from the study: estimate the knee and round UP —
    the plateau makes over-salting free within reason while
    under-salting gives back 20% per halving. ``salt* =
    ceil(hot_key_rows / median_tail_partition_rows)`` with
    ``median_tail_partition_rows ≈ (total - hot) / num_partitions``,
    clamped to [1, num_partitions] (spreading one key across more
    reducers than exist buys nothing, and the study's 256/1024 rows show
    the replication rent past the plateau).

    Costs ONE count aggregation over the fact's key column (map-side
    partial combine; cheap next to the skewed join being tuned). For a
    fact too large even for that, pass ``sample_fraction`` — hot-key
    ratios are exactly what uniform sampling preserves. Returns 1 when
    the key is balanced (hot ≤ one partition's share): at 1 the salting
    rewrite is pure overhead, so callers should fall back to the plain
    join — the helper centralizes the arithmetic, the caller keeps the
    decision.

    NULL keys are EXCLUDED from the estimate (r16 review): an equi-join
    drops them before any reducer sees them, so a NULL-heavy fact (40%
    late-arriving dimension keys is ordinary) would otherwise size the
    salt for skew that never reaches the join — pure replication rent."""
    if num_partitions is None:
        try:
            num_partitions = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
            )
        except ValueError:
            # the conf can hold a non-numeric sentinel ("auto" under some
            # resource managers / AQE-coordinated deployments) — fall back
            # to the cluster's default parallelism rather than crashing a
            # sizing HELPER (ADVICE r16)
            num_partitions = df.sparkSession.sparkContext.defaultParallelism
    probe = df.filter(F.col(key).isNotNull())
    if sample_fraction is not None:
        probe = probe.sample(sample_fraction, seed=0)
    stats = (
        probe.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(
            F.max("__n").alias("__hot"),
            F.sum("__n").alias("__total"),
        )
        .collect()[0]  # bounded: one row of two longs
    )
    hot, total = stats["__hot"], stats["__total"]
    if not total or not hot:
        return 1
    tail_median = max(1.0, (total - hot) / float(num_partitions))
    return max(1, min(num_partitions, math.ceil(hot / tail_median)))


def per_key_topn(
    df: DataFrame,
    key_col: str,
    order_cols: "list[Column]",
    n: int,
    id_col: str,
    salt_buckets: int = 32,
) -> DataFrame:
    """Skew-safe top-N rows per key (two-phase salted rank).

    The single-window form (``row_number() OVER (PARTITION BY key ...)``,
    samp2's shape) sends EVERY row of a key to one reducer — correct until
    one key is a third of the corpus (one domain at open-web scale), where
    that reducer becomes the job. Top-N distributes over any partition of
    a key's rows (the global top-N is a subset of the union of per-slice
    top-Ns), so phase 1 ranks within ``(key, salt)`` — the hot key spreads
    over ``salt_buckets`` reducers, each keeping at most ``n`` — and
    phase 2 re-ranks at most ``salt_buckets * n`` survivors per key. The
    salt is a deterministic hash of ``id_col`` (NOT rand(): retries and
    re-runs must land every row in the same bucket for reproducible
    output). Result is row-identical to the single-window form for any
    total ordering — ``order_cols`` must end in a unique tie-break, the
    catalog-wide LIMIT policy (equality asserted in tests; the
    samp6_source_cap oracle certifies it against the window-SQL form
    cross-engine).
    """
    if n < 1 or salt_buckets < 1:
        raise ValueError("n and salt_buckets must be >= 1")
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
    w1 = Window.partitionBy(F.col(key_col), salt).orderBy(*order_cols)
    survivors = (
        df.withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= n)
        .drop("__rn1")
    )
    w2 = Window.partitionBy(key_col).orderBy(*order_cols)
    return (
        survivors.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= n)
    )


def epoch_shuffle(
    df: DataFrame,
    key: str,
    seed: int,
    n_shards: int,
    m: int = 1000003,
    portable: bool = False,
) -> DataFrame:
    """Deterministic global shuffle for training-data epochs.

    Assigns every row a (shard, pos) — the output file and the position
    within it — from a seeded hash of its key, so the "random" training
    order is reproducible across runs, retries and repartitioning (the
    property ``rand()`` lacks), and each seed yields a different
    permutation for its epoch.

    Default path: ``xxhash64(string(key), seed)`` — full 64-bit ord_key
    space, any key type (string doc ids included), every shard occupied at
    any scale. This is the 100 TB path: ``n_shards`` = number of output
    files, sized so a shard fits an executor (100 TB / 512 MB ≈ 200k
    shards — which NEEDS the 64-bit keyspace, see below).

    COMPATIBILITY BREAK (round 5): the default hash changed from the
    portable multiplicative hash to xxhash64, so a given (key, seed)
    yields an entirely different (shard, pos) than earlier versions —
    within-run determinism holds, but epoch permutations recorded before
    the change do not reproduce under the new default. Pass
    ``portable=True`` to recover the old assignments.

    ``portable=True``: the engine-portable multiplicative hash, bit-exact
    reproducible in ANSI SQL (the DuckDB oracle entries use it). Its
    mod-100,003 pre-reduction caps ord_key at ``m`` distinct values, so
    shard counts beyond ~100k leave shards permanently empty and the
    permutation weakens for corpora ≫ 100k docs — cross-engine
    verification only, never the production default. The seed is folded
    AFTER the key is normalized to a long (try_cast, else crc32 of the
    string form), so string keys shuffle instead of collapsing to a NULL
    shard under numeric coercion.

    Shape at 100 TB (both paths): the hash is a narrow projection; the one
    shuffle is the window's partition-by-shard exchange — exactly the data
    movement a shuffled-dataset write requires anyway — and the
    within-shard sort is the shuffle-write sort.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if portable:
        k = F.coalesce(
            F.col(key).try_cast("long"),
            F.crc32(F.col(key).cast("string").cast("binary")).cast("long"),
        )
        ord_key = portable_shard(k + F.lit(seed), m)
    else:
        ord_key = F.xxhash64(F.col(key).cast("string"), F.lit(seed)).alias("ord_key")
    w = Window.partitionBy("shard").orderBy("ord_key", key)
    return (
        df.withColumn("ord_key", ord_key)
        .withColumn("shard", F.pmod(F.col("ord_key"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(w))
    )
