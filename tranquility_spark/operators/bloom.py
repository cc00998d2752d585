"""Bloom-filter membership as a RELATIONAL sketch (mergeable family #4).

The classic ingest-scale question — "have we already seen this key?" — needs
an approximate membership structure whose build, merge, and probe all stay
distributed. Instead of an opaque byte-blob UDF sketch, the filter here is a
SPARSE BITMAP TABLE: one row per 63-bit word that has any bit set,

    (word_idx BIGINT, word BIGINT)

which makes every lifecycle step a plain relational operation that Catalyst
can optimize:

- build  — explode each key into its k bit positions, two-phase
  ``groupBy(word_idx).agg(bit_or(mask))``; the exchange carries at most
  ``ceil(m_bits/63)`` rows per partition (kilobytes), never the corpus.
- merge  — union of word tables + the same ``bit_or`` groupBy. Bit-identical
  to building directly on the concatenated data (OR is associative and
  commutative), the same contract as the KMV / Misra-Gries / quantile
  partials in this package.
- probe  — the word table is bounded by ``ceil(m_bits/63)`` rows (1041 words
  for m=65536, not 1024 — 63 usable bits per word) regardless of how
  many keys were inserted, so it folds into a ONE-ROW broadcast map and the
  membership test is a narrow per-row projection over the probe frame:
  no explode, no join shuffle, no groupBy. Probing 100 TB costs one scan.

Guarantees: no false negatives ever (every inserted key's bits are set);
false-positive rate ~ (1 - e^(-k*n/m))^k for n inserted keys.

Hashing (mirrors ``operators/partitioning.py`` policy): the default is
``xxhash64(key, i)`` — engine-defined but full-64-bit, the production path.
``hash_fn="portable"`` switches to the cross-engine multiplicative hash so a
DuckDB oracle can rebuild the IDENTICAL filter and the driver can
hash-certify build+probe end-to-end (``bloom_pos_sql`` emits the matching
SQL). The portable variant pre-reduces keys mod 100003, so keys congruent
mod 100003 alias — acceptable for certification fixtures, not the default.

Word layout: 63 usable bits per word (``_WORD_BITS``) — DuckDB raises on
``1::BIGINT << 63`` while Spark wraps to the sign bit, so capping the shift
at 62 keeps mask construction exact and identical on both engines. The
membership test is ``(word & mask) != 0`` — no right-shift of the word —
because ``&`` and ``!= 0`` are two's-complement-identical across engines
while ``>>`` semantics (arithmetic vs logical) are not.

Reference note: the reference (tranquility) has no membership sketch; this
is a training-data-pipeline extension per the build brief (dedup family).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tranquility_spark.operators.partitioning import _MULT, _PRIME, _REDUCE

# per-hash-index offset: a prime stride decorrelates the k portable hashes
_STRIDE = 7919

# usable bits per BIGINT word: shifts stay <= 62 (see module docstring)
_WORD_BITS = 63

DEFAULT_M_BITS = 65536
DEFAULT_K = 5


def bloom_pos(key: Column, i: int, m_bits: int, hash_fn: str = "xxhash64") -> Column:
    """Bit position of hash #i for ``key`` — a non-negative int in [0, m_bits)."""
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
    if hash_fn == "portable":
        mixed = key.cast("long") + F.lit(i * _STRIDE)
        return (
            F.pmod(F.pmod(mixed, F.lit(_REDUCE)) * F.lit(_MULT), F.lit(_PRIME))
            % m_bits
        )
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def bloom_pos_sql(key_expr: str, i: int, m_bits: int) -> str:
    """DuckDB fragment computing the identical PORTABLE bit position."""
    mixed = f"(CAST({key_expr} AS BIGINT) + {i * _STRIDE})"
    inner = f"(({mixed} % {_REDUCE}) + {_REDUCE}) % {_REDUCE}"
    return f"((({inner} * {_MULT}) % {_PRIME}) % {m_bits})"


def bloom_words(
    df: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Build the sparse word table ``(word_idx, word)`` from a key column."""
    key = F.col(key_col)
    pos = F.explode(
        F.array(*[bloom_pos(key, i, m_bits, hash_fn) for i in range(k)])
    ).alias("pos")
    return (
        df.select(pos)
        .select(
            F.floor(F.col("pos") / _WORD_BITS).cast("long").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD_BITS} AS INT))"
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_merge(partials: Sequence[DataFrame]) -> DataFrame:
    """OR-merge word tables — bit-identical to a direct build on the union.

    Unlike the sample-based partials (KMV / quantiles), replay needs no
    dedup here: OR is idempotent, so an identical replayed partial cannot
    change any bit.
    """
    it = iter(partials)
    out = next(it)
    for p in it:
        out = out.unionByName(p)
    return out.groupBy("word_idx").agg(F.bit_or("word").alias("word"))


def bloom_probe(
    probes: DataFrame,
    words: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    hash_fn: str = "xxhash64",
    out_col: str = "in_bloom",
) -> DataFrame:
    """Append ``out_col`` (0/1 long) — whether the filter contains each key.

    The word table collapses to a one-row ``map<word_idx, word>`` broadcast
    (bounded by ceil(m_bits/63) entries however large the build side was), so the
    probe adds NO shuffle to the probe frame: each row evaluates k
    try_element_at + bitmask terms inline.

    Contract: ``words`` must have UNIQUE word_idx — i.e. the output of
    ``bloom_words`` / ``bloom_merge`` / ``bloom_merge_read``. Probing a raw
    multi-partial append (un-merged) would hand ``map_from_entries``
    duplicate keys, which throws under Spark's default mapKeyDedupPolicy —
    merge first; the merge agg is bounded and cheap.
    """
    bloom_map = words.agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("word_idx", "word")))
        ).alias("__bloom_map")
    )
    key = F.col(key_col)
    hit = F.lit(True)
    for i in range(k):
        pos = bloom_pos(key, i, m_bits, hash_fn)
        widx = F.floor(pos / _WORD_BITS).cast("long")
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % _WORD_BITS).cast("int")
        )
        term = F.coalesce(
            (F.try_element_at(F.col("__bloom_map"), widx).bitwiseAND(mask) != 0),
            F.lit(False),
        )
        hit = hit & term
    return (
        probes.crossJoin(F.broadcast(bloom_map))
        .withColumn(out_col, hit.cast("long"))
        .drop("__bloom_map")
    )


# ---------------------------------------------------------------------------
# Split-block bloom filter — the BEYOND-BROADCAST-FIT membership path.
#
# ``bloom_probe`` folds the word table into a one-row broadcast map; that is
# optimal while the filter fits in a broadcast (tens of MiB). A 100 TB key
# registry sized for a low false-positive rate wants gigabytes of filter, and
# at that point the probe must become a JOIN. The classic layout is hostile to
# joins: every key touches k arbitrary words, so a join-based probe explodes
# the probe side x k and joins k times per key.
#
# The split-block layout (the same shape as Parquet's split-block bloom
# filter, parquet-format BloomFilter.md) fixes exactly this: ALL of a key's
# bits land in ONE block — 8 lanes of 32 bits, one bit per lane, lane bits
# chosen by 8 public salt constants — so
#
#   build — one ``groupBy(block_idx)`` with 8 lane-wise ``bit_or`` aggs;
#           the exchange is bounded by the number of touched blocks.
#   merge — union + the same 8 bit_or aggs: bit-identical to a direct build
#           (OR associativity), replay-idempotent, same contract as the
#           classic layout.
#   probe — ONE equi-join on ``block_idx`` per probe key (no x8 explode, no
#           8-way join). Persist the block table BUCKETED on block_idx and
#           the filter side joins with NO Exchange at any filter size
#           (plan-asserted in tests/test_bucketed.py); only the probe frame
#           shuffles once — the irreducible price of a filter too big to
#           broadcast.
#
# Arithmetic is kept exactly reproducible across engines: the lane key is
# capped at 31 bits so ``salt * lane_key`` stays inside signed-64 on both
# engines (Spark ANSI would throw on overflow; DuckDB would widen to
# HUGEINT — either way the bits would diverge), products reduce mod 2^32,
# and lane masks shift at most 31 — inside the 63-bit-shift policy above.
# This deviates from Parquet's spec (which multiplies the full 32-bit lane
# key with 32-bit wraparound) only in the key width; the block/lane/salt
# layout is the same.
# ---------------------------------------------------------------------------

# parquet-format BloomFilter.md salt constants (public spec)
_SBBF_SALT = (
    0x47B6137B,
    0x44974D91,
    0x8824AD5B,
    0xA2B7289D,
    0x705495C7,
    0x2DF1424B,
    0x9EFC4947,
    0x5C6BFB31,
)
_SBBF_LANES = 8
_MOD32 = 1 << 32
_LANE_DIV = 1 << 27  # top 5 of the 32 product bits pick the lane bit
_LANE_KEY_MOD = 1 << 31  # 31-bit lane key: salt * key < 2^63 exactly

DEFAULT_N_BLOCKS = 4096  # 4096 blocks x 32 B = 128 KiB; size to corpus


def _sbbf_lane_cols(key: Column, n_blocks: int, hash_fn: str) -> tuple[Column, list[Column]]:
    """(block_idx, [mask_0..mask_7]) for one key."""
    block = bloom_pos(key, 0, n_blocks, hash_fn).alias("block_idx")
    lane_key = bloom_pos(key, 1, _LANE_KEY_MOD, hash_fn)
    masks = []
    for i, salt in enumerate(_SBBF_SALT):
        bit = F.floor(F.pmod(F.lit(salt) * lane_key, F.lit(_MOD32)) / _LANE_DIV)
        masks.append(
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), bit.cast("int")
            ).alias(f"__sbbf_m{i}")
        )
    return block, masks


def sbbf_blocks(
    df: DataFrame,
    key_col: str,
    n_blocks: int = DEFAULT_N_BLOCKS,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Build the block table ``(block_idx, w0..w7)`` from a key column."""
    block, masks = _sbbf_lane_cols(F.col(key_col), n_blocks, hash_fn)
    return (
        df.select(block, *masks)
        .groupBy("block_idx")
        .agg(
            *[
                F.bit_or(f"__sbbf_m{i}").alias(f"w{i}")
                for i in range(_SBBF_LANES)
            ]
        )
    )


def sbbf_merge(partials: Sequence[DataFrame]) -> DataFrame:
    """OR-merge block tables — bit-identical to a direct build on the union
    and replay-idempotent (OR), the classic-layout contract."""
    it = iter(partials)
    out = next(it)
    for p in it:
        out = out.unionByName(p)
    return out.groupBy("block_idx").agg(
        *[F.bit_or(f"w{i}").alias(f"w{i}") for i in range(_SBBF_LANES)]
    )


def sbbf_probe(
    probes: DataFrame,
    blocks: DataFrame,
    key_col: str,
    n_blocks: int = DEFAULT_N_BLOCKS,
    hash_fn: str = "xxhash64",
    out_col: str = "in_sbbf",
) -> DataFrame:
    """Append ``out_col`` (0/1 long) via ONE left equi-join on block_idx.

    No broadcast requirement: AQE broadcasts a small block table on its own,
    and a huge one joins shuffle-side — exchange-free on the filter side when
    the block table is persisted bucketed on block_idx. Each probe row reads
    exactly one block and evaluates 8 inline mask terms.

    Contract (same as ``bloom_probe``): ``blocks`` must have UNIQUE
    block_idx — the output of ``sbbf_blocks`` / ``sbbf_merge`` /
    ``sbbf_merge_read``. Probing a raw multi-partial append (un-merged)
    joins each probe row once per duplicate block row: duplicated output
    rows AND spurious in_sbbf=0 copies for genuinely inserted keys (a
    batch-1 key matched against batch 2's partial). Unlike bloom_probe's
    map build this misuse does NOT fail loudly — merge first; the merge
    agg is bounded and cheap.

    The block table's ``block_idx``/``w0..w7`` columns are renamed to
    ``__sbbf_*`` before the join, so a probe frame may itself carry columns
    named ``w0..w7`` or ``block_idx`` without an ambiguous-reference error;
    only the ``__sbbf_`` prefix is reserved on the probe side (ADVICE r07).
    """
    key = F.col(key_col)
    block, masks = _sbbf_lane_cols(key, n_blocks, hash_fn)
    lane_cols = [f"__sbbf_w{i}" for i in range(_SBBF_LANES)]
    p = probes.withColumn("__sbbf_block", block)
    blk = blocks.withColumnRenamed("block_idx", "__sbbf_block")
    for i in range(_SBBF_LANES):
        blk = blk.withColumnRenamed(f"w{i}", f"__sbbf_w{i}")
    joined = p.join(blk, on="__sbbf_block", how="left")
    hit = F.lit(True)
    for i, mask in enumerate(masks):
        hit = hit & F.coalesce(
            F.col(f"__sbbf_w{i}").bitwiseAND(mask) != 0, F.lit(False)
        )
    return joined.withColumn(out_col, hit.cast("long")).drop(
        "__sbbf_block", *lane_cols
    )


def sbbf_block_sql(key_expr: str, n_blocks: int) -> str:
    """DuckDB fragment: the identical PORTABLE block index."""
    return bloom_pos_sql(key_expr, 0, n_blocks)


def sbbf_lane_key_sql(key_expr: str) -> str:
    """DuckDB fragment: the identical PORTABLE 31-bit lane key."""
    return bloom_pos_sql(key_expr, 1, _LANE_KEY_MOD)


def sbbf_mask_sql(lane_key_expr: str, i: int) -> str:
    """DuckDB fragment: lane-``i`` mask for a lane-key expression."""
    salt = _SBBF_SALT[i]
    bit = f"((({salt} * {lane_key_expr}) % {_MOD32}) // {_LANE_DIV})"
    return f"(1::BIGINT << CAST({bit} AS INTEGER))"


def sbbf_partials_sink(
    out_dir: str,
    key_col: str,
    n_blocks: int = DEFAULT_N_BLOCKS,
    hash_fn: str = "xxhash64",
):
    """foreachBatch sink: one block-table partial per micro-batch in its own
    ``batch_id=`` partition; OR-idempotence makes even partition-blind replay
    harmless (the bloom_partials_sink contract)."""
    from tranquility_spark.operators.batch_sink import write_batch_partition

    def write(batch_df: DataFrame, batch_id: int) -> None:
        partials = sbbf_blocks(batch_df, key_col, n_blocks, hash_fn)
        write_batch_partition(partials, out_dir, batch_id)

    return write


def sbbf_merge_read(spark, out_dir: str) -> DataFrame:
    """Merge every persisted partial into the lifetime block table."""
    all_parts = spark.read.parquet(out_dir)
    return all_parts.groupBy("block_idx").agg(
        *[F.bit_or(f"w{i}").alias(f"w{i}") for i in range(_SBBF_LANES)]
    )


def bloom_partials_sink(out_dir: str, key_col: str, m_bits: int = DEFAULT_M_BITS,
                        k: int = DEFAULT_K, hash_fn: str = "xxhash64"):
    """foreachBatch sink: one sparse word-table partial per micro-batch,
    landed in its own ``batch_id=`` partition (idempotent replay — and OR's
    idempotence means even a reader that ignored partitions could not be
    corrupted by a duplicate). ``bloom_merge_read`` reconstructs the
    lifetime filter; equals the one-shot batch build bit-for-bit."""
    from tranquility_spark.operators.batch_sink import write_batch_partition

    def write(batch_df: DataFrame, batch_id: int) -> None:
        partials = bloom_words(batch_df, key_col, m_bits, k, hash_fn)
        write_batch_partition(partials, out_dir, batch_id)

    return write


def bloom_merge_read(spark, out_dir: str) -> DataFrame:
    """Merge every persisted partial into the lifetime filter."""
    all_parts = spark.read.parquet(out_dir)
    return all_parts.groupBy("word_idx").agg(F.bit_or("word").alias("word"))
