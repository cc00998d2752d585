"""Deterministic KLL/MRL-style mergeable quantile sketch (family #7).

Closes VERDICT r07's "what's missing" #3: Spark 4 ships native Datasketches
KLL functions, but their compactor randomness is unseeded — reruns change
values, which violates this repo's determinism policy (pinned by
``test_native_kll_quantiles_bounded_but_nondeterministic``). a10c's bottom-k
sample is fully deterministic but its rank error scales as O(1/sqrt(k)).
This module provides the missing middle: a multi-level compacting summary in
the KLL/MRL family (Karnin-Lang-Liberty 2016; Manku-Rajagopalan-Lindsay
1998) whose every compaction decision is a PURE FUNCTION of the data —
offsets derive from a CRC of the compacted items, not an RNG — so the whole
lifecycle is bit-reproducible across reruns, processes and partitionings.

Structure: level ``l`` holds items of weight ``2^l``; when a level exceeds
``k`` items it sorts, promotes every other item to the level above (the
surviving half doubles its weight), and keeps at most one unpaired carry.
Space is O(k log(n/k)); rank error grows with the number of compactions an
item's rank estimate crossed — the tests pin a measured normalized-rank
envelope rather than quoting the randomized KLL constant, because the
deterministic offsets trade the provable-in-expectation bound for exact
reproducibility (the explicit design choice here). When a PROVEN bound is
required, use the sibling ``gk.py`` (family #8, r9): the Greenwald-Khanna
batch specialization with a strict 2·ε·n guarantee — it supersedes this
family for one-merge-level lifecycles; this module remains the choice for
deep/incremental merge trees where its O(k log(n/k)) structure holds up.

Spark lifecycle (the KMV/MG/bloom/CMS/HLL shape):

- build (``kll_partial``): applyInPandas per group — ONE pass over the
  partial's raw rows folds values IN CANONICAL (sorted) ORDER into the
  sketch, so the result is independent of Spark's physical row order; the
  summary serializes as RELATIONAL rows ``(group…, level, value, n_total)``
  (<= k * levels rows, kilobytes regardless of partial size). Same partial
  sizing contract as ``mg_partial``: one partial's group must fit a pandas
  frame (per day / segment / micro-batch — how the sink emits them).
- merge (``kll_merge``): partials reconstruct and merge IN CANONICAL
  (sorted partial-id) ORDER — deterministic however the merge is executed,
  and bit-identical between streaming-read and batch paths. UNLIKE
  KMV/MG/bloom/CMS, merge is NOT bit-identical to a direct build on the
  concatenated data (compaction history differs — the same caveat as
  native HLL's estimate-identical contract); the merged sketch satisfies
  the same measured rank-error envelope, test-pinned. Merge is NOT
  replay-idempotent (a duplicated partial double-counts, the CMS
  argument): replay safety comes from ``batch_id=`` dynamic-overwrite
  partitions (``kll_partials_sink``).
- estimate (``kll_quantiles``): pure DataFrame math over the summary rows
  — weight ``2^level``, running-weight window in value order, and each
  quantile is the smallest value whose cumulative weight reaches
  ``ceil(q * W)``. No UDF at query time.

NULL values contribute nothing (the f6 policy): a group whose every value
is NULL emits no summary and is absent from the estimates.
"""

import struct
import zlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_K = 192


def _compact(items):
    """(carry, promoted) for one over-full level — pure function of items.

    The parity of a CRC over the sorted items picks the surviving
    alternation (bit 0) and, for odd sizes, which end supplies the
    unpaired carry (bit 1) — deterministic stand-ins for KLL's coin flips.
    """
    items = sorted(items)
    h = zlib.crc32(struct.pack(f"<{len(items)}d", *items))
    if len(items) % 2:
        if (h >> 1) & 1:
            carry, body = [items[0]], items[1:]
        else:
            carry, body = [items[-1]], items[:-1]
    else:
        carry, body = [], items
    return carry, body[h & 1 :: 2]


class _DKLL:
    """Driver/worker-side sketch state: levels of weighted value lists."""

    def __init__(self, k: int = DEFAULT_K):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = k
        self.levels = [[]]
        self.n = 0

    def extend(self, values) -> None:
        """Fold values (caller supplies canonical order) in k-sized chunks
        so level 0 never grows past 2k between cascades.

        Zero-sign normalization (r11, hypothesis-found): -0.0 and +0.0
        compare EQUAL, so a stable sort does not canonicalize their
        order — but they pack to DIFFERENT bits, so _compact's CRC (and
        with it every compaction decision downstream) would diverge
        between two orderings of the same multiset, breaking the
        bit-reproducibility contract. ``v + 0.0`` maps -0.0 to +0.0 and
        is the identity for every other non-NaN float."""
        for i in range(0, len(values), self.k):
            chunk = [v + 0.0 for v in values[i : i + self.k]]
            self.levels[0].extend(chunk)
            self.n += len(chunk)
            self._cascade()

    def merge(self, other: "_DKLL") -> None:
        for lvl, items in enumerate(other.levels):
            while len(self.levels) <= lvl:
                self.levels.append([])
            self.levels[lvl].extend(items)
        self.n += other.n
        self._cascade()

    def _cascade(self) -> None:
        lvl = 0
        while lvl < len(self.levels):
            if len(self.levels[lvl]) > self.k:
                carry, promoted = _compact(self.levels[lvl])
                self.levels[lvl] = carry
                if lvl + 1 >= len(self.levels):
                    self.levels.append([])
                self.levels[lvl + 1].extend(promoted)
            lvl += 1

    def rows(self):
        """Serialize to (level, value) pairs — the full state besides n."""
        return [
            (lvl, float(v))
            for lvl, items in enumerate(self.levels)
            for v in sorted(items)
        ]

    @classmethod
    def from_rows(cls, k: int, level_values, n: int) -> "_DKLL":
        sk = cls(k)
        for lvl, v in level_values:
            while len(sk.levels) <= int(lvl):
                sk.levels.append([])
            # + 0.0: zero-sign normalization (see extend) — a summary
            # persisted before the fix may still carry -0.0
            sk.levels[int(lvl)].append(float(v) + 0.0)
        for items in sk.levels:
            items.sort()
        sk.n = int(n)
        return sk


def _group_schema(df: DataFrame, group_cols) -> str:
    parts = [
        f"`{c}` {df.schema[c].dataType.simpleString()}" for c in group_cols
    ]
    return ", ".join(parts + ["level int", "value double", "n_total long"])


def kll_partial(
    df: DataFrame,
    group_cols,
    value_col: str,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Per-group sketch build → summary rows ``group…, level, value,
    n_total``. Values fold in sorted (canonical) order, so the output is
    bit-identical however the input was partitioned or ordered."""
    g = list(group_cols)
    schema = _group_schema(df, g)

    def fold(pdf):
        import pandas as pd

        vals = sorted(pdf[value_col].dropna().astype(float).tolist())
        cols = [*g, "level", "value", "n_total"]
        if not vals:
            return pd.DataFrame([], columns=cols)
        sk = _DKLL(k)
        sk.extend(vals)
        gvals = [pdf[c].iloc[0] for c in g]
        return pd.DataFrame(
            [[*gvals, lvl, v, sk.n] for lvl, v in sk.rows()], columns=cols
        )

    return df.select(*g, value_col).groupBy(*g).applyInPandas(fold, schema)


def kll_merge(
    partials: DataFrame,
    group_cols,
    partial_col: str,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Merge per-``partial_col`` summaries down to ``group_cols`` (same
    schema out, ``partial_col`` consumed). Partials merge in sorted
    partial-id order — canonical, so any execution plan yields the same
    bytes. Only kilobyte summary rows shuffle, never raw data."""
    g = list(group_cols)
    schema = _group_schema(partials, g)

    def mfold(pdf):
        import pandas as pd

        sk = _DKLL(k)
        # canonical order must tolerate a NULL partial id (e.g. partials
        # keyed by to_date(ts) over events with NULL ts): None/NaN cannot
        # be compared to str/int, so the null id normalizes to None and
        # sorts first — deterministic, and the NULL-keyed partial merges
        # like any other (code-review r8)
        pids = sorted(
            {
                None
                if p is None or (isinstance(p, float) and p != p)
                else p
                for p in pdf[partial_col].unique()
            },
            key=lambda p: (p is not None, p),
        )
        for pid in pids:
            sub = (
                pdf[pdf[partial_col].isna()]
                if pid is None
                else pdf[pdf[partial_col] == pid]
            )
            sk.merge(
                _DKLL.from_rows(
                    k,
                    zip(sub["level"], sub["value"]),
                    int(sub["n_total"].iloc[0]),
                )
            )
        gvals = [pdf[c].iloc[0] for c in g]
        cols = [*g, "level", "value", "n_total"]
        return pd.DataFrame(
            [[*gvals, lvl, v, sk.n] for lvl, v in sk.rows()], columns=cols
        )

    return (
        partials.select(*g, partial_col, "level", "value", "n_total")
        .groupBy(*g)
        .applyInPandas(mfold, schema)
    )


def kll_quantiles(
    summary: DataFrame,
    group_cols,
    quantiles=(0.5, 0.9, 0.99),
) -> DataFrame:
    """Quantile estimates from summary rows, pure DataFrame math: weight
    ``2^level``, running weight in value order, and for each q the smallest
    value whose cumulative weight reaches ``ceil(q * W)``. Ties in value
    are harmless: tied rows carry the same value, so the crossing value is
    order-independent. Output: ``group…, n_total, p<q*100>…``."""
    g = list(group_cols)
    w_ord = Window.partitionBy(*g).orderBy("value", "level").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wtot = Window.partitionBy(*g)
    cum = (
        summary.withColumn("__w", F.pow(F.lit(2.0), F.col("level")).cast("long"))
        .withColumn("__cum", F.sum("__w").over(w_ord))
        .withColumn("__W", F.sum("__w").over(wtot))
    )
    aggs = [F.max("n_total").alias("n_total")]
    for q in quantiles:
        target = F.greatest(
            F.lit(1),
            F.ceil(F.col("__W").cast("double") * F.lit(float(q))).cast("long"),
        )
        aggs.append(
            F.min(F.when(F.col("__cum") >= target, F.col("value"))).alias(
                f"p{q * 100:g}".replace(".", "_")
            )
        )
    return cum.groupBy(*g).agg(*aggs)


def kll_partials_sink(
    out_dir: str,
    group_cols,
    value_col: str,
    k: int = DEFAULT_K,
):
    """foreachBatch sink: one sketch partial per group per micro-batch in
    its own ``batch_id=`` partition (dynamic partition overwrite — replay
    REPLACES, which is what makes the non-idempotent merge safe, the CMS
    contract). ``kll_merge`` over the read-back partials keyed by
    ``batch_id`` reproduces the batch merge of the same partials
    bit-for-bit (canonical merge order)."""
    from tranquility_spark.operators.batch_sink import write_batch_partition

    def write(batch_df: DataFrame, batch_id: int) -> None:
        partials = kll_partial(batch_df, group_cols, value_col, k=k)
        write_batch_partition(partials, out_dir, batch_id)

    return write
