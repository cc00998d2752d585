"""Embedding-column maintenance ops for a training-data pipeline.

The dedup/similarity modules consume embeddings; this module produces and
maintains them: L2 normalization, int8 quantization (the storage/serving
format for 100 TB-scale vector corpora — 4× smaller than float32, 8× smaller
than float64), and per-label centroid pooling (class prototypes for
clustering seeds, label-balance audits, and centroid-based dedup).

Everything here is pure JVM higher-order array expressions
(`transform`/`aggregate`/`posexplode`) — no Python UDF, whole-stage codegen
end-to-end, embarrassingly parallel per row (normalize/quantize) or one
hash-agg shuffle keyed on (label, dim) (centroids).

Cross-engine determinism: the squared-norm reduction folds left-to-right over
the same array on both engines (identical IEEE-754 result, same policy as
sim1's dot product); centroid accumulation rounds each component to 6
decimals then sums in DECIMAL(28,6) (exact, order-independent — the txt9
round-then-decimal-accumulate policy).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tranquility_spark.operators.similarity import double_array_lit


def l2_norm(emb: Column) -> Column:
    """sqrt(sum(v^2)) folded left-to-right in double precision."""
    sq = F.aggregate(
        emb.cast("array<double>"),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    return F.sqrt(sq)


def l2_normalize_quantize(
    df: DataFrame, emb_col: str = "embedding", levels: int = 127
) -> DataFrame:
    """Attach the L2 norm and a symmetric int8 quantization of the embedding.

    q_i = floor(v_i * levels / norm + 0.5)  — floor(x + 0.5) instead of
    round() because it is bit-identical across engines for all inputs
    (round()'s half-even/half-up behavior varies by engine and type).
    Zero-norm vectors quantize to all-zero (try_divide semantics) rather
    than erroring, so a degenerate row can't kill a 100 TB pass.
    """
    # Stage the raw norm as a column: inlining the O(dim) aggregate inside
    # the transform() lambda re-evaluates it per element — O(dim²) per row
    # (no common-subexpression elimination across lambda scopes).
    norm = F.col("__l2_raw")
    quant = F.transform(
        F.col(emb_col).cast("array<double>"),
        lambda x: F.floor(
            F.coalesce(F.try_divide(x * F.lit(float(levels)), norm), F.lit(0.0))
            + F.lit(0.5)
        ).cast("int"),
    )
    return (
        df.withColumn("__l2_raw", l2_norm(F.col(emb_col)))
        .withColumn("l2_norm", F.round(norm, 6))
        .withColumn("q", quant)
        .drop("__l2_raw")
    )


def label_centroids(
    df: DataFrame, emb_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Per-label per-dimension mean — the class-prototype (centroid) table.

    posexplode → one hash agg on (label, dim) with map-side partials: the
    shuffle carries |labels| × dims rows, independent of corpus size, so
    this scales to any number of input rows. Components are rounded to 6
    decimals then accumulated in DECIMAL(28,6) for an exact,
    order-independent mean.
    """
    exploded = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(emb_col).cast("array<double>")).alias("dim", "v"),
    )
    return (
        exploded.groupBy("label", "dim")
        .agg(
            (
                F.sum(F.round(F.col("v"), 6).cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_v"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
    )


def centroid_similarity(
    df: DataFrame, emb_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Pairwise cosine similarity between label centroids (a < b).

    The cluster-separation audit: labels whose prototypes sit close
    (cosine → 1) are confusable — candidates for merging or relabeling;
    run it after every taxonomy or embedding-model change.

    Scale shape: the only corpus-sized work is one (label, dim) hash agg
    (shuffle carries |labels| × dims rows regardless of input size); the
    pair join is centroid-table × centroid-table on dim — kilobytes — and
    broadcasts. Cosine is scale-invariant, so it is computed from the
    per-label component SUMS, not the means: the sums are exact 6-dp
    decimals (round-then-decimal-accumulate), whereas a mean would need a
    division and a re-round whose half-boundary behavior differs between
    engines (observed: 8/45 pairs off by ~5e-6 at sf0.1 with the
    mean-based form). All arithmetic stays in DECIMAL until the final
    double sqrt/divide, which is IEEE-deterministic.
    """
    exploded = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(emb_col).cast("array<double>")).alias("dim", "v"),
    )
    cent = exploded.groupBy("label", "dim").agg(
        # (18,6) keeps the decimal product type at (37,12) — exact; a
        # (28,6) operand would overflow precision 38 and silently lose scale
        F.sum(F.round(F.col("v"), 6).cast("decimal(28,6)"))
        .cast("decimal(18,6)")
        .alias("c"),
        F.count(F.lit(1)).alias("n_vecs"),
    )
    # The agg output is |labels| x dims rows (kilobytes) at ANY corpus size,
    # but it lands in spark.sql.shuffle.partitions reduce slots and feeds two
    # downstream stages (both join sides) — ~6 stages of near-empty tasks
    # whose scheduling dominated the query (ADJUDICATION r07: quiet median
    # 0.52 s -> 0.30 s with the collapse; anchor 0.31 s). coalesce(1) only
    # narrows the REDUCE side — the map-side partial agg over the corpus
    # stays fully parallel, so this is scale-safe.
    cent = cent.coalesce(1)
    a, b = cent.alias("a"), cent.alias("b")
    joined = a.join(
        F.broadcast(b),
        (F.col("a.dim") == F.col("b.dim")) & (F.col("a.label") < F.col("b.label")),
    )
    dot = F.sum(F.col("a.c") * F.col("b.c")).cast("double")
    na = F.sum(F.col("a.c") * F.col("a.c")).cast("double")
    nb = F.sum(F.col("b.c") * F.col("b.c")).cast("double")
    return (
        joined.groupBy(
            F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b")
        )
        .agg(
            F.round(dot / F.sqrt(na * nb), 6).alias("centroid_cosine"),
            F.max(F.col("a.n_vecs")).alias("n_a"),
            F.max(F.col("b.n_vecs")).alias("n_b"),
        )
    )


def matryoshka_truncate(
    df: DataFrame, dims: int, emb_col: str = "embedding"
) -> DataFrame:
    """Matryoshka truncation: keep the leading ``dims`` components, report
    the truncated-vector norm and the retained-energy fraction.

    The serving trick behind MRL-trained embeddings (Kusupati et al. 2022):
    a prefix of the vector is itself a usable lower-dim embedding, so a
    64→16 truncation cuts index storage and ANN compute 4× and the
    retained-energy column says per-vector how much signal that costs.

    Pure JVM ``slice`` + left-to-right ``aggregate`` folds (identical
    IEEE-754 result on both engines — the l2_norm policy); narrow
    projection, no shuffle, embarrassingly parallel at 100 TB.
    ``try_divide`` keeps zero-norm degenerates at NULL fraction rather
    than erroring a full pass.
    """
    full = F.col(emb_col).cast("array<double>")
    head = F.slice(full, 1, dims)

    def energy(arr: Column) -> Column:
        return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x * x)

    return (
        df.withColumn("__e_head", energy(head))
        .withColumn("__e_full", energy(full))
        .withColumn("trunc_l2", F.round(F.sqrt(F.col("__e_head")), 6))
        .withColumn(
            "energy_retained",
            F.round(F.try_divide(F.col("__e_head"), F.col("__e_full")), 6),
        )
        .withColumn("trunc_dims", F.least(F.size(full), F.lit(dims)))
        .drop("__e_head", "__e_full")
    )


def binary_quantize(emb: Column, dims: int = 64) -> tuple[Column, Column]:
    """Sign-bit binary quantization: dim i sets bit (i mod 32) of word
    (i div 32) when the component is strictly positive — 64 float dims
    collapse to two BIGINT words (32x compression), and similarity becomes
    ``bit_count(xor(...))`` Hamming distance: pure JVM bit arithmetic, the
    standard compact first-pass in binary-quantized vector search. Two
    32-bit-per-word halves (not one 64-bit word) keep every shift <= 31,
    inside the cross-engine-safe range (see operators/bloom.py on why
    shifting into bit 63 is not portable).
    """
    if dims != 64:
        raise ValueError("binary_quantize is fixed at 64 dims (two 32-bit words)")

    # Row-level guard (ADVICE r06): a shorter array would silently yield
    # zero bits for the missing dims — a truncated signature that Hamming-
    # compares as if those dims were all non-positive. Fail loudly instead.
    # NULL embeddings pass through as NULL words (the pre-guard behavior —
    # a single NULL row must not abort a corpus pass; code-review r07), and
    # the error message coalesces size so it can never itself be NULL.
    emb = F.when(emb.isNull(), emb).otherwise(
        F.when(F.size(emb) >= F.lit(dims), emb).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("binary_quantize: embedding has "),
                    F.coalesce(F.size(emb).cast("string"), F.lit("NULL")),
                    F.lit(f" dims, need >= {dims}"),
                )
            )
        )
    )

    def word(sl: Column) -> Column:
        masks = F.transform(
            sl,
            lambda x, i: F.when(
                x > F.lit(0.0),
                F.call_function("shiftleft", F.lit(1).cast("long"), i.cast("int")),
            ).otherwise(F.lit(0).cast("long")),
        )
        return F.aggregate(masks, F.lit(0).cast("long"), lambda a, b: a.bitwiseOR(b))

    return word(F.slice(emb, 1, 32)), word(F.slice(emb, 33, 32))


def hamming(w0a: Column, w1a: Column, w0b: Column, w1b: Column) -> Column:
    """Hamming distance between two 2-word binary signatures."""
    return (
        F.bit_count(w0a.bitwiseXOR(w0b)) + F.bit_count(w1a.bitwiseXOR(w1b))
    ).cast("long")


def projection_matrix(out_dims: int, in_dims: int, seed: int = 7) -> list[list[float]]:
    """Deterministic seeded random-projection matrix, 6-dp entries.

    Johnson–Lindenstrauss-style dense projection: entries uniform in
    [-1, 1] from a fixed seed, rounded to 6 decimals so the SAME literal
    matrix can be embedded in a SQL oracle (cross-engine float policy:
    the weights are exact 6-dp decimals on both sides).
    """
    import random

    rng = random.Random(seed)
    return [
        [round(rng.uniform(-1.0, 1.0), 6) for _ in range(in_dims)]
        for _ in range(out_dims)
    ]


def random_project(emb: Column, weights: list[list[float]]) -> list[Column]:
    """Project an embedding onto each weight row: one Column per out-dim.

    Each output component is sum_i round(emb[i] * w[i], 6) accumulated in
    DECIMAL (the round-then-decimal-accumulate discipline — double
    accumulation order differs between engines; exact decimals do not).
    Pure JVM zip_with/aggregate expressions: no UDF, no shuffle — the
    dimensionality-reduction pass before ANN indexing is embarrassingly
    parallel, and at 100 TB the matrix (out_dims x in_dims literals) lives
    inside the codegen'd expression, never in a join.
    """
    outs = []
    for row in weights:
        lits = double_array_lit(row)
        products = F.zip_with(emb, lits, lambda x, w: F.round(x * w, 6))
        outs.append(
            F.aggregate(
                products,
                F.lit(0).cast("decimal(28,6)"),
                # decimal addition widens (28,6)+(28,6) -> (29,6); cast back
                # so the fold type matches the zero element (exact: the sum
                # of 64 six-dp products is far inside 28 digits)
                lambda acc, p: (acc + p.cast("decimal(28,6)")).cast(
                    "decimal(28,6)"
                ),
            ).cast("double")
        )
    return outs


def covariance_pairs(
    df: DataFrame,
    emb_col: str = "embedding",
    dims: int | None = None,
) -> DataFrame:
    """Full d x d second-moment/covariance table via the posexplode (i, j)
    pair agg — the 'full-d alternative' the emb7 entry documents (emb7's
    single-row 44-expression agg is plan-compile-bound past d ~ 10).

    One narrow double-posexplode fan-out (d^2 rows per vector) into ONE
    map-side-combined agg; the exchange carries d*(d+1)/2 + d rows of
    sums however large the corpus. Returns the upper triangle:
    ``(i, j, s_ij, s_i, s_j, n)`` with s_ij = sum(x_i * x_j) — callers
    derive covariance as s_ij/n - (s_i/n)(s_j/n).

    ``n`` counts NON-NULL contributions (``count(xi * xj)``, NULL if
    either element is NULL), not rows: a vector with a NULL element
    depresses the counts of exactly the pairs it touches, so
    ``principal_component``'s rectangularity guard sees diverging counts
    and fails loudly instead of silently averaging over a biased sum
    (ADVICE r8 — ``count(lit(1))`` counted the NULL-element rows while
    ``F.sum`` skipped their products).

    ``dims`` (optional) restricts the pass to the first ``dims``
    elements of each embedding — the matryoshka-prefix covariance — by
    slicing BEFORE the first posexplode, so the fan-out itself shrinks
    to dims^2 rows per vector rather than filtering after the fact.
    """
    emb = F.col(emb_col).cast("array<double>")
    if dims is not None:
        emb = F.slice(emb, 1, dims)
    # slice the suffix BEFORE the second posexplode so only the upper
    # triangle is ever materialized — the explode-then-filter shape
    # generated ~2x the rows it kept (code-review r8); slice clamps at
    # the array end, so j = i + suffix position
    pairs = (
        df.select(
            F.posexplode(emb).alias("i", "xi"),
            emb.alias("__e"),
        )
        .select(
            "i",
            "xi",
            F.posexplode(
                F.slice(F.col("__e"), F.col("i") + 1, F.size("__e"))
            ).alias("__p", "xj"),
        )
        .select("i", (F.col("i") + F.col("__p")).alias("j"), "xi", "xj")
    )
    sums = pairs.groupBy("i", "j").agg(
        F.sum(F.col("xi") * F.col("xj")).alias("s_ij"),
        F.sum("xi").alias("s_i"),
        F.sum("xj").alias("s_j"),
        # count(xi*xj), not count(*): NULL elements must depress n so the
        # rectangularity guard detects them (see docstring)
        F.count(F.col("xi") * F.col("xj")).alias("n"),
    )
    return sums


def principal_component(
    df: DataFrame,
    emb_col: str = "embedding",
) -> tuple[list[float], float, float]:
    """Top principal component of the embedding corpus — the
    big-data/small-model split done the Spark-first way: ONE distributed
    pass builds the d x d covariance (``covariance_pairs``, exchange
    bounded by d^2 sums at any corpus size), and the d x d eigensolve runs
    on the DRIVER in numpy (d = 64 here: 4 KiB of state — collecting it is
    the bounded-index-collect pattern of ivf_centroids/pq_codebooks).

    The driver solve is a FULL ``numpy.linalg.eigh`` rather than power
    iteration — a deliberate choice: embedding corpora often have
    near-flat bulk spectra (uniform-random vectors are the extreme case),
    where power iteration's convergence rate (lambda2/lambda1)^t goes to 1
    and any fixed iteration budget silently under-converges. A dense
    eigensolve of a d x d matrix is microseconds at d=64 and exact.
    Deterministic: no RNG anywhere, canonical sign (the largest-magnitude
    loading is positive), reruns bit-identical. Returns ``(loadings,
    eigenvalue, explained_share)`` with explained_share = lambda/trace.
    """
    import numpy as np

    rows = covariance_pairs(df, emb_col).collect()
    if not rows:
        raise ValueError("principal_component needs a non-empty corpus")
    d = max(r["j"] for r in rows) + 1
    # every (i, j) pair must have seen every vector: ragged dimensions or
    # NULL array elements make the per-pair counts diverge, and silently
    # picking one of them (collect order is partition-dependent) would
    # produce wrong AND nondeterministic covariance — fail loudly instead
    # (code-review r8; the pq_codebooks input-shape-guard precedent)
    ns = {r["n"] for r in rows}
    if len(ns) != 1:
        raise ValueError(
            f"principal_component needs a rectangular corpus (every vector "
            f"the same dimension, no NULL elements); per-pair counts differ: "
            f"{sorted(ns)[:5]}…"
        )
    n = ns.pop()
    cov = np.zeros((d, d))
    for r in rows:
        c = r["s_ij"] / n - (r["s_i"] / n) * (r["s_j"] / n)
        cov[r["i"], r["j"]] = c
        cov[r["j"], r["i"]] = c
    eigvals, eigvecs = np.linalg.eigh(cov)
    eigval = float(eigvals[-1])
    v = eigvecs[:, -1]
    # canonical sign: the largest-|.| component is positive (ties: lowest i)
    pivot = int(np.argmax(np.abs(v)))
    if v[pivot] < 0:
        v = -v
    trace = float(np.trace(cov))
    share = eigval / trace if trace > 0 else 0.0
    return [float(x) for x in v], eigval, share


def principal_components(
    df: DataFrame,
    r: int,
    emb_col: str = "embedding",
) -> tuple[list[list[float]], list[float], list[float]]:
    """Top-``r`` principal components — ``principal_component``'s
    multi-component sibling, same architecture and contracts: ONE
    distributed covariance pass (d²-bounded exchange), one driver-side
    ``eigh`` of the d x d matrix, canonical sign per component, no RNG.
    Returns ``(loadings, eigenvalues, explained_shares)`` with components
    ordered by descending eigenvalue. Same rectangularity guard (ragged
    or NULL-element corpora fail loudly).

    Feed the loadings to ``random_project`` to PROJECT the corpus — the
    PCA-projection pass is then the same shuffle-free literal-matrix
    codegen expression as the JL projection (emb6), with the matrix
    learned instead of seeded.
    """
    import numpy as np

    if r < 1:
        raise ValueError(f"r must be >= 1, got {r}")
    rows = covariance_pairs(df, emb_col).collect()
    if not rows:
        raise ValueError("principal_components needs a non-empty corpus")
    d = max(row["j"] for row in rows) + 1
    if r > d:
        raise ValueError(f"r={r} exceeds corpus dimensionality d={d}")
    ns = {row["n"] for row in rows}
    if len(ns) != 1:
        raise ValueError(
            f"principal_components needs a rectangular corpus (every vector "
            f"the same dimension, no NULL elements); per-pair counts differ: "
            f"{sorted(ns)[:5]}…"
        )
    n = ns.pop()
    cov = np.zeros((d, d))
    for row in rows:
        c = row["s_ij"] / n - (row["s_i"] / n) * (row["s_j"] / n)
        cov[row["i"], row["j"]] = c
        cov[row["j"], row["i"]] = c
    eigvals, eigvecs = np.linalg.eigh(cov)
    trace = float(np.trace(cov))
    loadings, vals, shares = [], [], []
    for idx in range(d - 1, d - 1 - r, -1):
        v = eigvecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        loadings.append([float(x) for x in v])
        vals.append(float(eigvals[idx]))
        shares.append(float(eigvals[idx]) / trace if trace > 0 else 0.0)
    return loadings, vals, shares
