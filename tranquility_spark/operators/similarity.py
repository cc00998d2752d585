"""Similarity search over embedding columns (north-star phase 4).

- ``cosine_topk``       — brute-force exact top-k: one narrow map (dot product
  via zip_with/aggregate, pure JVM) + a top-k sort. At 100 TB: the scan is
  embarrassingly parallel; the sort is bounded by k via Spark's
  TakeOrderedAndProject, so no full-sort shuffle materializes.
- ``lsh_topk``          — random-hyperplane bucketed variant: probe only the
  query's bucket (plus optional multi-probe neighbors); prunes the scan by
  ~2^planes. This is the scale path (IVF-style partition pruning).

The reference has no similarity surface — extension per the build brief.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def double_array_lit(values) -> Column:
    """``array<double>`` literal built as ONE parsed SQL expression
    instead of one py4j round-trip per element (r19 optimization round,
    guide §5 driver section): a 64-dim ``F.array(*[F.lit(x) ...])``
    costs ~65 py4j calls, and the query-vector / centroid / codebook
    call sites build dozens per entry — dd13's eight 64-dim centroid
    literals alone held the driver ~1 s per plan build; the parsed form
    measured 0.27 s → 0.004 s for 8×64 dims. The RESULT is the same
    expression tree with bit-identical Literal doubles: ``repr(float)``
    is the shortest decimal that round-trips, and Spark's parser reads
    it back with a correctly-rounded conversion to the same IEEE double
    (verified bitwise in tests/test_operators.py on subnormal/extreme
    probes). Non-finite values have no SQL literal form — those fall
    back to the per-element build."""
    vals = [float(x) for x in values]
    if not vals or any(
        v != v or v in (float("inf"), float("-inf")) for v in vals
    ):
        return F.array(*[F.lit(v) for v in vals])
    return F.expr("array(" + ",".join(repr(v) + "D" for v in vals) + ")")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k against a constant query vector."""
    q = double_array_lit(query_vec)
    v = _as_double(F.col(vec_col))
    scored = df.select(F.col(id_col), F.round(cosine(v, q), 6).alias("cosine"))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def cosine_topk_self(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k neighbors of one row of the table itself (query vector looked up
    with a broadcast cross-join — no collect, stays declarative)."""
    q = df.filter(F.col(id_col) == query_id).select(_as_double(F.col(vec_col)).alias("q"))
    v = _as_double(F.col(vec_col))
    scored = (
        df.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(F.col(id_col), F.round(cosine(v, F.col("q")), 6).alias("cosine"))
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id for random-hyperplane LSH (built-in exprs only)."""
    bits = []
    for p in planes:
        arr = double_array_lit(p)
        bits.append((dot(vec, arr) >= 0).cast("int").cast("string"))
    return F.concat_ws("", *bits)


def lsh_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 6,
    seed: int = 42,
    probe_hamming: int = 2,
    num_probes: int = 5,
) -> DataFrame:
    """Approximate top-k: scan only rows whose hyperplane bucket is within
    Hamming distance ``probe_hamming`` of the query's (multi-probe LSH,
    Lv et al. VLDB'07 — near neighbors concentrate in sign patterns one bit
    off the query's, so probing them recovers most of the recall lost to
    quantization at the cost of ``1 + num_planes`` of the ``2^num_planes``
    buckets). On a partitioned-by-bucket layout the bucket IN-list becomes
    partition pruning (IVF): a literal filter the planner pushes to the scan.
    ``probe_hamming=0`` is classic single-probe. Probe buckets are chosen
    query-directed: among all flip-sets up to ``probe_hamming`` bits, the
    ``num_probes`` buckets with the smallest summed squared margins (distance
    of the query to each flipped hyperplane) — flipping a bit the query sits
    right on costs little, flipping a confident bit costs a lot."""
    import itertools
    import random

    rnd = random.Random(seed)
    dim = len(query_vec)
    planes = [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(num_planes)]

    margins = [sum(q * p for q, p in zip(query_vec, plane)) for plane in planes]
    qbits = "".join("1" if m >= 0 else "0" for m in margins)
    scored = []
    for dist in range(0, probe_hamming + 1):
        for flips in itertools.combinations(range(num_planes), dist):
            bits = list(qbits)
            for i in flips:
                bits[i] = "0" if bits[i] == "1" else "1"
            scored.append((sum(margins[i] ** 2 for i in flips), "".join(bits)))
    scored.sort()
    probes = {bucket for _, bucket in scored[:num_probes]}
    v = _as_double(F.col(vec_col))
    q = double_array_lit(query_vec)
    return (
        df.withColumn("__bucket", hyperplane_bucket(v, planes))
        .filter(F.col("__bucket").isin(sorted(probes)))
        .select(F.col(id_col), F.round(cosine(v, q), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF: inverted-file ANN (the 100 TB scale path)
# ---------------------------------------------------------------------------


def ivf_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    refine_iters: int = 1,
) -> list[list[float]]:
    """Deterministic centroids: hash-ordered sample seeds + Lloyd refinement.

    Seeds are the ``n_centroids`` rows with the smallest xxhash64(id) — a
    deterministic uniform sample needing one TakeOrdered (no full sort).
    Each refinement iteration is one groupBy over the assignment — at 100 TB
    this is the only full pass, and ``refine_iters`` bounds it. Centroid count
    stays driver-side small (C × dim floats).
    """
    seeds = (
        df.select(_as_double(F.col(vec_col)).alias("v"), F.xxhash64(F.col(id_col)).alias("h"))
        .orderBy("h")
        .limit(n_centroids)
        .collect()
    )
    cents = [list(r.v) for r in seeds]
    dim = len(cents[0]) if cents else 0
    for _ in range(refine_iters):
        assigned = with_centroid_id(df, cents, vec_col)
        # per-dimension means via posexplode + hash agg (whole-stage codegen);
        # per-index element_at expressions would re-evaluate the array cast
        # dim times per row (the same trap documented in the MinHash operator).
        # r12 (code-review find): the mean is decimal-accumulated, NOT
        # F.avg — float partial sums merge in shuffle-fetch arrival order,
        # which is not deterministic across runs/clusters, and the
        # certification probes (dd13c) demand bit-identical rebuilds.
        # decimal(38,18) addition is exact and order-independent; the final
        # float division happens once, driver-side.
        # r13 (ADVICE r12): the count MUST count the CAST value, not
        # F.lit(1) — a value whose decimal cast returns NULL (NULL array
        # elements; NaN/Inf/|x|>=1e20) is skipped by the sum, so counting
        # raw rows would divide by too many; and a group whose casts are
        # ALL NULL yields s=None, which must keep the previous centroid
        # rather than TypeError on float(None). try_cast, not cast: under
        # Spark 4 ANSI (the session default) a plain cast THROWS on
        # NaN/overflow instead of returning NULL — the skip semantics
        # this comment promises require the try_* form (r13 self-review).
        agg = (
            assigned.select(
                "centroid_id", F.posexplode(_as_double(F.col(vec_col))).alias("pos", "x")
            )
            .groupBy("centroid_id", "pos")
            .agg(
                F.sum(F.col("x").try_cast("decimal(38,18)")).alias("s"),
                F.count(F.col("x").try_cast("decimal(38,18)")).alias("n"),
            )
            .collect()
        )
        means: dict[int, list[float]] = {}
        for r in agg:
            if r.s is None or r.n == 0:
                continue
            means.setdefault(r.centroid_id, list(cents[r.centroid_id]))[r.pos] = (
                float(r.s) / r.n
            )
        for cid, vec in means.items():
            cents[cid] = vec
    return cents


def with_centroid_id(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "centroid_id",
) -> DataFrame:
    """Assign each vector to its max-cosine centroid (Arrow-batched numpy).

    One ``(batch × dim) @ (dim × C)`` matmul per Arrow batch — the same
    reasoning as the MinHash UDF: a C-way argmax over array columns in
    interpreted higher-order functions loses to one BLAS call by orders of
    magnitude. Writing the result ``partitionBy(out_col)`` makes every later
    probe a partition-pruned scan (the IVF inverted list).
    """
    from tranquility_spark.operators.pandas_fns import make_centroid_assign_udf

    assign = make_centroid_assign_udf(centroids)
    return df.withColumn(out_col, assign(F.col(vec_col)))


# ---------------------------------------------------------------------------
# PQ: product quantization (Jegou et al., TPAMI 2011) — the billion-scale
# compressed-index ANN path (IVF prunes WHICH rows to scan; PQ shrinks WHAT
# each scanned row costs: dim floats -> n_sub one-byte codes)
# ---------------------------------------------------------------------------


def pq_codebooks(
    df: DataFrame,
    n_sub: int = 4,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    refine_iters: int = 1,
) -> list[list[list[float]]]:
    """Deterministic per-subvector codebooks: hash-ordered seed rows sliced
    into subvectors + Lloyd refinement under L2 on each slice.

    Same determinism recipe as ``ivf_centroids`` (seeds = k smallest
    xxhash64(id) rows — one TakeOrdered, no full sort; every refinement is
    one corpus pass whose agg output is n_sub*k*d_sub rows, kilobytes).
    Returns ``books[s][c] = centroid vector of code c in subvector s``.
    """
    seeds = (
        df.select(_as_double(F.col(vec_col)).alias("v"), F.xxhash64(F.col(id_col)).alias("h"))
        .orderBy("h")
        .limit(k)
        .collect()
    )
    if len(seeds) < k:
        # fewer corpus vectors than codes: an empty corpus would otherwise
        # crash opaquely downstream (dim=0 passes the divisibility check,
        # then the encode UDF indexes books[0]), and a short one would
        # silently duplicate codebook rows (ADVICE r07)
        raise ValueError(
            f"pq_codebooks needs at least k={k} vectors, got {len(seeds)}"
        )
    dim = len(seeds[0].v)
    if dim % n_sub != 0:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    d_sub = dim // n_sub
    books = [
        [list(r.v[s * d_sub : (s + 1) * d_sub]) for r in seeds]
        for s in range(n_sub)
    ]
    for _ in range(refine_iters):
        enc = pq_encode(df, books, vec_col)
        # one posexplode pass: position -> (subvector, offset), grouped with
        # that subvector's code; agg output bounded by n_sub*k*d_sub cells
        agg = (
            enc.select("pq_codes", F.posexplode(_as_double(F.col(vec_col))).alias("pos", "x"))
            .select(
                (F.col("pos") / d_sub).cast("int").alias("s"),
                F.pmod(F.col("pos"), F.lit(d_sub)).cast("int").alias("p"),
                F.element_at(F.col("pq_codes"), (F.col("pos") / d_sub).cast("int") + 1).alias("code"),
                "x",
            )
            .groupBy("s", "code", "p")
            # decimal-accumulated mean for the same bit-reproducibility
            # reason as ivf_centroids' Lloyd pass (r12); count the CAST
            # value (not rows), skip all-NULL groups, and try_cast so
            # ANSI mode NULLs rather than throws — the ivf_centroids r13
            # guard, verbatim
            .agg(
                F.sum(F.col("x").try_cast("decimal(38,18)")).alias("m_sum"),
                F.count(F.col("x").try_cast("decimal(38,18)")).alias("m_n"),
            )
            .collect()
        )
        for r in agg:  # codes with no members keep their previous centroid
            if r.m_sum is None or r.m_n == 0:
                continue
            books[r.s][r.code][r.p] = float(r.m_sum) / r.m_n
    return books


def pq_encode(
    df: DataFrame,
    books: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
) -> DataFrame:
    """Append the n_sub argmin-L2 codes per row (Arrow-batched numpy — one
    pairwise-distance matmul per subvector per batch; an interpreted k-way
    argmin over array slices would hit the lambda-CSE trap). This is the
    index-build step: write the codes once, serve every query from them."""
    from tranquility_spark.operators.pandas_fns import make_pq_encode_udf

    return df.withColumn(out_col, make_pq_encode_udf(books)(_as_double(F.col(vec_col))))


def pq_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    books: list[list[list[float]]],
    k: int = 10,
    shortlist: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    use_existing_codes: bool = False,
) -> DataFrame:
    """Approximate top-k via asymmetric distance computation (ADC) + exact
    rerank — the sim4 quantize-then-rescore shape with PQ in the cheap seat.

    The query is NOT quantized: per subvector the driver precomputes
    ``||q_s - c||^2`` for every code (n_sub*k floats), and each stored row's
    approximate distance is the SUM of n_sub literal-array lookups on its
    codes — whole-stage codegen, no UDF, no join at query time. The
    ``shortlist`` smallest take the exact-cosine rerank (TakeOrdered twice,
    no exchange beyond it). Deterministic end-to-end: codebooks, encoding
    and lookups are all seed-free arithmetic.

    ``use_existing_codes=True`` trusts a pre-built ``pq_codes`` column (the
    serving path — codes are written once at ingest); same stale-index
    caveat as ivf_topk's ``use_existing_assignment``: codes built from
    other codebooks silently return wrong neighbors. Default re-encodes.
    """
    n_sub = len(books)
    d_sub = len(books[0][0])
    if use_existing_codes:
        if "pq_codes" not in df.columns:
            raise ValueError(
                "use_existing_codes=True requires a pq_codes column "
                "(a PQ index written via pq_encode)"
            )
        encoded = df
    else:
        encoded = pq_encode(df.drop("pq_codes"), books, vec_col)
    approx = None
    for s in range(n_sub):
        q_s = query_vec[s * d_sub : (s + 1) * d_sub]
        dists = [
            sum((a - b) ** 2 for a, b in zip(q_s, c)) for c in books[s]
        ]
        table = double_array_lit(dists)
        term = F.element_at(table, F.element_at(F.col("pq_codes"), s + 1) + 1)
        approx = term if approx is None else approx + term
    short = (
        encoded.withColumn("__adc", approx)
        .orderBy(F.col("__adc").asc(), F.col(id_col))
        .limit(shortlist)
    )
    v = _as_double(F.col(vec_col))
    q = double_array_lit(query_vec)
    return (
        short.select(F.col(id_col), F.round(cosine(v, q), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_index_write(
    df: DataFrame,
    centroids: list[list[float]],
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Persist the IVF inverted-list layout: vectors assigned and written
    ``partitionBy("centroid_id")`` — the 100 TB serving shape where a
    probe is PARTITION PRUNING, not a scan+filter — plus a
    ``_ivf_meta.json`` sidecar pinning the exact centroids and column
    names the layout was built with (the lsh_band_index lesson: an index
    probed with different parameters silently returns wrong neighbors,
    so the parameters travel WITH the index and the reader validates
    nothing was hand-mixed). The underscore prefix keeps the sidecar
    invisible to parquet directory reads."""
    import json
    import os

    with_centroid_id(df, centroids, vec_col).write.mode("overwrite").partitionBy(
        "centroid_id"
    ).parquet(path)
    meta = {
        "version": 1,
        "centroids": [[float(x) for x in c] for c in centroids],
        "vec_col": vec_col,
        "id_col": id_col,
        "partitioning": ["centroid_id"],
    }
    with open(os.path.join(path, "_ivf_meta.json"), "w", encoding="utf-8") as fh:
        json.dump(meta, fh)


def ivf_index_load(spark, path: str):
    """Open a persisted IVF layout: returns ``(frame, meta)`` with the
    frame partition-discovered on ``centroid_id`` and the meta dict
    carrying the centroids/columns the index was built with. Raises on a
    missing/garbled sidecar — probing an index whose parameters are
    unknown is exactly the silent-wrong-neighbors failure the sidecar
    exists to prevent."""
    import json
    import os

    meta_path = os.path.join(path, "_ivf_meta.json")
    try:
        with open(meta_path, encoding="utf-8") as fh:
            meta = json.load(fh)
        if meta.get("version") != 1 or "centroids" not in meta:
            raise ValueError(f"unrecognized IVF meta at {meta_path}")
    except OSError as ex:
        raise ValueError(
            f"IVF index at {path} has no readable _ivf_meta.json — cannot "
            "validate which centroids built this layout"
        ) from ex
    return spark.read.parquet(path), meta


def ivf_index_append_sink(
    path: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """foreachBatch sink maintaining a persisted IVF layout INCREMENTALLY —
    the ingestion half of the serving story: each micro-batch's vectors
    are assigned with the FIXED centroids and land in
    ``(centroid_id, batch_id)`` partitions under dynamic partition
    overwrite, so a replayed batch REPLACES its own partitions
    byte-identically (assignment is deterministic) instead of
    duplicating vectors — the ``batch_id=`` lifecycle every mergeable
    family here uses, applied to an index layout. ``centroid_id``
    remains the leading partition column, so ``ivf_topk_indexed``'s
    probe prunes exactly as on a one-shot layout; the extra batch_id
    partition rides along untouched.

    The meta sidecar is written on first use and VALIDATED on every
    later batch: appending with different centroids would silently
    corrupt the inverted lists (vectors filed under one geometry, probed
    under another), and appending ``(centroid_id, batch_id)`` partitions
    into a one-shot ``centroid_id``-only layout (``ivf_index_write``)
    would mix two partition structures under one root and break every
    later ``spark.read.parquet`` — so both a centroid mismatch AND a
    recorded-partitioning mismatch raise instead (ADVICE r10 #2).
    Re-clustering or re-layout requires a rebuild — the standard IVF
    operational contract."""
    import json
    import os

    def write(batch_df: DataFrame, batch_id: int) -> None:
        meta_path = os.path.join(path, "_ivf_meta.json")
        meta = {
            "version": 1,
            "centroids": [[float(x) for x in c] for c in centroids],
            "vec_col": vec_col,
            "id_col": id_col,
            "partitioning": ["centroid_id", "batch_id"],
        }
        if os.path.exists(meta_path):
            with open(meta_path, encoding="utf-8") as fh:
                existing = json.load(fh)
            if existing.get("centroids") != meta["centroids"]:
                raise ValueError(
                    f"IVF layout at {path} was built with DIFFERENT "
                    "centroids — appending would corrupt the inverted "
                    "lists; rebuild the index instead"
                )
            # metas predating the "partitioning" key were only ever
            # written by the one-shot writers → centroid_id-only layout
            if existing.get("partitioning", ["centroid_id"]) != meta[
                "partitioning"
            ]:
                raise ValueError(
                    f"IVF layout at {path} is partitioned by "
                    f"{existing.get('partitioning', ['centroid_id'])}, not "
                    "(centroid_id, batch_id) — appending would mix two "
                    "partition structures under one root and break reads; "
                    "rebuild the index with the append layout instead"
                )
        (
            with_centroid_id(batch_df, centroids, vec_col)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("centroid_id", "batch_id")
            .parquet(path)
        )
        if not os.path.exists(meta_path):
            tmp = f"{meta_path}.tmp.{os.getpid()}"
            with open(tmp, "w", encoding="utf-8") as fh:
                json.dump(meta, fh)
            os.replace(tmp, meta_path)

    return write


def ivfpq_index_append_sink(
    path: str,
    centroids: list[list[float]],
    books: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """``ivf_index_append_sink``'s IVF-PQ twin: each micro-batch is
    assigned AND PQ-encoded with the fixed parameters, landing in the
    same replay-safe ``(centroid_id, batch_id)`` partitions; the meta
    sidecar pins centroids and codebooks and every later batch validates
    BOTH (codes filed under different codebooks would ADC-score as
    garbage, the same silent corruption as a geometry mismatch) plus the
    recorded partitioning (appending batch partitions into a one-shot
    ``ivfpq_index_write`` layout would mix partition structures and
    break reads — ADVICE r10 #2)."""
    import json
    import os

    def write(batch_df: DataFrame, batch_id: int) -> None:
        meta_path = os.path.join(path, "_ivf_meta.json")
        meta = {
            "version": 1,
            "centroids": [[float(x) for x in c] for c in centroids],
            "books": [[[float(x) for x in c] for c in b] for b in books],
            "vec_col": vec_col,
            "id_col": id_col,
            "partitioning": ["centroid_id", "batch_id"],
        }
        if os.path.exists(meta_path):
            with open(meta_path, encoding="utf-8") as fh:
                existing = json.load(fh)
            if (
                existing.get("centroids") != meta["centroids"]
                or existing.get("books") != meta["books"]
            ):
                raise ValueError(
                    f"IVF-PQ layout at {path} was built with DIFFERENT "
                    "centroids/codebooks — appending would corrupt the "
                    "index; rebuild instead"
                )
            if existing.get("partitioning", ["centroid_id"]) != meta[
                "partitioning"
            ]:
                raise ValueError(
                    f"IVF-PQ layout at {path} is partitioned by "
                    f"{existing.get('partitioning', ['centroid_id'])}, not "
                    "(centroid_id, batch_id) — appending would mix two "
                    "partition structures under one root and break reads; "
                    "rebuild the index with the append layout instead"
                )
        (
            pq_encode(
                with_centroid_id(batch_df, centroids, vec_col), books, vec_col
            )
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("centroid_id", "batch_id")
            .parquet(path)
        )
        if not os.path.exists(meta_path):
            tmp = f"{meta_path}.tmp.{os.getpid()}"
            with open(tmp, "w", encoding="utf-8") as fh:
                json.dump(meta, fh)
            os.replace(tmp, meta_path)

    return write


def ivfpq_index_write(
    df: DataFrame,
    centroids: list[list[float]],
    books: list[list[list[float]]],
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Persist the full IVF-PQ layout (Jegou et al.'s billion-scale
    shape, composed from the two halves this module already certifies):
    rows carry their PQ codes AND land partitioned by centroid_id, so a
    query is partition pruning (IVF: WHICH rows) over 4-byte codes (PQ:
    WHAT each row costs) with the raw vector retained for the exact
    rerank of the shortlist only. Meta sidecar pins centroids AND
    codebooks — the layout is unreadable-by-design without the exact
    parameters that built it."""
    import json
    import os

    encoded = pq_encode(with_centroid_id(df, centroids, vec_col), books, vec_col)
    encoded.write.mode("overwrite").partitionBy("centroid_id").parquet(path)
    meta = {
        "version": 1,
        "centroids": [[float(x) for x in c] for c in centroids],
        "books": [[[float(x) for x in c] for c in b] for b in books],
        "vec_col": vec_col,
        "id_col": id_col,
        "partitioning": ["centroid_id"],
    }
    with open(os.path.join(path, "_ivf_meta.json"), "w", encoding="utf-8") as fh:
        json.dump(meta, fh)


def ivfpq_topk_indexed(
    spark,
    path: str,
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    shortlist: int = 100,
) -> DataFrame:
    """Serve from a persisted IVF-PQ layout: driver-side centroid ranking
    (sidecar centroids) → partition-pruned scan of the probed lists →
    ADC over the stored codes (literal-array lookups in codegen, no
    UDF/join) → exact-cosine rerank of the shortlist. Equal by
    construction to filtering the probed lists and running ``pq_topk``
    with ``use_existing_codes=True`` — the composition the sim5
    docstring promises, made literal."""
    import math

    frame, meta = ivf_index_load(spark, path)
    if "books" not in meta:
        raise ValueError(
            f"index at {path} is IVF-only (no PQ codebooks in meta); "
            "serve it with ivf_topk_indexed or rebuild via ivfpq_index_write"
        )
    cents = meta["centroids"]
    qn = math.sqrt(sum(x * x for x in query_vec)) or 1e-12
    probe = sorted(
        range(len(cents)),
        key=lambda i: -(
            sum(a * b for a, b in zip(query_vec, cents[i]))
            / (qn * (math.sqrt(sum(x * x for x in cents[i])) or 1e-12))
        ),
    )[:nprobe]
    return pq_topk(
        frame.filter(F.col("centroid_id").isin(probe)),
        query_vec,
        meta["books"],
        k=k,
        shortlist=shortlist,
        vec_col=meta["vec_col"],
        id_col=meta["id_col"],
        use_existing_codes=True,
    )


def ivf_topk_indexed(
    spark,
    path: str,
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Serve an ANN query from a PERSISTED IVF index: centroid ranking is
    driver-side arithmetic over the sidecar's centroids; the data access
    is a literal ``centroid_id IN (...)`` over the partitioned layout,
    which the planner turns into partition pruning (plan-asserted in
    tests — only ~nprobe/C of the files are touched at any corpus size);
    then exact cosine + TakeOrderedAndProject inside the probed lists.
    Results equal ``ivf_topk`` with the same centroids by construction
    (same ranking, same scoring expression)."""
    frame, meta = ivf_index_load(spark, path)
    return ivf_topk(
        frame,
        query_vec,
        k=k,
        nprobe=nprobe,
        vec_col=meta["vec_col"],
        id_col=meta["id_col"],
        centroids=meta["centroids"],
        use_existing_assignment=True,
    )


def ivf_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
    use_existing_assignment: bool = False,
) -> DataFrame:
    """Approximate top-k via IVF: probe the ``nprobe`` nearest inverted lists.

    Query→centroid ranking is driver-side arithmetic (C is tiny); the cluster
    work is a filter on ``centroid_id`` — partition pruning on an IVF-
    partitioned layout — followed by exact cosine + TakeOrderedAndProject
    inside ~nprobe/n_centroids of the data. Pass precomputed ``centroids``
    to reuse an index across queries (the normal serving shape).

    ``use_existing_assignment=True`` additionally trusts a pre-existing
    ``centroid_id`` column as the inverted-list layout (the partition-pruned
    serving path — a literal IN-filter the planner pushes into partition
    pruning; re-deriving through the assignment UDF cannot prune). It is
    opt-in because correctness then depends on the layout having been built
    with THESE centroids: a column built from different centroids/seed would
    silently return wrong neighbors. Default recomputes the assignment.
    """
    import math

    cents = centroids if centroids is not None else ivf_centroids(df, n_centroids, vec_col, id_col)
    qn = math.sqrt(sum(x * x for x in query_vec)) or 1e-12

    def cos_q(c: list[float]) -> float:
        cn = math.sqrt(sum(x * x for x in c)) or 1e-12
        return sum(a * b for a, b in zip(query_vec, c)) / (qn * cn)

    probe = sorted(range(len(cents)), key=lambda i: -cos_q(cents[i]))[:nprobe]

    if use_existing_assignment:
        if "centroid_id" not in df.columns:
            raise ValueError(
                "use_existing_assignment=True requires a centroid_id column "
                "(an IVF-partitioned layout written via with_centroid_id)"
            )
        assigned = df
    else:
        assigned = with_centroid_id(df.drop("centroid_id"), cents, vec_col)
    v = _as_double(F.col(vec_col))
    q = double_array_lit(query_vec)
    return (
        assigned.filter(F.col("centroid_id").isin(probe))
        .select(F.col(id_col), F.round(cosine(v, q), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
