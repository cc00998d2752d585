"""Arrow-batched pandas UDFs (scalar) used by the dedup/similarity operators.

NOTE: no ``from __future__ import annotations`` here — pyspark resolves pandas
UDF type hints at decoration time and needs real types, not strings.
"""

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


def _simhash64_one(text: str) -> int:
    """Reference SimHash of ONE text — the naive spec the optimized batch
    UDF below must match bit-for-bit (the GK `_merge_cuts_naive` pattern;
    pinned by a hypothesis test). blake2b token hashes vote per bit."""
    positions = np.arange(64, dtype=np.uint64)
    votes = np.zeros(64, dtype=np.int64)
    for tok in (text or "").split():
        h = np.uint64(
            int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
        )
        bits = ((h >> positions) & np.uint64(1)).astype(np.int64)
        votes += 2 * bits - 1
    sig = 0
    for b in range(64):
        if votes[b] > 0:
            sig |= 1 << b
    return sig - (1 << 64) if sig >= (1 << 63) else sig


@pandas_udf("long")
def simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash per text: blake2b token hashes vote per bit position.

    Deterministic (no randomness). The bit-vote loop is genuinely awkward
    as Spark SQL expressions (64 aggregates per row) — the canonical case
    for a pandas UDF (SURVEY.md §7 phase 4).

    r12 rewrite (bit-identical to :func:`_simhash64_one` — votes are
    INTEGER sums, so any evaluation order gives the same signature;
    equality pinned by hypothesis): token hashes are memoized per batch
    (Zipf — stopwords repeat constantly, so blake2b runs once per
    DISTINCT token) and each doc's 64 bit-votes come from one
    (tokens x 64) unpack + column sum instead of a per-token Python
    loop. Measured ~3x on the documents fixture."""
    memo: dict = {}
    positions = np.arange(64, dtype=np.uint64)
    out = np.zeros(len(texts), dtype=np.int64)
    powers = (np.uint64(1) << positions).astype(np.uint64)
    for i, t in enumerate(texts):
        toks = (t or "").split()
        if not toks:
            out[i] = 0
            continue
        hs = np.empty(len(toks), dtype=np.uint64)
        for j, tok in enumerate(toks):
            h = memo.get(tok)
            if h is None:
                h = np.uint64(
                    int.from_bytes(
                        hashlib.blake2b(tok.encode(), digest_size=8).digest(),
                        "big",
                    )
                )
                memo[tok] = h
            hs[j] = h
        # (T x 64) bit matrix -> per-bit vote sums in one vectorized pass
        bits = ((hs[:, None] >> positions[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        votes = (2 * bits - 1).sum(axis=0)
        sig = int(((votes > 0).astype(np.uint64) * powers).sum(dtype=np.uint64))
        out[i] = sig - (1 << 64) if sig >= (1 << 63) else sig
    return pd.Series(out)


# Marked non-deterministic (r18 optimization round, guide §4.4): the value
# IS deterministic, but the flag stops the optimizer duplicating the
# expensive UDF when a pushed-down filter references its output column
# (dd17's plan carried doubled ArrowEvalPython nodes per reference). The
# only production call site wraps it in a plain Project, so no legitimate
# optimization is lost.
#
# USAGE CONSTRAINT (ADVICE r18 #4 — this flag is global to every consumer):
# Catalyst only allows non-deterministic expressions in Project / Filter /
# Aggregate positions. Referencing this UDF's OUTPUT COLUMN from a later
# Project/Filter is fine (that is what every call site does), but putting
# the UDF CALL ITSELF inside a JOIN CONDITION raises AnalysisException at
# plan time (a groupBy key is an Aggregate position and analyzes, but
# re-evaluates the UDF — don't). Materialize the value in a
# .withColumn/.select first and join/group on the materialized column —
# guarded by tests/test_operators.py::test_nondeterministic_udf_call_positions.
simhash64 = simhash64.asNondeterministic()


def make_minhash_udf(coeffs, shingle_k: int, prime: int):
    """Build an Arrow-batched MinHash signature UDF for the given permutations.

    Why a UDF and not higher-order functions: Spark's transform/aggregate
    lambdas are interpreted per element (no whole-stage codegen), which made
    the pure-SQL signature ~8x slower at equal output (measured at sf0.1:
    5.5s SQL vs 0.7s warm UDF for 5k docs). Per batch this is one numpy
    broadcast: (h[:,None] * A + B) % p, min over the shingle axis. crc32 is
    the shingle hash — C-speed and deterministic. Operands stay < 2^63:
    h, a, b < p = 1e9+7 so a*h < ~1e18.
    """
    import zlib

    A = np.array([a for a, _ in coeffs], dtype=np.int64)
    B = np.array([b for _, b in coeffs], dtype=np.int64)

    @pandas_udf("array<long>")
    def minhash_sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = (t or "").split()
            if len(toks) < shingle_k:
                out.append(None)
                continue
            shingles = {
                " ".join(toks[i : i + shingle_k]) for i in range(len(toks) - shingle_k + 1)
            }
            h = (
                np.fromiter(
                    (zlib.crc32(s.encode()) for s in shingles),
                    dtype=np.int64,
                    count=len(shingles),
                )
                % prime
            )
            out.append(((h[:, None] * A[None, :] + B[None, :]) % prime).min(axis=0))
        return pd.Series(out)

    # Non-deterministic for the same §4.4 reason as simhash64 above: the
    # lsh_band_index filter on the signature column otherwise evaluates
    # the UDF twice per row (pushed filter + projection — dd2's plan
    # carried 8 ArrowEvalPython nodes for 4 references). Same usage
    # constraint as simhash64 (ADVICE r18 #4): the call itself in a join
    # condition raises at analysis time — join/group on the materialized
    # column instead.
    return minhash_sig.asNondeterministic()


def make_centroid_assign_udf(centroids):
    """Max-cosine centroid assignment: one (batch x dim) @ (dim x C) matmul per
    Arrow batch. Lives here because this module has no
    ``from __future__ import annotations`` (pandas_udf needs real type hints).
    """
    C = np.array(centroids, dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    @pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        M = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        if M.ndim != 2:  # empty batch
            return pd.Series([], dtype="int32")
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series((Mn @ Cn.T).argmax(axis=1).astype("int32"))

    return assign


def make_pq_encode_udf(codebooks):
    """Product-quantization encoder: for each subvector, the argmin-L2 code
    against that subvector's codebook — one (batch x d_sub) pairwise-distance
    matmul per subvector per Arrow batch (||x-c||^2 = ||x||^2 - 2 x.c +
    ||c||^2; argmin needs only the last two terms). Returns array<int> of
    ``len(codebooks)`` codes per row. Lives here for the same no-future-
    annotations reason as the centroid assigner."""
    books = [np.array(b, dtype=np.float64) for b in codebooks]
    d_sub = books[0].shape[1]
    c_sq = [np.sum(b * b, axis=1) for b in books]  # ||c||^2 per code

    @pandas_udf("array<int>")
    def encode(vecs: pd.Series) -> pd.Series:
        M = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        if M.ndim != 2:  # empty batch
            return pd.Series([], dtype="object")
        codes = np.empty((M.shape[0], len(books)), dtype=np.int32)
        for s, (B, csq) in enumerate(zip(books, c_sq)):
            X = M[:, s * d_sub : (s + 1) * d_sub]
            codes[:, s] = (csq[None, :] - 2.0 * (X @ B.T)).argmin(axis=1)
        return pd.Series(list(codes))

    return encode
