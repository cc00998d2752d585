"""Arrow-batched pandas UDFs (scalar) used by the dedup/similarity operators.

NOTE: no ``from __future__ import annotations`` here — pyspark resolves pandas
UDF type hints at decoration time and needs real types, not strings.
"""

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash per text: blake2b token hashes vote per bit position.

    Deterministic (no randomness); numpy-vectorized per batch. The bit-vote
    loop is genuinely awkward as Spark SQL expressions (64 aggregates per
    row) — the canonical case for a pandas UDF (SURVEY.md §7 phase 4).
    """
    out = np.zeros(len(texts), dtype=np.int64)
    positions = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        votes = np.zeros(64, dtype=np.int64)
        for tok in (t or "").split():
            h = np.uint64(
                int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
            )
            bits = ((h >> positions) & np.uint64(1)).astype(np.int64)
            votes += 2 * bits - 1
        sig = 0
        for b in range(64):
            if votes[b] > 0:
                sig |= 1 << b
        out[i] = sig - (1 << 64) if sig >= (1 << 63) else sig
    return pd.Series(out)
