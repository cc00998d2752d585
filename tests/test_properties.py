"""Property-based tests (hypothesis) for the engine's cross-engine contracts.

These target the pure parts where a silent mismatch would corrupt every
oracle comparison built on them: the ISO-duration parser, the portable shard
hash (must compute identically in Spark SQL and DuckDB SQL), and granularity
truncation (Spark expression vs DuckDB fragment). DuckDB is the counterpart
engine here — no SparkSession needed, so hundreds of examples stay cheap.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tranquility_spark.operators.partitioning import _MULT, _PRIME, _REDUCE, portable_shard_sql
from tranquility_spark.operators.window_filter import window_period_seconds
from tranquility_spark.specs import Granularity


@given(
    h=st.integers(min_value=0, max_value=48),
    m=st.integers(min_value=0, max_value=600),
    s=st.integers(min_value=0, max_value=600),
)
def test_duration_parser_roundtrip(h, m, s):
    assert window_period_seconds(f"PT{h}H{m}M{s}S") == h * 3600 + m * 60 + s


@given(st.integers(min_value=-(2**62), max_value=2**62))
@settings(max_examples=50)
def test_portable_shard_sql_matches_python(key):
    """The DuckDB fragment must equal the Python/Spark formula for any key —
    including negative keys, where DuckDB's sign-preserving % needs the
    pmod wrap (Python's % is already non-negative, like Spark's pmod)."""
    n = 8
    expected = (((key % _REDUCE) * _MULT) % _PRIME) % n
    got = duckdb.sql(f"SELECT {portable_shard_sql(str(key), n)} AS s").fetchone()[0]
    assert got == expected


_PERIODS = ["FIVE_MINUTE", "TEN_MINUTE", "FIFTEEN_MINUTE", "THIRTY_MINUTE", "SIX_HOUR"]


@given(
    epoch=st.integers(min_value=0, max_value=4_000_000_000),
    gran=st.sampled_from(_PERIODS),
)
@settings(max_examples=50)
def test_period_granularity_truncate_sql_matches_arithmetic(epoch, gran):
    g = Granularity(gran)
    secs = {"FIVE_MINUTE": 300, "TEN_MINUTE": 600, "FIFTEEN_MINUTE": 900,
            "THIRTY_MINUTE": 1800, "SIX_HOUR": 21600}[gran]
    frag = g.truncate_sql(f"epoch_ms(CAST({epoch} AS BIGINT) * 1000)")
    got = duckdb.sql(f"SELECT epoch({frag}) AS e").fetchone()[0]
    assert int(got) == (epoch // secs) * secs


@given(
    epoch=st.integers(min_value=0, max_value=4_000_000_000),
    gran=st.sampled_from(["SECOND", "MINUTE", "HOUR", "DAY"]),
)
@settings(max_examples=50)
def test_calendar_granularity_truncate_sql_is_floor(epoch, gran):
    """Calendar truncation via date_trunc never exceeds the input and lands on
    a unit boundary."""
    g = Granularity(gran)
    frag = g.truncate_sql(f"epoch_ms(CAST({epoch} AS BIGINT) * 1000)")
    got = int(duckdb.sql(f"SELECT epoch({frag}) AS e").fetchone()[0])
    unit = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600, "DAY": 86400}[gran]
    assert got <= epoch
    assert got % unit == 0
    assert epoch - got < unit


@pytest.mark.parametrize("bad", ["10M", "PTXM", "P1D", ""])
def test_duration_parser_rejects_malformed(bad):
    with pytest.raises(ValueError):
        window_period_seconds(bad)


@given(
    key=st.integers(min_value=-(2**62), max_value=2**62),
    i=st.integers(min_value=0, max_value=7),
)
@settings(max_examples=50)
def test_bloom_cms_pos_sql_matches_python(key, i):
    """The shared bloom/CMS portable bit/column position: the DuckDB
    fragment must equal the Python restatement of the Spark expression for
    any key and hash index — negative keys exercise the pmod wrap, and the
    bloom (m=65536) and CMS (width=1024) moduli both ride on it. A silent
    mismatch here would corrupt the dd9/dd10/dd11/hh2 certifications at
    the root."""
    from tranquility_spark.operators.bloom import _STRIDE, bloom_pos_sql

    for m in (65536, 1024):
        mixed = key + i * _STRIDE
        expected = (((mixed % _REDUCE) * _MULT) % _PRIME) % m
        got = duckdb.sql(
            f"SELECT {bloom_pos_sql(str(key), i, m)} AS p"
        ).fetchone()[0]
        assert got == expected, (key, i, m)
