"""Local mini-driver: run every catalog query against its DuckDB oracle.

Mimics the driver's CORRECTNESS check (row-count + schema + order-insensitive
value compare) so we catch mismatches before the round gate does.

Usage: python scripts/check_parity.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            # bytes/bytearray (binary columns) are unhashable/unsortable in
            # pandas — normalize to hex strings for the value compare
            if df[c].map(lambda v: isinstance(v, (bytes, bytearray))).any():
                df[c] = df[c].map(
                    lambda v: bytes(v).hex() if isinstance(v, (bytes, bytearray)) else v
                )
        elif str(df[c].dtype).lower().startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"columns: spark={s_cols} oracle={o_cols}")
        return problems
    if problems:
        return problems
    s, o = normalize(spark_pdf), normalize(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if str(sv.dtype).startswith("float"):
            both_nan = sv.isna() & ov.isna()
            eq = (sv == ov) | both_nan
            if not eq.all():
                bad = (~eq).idxmax()
                diff = (sv - ov).abs().max()
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches, max|diff|={diff!r} "
                    f"e.g. spark={sv[bad]!r} oracle={ov[bad]!r}"
                )
        else:
            eq = (sv == ov) | (sv.isna() & ov.isna())
            if not eq.all():
                bad = (~eq).idxmax()
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches e.g. spark={sv[bad]!r} oracle={ov[bad]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as ent
    from tranquility_spark.session import get_spark

    spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS FROM read_parquet('{path}')")

    qs = ent.queries()
    oracles = ent.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (rows-only, {time.time()-t0:.1f}s)")
            if len(sdf) == 0:
                failed.append(name)
                print(f"FAIL  {name}: rows-only query returned 0 rows")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        problems = compare(sdf, odf)
        if problems:
            failed.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"OK    {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
