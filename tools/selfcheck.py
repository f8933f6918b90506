"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB over the same parquet tables,
compare row count + order-insensitive value hash (columns sorted by name).

Usage: python tools/selfcheck.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sms_db_spark.session import get_spark  # noqa: E402
from sms_db_spark.tables import TABLE_NAMES  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("bool")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            rep = s.map(lambda v: repr(float(v)) if pd.notna(v) else "NULL")
        else:
            rep = s.map(lambda v: "NULL" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))
        h.update(("\x01".join(rep.tolist()) + "\x02" + c).encode())
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = normalize(fn(spark, sf_dir).toPandas())
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"okNA {name}: rows={len(sdf)} (rows-only, no oracle) [{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            odf = normalize(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        status = []
        if len(sdf) != len(odf):
            status.append(f"rowcount spark={len(sdf)} duck={len(odf)}")
        if list(sdf.columns) != list(odf.columns):
            status.append(f"cols spark={list(sdf.columns)} duck={list(odf.columns)}")
        if not status and value_hash(sdf) != value_hash(odf):
            status.append("value-hash mismatch")
            # show first differing rows for debug
            for i in range(min(len(sdf), 2000)):
                if not sdf.iloc[i].equals(odf.iloc[i]):
                    print(f"  first diff row {i}:\n   spark: {sdf.iloc[i].to_dict()}\n   duck:  {odf.iloc[i].to_dict()}")
                    break
        if status:
            print(f"FAIL {name}: {'; '.join(status)} [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
