"""Replicate the driver's CORRECTNESS compare locally.

Runs each ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01 and compares rows / schema / value-hash. Canonicalization deliberately
goes THROUGH pandas on the DuckDB side (``.df()``), like the driver does —
round 1 taught us that DuckDB HUGEINT (e.g. SUM(BIGINT)) lands as float64 in
pandas, so a fetchall()-based check passes where the driver fails.

Usage: python scripts/check_oracles.py [query ...]   (no args = all)
"""

import sys
import hashlib
import math
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from grandine_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _canon(df: pd.DataFrame) -> list[str]:
    df = df[sorted(df.columns)]
    rows = ["|".join(_norm_cell(v) for v in rec) for rec in df.itertuples(index=False)]
    return sorted(rows)


def _hash(lines) -> str:
    h = hashlib.sha256()
    for l in lines:
        h.update(l.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main(names):
    spark = get_spark()
    qs = E.queries()
    orc = E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    todo = names or list(qs)
    n_bad = 0
    for name in todo:
        try:
            sdf = qs[name](spark, SF).toPandas()
            if name not in orc:
                print(f"{name:24s} rows={len(sdf)} (no_oracle)")
                continue
            odf = con.execute(orc[name]).df()
            rows_ok = len(sdf) == len(odf)
            cols_ok = sorted(sdf.columns) == sorted(odf.columns)
            sc, oc = _canon(sdf), _canon(odf)
            hash_ok = _hash(sc) == _hash(oc)
            flag = "OK " if (rows_ok and cols_ok and hash_ok) else "FAIL"
            if flag == "FAIL":
                n_bad += 1
            print(
                f"{name:24s} {flag} rows={len(sdf)}/{len(odf)}"
                f" cols={cols_ok} hash={hash_ok}"
            )
            if not hash_ok and rows_ok and cols_ok:
                diff_s = [l for l in sc if l not in set(oc)][:3]
                diff_o = [l for l in oc if l not in set(sc)][:3]
                for l in diff_s:
                    print(f"    spark : {l[:160]}")
                for l in diff_o:
                    print(f"    oracle: {l[:160]}")
        except Exception as ex:  # noqa: BLE001
            n_bad += 1
            print(f"{name:24s} ERROR {str(ex)[:300]}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main(sys.argv[1:])
