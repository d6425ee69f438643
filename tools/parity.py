"""Standalone per-query oracle parity check for the optimization rounds.

Usage:
    python tools/parity.py NAME [NAME ...] [--sf DIR ...]

Mirrors tests/test_oracle_parity.py exactly (dtype-kind assert, sorted
order-insensitive exact-value compare) so a touched query can be proved
result-identical at sf0.001 + sf0.01 without a full suite run.
"""

from __future__ import annotations

import argparse
import sys

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def _dtype_kind(s: pd.Series) -> str:
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "object"


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", nargs="*",
                    default=["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
    args = ap.parse_args()

    from big_data_hw_23_24_spark.queries import _ensure_loaded, _REGISTRY
    from big_data_hw_23_24_spark.session import get_session
    from big_data_hw_23_24_spark.sources.tables import TABLE_NAMES

    spark = get_session("parity")
    _ensure_loaded()
    failed = []
    for name in args.names:
        q = _REGISTRY[name]
        for sf_dir in args.sf:
            got = q.spark_fn(spark, sf_dir).toPandas()
            if q.oracle is None:
                ok = got.shape[0] >= 0 and list(got.columns)
                print(f"{name} @ {sf_dir}: no-oracle runnable "
                      f"({got.shape[0]} rows) {'OK' if ok else 'FAIL'}")
                if not ok:
                    failed.append((name, sf_dir))
                continue
            con = duckdb.connect()
            for t in TABLE_NAMES:
                con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"'{sf_dir}/{t}.parquet'")
            want = con.sql(q.oracle).df()
            con.close()
            try:
                assert sorted(got.columns) == sorted(want.columns), \
                    f"columns {sorted(got.columns)} vs {sorted(want.columns)}"
                for c in got.columns:
                    gk, wk = _dtype_kind(got[c]), _dtype_kind(want[c])
                    assert gk == wk, f"{c}: dtype kind {gk} vs {wk}"
                g, w = _normalize(got), _normalize(want)
                assert len(g) == len(w), f"rows {len(g)} vs {len(w)}"
                pd.testing.assert_frame_equal(g, w, check_exact=True,
                                              check_dtype=False, obj=name)
                print(f"{name} @ {sf_dir}: PARITY OK ({len(g)} rows)")
            except AssertionError as e:
                print(f"{name} @ {sf_dir}: PARITY FAIL — {e}")
                failed.append((name, sf_dir))
    if failed:
        print("FAILED:", failed)
        return 1
    print("ALL GREEN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
