#!/usr/bin/env python3
"""Dev-only local mirror of the driver's DuckDB-oracle correctness gate.

Usage:  python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
SQL in DuckDB against views over <sfDir>/*.parquet, loads the Spark
result parquet from <verifyOutDir>/<name>/, sorts columns by name and
rows by all columns, and diffs. NOT part of the shipped library — the
engine itself is pure Scala/Spark.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize list/array cells to tuples so sorting/eq work
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or hasattr(v, "tolist") and not pd.api.types.is_scalar(v)).any():
            df[c] = df[c].map(lambda v: tuple(v.tolist()) if hasattr(v, "tolist") else (tuple(v) if isinstance(v, (list, tuple)) else v))
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = Path(out_dir) / name
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output dir")
            n_bad += 1
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df())
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_bad += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_bad += 1
        else:
            # DTYPE-STRICT, driver-faithful compare (r16 verdict #1/#2):
            # the driver hashes a string serialization of cell values, so a
            # pandas dtype divergence (e.g. DuckDB HUGEINT -> float64 "1435.0"
            # vs Spark int64 "1435") is a driver red even when values compare
            # equal numerically. Mirror BOTH failure modes: exact value
            # equality AND equality of the stringified frames; also surface
            # the dtype diff itself so the publish-dtype convention ("every
            # published column explicitly cast") stays enforced.
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
            except AssertionError as e:
                print(f"FAIL {name}: value mismatch\n{str(e)[:800]}")
                n_bad += 1
                continue
            dt_bad = [(c, str(got[c].dtype), str(want[c].dtype))
                      for c in got.columns if str(got[c].dtype) != str(want[c].dtype)]
            gs = got.astype(str)
            ws = want.astype(str)
            if not gs.equals(ws):
                diff = [(c, gs[c][gs[c] != ws[c]].head(3).tolist(),
                         ws[c][gs[c] != ws[c]].head(3).tolist())
                        for c in gs.columns if not gs[c].equals(ws[c])]
                print(f"FAIL {name}: stringified-hash mismatch (driver-red class) "
                      f"dtypes={dt_bad} diff={str(diff)[:600]}")
                n_bad += 1
            elif dt_bad:
                print(f"FAIL {name}: dtype mismatch spark-vs-oracle {dt_bad}")
                n_bad += 1
            else:
                print(f"ok   {name} ({len(got)} rows)")
    extra = set(json.loads((Path(out_dir) / "oracle_sql.json").read_text())) - set(oracle)
    print(f"== {len(oracle) - n_bad}/{len(oracle)} oracle-matched ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
