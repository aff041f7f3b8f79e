#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [--out RECORD.json]

With --out, additionally writes a driver-shaped per-query record
({name: {rows_match, schema_match, hash_match, spark_rows,
oracle_rows, err}}) — the self-produced correctness artifact
(CORRECTNESS_SELF.json) committed each round so the round record
never depends on a single external harness run.

Reads each <outDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB with every
<sfDir>/*.parquet registered as a view under its stem name, and
compares row counts, sorted column names, and value hashes.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to naive utc strings, floats to 9 sig decimals
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v.tolist()) if hasattr(v, "tolist") else v)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    args = sys.argv[1:]
    record_path = None
    if "--out" in args:
        i = args.index("--out")
        if i + 1 >= len(args):
            print("usage: check.py <sfDir> <verifyOutDir> [--out RECORD.json]",
                  file=sys.stderr)
            return 2
        record_path = Path(args[i + 1])
        args = args[:i] + args[i + 2:]
    if len(args) < 2:
        print("usage: check.py <sfDir> <verifyOutDir> [--out RECORD.json]",
              file=sys.stderr)
        return 2
    sf_dir, out_dir = Path(args[0]), Path(args[1])
    record = {}

    def rec(name, rows_match=False, schema_match=False, hash_match=False,
            spark_rows=None, oracle_rows=None, err=None):
        record[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err}

    con = duckdb.connect()
    for p in sorted(sf_dir.glob("*.parquet")):
        con.execute(
            f"CREATE VIEW {p.stem} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.loads((out_dir / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = out_dir / name
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output")
            rec(name, err="no spark output")
            n_fail += 1
            continue
        marker = spark_dir / "_ERROR.json"
        if marker.exists():
            # Verify wrote a failure marker: report the actual Spark
            # error, not a parquet-read stack trace
            err = json.loads(marker.read_text()).get("error", "?")
            print(f"FAIL {name}: query threw: {err}")
            rec(name, err=f"query threw: {err}")
            n_fail += 1
            continue
        try:
            got = canon(pd.read_parquet(spark_dir))
            want = canon(con.execute(sql).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            rec(name, err=str(e)[:500])
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(want.columns)}")
            rec(name, rows_match=len(got) == len(want),
                spark_rows=len(got), oracle_rows=len(want))
            n_fail += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            rec(name, schema_match=True, spark_rows=len(got), oracle_rows=len(want))
            n_fail += 1
        elif not got.equals(want):
            neq = (got != want).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())}/{len(got)} rows differ; first:")
            print(pd.concat({"spark": got[neq].head(3), "duck": want[neq].head(3)}))
            rec(name, rows_match=True, schema_match=True,
                spark_rows=len(got), oracle_rows=len(want))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            rec(name, rows_match=True, schema_match=True, hash_match=True,
                spark_rows=len(got), oracle_rows=len(want))
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if record_path is not None:
        record_path.write_text(json.dumps(record, indent=1, sort_keys=True) + "\n")
        print(f"record -> {record_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
