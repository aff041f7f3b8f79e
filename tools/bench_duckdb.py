#!/usr/bin/env python3
"""Time the headline queries' oracle SQL in DuckDB → baseline JSONL.

Usage: python3 tools/bench_duckdb.py <sfDir> <oracle_sql.json> [out.jsonl]

Runs EVERY query in the given oracle_sql.json (the same statements the
correctness gate executes) against <sfDir>/*.parquet views: one warm-up
execution, then the median of 3 timed runs, all cores. The query set
is controlled by the oracle file — generate it from the single source
of truth with

    sbt "runMain graft.Verify <sfDir> <out> $(comma-joined Bench.headline)"

so this tool never re-lists the headline names. Appends one JSON line
per query to the baseline file (default tools/duckdb_baseline.jsonl),
replacing any prior lines for the same scale factor — graft.Bench
reads this file to emit per-query duckdb_s/ratio columns, so the
Spark-vs-DuckDB conversation happens inside BENCH_r*.json instead of
being re-derived every round.
"""
import json
import statistics
import sys
import time
from pathlib import Path

import duckdb


def main() -> int:
    sf_dir = Path(sys.argv[1])
    oracles = json.loads(Path(sys.argv[2]).read_text())
    out_path = Path(sys.argv[3]) if len(sys.argv) > 3 else (
        Path(__file__).parent / "duckdb_baseline.jsonl")
    sf = sf_dir.name
    con = duckdb.connect()
    for p in sorted(sf_dir.glob("*.parquet")):
        # ScaleUp writes each table as a DIRECTORY of part files
        # (Spark's native layout); glob inside it for DuckDB
        src = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.execute(
            f"CREATE VIEW {p.stem} AS SELECT * FROM read_parquet('{src}')")
    fresh = []
    for name, sql in sorted(oracles.items()):
        con.execute(sql).df()  # warm-up (parquet metadata, buffers)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).df()
            times.append(time.perf_counter() - t0)
        sec = statistics.median(times)
        fresh.append({"sf": sf, "query": name, "duckdb_s": round(sec, 4)})
        print(f"{name}: {sec:.4f}s")
    kept = []
    if out_path.exists():
        kept = [json.loads(l) for l in out_path.read_text().splitlines()
                if l.strip() and json.loads(l).get("sf") != sf]
    out_path.write_text(
        "".join(json.dumps(r) + "\n" for r in kept + fresh))
    print(f"wrote {len(fresh)} rows for {sf} to {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
