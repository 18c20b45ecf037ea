#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <outDir> <sfDir> [query ...]

Reads each <outDir>/<name> parquet (Spark output) and runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB with tables registered
as views over <sfDir>/*.parquet. Sorts columns by name, sorts rows, and
compares cell-by-cell. Prints PASS/FAIL per query.
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon_float(v):
    # Full precision, NO rounding: the driver hashes the full stringified
    # cell, so a float differing only past 1e-6 must fail here exactly like
    # it would remotely. Exponent notation is rewritten to Scala
    # Double.toString style (Python "1e-07" -> Scala "1.0E-7") so BOTH
    # sides land in one canonical form regardless of which runtime
    # stringified them.
    if math.isnan(v):
        return "NaN"
    if v == math.inf:
        return "Infinity"
    if v == -math.inf:
        return "-Infinity"
    s = repr(float(v))
    if "e" in s:
        mant, exp = s.split("e")
        if "." not in mant:
            neg = mant.startswith("-")
            mant = mant.lstrip("-") + ".0"
            if neg:
                mant = "-" + mant
        return f"{mant}E{int(exp)}"
    return s


def canon(df):
    # Dtype-faithful emulation of the driver's stringified hash: the driver
    # materializes both sides through pandas (so DuckDB HUGEINT becomes
    # float64) and hashes stringified cells — "19.0" != "19". We therefore
    # go through a pandas frame and compare string tuples, never Python ==
    # (which would hide int-vs-float dtype bugs: 19 == 19.0).
    cols = sorted(df.columns)
    out = []
    for r in df[cols].itertuples(index=False, name=None):
        vals = []
        for v in r:
            if isinstance(v, float):
                vals.append(canon_float(v))
            elif isinstance(v, pd.Timestamp) and v.tzinfo is not None:
                # tz-aware (Spark/DataGen-written parquet marks timestamps
                # adjusted-to-UTC) vs naive (the driver's NANOS fixtures):
                # same instant, different str() — render both as naive UTC
                vals.append(str(v.tz_convert("UTC").tz_localize(None)))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return cols, out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    # bound + spillable: an sf1-scale oracle that exceeds the cap spills
    # to disk instead of exhausting the process (an unbounded DuckDB OOM
    # leaves the allocator wedged and the NEXT query dies on a 3 MiB
    # pandas alloc — observed once, hence the belt and braces)
    con.execute("SET memory_limit='48GB'")
    # per-PID spill dir: DuckDB names temp files duckdb_temp_storage-N.tmp
    # with NO process qualifier, so concurrent check.py runs sharing one
    # directory truncate/delete each other's spill (observed as rc=134
    # aborts and phantom disk-full cascades in parallel sf1 compares)
    # DuckDB does not mkdir -p the temp_directory's missing PARENTS at
    # spill time (observed: sf1 dedup oracles failing with "Failed to
    # create directory" when /tmp/duckdb_spill itself was absent) —
    # create the full path up front
    spill = f"/tmp/duckdb_spill/{os.getpid()}"
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table: directory of part files
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or (only and name not in only):
            continue
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        if not files:
            print(f"[FAIL] {name}: no parquet output")
            n_fail += 1
            continue
        rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        scols, srows = canon(rel.df())
        if name not in oracle:
            print(f"[skip] {name}: no oracle ({len(srows)} rows)")
            n_skip += 1
            continue
        try:
            orel = con.sql(oracle[name])
            ocols, orows = canon(orel.df())
        except Exception as e:
            print(f"[FAIL] {name}: oracle error: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"[FAIL] {name}: columns {scols} != oracle {ocols}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"[FAIL] {name}: {len(srows)} rows != oracle {len(orows)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(srows, orows) if a != b]
        if bad:
            print(f"[FAIL] {name}: {len(bad)}/{len(srows)} rows differ; first: spark={bad[0][0]} oracle={bad[0][1]}")
            n_fail += 1
        else:
            print(f"[PASS] {name}: {len(srows)} rows x {len(scols)} cols")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} no-oracle ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
