#!/usr/bin/env python3
"""Local pre-flight replica of the driver's correctness gate:
run graft.Verify (Spark) at a given SF, then run each oracle SQL in
DuckDB over the same parquet tables, and diff results.

Usage: python3 tools/check_oracle.py <sfDir> <outDir> [query ...]
(assumes Verify already wrote <outDir>; pass query names to limit)
"""
import json, math, sys, glob, os
import duckdb
import pyarrow.parquet as pq


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        # double aggregation is association-order sensitive across
        # engines (Spark partial-agg trees vs DuckDB's scan order); at
        # sf1 the q01 sums diverge in the last ~3 bits. Compare at 10
        # significant digits — far tighter than any real defect.
        return float(f"{v:.10g}")
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    import decimal
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def table_rows(tbl):
    cols = sorted(tbl.column_names)
    data = {c: tbl.column(c).to_pylist() for c in cols}
    n = tbl.num_rows
    return [tuple(norm(data[c][i]) for c in cols) for i in range(n)], cols


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # big-SF runs (sf10 shingle oracles blow past DuckDB's default 80%-
    # of-RAM limit and OOM-risk the host): opt-in caps via env, default
    # behavior unchanged for the driver-replica path
    if os.environ.get("DUCKDB_MEMORY_LIMIT"):
        con.execute(f"SET memory_limit='{os.environ['DUCKDB_MEMORY_LIMIT']}'")
    if os.environ.get("DUCKDB_TEMP_DIR"):
        os.makedirs(os.environ["DUCKDB_TEMP_DIR"], exist_ok=True)
        con.execute(f"SET temp_directory='{os.environ['DUCKDB_TEMP_DIR']}'")
    if os.environ.get("DUCKDB_MAX_TEMP_SIZE"):
        con.execute("SET max_temp_directory_size="
                    f"'{os.environ['DUCKDB_MAX_TEMP_SIZE']}'")
    # semicolon-separated extra SET statements (e.g.
    # "preserve_insertion_order=false;threads=8") — lets a huge-SF
    # oracle trade ordering buffers / parallel aggregate states for
    # memory without changing the default driver-replica behavior
    for stmt in filter(None, os.environ.get("DUCKDB_EXTRA_SET", "").split(";")):
        con.execute(f"SET {stmt}")
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        # driver testdata = single files; GenData output = spark dirs
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
        if name == "events":
            # GenData-scaled events carry ts as the raw BIGINT nanos
            # Spark surfaced under nanosAsLong (Spark can't write
            # TIMESTAMP(NANOS)); re-surface it as a timestamp so
            # epoch_us(ts) binds exactly like on the driver's
            # TIMESTAMP_NS files (all oracle uses are second-granular,
            # so micros precision is exact)
            ts_type = dict((r[0], r[1]) for r in con.execute("DESCRIBE events").fetchall()).get("ts")
            if ts_type == "BIGINT":
                con.execute(
                    "CREATE OR REPLACE VIEW events AS SELECT * REPLACE "
                    f"(make_timestamp(ts // 1000) AS ts) FROM read_parquet('{src}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            spark_tbl = pq.read_table(spark_path)
            srows, scols = table_rows(spark_tbl)
            duck_tbl = con.execute(sql).arrow()
            drows, dcols = table_rows(duck_tbl)
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if scols != dcols:
            print(f"FAIL {name}: columns differ spark={scols} duck={dcols}")
            n_fail += 1
            continue
        if srows == drows:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows differ (spark {len(srows)} vs duck {len(drows)})")
            sset, dset = set(srows), set(drows)
            for r in list(sset - dset)[:3]:
                print(f"   spark-only: {r}")
            for r in list(dset - sset)[:3]:
                print(f"   duck-only:  {r}")
            if sset == dset:
                print("   (same set, order differs)")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
