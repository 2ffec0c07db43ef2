#!/usr/bin/env python3
"""Dev-side replica of the driver's correctness gate: read Verify output
(outDir/<name>/ parquet + oracle_sql.json), run each oracle SQL in DuckDB
over the same sf parquet tables, compare row count / schema / values
(rows sorted, columns sorted by name). Usage:
  python3 scripts/check.py <sfDir> <outDir>

CAVEAT: this is an UNDER-approximation of the driver's gate. The driver
converts both sides to pandas floats and hashes those; this script compares
canonical strings. A decimal/oversized-double column can pass here (string
equal) yet hash-FAIL in the driver (decimal->float64 diverges by 1 ulp past
2^53 unscaled — DuckDB int128->double double-rounds, pyarrow rounds
correctly). Rule: never emit DECIMAL columns or doubles with >=16
significant digits; round(sum,2)::DOUBLE on both sides. Binary columns
crash the driver's pandas sort (bytearray unhashable) — emit hex() strings.
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return str(v)

def frame_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            # filtered Verify run (3rd arg): only dumped queries are checked
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchall()
            got_cols = [d[0] for d in con.description]
            exp = con.execute(sql).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        gk, ek = frame_key(got, got_cols), frame_key(exp, exp_cols)
        if len(gk) != len(ek):
            print(f"FAIL {name}: rows {len(gk)} != {len(ek)}")
            n_fail += 1
        elif gk != ek:
            diffs = [(a, b) for a, b in zip(gk, ek) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gk)} rows)")
            n_pass += 1
    # rows-only entries (queries without oracle)
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracle:
            try:
                n = con.execute(
                    f"SELECT COUNT(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
                status = "PASS" if n > 0 else "FAIL"
                print(f"{status} {d} (rows-only: {n} rows)")
                if n > 0: n_pass += 1
                else: n_fail += 1
            except Exception as e:
                print(f"FAIL {d} (rows-only): {e}")
                n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
