#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the
sfDir tables, and compares: row count, schema (column names + types), and
values (exact, after sorting rows by all columns and columns by name).
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (directory of part files) — e.g. the
            # derived scale fixtures under target/scale/.
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    partial = os.path.exists(f"{out_dir}/PARTIAL_RUN")
    if partial:
        print("=" * 60)
        print("WARNING: PARTIAL RUN — this directory holds a SUBSET of the")
        print("query suite (graft.Verify was invoked with query-name args).")
        print("Do not read the summary below as full-suite correctness.")
        print("=" * 60)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        if not glob.glob(f"{res_dir}/*.parquet"):
            results[name] = "MISSING_RESULT"
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetch_arrow_table()
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            results[name] = f"ERROR: {e}"
            continue
        g_cols = sorted(got.column_names)
        w_cols = sorted(want.column_names)
        if g_cols != w_cols:
            results[name] = f"SCHEMA_NAMES: got={g_cols} want={w_cols}"
            continue
        g_types = {c: str(got.schema.field(c).type) for c in g_cols}
        w_types = {c: str(want.schema.field(c).type) for c in w_cols}
        type_diff = {c: (g_types[c], w_types[c]) for c in g_cols if g_types[c] != w_types[c]}
        if got.num_rows != want.num_rows:
            results[name] = f"ROWS: got={got.num_rows} want={want.num_rows}"
            continue
        # sort rows by all columns, compare values
        order = ", ".join(f'"{c}"' for c in g_cols)
        sel = ", ".join(f'"{c}"' for c in g_cols)
        g = con.execute(f"SELECT {sel} FROM got_t ORDER BY {order}",
                        ).fetchall() if _reg(con, "got_t", got) else None
        w = con.execute(f"SELECT {sel} FROM want_t ORDER BY {order}",
                        ).fetchall() if _reg(con, "want_t", want) else None
        if g != w:
            bad = next((i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b)
            results[name] = f"VALUES: first diff row {bad[0]}: got={bad[1]} want={bad[2]}"
        elif type_diff:
            results[name] = f"OK_VALUES_TYPE_DIFF: {type_diff}"
        else:
            results[name] = "OK"

    n_ok = sum(1 for v in results.values() if v == "OK")
    for name, v in sorted(results.items()):
        mark = "PASS" if v == "OK" else "FAIL"
        print(f"{mark} {name}: {v}")
    suffix = " (PARTIAL RUN — subset only)" if partial else ""
    print(f"\n{n_ok}/{len(results)} OK{suffix}")
    return 0 if n_ok == len(results) else 1


def _reg(con, name, tbl):
    con.register(name, tbl)
    return True


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
