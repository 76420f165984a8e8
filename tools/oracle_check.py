#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each <verifyOutDir>/<name>/ parquet result, runs the matching
oracle_sql.json query in DuckDB over the sfDir tables and compares
(columns aligned by sorted name, rows sorted, exact value compare via
SQL EXCEPT in both directions).
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISS  {name}: no result parquet"); n_fail += 1; continue
        con.execute(f"CREATE OR REPLACE VIEW spark_res AS SELECT * FROM read_parquet({files!r})")
        if name not in oracle:
            n = con.execute("SELECT count(*) FROM spark_res").fetchone()[0]
            status = "ROWS " if n > 0 else "EMPTY"
            print(f"{status} {name}: rows={n} (no oracle)")
            n_pass += (n > 0); n_fail += (n == 0)
            continue
        try:
            con.execute(f"CREATE OR REPLACE VIEW oracle_res AS ({oracle[name]})")
            scols = sorted(r[0] for r in con.execute("DESCRIBE spark_res").fetchall())
            ocols = sorted(r[0] for r in con.execute("DESCRIBE oracle_res").fetchall())
            if scols != ocols:
                print(f"FAIL  {name}: columns differ spark={scols} oracle={ocols}")
                n_fail += 1; continue
            sel = ", ".join(f'"{c}"' for c in scols)
            # cast both sides to VARCHAR for hash-style compare tolerance to type width
            a = con.execute(
                f"SELECT count(*) FROM (SELECT {sel} FROM spark_res EXCEPT ALL SELECT {sel} FROM oracle_res)"
            ).fetchone()[0]
            b = con.execute(
                f"SELECT count(*) FROM (SELECT {sel} FROM oracle_res EXCEPT ALL SELECT {sel} FROM spark_res)"
            ).fetchone()[0]
            nrows = con.execute("SELECT count(*) FROM spark_res").fetchone()[0]
            if a == 0 and b == 0:
                print(f"PASS  {name}: rows={nrows}"); n_pass += 1
            else:
                print(f"FAIL  {name}: spark-only={a} oracle-only={b} rows={nrows}")
                for r in con.execute(f"SELECT {sel} FROM spark_res EXCEPT ALL SELECT {sel} FROM oracle_res LIMIT 3").fetchall():
                    print(f"      spark : {r}")
                for r in con.execute(f"SELECT {sel} FROM oracle_res EXCEPT ALL SELECT {sel} FROM spark_res LIMIT 3").fetchall():
                    print(f"      oracle: {r}")
                n_fail += 1
        except Exception as e:
            print(f"ERROR {name}: {e}"); n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
