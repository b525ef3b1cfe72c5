#!/usr/bin/env python3
"""Local simulation of the driver's CORRECTNESS gate.

Reads the Verify dump (parquet per query + oracle_sql.json), runs each
oracle SQL in DuckDB over the same sf directory, and compares rows /
schema / value-hash the way the driver does (columns sorted by name,
rows sorted by all columns, values rounded for float stability).

Usage: python3 tools/selfcheck.py /tmp/verify_out /root/testdata/sf0.01
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(tbl):
    cols = sorted(tbl.column_names)
    rows = []
    for i in range(tbl.num_rows):
        row = []
        for c in cols:
            v = tbl.column(c)[i].as_py()
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 6)
            if isinstance(v, bytes):
                v = v.hex()
            if isinstance(v, list):
                v = tuple(
                    "nan" if isinstance(x, float) and math.isnan(x)
                    else round(x, 5) if isinstance(x, float)
                    else x.hex() if isinstance(x, bytes)
                    else x
                    for x in v)
            row.append(v)
        rows.append(tuple(row))
    rows.sort(key=repr)
    return cols, rows


def main(out_dir, sf_dir):
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    ok = bad = no_oracle = err = 0
    import glob
    names = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/q*"))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"ERR  {name}: no spark output")
            err += 1
            continue
        spark_tbl = pq.read_table(files[0])
        if name not in oracles:
            no_oracle += 1
            print(f"noor {name}: rows={spark_tbl.num_rows}")
            continue
        try:
            oracle_tbl = con.execute(oracles[name]).arrow()
        except Exception as e:
            print(f"ERR  {name}: oracle failed: {e}")
            err += 1
            continue
        sc, sr = canon(spark_tbl)
        oc, orows = canon(oracle_tbl)
        if sc != oc:
            print(f"FAIL {name}: schema {sc} != {oc}")
            bad += 1
        elif len(sr) != len(orows):
            print(f"FAIL {name}: rows {len(sr)} != {len(orows)}")
            bad += 1
        elif sr != orows:
            diff = next(i for i, (a, b) in enumerate(zip(sr, orows)) if a != b)
            print(f"FAIL {name}: values differ at sorted row {diff}:")
            print(f"     spark:  {sr[diff]}")
            print(f"     oracle: {orows[diff]}")
            bad += 1
        else:
            ok += 1
    print(f"\nok={ok} fail={bad} no_oracle={no_oracle} err={err} "
          f"total={len(names)}")
    return 1 if (bad or err) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
