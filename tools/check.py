#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (dev tooling only, not
part of the library): run graft.Verify output dir against DuckDB on the
same sf dir, compare per query: row count, sorted-by-name columns,
value hash (rows sorted by all columns).

Usage: tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, math

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, kind="mergesort", ignore_index=True)
    return df


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return str(v)


def frame_sig(df):
    return [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        for p in glob.glob(f"{sf_dir}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    # rows-only check for no-oracle ops: output must exist and be non-empty
    import os
    all_outputs = sorted(d for d in os.listdir(out_dir)
                         if os.path.isdir(f"{out_dir}/{d}"))
    for name in all_outputs:
        if name in oracle:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: (no-oracle) no spark output")
            fail += 1
            continue
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet({files!r})").fetchone()[0]
        if n <= 0:
            print(f"[ROWS] {name}: (no-oracle) 0 rows")
            fail += 1
        else:
            print(f"[ OK ] {name}: {n} rows (no-oracle, rows-only)")
            ok += 1
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"[MISS] {name}: no spark output")
            fail += 1
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet({spark_files!r})").df())
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"[ERR ] {name}: {e}")
            fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"[COLS] {name}: spark={list(got.columns)} oracle={list(want.columns)}")
            fail += 1
            continue
        if len(got) != len(want):
            print(f"[ROWS] {name}: spark={len(got)} oracle={len(want)}")
            fail += 1
            continue
        gs, ws = frame_sig(got), frame_sig(want)
        if gs != ws:
            bad = [i for i, (a, b) in enumerate(zip(gs, ws)) if a != b][:3]
            print(f"[HASH] {name}: {len([1 for a,b in zip(gs,ws) if a!=b])} mismatched rows; first at {bad}")
            for i in bad[:2]:
                print(f"    spark : {gs[i]}")
                print(f"    oracle: {ws[i]}")
            fail += 1
            continue
        print(f"[ OK ] {name}: {len(got)} rows")
        ok += 1
    print(f"== {ok} ok, {fail} fail ==")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
