#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (dev tooling only, not
part of the library): run graft.Verify output dir against DuckDB on the
same sf dir, compare per query: row count, sorted-by-name columns,
value hash (rows sorted by all columns).

Usage: tools/check.py <sfDir> <verifyOutDir> [--oracle-budget-s N]

--oracle-budget-s: wall budget per ORACLE query (DuckDB side). The
second-SF gate step (sf0.1) uses this: a handful of oracles are
EXACT-quadratic by design (all-pairs Jaccard, brute-force recall
ground truth — the engine sides are the sub-quadratic ones), and at
10x data they grind for hours. A busted budget interrupts the query
and reports [SLOW] — counted separately from failures, printed by
name so drift is visible. Every oracle that completes must still
match exactly; the slow ones keep their cross-engine law pinned at
sf0.01 + the adversarial twin.
"""
import json, sys, glob, math, threading

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


def main(sf_dir, out_dir, budget_s=None):
    con = duckdb.connect()
    import os as _os
    for t in TABLES:
        for p in glob.glob(f"{sf_dir}/{t}.parquet"):
            # directory-layout tables (any Spark-written corpus, e.g.
            # the scale twins) are part-file directories
            if _os.path.isdir(p):
                p = f"{p}/*.parquet"
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
    slow = []
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"[MISS] {name}: no spark output")
            fail += 1
            continue
        # the engine's own parquet output reads OUTSIDE the oracle
        # budget window (ADVICE r14: a slow engine-output read was
        # misattributed as a slow oracle)
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet({spark_files!r})").df())
        except Exception as e:
            print(f"[ERR ] {name}: engine output read: {e}")
            fail += 1
            continue
        # budget timer: the fire path takes a lock and re-checks a
        # running flag cleared before cancel() — without it a timer
        # firing between query completion and cancel() lands
        # con.interrupt() on an idle connection and aborts the NEXT
        # oracle, misreported as [ERR] (ADVICE r14)
        timer = None
        timed_out = []
        lock = threading.Lock()
        state = {"running": False}

        def _interrupt():
            with lock:
                if state["running"]:
                    timed_out.append(1)
                    con.interrupt()
        if budget_s is not None:
            state["running"] = True
            timer = threading.Timer(budget_s, _interrupt)
            timer.start()
        try:
            want = canon(con.execute(sql).df())
        except Exception as e:
            if timed_out:
                print(f"[SLOW] {name}: oracle exceeded {budget_s}s budget "
                      f"(law pinned at sf0.01 + adversarial twin)")
                slow.append(name)
            else:
                print(f"[ERR ] {name}: {e}")
                fail += 1
            continue
        finally:
            if timer is not None:
                with lock:
                    state["running"] = False
                timer.cancel()
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
    extra = f", {len(slow)} slow-oracle skipped" if slow else ""
    print(f"== {ok} ok, {fail} fail{extra} ==")
    if slow:
        print("   slow oracles:", " ".join(sorted(slow)))
    return 1 if fail else 0


if __name__ == "__main__":
    budget = None
    args = sys.argv[1:]
    if "--oracle-budget-s" in args:
        i = args.index("--oracle-budget-s")
        budget = float(args[i + 1])
        del args[i:i + 2]
    sys.exit(main(args[0], args[1], budget))
