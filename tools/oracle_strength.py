#!/usr/bin/env python3
"""Registry-wide ORACLE-STRENGTH audit (dev tooling, not part of the
library; r11 verdict #8): prove no oracle row is vacuous. A green
correctness row only means spark-output == oracle-output; it is worth
nothing if both sides are empty (the r11 q_simhash_recall eager-val
bug produced exactly that shape before it was caught) or if the
comparator would not notice a wrong value. Per op, this script:

  1. EMPTY check — the op's output has rows at the audit SF (an
     empty-vs-empty agreement tests nothing);
  2. DROP sensitivity — removing one output row makes the compare
     fail (comparator engaged on row counts);
  3. MUTATE sensitivity — changing ONE CELL of one row (same row
     count) makes the compare fail (comparator engaged on values,
     not just shape).

Reuses check.py's exact canonicalization (cols sorted by name, rows
sorted, full-precision value signatures) so the audited comparator IS
the gate's comparator.

Usage: tools/oracle_strength.py <sfDir> <verifyOutDir> [--report FILE]
Exit 1 if any op is empty at the audit SF or insensitive to either
perturbation.
"""
import glob
import json
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import TABLES, canon, frame_sig  # noqa: E402


def mutate_one_cell(df):
    """Return a copy with exactly one cell changed (never to an equal
    value), or None when no cell is mutable. Tries row 0 columns left
    to right."""
    out = df.copy(deep=True)
    for c in out.columns:
        v = out.at[0, c]
        try:
            if v is None:
                continue
            if isinstance(v, bool):
                out.at[0, c] = not v
            elif isinstance(v, (int,)):
                out.at[0, c] = v + 1
            elif isinstance(v, float):
                if math.isnan(v) or math.isinf(v):
                    continue
                out.at[0, c] = v + 1.0 if v != v + 1.0 else v * 2 + 1.0
            elif isinstance(v, str):
                out.at[0, c] = v + "~"
            elif isinstance(v, (bytes, bytearray)):
                out.at[0, c] = bytes(v) + b"~"
            else:
                # numpy scalars quack like int/float; lists/dates skip
                import numpy as np
                if isinstance(v, np.integer):
                    out.at[0, c] = int(v) + 1
                elif isinstance(v, np.floating):
                    f = float(v)
                    if math.isnan(f) or math.isinf(f):
                        continue
                    out.at[0, c] = f + 1.0
                else:
                    continue
            return out
        except Exception:
            continue
    return None


def main(argv):
    sf_dir, out_dir = argv[0], argv[1]
    report_path = None
    if "--report" in argv:
        report_path = argv[argv.index("--report") + 1]
    con = duckdb.connect()
    for t in TABLES:
        for p in glob.glob(f"{sf_dir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    lines = []
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"[MISS] {name}: no spark output to audit")
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
        # 1. empty-vs-empty is a vacuous agreement
        if len(got) == 0:
            print(f"[VACU] {name}: 0 rows at audit SF — empty-vs-empty "
                  "proves nothing")
            fail += 1
            continue
        want_sig = frame_sig(want)
        # 1b. the perturbation logic below assumes got ALREADY equals
        # want — run standalone on a diverging output, every
        # perturbation is "caught" trivially and a broken op would be
        # reported sensitive (ADVICE r12). Safe inside gate.sh only by
        # step ordering; assert it here so the audit is self-contained.
        if (list(got.columns) != list(want.columns)
                or len(got) != len(want)
                or frame_sig(got) != want_sig):
            print(f"[MISMATCH] {name}: spark output != oracle at audit "
                  "SF — run check.py first; sensitivity unmeasurable")
            fail += 1
            continue
        # 2. drop one row -> compare must fail
        dropped = canon(got.iloc[1:].reset_index(drop=True))
        drop_caught = (len(dropped) != len(want)
                       or frame_sig(dropped) != want_sig)
        # 3. mutate one cell (same row count) -> compare must fail
        mutated = mutate_one_cell(got)
        if mutated is None:
            mut_caught = None  # no mutable cell (should not happen)
        else:
            mutated = canon(mutated)
            mut_caught = (list(mutated.columns) != list(want.columns)
                          or frame_sig(mutated) != want_sig)
        if drop_caught and mut_caught:
            lines.append(f"{name}: rows={len(got)} drop=caught mutate=caught")
            ok += 1
        else:
            detail = (f"drop={'caught' if drop_caught else 'MISSED'} "
                      f"mutate={'caught' if mut_caught else ('NO-MUTABLE-CELL' if mut_caught is None else 'MISSED')}")
            print(f"[WEAK] {name}: rows={len(got)} {detail}")
            lines.append(f"{name}: rows={len(got)} {detail}  <-- WEAK")
            fail += 1
    print(f"== oracle strength: {ok} sensitive, {fail} weak/vacuous ==")
    if report_path:
        with open(report_path, "w") as f:
            f.write("\n".join(lines) + "\n")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
