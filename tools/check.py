#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL
in DuckDB over the testdata tables, compare against the parquet the
Verify main dumped (row count, schema-ish, values).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL-sql ] {name}: oracle errored: {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if sorted(got.columns) != sorted(want.columns):
            ok = False
            msgs.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        elif len(got) != len(want):
            ok = False
            msgs.append(f"rows {len(got)} != {len(want)}")
        else:
            g, w = canon(got), canon(want)
            for c in g.columns:
                gs, ws = g[c], w[c]
                # Hash-faithful dtype check: the driver hashes values
                # dtype-sensitively, so an int64 Spark column meeting a
                # float64 oracle column (DuckDB sum(BIGINT) -> HUGEINT
                # -> float64 in pandas) is a driver FAIL even when the
                # values compare equal after coercion.
                kinds = {gs.dtype.kind, ws.dtype.kind}
                if len(kinds) > 1 and kinds <= {"i", "u", "f"}:
                    ok = False
                    msgs.append(
                        f"col {c} dtype class mismatch: spark {gs.dtype} vs "
                        f"oracle {ws.dtype} (driver hash diverges; "
                        f"CAST the oracle aggregate)"
                    )
                    continue
                if gs.dtype.kind == "f" or ws.dtype.kind == "f":
                    import numpy as np

                    both_nan = gs.isna() & ws.isna()
                    eq = both_nan | (gs == ws)
                    if not eq.all():
                        ok = False
                        i = int((~eq).idxmax())
                        msgs.append(f"col {c} differs at row {i}: {gs[i]!r} vs {ws[i]!r}")
                else:
                    gs2 = gs.astype(str)
                    ws2 = ws.astype(str)
                    if not (gs2 == ws2).all():
                        ok = False
                        i = int((gs2 != ws2).idxmax())
                        msgs.append(f"col {c} differs at row {i}: {gs[i]!r} vs {ws[i]!r}")
        if ok:
            n_pass += 1
            print(f"[PASS     ] {name}: {len(got)} rows")
        else:
            n_fail += 1
            print(f"[FAIL     ] {name}: " + "; ".join(msgs))
    missing = sorted(set(oracle) - {d for d in os.listdir(out_dir)})
    for m in missing:
        print(f"[MISSING  ] {m}: oracle declared but no result parquet")
    print(f"== {n_pass} pass, {n_fail} fail, {len(missing)} missing")
    sys.exit(1 if (n_fail or missing) else 0)


if __name__ == "__main__":
    main()
