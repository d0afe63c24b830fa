#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query parquet dumped by graft.Verify, runs the matching oracle SQL
from oracle_sql.json in DuckDB (tables registered as views over the sfDir
parquet), then compares: schema (column names), row count, and values
(columns sorted by name, rows sorted, exact equality; floats compared both
exactly and at 1e-9 relative so we can see HOW exact we are).
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = n_skip = 0
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        got = pd.read_parquet(qdir)
        if name not in oracle:
            print(f"[skip ] {name}: rows={len(got)} (no oracle, rows-only)")
            n_skip += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL ] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            print(f"[FAIL ] {name}: columns {list(g.columns)} != {list(e.columns)}")
            n_fail += 1
            continue
        dtype_diff = [
            (c, str(g[c].dtype), str(e[c].dtype))
            for c in g.columns
            if str(g[c].dtype) != str(e[c].dtype)
        ]
        if dtype_diff:
            print(f"[dtype] {name}: {dtype_diff}")
        if len(g) != len(e):
            print(f"[FAIL ] {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
            continue
        exact = True
        close = True
        worst = 0.0
        for c in g.columns:
            gv, ev = g[c], e[c]
            if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(ev):
                gv = gv.astype(float)
                ev = ev.astype(float)
                both_nan = gv.isna() & ev.isna()
                eq = (gv == ev) | both_nan
                if not eq.all():
                    exact = False
                    denom = ev.abs().clip(lower=1.0)
                    rel = ((gv - ev).abs() / denom).fillna(math.inf)
                    rel[both_nan] = 0.0
                    worst = max(worst, float(rel.max()))
                    if not (rel < 1e-9).all():
                        close = False
            else:
                gs = gv.astype(str)
                es = ev.astype(str)
                if not (gs == es).all():
                    exact = False
                    close = False
                    bad = (gs != es)
                    i = bad.idxmax()
                    print(f"         first diff col={c} row={i}: {gv[i]!r} != {ev[i]!r}")
        if exact:
            print(f"[pass ] {name}: rows={len(g)} exact")
            n_pass += 1
        elif close:
            print(f"[close] {name}: rows={len(g)} float-close (worst rel {worst:.2e}) — NOT exact")
            n_fail += 1
        else:
            print(f"[FAIL ] {name}: value mismatch (worst rel {worst:.2e})")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
