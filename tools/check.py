#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [--jobs N]

For each query parquet dumped by graft.Verify, runs the matching oracle SQL
from oracle_sql.json in DuckDB (tables registered as views over the sfDir
parquet), then compares: schema (column names), row count, and values
(columns sorted by name, rows sorted, exact equality; floats compared both
exactly and at 1e-9 relative so we can see HOW exact we are).

Parallel since r13 (judge r12 next-round #5: the sf0.1 sweep's wall was
~13 min of sequential DuckDB replay — the oracle, not the engine, dominated
the closing gate). Queries fan out over worker processes, each with its own
DuckDB connection and view set; results print in deterministic sorted order
once all workers finish, so the output is byte-comparable across runs.
"""
import json
import math
import multiprocessing as mp
import os
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

_CON = None
_ORACLE = None
_OUT_DIR = None


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")
    return df


def _init(sf_dir: str, out_dir: str, jobs: int = 1):
    global _CON, _ORACLE, _OUT_DIR
    _CON = duckdb.connect()
    # per-worker thread budget scales with the worker count (r13 ADVICE:
    # a fixed 4 threads × 8 default jobs was itself the oversubscription
    # the old comment claimed to avoid): the pool as a whole gets ~the
    # box's cores, each worker its fair share, floor 1.
    threads = max(1, (os.cpu_count() or 8) // max(1, jobs))
    _CON.execute(f"SET threads TO {threads}")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            _CON.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    _ORACLE = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    _OUT_DIR = out_dir


def check_one(name: str):
    """Returns (name, kind, lines) — kind in pass/fail/skip."""
    lines = []
    got = pd.read_parquet(Path(_OUT_DIR) / name)
    if name not in _ORACLE:
        return name, "skip", [f"[skip ] {name}: rows={len(got)} (no oracle, rows-only)"]
    try:
        exp = _CON.execute(_ORACLE[name]).df()
    except Exception as e:
        return name, "fail", [f"[FAIL ] {name}: oracle SQL error: {e}"]
    g, e = normalize(got), normalize(exp)
    if list(g.columns) != list(e.columns):
        return name, "fail", [f"[FAIL ] {name}: columns {list(g.columns)} != {list(e.columns)}"]
    dtype_diff = [
        (c, str(g[c].dtype), str(e[c].dtype))
        for c in g.columns
        if str(g[c].dtype) != str(e[c].dtype)
    ]
    if dtype_diff:
        lines.append(f"[dtype] {name}: {dtype_diff}")
    if len(g) != len(e):
        return name, "fail", lines + [f"[FAIL ] {name}: rows {len(g)} != {len(e)}"]
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
                lines.append(f"         first diff col={c} row={i}: {gv[i]!r} != {ev[i]!r}")
    if exact:
        return name, "pass", lines + [f"[pass ] {name}: rows={len(g)} exact"]
    if close:
        return name, "fail", lines + [
            f"[close] {name}: rows={len(g)} float-close (worst rel {worst:.2e}) — NOT exact"]
    return name, "fail", lines + [f"[FAIL ] {name}: value mismatch (worst rel {worst:.2e})"]


# Longest replays first (sf0.1 profile, r13: 550 s total CPU, max single
# 93 s): with random order the tail query can land last on a busy pool and
# stretch the makespan; longest-first + chunksize=1 bounds it near
# max(longest, total/jobs). Names that disappear fall back to sorted order.
SLOW_FIRST = [
    "a_bootstrap_ci", "dedup_simhash", "dedup_cc_incremental",
    "dedup_winnow_clusters", "dedup_winnow_keep", "dedup_winnow_pairs",
    "text_langid_ngram", "s_stream_ingest_gate", "g_sssp", "text_winnow",
    "dedup_lsh_recall", "dedup_minhash_sigs",
]


def main(sf_dir: str, out_dir: str, jobs: int) -> int:
    names = sorted(d.name for d in Path(out_dir).iterdir() if d.is_dir())
    ordered = [n for n in SLOW_FIRST if n in names] + [n for n in names if n not in SLOW_FIRST]
    if jobs <= 1:
        _init(sf_dir, out_dir, 1)
        results = [check_one(n) for n in ordered]
    else:
        with mp.Pool(jobs, initializer=_init, initargs=(sf_dir, out_dir, jobs)) as pool:
            results = pool.map(check_one, ordered, chunksize=1)
    n_pass = n_fail = n_skip = 0
    for name, kind, lines in sorted(results):
        for ln in lines:
            print(ln)
        if kind == "pass":
            n_pass += 1
        elif kind == "fail":
            n_fail += 1
        else:
            n_skip += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    jobs = 8
    pos = []
    i = 0
    while i < len(argv):
        if argv[i] == "--jobs":
            jobs = int(argv[i + 1])
            i += 2
        else:
            pos.append(argv[i])
            i += 1
    sys.exit(main(pos[0], pos[1], jobs))
