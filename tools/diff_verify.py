#!/usr/bin/env python3
"""Run-to-run determinism diff for graft.Verify dumps: compare two
Verify output dirs VALUE-wise per query (the EXCEPT-ALL-both-ways
analog, but byte-exact on the canonicalized frames, so float
nondeterminism can't hide behind hashing).

Usage: python3 tools/diff_verify.py <outDirA> <outDirB>
(dev tool only; complements tools/check_oracle.py)
"""
import sys, os, glob
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            df[c] = s.map(lambda v: tuple(v) if not isinstance(v, (str, bytes, dict))
                          and getattr(v, "__len__", None) is not None else v)
    return df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True,
                          key=lambda s: s.map(lambda v: (v is None, str(v))))


def main() -> int:
    a, b = sys.argv[1], sys.argv[2]
    names_a = {os.path.basename(p) for p in glob.glob(f"{a}/*") if os.path.isdir(p)}
    names_b = {os.path.basename(p) for p in glob.glob(f"{b}/*") if os.path.isdir(p)}
    bad = 0
    for miss in sorted(names_a ^ names_b):
        print(f"[MISS] {miss}: present in only one run")
        bad += 1
    for name in sorted(names_a & names_b):
        try:
            da = canon(pd.read_parquet(f"{a}/{name}"))
            db = canon(pd.read_parquet(f"{b}/{name}"))
        except Exception as e:
            print(f"[ERR ] {name}: {e}")
            bad += 1
            continue
        if list(da.columns) != list(db.columns):
            print(f"[COLS] {name}: {list(da.columns)} vs {list(db.columns)}")
            bad += 1
        elif len(da) != len(db):
            print(f"[ROWS] {name}: {len(da)} vs {len(db)}")
            bad += 1
        elif not da.equals(db):
            neq = (da != db) & ~(da.isna() & db.isna())
            cols = [c for c in da.columns if neq[c].any()]
            print(f"[DIFF] {name}: value mismatch in columns {cols}")
            bad += 1
        else:
            print(f"[OK] {name} ({len(da)} rows)")
    total = len(names_a | names_b)
    print(f"\n{total - bad} identical, {bad} differing")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
