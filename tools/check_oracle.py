#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: load graft.Verify's
parquet dumps, run each oracle SQL in DuckDB over the same testdata
tables, and compare (rows, columns-sorted-by-name, value hash).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
(dev tool only; the real gate is driver-side)
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize value representations for hashing
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            df[c] = s.map(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                          getattr(v, "__len__", None) is not None and not isinstance(v, (str, bytes, dict))
                          else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True,
                        key=lambda s: s.map(lambda v: (v is None, str(v))))
    return df


def norm_cell(v):
    import math, datetime, decimal
    if v is None:
        return "NULL"
    # Floats keep an "f" marker so an integer-valued float64 column (e.g.
    # DuckDB HUGEINT fetched into pandas) hashes differently from a true
    # int64 column — the driver's gate distinguishes these (round-1
    # json_extract/session_window/text_token_stats lesson).
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return f"f{v:.10g}"
    if isinstance(v, decimal.Decimal):
        return f"f{float(v):.10g}"
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return pd.Timestamp(v).tz_localize(None).isoformat() if pd.Timestamp(v).tzinfo else pd.Timestamp(v).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def digest(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(norm_cell(v) for v in row) + "\n").encode())
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output"); fail += 1; continue
        try:
            duck = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}"); fail += 1; continue
        spark = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        sc, dc = canon(spark), canon(duck)
        if list(sc.columns) != list(dc.columns):
            print(f"[SCHEMA] {name}: spark={list(sc.columns)} duck={list(dc.columns)}"); fail += 1; continue
        if len(sc) != len(dc):
            print(f"[ROWS] {name}: spark={len(sc)} duck={len(dc)}"); fail += 1; continue
        hs, hd = digest(sc), digest(dc)
        if hs != hd:
            print(f"[HASH] {name}: mismatch")
            diff = sc.compare(dc) if sc.shape == dc.shape else None
            if diff is not None and not diff.empty:
                print(diff.head(10))
            fail += 1
            continue
        print(f"[OK] {name} ({len(sc)} rows)")
        ok += 1
    print(f"\n{ok} ok, {fail} failed")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
