#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: load graft.Verify's
parquet dumps, run each oracle SQL in DuckDB over the same testdata
tables, and compare (rows, columns-sorted-by-name, value hash).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--strict-dtypes]

--strict-dtypes additionally reports, per query, any compared output
column whose dtype class has ever produced a cross-checker
canonicalization divergence (DecimalType/decimal objects, date32,
and object columns holding datetime.date) — the r15 driver gate
flagged `avro_logical_types` on exactly such a column while this
local gate stayed green, so local [OK] only predicts driver green
when this lint is also clean.
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


def hazard_dtypes(df: pd.DataFrame):
    """Columns whose fetched representation is checker-dependent."""
    import decimal, datetime
    out = []
    for c in df.columns:
        s = df[c]
        kind = str(s.dtype)
        if kind.startswith("decimal") or "date32" in kind:
            out.append((c, kind))
        elif s.dtype == object:
            probe = s.dropna().head(3)
            if any(isinstance(v, decimal.Decimal) for v in probe):
                out.append((c, "object<Decimal>"))
            elif any(isinstance(v, datetime.date) and
                     not isinstance(v, datetime.datetime) for v in probe):
                out.append((c, "object<date>"))
    return out


def main(sf_dir, out_dir, strict_dtypes=False):
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
        if strict_dtypes:
            haz = hazard_dtypes(spark) + hazard_dtypes(duck)
            if haz:
                print(f"[DTYPE] {name}: hazard compared dtypes {sorted(set(haz))} "
                      f"— local hash may not predict driver hash")
                fail += 1
                continue
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
    strict = "--strict-dtypes" in sys.argv[1:]
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    sys.exit(main(pos[0], pos[1], strict_dtypes=strict))
