#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (NOT shipped library code).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each SQL
in DuckDB over views named after the parquet tables in <sfDir>, loads the
corresponding Spark result parquet, sorts columns by name and rows by value,
and reports row/schema/value match per query — the same contract TESTDATA.md
describes for CORRECTNESS_r{N}.json.
"""
import hashlib
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def check_manifest(out_dir: Path) -> None:
    """Refuse to adjudicate a dump without a valid completion manifest.

    graft.Verify stages its dump in a unique per-run dir and publishes it
    via atomic rename, writing MANIFEST.json (file inventory + SHA-256)
    LAST. A dir with no manifest is half-written, half-deleted (round 12:
    a concurrent gate's `rm -rf` under a running compare produced an
    empty official record), or pre-manifest; a dir whose files don't
    match the manifest is torn. Either way: exit 2 loudly, never a
    readable-but-wrong verdict.
    """
    mf = out_dir / "MANIFEST.json"
    if not mf.exists():
        print(f"REFUSING {out_dir}: no MANIFEST.json — dump is "
              "incomplete, torn, or from a pre-manifest graft.Verify; "
              "re-run the dump", file=sys.stderr)
        sys.exit(2)
    try:
        manifest = json.loads(mf.read_text())
        files = manifest["files"]
    except Exception as e:
        print(f"REFUSING {out_dir}: unreadable MANIFEST.json ({e})",
              file=sys.stderr)
        sys.exit(2)
    bad = []
    for rel, meta in files.items():
        p = out_dir / rel
        if not p.exists():
            bad.append(f"{rel}: missing")
            continue
        if p.stat().st_size != meta["size"]:
            bad.append(f"{rel}: size {p.stat().st_size} != {meta['size']}")
            continue
        if hashlib.sha256(p.read_bytes()).hexdigest() != meta["sha256"]:
            bad.append(f"{rel}: sha256 mismatch")
    if bad:
        for b in bad[:20]:
            print(f"MANIFEST VIOLATION: {b}", file=sys.stderr)
        sys.exit(2)
    print(f"manifest ok: {len(files)} files, "
          f"{manifest.get('queries', '?')} query dirs")


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # unify value representations
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").map(
                lambda v: v.isoformat() if pd.notna(v) else None)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact: queries are designed to be bit-deterministic
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    check_manifest(Path(out_dir))
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark result dir")
            n_fail += 1
            continue
        try:
            got = norm(con.sql(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df())
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                a, b = got[c].iloc[i], want[c].iloc[i]
                if not values_equal(a, b):
                    bad = (i, c, a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: spark={a!r} duckdb={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows x {len(got.columns)} cols)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
