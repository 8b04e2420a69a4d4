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
import os
import sys
import threading
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def refuse(out_dir: Path, record_path, why: str) -> None:
    """Exit 2 with a diagnosable artifact: the refusal reason + invocation
    are written to the record file (when given), so a driver that only
    keeps the record can tell a deliberate manifest refusal from a crash."""
    print(f"REFUSING {out_dir}: {why}", file=sys.stderr)
    if record_path:
        Path(record_path).write_text(json.dumps(
            {"_meta": {"invocation": " ".join(sys.argv), "exit_code": 2,
                       "refused": why}}, indent=1) + "\n")
    sys.exit(2)


def check_manifest(out_dir: Path, record_path=None) -> None:
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
        refuse(out_dir, record_path,
               "no MANIFEST.json — dump is incomplete, torn, or from a "
               "pre-manifest graft.Verify; re-run the dump")
    try:
        manifest = json.loads(mf.read_text())
        files = manifest["files"]
    except Exception as e:
        refuse(out_dir, record_path, f"unreadable MANIFEST.json ({e})")
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
    # also reject files PRESENT in the dump but ABSENT from the manifest
    # (a concurrent writer appending into a published dir would otherwise
    # pass — the manifest must be the complete inventory, both directions).
    # Hidden files (Hadoop .crc sidecars) are excluded from the contract.
    on_disk = {str(p.relative_to(out_dir)) for p in out_dir.rglob("*")
               if p.is_file() and not p.name.startswith(".")
               and p.name != "MANIFEST.json"}
    for extra in sorted(on_disk - set(files)):
        bad.append(f"{extra}: present on disk but not in manifest")
    if bad:
        for b in bad[:20]:
            print(f"MANIFEST VIOLATION: {b}", file=sys.stderr)
        refuse(out_dir, record_path,
               f"{len(bad)} manifest violations (first: {bad[0]})")
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
    record_path = sys.argv[3] if len(sys.argv) > 3 else None
    check_manifest(Path(out_dir), record_path)
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():
            # Spark-written tables (ScaleGen-inflated dirs) are
            # directories of part files, not single files
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = n_timeout = 0
    # Optional per-oracle wall budget for scale spot-sweeps: some
    # mirrors are deliberately naive (banded quadratic levenshtein,
    # unrolled iterations) and DuckDB-infeasible decades above the
    # gate SF even though the Spark side completes. A timed-out mirror
    # is recorded as oracle_timeout=true — a DECLARED budget miss,
    # counted separately from pass/fail (never silently dropped).
    budget = float(os.environ.get("GRAFT_ORACLE_TIMEOUT_SEC", "0") or 0)
    # self-produced per-query record (VERDICT r13 item 1): committed each
    # round as CORRECTNESS_SELF_r{N}.json so a correctness artifact exists
    # at HEAD regardless of the driver's own gate recording.
    record = {"_meta": {"invocation": " ".join(sys.argv),
                        "sf_dir": sf_dir, "out_dir": out_dir}}
    for name, sql in sorted(oracle.items()):
        entry = {"rows_match": False, "schema_match": False,
                 "hash_match": False, "err": None}
        record[name] = entry

        def fail(msg):
            nonlocal n_fail
            entry["err"] = msg
            print(f"FAIL {name}: {msg}")
            n_fail += 1

        try:
            if budget > 0:
                timer = threading.Timer(budget, con.interrupt)
                timer.start()
                try:
                    want = norm(con.sql(sql).df())
                finally:
                    timed_out = not timer.is_alive()
                    timer.cancel()
            else:
                want = norm(con.sql(sql).df())
        except Exception as e:
            if budget > 0 and timed_out:
                entry["err"] = None
                entry["oracle_timeout"] = True
                n_timeout += 1
                print(f"TIMEOUT {name}: oracle exceeded {budget:.0f}s budget")
                continue
            fail(f"oracle SQL error: {e}")
            continue
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            fail("no spark result dir")
            continue
        try:
            got = norm(con.sql(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df())
        except Exception as e:
            fail(f"cannot read spark result: {e}")
            continue
        if list(got.columns) != list(want.columns):
            fail(f"columns {list(got.columns)} != {list(want.columns)}")
            continue
        entry["schema_match"] = True
        if len(got) != len(want):
            fail(f"rows {len(got)} != {len(want)}")
            continue
        entry["rows_match"] = True
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
            fail(f"row {i} col {c}: spark={a!r} duckdb={b!r}")
        else:
            entry["hash_match"] = True
            print(f"PASS {name} ({len(got)} rows x {len(got.columns)} cols)")
            n_pass += 1
    # rows-only entries: dumped query dirs with NO oracle SQL (declared
    # as such in SparkEntry — non-SQL-expressible by nature). Recorded
    # with the row count actually produced, never counted as hash passes.
    n_declared = 0
    for d in sorted(Path(out_dir).iterdir()):
        if d.is_dir() and d.name not in oracle:
            try:
                n = con.sql(
                    f"SELECT count(*) FROM read_parquet('{d}/*.parquet')"
                ).fetchone()[0]
            except Exception as e:
                n, err = None, str(e)
            else:
                err = None
            record[d.name] = {"declared_rows_only": True, "rows": n,
                              "err": err}
            n_declared += 1
    record["_meta"].update(n_pass=n_pass, n_fail=n_fail,
                           n_oracle_timeout=n_timeout,
                           n_rows_only_declared=n_declared,
                           exit_code=1 if n_fail else 0)
    if record_path:
        Path(record_path).write_text(json.dumps(record, indent=1,
                                                sort_keys=True) + "\n")
        print(f"record written: {record_path}")
    timeout_note = f" / {n_timeout} oracle-timeout" if n_timeout else ""
    print(f"== {n_pass} pass / {n_fail} fail / "
          f"{n_declared} rows-only declared{timeout_note} ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
