"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 (or argv[1]) through Ray and
the matching ``oracle_sql()`` through DuckDB, then compares row count,
column names and an order-insensitive value hash.

Usage: python scripts/check_oracle.py [sf_dir] [--only q1,q2,...]
                                      [--json out.json] [--sessions N]

``--json`` (or ``GRAFT_ORACLE_JSON=path``) writes a per-query artifact
{name: {rows, oracle_rows, cols_match, hash_match, secs, oracled}} so
rounds can diff the full 200-query surface (the driver's
CORRECTNESS_r{N}.json only samples 50).

``--sessions N`` splits the query list into N chunks and runs each in
a fresh subprocess (own Ray session). Motivation: a single 200-query
session occasionally dies to a Ray-core flake (task_manager.cc:930
"Tried to complete task that was not pending", observed 2026-08-19
after 164 green queries) which aborts the whole process regardless of
engine correctness. Chunked sessions bound the blast radius; a chunk
that crashes is retried once on its not-yet-reported queries. Default
stays single-session for cross-round comparability.
"""

import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

ONLY = None
_argv = list(sys.argv[1:])
if "--only" in _argv:
    i = _argv.index("--only")
    ONLY = set(_argv[i + 1].split(","))
    del _argv[i : i + 2]
JSON_OUT = os.environ.get("GRAFT_ORACLE_JSON") or None
if "--json" in _argv:
    i = _argv.index("--json")
    JSON_OUT = _argv[i + 1]
    del _argv[i : i + 2]
SESSIONS = 0
if "--sessions" in _argv:
    i = _argv.index("--sessions")
    SESSIONS = int(_argv[i + 1])
    del _argv[i : i + 2]
SF_DIR = _argv[0] if _argv else "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def to_pandas(result):
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes the way a tolerant driver would
    for col in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[col]):
            df[col] = df[col].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[col]):
            df[col] = df[col].round(6)
    import numpy as np

    def norm(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return None
        if pd.isna(v) if not isinstance(v, (list, tuple, dict)) else False:
            return None
        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.floating):
            return float(v)
        return v

    rows = sorted(
        (
            tuple(norm(v) for v in row)
            for row in df.itertuples(index=False, name=None)
        ),
        key=repr,  # None-safe total order
    )
    return hashlib.sha256(repr(rows).encode()).hexdigest()[:16]


def run_sessions(n_sessions: int) -> None:
    """Split the gate into n_sessions fresh subprocesses and merge
    their per-query artifacts. A chunk whose process dies (Ray-core
    flake) is retried ONCE on whatever queries it had not yet
    reported; queries still missing after the retry count as
    failures."""
    import json
    import subprocess
    import tempfile

    import __ray_entry__ as entrymod

    names = [
        n for n in entrymod.queries()
        if ONLY is None or n in ONLY
    ]
    chunks = [names[i::n_sessions] for i in range(n_sessions)]
    chunks = [c for c in chunks if c]
    merged: dict = {}
    failures = 0
    crashed_chunks = 0
    script = str(Path(__file__).resolve())

    def run_chunk(chunk: list, label: str) -> set:
        """Run one subprocess over `chunk`; merge whatever it reports.
        Returns the set of queries it did NOT report (crash loss)."""
        nonlocal failures
        with tempfile.NamedTemporaryFile(
            suffix=".json", delete=False
        ) as tf:
            out = tf.name
        proc = subprocess.run(
            [
                sys.executable, script, SF_DIR,
                "--only", ",".join(chunk), "--json", out,
            ],
            capture_output=True, text=True,
        )
        got: dict = {}
        try:
            with open(out) as f:
                got = json.load(f).get("queries", {})
        except (OSError, json.JSONDecodeError):
            pass
        finally:
            try:
                os.unlink(out)
            except OSError:
                pass
        merged.update(got)
        for name, rec in got.items():
            ok = rec.get("hash_match", True) and rec.get(
                "cols_match", True
            )
            if rec.get("oracled") and (
                not ok or rec["rows"] != rec.get("oracle_rows")
            ):
                failures += 1
                print(f"[{label}] FAIL {name}")
        missing = set(chunk) - set(got)
        if missing and proc.returncode != 0:
            # surface the crash cause (otherwise captured stderr is
            # silently dropped and flakes are undiagnosable)
            tail = "\n".join(proc.stderr.strip().splitlines()[-8:])
            print(f"[{label}] rc={proc.returncode} stderr tail:\n{tail}")
        if proc.returncode != 0 and not missing and failures == 0:
            # subprocess reported every query green but exited
            # nonzero: post-report crash (e.g. during shutdown) —
            # results are complete, so don't fail the gate on it.
            print(f"[{label}] post-report crash ignored "
                  f"(rc={proc.returncode})")
        return missing

    for ci, chunk in enumerate(chunks):
        label = f"session {ci + 1}/{len(chunks)} ({len(chunk)} queries)"
        print(f"[{label}] start")
        missing = run_chunk(chunk, label)
        if missing:
            crashed_chunks += 1
            print(f"[{label}] crashed with {len(missing)} unreported "
                  f"queries; retrying those once")
            missing2 = run_chunk(sorted(missing), label + " retry")
            for name in sorted(missing2):
                failures += 1
                print(f"[{label}] LOST {name} (crashed twice)")

    if JSON_OUT:
        with open(JSON_OUT, "w") as f:
            json.dump(
                {
                    "sf_dir": SF_DIR,
                    "sessions": n_sessions,
                    "crashed_chunks": crashed_chunks,
                    "forced_partitioned": os.environ.get(
                        "GRAFT_FORCE_PARTITIONED", ""
                    ) not in ("", "0"),
                    "n_queries": len(merged),
                    "n_failures": failures,
                    "queries": merged,
                },
                f, indent=1, sort_keys=True,
            )
        print(f"wrote {JSON_OUT}")
    print(
        f"sessions done: {len(merged)} queries, {failures} failures, "
        f"{crashed_chunks} chunk crashes"
    )
    sys.exit(1 if failures else 0)


def main():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=8,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    report = {}
    import time

    for name, fn in qs.items():
        if ONLY is not None and name not in ONLY:
            continue
        t0 = time.perf_counter()
        got = to_pandas(fn(SF_DIR))
        secs = round(time.perf_counter() - t0, 3)
        if name not in oracles:
            print(f"{name:28s} rows={len(got):6d}  (no oracle: rows-only)")
            report[name] = {
                "rows": len(got), "oracled": False, "secs": secs,
            }
            continue
        want = con.execute(oracles[name]).fetchdf()
        gh, wh = value_hash(got), value_hash(want)
        ok_rows = len(got) == len(want)
        ok_cols = sorted(got.columns) == sorted(want.columns)
        ok_hash = gh == wh
        status = "OK " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        report[name] = {
            "rows": len(got), "oracle_rows": len(want),
            "cols_match": ok_cols, "hash_match": ok_hash,
            "oracled": True, "secs": secs,
        }
        print(
            f"{name:28s} {status} rows {len(got)}/{len(want)} "
            f"cols {ok_cols} hash {gh}/{wh}"
        )
        if not ok_hash and ok_cols and ok_rows:
            merged = got.merge(
                want, how="outer", indicator=True,
                on=list(sorted(got.columns)),
            )
            diff = merged[merged["_merge"] != "both"]
            print(diff.head(6).to_string())
    if JSON_OUT:
        import json

        with open(JSON_OUT, "w") as f:
            json.dump(
                {
                    "sf_dir": SF_DIR,
                    "forced_partitioned": os.environ.get(
                        "GRAFT_FORCE_PARTITIONED", ""
                    ) not in ("", "0"),
                    "n_queries": len(report),
                    "n_failures": failures,
                    "queries": report,
                },
                f, indent=1, sort_keys=True,
            )
        print(f"wrote {JSON_OUT}")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    if SESSIONS > 1:
        run_sessions(SESSIONS)
    else:
        main()
