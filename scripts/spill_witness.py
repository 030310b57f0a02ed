"""Bounded-memory spill witness (100x-readiness evidence).

Runs the heaviest pipelines twice in fresh Ray sessions — once with
the default object store, once with the store squeezed small enough
that the same input CANNOT fit resident (forcing plasma spill) — and
asserts the outputs are bit-identical (same order-insensitive value
hash), recording throughput and the spill counters from Ray's own
memory summary.

This is the single-node stand-in for "a 256-node run whose working
set exceeds aggregate plasma": correctness must not depend on the
working set fitting in memory, only throughput may degrade.

Usage: python scripts/spill_witness.py [sf_dir] [store_mib]
Prints one JSON line; record the result in BASELINE.md.
"""

import json
import re
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
STORE_MIB = int(sys.argv[2]) if len(sys.argv) > 2 else 256
QUERIES = [
    "dedup_ngram_partitioned",
    "curate_pages",
    "semdedup",
    "token_budget_mix_distributed",
]


def run_pass(tag: str, object_store_memory=None) -> dict:
    """One fresh Ray session running every witness query."""
    import ray

    kwargs = dict(
        address="local",
        num_cpus=32,
        include_dashboard=False,
        logging_level="ERROR",
    )
    if object_store_memory:
        kwargs["object_store_memory"] = object_store_memory
    ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod
    from scripts.check_oracle import to_pandas, value_hash

    qs = entrymod.queries()
    out = {"tag": tag, "queries": {}}
    for name in QUERIES:
        t0 = time.time()
        df = to_pandas(qs[name](SF_DIR))
        out["queries"][name] = {
            "sec": round(time.time() - t0, 2),
            "rows": len(df),
            "hash": value_hash(df),
        }
    # cumulative spill counters from raylet.out (the grpc-backed
    # memory_summary API is unavailable in this container)
    sess = ray._private.worker._global_node.get_session_dir_path()
    out["spilled_mib"], out["spilled_objects"] = 0, 0
    try:
        text = (Path(sess) / "logs" / "raylet.out").read_text()
        hits = re.findall(r"Spilled (\d+) MiB, (\d+) objects", text)
        if hits:
            out["spilled_mib"], out["spilled_objects"] = map(int, hits[-1])
    except OSError:
        pass
    ray.shutdown()
    return out


def main():
    # subprocess per pass: object_store_memory is fixed at init and a
    # dirty plasma from pass 1 must not leak into pass 2
    if len(sys.argv) > 3 and sys.argv[3] in ("default", "small"):
        tag = sys.argv[3]
        store = None if tag == "default" else STORE_MIB * 1024 * 1024
        print(json.dumps(run_pass(tag, store)))
        return

    results = {}
    for tag in ("default", "small"):
        proc = subprocess.run(
            [sys.executable, __file__, SF_DIR, str(STORE_MIB), tag],
            capture_output=True,
            text=True,
        )
        lines = [
            ln for ln in proc.stdout.splitlines() if ln.startswith("{")
        ]
        if proc.returncode != 0 or not lines:
            print(proc.stdout[-2000:], file=sys.stderr)
            print(proc.stderr[-4000:], file=sys.stderr)
            raise SystemExit(f"pass {tag} failed rc={proc.returncode}")
        results[tag] = json.loads(lines[-1])

    matches = {
        q: results["default"]["queries"][q]["hash"]
        == results["small"]["queries"][q]["hash"]
        for q in QUERIES
    }
    summary = {
        "metric": "spill_witness",
        "sf_dir": SF_DIR,
        "store_mib_small": STORE_MIB,
        "all_hashes_match": all(matches.values()),
        "hash_match": matches,
        "spilled_mib_small": results["small"]["spilled_mib"],
        "spilled_objects_small": results["small"]["spilled_objects"],
        "spilled_mib_default": results["default"]["spilled_mib"],
        "sec_default": {
            q: results["default"]["queries"][q]["sec"] for q in QUERIES
        },
        "sec_small": {
            q: results["small"]["queries"][q]["sec"] for q in QUERIES
        },
    }
    print(json.dumps(summary))
    if not summary["all_hashes_match"]:
        raise SystemExit("HASH MISMATCH under spill")
    if summary["spilled_mib_small"] == 0:
        print(
            "WARNING: small pass never spilled — lower store_mib for a "
            "real witness",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
