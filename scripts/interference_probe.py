"""Diagnose the in-suite late-sequence interference (BASELINE.md).

Observation to explain: heavy iterative queries (kmeans_clusters,
semdedup) read 2-2.5x their standalone cost when they run late in the
100+-query bench sequence, while standalone runs match history.

Hypothesis (VERDICT r03 item 5): plasma fill -> spill. Materialized
datasets from earlier queries stay pinned while their Python Dataset
objects are alive; CPython reference cycles delay collection, so
object-store usage ratchets up across the sequence until allocation
pressure/spill slows the big iterative plans.

Method: run the full query suite in bench order in ONE Ray session,
recording per-query wall seconds plus, after each query, the object
store usage and cumulative spill counters from Ray's memory summary.
``--mitigate`` additionally runs ``gc.collect()`` after every query.
Compare the two runs' tails (and the store-usage curves).

Usage:
    python scripts/interference_probe.py [sf_dir] [--mitigate]
Prints one JSON line: per-query sec, store MiB curve, spill totals.
"""

import gc
import json
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = next(
    (a for a in sys.argv[1:] if not a.startswith("--")),
    "/root/testdata/sf0.1",
)
MITIGATE = "--mitigate" in sys.argv
WATCH = {"kmeans_clusters", "semdedup", "pagerank", "dedup_ngram",
         "dedup_minhash", "curate_pages", "token_budget_mix_distributed"}


def store_stats() -> dict:
    """Object-store pressure without the grpc-backed memory_summary
    (grpc is absent here): cumulative spill from raylet.out's
    'Spilled N MiB, M objects' lines, bytes sitting in the session's
    ray_spilled_objects dir, and /dev/shm tmpfs usage (the plasma
    mmap lives there; tmpfs 'used' counts touched pages)."""
    import glob
    import shutil

    import ray

    sess = ray._private.worker._global_node.get_session_dir_path()
    spilled_mib, spilled_objects = 0, 0
    try:
        text = Path(sess, "logs", "raylet.out").read_text()
        hits = re.findall(r"Spilled (\d+) MiB, (\d+) objects", text)
        if hits:
            spilled_mib, spilled_objects = map(int, hits[-1])
    except OSError:
        pass
    spill_dir_bytes = sum(
        Path(f).stat().st_size
        for d in glob.glob(f"{sess}/ray_spilled_objects*")
        for f in glob.glob(f"{d}/**", recursive=True)
        if Path(f).is_file()
    )
    shm = shutil.disk_usage("/dev/shm")
    return {
        "spilled_mib": spilled_mib,
        "spilled_objects": spilled_objects,
        "spill_dir_mib": spill_dir_bytes >> 20,
        "shm_used_mib": shm.used >> 20,
    }


def main():
    import ray

    ray.init(
        address="local",
        num_cpus=32,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    out = {
        "metric": "interference_probe",
        "mitigate": MITIGATE,
        "sf_dir": SF_DIR,
        "queries": {},
        "watch": {},
    }
    t_suite = time.time()
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        res = fn(SF_DIR)
        sec = round(time.time() - t0, 3)
        del res
        if MITIGATE:
            gc.collect()
        st = store_stats()
        out["queries"][name] = {"sec": sec, **st}
        if name in WATCH:
            out["watch"][name] = {"sec": sec, **st}
    out["suite_sec"] = round(time.time() - t_suite, 1)
    out["final"] = store_stats()
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
