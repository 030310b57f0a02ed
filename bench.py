"""Benchmark harness. Prints ONE JSON line.

Headline: the flagship extraction job — ``read_parquet(pages)`` ->
sniff -> latest-crawl dedup -> actor-pool extraction cascade -> PSV ->
``write_parquet`` — over a pre-materialized pages table derived from
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1). The pages table is
expanded (x``GRAFT_EXPAND`` text length) and replicated
(x``GRAFT_REPLICATE`` distinct urls, kind distribution preserved) so
the job is large enough to exercise streaming execution; preparation
and a page-cache warm-up read are untimed.

``value`` = headline wall seconds; ``queries`` = per-query seconds for
the rest of the suite; extras: docs/sec + rows.

``--scaling``: runs the headline twice in fresh processes at
``num_cpus`` 8 and 32 on the SAME input (the sandbox proxy for N vs 4N
nodes) and reports both throughputs + scaling efficiency.
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
EXPAND = int(os.environ.get("GRAFT_EXPAND", "20"))
REPLICATE = int(os.environ.get("GRAFT_REPLICATE", "32"))
# "uniform": every page ~EXPAND x base text. "lognormal": per-doc
# deterministic factor with a heavy tail (median ~EXPAND, p99 ~40x) —
# the FIXTURES.md skew-realism mode; pair with GRAFT_GIANT bytes.
EXPAND_MODE = os.environ.get("GRAFT_EXPAND_MODE", "uniform")
GIANT_THRESHOLD = int(os.environ.get("GRAFT_GIANT", "0")) or None
BENCH_ROOT = Path(os.environ.get("GRAFT_BENCH_DIR", "/tmp/graft_bench"))
# Timed output goes to tmpfs: writing ~1.5 GB to shared-hypervisor
# disk added +-15% wall noise; shm isolates compute from disk jitter.
OUT_ROOT = Path(
    os.environ.get(
        "GRAFT_OUT_DIR",
        "/dev/shm/graft_bench_out"
        if Path("/dev/shm").exists()
        else str(BENCH_ROOT),
    )
)

# Replication offset: divisible by every modulus the synthesizer uses
# (20 kinds, 10 dup-cycle, 50 sites) so replicas keep the same payload
# mix while getting distinct urls.
REPLICA_OFFSET = 1_000_000


def pages_dir() -> Path:
    from zzzarchived_arxiv_fulltext_ray.sources.pages import SYNTH_VERSION

    sf_tag = Path(SF_DIR).name
    mode = "" if EXPAND_MODE == "uniform" else f"_{EXPAND_MODE}"
    return (
        BENCH_ROOT
        / f"pages_v{SYNTH_VERSION}_{sf_tag}_E{EXPAND}_R{REPLICATE}{mode}"
    )


def prepare_pages(ray):
    """Materialize the bench pages table to /tmp Parquet (once)."""
    out = pages_dir()
    done = out / "_DONE"
    if done.exists():
        return out
    import pyarrow as pa

    import ray.data as rd
    from zzzarchived_arxiv_fulltext_ray.sources.pages import (
        lognormal_expand_factor,
        pages_batch_from_documents,
    )

    docs = rd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def replicate(batch: pa.Table) -> pa.Table:
        tables = []
        for r in range(REPLICATE):
            ids = pa.compute.add(batch["doc_id"], r * REPLICA_OFFSET)
            tables.append(
                pa.Table.from_arrays(
                    [ids, batch["text"].combine_chunks(),
                     batch["lang"].combine_chunks()],
                    names=["doc_id", "text", "lang"],
                )
            )
        return pa.concat_tables(tables)

    if EXPAND_MODE == "lognormal":
        expand = lambda doc_id: lognormal_expand_factor(doc_id, EXPAND)  # noqa: E731
    else:
        expand = EXPAND
    pages = docs.map_batches(replicate, batch_format="pyarrow").map_batches(
        lambda b: pages_batch_from_documents(b, expand=expand),
        batch_format="pyarrow",
    )
    tmp = out.with_suffix(".tmp")
    if tmp.exists():
        import shutil

        shutil.rmtree(tmp)
    pages.write_parquet(str(tmp))
    tmp.rename(out)
    (out / "_DONE").touch()
    return out


def headline(ray) -> dict:
    """Timed: full extraction job over the materialized pages table."""
    import ray.data as rd
    from zzzarchived_arxiv_fulltext_ray.pipelines.extraction import (
        extraction_pipeline,
    )

    src = str(pages_dir())
    # untimed warm-up read: measure compute+shuffle, not first-touch disk
    rd.read_parquet(src).count()

    import shutil

    # clear stale outputs of earlier runs before timing (disk pressure
    # in the shared bench dir is a measurable noise source)
    OUT_ROOT.mkdir(parents=True, exist_ok=True)
    for root in (BENCH_ROOT, OUT_ROOT):
        for stale in root.glob("out_*"):
            shutil.rmtree(stale, ignore_errors=True)
    out_dir = OUT_ROOT / f"out_{NUM_CPUS}"

    conc_env = os.environ.get("GRAFT_CONCURRENCY", "")
    if conc_env.isdigit():
        concurrency = int(conc_env)
    else:
        # fixed pool at ~3/4 of the CPUs: the extraction actors are the
        # bottleneck stage but read/write task pools need slots too —
        # a pool that reserves every CPU starves them (measured: 24 of
        # 32 beats both 32 and autoscaling by ~1.5x)
        concurrency = max(1, NUM_CPUS * 3 // 4)
    batch_size = int(os.environ.get("GRAFT_BATCH", "128"))

    t0 = time.time()
    pages = rd.read_parquet(src)
    extracted = extraction_pipeline(
        pages,
        concurrency=concurrency,
        batch_size=batch_size,
        giant_threshold_bytes=GIANT_THRESHOLD,
    )
    extracted.write_parquet(str(out_dir))
    wall = time.time() - t0

    n_rows = rd.read_parquet(str(out_dir)).count()
    return {"sec": wall, "rows": n_rows, "docs_per_sec": n_rows / wall}


def query_suite() -> dict:
    import __ray_entry__ as entrymod

    # GRAFT_ONLY_QUERIES="q1,q2" restricts the suite (dev iteration);
    # unset = every query, the cross-round-comparable default
    only = os.environ.get("GRAFT_ONLY_QUERIES", "")
    only_set = {q.strip() for q in only.split(",") if q.strip()}
    timings = {}
    for name, fn in entrymod.queries().items():
        if only_set and name not in only_set:
            continue
        t0 = time.time()
        fn(SF_DIR)
        timings[name] = round(time.time() - t0, 3)
    return timings


def run_once() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    prepare_pages(ray)
    # best-of-N headline (default 2): single-run wall time on this
    # shared VM swings +-15-20% with identical code; the minimum is
    # the stable estimate of the pipeline's true cost. All runs are
    # reported alongside the chosen value.
    n_runs = int(os.environ.get("GRAFT_HEADLINE_RUNS", "3"))
    runs = [headline(ray) for _ in range(max(1, n_runs))]
    head = min(runs, key=lambda r: r["sec"])
    # GRAFT_FRESH_SUITE=1: run the query suite in a fresh Ray session
    # instead of the headline's. The round-4 interference probe showed
    # the object store never fills across the whole suite (zero spill,
    # flat shm) but heavy iterative queries inflate 2-2.5x when they
    # follow the three headline extraction jobs in one session —
    # session state (grown cached-worker pool), not query
    # accumulation. Default off for cross-round comparability.
    if os.environ.get("GRAFT_FRESH_SUITE") and not os.environ.get(
        "GRAFT_HEADLINE_ONLY"
    ):
        ray.shutdown()
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
        ctx.execution_options.verbose_progress = False
    queries = (
        {} if os.environ.get("GRAFT_HEADLINE_ONLY") else query_suite()
    )
    ray.shutdown()

    sf = Path(SF_DIR).name.replace("sf", "")
    return {
        "metric": "extraction_pipeline_sec",
        "value": round(head["sec"], 3),
        "headline_runs_sec": [round(r["sec"], 3) for r in runs],
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "num_cpus": NUM_CPUS,
        "rows": head["rows"],
        "docs_per_sec": round(head["docs_per_sec"], 1),
        "expand": EXPAND,
        "replicate": REPLICATE,
    }


def run_scaling() -> dict:
    pair = os.environ.get("GRAFT_SCALING_CPUS", "8,32").split(",")
    lo, hi = int(pair[0]), int(pair[1])

    def sub(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_HEADLINE_ONLY="1",
                   GRAFT_HEADLINE_RUNS="1")  # best-of-2 is at sub level
        out = subprocess.run(
            [sys.executable, __file__],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def best_of(ncpu: int, runs: int = 2) -> dict:
        # best-of-N in fresh processes: wall time on a shared sandbox
        # is noisy (page cache, /tmp pressure); the minimum is the
        # stable estimate of the pipeline's cost at that parallelism
        results = [sub(ncpu) for _ in range(runs)]
        return min(results, key=lambda r: r["value"])

    r_lo, r_hi = best_of(lo), best_of(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)

    # Hardware baseline: the same kernel with NO Ray, in pools matching
    # the two extraction-pool sizes. On this VM per-core throughput
    # drops at high core counts (all-core frequency/memory bandwidth);
    # a real N->4N cluster adds NODES, so that term vanishes there.
    # eff_normalized isolates the engine's own scaling behavior.
    hw = _hardware_percore_ratio(lo * 3 // 4, hi * 3 // 4)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus": [lo, hi],
        "sec": {str(lo): t_lo, str(hi): t_hi},
        "docs_per_sec": {
            str(lo): r_lo["docs_per_sec"],
            str(hi): r_hi["docs_per_sec"],
        },
        "hardware_percore_ratio": round(hw, 3),
        "efficiency_normalized": round(min(eff / hw, 1.0), 3),
        "rows": r_hi["rows"],
        "sf": r_hi["sf"],
    }


def _hardware_percore_ratio(nproc_lo: int, nproc_hi: int) -> float:
    """Per-core kernel throughput at nproc_hi relative to nproc_lo,
    measured with plain multiprocessing (no Ray)."""
    import multiprocessing as mp

    def rate(nproc: int) -> float:
        with mp.Pool(nproc) as pool:
            rates = pool.map(_kernel_rate_probe, range(nproc))
        return sum(rates) / len(rates)

    return min(rate(nproc_hi) / rate(nproc_lo), 1.0)


def _kernel_rate_probe(_seed: int) -> float:
    import pyarrow.parquet as pq

    from zzzarchived_arxiv_fulltext_ray.functions.cascade import (
        extract_payload,
    )
    from zzzarchived_arxiv_fulltext_ray.functions.psv import (
        normalize_text_psv,
    )
    from zzzarchived_arxiv_fulltext_ray.sources.pages import synthesize_rows

    t = pq.read_table(f"{SF_DIR}/documents.parquet").slice(0, 200)
    rows = synthesize_rows(
        t["doc_id"].to_pylist(),
        t["text"].to_pylist(),
        t["lang"].to_pylist(),
        expand=EXPAND,
    )
    start = time.time()
    for url, html, text in zip(rows["url"], rows["html"], rows["text"]):
        res = extract_payload(html, text or None, url)
        if res.text:
            normalize_text_psv(res.text)
    return len(rows["url"]) / (time.time() - start)


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_once()))
