"""Central plan-choice tests: GRAFT_FORCE_PARTITIONED + the
memory-aware (bytes, not just rows) broadcast crossover."""

import numpy as np
import pyarrow as pa
import pytest

from zzzarchived_arxiv_fulltext_ray.stages import plan


def test_row_limit_still_applies(monkeypatch):
    monkeypatch.delenv("GRAFT_FORCE_PARTITIONED", raising=False)
    assert plan.choose_broadcast(10, 100)
    assert not plan.choose_broadcast(101, 100)


def test_fat_rows_flip_the_plan(monkeypatch):
    """A 4096-dim float64 embedding corpus: 65k rows pass the 1M-row
    limit but exceed the 2 GiB byte budget — the crossover must pick
    the partitioned plan where row count alone would broadcast."""
    monkeypatch.delenv("GRAFT_FORCE_PARTITIONED", raising=False)
    n_rows, dim = 70_000, 4096
    est = dim * 8  # 32 KiB/row
    assert n_rows <= 1_000_000  # row proxy alone says broadcast...
    assert not plan.choose_broadcast(n_rows, 1_000_000, est_row_bytes=est)
    # thin rows at the same count still broadcast
    assert plan.choose_broadcast(n_rows, 1_000_000, est_row_bytes=16)


def test_byte_limit_env_override(monkeypatch):
    monkeypatch.delenv("GRAFT_FORCE_PARTITIONED", raising=False)
    monkeypatch.setenv("GRAFT_BROADCAST_BYTES_LIMIT", "1000")
    assert not plan.choose_broadcast(100, 10_000, est_row_bytes=16)
    assert plan.choose_broadcast(50, 10_000, est_row_bytes=16)


def test_force_partitioned_wins(monkeypatch):
    monkeypatch.setenv("GRAFT_FORCE_PARTITIONED", "1")
    assert plan.force_partitioned()
    assert not plan.choose_broadcast(1, 100, est_row_bytes=1)
    monkeypatch.setenv("GRAFT_FORCE_PARTITIONED", "0")
    assert not plan.force_partitioned()


def test_forced_twins_identical_end_to_end(ray_session, monkeypatch):
    """Representative end-to-end equality: decontaminate and
    latest_crawl produce identical results with every broadcast fast
    path disabled (the GRAFT_FORCE_PARTITIONED=1 gate contract)."""
    import ray.data as rd

    from zzzarchived_arxiv_fulltext_ray.stages.dedup import latest_crawl
    from zzzarchived_arxiv_fulltext_ray.stages.webtext import decontaminate

    rng = np.random.default_rng(7)
    docs = pa.table(
        {
            "doc_id": pa.array(range(60), pa.int64()),
            "text": [
                " ".join(
                    f"w{rng.integers(0, 30)}" for _ in range(20)
                )
                for _ in range(60)
            ],
        }
    )
    bench = docs.slice(0, 5)
    pages = pa.table(
        {
            "url": [f"u{i % 20}" for i in range(40)],
            "warc_ts": pa.array(
                [20200101 + i for i in range(40)], pa.int64()
            ),
            "body": [f"b{i}" for i in range(40)],
        }
    )

    def run_all():
        d = (
            decontaminate(rd.from_arrow(docs), rd.from_arrow(bench), n=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        l = (
            latest_crawl(rd.from_arrow(pages))
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        return d, l

    monkeypatch.delenv("GRAFT_FORCE_PARTITIONED", raising=False)
    d0, l0 = run_all()
    assert len(d0) > 0 and len(l0) == 20
    monkeypatch.setenv("GRAFT_FORCE_PARTITIONED", "1")
    d1, l1 = run_all()
    assert d0.equals(d1)
    assert l0[["url", "warc_ts"]].equals(l1[["url", "warc_ts"]])
