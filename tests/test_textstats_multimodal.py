"""Text-analysis kernels + multimodal plumbing tests."""

import pytest

from zzzarchived_arxiv_fulltext_ray.functions import textstats
from zzzarchived_arxiv_fulltext_ray.stages import multimodal


class TestQuality:
    def test_counts(self):
        c = textstats.quality_counts("The quick, brown fox. It ran!")
        assert c["n_tokens"] == 6
        assert c["n_stop"] == 2  # "The", "It"
        assert c["n_punct"] == 3  # , . !
        assert c["n_bpe_tokens"] == 9  # 6 words + 3 punctuation marks
        assert c["n_chars"] == 29
        assert c["n_alpha_chars"] == 21

    def test_empty(self):
        c = textstats.quality_counts("")
        assert c["n_tokens"] == 0 and c["n_chars"] == 0


class TestLangId:
    def test_major_languages(self):
        assert textstats.detect_language(
            "the cat and the dog are in the house with all of them"
        ) == "en"
        assert textstats.detect_language(
            "der hund und die katze sind nicht mit mir im haus"
        ) == "de"
        assert textstats.detect_language(
            "le chat et le chien sont dans la maison avec nous"
        ) == "fr"
        assert textstats.detect_language(
            "el gato y el perro no son una casa para su familia"
        ) == "es"
        assert textstats.detect_language("这是一个中文句子") == "zh"

    def test_und_cases(self):
        assert textstats.detect_language("") == "und"
        assert textstats.detect_language("zzz qqq xxx") == "und"


class TestFingerprint:
    def test_deterministic(self):
        t = "some document content for fingerprinting purposes"
        assert textstats.winnow_fingerprint(t) == textstats.winnow_fingerprint(t)

    def test_local_edit_partial_overlap(self):
        a = textstats.winnow_fingerprint(
            "alpha beta gamma delta epsilon zeta eta theta " * 4
        )
        b = textstats.winnow_fingerprint(
            "alpha beta gamma delta epsilon zeta eta iotaa " * 4
        )
        overlap = len(set(a) & set(b))
        assert overlap >= 2  # local edits keep distant fingerprints

    def test_short_text(self):
        assert textstats.winnow_fingerprint("ab") != []
        assert textstats.winnow_fingerprint("") == []


class TestMultimodal:
    def test_header_roundtrip(self):
        payload = multimodal.fake_image_payload(123)
        w, h, c = multimodal.decode_header(payload)
        assert (w, h, c) == (64 + 123 % 577, 64 + (123 * 7) % 353, 1 + 123 % 3)

    def test_corrupt_header_raises(self):
        with pytest.raises(ValueError):
            multimodal.decode_header(b"\x00garbage")

    def test_real_decode_is_gated(self):
        if not multimodal.HAVE_PIL:
            with pytest.raises(NotImplementedError):
                multimodal.decode_real_image(b"\xff\xd8\xff")

    def test_decode_stage_batch(self):
        import pyarrow as pa

        batch = pa.table(
            {
                "doc_id": pa.array([1, 19], pa.int64()),
                "payload": pa.array(
                    [multimodal.fake_image_payload(1), b"\x00garbage"],
                    pa.large_binary(),
                ),
            }
        )
        out = multimodal.ImageDecodeStage()(batch)
        assert out["status"].to_pylist() == ["succeeded", "failed"]
        resized = multimodal.resize_metadata_batch(out)
        w = resized["resized_w"].to_pylist()
        assert w[1] is None and w[0] is not None
        # aspect-preserving bound
        assert max(w[0], resized["resized_h"].to_pylist()[0]) <= 256

    def test_image_pipeline(self, ray_session):
        import ray.data

        docs = ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet", columns=["doc_id"]
        )
        df = multimodal.image_pipeline(docs).to_pandas()
        assert len(df) == 500
        assert (df.status == "failed").sum() == 25  # doc_id % 20 == 19

    def test_audio_header_roundtrip_and_windows(self):
        p = multimodal.fake_audio_payload(42)
        sr, n, c = multimodal.decode_audio_header(p)
        assert (sr, c) == (8000 + 2 * 4000, 1)
        stage = multimodal.AudioDecodeStage()
        import pyarrow as pa

        out = stage(
            pa.Table.from_pydict(
                {"doc_id": [42, 19], "payload": [p, b"\x00junk"]}
            )
        )
        assert out["status"].to_pylist() == ["succeeded", "failed"]
        assert out["duration_ms"][0].as_py() == n * 1000 // sr
        assert out["n_windows"][0].as_py() == (n + sr - 1) // sr

    def test_video_frame_sampling(self):
        import pyarrow as pa

        p = multimodal.fake_video_payload(7)
        fps, nf, w, h = multimodal.decode_video_header(p)
        stage = multimodal.VideoFrameSampleStage(sample_every=10)
        out = stage(
            pa.Table.from_pydict({"doc_id": [7], "payload": [p]})
        )
        n_sampled = out["n_sampled"][0].as_py()
        assert n_sampled == (nf + 9) // 10
        assert out["last_sampled"][0].as_py() == (n_sampled - 1) * 10
        assert out["last_sampled"][0].as_py() < nf

    def test_audio_video_pipelines(self, ray_session):
        import ray.data

        docs = ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet", columns=["doc_id"]
        )
        adf = multimodal.audio_pipeline(docs).to_pandas()
        vdf = multimodal.video_pipeline(docs).to_pandas()
        assert len(adf) == len(vdf) == 500
        assert (adf.status == "failed").sum() == 25
        assert (vdf.status == "failed").sum() == 25


class TestHeavyHitters:
    def test_count_min_exact_and_merge(self):
        import numpy as np

        from zzzarchived_arxiv_fulltext_ray.functions.shingles import (
            stable_hash64,
        )
        from zzzarchived_arxiv_fulltext_ray.functions.sketches import (
            CountMinSketch,
        )

        a, b = CountMinSketch(), CountMinSketch()
        h = np.array(
            [stable_hash64(w) for w in ("x", "y", "z")], dtype=np.uint64
        )
        a.add_hashes(h, np.array([10, 2, 1]))
        b.add_hashes(h[:1], np.array([5]))
        merged = CountMinSketch.deserialize(a.serialize()).merge(b)
        est = merged.estimate_hashes(h)
        assert est[0] >= 15 and est[1] >= 2 and est[2] >= 1
        # few keys, wide table: estimates are exact here
        assert list(est) == [15, 2, 1]

    def test_heavy_hitters_match_exact_counts(self, ray_session):
        from collections import Counter

        import pyarrow.parquet as pq
        import ray.data

        from zzzarchived_arxiv_fulltext_ray.stages.textstage import (
            heavy_hitter_tokens,
        )

        texts = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet", columns=["text"]
        )["text"].to_pylist()
        exact = Counter()
        for t in texts:
            exact.update(t.split())
        total = sum(exact.values())

        docs = ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet", columns=["text"]
        )
        got = heavy_hitter_tokens(docs, k=10)
        bound = 2 * total / (1 << 14)
        for token, est in zip(got.token, got.est_count):
            true = exact[token]
            assert true <= est <= true + bound  # CM overcounts only
        # the true top-5 are all reported in the top-10
        top_true = {t for t, _ in exact.most_common(5)}
        assert top_true <= set(got.token)


class TestSketches:
    def test_hll_accuracy_and_merge(self):
        import numpy as np

        from zzzarchived_arxiv_fulltext_ray.functions.sketches import (
            HyperLogLog,
        )

        a, b = HyperLogLog(12), HyperLogLog(12)
        a.add_values(f"user-{i}" for i in range(30000))
        b.add_values(f"user-{i}" for i in range(20000, 60000))
        merged = a.merge(b)
        est = merged.estimate()
        assert abs(est - 60000) / 60000 < 0.05
        # merge == single-sketch union
        c = HyperLogLog(12)
        c.add_values(f"user-{i}" for i in range(60000))
        assert np.array_equal(
            merged.registers,
            np.maximum(a.registers, b.registers),
        )

    def test_hll_serialize_roundtrip(self):
        from zzzarchived_arxiv_fulltext_ray.functions.sketches import (
            HyperLogLog,
        )

        s = HyperLogLog(10)
        s.add_values(str(i) for i in range(1000))
        rt = HyperLogLog.deserialize(s.serialize())
        assert rt.estimate() == s.estimate()

    def test_kmv_accuracy_merge_order_invariance(self):
        import numpy as np

        from zzzarchived_arxiv_fulltext_ray.functions.sketches import (
            KMVSketch,
        )

        a, b = KMVSketch(256), KMVSketch(256)
        a.add_values(f"user-{i}" for i in range(30000))
        b.add_values(f"user-{i}" for i in range(20000, 60000))
        merged = a.merge(b)
        est = merged.estimate()
        assert abs(est - 60000) / 60000 < 0.15  # ~1/sqrt(256) band
        # merge is order/batching invariant: one-shot union identical
        c = KMVSketch(256)
        c.add_values(f"user-{i}" for i in range(60000))
        assert np.array_equal(merged.values, c.values)
        assert merged.estimate() == c.estimate()
        assert b.merge(a).kth() == merged.kth()

    def test_kmv_exact_under_k_and_roundtrip(self):
        from zzzarchived_arxiv_fulltext_ray.functions.sketches import (
            KMVSketch,
        )

        s = KMVSketch(256)
        s.add_values(str(i) for i in range(100))
        s.add_values(str(i) for i in range(50, 100))  # dups ignored
        assert s.kth() == 0
        assert s.estimate() == 100.0  # exact while under k
        rt = KMVSketch.deserialize(s.serialize())
        assert rt.k == s.k and rt.estimate() == s.estimate()

    def test_kmv_set_overlap_exact_under_k(self, ray_session):
        import pyarrow as pa
        import ray.data

        from zzzarchived_arxiv_fulltext_ray.stages.textstage import (
            kmv_set_overlap,
        )

        # side 0: shingles of "a b c d" -> {a b c, b c d}; side 1
        # shares exactly one shingle ("b c d" via "b c d e")
        tbl = pa.Table.from_pydict(
            {
                "side": pa.array([0, 1], pa.int64()),
                "text": pa.array(["a b c d", "b c d e"], pa.string()),
            }
        )
        r = kmv_set_overlap(
            ray.data.from_arrow(tbl).repartition(2), "side", k=16
        )
        assert r["theta"] == 0  # union under k: exact branch
        assert r["est_a"] == 2.0 and r["est_b"] == 2.0
        assert r["est_union"] == 3.0
        assert r["est_intersection"] == 1.0

    def test_quantile_histogram(self):
        import numpy as np

        from zzzarchived_arxiv_fulltext_ray.functions.sketches import (
            QuantileHistogram,
        )

        rng = np.random.default_rng(7)
        data = rng.lognormal(5, 1, size=50000)
        h1, h2 = QuantileHistogram(), QuantileHistogram()
        h1.add(data[:25000])
        h2.add(data[25000:])
        merged = QuantileHistogram.deserialize(
            h1.merge(h2).serialize()
        )
        for q in (0.5, 0.9, 0.99):
            exact = float(np.quantile(data, q))
            approx = merged.quantile(q)
            assert abs(approx - exact) / exact < 0.05

    def test_ams_f2_merge_batch_invariance_and_accuracy(self):
        import numpy as np

        from zzzarchived_arxiv_fulltext_ray.functions.sketches import (
            AMSSketch,
        )

        rng = np.random.default_rng(5)
        # zipf-ish counts over 2000 keys
        counts = (10000 / np.arange(1, 2001)).astype(np.int64) + 1
        hashes = rng.integers(
            0, np.iinfo(np.uint64).max, size=2000, dtype=np.uint64
        )
        f2 = int((counts.astype(object) ** 2).sum())

        whole = AMSSketch()
        whole.add_hashes(hashes, counts)

        # additivity: same key split across parts, parts merged
        a, b = AMSSketch(), AMSSketch()
        half = counts // 2
        a.add_hashes(hashes, half)
        b.add_hashes(hashes, counts - half)
        merged = a.merge(b)
        assert np.array_equal(merged.z, whole.z)
        assert merged.estimate() == whole.estimate()

        # median-of-means (9x16): ~6% here, deterministic (seeded)
        assert abs(whole.estimate() - f2) / f2 < 0.2

        # roundtrip
        rt = AMSSketch.deserialize(whole.serialize())
        assert rt.estimate() == whole.estimate()

        with pytest.raises(ValueError):
            AMSSketch(depth=8)

    def test_distributed_sketches(self, ray_session):
        import ray.data

        from zzzarchived_arxiv_fulltext_ray.stages.textstage import (
            distinct_count_hll,
            quantiles_sketch,
        )

        docs = ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "n_chars"],
        )
        est = distinct_count_hll(docs, "doc_id")
        assert abs(est - 500) / 500 < 0.05

        qs = quantiles_sketch(
            ray.data.read_parquet(
                "/root/testdata/sf0.001/documents.parquet",
                columns=["n_chars"],
            ),
            "n_chars",
        )
        import pyarrow.parquet as pq
        import numpy as np

        vals = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet"
        )["n_chars"].to_numpy()
        for q, approx in qs.items():
            exact = float(np.quantile(vals, q))
            assert abs(approx - exact) / exact < 0.08


def test_sessionize_bucketed_edges(ray_session):
    """Bucketed sessionize: gap boundary is STRICT (diff == gap stays
    in-session), single-event users, multi-user buckets — pinned
    against a brute-force python sessionizer."""
    import datetime as dt

    import pandas as pd
    import ray.data

    from zzzarchived_arxiv_fulltext_ray.stages.textstage import (
        sessionize_events,
    )

    base = dt.datetime(2024, 1, 1)
    mins = {
        1: [0, 29, 59, 89, 120],  # 29<30 same; 59-29=30 SAME (strict);
        #                           89-59=30 same; 120-89=31 -> new
        2: [5],                   # single event
        3: [0, 31, 62],           # every diff 31 -> all new sessions
    }
    rows = [
        {"user_id": u, "ts": base + dt.timedelta(minutes=m)}
        for u, ms in mins.items()
        for m in ms
    ]
    out = (
        sessionize_events(ray.data.from_pandas(pd.DataFrame(rows)))
        .to_pandas()
        .sort_values(["user_id", "session_num"])
        .reset_index(drop=True)
    )
    got = [
        (r.user_id, r.session_num, r.session_start.minute + 60 * r.session_start.hour,
         r.session_end.minute + 60 * r.session_end.hour, r.n_events)
        for r in out.itertuples()
    ]
    assert got == [
        (1, 1, 0, 89, 4),
        (1, 2, 120 % 60 + 60 * 2, 120 % 60 + 60 * 2, 1),
        (2, 1, 5, 5, 1),
        (3, 1, 0, 0, 1),
        (3, 2, 31, 31, 1),
        (3, 3, 62 % 60 + 60, 62 % 60 + 60, 1),
    ]


def test_stable_hash64_matches_duckdb_md5_number_upper():
    """stable_hash64 is the SQL-oracle contract: bit-identical to
    DuckDB's md5_number_upper for any unicode string."""
    import duckdb

    from zzzarchived_arxiv_fulltext_ray.functions.shingles import (
        stable_hash64,
    )

    con = duckdb.connect()
    for s in ["", "a", "hello world", "naïve café", "汉字", "a b c " * 40]:
        (got,) = con.execute(
            "SELECT md5_number_upper(?)", [s]
        ).fetchone()
        assert int(got) == stable_hash64(s), s


def test_splitmix64_sql_expression_parity():
    """The SQL splitmix64 used by sketch oracles (32-bit-split wrapping
    multiply in HUGEINT) is bit-identical to the numpy implementation
    on random uint64 inputs and the wraparound edge cases."""
    import duckdb
    import pandas as pd

    from zzzarchived_arxiv_fulltext_ray.functions.shingles import (
        _splitmix64,
    )
    from zzzarchived_arxiv_fulltext_ray.pipelines.queries_training import (
        _splitmix64_sql,
    )

    import numpy as np

    rng = np.random.default_rng(99)
    vals = np.concatenate(
        [
            rng.integers(0, np.iinfo(np.uint64).max, 500, dtype=np.uint64),
            np.array(
                [0, 1, (1 << 64) - 1, (1 << 63), (1 << 32) - 1],
                dtype=np.uint64,
            ),
        ]
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": vals}))
    got = (
        con.execute(f"SELECT {_splitmix64_sql('v')} AS r FROM t")
        .fetchnumpy()["r"]
        .astype(np.uint64)
    )
    assert (got == _splitmix64(vals)).all()
