"""Multimodal (binary-payload) stages: decode / feature / resize.

Images, audio and video ride through the engine as opaque ``binary``
columns with typed metadata — exactly like the pdf/html payloads in the
extraction pipeline. The decode kernels for real formats (JPEG/PNG/WAV
decode, frame sampling) need codec libraries that are NOT in this
container, so they are import-gated stubs raising
``NotImplementedError``; the Ray-side plumbing — schema, actor-pool
signature, batch sizing, error-as-data rows — is real and tested
against a deterministic synthetic format (``FIMG``), whose header is a
pure function of ``doc_id`` so a DuckDB oracle can verify the decode
output end-to-end.

Synthetic frame layout (big-endian):
``b"FIMG" | width:u16 | height:u16 | channels:u8 | payload bytes``
"""

import struct
from typing import Tuple

import pyarrow as pa

MAGIC = b"FIMG"

try:  # pragma: no cover - codec libs absent in this container
    from PIL import Image as _pil_image  # noqa: F401

    HAVE_PIL = True
except Exception:
    HAVE_PIL = False


def fake_image_payload(doc_id: int) -> bytes:
    """Deterministic synthetic image: dimensions derived from doc_id
    (width = 64 + doc_id % 577, height = 64 + (doc_id * 7) % 353,
    channels = 1 + doc_id % 3); body is a repeating byte ramp."""
    width = 64 + doc_id % 577
    height = 64 + (doc_id * 7) % 353
    channels = 1 + doc_id % 3
    body_len = min(width * height * channels, 4096)
    body = bytes((doc_id + i) % 256 for i in range(body_len))
    return MAGIC + struct.pack(">HHB", width, height, channels) + body


def decode_header(payload: bytes) -> Tuple[int, int, int]:
    """Parse the synthetic header; raises ValueError on bad payloads."""
    if len(payload) < 9 or not payload.startswith(MAGIC):
        raise ValueError("not a FIMG payload")
    width, height, channels = struct.unpack(">HHB", payload[4:9])
    return width, height, channels


def decode_real_image(payload: bytes):  # pragma: no cover
    """Real-format decode — stub: the container ships no codec libs.

    On a production image (pillow/ffmpeg installed) this branch opens
    the payload and returns (width, height, channels)."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "real image decode requires pillow; not available in this "
            "container — synthetic FIMG payloads only"
        )
    raise NotImplementedError("wire PIL decode here on a codec-enabled image")


class ImageDecodeStage:
    """Actor-pool decode stage: (doc_id, payload) -> typed metadata.

    Mirrors the extraction cascade's error contract: undecodable rows
    become (status='failed', error=...) rows, never task failures.
    Use small ``batch_size`` — payload rows are wide.
    """

    def __init__(self):
        self.n_decoded = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        # header parse without copying payload bodies: operate on the
        # Arrow binary column's offset/data buffers directly — only
        # the 9 header bytes of each row are ever gathered
        col = batch["payload"].combine_chunks()
        if isinstance(col, pa.ChunkedArray):  # single-chunk after combine
            col = col.chunk(0)
        n = len(col)
        off_dtype = (
            np.int64 if pa.types.is_large_binary(col.type) else np.int32
        )
        offs = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
            col.offset : col.offset + n + 1
        ].astype(np.int64)
        lengths = np.diff(offs)
        if col.null_count:
            nulls = np.asarray(col.is_null())
            lengths = np.where(nulls, 0, lengths)
        data = (
            np.frombuffer(col.buffers()[2], dtype=np.uint8)
            if col.buffers()[2] is not None
            else np.empty(0, np.uint8)
        )
        long_enough = lengths >= 9
        # gather each candidate row's 9 header bytes in one fancy index
        safe_starts = np.where(long_enough, offs[:-1], 0)
        hdr = (
            data[safe_starts[:, None] + np.arange(9)]
            if n and data.size >= 9
            else np.zeros((n, 9), np.uint8)
        )
        magic = np.frombuffer(MAGIC, dtype=np.uint8)
        ok = long_enough & (hdr[:, :4] == magic).all(axis=1)
        w = (hdr[:, 4].astype(np.int32) << 8) | hdr[:, 5]
        h = (hdr[:, 6].astype(np.int32) << 8) | hdr[:, 7]
        c = hdr[:, 8].astype(np.int32)
        self.n_decoded += int(ok.sum())
        bad = ~ok
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].combine_chunks(),
                "width": pa.array(w, pa.int32(), mask=bad),
                "height": pa.array(h, pa.int32(), mask=bad),
                "channels": pa.array(c, pa.int32(), mask=bad),
                "n_bytes": pa.array(lengths, pa.int64()),
                "status": pa.array(
                    np.where(ok, "succeeded", "failed").tolist(),
                    pa.string(),
                ),
                "error": pa.array(
                    [None if o else "not a FIMG payload" for o in ok],
                    pa.string(),
                ),
            }
        )


def resize_metadata_batch(
    batch: pa.Table, max_side: int = 256
) -> pa.Table:
    """Resize planning stage (metadata-only stub of the pixel op):
    compute the output dimensions of an aspect-preserving downscale to
    ``max_side``. The real pixel resample is codec-gated like decode."""
    widths = batch["width"].to_pylist()
    heights = batch["height"].to_pylist()
    out_w, out_h = [], []
    for w, h in zip(widths, heights):
        if w is None or h is None:
            out_w.append(None)
            out_h.append(None)
            continue
        side = max(w, h)
        if side <= max_side:
            out_w.append(w)
            out_h.append(h)
        else:
            # floor-scaling, matching CAST(w * max_side / side AS INT)
            out_w.append(w * max_side // side)
            out_h.append(h * max_side // side)
    batch = batch.append_column("resized_w", pa.array(out_w, pa.int32()))
    return batch.append_column("resized_h", pa.array(out_h, pa.int32()))


def synth_images_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> (doc_id, payload) synthetic image table; every
    20th doc gets a corrupt payload to exercise the failure path."""
    ids = batch["doc_id"].to_pylist()
    payloads = [
        b"\x00garbage" if i % 20 == 19 else fake_image_payload(int(i))
        for i in ids
    ]
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary()),
        }
    )


def image_pipeline(docs_ds, batch_size: int = 256):
    """documents -> synth payloads -> actor-pool decode -> resize plan."""
    imgs = docs_ds.map_batches(synth_images_batch, batch_format="pyarrow")
    decoded = imgs.map_batches(
        ImageDecodeStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
    )
    return decoded.map_batches(resize_metadata_batch, batch_format="pyarrow")


# -- audio: decode + windowing (same contract as images) ---------------------

AUDIO_MAGIC = b"FAUD"
# ``b"FAUD" | sample_rate:u32 | n_samples:u32 | channels:u8 | pcm...``


def fake_audio_payload(doc_id: int) -> bytes:
    """Deterministic synthetic audio clip: sample_rate = 8000 +
    (doc_id % 5) * 4000, n_samples = 1000 + (doc_id * 13) % 100000,
    channels = 1 + doc_id % 2; body is a truncated byte ramp standing
    in for PCM."""
    sr = 8000 + (doc_id % 5) * 4000
    n_samples = 1000 + (doc_id * 13) % 100000
    channels = 1 + doc_id % 2
    body = bytes((doc_id + i) % 256 for i in range(min(n_samples, 2048)))
    return AUDIO_MAGIC + struct.pack(">IIB", sr, n_samples, channels) + body


def decode_audio_header(payload: bytes) -> Tuple[int, int, int]:
    if len(payload) < 13 or not payload.startswith(AUDIO_MAGIC):
        raise ValueError("not a FAUD payload")
    sr, n_samples, channels = struct.unpack(">IIB", payload[4:13])
    return sr, n_samples, channels


class AudioDecodeStage:
    """Actor-pool audio decode: (doc_id, payload) -> clip metadata +
    1-second feature-window count (the shape a feature extractor —
    fbank/MFCC over fixed windows — consumes). Real-codec decode is
    import-gated exactly like images; undecodable rows fail as data."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        cols = {k: [] for k in (
            "sample_rate", "n_samples", "channels", "duration_ms",
            "n_windows", "status", "error",
        )}
        for payload in payloads:
            try:
                sr, n, c = decode_audio_header(payload or b"")
                cols["sample_rate"].append(sr)
                cols["n_samples"].append(n)
                cols["channels"].append(c)
                cols["duration_ms"].append(n * 1000 // sr)
                cols["n_windows"].append((n + sr - 1) // sr)  # 1 s windows
                cols["status"].append("succeeded")
                cols["error"].append(None)
            except ValueError as exc:
                for k in ("sample_rate", "n_samples", "channels",
                          "duration_ms", "n_windows"):
                    cols[k].append(None)
                cols["status"].append("failed")
                cols["error"].append(str(exc))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sample_rate": pa.array(cols["sample_rate"], pa.int32()),
                "n_samples": pa.array(cols["n_samples"], pa.int64()),
                "channels": pa.array(cols["channels"], pa.int32()),
                "duration_ms": pa.array(cols["duration_ms"], pa.int64()),
                "n_windows": pa.array(cols["n_windows"], pa.int64()),
                "status": pa.array(cols["status"], pa.string()),
                "error": pa.array(cols["error"], pa.string()),
            }
        )


def synth_audio_batch(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_pylist()
    payloads = [
        b"\x00garbage" if i % 20 == 19 else fake_audio_payload(int(i))
        for i in ids
    ]
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary()),
        }
    )


def audio_pipeline(docs_ds, batch_size: int = 256):
    return docs_ds.map_batches(
        synth_audio_batch, batch_format="pyarrow"
    ).map_batches(
        AudioDecodeStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
    )


# -- video: header decode + frame sampling -----------------------------------

VIDEO_MAGIC = b"FVID"
# ``b"FVID" | fps:u16 | n_frames:u32 | width:u16 | height:u16 | data...``


def fake_video_payload(doc_id: int) -> bytes:
    """Deterministic synthetic video: fps = 12 + (doc_id % 4) * 6,
    n_frames = 100 + (doc_id * 11) % 5000, frame dims like images."""
    fps = 12 + (doc_id % 4) * 6
    n_frames = 100 + (doc_id * 11) % 5000
    width = 64 + doc_id % 577
    height = 64 + (doc_id * 7) % 353
    body = bytes((doc_id + i) % 256 for i in range(1024))
    return (
        VIDEO_MAGIC
        + struct.pack(">HIHH", fps, n_frames, width, height)
        + body
    )


def decode_video_header(payload: bytes) -> Tuple[int, int, int, int]:
    if len(payload) < 14 or not payload.startswith(VIDEO_MAGIC):
        raise ValueError("not a FVID payload")
    return struct.unpack(">HIHH", payload[4:14])


class VideoFrameSampleStage:
    """Actor-pool frame sampler: every ``sample_every``-th frame index
    (0-based). Emits the sampled-frame count + first/last sampled
    index — the plan a real decoder executes; pixel extraction is
    codec-gated."""

    def __init__(self, sample_every: int = 25):
        self.sample_every = sample_every

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        cols = {k: [] for k in (
            "fps", "n_frames", "width", "height", "n_sampled",
            "last_sampled", "status", "error",
        )}
        k = self.sample_every
        for payload in payloads:
            try:
                fps, n_frames, w, h = decode_video_header(payload or b"")
                n_sampled = (n_frames + k - 1) // k
                cols["fps"].append(fps)
                cols["n_frames"].append(n_frames)
                cols["width"].append(w)
                cols["height"].append(h)
                cols["n_sampled"].append(n_sampled)
                cols["last_sampled"].append((n_sampled - 1) * k)
                cols["status"].append("succeeded")
                cols["error"].append(None)
            except ValueError as exc:
                for key in ("fps", "n_frames", "width", "height",
                            "n_sampled", "last_sampled"):
                    cols[key].append(None)
                cols["status"].append("failed")
                cols["error"].append(str(exc))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "fps": pa.array(cols["fps"], pa.int32()),
                "n_frames": pa.array(cols["n_frames"], pa.int64()),
                "width": pa.array(cols["width"], pa.int32()),
                "height": pa.array(cols["height"], pa.int32()),
                "n_sampled": pa.array(cols["n_sampled"], pa.int64()),
                "last_sampled": pa.array(cols["last_sampled"], pa.int64()),
                "status": pa.array(cols["status"], pa.string()),
                "error": pa.array(cols["error"], pa.string()),
            }
        )


def synth_video_batch(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_pylist()
    payloads = [
        b"\x00garbage" if i % 20 == 19 else fake_video_payload(int(i))
        for i in ids
    ]
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary()),
        }
    )


def video_pipeline(docs_ds, sample_every: int = 25, batch_size: int = 256):
    return docs_ds.map_batches(
        synth_video_batch, batch_format="pyarrow"
    ).map_batches(
        VideoFrameSampleStage,
        fn_constructor_kwargs={"sample_every": sample_every},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
    )
