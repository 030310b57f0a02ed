"""Training-batch loader: the consumption end of the pipeline.

Streams the extracted corpus as fixed-token-budget batches for a
trainer — ``iter_batches`` on the driver (or ``iter_torch_batches`` on
a codec-enabled image), never a full materialization. Tokenization is
the BPE-ish pre-tokenizer from ``functions/textstats`` hashed to
stable int32 ids (a stand-in vocabulary; swap in a real BPE table on a
production image).
"""

from typing import Iterator, List

import numpy as np
import pyarrow as pa

from ..functions.shingles import stable_hash64
from ..functions.textstats import _BPE_TOKEN

VOCAB_SIZE = 1 << 16


def tokenize_batch(batch: pa.Table) -> pa.Table:
    """text -> stable int32 token ids (vectorizable per doc)."""
    ids_col: List[List[int]] = []
    n_tokens: List[int] = []
    for text in batch["text"].to_pylist():
        toks = _BPE_TOKEN.findall(text or "")
        ids = [stable_hash64(t) % VOCAB_SIZE for t in toks]
        ids_col.append(ids)
        n_tokens.append(len(ids))
    return pa.Table.from_pydict(
        {
            "url": batch["url"].combine_chunks(),
            "token_ids": pa.array(ids_col, pa.list_(pa.int32())),
            "n_tokens": pa.array(n_tokens, pa.int64()),
        }
    )


def pack_sequences(
    extracted_ds, seq_len: int = 512, eos_id: int = 0
) -> "object":
    """Fixed-length pretraining-example packing, as a Dataset op.

    Documents are tokenized, joined with ``eos_id`` separators and
    chopped into exactly-``seq_len`` rows (``input_ids: list<int32>``)
    — the standard packed-pretraining layout. Packing is per input
    batch (stateless task): each batch's final partial sequence is
    dropped rather than carried across batches, losing < seq_len
    tokens per batch — negligible at scale and what keeps the stage an
    embarrassingly parallel ``map_batches`` instead of a stateful
    single-actor bottleneck. Only succeeded rows contribute.
    """
    import pyarrow.compute as pc

    def pack(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch["status"], "succeeded"))
        pieces: List[np.ndarray] = []
        for text in batch["text"].to_pylist():
            toks = _BPE_TOKEN.findall(text or "")
            ids = np.fromiter(
                (stable_hash64(t) % VOCAB_SIZE for t in toks),
                dtype=np.int32,
                count=len(toks),
            )
            pieces.append(ids)
            pieces.append(np.array([eos_id], dtype=np.int32))
        flat = (
            np.concatenate(pieces) if pieces else np.empty(0, np.int32)
        )
        n_seqs = len(flat) // seq_len
        flat = flat[: n_seqs * seq_len]
        return pa.Table.from_pydict(
            {
                "input_ids": pa.array(
                    flat.reshape(n_seqs, seq_len).tolist(),
                    pa.list_(pa.int32()),
                )
            }
        )

    return extracted_ds.map_batches(pack, batch_format="pyarrow")


def iter_training_batches(
    extracted_ds, batch_tokens: int = 8192
) -> Iterator[dict]:
    """Yield dicts of (urls, flat token id array, per-doc offsets),
    each holding ~``batch_tokens`` tokens. Streams with backpressure;
    only succeeded rows are consumed."""
    import pyarrow.compute as pc

    def ok_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["status"], "succeeded"))

    tokenized = extracted_ds.map_batches(
        ok_only, batch_format="pyarrow"
    ).map_batches(tokenize_batch, batch_format="pyarrow")

    urls: List[str] = []
    chunks: List[np.ndarray] = []
    offsets: List[int] = [0]
    budget = 0
    for b in tokenized.iter_batches(batch_format="pyarrow"):
        for url, ids in zip(b["url"].to_pylist(), b["token_ids"].to_pylist()):
            urls.append(url)
            arr = np.asarray(ids, dtype=np.int32)
            chunks.append(arr)
            offsets.append(offsets[-1] + len(arr))
            budget += len(arr)
            if budget >= batch_tokens:
                yield {
                    "urls": urls,
                    "token_ids": np.concatenate(chunks)
                    if chunks
                    else np.empty(0, np.int32),
                    "offsets": np.asarray(offsets, dtype=np.int64),
                }
                urls, chunks, offsets, budget = [], [], [0], 0
    if urls:
        yield {
            "urls": urls,
            "token_ids": np.concatenate(chunks)
            if chunks
            else np.empty(0, np.int32),
            "offsets": np.asarray(offsets, dtype=np.int64),
        }
