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
