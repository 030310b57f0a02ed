"""TF-IDF top-terms per document (corpus-relative term salience).

Classic curation/analysis operator: rank each document's terms by
``tf * ln(N / df)``. Fully distributed:

* term-frequency explode — one (doc_id, token, tf) row per DISTINCT
  token per doc (per-doc Counter; rows are documents, the per-row
  kernel is the tokenizer);
* document frequencies — batch-level partial combine (a token counts
  once per doc by construction), then one groupby-sum; df state is
  vocabulary-sized and stays distributed;
* idf join — the tf stream bucket-hash-joins the df table on token
  (``partitioned_hash_join``; no broadcast vocabulary);
* per-doc top-k — ``groupby(doc_id)`` groups hold one doc's DISTINCT
  tokens (bounded by doc length), ranked by weight desc / token asc.

Tokenization is the engine-wide ``str.split()`` contract (same as
token_frequencies), so the oracle mirrors it with regexp_split.
"""

from collections import Counter

import numpy as np
import pyarrow as pa

from .relational import partitioned_hash_join


def _tf_explode(batch: pa.Table) -> pa.Table:
    doc_ids, tokens, tfs = [], [], []
    for doc_id, text in zip(
        batch["doc_id"].to_pylist(), batch["text"].to_pylist()
    ):
        counts = Counter(text.split())
        doc_ids.extend([doc_id] * len(counts))
        tokens.extend(counts.keys())
        tfs.extend(counts.values())
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "token": pa.array(tokens, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
        }
    )


def doc_tfidf_topk(docs_ds, k: int = 3, num_buckets: int = 64):
    """(doc_id, token, weight): each document's top-``k`` terms by
    ``tf * ln(N/df)``, weight desc / token asc. ``docs_ds`` needs
    (doc_id, text)."""
    from ray.data.aggregate import Sum

    n_docs = docs_ds.count()

    tf = docs_ds.map_batches(_tf_explode, batch_format="pyarrow")

    def df_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("token").aggregate([("doc_id", "count")])
        return g.rename_columns(["token", "df"])

    df = (
        tf.map_batches(df_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
    )

    joined = partitioned_hash_join(tf, df, key="token",
                                   num_buckets=num_buckets)

    def weigh(batch: pa.Table) -> pa.Table:
        tf_v = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        df_v = batch["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        # exact operand order of the oracle: tf * ln(N / df)
        w = tf_v * np.log(np.float64(n_docs) / df_v)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].combine_chunks(),
                "token": batch["token"].combine_chunks(),
                "weight": pa.array(w, pa.float64()),
            }
        )

    weighted = joined.map_batches(weigh, batch_format="pyarrow")

    def topk(group: pa.Table) -> pa.Table:
        w = group["weight"].to_numpy(zero_copy_only=False)
        toks = group["token"].to_numpy(zero_copy_only=False)
        order = np.lexsort((toks, -w))[:k]
        return group.take(pa.array(np.sort(order)))

    return weighted.groupby("doc_id").map_groups(
        topk, batch_format="pyarrow"
    )
