"""Webtext-curation queries + oracles (PII scrubbing, per-domain cap,
benchmark decontamination, repetition filter).

Joined into the driver surface by ``pipelines.queries``. The PII query
follows the pages-synthesizer convention (CLAUDE.md): the injected PII
is a pure function of doc_id, reconstructed verbatim in the oracle's
CTE, so the redaction kernels are exercised against known ground truth
on an otherwise PII-free corpus.
"""

from typing import Callable, Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.webtext import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    capped_topk_per_key,
    decontaminate,
    pii_scrub_batch,
    repetition_batch,
)

WEBTEXT_QUERIES: Dict[str, Callable] = {}
WEBTEXT_ORACLE_SQL: Dict[str, str] = {}


def _docs(sf_dir: str, columns):
    import ray.data

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=columns
    )


# --------------------------------------------------------------- PII

def inject_pii_batch(batch: pa.Table) -> pa.Table:
    """Deterministic PII augmentation (pure function of doc_id — the
    pages-synthesizer pattern): docs with doc_id % 3 == 0 gain an
    email, % 4 a phone number, % 5 an IPv4 address. Vectorized string
    build; the oracle CTE reconstructs the same text in SQL."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    s_id = pc.cast(batch["doc_id"], pa.string())

    def s(arr: np.ndarray):
        return pc.cast(pa.array(arr.astype(np.int64)), pa.string())

    email = pc.binary_join_element_wise(
        " contact u", s_id, "@m", s(ids % 7), ".example.com", ""
    )
    phone = pc.binary_join_element_wise(
        " call 415-555-",
        pc.utf8_lpad(s(ids % 10000), width=4, padding="0"),
        "",
    )
    ip = pc.binary_join_element_wise(
        " from 10.",
        s(ids % 256),
        ".",
        s((ids // 7) % 256),
        ".",
        s((ids // 11) % 256),
        "",
    )
    empty = pa.scalar("", pa.string())
    text = pc.binary_join_element_wise(
        batch["text"],
        pc.if_else(pa.array(ids % 3 == 0), email, empty),
        pc.if_else(pa.array(ids % 4 == 0), phone, empty),
        pc.if_else(pa.array(ids % 5 == 0), ip, empty),
        "",
    )
    return pa.Table.from_pydict({"doc_id": batch["doc_id"], "text": text})


def _q_pii_redact(sf_dir: str):
    """PII detect + redact over the (deterministically augmented)
    corpus: per-doc email/phone/IP counts and the redacted text.
    Pure Arrow RE2 kernels — same engine as the DuckDB oracle."""
    ds = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(inject_pii_batch, batch_format="pyarrow")
        .map_batches(pii_scrub_batch, batch_format="pyarrow")
    )
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


_PII_AUG_CTE = """
WITH aug AS (
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 3 = 0
                   THEN ' contact u' || CAST(doc_id AS VARCHAR)
                        || '@m' || CAST(doc_id % 7 AS VARCHAR)
                        || '.example.com'
                   ELSE '' END
           || CASE WHEN doc_id % 4 = 0
                   THEN ' call 415-555-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   ELSE '' END
           || CASE WHEN doc_id % 5 = 0
                   THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                        || '.' || CAST((doc_id // 7) % 256 AS VARCHAR)
                        || '.' || CAST((doc_id // 11) % 256 AS VARCHAR)
                   ELSE '' END
           AS text
    FROM documents
)
"""

WEBTEXT_QUERIES["pii_redact"] = _q_pii_redact
WEBTEXT_ORACLE_SQL["pii_redact"] = (
    _PII_AUG_CTE
    + f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT)
           AS n_email,
       CAST(len(regexp_extract_all(
           regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
           '{PHONE_RE}')) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(
           regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
           '{IPV4_RE}')) AS BIGINT) AS n_ip,
       regexp_replace(
           regexp_replace(
               regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{IPV4_RE}', '<IP>', 'g'),
           '{PHONE_RE}', '<PHONE>', 'g') AS clean
FROM aug
ORDER BY doc_id
"""
)


# -------------------------------------------------------- domain cap

def _url_domain_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> (domain, doc_id, n_chars) with the url built
    by the synthesizer's pure formula and the domain then extracted
    from the STRING (the operator under test), not recomputed from
    doc_id."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    site = pc.utf8_lpad(
        pc.cast(pa.array((ids % 50).astype(np.int64)), pa.string()),
        width=2,
        padding="0",
    )
    url = pc.binary_join_element_wise(
        "https://site",
        site,
        ".example.org/articles/",
        pc.utf8_lpad(pc.cast(batch["doc_id"], pa.string()), width=8, padding="0"),
        "",
    )
    domain = pc.replace_substring_regex(
        url, pattern=r"^https://([^/]+)/.*$", replacement=r"\1"
    )
    return pa.Table.from_pydict(
        {
            "domain": domain,
            "doc_id": batch["doc_id"],
            "n_chars": batch["n_chars"],
        }
    )


def _q_domain_cap(sf_dir: str):
    """Per-domain document cap (C4/RefinedWeb-style): keep at most 5
    docs per registered domain, longest first. Combiner-tree top-k —
    no whole-domain shuffle."""
    ds = _docs(sf_dir, ["doc_id", "n_chars"]).map_batches(
        _url_domain_batch, batch_format="pyarrow"
    )
    out = capped_topk_per_key(ds, key="domain", k=5, val="n_chars")
    return (
        out.to_pandas()
        .sort_values(["domain", "doc_id"])
        .reset_index(drop=True)
    )


WEBTEXT_QUERIES["domain_cap"] = _q_domain_cap
WEBTEXT_ORACLE_SQL["domain_cap"] = """
WITH pages AS (
    SELECT 'https://site' || lpad(CAST(doc_id % 50 AS VARCHAR), 2, '0')
           || '.example.org/articles/'
           || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
           doc_id, n_chars
    FROM documents
)
SELECT domain, doc_id, CAST(n_chars AS BIGINT) AS n_chars
FROM (
    SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS domain,
           doc_id, n_chars,
           row_number() OVER (PARTITION BY regexp_extract(url, 'https://([^/]+)/', 1)
                              ORDER BY n_chars DESC, doc_id) AS rn
    FROM pages
)
WHERE rn <= 5
ORDER BY domain, doc_id
"""


# ---------------------------------------------------- decontamination

_BENCH_MOD = 101  # doc_id % 101 == 0 -> benchmark member (~1%)


def _split_docs(sf_dir: str):
    docs = _docs(sf_dir, ["doc_id", "text"])

    def part(member: bool):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            mask = ids % _BENCH_MOD == 0
            return batch.filter(pa.array(mask if member else ~mask))

        return fn

    return docs.map_batches(part(False), batch_format="pyarrow"), docs.map_batches(
        part(True), batch_format="pyarrow"
    )


def _q_decontaminate(sf_dir: str, plan: str = "broadcast"):
    """Test-set decontamination: docs sharing any word 3-gram with the
    held-out benchmark slice (doc_id % 101 == 0), with the count of
    distinct contaminated grams."""
    corpus, bench = _split_docs(sf_dir)
    out = decontaminate(corpus, bench, n=3, plan=plan)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


_DECON_SQL = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(text, '\\s+'),
                       x -> x <> '') AS t
    FROM documents
),
grams AS (
    SELECT doc_id, array_to_string(t[i:i+2], ' ') AS g
    FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)
    WHERE len(t) >= 3
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % {_BENCH_MOD} = 0)
SELECT g2.doc_id, CAST(count(DISTINCT g2.g) AS BIGINT) AS n_hits
FROM grams g2 JOIN bench b ON g2.g = b.g
WHERE g2.doc_id % {_BENCH_MOD} <> 0
GROUP BY g2.doc_id
ORDER BY g2.doc_id
"""

WEBTEXT_QUERIES["decontaminate"] = _q_decontaminate
WEBTEXT_ORACLE_SQL["decontaminate"] = _DECON_SQL
WEBTEXT_QUERIES["decontaminate_partitioned"] = (
    lambda sf_dir: _q_decontaminate(sf_dir, plan="partitioned")
)
WEBTEXT_ORACLE_SQL["decontaminate_partitioned"] = _DECON_SQL


# ------------------------------------------------------- repetition

def _q_doc_repetition(sf_dir: str):
    """Gopher-style repetition filter signals: per doc the most
    frequent word-2-gram count, the total gram count, and the
    integer-exact ``repetitive`` flag (top gram > 5% of grams)."""
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: repetition_batch(b, n=2, pct_threshold=5),
        batch_format="pyarrow",
    )
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


WEBTEXT_QUERIES["doc_repetition"] = _q_doc_repetition
WEBTEXT_ORACLE_SQL["doc_repetition"] = """
WITH toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(text, '\\s+'),
                       x -> x <> '') AS t
    FROM documents
),
grams AS (
    SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
    FROM toks, UNNEST(range(1, len(t))) AS r(i)
    WHERE len(t) >= 2
),
counts AS (
    SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g
),
agg AS (
    SELECT doc_id, CAST(max(c) AS BIGINT) AS n_top,
           CAST(sum(c) AS BIGINT) AS n_grams
    FROM counts GROUP BY doc_id
)
SELECT doc_id, n_top, n_grams,
       (n_top * 100 > 5 * n_grams) AS repetitive
FROM agg
ORDER BY doc_id
"""
