"""Link-graph, data-mixing and importance-selection queries + oracles.

Three corpus-level operator families added round 3:

* ``link_targets`` / ``domain_outdegree`` — href extraction from the
  RAW page payloads (``stages.links``): the engine sniffs + decodes
  each payload and regex-parses anchors; the oracle never parses HTML
  but reconstructs the synthesizer's deterministic link structure
  (nav words, ``/t/{(doc_id*7+i)%997}`` farm targets, footer) straight
  from ``documents`` — end-to-end cross-validation of the real parse
  against ground truth, the pages-synthesizer pattern (CLAUDE.md).
* ``token_budget_mix`` — per-language token-budget prefix selection
  (``stages.mixing.token_budget_select``); the oracle is the direct
  window-function spelling the engine computes shuffle-free.
* ``dsir_select`` — DSIR hashed-unigram importance scores; the oracle
  retrains the same smoothed bucket model in SQL.
"""

from typing import Callable, Dict

CORPUS_QUERIES: Dict[str, Callable] = {}
CORPUS_ORACLE_SQL: Dict[str, str] = {}


def _docs(sf_dir: str, columns):
    import ray.data

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=columns
    )


# ------------------------------------------------------- link graph

def _q_link_targets(sf_dir: str):
    """Top-100 most-linked-to targets across all crawled page rows
    (re-crawl duplicates each count: frontier pressure is per fetch)."""
    from ..sources.pages import read_pages
    from ..stages.links import top_link_targets

    return top_link_targets(read_pages(sf_dir), k=100)


def _q_domain_outdegree(sf_dir: str):
    """Total outlink count per source domain."""
    from ..sources.pages import read_pages
    from ..stages.links import domain_outdegree

    return domain_outdegree(read_pages(sf_dir))


# Pages with parseable HTML: synthesizer kinds 3 (latin-1), 6 (garble
# body, boilerplate intact), 7 (UTF-16) and 9-19 (utf-8); kinds 0/1/8
# are PDFs, 2/4 empty payloads, 5 binary junk. Every such page carries
# nav links '/'||word for the first 6+doc_id%6 nav words, 18 farm
# links '/t/'||(doc_id*7+i)%997, and 2 footer links; doc_id%10==0
# pages are crawled 3 times (sources/pages.py:synthesize_rows).
_LINKS_CTE = """
WITH eligible AS (
    SELECT doc_id,
           CASE WHEN doc_id % 10 = 0 THEN 3 ELSE 1 END AS m
    FROM documents
    WHERE doc_id % 20 IN (3, 6, 7) OR doc_id % 20 >= 9
), nav_words(i, w) AS (
    VALUES (0, 'Home'), (1, 'News'), (2, 'Sports'), (3, 'Opinion'),
           (4, 'Culture'), (5, 'Science'), (6, 'Business'),
           (7, 'Travel'), (8, 'Archive'), (9, 'About'),
           (10, 'Contact'), (11, 'Subscribe')
), links AS (
    SELECT e.doc_id, '/' || n.w AS target, e.m
    FROM eligible e JOIN nav_words n ON n.i < 6 + e.doc_id % 6
    UNION ALL
    SELECT e.doc_id,
           '/t/' || CAST((e.doc_id * 7 + t.i) % 997 AS VARCHAR), e.m
    FROM eligible e, UNNEST(generate_series(0, 17)) AS t(i)
    UNION ALL
    SELECT e.doc_id, f.target, e.m
    FROM eligible e, (VALUES ('/privacy'), ('/terms')) AS f(target)
)
"""

CORPUS_QUERIES["link_targets"] = _q_link_targets
CORPUS_ORACLE_SQL["link_targets"] = (
    _LINKS_CTE
    + """
SELECT target, CAST(sum(m) AS BIGINT) AS n
FROM links
GROUP BY target
ORDER BY n DESC, target
LIMIT 100
"""
)

CORPUS_QUERIES["domain_outdegree"] = _q_domain_outdegree
CORPUS_ORACLE_SQL["domain_outdegree"] = """
SELECT 'site' || lpad(CAST(doc_id % 50 AS VARCHAR), 2, '0')
       || '.example.org' AS src_domain,
       CAST(sum((CASE WHEN doc_id % 10 = 0 THEN 3 ELSE 1 END)
                * (26 + doc_id % 6)) AS BIGINT) AS n_links
FROM documents
WHERE doc_id % 20 IN (3, 6, 7) OR doc_id % 20 >= 9
GROUP BY 1
ORDER BY 1
"""


# ------------------------------------------------ token-budget mixing

def _q_token_budget_mix(sf_dir: str):
    """Half-the-tokens-per-language mixture subset: the maximal
    hash-ordered document prefix per lang whose token total fits
    floor(lang_total / 2)."""
    from ..stages.mixing import token_budget_select

    docs = _docs(sf_dir, ["doc_id", "lang", "text"])
    return token_budget_select(docs, budget_num=1, budget_den=2)


CORPUS_QUERIES["token_budget_mix"] = _q_token_budget_mix
CORPUS_ORACLE_SQL["token_budget_mix"] = """
WITH toks AS (
    SELECT doc_id, lang,
           len(list_filter(regexp_split_to_array(text, '\\s+'),
                           x -> x <> '')) AS n_tokens
    FROM documents
), bud AS (
    SELECT lang, CAST(sum(n_tokens) // 2 AS BIGINT) AS budget
    FROM toks GROUP BY lang
), ordered AS (
    SELECT doc_id, lang, n_tokens,
           sum(n_tokens) OVER (
               PARTITION BY lang
               ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
           ) AS cum
    FROM toks
)
SELECT o.doc_id, o.lang, CAST(o.n_tokens AS BIGINT) AS n_tokens
FROM ordered o JOIN bud USING (lang)
WHERE o.cum <= bud.budget
ORDER BY o.doc_id
"""


# ------------------------------------- window cumsum / shard layout

def _q_shard_assign(sf_dir: str):
    """Fixed-token-budget output sharding: documents laid out in
    deterministic hash order per language and cut every 1000 tokens —
    the distributed window-cumsum primitive (``stages.window``), no
    global sort."""
    from ..stages.window import shard_assign

    docs = _docs(sf_dir, ["doc_id", "lang", "text"])
    return shard_assign(docs, shard_tokens=1000)


CORPUS_QUERIES["shard_assign"] = _q_shard_assign
CORPUS_ORACLE_SQL["shard_assign"] = """
WITH toks AS (
    SELECT doc_id, lang,
           len(list_filter(regexp_split_to_array(text, '\\s+'),
                           x -> x <> '')) AS n_tokens
    FROM documents
), ordered AS (
    SELECT doc_id, lang, n_tokens,
           sum(n_tokens) OVER (
               PARTITION BY lang
               ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
           ) AS cum
    FROM toks
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST((cum - n_tokens) // 1000 AS BIGINT) AS shard_id
FROM ordered
ORDER BY doc_id
"""


# --------------------------------------------- DSIR importance scores

def _q_dsir_select(sf_dir: str):
    """DSIR hashed-unigram importance scores against the benchmark
    slice (doc_id % 101 == 0) as the target distribution."""
    from ..stages.mixing import dsir_score

    docs = _docs(sf_dir, ["doc_id", "text"])
    return dsir_score(docs, target_mod=101, n_buckets=256)


CORPUS_QUERIES["dsir_select"] = _q_dsir_select
CORPUS_ORACLE_SQL["dsir_select"] = """
WITH toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(text, '\\s+'),
                       x -> x <> '') AS t
    FROM documents
), exploded AS (
    SELECT doc_id, unnest(t) AS w FROM toks
), bucketed AS (
    SELECT doc_id,
           (strpos('0123456789abcdef', substr(md5(w), 1, 1)) * 16
            + strpos('0123456789abcdef', substr(md5(w), 2, 1))
            - 17) AS b
    FROM exploded
), cnt AS (
    SELECT b,
           count(*) AS c_all,
           count(*) FILTER (WHERE doc_id % 101 = 0) AS c_tgt
    FROM bucketed GROUP BY b
), tot AS (
    SELECT sum(c_all) AS t_all, sum(c_tgt) AS t_tgt FROM cnt
), lr AS (
    SELECT b,
           log2((c_tgt + 1) / (t_tgt + 256))
           - log2((c_all + 1) / (t_all + 256)) AS lr
    FROM cnt CROSS JOIN tot
)
SELECT x.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       sum(lr.lr) / count(*) AS score
FROM bucketed x JOIN lr USING (b)
GROUP BY x.doc_id
ORDER BY x.doc_id
"""
