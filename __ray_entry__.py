"""Driver contract for the Ray-Data-native extraction engine.

The driver calls ``ray.init`` itself before importing this module, so
nothing here (or in the library) initialises or shuts down Ray.

* ``entry()`` — flagship extraction pipeline on sf0.001: synthesize
  the Common-Crawl-style pages table from ``documents`` (deterministic,
  see ``zzzarchived_arxiv_fulltext_ray/sources/pages.py``), run
  sniff -> latest-crawl dedup -> actor-pool extraction cascade -> PSV.
* ``queries()`` — one callable per implemented operator/pipeline.
* ``oracle_sql()`` — DuckDB-equivalent SQL for each query (omitted for
  ops SQL cannot express; the driver then records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (Dataset, lazy)."""
    from zzzarchived_arxiv_fulltext_ray.pipelines.extraction import (
        extraction_pipeline,
    )
    from zzzarchived_arxiv_fulltext_ray.sources.pages import read_pages

    pages = read_pages("/root/testdata/sf0.001")
    return extraction_pipeline(pages)


def queries() -> dict[str, Callable[[str], Any]]:
    from zzzarchived_arxiv_fulltext_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from zzzarchived_arxiv_fulltext_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
