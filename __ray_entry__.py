"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in blockchainspider_ray) calls ``ray.init``/``ray.shutdown``.

- ``entry()``      — flagship BFS web crawl over a page store derived
                     deterministically from sf0.001's ``documents`` table.
- ``queries()``    — every implemented operator/pipeline (SURVEY.md §2 +
                     the training-data operator families; see COVERAGE.md
                     for the full map); callables take ``sf_dir`` and
                     return Dataset / DataFrame / Table.
- ``oracle_sql()`` — DuckDB mirrors for the SQL-expressible subset (497 of
                     the 529 queries, incl. the partitioned hash equi-join
                     + TPC-H-Q3 flagship, Bloom-prefiltered exact semi-join,
                     incremental LSH near-dup, and full-value MinHash/SimHash/LSH-
                     pairs/langid/rolling-fingerprint/embedding-near-dup/
                     dedup-cluster/exact-IVF mirrors, the recursive-CTE
                     crawl-BFS mirrors, and the web-text curation set:
                     PII redaction, Gopher quality rules, 4-gram eval-set
                     decontamination, sequence packing, duplicate-span
                     fractions, vocab top-k, TF-IDF top terms, seeded
                     global shuffle rank, unigram LM scoring, and the
                     composed curation_pipeline flagship); the
                     rows-only rest
                     (weight-ranked crawls, IVF ANN, multimodal decode,
                     TextRank, checksum validation, MoTS motifs, Solana/
                     DCFG parsers) is covered by pytest conformance suites
                     (reference classes as oracle) instead.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: crawl the synthetic web
    derived from `documents` (BFS + politeness + cuckoo seen set) and return
    the crawl order."""
    from blockchainspider_ray.pipelines.queries import q_crawl_bfs

    return q_crawl_bfs("/root/testdata/sf0.001").to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    from blockchainspider_ray.pipelines.queries import NOSQL_QUERIES, SQL_QUERIES

    return {**SQL_QUERIES, **NOSQL_QUERIES}


def oracle_sql() -> dict[str, str]:
    from blockchainspider_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
