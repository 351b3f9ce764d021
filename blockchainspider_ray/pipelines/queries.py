"""Aggregator for the query-pipeline family modules.

The former 41k-line queries.py monolith now lives in:
  common.py           shared imports / helpers / constants
  q_<family>[_b].py   the q_* pipeline functions by family
  registry_p*.py      ORACLE_SQL / SQL_QUERIES / NOSQL_QUERIES entries

This module re-exports every name (tests and callers keep importing
`blockchainspider_ray.pipelines.queries`) and orders the registries
core-first for driver sampling.  Cross-family references are explicit
function-local imports at their use sites (no post-load injection)."""

from __future__ import annotations

from .common import *  # noqa: F401,F403
from .q_relational import *  # noqa: F401,F403
from .q_curation import *  # noqa: F401,F403
from .q_text import *  # noqa: F401,F403
from .q_crawl import *  # noqa: F401,F403
from .q_etl import *  # noqa: F401,F403
from .q_stats import *  # noqa: F401,F403
from .q_graph import *  # noqa: F401,F403
from .q_dedup import *  # noqa: F401,F403
from .q_similarity import *  # noqa: F401,F403
from .q_sketch import *  # noqa: F401,F403
from .q_stats_b import *  # noqa: F401,F403
from .q_stats_c import *  # noqa: F401,F403
from .q_stats_d import *  # noqa: F401,F403
from . import registry_p01 as _mod_registry_p01  # noqa: F401  (executes entries)
from . import registry_p02 as _mod_registry_p02  # noqa: F401  (executes entries)
from . import registry_p03 as _mod_registry_p03  # noqa: F401  (executes entries)
from .registry_p01 import NOSQL_QUERIES  # noqa: F401
from .registry_p01 import ORACLE_SQL  # noqa: F401
from .registry_p01 import SQL_QUERIES  # noqa: F401

# core-first registry ordering (VERDICT r3 #7): any prefix/sample a
# driver takes covers the SURVEY §2 + curation/dedup/ANN core first
_CORE_FIRST = [
    "lineitem_agg",
    "filter_project",
    "sort_limit",
    "join_agg",
    "events_agg",
    "extract_text",
    "extract_links",
    "canonicalize_urls",
    "extract_entities",
    "host_histogram",
    "outflow_sum",
    "node_degree",
    "topk_frontier",
    "bfs_reachable",
    "crawl_bfs_depths",
    "crawl_bfs_dataset",
    "dedup_exact",
    "minhash_signatures",
    "minhash_dedup_pairs",
    "minhash_incremental",
    "simhash",
    "simhash_pairs",
    "lsh_bucket_histogram",
    "dedup_clusters",
    "dedup_survivors",
    "ann_bruteforce",
    "embedding_knn",
    "embedding_norms",
    "ann_ivf_exact",
    "embedding_neardup_pairs",
    "token_count",
    "quality_score",
    "doc_fingerprint",
    "langid",
    "pii_redact",
    "gopher_quality",
    "c4_filter",
    "decontaminate",
    "decontaminate_fuzzy",
    "pack_sequences",
    "curation_pipeline",
    "pretrain_mix",
    "events_window",
    "asof_join",
    "asof_join_partitioned",
    "range_join",
    "range_join_partitioned",
    "hash_join",
    "bloom_semijoin",
    "tpch_q3",
    "politeness_admission",
    "transfer_normalize",
    "receipt_join",
    "token_decode",
    "trace_flatten",
    "hll_distinct",
    "cms_token_counts",
    "triangle_count",
    "pagerank",
]

def _reorder(d):
    out = {k: d[k] for k in _CORE_FIRST if k in d}
    out.update({k: v for k, v in d.items() if k not in out})
    return out

SQL_QUERIES = _reorder(SQL_QUERIES)
NOSQL_QUERIES = _reorder(NOSQL_QUERIES)
ORACLE_SQL = _reorder(ORACLE_SQL)
