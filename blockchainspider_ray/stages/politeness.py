"""Per-host politeness budgets with carry-over.

Generalizes the reference's rate limiter (``AsyncItemBucket``: min interval
``1/(n*qps)`` per provider under a lock, reference utils/bucket.py:122-152)
to a BSP crawl: each host may be fetched at most ``budget`` times per round;
URLs over budget are NOT lost — they defer to the next round with their
priority carried over (the case the single-threaded reference never hits,
SURVEY.md §7.5#4).

Admission is vectorized: rank within host by (priority desc, arrival order)
via a polars window; the first ``budget`` of each host admit.  Skewed hosts
therefore cost O(deferred) memory, not a stalled pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import polars as pl
import pyarrow as pa


@dataclass
class Candidate:
    """One frontier URL waiting for admission."""

    url: str
    host: str
    priority: float
    ctx: dict = field(default_factory=dict)
    arrival: int = 0  # global pop index; ties broken FIFO
    mass: object = None  # parked strategy mass (see strategies.extract_mass)


#: per-host cap meaning "unlimited" when only Crawl-delay overrides apply
_NO_CAP = 1 << 62


def _budget_expr(
    budget: int, host_budgets: Optional[dict], host_col: str = "host"
) -> "pl.Expr":
    """Effective per-host cap as a polars expression: ``host_budgets``
    (e.g. from robots Crawl-delay) overrides the global ``budget``;
    budget <= 0 means unlimited for non-overridden hosts."""
    default = budget if budget > 0 else _NO_CAP
    if not host_budgets:
        return pl.lit(default, dtype=pl.Int64)
    return pl.col(host_col).replace_strict(
        host_budgets, default=default, return_dtype=pl.Int64
    )


def admit_per_host(
    cands: List[Candidate],
    budget: int,
    allowed_hosts: Optional[set] = None,
    host_budgets: Optional[dict] = None,
) -> Tuple[List[Candidate], List[Candidate]]:
    """Split candidates into (admitted, deferred) under a per-host budget.

    budget <= 0 means unlimited.  ``allowed_hosts`` (e.g. from a robots /
    domain-scope filter) drops disallowed hosts entirely (reference
    ``allowed_domains`` semantics, spiders/labels/web.py:32-34).
    ``host_budgets`` maps host -> cap overriding the global budget (the
    robots Crawl-delay path: cap = round-seconds / delay).
    """
    if allowed_hosts is not None:
        cands = [c for c in cands if c.host in allowed_hosts]
    if (budget <= 0 and not host_budgets) or not cands:
        return list(cands), []
    df = pl.DataFrame(
        {
            "i": list(range(len(cands))),
            "host": [c.host for c in cands],
            "priority": [c.priority for c in cands],
            "arrival": [c.arrival for c in cands],
        }
    )
    ranked = df.sort(["priority", "arrival"], descending=[True, False]).with_columns(
        pl.int_range(pl.len()).over("host").alias("rank_in_host"),
        _budget_expr(budget, host_budgets).alias("cap"),
    )
    admit_idx = set(ranked.filter(pl.col("rank_in_host") < pl.col("cap"))["i"].to_list())
    admitted = [c for j, c in enumerate(cands) if j in admit_idx]
    deferred = [c for j, c in enumerate(cands) if j not in admit_idx]
    return admitted, deferred


def admit_per_host_table(
    frontier: pa.Table,
    budget: int,
    host_col: str = "host",
    priority_col: str = "priority",
    host_budgets: Optional[dict] = None,
) -> Tuple[pa.Table, pa.Table]:
    """Arrow-native variant for batch (k>>1) rounds: returns
    (admitted, deferred) tables.  Used inside map_batches when the frontier
    itself is a Dataset."""
    if (budget <= 0 and not host_budgets) or frontier.num_rows == 0:
        return frontier, frontier.schema.empty_table()
    df = pl.from_arrow(frontier).with_row_index("__i")
    cap = _budget_expr(budget, host_budgets, host_col)
    ranked = df.sort([priority_col, "__i"], descending=[True, False]).with_columns(
        pl.int_range(pl.len()).over(host_col).alias("__rank"), cap.alias("__cap")
    )
    admitted = (
        ranked.filter(pl.col("__rank") < pl.col("__cap")).sort("__i").drop(["__i", "__rank", "__cap"])
    )
    deferred = (
        ranked.filter(pl.col("__rank") >= pl.col("__cap")).sort("__i").drop(["__i", "__rank", "__cap"])
    )
    return admitted.to_arrow(), deferred.to_arrow()
