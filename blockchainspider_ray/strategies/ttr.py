"""TTR — transaction-tracing rank strategies (push-based temporal PPR).

Four variants, semantics matched 1:1 to reference strategies/txs/ttr.py:

- :class:`TTRBase`   (ttr.py:39-99):   degree-uniform forward (beta) /
  backward (1-beta) push over out/in edge counts;
- :class:`TTRWeight` (ttr.py:102-161): value-proportional splits;
- :class:`TTRTime`   (ttr.py:164-331): residual held as time-stamped
  "chips"; temporal-monotone propagation via a two-pointer sweep over
  time-sorted edges (forward: chips flow only along later edges;
  backward: only along earlier edges); unpushable chips recycle to self;
- :class:`TTRAggregate` (reference name TTRRedirect, ttr.py:334-825):
  chips keyed (symbol, timestamp); edges sharing a tx hash are netted into
  per-hash profit sets; pushed value is redistributed across symbols by a
  DFS over per-symbol edge indices (token-swap redirection).

The quirks preserved on purpose (conformance-tested against the reference
classes driven in-process): first-push special case for the source node,
``sys.maxsize`` / 0 sentinel chip timestamps when a side has no edges, pop
tie-breaking by dict insertion order with strict ``>`` against epsilon, and
the chip-merge pass that runs over *all* nodes after every push.
"""

from __future__ import annotations

import sys
from typing import Any, Dict, List, Tuple

from . import FrontierStrategy


class _TTRCommon(FrontierStrategy):
    def __init__(self, source: str, alpha: float = 0.15, beta: float = 0.8, epsilon: float = 1e-3):
        super().__init__(source)
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.epsilon = float(epsilon)
        self.p: Dict[Any, Any] = {}
        self.r: Dict[Any, Any] = {}

    def get_context_snapshot(self) -> Dict:
        return {
            "source": self.source,
            "alpha": self.alpha,
            "beta": self.beta,
            "epsilon": self.epsilon,
            "r": self.r,
            "p": self.p,
        }

    def get_node_rank(self) -> Dict:
        return self.p


class TTRBase(_TTRCommon):
    """Reference ttr.py:39-99."""

    def __init__(self, source, alpha=0.15, beta=0.8, epsilon=1e-3, **kwargs):
        super().__init__(source, alpha, beta, epsilon)
        self.r[source] = 1.0

    def push(self, node, edges: list, **kwargs) -> None:
        if self.r.get(node) is None:
            self.r[node] = 0
        r = self.r[node]
        self.r[node] = 0
        self.p[node] = self.p.get(node, 0) + self.alpha * r

        out_edges = [e for e in edges if e["from"] == node]
        n_out = len(out_edges)
        for e in out_edges:
            inc = (1 - self.alpha) * self.beta * r / n_out if n_out > 0 else 0
            self.r[e["to"]] = self.r.get(e["to"], 0) + inc

        in_edges = [e for e in edges if e["to"] == node]
        n_in = len(in_edges)
        for e in in_edges:
            inc = (1 - self.alpha) * (1 - self.beta) * r / n_in if n_in > 0 else 0
            self.r[e["from"]] = self.r.get(e["from"], 0) + inc

    def pop(self) -> Tuple[Any, Dict]:
        node, r = None, self.epsilon
        for cand, res in self.r.items():
            if res > r:
                node, r = cand, res
        if node is None:
            return None, {}
        return node, {"residual": r}


class TTRWeight(_TTRCommon):
    """Reference ttr.py:102-161."""

    def __init__(self, source, alpha=0.15, beta=0.8, epsilon=1e-3, **kwargs):
        super().__init__(source, alpha, beta, epsilon)
        self.r[source] = 1.0

    def push(self, node, edges: list, **kwargs) -> None:
        if self.r.get(node) is None:
            self.r[node] = 0
        r = self.r[node]
        self.r[node] = 0
        self.p[node] = self.p.get(node, 0) + self.alpha * r

        out_sum, out_edges = 0.0, []
        for e in edges:
            if e["from"] == node:
                out_sum += e["value"]
                out_edges.append(e)
        for e in out_edges:
            inc = (1 - self.alpha) * self.beta * (e["value"] / out_sum) * r if out_sum > 0 else 0
            self.r[e["to"]] = self.r.get(e["to"], 0) + inc

        in_sum, in_edges = 0.0, []
        for e in edges:
            if e["to"] == node:
                in_sum += e["value"]
                in_edges.append(e)
        for e in in_edges:
            inc = (1 - self.alpha) * (1 - self.beta) * (e["value"] / in_sum) * r if in_sum > 0 else 0
            self.r[e["from"]] = self.r.get(e["from"], 0) + inc

    pop = TTRBase.pop


class TTRTime(_TTRCommon):
    """Reference ttr.py:164-331. Residual per node = {timestamp: value}."""

    def __init__(self, source, alpha=0.15, beta=0.8, epsilon=1e-3, **kwargs):
        super().__init__(source, alpha, beta, epsilon)
        self._vis = set()

    def push(self, node, edges: list, **kwargs) -> None:
        if self.r.get(node) is None:
            self.r[node] = dict()

        if node == self.source and self.source not in self._vis:
            self._vis.add(self.source)
            self.p[self.source] = self.alpha
            out_sum = sum(e["value"] if e["from"] == self.source else 0 for e in edges)
            in_sum = sum(e["value"] if e["to"] == self.source else 0 for e in edges)
            for e in edges:
                if e["from"] == self.source and out_sum != 0:
                    self.r[self.source][e["timeStamp"]] = (
                        (1 - self.alpha) * self.beta * e["value"] / out_sum
                    )
                elif e["to"] == self.source and in_sum != 0:
                    self.r[self.source][e["timeStamp"]] = (
                        (1 - self.alpha) * (1 - self.beta) * e["value"] / in_sum
                    )
            if out_sum == 0:
                self.r[self.source][0] = (1 - self.alpha) * self.beta
            if in_sum == 0:
                self.r[self.source][sys.maxsize] = (1 - self.alpha) * (1 - self.beta)
            return

        r = self.r[node]
        self.r[node] = dict()
        self._self_push(node, r)
        self._forward_push(node, edges, r)
        self._backward_push(node, edges, r)

    def _self_push(self, node, r: dict) -> None:
        self.p[node] = self.p.get(node, 0) + self.alpha * sum(r.values())

    def _forward_push(self, node, edges: list, r: dict) -> None:
        # chips may only flow along out-edges strictly later than the chip
        es_out = sorted((e for e in edges if e["from"] == node), key=lambda e: e["timeStamp"])
        chips = sorted(r.items(), key=lambda c: c[0])

        # suffix value sums: W[chip] = total out-value after the chip's time
        j = len(es_out) - 1
        sum_w, W = 0.0, {}
        for i in range(len(chips) - 1, -1, -1):
            c = chips[i]
            while j >= 0 and es_out[j]["timeStamp"] > c[0]:
                sum_w += es_out[j]["value"]
                j -= 1
            W[c] = sum_w

        # sweep forward, accumulating the density d of applicable chips
        j, d = 0, 0.0
        for e in es_out:
            while j < len(chips) and e["timeStamp"] > chips[j][0]:
                d += (chips[j][1] / W[chips[j]]) if W[chips[j]] > 0 else 0
                j += 1
            if self.r.get(e["to"]) is None:
                self.r[e["to"]] = dict()
            inc = (1 - self.alpha) * self.beta * e["value"] * d
            self.r[e["to"]][e["timeStamp"]] = self.r[e["to"]].get(e["timeStamp"], 0) + inc

        # chips with no later out-edge recycle to self
        while j < len(chips):
            t, v = chips[j]
            self.r[node][t] = self.r[node].get(t, 0) + (1 - self.alpha) * self.beta * v
            j += 1

    def _backward_push(self, node, edges: list, r: dict) -> None:
        es_in = sorted((e for e in edges if e["to"] == node), key=lambda e: e["timeStamp"])
        chips = sorted(r.items(), key=lambda c: c[0])

        # prefix value sums: W[chip] = total in-value before the chip's time
        j = 0
        sum_w, W = 0.0, {}
        for c in chips:
            while j < len(es_in) and es_in[j]["timeStamp"] < c[0]:
                sum_w += es_in[j]["value"]
                j += 1
            W[c] = sum_w

        j, d = len(chips) - 1, 0.0
        for i in range(len(es_in) - 1, -1, -1):
            e = es_in[i]
            while j >= 0 and e["timeStamp"] < chips[j][0]:
                d += (chips[j][1] / W[chips[j]]) if W[chips[j]] > 0 else 0
                j -= 1
            if self.r.get(e["from"]) is None:
                self.r[e["from"]] = dict()
            inc = (1 - self.alpha) * (1 - self.beta) * e["value"] * d
            self.r[e["from"]][e["timeStamp"]] = self.r[e["from"]].get(e["timeStamp"], 0) + inc

        while j >= 0:
            t, v = chips[j]
            self.r[node][t] = self.r[node].get(t, 0) + (1 - self.alpha) * (1 - self.beta) * v
            j -= 1

    def pop(self) -> Tuple[Any, Dict]:
        node, r = None, self.epsilon
        for cand, chips in self.r.items():
            s = sum(chips.values())
            if s > r:
                node, r = cand, s
        if node is None:
            return None, {}
        return node, {"residual": r}


class _Profit:
    """One symbol's net flow on an aggregated (per-hash) edge; value < 0
    means the expanded node paid it out (reference ttr.py:814-825)."""

    __slots__ = ("address", "value", "timestamp", "symbol")

    def __init__(self, address, value, timestamp, symbol):
        self.address = address
        self.value = value
        self.timestamp = timestamp
        self.symbol = symbol


class _AggEdge:
    """All transfers sharing one tx hash, netted per (symbol, address)
    (reference ttr.py:726-812)."""

    def __init__(self, tx_hash, profits, members):
        self.hash = tx_hash
        self.profits: List[_Profit] = profits
        self.members = members

    def merge(self, other: "_AggEdge | None") -> "_AggEdge":
        if other is None:
            return self
        self.members.extend(other.members)
        merged: Dict[Tuple[Any, Any], _Profit] = {}
        for profit in self.profits + other.profits:
            key = (profit.symbol, profit.address)
            prev = merged.get(key)
            if prev is None:
                if profit.value != 0:
                    merged[key] = profit
                continue
            total = prev.value + profit.value
            if total == 0:
                del merged[key]
                continue
            # keep the representative whose sign matches the sum
            sgn = (1 if prev.value > 0 else -1) * (1 if total > 0 else -1)
            rep = profit if sgn < 0 else prev
            rep.value = total
            merged[key] = rep
        self.profits = list(merged.values())
        return self

    def out_profits(self) -> List[_Profit]:
        return [p for p in self.profits if p.value < 0]

    def in_profits(self) -> List[_Profit]:
        return [p for p in self.profits if p.value > 0]

    def timestamp(self):
        return self.profits[0].timestamp if self.profits else 0


class TTRAggregate(_TTRCommon):
    """Reference name TTRRedirect (ttr.py:334-825): TTR with per-hash edge
    netting and cross-symbol profit redirection."""

    name = "TTRAggregate"

    def __init__(self, source, alpha=0.15, beta=0.8, epsilon=1e-3, **kwargs):
        super().__init__(source, alpha, beta, epsilon)
        self._vis = set()

    # -- push -------------------------------------------------------------
    def push(self, node, edges: list, **kwargs) -> None:
        if self.r.get(node) is None:
            self.r[node] = list()

        if node == self.source and node not in self._vis:
            self._first_push(edges)
            return

        r = self.r[node]
        r.sort(key=lambda c: c.get("timestamp", 0))
        self.r[node] = list()

        agg = self._aggregate_edges(node, edges)
        agg.sort(key=lambda e: e.timestamp())

        self._self_push(node, r)
        self._forward_push(node, agg, r)
        self._backward_push(node, agg, r)

        # merge chips keyed (symbol, timestamp) — over every node, as the
        # reference does after each push (ttr.py:422-431)
        for any_node, chips in self.r.items():
            merged: Dict[Tuple[Any, Any], dict] = {}
            for chip in chips:
                key = (chip.get("symbol"), chip.get("timestamp"))
                if key not in merged:
                    merged[key] = chip
                else:
                    merged[key]["value"] += chip.get("value", 0)
            self.r[any_node] = list(merged.values())

    def _first_push(self, edges: list) -> None:
        self._vis.add(self.source)
        in_sum: Dict[Any, float] = {}
        out_sum: Dict[Any, float] = {}
        symbols = set()
        for e in edges:
            symbols.add(e.get("symbol"))
            if e.get("to") == self.source:
                in_sum[e.get("symbol")] = in_sum.get(e.get("symbol"), 0) + e.get("value", 0)
            elif e.get("from") == self.source:
                out_sum[e.get("symbol")] = out_sum.get(e.get("symbol"), 0) + e.get("value", 0)

        self.p[self.source] = self.alpha * len(symbols)

        for e in edges:
            sym = e.get("symbol")
            if e.get("from") == self.source and out_sum.get(sym, 0) != 0:
                self.r.setdefault(e.get("to"), list())
                value = (1 - self.alpha) * self.beta * e.get("value", 0) / out_sum[sym]
                if value > 0:
                    self.r[e.get("to")].append(
                        dict(value=value, timestamp=e.get("timeStamp"), symbol=sym)
                    )
            elif e.get("to") == self.source and in_sum.get(sym, 0) != 0:
                self.r.setdefault(e.get("from"), list())
                value = (1 - self.alpha) * (1 - self.beta) * e.get("value", 0) / in_sum[sym]
                if value > 0:
                    self.r[e.get("from")].append(
                        dict(value=value, timestamp=e.get("timeStamp"), symbol=sym)
                    )

        for symbol in symbols:
            if out_sum.get(symbol, 0) == 0:
                self.r[self.source].append(
                    dict(value=(1 - self.alpha) * self.beta, timestamp=0, symbol=symbol)
                )
            elif in_sum.get(symbol, 0) == 0:
                self.r[self.source].append(
                    dict(
                        value=(1 - self.alpha) * (1 - self.beta),
                        timestamp=sys.maxsize,
                        symbol=symbol,
                    )
                )

    def _self_push(self, node, r: list) -> None:
        self.p[node] = self.p.get(node, 0) + self.alpha * sum(c.get("value", 0) for c in r)

    # -- symbol index construction (ttr.py:457-475 / 547-566) -------------
    @staticmethod
    def _symbol_indices(agg: List[_AggEdge], forward: bool):
        symbol_es_idx: Dict[Any, List[int]] = {}
        for i, e in enumerate(agg):
            for profit in e.out_profits():
                symbol_es_idx.setdefault(profit.symbol, []).append(i)
        dist_index: Dict[Any, List[int]] = {}
        for symbol, es_idx in symbol_es_idx.items():
            index = [0] * len(agg)
            if forward:
                j = 0
                for i in range(len(index)):
                    if j < len(es_idx) and es_idx[j] <= i:
                        j += 1 if j < len(es_idx) else 0
                    index[i] = j
            else:
                j = len(es_idx) - 1
                for i in range(len(index) - 1, -1, -1):
                    if j > 0 and es_idx[j] >= i:
                        j -= 1 if j > 0 else 0
                    index[i] = j
            dist_index[symbol] = index
        return symbol_es_idx, dist_index

    def _forward_push(self, node, agg: List[_AggEdge], r: list) -> None:
        if not r:
            return
        # suffix out-value per symbol after each chip (ttr.py:443-454)
        j = len(agg) - 1
        sum_w: Dict[Any, float] = {}
        W: Dict[str, float] = {}
        for i in range(len(r) - 1, -1, -1):
            c = r[i]
            while j >= 0 and agg[j].timestamp() > c.get("timestamp", 0):
                for profit in agg[j].out_profits():
                    sum_w[profit.symbol] = sum_w.get(profit.symbol, 0) + profit.value
                j -= 1
            W[str(c)] = sum_w.get(c.get("symbol"), 0)

        symbol_es_idx, dist_index = self._symbol_indices(agg, forward=True)

        j = 0
        d: Dict[Any, float] = {}
        for i in range(len(agg)):
            e = agg[i]
            outs = e.out_profits()
            if not outs:
                continue
            while j < len(r) and e.timestamp() > r[j].get("timestamp", 0):
                c = r[j]
                inc_d = (c.get("value", 0) / W[str(c)]) if W[str(c)] != 0 else 0
                d[c.get("symbol")] = d.get(c.get("symbol"), 0) + inc_d
                j += 1
            for profit in outs:
                inc = (1 - self.alpha) * self.beta * profit.value * d.get(profit.symbol, 0)
                if inc == 0:
                    continue
                targets = self._distribute(
                    direction=-1,
                    symbol=profit.symbol,
                    index=i,
                    agg=agg,
                    dist_index=dist_index,
                    symbol_es_idx=symbol_es_idx,
                    chip_value=inc,
                )
                for dp in targets:
                    self.r.setdefault(dp.address, list())
                    self.r[dp.address].append(
                        dict(value=inc / len(targets), symbol=dp.symbol, timestamp=dp.timestamp)
                    )

        # recycle unpushed chips (ttr.py:516-528)
        cs: Dict[Tuple[Any, Any], float] = {}
        while j < len(r):
            c = r[j]
            key = (c.get("symbol"), c.get("timestamp"))
            cs[key] = cs.get(key, 0) + (1 - self.alpha) * self.beta * c.get("value", 0)
            j += 1
        for (sym, ts), value in cs.items():
            self.r[node].append(dict(value=value, symbol=sym, timestamp=ts))

    def _backward_push(self, node, agg: List[_AggEdge], r: list) -> None:
        if not r:
            return
        # prefix in-value per symbol before each chip; W keyed by chip index
        # (reference quirk, ttr.py:534-545)
        j = 0
        sum_w: Dict[Any, float] = {}
        W: Dict[int, float] = {}
        for i in range(len(r)):
            c = r[i]
            while j < len(agg) and agg[j].timestamp() < c.get("timestamp", 0):
                for profit in agg[j].in_profits():
                    sum_w[profit.symbol] = sum_w.get(profit.symbol, 0) + profit.value
                j += 1
            W[i] = sum_w.get(c.get("symbol"), 0)

        # note: the backward index is ALSO built from out-profits in the
        # reference (ttr.py:547-556); preserved for parity
        symbol_es_idx, dist_index = self._symbol_indices(agg, forward=False)

        j = len(r) - 1
        d: Dict[Any, float] = {}
        for i in range(len(agg) - 1, -1, -1):
            e = agg[i]
            ins = e.in_profits()
            if not ins:
                continue
            while j >= 0 and e.timestamp() < r[j].get("timestamp", 0):
                c = r[j]
                inc_d = (c.get("value", 0) / W[j]) if W[j] != 0 else 0
                d[c.get("symbol")] = d.get(c.get("symbol"), 0) + inc_d
                j -= 1
            for profit in ins:
                inc = (1 - self.alpha) * (1 - self.beta) * profit.value * d.get(profit.symbol, 0)
                if inc == 0:
                    continue
                targets = self._distribute(
                    direction=1,
                    symbol=profit.symbol,
                    index=i,
                    agg=agg,
                    dist_index=dist_index,
                    symbol_es_idx=symbol_es_idx,
                    chip_value=inc,
                )
                for dp in targets:
                    self.r.setdefault(dp.address, list())
                    self.r[dp.address].append(
                        dict(value=inc / len(targets), symbol=dp.symbol, timestamp=dp.timestamp)
                    )

        cs: Dict[Tuple[Any, Any], float] = {}
        while j >= 0:
            c = r[j]
            key = (c.get("symbol"), c.get("timestamp"))
            cs[key] = cs.get(key, 0) + (1 - self.alpha) * (1 - self.beta) * c.get("value", 0)
            j -= 1
        for (sym, ts), value in cs.items():
            self.r[node].append(dict(value=value, symbol=sym, timestamp=ts))

    # -- redirection DFS (ttr.py:644-698) ---------------------------------
    def _distribute(
        self,
        direction: int,
        symbol,
        index: int,
        agg: List[_AggEdge],
        dist_index: Dict[Any, List[int]],
        symbol_es_idx: Dict[Any, List[int]],
        chip_value: float,
    ) -> List[_Profit]:
        rlt: List[_Profit] = []
        stack: List[Tuple[int, Any, int]] = [(direction, symbol, index)]
        vis = set()
        while stack:
            args = stack.pop()
            if args in vis:
                continue
            vis.add(args)
            direction, symbol, index = args
            cur = agg[index]
            same_dir = [p for p in cur.profits if p.value * direction > 0]
            reverse = [p for p in cur.profits if p.value * direction < 0]

            if len(stack) > 0 and chip_value / len(stack) < self.epsilon:
                return [p for p in same_dir if p.symbol == symbol]

            if len(reverse) == 1:
                profit = reverse[0]
                es_idx = symbol_es_idx.get(profit.symbol)
                d_idx = dist_index.get(profit.symbol)
                if es_idx is None or d_idx is None:
                    continue
                if direction < 0:
                    indices = es_idx[d_idx[index]:]
                else:
                    indices = es_idx[: d_idx[index]]
                for _index in indices:
                    stack.append((direction, profit.symbol, _index))
            else:
                rlt.extend(p for p in same_dir if p.symbol == symbol)
        return rlt

    # -- edge aggregation (ttr.py:700-724) --------------------------------
    @staticmethod
    def _aggregate_edges(node, edges: list) -> List[_AggEdge]:
        agg: Dict[Any, _AggEdge] = {}
        for edge in edges:
            h = edge.get("hash")
            e = _AggEdge(
                tx_hash=h,
                profits=[
                    _Profit(
                        address=edge.get("to") if edge.get("from") == node else edge.get("from"),
                        value=-edge.get("value") if edge.get("from") == node else edge.get("value"),
                        timestamp=edge.get("timeStamp"),
                        symbol=edge.get("symbol"),
                    )
                ],
                members=[edge],
            )
            e = e.merge(agg.get(h))
            agg[h] = e
            if len(e.profits) == 0:
                del agg[h]
        return list(agg.values())

    def pop(self) -> Tuple[Any, Dict]:
        node, r = None, self.epsilon
        for cand, chips in self.r.items():
            s = sum(c.get("value", 0) for c in chips)
            if s > r:
                node, r = cand, s
        if node is None:
            return None, {}
        return node, {"residual": r, "allow_all_tokens": True}

    def get_context_snapshot(self) -> Dict:
        data = super().get_context_snapshot()
        data["r"] = {
            n: sum(c.get("value", 0) for c in chips) for n, chips in self.r.items()
        }
        return data
