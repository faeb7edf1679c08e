"""Driver-independent reference implementations (numpy / pure python) used
as test oracles — mirror the reference semantics exactly."""

from __future__ import annotations

from itertools import combinations

import numpy as np


def pagerank_oracle(
    edges: list[tuple[int, int]], damping: float = 0.85, iters: int = 30
) -> dict[int, float]:
    """Blocks PageRank (PageRankIteration.java:254-264): init 1.0, sink
    mass redistributed uniformly, mass conserved at N."""
    ids = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    out = np.zeros(n)
    for s, _ in edges:
        out[idx[s]] += 1
    r = np.ones(n)
    d = damping
    for _ in range(iters):
        all_sum = r.sum()
        sink_sum = r[out == 0].sum()
        msgs = np.zeros(n)
        for s, t in edges:
            msgs[idx[t]] += r[idx[s]] / out[idx[s]]
        r = d * (msgs + sink_sum / n) + (1 - d) * all_sum / n
    return {v: r[idx[v]] for v in ids}


def wcc_oracle(edges: list[tuple[int, int]], extra_ids: list[int] | None = None) -> dict[int, int]:
    """Union-find; component id = min vertex id (undirected closure)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for v in extra_ids or []:
        find(v)
    return {v: find(v) for v in parent}


def triangles_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Per-vertex triangle counts on the undirected simple graph."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {v: 0 for v in adj}
    for v in adj:
        for a, b in combinations(sorted(adj[v]), 2):
            if b in adj.get(a, ()):  # noqa: SIM118
                counts[v] += 1
    return counts


def lpa_oracle(
    edges: list[tuple[int, int]], iters: int
) -> dict[int, int]:
    """Synchronous mode-label propagation, tie-break to smaller label,
    undirected (symmetrized) neighbors; isolated update keeps label."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {v: v for v in adj}
    for _ in range(iters):
        new = {}
        for v in adj:
            freq: dict[int, int] = {}
            for u in adj[v]:
                freq[labels[u]] = freq.get(labels[u], 0) + 1
            best = max(freq.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if new == labels:
            return new
        labels = new
    return labels


def sssp_oracle(
    edges: list[tuple[int, int, float]], source: int
) -> dict[int, float]:
    """Bellman-Ford on the directed weighted graph."""
    ids = {v for s, t, _ in edges for v in (s, t)}
    dist = {v: float("inf") for v in ids}
    dist[source] = 0.0
    for _ in range(len(ids)):
        changed = False
        for s, t, w in edges:
            if dist[s] + w < dist[t]:
                dist[t] = dist[s] + w
                changed = True
        if not changed:
            break
    return dist
