"""Distributed k-core decomposition — the standard graph-hygiene
reduction (Seidman 1983; Matula & Beck 1983): repeatedly and
SIMULTANEOUSLY delete every node with fewer than k neighbors until
none remains; the surviving induced subgraph (the k-core) is UNIQUE
regardless of peel order, which makes the op deterministic across
block layouts with no ordering discipline at all.

On a near-dup or co-engagement graph the k-core is the
template/boilerplate detector: organic near-dup pairs form shallow
trees and dissolve after one or two peels, while machine-generated
template families form dense cores that survive any k.

Plan per round (no driver-side node materialization, no per-node
tasks — the lesson of ops/concomp):

1. endpoint degrees: per-block partial counts + ONE hash groupby
   (``(blocks x nodes)``-partial rows, node-scale exchange);
2. survivors = ``deg >= k`` keys; dropped count via a dataset
   ``count()`` (aggregate-sized, drives convergence);
3. edge set semi-joins against survivors on EACH endpoint (two hash
   joins, the `ops/join` shuffle plan) and materializes — iterative
   algorithms must pin each round or the lineage re-executes
   O(rounds^2).

Rounds are bounded by the peel depth (degeneracy ordering length /
k); adversarial path graphs peel O(n/k) rounds — ``max_rounds``
raises explicitly rather than silently truncating (the
``cooc.max_distinct`` contract).  Early stop at a converged round is
a no-op peel, so running engine and a fixed-depth chained-CTE oracle
to DIFFERENT depths >= the convergence depth yields identical
results — the q144 integer-PageRank oracle discipline.

RAQC analog: none (SURVEY §2 has no graph ops); §2 LLM-pipeline
surface alongside ops/graph / ops/concomp.
"""

from __future__ import annotations

__all__ = ["kcore"]


def kcore(pairs, a_col: str = "a", b_col: str = "b", k: int = 2,
          max_rounds: int = 32):
    """Dataset ``(id, deg)`` — every node of the k-core of the
    undirected graph given as distinct pairs (self-loops ignored),
    with its degree INSIDE the core.  Nodes outside the core (or
    isolated) get no row."""
    if k < 1:
        raise ValueError("kcore: need k >= 1")
    from .graph import _degrees
    from .join import semi_join

    edges = pairs.filter(expr=f"{a_col} != {b_col}").materialize()
    for _ in range(max_rounds):
        deg = _degrees(edges, a_col, b_col).materialize()
        n_low = deg.filter(expr=f"deg < {k}").count()
        if n_low == 0:
            # converged (an empty edge set converges trivially: its
            # degree table is empty and nothing is below k)
            return deg
        survivors = deg.filter(expr=f"deg >= {k}") \
                       .select_columns(["id"])
        edges = semi_join(edges, survivors, on=a_col, right_on="id")
        edges = semi_join(edges, survivors, on=b_col,
                          right_on="id").materialize()
    raise ValueError(
        f"kcore: no convergence within max_rounds={max_rounds} "
        "(deep peel chain — raise max_rounds)")
