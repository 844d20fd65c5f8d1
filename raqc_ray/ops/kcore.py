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

    def _typed_empty():
        # an empty core must still DECLARE its (id, deg) schema — a
        # fully peeled small graph otherwise surfaces as a
        # schema-less dataset downstream (caught by the sf0.001
        # driver smoke)
        import pyarrow as pa
        import ray.data as rd

        from ._join_util import arrow_schema

        if pairs.schema() is None:
            # fully empty input: even the pair table carries no
            # schema — int64 ids are the documented fallback (graph
            # ids are integral engine-wide)
            id_type = pa.int64()
        else:
            id_type = arrow_schema(pairs).field(a_col).type
        return rd.from_arrow(pa.schema(
            [("id", id_type), ("deg", pa.int64())]).empty_table())

    edges = pairs.filter(expr=f"{a_col} != {b_col}").materialize()
    for _ in range(max_rounds):
        deg = _degrees(edges, a_col, b_col).materialize()
        n_low = deg.filter(expr=f"deg < {k}").count()
        if n_low == 0:
            # converged (an empty edge set converges trivially: its
            # degree table is empty and nothing is below k)
            return _typed_empty() if deg.count() == 0 else deg
        survivors = deg.filter(expr=f"deg >= {k}") \
                       .select_columns(["id"]).materialize()
        if survivors.count() == 0:
            # every node peeled at once — a schema-less empty right
            # side would crash the native semi-join
            return _typed_empty()
        edges = semi_join(edges, survivors, on=a_col, right_on="id")
        edges = semi_join(edges, survivors, on=b_col,
                          right_on="id").materialize()
    raise ValueError(
        f"kcore: no convergence within max_rounds={max_rounds} "
        "(deep peel chain — raise max_rounds)")
