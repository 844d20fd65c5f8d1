"""Distributed triangle counting and integer PageRank over a pair
(edge) dataset — the graph-analytics complement to the components /
degree-histogram family in :mod:`raqc_ray.ops.concomp` (near-dup and
co-engagement graphs are the two graphs a training-data pipeline
actually builds; triangle density and rank centrality are their
standard hygiene signals: community tightness of dup clusters,
influence concentration of co-active users).

Triangle counting — degree-ordered wedge join (Suri & Vassilvitskii,
"Counting Triangles and the Curse of the Last Reducer", WWW 2011 —
public knowledge):

1. endpoint degrees via per-block partial counts + ONE hash groupby;
2. each undirected edge is ORIENTED from its (degree, id)-smaller to
   its (degree, id)-larger endpoint (two hash joins attach degrees) —
   this caps every out-neighborhood at O(sqrt(E)), so the wedge
   fan-out is O(E^1.5) total instead of sum-of-C(degree, 2) on hot
   nodes;
3. wedges are emitted per apex by ONE sorted-block scan
   (:func:`raqc_ray.ops.groupscan.scan_sorted_groups` — vectorized
   multi-segment emit, no per-node task); each triangle yields
   exactly ONE wedge (its orientation-minimum vertex is the apex);
4. a distributed hash join of the wedge set against the oriented edge
   set counts the closing edges — per-block partial counts, one tiny
   final sum.

Integer PageRank — fixed-iteration power method with INTEGER
arithmetic so the result is bit-identical across block layouts and
matches a plain (non-recursive) SQL oracle token-for-token:

    base       = (15 * scale) // (100 * n)
    contrib(u) = (85 * r_t(u)) // (100 * outdeg(u))      per out-edge
    r_{t+1}(v) = base + sum over in-neighbors contrib(u)

Every quantity is int64 (mass only shrinks under floor division, so
r <= scale + n*base bounds all terms well inside int64).  Two regimes
per iteration, size-triggered like ops/rankcorr:

- broadcast regime (rank table fits a worker): ranks go to the object
  store ONCE per iteration (``ray.put``); the edge stream maps to
  per-block per-target partial sums — the only exchange is the
  node-scale partial groupby;
- join regime: one distributed hash join (edges x ranks on src) per
  iteration + the same partial groupby — the canonical plan when the
  node table itself is too big to broadcast.

RAQC analog: none (SURVEY §2 has no graph ops); part of the §2
LLM-pipeline surface alongside ops/concomp.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _degrees(pairs, a_col: str, b_col: str):
    """(id, deg) endpoint-count table from distinct undirected pairs:
    per-block partial counts, one hash groupby."""
    from ray.data.aggregate import Sum

    def block(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.concatenate([df[a_col].to_numpy(dtype=np.int64),
                              df[b_col].to_numpy(dtype=np.int64)])
        u, c = np.unique(ids, return_counts=True)
        return pd.DataFrame({"id": u, "deg": c.astype(np.int64)})

    return (pairs.map_batches(block, batch_format="pandas")
            .groupby("id").aggregate(Sum("deg", alias_name="deg")))


def _oriented_edges(pairs, a_col: str, b_col: str,
                    num_partitions: int | None = None):
    """(oriented, deg): each undirected edge oriented from its
    (degree, id)-smaller to -larger endpoint — the Suri-Vassilvitskii
    orientation that caps out-neighborhoods at O(sqrt(E)).  Returns
    the materialized oriented edge Dataset (src, dst, ddeg) and the
    materialized (id, deg) table."""
    from .join import hash_join

    deg = _degrees(pairs, a_col, b_col).materialize()
    # distinct right-side names per join — the native join keeps the
    # right key column, so reusing "id"/"deg" twice would collide;
    # rename via map_batches: Dataset.rename_columns assumes Arrow
    # blocks, but groupby-aggregate emits pandas blocks
    def _rn(ia, da):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return df.rename(columns={"id": ia, "deg": da})

        return fn

    deg_a = deg.map_batches(_rn("__ia", "__da"), batch_format="pandas")
    deg_b = deg.map_batches(_rn("__ib", "__db"), batch_format="pandas")
    e = hash_join(pairs, deg_a, on=a_col, right_on="__ia",
                  num_partitions=num_partitions)
    e = hash_join(e, deg_b, on=b_col, right_on="__ib",
                  num_partitions=num_partitions)

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        a = df[a_col].to_numpy(dtype=np.int64)
        b = df[b_col].to_numpy(dtype=np.int64)
        da = df["__da"].to_numpy(dtype=np.int64)
        db = df["__db"].to_numpy(dtype=np.int64)
        a_first = (da < db) | ((da == db) & (a < b))
        return pd.DataFrame({
            "src": np.where(a_first, a, b),
            "dst": np.where(a_first, b, a),
            # the dst's (deg, id) key orders out-neighborhoods so the
            # wedge (x, y) is emitted with x before y in orientation
            # order — the closing edge, if any, is then exactly x->y
            "ddeg": np.where(a_first, db, da),
        })

    oriented = e.map_batches(orient, batch_format="pandas").materialize()
    return oriented, deg


def triangle_count(pairs, a_col: str = "a", b_col: str = "b",
                   num_partitions: int | None = None):
    """Total number of triangles in the undirected graph given as a
    DISTINCT pair dataset (``a_col < b_col`` per row — the contract of
    every pair emitter in this package).  Returns a one-row Dataset
    ``(n_wedges, n_triangles)`` (both int64; the wedge count is the
    checked-candidate volume — the op's cost certificate)."""
    from ray.data.aggregate import Sum

    from .groupscan import scan_sorted_groups
    from .join import hash_join

    # pin the (possibly expensive) upstream: degrees and the oriented
    # join are two consumers of the same lineage
    pairs = pairs.materialize()
    if pairs.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "n_wedges": pa.array([0], pa.int64()),
            "n_triangles": pa.array([0], pa.int64()),
        }))
    oriented, deg = _oriented_edges(pairs, a_col, b_col,
                                    num_partitions)

    def wedges_group(g: pd.DataFrame) -> pd.DataFrame:
        o = np.lexsort((g["dst"].to_numpy(dtype=np.int64),
                        g["ddeg"].to_numpy(dtype=np.int64)))
        vs = g["dst"].to_numpy(dtype=np.int64)[o]
        i, j = np.triu_indices(len(vs), 1)
        return pd.DataFrame({"wx": vs[i], "wy": vs[j]})

    def wedges_block(df: pd.DataFrame, starts: np.ndarray,
                     ends: np.ndarray) -> pd.DataFrame:
        # numpy emit per SEGMENT inside one block call (the accepted
        # sorted-block pattern — no per-apex Ray task anywhere)
        xs, ys = [], []
        dst = df["dst"].to_numpy(dtype=np.int64)
        ddeg = df["ddeg"].to_numpy(dtype=np.int64)
        for s, e_ in zip(starts.tolist(), ends.tolist()):
            o = np.lexsort((dst[s:e_], ddeg[s:e_]))
            vs = dst[s:e_][o]
            i, j = np.triu_indices(len(vs), 1)
            xs.append(vs[i])
            ys.append(vs[j])
        if not xs:
            return pd.DataFrame({"wx": pd.Series(dtype="int64"),
                                 "wy": pd.Series(dtype="int64")})
        return pd.DataFrame({"wx": np.concatenate(xs),
                             "wy": np.concatenate(ys)})

    empty = pd.DataFrame({"wx": pd.Series(dtype="int64"),
                          "wy": pd.Series(dtype="int64")})
    w = scan_sorted_groups(oriented.select_columns(["src", "dst", "ddeg"]),
                           "src", wedges_group, empty, min_group=2,
                           block_fn=wedges_block).materialize()
    n_wedges = w.count()
    if n_wedges == 0:
        n_tri = 0  # no wedges -> no triangles (and the native join
        # rejects schema-less empty partitions)
    else:
        closed = hash_join(w, oriented.select_columns(["src", "dst"]),
                           on=("wx", "wy"), right_on=("src", "dst"),
                           num_partitions=num_partitions)
        n_tri = closed.count()
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "n_wedges": pa.array([int(n_wedges)], pa.int64()),
        "n_triangles": pa.array([int(n_tri)], pa.int64()),
    }))


def triangle_counts_per_node(pairs, a_col: str = "a", b_col: str = "b",
                             num_partitions: int | None = None):
    """Per-node triangle participation — ``(id, n_tri, deg)`` for
    every node in >= 1 triangle — the input of the local clustering
    coefficient ``2*n_tri / (deg*(deg-1))`` (Watts-Strogatz 1998).

    Same degree-ordered wedge plan as :func:`triangle_count`
    (shared :func:`_oriented_edges` front half), but wedges CARRY
    their apex, so each closed triangle credits its three vertices:
    one vectorized 3-way explode per block + per-block partial counts
    + ONE node-scale groupby, then a hash join attaches degrees.
    Exact ints throughout."""
    from ray.data.aggregate import Sum

    from .groupscan import scan_sorted_groups
    from .join import hash_join

    import ray.data as rd

    empty_out = pa.table({"id": pa.array([], pa.int64()),
                          "n_tri": pa.array([], pa.int64()),
                          "deg": pa.array([], pa.int64())})
    pairs = pairs.materialize()
    if pairs.count() == 0:
        return rd.from_arrow(empty_out)
    oriented, deg = _oriented_edges(pairs, a_col, b_col,
                                    num_partitions)

    def wedges_group(g: pd.DataFrame) -> pd.DataFrame:
        o = np.lexsort((g["dst"].to_numpy(dtype=np.int64),
                        g["ddeg"].to_numpy(dtype=np.int64)))
        vs = g["dst"].to_numpy(dtype=np.int64)[o]
        i, j = np.triu_indices(len(vs), 1)
        return pd.DataFrame({
            "apex": np.full(len(i), int(g["src"].iloc[0]),
                            dtype=np.int64),
            "wx": vs[i], "wy": vs[j]})

    def wedges_block(df: pd.DataFrame, starts: np.ndarray,
                     ends: np.ndarray) -> pd.DataFrame:
        xs, ys, aps = [], [], []
        dst = df["dst"].to_numpy(dtype=np.int64)
        ddeg = df["ddeg"].to_numpy(dtype=np.int64)
        src = df["src"].to_numpy(dtype=np.int64)
        for s, e_ in zip(starts.tolist(), ends.tolist()):
            o = np.lexsort((dst[s:e_], ddeg[s:e_]))
            vs = dst[s:e_][o]
            i, j = np.triu_indices(len(vs), 1)
            xs.append(vs[i])
            ys.append(vs[j])
            aps.append(np.full(len(i), src[s], dtype=np.int64))
        if not xs:
            return pd.DataFrame({"apex": pd.Series(dtype="int64"),
                                 "wx": pd.Series(dtype="int64"),
                                 "wy": pd.Series(dtype="int64")})
        return pd.DataFrame({"apex": np.concatenate(aps),
                             "wx": np.concatenate(xs),
                             "wy": np.concatenate(ys)})

    empty = pd.DataFrame({"apex": pd.Series(dtype="int64"),
                          "wx": pd.Series(dtype="int64"),
                          "wy": pd.Series(dtype="int64")})
    w = scan_sorted_groups(oriented.select_columns(["src", "dst",
                                                    "ddeg"]),
                           "src", wedges_group, empty, min_group=2,
                           block_fn=wedges_block).materialize()
    if w.count() == 0:
        return rd.from_arrow(empty_out)
    closed = hash_join(w, oriented.select_columns(["src", "dst"]),
                       on=("wx", "wy"), right_on=("src", "dst"),
                       num_partitions=num_partitions)

    def credit(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.concatenate([df["apex"].to_numpy(dtype=np.int64),
                              df["wx"].to_numpy(dtype=np.int64),
                              df["wy"].to_numpy(dtype=np.int64)])
        u, c = np.unique(ids, return_counts=True)
        return pd.DataFrame({"id": u, "n_tri": c.astype(np.int64)})

    per = (closed.map_batches(credit, batch_format="pandas")
           .groupby("id").aggregate(Sum("n_tri", alias_name="n_tri")))

    def _rn_deg(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"id": "__id"})

    joined = hash_join(per,
                       deg.map_batches(_rn_deg, batch_format="pandas"),
                       on="id", right_on="__id",
                       num_partitions=num_partitions)
    return joined.select_columns(["id", "n_tri", "deg"])


def pagerank(pairs, a_col: str = "a", b_col: str = "b",
             iterations: int = 3, scale: int = 10 ** 9,
             broadcast_limit: int = 2_000_000,
             num_partitions: int | None = None):
    """Integer PageRank (damping 85/100) over the SYMMETRIZED graph of
    a distinct undirected pair dataset.  Returns ``(id, pr)`` — one
    int64 row per node, bit-identical across block layouts and equal
    to the plain-SQL oracle's chained-CTE evaluation."""
    from ray.data.aggregate import Sum

    from .join import broadcast_join, hash_join

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        a = df[a_col].to_numpy(dtype=np.int64)
        b = df[b_col].to_numpy(dtype=np.int64)
        return pd.DataFrame({"s": np.concatenate([a, b]),
                             "t": np.concatenate([b, a])})

    # pin the upstream: the symmetrized stream and the degree table
    # are two consumers of the same lineage
    pairs = pairs.materialize()
    se = pairs.map_batches(sym, batch_format="pandas").materialize()
    od = _degrees(pairs, a_col, b_col).materialize()
    n = od.count()
    if n == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"id": pa.array([], pa.int64()),
                                       "pr": pa.array([], pa.int64())}))
    base = (15 * scale) // (100 * n)
    r0 = scale // n

    def contrib_partials(rank_lookup):
        """Per-block (t, c) partial sums of (85*r)//(100*od) for a
        broadcast {id: (r, od)} mapping shipped via ray.put."""
        import ray

        def fn(df: pd.DataFrame) -> pd.DataFrame:
            look = ray.get(rank_lookup)
            s = df["s"].to_numpy(dtype=np.int64)
            t = df["t"].to_numpy(dtype=np.int64)
            idx = np.searchsorted(look["id"], s)
            r = look["r"][idx]
            o = look["od"][idx]
            c = (85 * r) // (100 * o)
            d = pd.DataFrame({"t": t, "c": c})
            return d.groupby("t", sort=False, as_index=False).sum()

        return fn

    if n <= broadcast_limit:
        import ray

        ranks = od.to_pandas().sort_values("id").reset_index(drop=True)
        ids = ranks["id"].to_numpy(dtype=np.int64)
        ods = ranks["deg"].to_numpy(dtype=np.int64)
        r = np.full(n, r0, dtype=np.int64)
        for _ in range(iterations):
            ref = ray.put({"id": ids, "r": r, "od": ods})
            agg = (se.map_batches(contrib_partials(ref),
                                  batch_format="pandas")
                   .groupby("t").aggregate(Sum("c", alias_name="c"))
                   .to_pandas())
            nxt = np.full(n, base, dtype=np.int64)
            idx = np.searchsorted(ids, agg["t"].to_numpy(dtype=np.int64))
            nxt[idx] += agg["c"].to_numpy(dtype=np.int64)
            r = nxt
        import ray.data as rd

        return rd.from_arrow(pa.table({"id": pa.array(ids, pa.int64()),
                                       "pr": pa.array(r, pa.int64())}))

    # join regime: the rank table itself is distributed; one hash join
    # (edges x ranks on src) + one node-scale partial groupby per round
    def init_ranks(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"id": df["id"].to_numpy(dtype=np.int64),
                             "od": df["deg"].to_numpy(dtype=np.int64),
                             "r": np.full(len(df), r0, dtype=np.int64)})

    ranks = od.map_batches(init_ranks,
                           batch_format="pandas").materialize()
    for _ in range(iterations):
        j = hash_join(se, ranks, on="s", right_on="id",
                      num_partitions=num_partitions)

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            c = ((85 * df["r"].to_numpy(dtype=np.int64))
                 // (100 * df["od"].to_numpy(dtype=np.int64)))
            d = pd.DataFrame({"t": df["t"].to_numpy(dtype=np.int64),
                              "c": c})
            return d.groupby("t", sort=False, as_index=False).sum()

        agg = (j.map_batches(contrib, batch_format="pandas")
               .groupby("t").aggregate(Sum("c", alias_name="c")))
        nxt = hash_join(ranks.select_columns(["id", "od"]), agg,
                        on="id", right_on="t", how="left_outer",
                        num_partitions=num_partitions)

        def finish(df: pd.DataFrame) -> pd.DataFrame:
            c = df["c"].to_numpy()
            c = np.where(pd.isna(c), 0, c).astype(np.int64)
            return pd.DataFrame({
                "id": df["id"].to_numpy(dtype=np.int64),
                "od": df["od"].to_numpy(dtype=np.int64),
                "r": base + c})

        ranks = nxt.map_batches(finish,
                                batch_format="pandas").materialize()

    def out(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"id": df["id"].to_numpy(dtype=np.int64),
                             "pr": df["r"].to_numpy(dtype=np.int64)})

    return ranks.map_batches(out, batch_format="pandas")


def bfs_distances(pairs, seeds, a_col: str = "a", b_col: str = "b",
                  max_hops: int = 3, num_partitions: int | None = None):
    """Multi-source BFS hop distance over the symmetrized graph of a
    distinct undirected pair dataset: one ``(id, dist)`` int64 row per
    node reachable from ``seeds`` within ``max_hops`` (seeds that are
    graph nodes get dist 0; seeds absent from the graph are dropped —
    distance is a property of graph nodes).

    The frontier expansion is the textbook relational plan, fully
    distributed and layout-invariant (distances are min-int, order
    free): per round, ONE hash join (frontier x edges on src), ONE
    distinct groupby on the targets, ONE anti-join against the settled
    set — each round's exchange is frontier-neighborhood-sized, never
    graph-sized, and ``max_hops`` bounds the rounds (hygiene audits ask
    "within k hops of a bad node", not full closure — for full
    components use :func:`raqc_ray.ops.concomp.connected_components`).

    ``seeds``: a Dataset with an ``id`` column (distinct not required).
    RAQC analog: none; §2 graph surface with ops/graph.pagerank.
    """
    from ray.data.aggregate import Count

    from .join import anti_join, hash_join, semi_join

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        a = df[a_col].to_numpy(dtype=np.int64)
        b = df[b_col].to_numpy(dtype=np.int64)
        return pd.DataFrame({"s": np.concatenate([a, b]),
                             "t": np.concatenate([b, a])})

    pairs = pairs.materialize()
    import ray.data as rd

    empty = pd.DataFrame({"id": pd.Series(dtype="int64"),
                          "dist": pd.Series(dtype="int64")})
    if pairs.count() == 0:
        return rd.from_pandas(empty)
    se = pairs.map_batches(sym, batch_format="pandas").materialize()
    nodes = (se.groupby("s").aggregate(Count(alias_name="__c"))
             .drop_columns(["__c"]))

    def as_level(dist):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            col = df.columns[0]
            return pd.DataFrame({
                "id": df[col].to_numpy(dtype=np.int64),
                "dist": np.full(len(df), dist, dtype=np.int64)})

        return fn

    # level 0: distinct seed ids that are graph nodes
    seed_ids = (seeds.groupby("id").aggregate(Count(alias_name="__c"))
                .drop_columns(["__c"]))
    frontier = (semi_join(seed_ids, nodes, on="id", right_on="s")
                .map_batches(as_level(0), batch_format="pandas")
                .materialize())
    if frontier.count() == 0:
        return rd.from_pandas(empty)
    levels = [frontier]
    settled = frontier
    for hop in range(1, max_hops + 1):
        nbr = hash_join(frontier.select_columns(["id"]), se,
                        on="id", right_on="s",
                        num_partitions=num_partitions)
        cand = (nbr.groupby("t").aggregate(Count(alias_name="__c"))
                .drop_columns(["__c"]))
        fresh = anti_join(cand, settled, on="t", right_on="id",
                          num_partitions=num_partitions)
        frontier = (fresh.map_batches(as_level(hop),
                                      batch_format="pandas")
                    .materialize())
        if frontier.count() == 0:
            break
        levels.append(frontier)
        settled = settled.union(frontier).materialize()
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def degree_assortativity(pairs, a_col: str = "a", b_col: str = "b",
                         round_to: int = 9,
                         num_partitions: int | None = None):
    """Degree assortativity coefficient (Newman 2002) of the
    undirected graph given as a DISTINCT pair dataset (``a_col <
    b_col`` — the package's pair-emitter contract): the Pearson
    correlation of endpoint degrees over DIRECTED edges, from EXACT
    integer moments.

    Both directions of each edge contribute, so the x- and y-moments
    coincide and the statistic reduces to a single-fraction epilogue::

        r = (M*Sxy - Sx^2) / (M*Sxx - Sx^2)
        M = 2|E|   Sx = sum(da+db)   Sxy = sum(2*da*db)
        Sxx = sum(da^2 + db^2)            (all exact int64 sums)

    Plan (the `triangle_count` front half): endpoint degrees via
    per-block partials + ONE hash groupby; two distributed hash joins
    attach (da, db) to every edge; one global Sum over per-block int64
    moment partials (Ray accumulates int64 in Python ints — exact);
    the final division is one IEEE-correctly-rounded float op on the
    exact integers, so a HUGEINT SQL oracle agrees bit-for-bit.

    Overflow bound: Σ da² must fit int64 — holds while
    E * max_deg² < 2^63 (raise scale concerns upstream; the oracle
    uses HUGEINT).  Returns a one-row Dataset ``(n_edges,
    assortativity)``; the coefficient is NULL for degree-regular
    graphs (zero variance).
    """
    from ray.data.aggregate import Sum

    from .join import hash_join

    pairs = pairs.materialize()
    n_edges = pairs.count()
    import ray.data as rd

    if n_edges == 0:
        return rd.from_arrow(pa.table({
            "n_edges": pa.array([0], pa.int64()),
            "assortativity": pa.array([None], pa.float64()),
        }))
    deg = _degrees(pairs, a_col, b_col).materialize()

    def _rn(ia, da):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return df.rename(columns={"id": ia, "deg": da})

        return fn

    deg_a = deg.map_batches(_rn("__ia", "__da"), batch_format="pandas")
    deg_b = deg.map_batches(_rn("__ib", "__db"), batch_format="pandas")
    e = hash_join(pairs, deg_a, on=a_col, right_on="__ia",
                  num_partitions=num_partitions)
    e = hash_join(e, deg_b, on=b_col, right_on="__ib",
                  num_partitions=num_partitions)

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        da = df["__da"].to_numpy(dtype=np.int64)
        db = df["__db"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "__m": np.array([2 * len(df)], dtype=np.int64),
            "__sx": np.array([int((da + db).sum())], dtype=np.int64),
            "__sxy": np.array([int(2 * (da * db).sum())],
                              dtype=np.int64),
            "__sxx": np.array([int((da * da + db * db).sum())],
                              dtype=np.int64),
        })

    agg = e.map_batches(moments, batch_format="pandas").aggregate(
        *[Sum(c, alias_name=c) for c in ("__m", "__sx", "__sxy",
                                         "__sxx")])
    m, sx = int(agg["__m"]), int(agg["__sx"])
    sxy, sxx = int(agg["__sxy"]), int(agg["__sxx"])
    den = m * sxx - sx * sx                      # exact Python ints
    r = (float(m * sxy - sx * sx) / float(den)) if den else None
    return rd.from_arrow(pa.table({
        "n_edges": pa.array([int(n_edges)], pa.int64()),
        "assortativity": pa.array(
            [None if r is None else float(np.round(r, round_to))],
            pa.float64()),
    }))
