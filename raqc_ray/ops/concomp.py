"""Distributed connected components over a pair (edge) dataset — the
duplicate-CLUSTER step that follows any pairwise near-dup operator
(minhash/simhash/phash/embedding pairs all emit edges; training-data
dedup keeps one doc per component, not one per pair).

Algorithm: alternating Large-Star / Small-Star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce
and Beyond", SoCC 2014 — public knowledge).  Each half-round is ONE
``sort`` by the center node plus a fully VECTORIZED multi-segment numpy
emit inside one ``map_batches`` call per block
(:func:`raqc_ray.ops.groupscan.scan_sorted_groups` with ``block_fn``)
— no per-node Python task, no label table, no joins; edge volume stays
O(E).  A hot center (a converging component's root sees every member
as a neighbor) spans blocks and is handled by the scan's distributed
boundary re-dispatch, never the driver.  Converges to star graphs
rooted at each component's minimum id in O(log² n) rounds (typically
≤ 5 on dup graphs); convergence is detected by two independent 64-bit
edge-multiset checksums computed as streaming Sum aggregates (no
driver-side edge collection).

Also here: :func:`hamming_pairs`, a pairs-EMITTING variant of the
near-dup machinery (checks/neardup.py emits violation rows) —
pigeonhole banding (``max_hamming+1`` bands ⇒ every true pair collides
in ≥ 1 intact band), one composite-key sorted-block scan over the
collision buckets (vectorized XOR-popcount verify per bucket, no task
per bucket), global pair distinct.  Partitioning assumption: collision
buckets fit a worker block; for adversarial hot buckets use the salted
production path in checks/neardup.py.

Coverage note: nodes whose only edges are self-loops (``a == b``) are
dropped by the ``u != v`` filter and get NO output row — callers
needing full node coverage should union singleton rows for them (the
near-dup emitters here never produce self-loops).

RAQC analog: none (SURVEY §2 has no graph ops); part of the §2
LLM-pipeline surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .groupscan import scan_sorted_groups

_EMPTY_UV = pd.DataFrame({"u": pd.Series(dtype="int64"),
                          "v": pd.Series(dtype="int64")})


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array."""
    x = np.ascontiguousarray(x, dtype=np.uint64)
    if len(x) == 0:
        return np.zeros(0, dtype=np.int64)
    bits = np.unpackbits(x.view(np.uint8)).reshape(len(x), 64)
    return bits.sum(axis=1).astype(np.int64)


def hamming_pairs(ds, id_col: str, hash_col: str, max_hamming: int):
    """Dataset ``(a, b)`` (int64, a < b) of ALL id pairs whose 64-bit
    ``hash_col`` values differ in ≤ ``max_hamming`` bits — exact by the
    pigeonhole band guarantee."""
    n_bands = max_hamming + 1
    widths = [64 // n_bands + (1 if i < 64 % n_bands else 0)
              for i in range(n_bands)]
    shifts = np.cumsum([0] + widths[:-1]).tolist()

    def explode(b: pa.Table) -> pd.DataFrame:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = b[hash_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hu = h.view(np.uint64)
        frames = []
        for bi, (sh, w) in enumerate(zip(shifts, widths)):
            bk = ((hu >> np.uint64(sh))
                  & np.uint64((1 << w) - 1)).astype(np.int64)
            frames.append(pd.DataFrame({
                "band": np.full(len(ids), bi, dtype=np.int64),
                "bkey": bk, "id": ids, "h": h}))
        return pd.concat(frames, ignore_index=True)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["id"].to_numpy()
        h = g["h"].to_numpy().view(np.uint64)
        i, j = np.triu_indices(len(ids), 1)
        d = _popcount64(h[i] ^ h[j])
        keep = d <= max_hamming
        a = np.minimum(ids[i[keep]], ids[j[keep]])
        b = np.maximum(ids[i[keep]], ids[j[keep]])
        return pd.DataFrame({"a": a, "b": b})

    from ray.data.aggregate import Count

    empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64")})
    cand = scan_sorted_groups(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["band", "bkey"], bucket_pairs, empty, min_group=2,
    )
    # a pair found in k intact bands appears k times → global distinct
    return (cand.groupby(["a", "b"])
            .aggregate(Count(alias_name="__k"))
            .drop_columns(["__k"]))


_C1 = np.int64(-7046029254386353131)   # 0x9E3779B97F4A7C15 as int64
_C2 = np.int64(-4417276706812531889)   # 0xC2B2AE3D27D4EB4F as int64


_U64 = (1 << 64) - 1


def _checksums(ed) -> tuple[int, int, int]:
    """(count, sum1, sum2) edge-multiset fingerprints via Sum aggregates.

    The per-block partials wrap at int64 (numpy) while Ray's Sum merges
    them in arbitrary-precision Python ints, so the RAW total depends on
    the block layout (how many wraps each block absorbed) — two
    identical multisets under different layouts summed differently,
    which broke convergence detection at ≥10⁷ edges (the star rounds
    re-block every round).  Reducing the final sums mod 2⁶⁴ restores
    layout invariance: each wrapped partial is congruent to its true
    partial, and congruence is preserved by the unwrapped merge."""
    from ray.data.aggregate import Count, Sum

    def hashed(df: pd.DataFrame) -> pd.DataFrame:
        u = df["u"].to_numpy(dtype=np.int64)
        v = df["v"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "h1": u * _C1 + v * _C2,
            "h2": (u ^ (v >> 1)) * _C2 + v,
        })

    agg = (ed.map_batches(hashed, batch_format="pandas")
           .aggregate(Count(alias_name="n"),
                      Sum("h1", alias_name="s1"),
                      Sum("h2", alias_name="s2")))
    s1, s2 = agg.get("s1"), agg.get("s2")
    return (agg["n"],
            int(s1) & _U64 if s1 is not None else None,
            int(s2) & _U64 if s2 is not None else None)


def _seg_ids(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Row → segment index for CONTIGUOUS segments (min_group=1)."""
    return np.repeat(np.arange(len(starts), dtype=np.int64), ends - starts)


def _dedupe_in_segment(v: np.ndarray, seg: np.ndarray):
    """(order, first_mask): within-segment sort of ``v`` plus the mask
    selecting each (segment, value)'s first occurrence — the vectorized
    equivalent of per-group ``np.unique``."""
    order = np.lexsort((v, seg))
    vs, ss = v[order], seg[order]
    first = np.ones(len(vs), dtype=bool)
    if len(vs) > 1:
        first[1:] = (ss[1:] != ss[:-1]) | (vs[1:] != vs[:-1])
    return order, first


# per-group reference emitters (boundary groups + equivalence tests)

def _large_star_group(g: pd.DataFrame) -> pd.DataFrame:
    u = int(g["u"].iloc[0])
    nb = g["v"].to_numpy(dtype=np.int64)
    m = min(u, int(nb.min()))
    out = np.unique(nb[nb > u])
    return pd.DataFrame({"u": out,
                         "v": np.full(len(out), m, dtype=np.int64)})


def _small_star_group(g: pd.DataFrame) -> pd.DataFrame:
    u = int(g["u"].iloc[0])
    nb = g["v"].to_numpy(dtype=np.int64)
    m = int(nb.min())
    out = np.unique(np.append(nb, u))
    res = pd.DataFrame({"u": out,
                        "v": np.full(len(out), m, dtype=np.int64)})
    return res[res["u"] != res["v"]]


# vectorized block emitters — one numpy pass over ALL of a block's
# segments; emission-equivalent to looping the per-group versions

def _large_star_block(interior: pd.DataFrame, starts: np.ndarray,
                      ends: np.ndarray) -> pd.DataFrame:
    u = interior["u"].to_numpy(dtype=np.int64)
    v = interior["v"].to_numpy(dtype=np.int64)
    seg = _seg_ids(starts, ends)
    u_seg = u[starts]
    m = np.minimum(u_seg, np.minimum.reduceat(v, starts))
    order, first = _dedupe_in_segment(v, seg)
    vs, ss = v[order], seg[order]
    keep = first & (vs > u_seg[ss])
    return pd.DataFrame({"u": vs[keep], "v": m[ss[keep]]})


def _small_star_block(interior: pd.DataFrame, starts: np.ndarray,
                      ends: np.ndarray) -> pd.DataFrame:
    # input is directed u > v (strict), so u is never in the neighbor
    # set and never equals m = min(neighbors)
    u = interior["u"].to_numpy(dtype=np.int64)
    v = interior["v"].to_numpy(dtype=np.int64)
    seg = _seg_ids(starts, ends)
    u_seg = u[starts]
    m = np.minimum.reduceat(v, starts)
    order, first = _dedupe_in_segment(v, seg)
    vs, ss = v[order], seg[order]
    keep = first & (vs != m[ss])
    return pd.DataFrame({
        "u": np.concatenate([vs[keep], u_seg]),
        "v": np.concatenate([m[ss[keep]], m]),
    })


def connected_components(pairs, a: str = "a", b: str = "b",
                         max_rounds: int = 50):
    """Dataset ``(node, cluster_id)`` for every node appearing in a
    non-self-loop edge of ``pairs``; ``cluster_id`` is the component's
    minimum node id.  ``pairs`` columns ``a``/``b`` must be int64.
    Self-loop-only nodes are excluded (see module docstring)."""

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        u = df[a].to_numpy(dtype=np.int64)
        v = df[b].to_numpy(dtype=np.int64)
        return pd.DataFrame({"u": np.maximum(u, v),
                             "v": np.minimum(u, v)})

    ed = pairs.map_batches(canon, batch_format="pandas")
    ed = ed.filter(expr="u != v").materialize()
    prev = None

    def symmetrize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "u": np.concatenate([df["u"].to_numpy(), df["v"].to_numpy()]),
            "v": np.concatenate([df["v"].to_numpy(), df["u"].to_numpy()]),
        })

    def direct(df: pd.DataFrame) -> pd.DataFrame:
        u = df["u"].to_numpy(dtype=np.int64)
        v = df["v"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"u": np.maximum(u, v),
                             "v": np.minimum(u, v)})

    for _ in range(max_rounds):
        ed = scan_sorted_groups(
            ed.map_batches(symmetrize, batch_format="pandas"), "u",
            _large_star_group, _EMPTY_UV, min_group=1,
            block_fn=_large_star_block,
        )
        ed = scan_sorted_groups(
            ed.map_batches(direct, batch_format="pandas"), "u",
            _small_star_group, _EMPTY_UV, min_group=1,
            block_fn=_small_star_block,
        ).materialize()
        cur = _checksums(ed)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError("connected_components: no convergence in "
                           f"{max_rounds} rounds")

    # converged: edges are (node, root); add root→root rows
    def assign(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["u"].to_numpy(dtype=np.int64),
                             "cluster_id": df["v"].to_numpy(dtype=np.int64)})

    from ray.data.aggregate import Count

    nodes = ed.map_batches(assign, batch_format="pandas")
    roots = (ed.map_batches(
        lambda df: pd.DataFrame({"node": df["v"].to_numpy(dtype=np.int64)}),
        batch_format="pandas")
        .groupby("node").aggregate(Count(alias_name="__c"))
        .drop_columns(["__c"])
        .map_batches(lambda df: df.assign(
            cluster_id=df["node"].to_numpy(dtype=np.int64)),
            batch_format="pandas"))
    return nodes.union(roots)


def degree_histogram(pairs):
    """Degree distribution of an undirected edge list ``(a, b)``:
    one row per distinct degree — ``(degree, n_nodes)``.

    Plan: per-block endpoint-count partials (both columns bincounted
    in one pandas pass) → hash ``groupby(node).Sum`` → the same
    combiner shape again over degrees.  Two narrow exchanges, each
    carrying at most distinct-nodes (then distinct-degrees) × blocks
    rows; no edge list ever re-shuffles whole."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def endpoint_counts(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.concatenate([df["a"].to_numpy(dtype=np.int64),
                              df["b"].to_numpy(dtype=np.int64)])
        d = pd.DataFrame({"node": ids,
                          "deg": np.ones(len(ids), dtype=np.int64)})
        return d.groupby("node", sort=False, as_index=False).sum()

    deg = (pairs.map_batches(endpoint_counts, batch_format="pandas")
           .groupby("node").aggregate(Sum("deg", alias_name="degree")))

    def deg_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"degree": df["degree"].to_numpy(dtype=np.int64),
                          "n_nodes": np.ones(len(df), dtype=np.int64)})
        return d.groupby("degree", sort=False, as_index=False).sum()

    return (deg.map_batches(deg_counts, batch_format="pandas")
            .groupby("degree").aggregate(Sum("n_nodes",
                                             alias_name="n_nodes")))
