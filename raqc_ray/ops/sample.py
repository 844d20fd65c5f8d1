"""Deterministic hash-based sampling and dataset splitting.

A 100-TB training-data pipeline needs samples and train/val/test
splits that are (a) shuffle-free — a pure per-row predicate, no
all-to-all, no coordination; (b) REPRODUCIBLE — the same row lands in
the same split on every run, any cluster size, any block layout; and
(c) consistent across tables — any table sharing the key column splits
identically, so features computed elsewhere stay aligned. Random
sampling (``ds.random_sample``) has none of these properties.

The hash is TWO Lehmer / Park–Miller LCG steps ``h(k) = ((k * 48271
mod M) * 48271) mod M`` with ``M = 2^31 - 1`` (Park & Miller, CACM
1988) — a single step is MONOTONE for keys below ``M/48271 ≈ 44k``
(no wraparound), which would turn a rate threshold into a key-range
cut on small/clustered ids; the composed step's effective multiplier
``48271² mod M ≈ 1.8e8`` wraps every ~12 consecutive keys. Both steps
are expressible verbatim in ANSI SQL, which gives the operator a full
DuckDB oracle (q39/q40). int64 arithmetic holds without overflow for
keys up to ~1.9e14, covering the 10^12-row target with ~190×
headroom; beyond that swap in a 128-bit modmul. ``salt`` decorrelates
independent samples over the same key.

Both operators are single ``map_batches`` predicates over zero-copy
Arrow — they compose with any upstream read and prune rows before
anything expensive runs.

RAQC analog: none (SURVEY §2.6 — the reference has no sampling); part
of the §2 "large-scale training-data pipeline" surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_M = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
_A = 48_271


def _lehmer(keys: np.ndarray, salt: int) -> np.ndarray:
    h = ((keys + np.int64(salt)) * np.int64(_A)) % np.int64(_M)
    return (h * np.int64(_A)) % np.int64(_M)


def hash_sample(ds, key_col: str, rate: float, salt: int = 0):
    """Keep rows whose hashed key falls under ``rate`` (0..1).

    Sampling is BY KEY: every row of a given key is kept or dropped
    together (duplicate keys travel as a unit — the right contract for
    sampling documents/images with repeated ids)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    thresh = np.int64(int(rate * _M))

    def keep(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.filter(pa.array(_lehmer(keys, salt) < thresh))

    return ds.map_batches(keep, batch_format="pyarrow")


def hash_split(ds, key_col: str, splits: dict[str, float], salt: int = 0,
               split_col: str = "split"):
    """Append a deterministic split label per row.

    ``splits`` maps label → fraction (must sum to ≤ 1; any remainder
    labels ``"rest"``). Labels are assigned by hash ranges in the
    given dict order, so ``{"train": .8, "val": .1, "test": .1}`` is
    stable forever — adding data never moves an old row between
    splits."""
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    labels = list(splits) + ["rest"]
    # cumulative upper bound per label, in units of the hash modulus
    bounds = np.cumsum([int(f * _M) for f in splits.values()] + [_M])

    def tag(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(bounds, _lehmer(keys, salt), side="right")
        return b.append_column(
            split_col, pa.array(np.array(labels, dtype=object)[idx])
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def stratified_sample(ds, group_col: str, key_col: str, n_per_group: int,
                      salt: int = 0, hash_col: str = "h",
                      rank_col: str = "rank"):
    """Exactly ``n_per_group`` rows per group (fewer if the group is
    smaller), chosen as the n smallest Lehmer-hashed keys — the
    deterministic stratified sample a training-data pipeline uses for
    per-source eval sets: reproducible across runs, cluster sizes and
    block layouts, and expressible verbatim in SQL (full oracle).

    Plan: one ``map_batches`` appends the hash, then the grouped top-k
    combiner (:func:`raqc_ray.ops.topk.grouped_topk`, ascending) prunes
    each block to ≤ n rows per group before the single sort — the
    selection never shuffles more than n × groups × blocks rows.
    Returns one Dataset."""
    from .topk import grouped_topk

    def add_hash(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(hash_col,
                               pa.array(_lehmer(keys, salt), pa.int64()))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    return grouped_topk(hashed, key=group_col, order_by=hash_col,
                        k=n_per_group, ascending=True, tiebreak=key_col,
                        rank_col=rank_col)


def upsample_by_key(ds, key_col: str, factors: dict, copy_col: str = "copy_idx"):
    """Deterministic per-key upsampling for data-mixture rebalancing:
    each row is emitted ``factors.get(key, 1)`` times with ``copy_col``
    = 0..k-1 (the repetition index a downstream shuffle or curriculum
    stage keys on).  The language-rebalancing step of an LLM data
    recipe (e.g. low-resource-language ×k repetition) expressed as a
    pure per-block fan-out: the factor table is tiny and ships inside
    the closure; no shuffle, no driver loop, block sizes grow by at
    most ``max(factors.values())``.

    Matches SQL ``JOIN (VALUES ...) USING (key), unnest(range(k))``;
    rows whose key is absent from ``factors`` keep factor 1.

    RAQC analog: none (SURVEY §2); §2 training-data surface.
    """
    import pandas as pd

    def fan_out(df: pd.DataFrame) -> pd.DataFrame:
        k = (df[key_col].map(factors).fillna(1)
             .to_numpy(dtype=np.int64))
        idx = np.repeat(np.arange(len(df), dtype=np.int64), k)
        out = df.iloc[idx].reset_index(drop=True)
        # 0..k_i-1 within each source row: global position minus the
        # row's first output position
        starts = np.concatenate(([0], np.cumsum(k)[:-1]))
        out[copy_col] = np.arange(len(out), dtype=np.int64) - np.repeat(
            starts, k)
        return out

    return ds.map_batches(fan_out, batch_format="pandas")


def weighted_hash_sample(ds, key_col: str, weight_col: str, wmax: int,
                         salt: int = 0):
    """Deterministic weight-proportional Bernoulli sample: keep a row
    iff ``lehmer(key) · wmax < weight · M`` — inclusion probability
    ``min(1, w/wmax)`` per key, as a pure shuffle-free per-row
    predicate with the same reproducibility contract as
    :func:`hash_sample` (same key ⇒ same decision on any layout /
    cluster size; the comparison is exact int64 for ``wmax ≤ ~4·10⁹``).

    The quality-weighted downsampling primitive: pass a per-document
    quality/length score as ``weight_col`` and its cap as ``wmax`` —
    high-scoring documents are kept with proportionally higher
    probability, and the SQL mirror is the same inequality verbatim
    (full DuckDB oracle, q131)."""
    if wmax <= 0:
        raise ValueError(f"wmax must be positive, got {wmax}")

    def keep(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = b[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lhs = _lehmer(keys, salt) * np.int64(wmax)
        return b.filter(pa.array(lhs < w * np.int64(_M)))

    return ds.map_batches(keep, batch_format="pyarrow")


def weighted_sample_n(ds, key_col: str, weight_col: str, n: int,
                      salt: int = 0):
    """Deterministic FIXED-SIZE weighted sample without replacement
    (Efraimidis & Spirakis, IPL 97 (2006) 181): each row draws
    ``u = (lehmer(key)+1) / 2^31`` ∈ (0,1) and the sample is the n
    rows maximizing ``u^(1/w)`` — inclusion is weight-proportional
    without replacement, reproducible on any layout / cluster size
    (the randomness is the same SQL-expressible Lehmer hash as
    :func:`hash_sample`).  Rows with ``weight ≤ 0`` are dropped.

    The engine orders by the monotone-equivalent ``ln(u)/w``
    descending (ties → key ascending) — the same double expression the
    DuckDB oracle computes, ROUNDED to 9 dp before ordering on both
    sides (numpy ``log`` and DuckDB ``LN`` may differ in the last ulp;
    rounding first makes the rank-n boundary platform-independent, the
    repo's round-before-order discipline — cf. ``bm25_topk``).  Plan:
    per-block top-n prune (sort + head inside ``map_batches``) so the
    global sort moves ≤ n rows per block, then ``sort().limit(n)``.
    Unlike :func:`weighted_hash_sample` (Bernoulli, EXPECTED rate)
    this yields an exact sample SIZE — the contract quota-bound
    training mixtures need."""
    import pandas as pd

    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        w = df[weight_col].to_numpy().astype(np.float64)
        out = df[w > 0.0].copy()
        keys = out[key_col].to_numpy().astype(np.int64)
        hv = _lehmer(keys, salt)
        out["__es_key"] = np.round(
            np.log((hv + np.int64(1)) / 2147483648.0) / w[w > 0.0], 9)
        return (out.sort_values(["__es_key", key_col],
                                ascending=[False, True],
                                kind="mergesort").head(n))

    pruned = ds.map_batches(prune, batch_format="pandas")
    return (pruned.sort(["__es_key", key_col],
                        descending=[True, False]).limit(n)
            .drop_columns(["__es_key"]))
