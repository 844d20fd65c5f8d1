"""Bloom-prefiltered semi join — the shuffle-pushdown scale path.

:func:`raqc_ray.ops.join.semi_join` hash-shuffles BOTH sides; at
10^12 left rows that exchange dominates even when only a small
fraction of left rows survive.  This operator pushes an approximate
membership test to the left side's map stage first:

1. ONE ``map_batches`` pass over the (key-projected) right side emits
   a per-block packed Bloom bitset (``num_bits/8`` bytes each —
   output-sized, independent of row count);
2. the per-block bitsets OR-merge on the driver (a few KB × blocks)
   and the merged filter broadcasts once via ``ray.put``;
3. ONE ``map_batches`` pass prefilters the left side against the
   broadcast filter — no shuffle, false-positive rate ≈
   ``(1 - e^(-k·n/m))^k``;
4. the (survivor-sized) remainder goes through the EXACT hash
   semi join, so the final result is exact — the Bloom pass only
   shrinks what the all-to-all exchange has to move.

Keys are int64 (the engine's id domain).  k hash probes derive from
one splitmix64 avalanche via double hashing (Kirsch–Mitzenmacher),
fully vectorized in numpy.

Partitioning assumption: the merged bitset (``num_bits/8`` bytes,
default 128 KiB) must fit every worker's heap — it is the compact
stand-in for a broadcast key set precisely when the raw key set does
not.  RAQC analog: none (SURVEY §2.4 joins are grid-aligned).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain construction)."""
    z = x.astype(np.uint64) + _SM_GAMMA
    z = (z ^ (z >> np.uint64(30))) * _SM_M1
    z = (z ^ (z >> np.uint64(27))) * _SM_M2
    return z ^ (z >> np.uint64(31))


def _probe_positions(keys: np.ndarray, num_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing h1 + i·h2 (mod num_bits)."""
    h = _splitmix64(keys.astype(np.uint64))
    h1 = h % np.uint64(num_bits)
    # odd step ⇒ full-period probing when num_bits is a power of two
    h2 = ((h >> np.uint64(32)) | np.uint64(1)) % np.uint64(num_bits)
    i = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(num_bits)


def _member_mask(keys: np.ndarray, bitset: np.ndarray, num_bits: int,
                 k: int) -> np.ndarray:
    pos = _probe_positions(keys, num_bits, k)
    bits = (bitset[(pos >> np.uint64(3)).astype(np.int64)]
            >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
    return bits.all(axis=1)


def bloom_semi_join(left_ds, right_ds, on: str, right_on: str | None = None,
                    num_bits: int = 1 << 20, k: int = 4,
                    num_partitions: int | None = None):
    """EXACT semi join (left rows with ≥1 right key match) with a Bloom
    prefilter pushed to the left side's map stage.

    ``num_bits`` must be a power of two.  Returns left columns only.
    """
    import ray

    from .join import semi_join

    if right_on is None:
        right_on = on
    assert num_bits & (num_bits - 1) == 0, "num_bits must be a power of two"
    nbytes = num_bits // 8

    def block_bitset(df: pd.DataFrame) -> pd.DataFrame:
        arr = np.zeros(nbytes, dtype=np.uint8)
        keys = df[right_on].to_numpy(dtype=np.int64)
        if keys.size:
            pos = _probe_positions(keys, num_bits, k).ravel()
            np.bitwise_or.at(arr, (pos >> np.uint64(3)).astype(np.int64),
                             np.uint8(1) << (pos & np.uint64(7)).astype(
                                 np.uint8))
        return pd.DataFrame({"bitset": [arr.tobytes()]})

    # per-block bitsets are output-sized (nbytes each, regardless of row
    # count); the driver OR-merge moves blocks × nbytes — the compact
    # stand-in for collecting the raw key set
    parts = (right_ds.select_columns([right_on])
             .map_batches(block_bitset, batch_format="pandas").to_pandas())
    merged = np.zeros(nbytes, dtype=np.uint8)
    for b in parts["bitset"]:
        merged |= np.frombuffer(b, dtype=np.uint8)
    ref = ray.put(merged)

    def prefilter(df: pd.DataFrame) -> pd.DataFrame:
        bitset = ray.get(ref)  # zero-copy view of the shared buffer
        keys = df[on].to_numpy(dtype=np.int64)
        if not keys.size:
            return df
        return df[_member_mask(keys, bitset, num_bits, k)]

    survivors = left_ds.map_batches(prefilter, batch_format="pandas")
    # exactness: the Bloom pass admits false positives, so survivors
    # still run through the exact hash semi join — but the all-to-all
    # now moves only (matches + fp) rows instead of the whole left side
    return semi_join(survivors, right_ds.select_columns([right_on]),
                     on=on, right_on=right_on,
                     num_partitions=num_partitions)
