"""Vendored HyperLogLog (dense registers, numpy-vectorized).

Public algorithm: Flajolet et al. 2007, with the standard small-range
(linear counting) correction as in the HLL++ paper (Heule et al. 2013).
The reference engine computes exact distinct counts in one in-memory pass
(``[R] raqc/multi_array.py (rec.)`` has no cardinality op at all); the target
spec mandates a mergeable sketch with an exact small-scale oracle
(BASELINE.json:6, SURVEY.md §2.5 A7).

Hashing: vectorized 64-bit via polars' stable-within-a-run ``Series.hash``
(same interpreter/version on every Ray worker), with a hashlib fallback.
Merge = elementwise register max — associative and order-insensitive, so
partition order cannot change the estimate.
"""

from __future__ import annotations

import hashlib
import pickle

import numpy as np

# Eager import + warm-up at module import time. polars populates some module
# attributes lazily on first use; when several Ray UDF threads hit
# ``Series.hash`` concurrently the lazy loader can race and raise
# AttributeError ('polars._reexport' has no attribute ...) — NOT ImportError —
# aborting the run. Importing and exercising the full hash path here (once per
# process, before any Dataset executes) serializes that first use.
try:  # pragma: no branch - polars is installed in the sandbox
    import polars as _pl

    _s = _pl.Series([0])
    _ = _s.dtype == _pl.Null  # touch dtype/reexport machinery
    _ = _s.hash(seed=0).to_numpy()
    _ = _pl.Series([None]).dtype == _pl.Null
except ImportError:  # pragma: no cover
    _pl = None


def hash64(values) -> np.ndarray:
    """Vectorized 64-bit hash of a sequence of strings/ints → uint64 array.

    Uses polars ``Series.hash`` process-wide (stable within one interpreter /
    polars version on every Ray worker). The blake2b fallback exists only for
    environments without polars at all — never mixed within a run, because
    ``_pl`` is resolved once at import time.
    """
    if _pl is not None:
        s = _pl.Series(values)
        if s.dtype == _pl.Null:
            return np.zeros(len(s), dtype=np.uint64)
        return s.hash(seed=0).to_numpy().astype(np.uint64)
    out = np.empty(len(values), dtype=np.uint64)  # pragma: no cover
    for i, v in enumerate(values):
        d = hashlib.blake2b(str(v).encode(), digest_size=8).digest()
        out[i] = int.from_bytes(d, "little")
    return out


class HyperLogLog:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    # -- update -----------------------------------------------------------
    def add_hashes(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        h = hashes.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of remaining bits + 1, capped at 64-p+1
        lz = np.zeros(len(h), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        cur = rest.copy()
        alive = np.ones(len(h), dtype=bool)
        for _ in range(64 - self.p + 1):
            zero_top = (cur & mask) == 0
            inc = alive & zero_top
            if not inc.any():
                break
            lz[inc] += 1
            alive &= zero_top
            cur = cur << np.uint64(1)
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)

    def add(self, values) -> None:
        self.add_hashes(hash64(values))

    # -- estimate ---------------------------------------------------------
    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1.0 + 1.079 / m)
        regs = self.registers.astype(np.float64)
        est = alpha * m * m / np.sum(np.exp2(-regs))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                est = m * np.log(m / zeros)  # linear counting
        return float(est)

    # -- merge ------------------------------------------------------------
    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        return HyperLogLog(self.p, np.maximum(self.registers, other.registers))

    @classmethod
    def merge_all(cls, sketches: list["HyperLogLog"]) -> "HyperLogLog":
        if not sketches:
            return cls()
        regs = np.maximum.reduce([s.registers for s in sketches])
        return cls(sketches[0].p, regs)

    # -- serde (in-band partial rows) -------------------------------------
    def to_bytes(self) -> bytes:
        return pickle.dumps((self.p, self.registers), protocol=4)

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        p, regs = pickle.loads(data)
        return cls(p, regs)
