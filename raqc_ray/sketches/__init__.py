from .hll import HyperLogLog
from .tdigest import TDigest

__all__ = ["HyperLogLog", "TDigest"]
