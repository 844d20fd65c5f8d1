from . import ann, dedup, text

__all__ = ["ann", "dedup", "text"]
