from .uniqueness import uniqueness_violations
from .neardup import neardup_violations
from .referential import referential_violations
from .drift import drift_verdicts

__all__ = [
    "uniqueness_violations",
    "neardup_violations",
    "referential_violations",
    "drift_verdicts",
]
