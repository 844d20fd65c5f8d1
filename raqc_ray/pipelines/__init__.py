from .checkpoint import validate_epoch_checkpointed
from .validate import EpochResult, validate_epoch, validate_epoch_pair

__all__ = ["EpochResult", "validate_epoch", "validate_epoch_pair",
           "validate_epoch_checkpointed"]
