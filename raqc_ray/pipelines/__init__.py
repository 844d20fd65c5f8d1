from .validate import EpochResult, validate_epoch, validate_epoch_pair

__all__ = ["EpochResult", "validate_epoch", "validate_epoch_pair"]
