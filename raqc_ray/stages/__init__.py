from .passa import PASSA_SCHEMA, ValidatorStage, merge_partial_group

__all__ = ["PASSA_SCHEMA", "ValidatorStage", "merge_partial_group"]
