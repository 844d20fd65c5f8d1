from .manifest import CheckpointManifest

__all__ = ["CheckpointManifest"]
