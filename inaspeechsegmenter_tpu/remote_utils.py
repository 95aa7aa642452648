"""Compatibility alias: the reference exposes the model registry as
`inaSpeechSegmenter.remote_utils.get_remote` (remote_utils.py:18-27)."""

from .models.registry import get_remote

__all__ = ["get_remote"]
