"""Compatibility alias: the reference exposes media decoding as
`inaSpeechSegmenter.io.media2sig16kmono` (reference io.py:32-79)."""

from .audio.io import media2sig16kmono

__all__ = ["media2sig16kmono"]
