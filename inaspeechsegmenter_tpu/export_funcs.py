"""Compatibility alias: the reference exposes exports as
`inaSpeechSegmenter.export_funcs` (export_funcs.py:29-39) and its tutorials
import from that path."""

from .export import seg2csv, seg2textgrid

__all__ = ["seg2csv", "seg2textgrid"]
