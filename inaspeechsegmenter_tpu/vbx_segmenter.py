"""Compatibility alias: the reference exposes the VFS pipeline as
`inaSpeechSegmenter.vbx_segmenter` (vbx_segmenter.py:92) and its tutorials
import from that path."""

from .vfs import (VoiceFemininityScoring, JaxResnetExtractor,
                  add_needed_vectors, get_femininity_score,
                  STEP, WINLEN, FEAT_DIM, EMBED_DIM, SR)

__all__ = ["VoiceFemininityScoring", "JaxResnetExtractor",
           "add_needed_vectors", "get_femininity_score",
           "STEP", "WINLEN", "FEAT_DIM", "EMBED_DIM", "SR"]
