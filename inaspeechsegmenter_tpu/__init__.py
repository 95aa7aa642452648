"""TPU-native audio segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
ina-foss/inaSpeechSegmenter (reference: /root/reference): CNN-based
speech / music / noise / gender segmentation of arbitrary media, plus the
VBx x-vector voice-femininity scoring pipeline — redesigned as a single
device-resident TPU pipeline (framing -> STFT -> mel -> patches -> CNN ->
Viterbi never leave the chip).

Public API mirrors the reference package __init__.py:26
(`from .segmenter import Segmenter, seg2csv`).
"""

__version__ = "0.1.0"

from .segmenter import Segmenter
from .export import seg2csv, seg2textgrid
from .online import OnlineSegmenter, OnlineVFS
from .vfs import VoiceFemininityScoring

__all__ = ["Segmenter", "seg2csv", "seg2textgrid", "VoiceFemininityScoring",
           "OnlineSegmenter", "OnlineVFS", "__version__"]
