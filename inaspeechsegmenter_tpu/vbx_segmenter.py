"""Compatibility alias: the reference exposes the VFS pipeline as
`inaSpeechSegmenter.vbx_segmenter` (vbx_segmenter.py:92) and its tutorials
import from that path.  The reference's module-level helpers are provided
too; where the reference traffics in pyannote objects
(`get_annot_VAD`/`is_mid_speech`, vbx_segmenter.py:28-69), the pyannote-free
:class:`~inaspeechsegmenter_tpu.annotations.SpeechTimeline` stands in
(documented deviation — pyannote.core is not a dependency here)."""

from .annotations import SpeechTimeline
from .dsp.vbx_host import get_features
from .vfs import (EMBED_DIM, FEAT_DIM, SR, STEP, WINLEN, JaxResnetExtractor,
                  VoiceFemininityScoring, add_needed_vectors,
                  get_femininity_score)

# the reference's abstract extractor role (vbx_segmenter.py:205-266): one
# batched-JAX backend replaces the Onnx/Torch backend pair
VBxExtractor = JaxResnetExtractor

__all__ = ["VoiceFemininityScoring", "JaxResnetExtractor", "VBxExtractor",
           "add_needed_vectors", "get_femininity_score", "get_features",
           "get_annot_VAD", "is_mid_speech",
           "STEP", "WINLEN", "FEAT_DIM", "EMBED_DIM", "SR"]


def get_annot_VAD(vad_tuples):
    """(label, start, stop) tuples -> speech timeline (the reference returns
    a pyannote Annotation, vbx_segmenter.py:64-69)."""
    return SpeechTimeline.from_vad(vad_tuples)


def is_mid_speech(start, stop, a_vad):
    """True when the segment midpoint lies strictly inside detected speech
    (reference vbx_segmenter.py:28-38)."""
    return a_vad.contains_point((start + stop) / 2)
