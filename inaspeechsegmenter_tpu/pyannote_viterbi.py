"""Compatibility alias: the reference exposes the constrained Viterbi
decoder as `inaSpeechSegmenter.pyannote_viterbi.viterbi_decoding`
(pyannote_viterbi.py:118-224).  The implementation here is the device
decoder (`decode/viterbi.py` — lax.scan / log-depth parallel / blocked),
equality-tested against the reference across the constraint surface."""

from .decode.viterbi import (VITERBI_CONSTRAINT_FORBIDDEN,
                             VITERBI_CONSTRAINT_MANDATORY,
                             VITERBI_CONSTRAINT_NONE, viterbi_decoding)

__all__ = ["viterbi_decoding", "VITERBI_CONSTRAINT_NONE",
           "VITERBI_CONSTRAINT_FORBIDDEN", "VITERBI_CONSTRAINT_MANDATORY"]
