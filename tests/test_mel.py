"""Filterbank parity vs the reference construction code."""

import numpy as np
import pytest

from inaspeechsegmenter_tpu.dsp.mel import htk_triangular_fbank, kaldi_mel_fbank


@pytest.mark.parametrize("nlin,nlog,low,high", [
    (0, 24, 100, 8000),    # the segmentation frontend configuration
    (24, 0, 0, 8000),
    (10, 14, 50, 8000),
    (0, 40, 20, 7600),
])
def test_htk_fbank_parity(ref_sidekit, nlin, nlog, low, high):
    ours, _ = htk_triangular_fbank(16000, 512, low, high, nlin, nlog)
    theirs, _ = ref_sidekit.trfbank(16000, 512, low, high, nlin, nlog)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("numchans,lo,hi,htk_bug", [
    (64, 20.0, 7600, False),   # VBx configuration
    (20, 0.0, None, True),
    (40, 64.0, 8000, True),
])
def test_kaldi_fbank_parity(ref_features_vbx, numchans, lo, hi, htk_bug):
    ours = kaldi_mel_fbank(400, 16000, numchans=numchans, lofreq=lo,
                           hifreq=hi, htk_bug=htk_bug)
    theirs = ref_features_vbx.mel_fbank_mx(400, 16000, NUMCHANS=numchans,
                                           LOFREQ=lo, HIFREQ=hi,
                                           htk_bug=htk_bug)
    np.testing.assert_allclose(ours, theirs, rtol=1e-10, atol=1e-12)
