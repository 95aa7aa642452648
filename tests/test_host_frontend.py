"""Host-CPU feature frontend: parity vs the reference and the device
frontend, padding semantics, and end-to-end label equivalence."""

import os

import numpy as np
import pytest

from inaspeechsegmenter_tpu.dsp.host_fe import HostSidekitFrontend
from inaspeechsegmenter_tpu.dsp import SidekitFrontend


@pytest.fixture(scope="module")
def host_fe():
    return HostSidekitFrontend()


def _ref_feats(ref_sidekit, sig):
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        _, loge, _, mspec = ref_sidekit.mfcc(sig.astype(np.float32),
                                             get_mspec=True)
    return mspec, loge


def test_parity_vs_reference(host_fe, ref_sidekit, rng):
    sig = (rng.standard_normal(16000 * 5) * 0.1).astype(np.float32)
    mspec, loge = host_fe.mspec_loge_np(sig)
    ref_mspec, ref_loge = _ref_feats(ref_sidekit, sig)
    assert mspec.shape == ref_mspec.shape
    np.testing.assert_allclose(loge, ref_loge, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(mspec, ref_mspec, rtol=1e-3, atol=2e-3)


def test_parity_vs_device_frontend(host_fe, ref_sidekit, musanmix_sig):
    dev = SidekitFrontend()
    m_h, l_h = host_fe.mspec_loge_np(musanmix_sig)
    m_d, l_d = dev.mspec_loge_np(musanmix_sig)
    assert m_h.shape == m_d.shape
    fin = np.isfinite(m_d)
    np.testing.assert_array_equal(np.isfinite(m_h), fin)
    np.testing.assert_allclose(m_h[fin], m_d[fin], rtol=1e-3, atol=2e-3)
    finl = np.isfinite(l_d)
    np.testing.assert_array_equal(np.isfinite(l_h), finl)
    np.testing.assert_allclose(l_h[finl], l_d[finl], rtol=1e-4, atol=1e-3)


def test_int16_path_matches_float(host_fe, rng):
    f = (rng.standard_normal(16000) * 0.2).astype(np.float32)
    i16 = np.clip(np.rint(f * 32768.0), -32768, 32767).astype(np.int16)
    m_i, l_i = host_fe.mspec_loge_np(i16)
    m_f, l_f = host_fe.mspec_loge_np(i16.astype(np.float32) / 32768.0)
    np.testing.assert_array_equal(m_i, m_f)
    np.testing.assert_array_equal(l_i, l_f)


def test_padding_semantics(host_fe, rng):
    """Padded rows are -inf (what zero frames produce) and t is exact."""
    sig = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    mspec, loge, t = host_fe.mspec_loge(sig, pad_frames_to=256)
    assert mspec.shape == (256, 24) and loge.shape == (256,)
    assert t == (16000 - 400) // 160 + 1
    m = np.asarray(mspec)
    assert np.isfinite(m[:t]).all()
    assert np.all(np.asarray(loge)[t:] == -np.inf)
    assert np.all(m[t:] == -np.inf)


def test_end_to_end_labels_match_device_frontend(synthetic_model_dir,
                                                 media_dir):
    """Same Segmenter output with ISS_FRONTEND=host and =jnp."""
    from inaspeechsegmenter_tpu import Segmenter

    results = {}
    old = os.environ.get("ISS_FRONTEND")
    try:
        for fe in ("jnp", "host"):
            os.environ["ISS_FRONTEND"] = fe
            seg = Segmenter(vad_engine="smn", detect_gender=True,
                            ffmpeg=None, allow_download=False)
            assert type(seg.frontend).__name__ == (
                "HostSidekitFrontend" if fe == "host" else "SidekitFrontend")
            results[fe] = [seg(f"{media_dir}/{w}")
                           for w in ("musanmix.wav", "silence2sec.wav")]
    finally:
        if old is None:
            os.environ.pop("ISS_FRONTEND", None)
        else:
            os.environ["ISS_FRONTEND"] = old
    for a, b in zip(results["jnp"], results["host"]):
        assert a == b
