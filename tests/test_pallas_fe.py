"""Fused Pallas feature kernel parity vs the jnp frontend (interpret mode on
CPU; the same kernel compiles natively on TPU)."""

import numpy as np
import pytest

from inaspeechsegmenter_tpu.dsp import SidekitFrontend
from inaspeechsegmenter_tpu.dsp.pallas_fe import PallasSidekitFrontend


@pytest.fixture(scope="module")
def frontends():
    return SidekitFrontend(), PallasSidekitFrontend(interpret=True)


def test_kernel_matches_jnp_random(frontends, rng):
    jnp_fe, pal_fe = frontends
    sig = (rng.standard_normal(16000 * 3) * 0.2).astype(np.float32)
    m1, l1 = jnp_fe.mspec_loge_np(sig)
    m2, l2 = pal_fe.mspec_loge_np(sig)
    assert m1.shape == m2.shape
    np.testing.assert_allclose(l2, l1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(m2, m1, rtol=1e-4, atol=1e-4)


def test_kernel_matches_jnp_real(frontends, musanmix_sig):
    jnp_fe, pal_fe = frontends
    sig = musanmix_sig[: 16000 * 10]
    m1, l1 = jnp_fe.mspec_loge_np(sig)
    m2, l2 = pal_fe.mspec_loge_np(sig)
    fin = np.isfinite(m1)
    np.testing.assert_array_equal(np.isfinite(m2), fin)
    np.testing.assert_allclose(m2[fin], m1[fin], rtol=1e-4, atol=1e-3)
    finl = np.isfinite(l1)
    np.testing.assert_allclose(l2[finl], l1[finl], rtol=1e-5, atol=1e-4)
