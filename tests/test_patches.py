"""Patch gather+normalize parity vs an as_strided numpy oracle implementing
the reference semantics (segmenter.py:76-88)."""

import numpy as np
import jax.numpy as jnp
import pytest

from inaspeechsegmenter_tpu.dsp.patches import gather_normalized_patches

pytestmark = pytest.mark.smoke


def oracle_patches(mspec, w=68, step=2):
    """Numpy oracle: sliding windows, per-patch norm, replicate padding."""
    t, h = mspec.shape
    n_rows = (t - w) // step + 1
    rows = np.stack([mspec[i * step:i * step + w].reshape(-1)
                     for i in range(n_rows)])
    norm = (rows - rows.mean(axis=1, keepdims=True)) / rows.std(axis=1, keepdims=True)
    lfill = [norm[0]] * (w // (2 * step))
    rfill = [norm[-1]] * (w // (2 * step) - 1 + t % 2)
    data = np.vstack(lfill + [norm] + rfill)
    finite = np.all(np.isfinite(data), axis=1)
    return data.reshape(len(data), w, h), finite


@pytest.mark.parametrize("t", [68, 69, 100, 101, 500])
@pytest.mark.parametrize("nmel", [21, 24])
def test_patch_parity(rng, t, nmel):
    mspec = rng.standard_normal((t, 24)).astype(np.float32)
    n20 = (t + 1) // 2
    ours, ours_fin = gather_normalized_patches(
        jnp.asarray(mspec), jnp.arange(n20), t, nmel)
    ours = np.asarray(ours)
    expect, expect_fin = oracle_patches(mspec[:, :nmel])
    assert len(expect) == n20
    np.testing.assert_allclose(ours, expect, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ours_fin), expect_fin)


def test_nonfinite_patch_flagged(rng):
    mspec = rng.standard_normal((100, 24)).astype(np.float32)
    mspec[0:4] = -np.inf  # silent frames -> log(0)
    ours, fin = gather_normalized_patches(
        jnp.asarray(mspec), jnp.arange(50), 100, 21)
    fin = np.asarray(fin)
    assert not fin.all() and fin.any()
    _, expect_fin = oracle_patches(mspec[:, :21])
    np.testing.assert_array_equal(fin, expect_fin)


def test_constant_patch_not_finite():
    mspec = np.zeros((80, 24), np.float32)  # std == 0 -> non-finite
    _, fin = gather_normalized_patches(
        jnp.asarray(mspec), jnp.arange(40), 80, 21)
    assert not np.asarray(fin).any()
