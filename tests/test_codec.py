"""Zero-block elision upload codec (dsp/codec.py): bit-exactness and the
frontend integration (dsp/sidekit.py upload groups)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from inaspeechsegmenter_tpu.dsp.codec import (  # noqa: E402
    BLOCK, PAGE, pack_zero_elide, unpack_zero_elide)
from inaspeechsegmenter_tpu.dsp.sidekit import SidekitFrontend  # noqa: E402


def _mixed_signal(n_blocks, zero_frac, seed=0):
    rng = np.random.default_rng(seed)
    blocks = rng.integers(-3000, 3000, (n_blocks, BLOCK)).astype(np.int16)
    z = rng.random(n_blocks) < zero_frac
    blocks[z] = 0
    return blocks.reshape(-1)


@pytest.mark.parametrize("zero_frac", [0.3, 0.9])
def test_roundtrip_exact(zero_frac):
    sig = _mixed_signal(4 * PAGE + 3, zero_frac)
    packed = pack_zero_elide(sig)
    assert packed is not None
    nb = len(sig) // BLOCK
    out = unpack_zero_elide(jnp.asarray(packed), nb)
    assert np.array_equal(np.asarray(out), sig)


def test_all_zero_signal():
    sig = np.zeros(3 * PAGE * BLOCK, np.int16)
    nb = len(sig) // BLOCK
    packed = pack_zero_elide(sig)
    assert len(packed) == PAGE * BLOCK + nb  # one (all-padding) page + mask
    out = unpack_zero_elide(jnp.asarray(packed), nb)
    assert np.array_equal(np.asarray(out), sig)


def test_incompressible_returns_none():
    sig = _mixed_signal(2 * PAGE, 0.0)
    sig[sig == 0] = 1  # ensure no zero block at all
    assert pack_zero_elide(sig) is None


def test_sub_page_saving_returns_none():
    # a handful of zero blocks below one page of savings -> raw path
    sig = _mixed_signal(2 * PAGE, 0.0, seed=1)
    sig[sig == 0] = 1
    blocks = sig.reshape(-1, BLOCK)
    blocks[:PAGE // 2] = 0
    assert pack_zero_elide(blocks.reshape(-1)) is None


def test_unaligned_offset_slice():
    # group slices start at multiples of CHUNK*HOP samples; the int64 view
    # inside pack must accept them (8-byte-aligned offsets)
    base = _mixed_signal(8 * PAGE, 0.5, seed=2)
    off = 4 * BLOCK
    sl = base[off:off + 4 * PAGE * BLOCK]
    packed = pack_zero_elide(sl)
    assert packed is not None
    out = unpack_zero_elide(jnp.asarray(packed), len(sl) // BLOCK)
    assert np.array_equal(np.asarray(out), sl)


def test_frontend_features_identical(monkeypatch):
    """Codec on vs off: identical device features for a silence-heavy
    int16 signal spanning multiple upload groups."""
    rng = np.random.default_rng(7)
    sig = (rng.standard_normal(16000 * 90) * 2000).astype(np.int16)
    sig[16000 * 10:16000 * 55] = 0  # 45 s of digital silence
    fe = SidekitFrontend()
    monkeypatch.setenv("ISS_UPLOAD_CODEC", "0")
    m0, l0, t0 = fe.mspec_loge(sig)
    monkeypatch.setenv("ISS_UPLOAD_CODEC", "1")
    m1, l1, t1 = fe.mspec_loge(sig)
    assert t0 == t1
    assert np.array_equal(np.asarray(m0), np.asarray(m1), equal_nan=True)
    assert np.array_equal(np.asarray(l0), np.asarray(l1), equal_nan=True)


def test_frontend_float_input_skips_codec(monkeypatch):
    """float32 signals (non-PCM16 sources) must take the raw path."""
    sig = np.zeros(16000 * 30, np.float32)
    fe = SidekitFrontend()
    monkeypatch.setenv("ISS_UPLOAD_CODEC", "1")
    m, l, t = fe.mspec_loge(sig)  # must not raise in pack's int16 assert
    assert t == (len(sig) - 400) // 160 + 1
