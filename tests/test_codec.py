"""Lossless upload codecs (dsp/codec.py): bit-exactness of zero-block
elision and predictive bit-packing, and the frontend integration
(dsp/sidekit.py upload groups)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from inaspeechsegmenter_tpu.dsp.codec import (  # noqa: E402
    BLOCK, PAGE, pack_best, pack_bits, pack_zero_elide, unpack_bits,
    unpack_zero_elide)
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


# --------------------------------------------------------------------------
# predictive bit-packing codec
# --------------------------------------------------------------------------

def _bits_roundtrip(sig):
    sig = sig[:len(sig) // BLOCK * BLOCK]
    buf = pack_bits(sig)
    assert buf is not None
    out = np.asarray(unpack_bits(jnp.asarray(buf), len(sig) // BLOCK))
    assert np.array_equal(out, sig)
    return len(buf) / (2 * len(sig))


def test_bits_roundtrip_mixed_content():
    """Every width/order class in one signal: silence, DC, ramps, tones
    across the band, quiet and loud noise, full-scale extremes."""
    rng = np.random.default_rng(0)
    sr = 16000
    sig = np.concatenate([
        np.zeros(sr * 8, np.int16),                               # w=0
        np.full(sr * 4, -12345, np.int16),                        # DC, w=0
        (np.arange(sr * 4) % 30000 - 15000).astype(np.int16),     # ramp
        (np.sin(2 * np.pi * 440 * np.arange(sr * 8) / sr)
         * 9000).astype(np.int16),                                # low tone
        (np.sin(2 * np.pi * 7999 * np.arange(sr * 8) / sr)
         * 32767).astype(np.int16),                               # Nyquist-1
        (rng.standard_normal(sr * 8) * 37).astype(np.int16),      # quiet
        np.clip(rng.standard_normal(sr * 8) * 8000,
                -32768, 32767).astype(np.int16),                  # loud
        np.array([-32768, 32767] * (sr * 2), np.int16),           # extremes
    ])
    ratio = _bits_roundtrip(sig)
    assert ratio < 0.75    # audible mix must compress meaningfully


def test_bits_width_bin_edges():
    """Blocks whose residual maxima sit exactly on the zigzag width-bin
    edges (the off-by-one hot spot of any width selector)."""
    blocks = []
    # order-0 content: the residual IS the sample; +v has zigzag 2v,
    # -v has zigzag 2v-1.  Edges at zigzag 2^k - 1 / 2^k.
    for v in (1, 2, 7, 8, 127, 128, 2047, 2048, 32767):
        for s in (v, -v):
            b = np.zeros(BLOCK, np.int16)
            b[::3] = s        # kill the linear predictors' advantage? no —
            b[1::3] = -s      # alternate so diffs are LARGER than samples
            blocks.append(b)
    blocks.append(np.full(BLOCK, -32768, np.int16))
    sig = np.concatenate(blocks * 40)   # enough blocks to clear min_save
    ratio = _bits_roundtrip(sig)
    assert ratio < 0.95


def test_bits_declines_white_noise():
    """Full-scale white noise is incompressible: pack_bits must decline
    and pack_best must fall through (elide also declines: no zero block)."""
    rng = np.random.default_rng(1)
    sig = np.clip(rng.standard_normal(16000 * 30) * 20000,
                  -32768, 32767).astype(np.int16)
    sig = sig[:len(sig) // BLOCK * BLOCK]
    assert pack_bits(sig) is None
    assert pack_best(sig) is None


def test_pack_best_prefers_bits_then_elide(monkeypatch):
    rng = np.random.default_rng(2)
    sr = 16000
    tone = (np.sin(2 * np.pi * 300 * np.arange(sr * 60) / sr)
            * 5000).astype(np.int16)
    kind, _ = pack_best(tone)
    assert kind == "bits"
    monkeypatch.setenv("ISS_UPLOAD_PACK", "0")
    # silence-heavy noise: bits disabled -> elision must still engage
    sig = np.clip(rng.standard_normal(sr * 60) * 20000,
                  -32768, 32767).astype(np.int16)
    sig[:sr * 30] = 0
    kind, _ = pack_best(sig)
    assert kind == "elide"


def test_bits_fuzz_roundtrip():
    """Random per-block content classes, 200 blocks x 20 trials: every
    packed signal must reconstruct bit-identically."""
    rng = np.random.default_rng(3)
    for trial in range(20):
        nb = 200
        blocks = np.zeros((nb, BLOCK), np.int16)
        kinds = rng.integers(0, 6, nb)
        for i, k in enumerate(kinds):
            if k == 0:
                continue
            elif k == 1:
                blocks[i] = rng.integers(-32768, 32768)
            elif k == 2:
                amp = int(rng.integers(1, 32767))
                f = rng.uniform(10, 8000)
                blocks[i] = (np.sin(2 * np.pi * f / 16000
                                    * np.arange(BLOCK)) * amp).astype(np.int16)
            elif k == 3:
                scale = float(rng.uniform(0.5, 20000))
                blocks[i] = np.clip(rng.standard_normal(BLOCK) * scale,
                                    -32768, 32767).astype(np.int16)
            elif k == 4:
                blocks[i] = rng.integers(-32768, 32768, BLOCK)
            else:
                step = int(rng.integers(-200, 201))
                blocks[i] = (np.arange(BLOCK) * step
                             + int(rng.integers(-30000, 30001))
                             ).astype(np.int16)
        sig = blocks.reshape(-1)
        buf = pack_bits(sig, min_save=-1.0)   # force packing even when poor
        out = np.asarray(unpack_bits(jnp.asarray(buf), nb))
        assert np.array_equal(out, sig), f"trial {trial} mismatch"


def test_bits_native_encoder_byte_identical():
    """The C encoder (native/issaudio.cc iss_pack_bits) must produce
    byte-identical buffers to the numpy reference encoder, and agree on
    declines, across every content class."""
    from inaspeechsegmenter_tpu.audio.native import available
    if not available():
        pytest.skip("native library not built (make -C native)")
    rng = np.random.default_rng(5)
    sr = 16000
    cases = [
        (np.sin(2 * np.pi * 500 * np.arange(sr * 60) / sr)
         * 7000).astype(np.int16),
        np.concatenate([np.zeros(sr * 10, np.int16),
                        (rng.standard_normal(sr * 30) * 1500
                         ).astype(np.int16),
                        np.full(sr * 5, 99, np.int16)]),
        np.tile(np.array([-32768, 32767, 0, -1], np.int16), sr * 10),
        np.clip(rng.standard_normal(sr * 30) * 20000,
                -32768, 32767).astype(np.int16),
        rng.integers(-32768, 32768, sr * 20).astype(np.int16),
    ]
    for i, sig in enumerate(cases):
        sig = sig[:len(sig) // BLOCK * BLOCK]
        for ms in (0.05, -1.0):
            a = pack_bits(sig, min_save=ms)
            b = pack_bits(sig, min_save=ms, allow_native=False)
            if a is None or b is None:
                assert a is None and b is None, f"case {i} decline mismatch"
            else:
                assert np.array_equal(a, b), f"case {i} bytes differ"


def test_bits_odd_width_and_meta_layout():
    """Format v2 pins: widths are EXACT (odd included, no even rounding)
    and the meta byte is order<<5 | width.  A residual ceiling of zigzag
    16..31 must choose width 5, not 6."""
    nb = 3000
    rng = np.random.default_rng(9)
    # order-0 content alternating +/-: samples in [-12, 12] with max |.|
    # >= 9 per block -> zigzag max in [17, 24] -> exactly 5 bits
    blocks = rng.integers(-8, 9, (nb, BLOCK)).astype(np.int16)
    blocks[:, ::7] = 12 * np.sign(blocks[:, ::7] + 1).astype(np.int16)
    sig = blocks.reshape(-1)
    buf = pack_bits(sig, min_save=-1.0)
    assert buf is not None
    meta = np.asarray(buf[-nb:])
    width = meta & 0x1F
    assert width.max() <= 6 and (width % 2 == 1).any(), \
        "odd widths must be representable"
    out = np.asarray(unpack_bits(jnp.asarray(buf), nb))
    assert np.array_equal(out, sig)
    # native and numpy agree on the v2 meta bytes too
    b2 = pack_bits(sig, min_save=-1.0, allow_native=False)
    assert np.array_equal(buf, b2)


def test_native_pack_version_gate():
    """A stale pre-0.3 library build (v1 pool format) must be rejected by
    the loader gate so the numpy v2 encoder runs instead."""
    from inaspeechsegmenter_tpu.audio.native import _pack_format_ok

    class FakeLib:
        def __init__(self, ver):
            self.iss_version = lambda: ver
    assert not _pack_format_ok(FakeLib(b"issaudio-0.2.0"))
    assert _pack_format_ok(FakeLib(b"issaudio-0.3.0"))
    assert _pack_format_ok(FakeLib(b"issaudio-1.0.0"))
    assert not _pack_format_ok(FakeLib(b"garbage"))


@pytest.mark.parametrize("pack_env", ["0", "auto"])
def test_frontend_features_identical_bits(monkeypatch, pack_env):
    """Codec off vs on (elide-only and bits): identical device features on
    compressible int16 content spanning multiple upload groups."""
    rng = np.random.default_rng(7)
    sr = 16000
    t = np.arange(sr * 90) / sr
    sig = (np.sin(2 * np.pi * 220 * t) * 6000
           + rng.standard_normal(sr * 90) * 300).astype(np.int16)
    sig[sr * 10:sr * 25] = 0
    fe = SidekitFrontend()
    monkeypatch.setenv("ISS_UPLOAD_CODEC", "0")
    m0, l0, t0 = fe.mspec_loge(sig)
    monkeypatch.setenv("ISS_UPLOAD_CODEC", "1")
    monkeypatch.setenv("ISS_UPLOAD_PACK", pack_env)
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
