"""Registry resolution semantics: synthetic gating, stale conversions,
priority between real files and converted caches."""

import os
import time

import numpy as np
import pytest

from inaspeechsegmenter_tpu.models.registry import (ModelNotFoundError,
                                                    get_remote)


def _write_npz(path, synthetic=False):
    import json

    spec = {"layers": [], "synthetic": synthetic}
    np.savez(path, __spec__=np.frombuffer(
        json.dumps(spec).encode(), dtype=np.uint8))


@pytest.fixture()
def model_dir(tmp_path, monkeypatch):
    d = tmp_path / "models"
    d.mkdir()
    monkeypatch.setenv("ISS_TPU_MODEL_DIR", str(d))
    return d


def test_synthetic_env_zero_is_off(tmp_path, monkeypatch):
    """ISS_ALLOW_SYNTHETIC=0/false/off must DISABLE synthetic loads."""
    cache = tmp_path / "cache"
    cache.mkdir()
    _write_npz(str(cache / "keras_male_female_cnn.npz"), synthetic=True)
    monkeypatch.delenv("ISS_TPU_MODEL_DIR", raising=False)
    monkeypatch.setattr(
        "inaspeechsegmenter_tpu.models.registry._search_dirs",
        lambda: [str(cache)])
    for off in ("0", "false", "OFF", "no", ""):
        monkeypatch.setenv("ISS_ALLOW_SYNTHETIC", off)
        with pytest.raises(ModelNotFoundError):
            get_remote("keras_male_female_cnn.hdf5", allow_download=False)
    monkeypatch.setenv("ISS_ALLOW_SYNTHETIC", "1")
    assert get_remote("keras_male_female_cnn.hdf5",
                      allow_download=False).endswith(".npz")


def test_stale_npz_does_not_shadow_updated_source(model_dir):
    """An npz conversion older than its source file is ignored."""
    npz = model_dir / "keras_male_female_cnn.npz"
    src = model_dir / "keras_male_female_cnn.hdf5"
    _write_npz(str(npz))
    src.write_bytes(b"h5")
    old = time.time() - 1000
    os.utime(npz, (old, old))            # npz predates the source
    assert get_remote("keras_male_female_cnn.hdf5",
                      allow_download=False) == str(src)
    now = time.time() + 10
    os.utime(npz, (now, now))            # fresh conversion wins again
    assert get_remote("keras_male_female_cnn.hdf5",
                      allow_download=False) == str(npz)


def test_fresh_cache_npz_preferred_over_lower_priority_source(
        tmp_path, monkeypatch):
    """The conversion cache in a lower-priority dir still serves a source
    hdf5 found in a higher-priority dir (skipping hdf5 re-parse), as long
    as it is fresh and real."""
    keras = tmp_path / "keras"
    cache = tmp_path / "cache"
    keras.mkdir()
    cache.mkdir()
    src = keras / "keras_male_female_cnn.hdf5"
    src.write_bytes(b"h5")
    monkeypatch.delenv("ISS_TPU_MODEL_DIR", raising=False)
    monkeypatch.setattr(
        "inaspeechsegmenter_tpu.models.registry._search_dirs",
        lambda: [str(keras), str(cache)])
    assert get_remote("keras_male_female_cnn.hdf5",
                      allow_download=False) == str(src)
    npz = cache / "keras_male_female_cnn.npz"
    _write_npz(str(npz))
    now = time.time() + 10
    os.utime(npz, (now, now))
    assert get_remote("keras_male_female_cnn.hdf5",
                      allow_download=False) == str(npz)
    # a SYNTHETIC npz must never shadow the real source
    _write_npz(str(npz), synthetic=True)
    os.utime(npz, (now, now))
    assert get_remote("keras_male_female_cnn.hdf5",
                      allow_download=False) == str(src)


def test_pooled_freq_matches_forward_shapes():
    """init_params embedding size agrees with the forward's pooled shape
    for feat_dims whose stride-2 chain hits odd intermediates."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from inaspeechsegmenter_tpu.models.resnet import (ResNetXVector,
                                                      pooled_freq)

    assert pooled_freq(64) == 8
    assert pooled_freq(65) == 9          # 65 -> 33 -> 17 -> 9
    assert pooled_freq(24) == 3
    for feat_dim in (24, 65):
        net = ResNetXVector("bottleneck", (1, 1, 1, 1), 4, feat_dim, 32)
        params = net.init_params(seed=0)
        out = net(params, jnp.zeros((1, feat_dim, 20), jnp.float32))
        assert out.shape == (1, 32)


def test_onnx_unpacked_repeated_ints():
    """A compliant writer may emit repeated ints one varint at a time; the
    reader must accumulate them, not keep only the last."""
    from inaspeechsegmenter_tpu.models.onnx_reader import _parse_attribute

    def varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            if v:
                out += bytes([b7 | 0x80])
            else:
                out += bytes([b7])
                return out

    # field 1 (name, LEN) + field 8 repeated ints, unpacked (wt=0) x4
    blob = bytes([0x0A]) + varint(4) + b"pads"
    for v in (1, 2, 3, 4):
        blob += bytes([0x40]) + varint(v)      # field 8, varint wire type
    name, value = _parse_attribute(memoryview(blob))
    assert name == "pads"
    assert value == [1, 2, 3, 4]


def test_conv1d_causal_and_dilation():
    """Causal padding = left-pad (kw-1)*dilation; dilation_rate forwarded."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from inaspeechsegmenter_tpu.models.layers import conv1d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 16, 1)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 1, 1)).astype(np.float32))
    cfg = {"padding": "causal", "use_bias": False, "activation": "linear"}
    out = conv1d(cfg, [k], x)
    assert out.shape == (1, 16, 1)
    # manual: y[t] = sum_j k[j] * x[t-2+j] with left zero-pad
    xp = np.concatenate([np.zeros((1, 2, 1)), np.asarray(x)], axis=1)
    ref = np.stack([(xp[0, t:t + 3, 0] * np.asarray(k)[:, 0, 0]).sum()
                    for t in range(16)])
    np.testing.assert_allclose(np.asarray(out)[0, :, 0], ref, rtol=1e-5)
    # dilation=2: left-pad 4
    cfg2 = dict(cfg, dilation_rate=2)
    out2 = conv1d(cfg2, [k], x)
    xp2 = np.concatenate([np.zeros((1, 4, 1)), np.asarray(x)], axis=1)
    ref2 = np.stack([(xp2[0, [t, t + 2, t + 4], 0]
                      * np.asarray(k)[:, 0, 0]).sum() for t in range(16)])
    np.testing.assert_allclose(np.asarray(out2)[0, :, 0], ref2, rtol=1e-5)


def test_relu_max_value_zero():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from inaspeechsegmenter_tpu.models.layers import relu_layer

    x = jnp.asarray(np.array([-1.0, 0.5, 2.0], np.float32))
    out = relu_layer({"max_value": 0.0}, [], x)
    np.testing.assert_array_equal(np.asarray(out), [0.0, 0.0, 0.0])
