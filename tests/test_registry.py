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


def test_synthetic_npz_never_shadows_real_source(model_dir):
    """Dropping the real hdf5 next to an (opted-in) synthetic stand-in must
    resolve to the real file even when the stand-in is newer — the
    stand-in would otherwise silently produce garbage segmentations
    forever (round-3 review finding)."""
    npz = model_dir / "keras_male_female_cnn.npz"
    src = model_dir / "keras_male_female_cnn.hdf5"
    _write_npz(str(npz), synthetic=True)
    assert get_remote("keras_male_female_cnn.hdf5",
                      allow_download=False) == str(npz)  # opted-in stand-in
    src.write_bytes(b"h5")                               # real weights land
    now = time.time() + 10
    os.utime(npz, (now, now))
    assert get_remote("keras_male_female_cnn.hdf5",
                      allow_download=False) == str(src)


def test_corrupt_npz_warns_and_falls_back(model_dir):
    """A truncated/corrupt npz is never resolved as a checkpoint: it warns
    and falls back to the source file (or a clean not-found error)."""
    npz = model_dir / "keras_male_female_cnn.npz"
    src = model_dir / "keras_male_female_cnn.hdf5"
    npz.write_bytes(b"\x00trash-not-a-zip")
    src.write_bytes(b"h5")
    with pytest.warns(UserWarning, match="unreadable native checkpoint"):
        assert get_remote("keras_male_female_cnn.hdf5",
                          allow_download=False) == str(src)
    src.unlink()
    with pytest.warns(UserWarning, match="unreadable native checkpoint"):
        with pytest.raises(ModelNotFoundError):
            get_remote("keras_male_female_cnn.hdf5", allow_download=False)


def _write_npz_with_source(path, source_path):
    import json

    from inaspeechsegmenter_tpu.models.registry import _file_sha256

    spec = {"layers": [], "source": {
        "name": os.path.basename(source_path),
        "size": os.path.getsize(source_path),
        "sha256": _file_sha256(source_path)}}
    np.savez(path, __spec__=np.frombuffer(
        json.dumps(spec).encode(), dtype=np.uint8))


def test_conversion_cache_content_identity(tmp_path, monkeypatch):
    """Cache reuse verifies recorded source CONTENT, not mtimes: a
    timestamp-preserving install (cp -p / rsync -a) of updated weights
    must not resolve to the stale conversion of the previous release —
    and a content-matching conversion is reused even when its mtime
    happens to predate the source."""
    keras = tmp_path / "keras"
    cache = tmp_path / "cache"
    keras.mkdir()
    cache.mkdir()
    src = keras / "keras_male_female_cnn.hdf5"
    npz = cache / "keras_male_female_cnn.npz"
    monkeypatch.delenv("ISS_TPU_MODEL_DIR", raising=False)
    monkeypatch.setattr(
        "inaspeechsegmenter_tpu.models.registry._search_dirs",
        lambda: [str(keras), str(cache)])
    # stale cache: npz recorded from release v1, user installs v2 with a
    # PRESERVED (older) timestamp; npz mtime is newer but content differs
    src.write_bytes(b"release-v1")
    _write_npz_with_source(str(npz), str(src))
    src.write_bytes(b"release-v2-different-size")
    old = time.time() - 1000
    os.utime(src, (old, old))
    assert get_remote("keras_male_female_cnn.hdf5",
                      allow_download=False) == str(src)
    # matching content: reused even though the npz mtime predates the src
    _write_npz_with_source(str(npz), str(src))
    os.utime(npz, (old - 1000, old - 1000))
    assert get_remote("keras_male_female_cnn.hdf5",
                      allow_download=False) == str(npz)


def _varint(v):
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def test_onnx_uint64_data_and_unsupported_dtype():
    """TensorProto field 11 (uint64_data, the spec container for
    UINT32/UINT64) parses; an unsupported element type (STRING) returns
    None instead of aborting the parse so weight extraction skips it."""
    from inaspeechsegmenter_tpu.models.onnx_reader import _parse_tensor

    # name="u", dims=[3], data_type=UINT32(12), uint64_data packed
    blob = (bytes([0x42]) + _varint(1) + b"u"            # field 8 LEN name
            + bytes([0x08]) + _varint(3)                 # field 1 dims
            + bytes([0x10]) + _varint(12)                # field 2 dtype
            + bytes([0x5A]) + _varint(3)                 # field 11 packed
            + _varint(7) + _varint(8) + _varint(9))
    name, arr = _parse_tensor(memoryview(blob))
    assert name == "u" and arr.dtype == np.uint32
    np.testing.assert_array_equal(arr, [7, 8, 9])

    # data_type=STRING(8): skipped, not an exception
    blob = (bytes([0x42]) + _varint(1) + b"s"
            + bytes([0x10]) + _varint(8))
    name, arr = _parse_tensor(memoryview(blob))
    assert name == "s" and arr is None


def test_strip_final_softmax_only_touches_output_layer():
    """An internal Softmax must NOT be linearized when the model's output
    activation is something else (e.g. a sigmoid head)."""
    from inaspeechsegmenter_tpu.models.keras_h5 import strip_final_softmax

    spec = {"layers": [
        {"name": "d1", "class_name": "Dense",
         "config": {"activation": "relu"}},
        {"name": "att", "class_name": "Softmax", "config": {}},
        {"name": "out", "class_name": "Dense",
         "config": {"activation": "sigmoid"}},
    ]}
    out = strip_final_softmax(spec)
    assert out["layers"][1]["class_name"] == "Softmax"
    assert out["layers"][2]["config"]["activation"] == "sigmoid"
    # explicit outputs list: only the named output layer is stripped
    spec["outputs"] = ["att"]
    out = strip_final_softmax(spec)
    assert out["layers"][1]["class_name"] == "Activation"
    assert out["layers"][1]["config"]["activation"] == "linear"
    assert out["layers"][2]["config"]["activation"] == "sigmoid"
