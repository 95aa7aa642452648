"""Keras hdf5 importer parity vs real TensorFlow/Keras models.

Builds small models with the in-environment TF, saves legacy hdf5, imports
through our h5py-based reader, and compares forward passes — validating the
exact machinery that will load the released inaSpeechSegmenter weights.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from inaspeechsegmenter_tpu.models import ImportedModel, save_native, load_native  # noqa: E402


def _check(model, x, atol=1e-5):
    ref = model.predict(x, verbose=0)
    imported = ImportedModel.from_h5(model._h5path)
    out = np.asarray(imported(x))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=atol)
    return imported


def _save(model, tmp_path, name):
    p = str(tmp_path / name)
    model.save(p)
    model._h5path = p
    return model


def test_sequential_cnn(tmp_path, rng):
    keras = tf.keras
    model = keras.Sequential([
        keras.layers.Input((68, 21, 1)),
        keras.layers.Conv2D(8, 3, padding="same", activation="relu"),
        keras.layers.BatchNormalization(),
        keras.layers.MaxPooling2D((2, 1)),
        keras.layers.Conv2D(16, 3, padding="valid", strides=2,
                            activation="relu"),
        keras.layers.Dropout(0.3),
        keras.layers.Flatten(),
        keras.layers.Dense(32, activation="relu"),
        keras.layers.Dense(3, activation="softmax"),
    ])
    # randomize BN stats so eval-mode parity is meaningful
    bn = model.layers[1]
    bn.set_weights([w + rng.standard_normal(w.shape).astype(np.float32) * 0.1
                    for w in bn.get_weights()])
    _save(model, tmp_path, "seq.h5")
    x = rng.standard_normal((4, 68, 21, 1)).astype(np.float32)
    _check(model, x)


def test_functional_graph(tmp_path, rng):
    keras = tf.keras
    inp = keras.layers.Input((16, 16, 2))
    a = keras.layers.Conv2D(4, 3, padding="same", activation="relu")(inp)
    b = keras.layers.Conv2D(4, 1, padding="same")(inp)
    m = keras.layers.Add()([a, b])
    m = keras.layers.Activation("relu")(m)
    c = keras.layers.AveragePooling2D(2)(m)
    d = keras.layers.GlobalAveragePooling2D()(c)
    out = keras.layers.Dense(5, activation="sigmoid")(d)
    model = keras.Model(inp, out)
    _save(model, tmp_path, "func.h5")
    x = rng.standard_normal((3, 16, 16, 2)).astype(np.float32)
    _check(model, x)


def test_mlp(tmp_path, rng):
    keras = tf.keras
    model = keras.Sequential([
        keras.layers.Input((256,)),
        keras.layers.Dense(64, activation="tanh"),
        keras.layers.Dense(1, activation="sigmoid"),
    ])
    _save(model, tmp_path, "mlp.h5")
    x = rng.standard_normal((7, 256)).astype(np.float32)
    _check(model, x)


def test_native_roundtrip(tmp_path, rng):
    keras = tf.keras
    model = keras.Sequential([
        keras.layers.Input((10,)),
        keras.layers.Dense(4, activation="relu"),
        keras.layers.Dense(2, activation="softmax"),
    ])
    _save(model, tmp_path, "rt.h5")
    imported = ImportedModel.from_h5(model._h5path)
    npz = str(tmp_path / "rt.npz")
    imported.save_native(npz)
    again = ImportedModel.from_native(npz)
    x = rng.standard_normal((5, 10)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(imported(x)), np.asarray(again(x)),
                               atol=0)


def test_keras2_style_spec(rng):
    """Keras-2 era inbound_nodes format ([[['name',0,0,{}]]]) parses."""
    from inaspeechsegmenter_tpu.models.keras_h5 import _parse_inbound

    assert _parse_inbound([[["conv_1", 0, 0, {}]]]) == ["conv_1"]
    assert _parse_inbound([[["a", 0, 0], ["b", 0, 0]]]) == ["a", "b"]
    assert _parse_inbound([]) == []


def test_cnn_precision_knob(monkeypatch):
    """ISS_CNN_PRECISION maps to lax.Precision and the forward still runs."""
    import jax
    import jax.numpy as jnp

    from inaspeechsegmenter_tpu.models import layers as L
    from inaspeechsegmenter_tpu.models.synthetic import build_patch_cnn
    from inaspeechsegmenter_tpu.models.keras_h5 import build_forward

    assert L.cnn_precision() == jax.lax.Precision.HIGHEST  # default
    spec, params = build_patch_cnn(21, 3, seed=0, size="small")
    x = jnp.zeros((2, 68, 21, 1), jnp.float32)
    outs = {}
    for mode, want in [("highest", jax.lax.Precision.HIGHEST),
                       ("high", jax.lax.Precision.HIGH),
                       ("bf16", jax.lax.Precision.DEFAULT)]:
        monkeypatch.setenv("ISS_CNN_PRECISION", mode)
        assert L.cnn_precision() == want
        outs[mode] = np.asarray(build_forward(spec)(params, x))
    # identical graph topology; numerics agree to f32-ish on CPU
    np.testing.assert_allclose(outs["highest"], outs["bf16"], atol=2e-2)
    # unknown explicit values fail fast with a clear message (both knobs)
    import pytest

    from inaspeechsegmenter_tpu.models.resnet import xvec_precision

    monkeypatch.setenv("ISS_CNN_PRECISION", "bogus")
    with pytest.raises(ValueError, match="ISS_CNN_PRECISION"):
        L.cnn_precision()
    monkeypatch.setenv("ISS_XVEC_PRECISION", "bogus")
    with pytest.raises(ValueError, match="ISS_XVEC_PRECISION"):
        xvec_precision()
    monkeypatch.setenv("ISS_XVEC_PRECISION", "")   # empty -> default
    assert xvec_precision() == jax.lax.Precision.HIGHEST
