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
    # a serialization roundtrip of identical weights must be BIT-exact
    # (allclose's default rtol would hide a lossy save_native)
    np.testing.assert_array_equal(np.asarray(imported(x)),
                                  np.asarray(again(x)))


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


# ---------------------------------------------------------------------------
# Legacy-format fixtures built by hand (NOT via in-env model.save): the real
# released files are 2018/TF-2.x era and may carry serialization shapes the
# current Keras never emits.  Each fixture writes the h5 layout directly.
# ---------------------------------------------------------------------------

def _write_legacy_h5(path, model_config, layer_weights):
    """Write a Keras-2-era hdf5: model_config/keras_version/backend attrs as
    bytes, model_weights with layer_names / per-layer weight_names attrs."""
    import h5py
    import json

    with h5py.File(path, "w") as f:
        f.attrs["model_config"] = json.dumps(model_config).encode()
        f.attrs["keras_version"] = b"2.8.0"
        f.attrs["backend"] = b"tensorflow"
        mw = f.create_group("model_weights")
        mw.attrs["layer_names"] = [n.encode() for n in layer_weights]
        mw.attrs["backend"] = b"tensorflow"
        mw.attrs["keras_version"] = b"2.8.0"
        for lname, wlist in layer_weights.items():
            g = mw.create_group(lname)
            g.attrs["weight_names"] = [wn.encode() for wn, _ in wlist]
            for wn, arr in wlist:
                node = g
                parts = wn.split("/")
                for p in parts[:-1]:
                    node = node.require_group(p)
                node.create_dataset(parts[-1], data=arr)


def test_legacy_sequential_batch_input_shape(tmp_path, rng):
    """TF-2.8-style Sequential: no InputLayer entry, first layer carries
    only batch_input_shape; bytes attrs for keras_version/backend."""
    from inaspeechsegmenter_tpu.models.keras_h5 import ImportedModel

    w0 = rng.standard_normal((5, 4)).astype(np.float32)
    b0 = rng.standard_normal(4).astype(np.float32)
    cfg = {"class_name": "Sequential", "config": {
        "name": "seq", "layers": [
            {"class_name": "Dense", "config": {
                "name": "d0", "units": 4, "activation": "relu",
                "use_bias": True,
                "batch_input_shape": [None, 5], "dtype": "float32"}},
        ]}}
    p = str(tmp_path / "legacy_seq.hdf5")
    _write_legacy_h5(p, cfg, {"d0": [("d0/kernel:0", w0), ("d0/bias:0", b0)]})
    model = ImportedModel.from_h5(p)
    x = rng.standard_normal((3, 5)).astype(np.float32)
    want = np.maximum(x @ w0 + b0, 0)
    np.testing.assert_allclose(np.asarray(model(x)), want, rtol=1e-6,
                               atol=1e-6)


def test_legacy_nested_sequential(tmp_path, rng):
    """Model-in-Model: an inner Sequential feature block inside an outer
    Sequential, weights stored under the nested layer's group with
    sub-layer weight paths (both relative and prefixed forms)."""
    from inaspeechsegmenter_tpu.models.keras_h5 import ImportedModel

    wi = rng.standard_normal((6, 5)).astype(np.float32)
    bi = rng.standard_normal(5).astype(np.float32)
    wo = rng.standard_normal((5, 2)).astype(np.float32)
    bo = rng.standard_normal(2).astype(np.float32)
    inner = {"class_name": "Sequential", "config": {
        "name": "feat", "layers": [
            {"class_name": "Dense", "config": {
                "name": "din", "units": 5, "activation": "tanh",
                "use_bias": True, "batch_input_shape": [None, 6]}},
        ]}}
    cfg = {"class_name": "Sequential", "config": {
        "name": "outer", "layers": [
            inner,
            {"class_name": "Dense", "config": {
                "name": "dout", "units": 2, "activation": "softmax",
                "use_bias": True}},
        ]}}
    p = str(tmp_path / "legacy_nested.hdf5")
    _write_legacy_h5(p, cfg, {
        "feat": [("din/kernel:0", wi), ("din/bias:0", bi)],
        "dout": [("dout/kernel:0", wo), ("dout/bias:0", bo)]})
    model = ImportedModel.from_h5(p)
    x = rng.standard_normal((4, 6)).astype(np.float32)
    h = np.tanh(x @ wi + bi)
    logits = h @ wo + bo
    want = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(model(x)), want, rtol=1e-5,
                               atol=1e-6)

    # prefixed weight-path variant ('feat/din/kernel:0')
    p2 = str(tmp_path / "legacy_nested_prefixed.hdf5")
    _write_legacy_h5(p2, cfg, {
        "feat": [("feat/din/kernel:0", wi), ("feat/din/bias:0", bi)],
        "dout": [("dout/kernel:0", wo), ("dout/bias:0", bo)]})
    model2 = ImportedModel.from_h5(p2)
    np.testing.assert_allclose(np.asarray(model2(x)), want, rtol=1e-5,
                               atol=1e-6)


def test_legacy_functional_nested_model(tmp_path, rng):
    """Functional graph embedding a nested Functional 'Model' layer with
    Keras-2 inbound_nodes and flat [name, 0, 0] input/output_layers."""
    from inaspeechsegmenter_tpu.models.keras_h5 import ImportedModel

    wi = rng.standard_normal((3, 4)).astype(np.float32)
    bi = rng.standard_normal(4).astype(np.float32)
    wo = rng.standard_normal((4, 2)).astype(np.float32)
    bo = rng.standard_normal(2).astype(np.float32)
    inner = {"class_name": "Model", "config": {
        "name": "block",
        "layers": [
            {"class_name": "InputLayer", "name": "bin",
             "config": {"name": "bin", "batch_input_shape": [None, 3]},
             "inbound_nodes": []},
            {"class_name": "Dense", "name": "bd",
             "config": {"name": "bd", "units": 4, "activation": "relu",
                        "use_bias": True},
             "inbound_nodes": [[["bin", 0, 0, {}]]]},
        ],
        "input_layers": ["bin", 0, 0],
        "output_layers": ["bd", 0, 0]}}
    cfg = {"class_name": "Model", "config": {
        "name": "top",
        "layers": [
            {"class_name": "InputLayer", "name": "x",
             "config": {"name": "x", "batch_input_shape": [None, 3]},
             "inbound_nodes": []},
            dict(inner, name="block",
                 inbound_nodes=[[["x", 0, 0, {}]]]),
            {"class_name": "Dense", "name": "out",
             "config": {"name": "out", "units": 2, "activation": "linear",
                        "use_bias": True},
             "inbound_nodes": [[["block", 0, 0, {}]]]},
        ],
        "input_layers": ["x", 0, 0],
        "output_layers": ["out", 0, 0]}}
    p = str(tmp_path / "legacy_func_nested.hdf5")
    _write_legacy_h5(p, cfg, {
        "block": [("bd/kernel:0", wi), ("bd/bias:0", bi)],
        "out": [("out/kernel:0", wo), ("out/bias:0", bo)]})
    model = ImportedModel.from_h5(p)
    x = rng.standard_normal((2, 3)).astype(np.float32)
    want = np.maximum(x @ wi + bi, 0) @ wo + bo
    np.testing.assert_allclose(np.asarray(model(x)), want, rtol=1e-5,
                               atol=1e-6)


def test_legacy_doubly_nested_sequential(tmp_path, rng):
    """Two-level nesting: Sequential('outer') > Sequential('feat') >
    Sequential('inner') > Dense('din'); h5 stores all arrays under the
    top-level group 'feat' with deep weight paths — the loader keys each
    array by the owning LEAF layer name."""
    from inaspeechsegmenter_tpu.models.keras_h5 import ImportedModel

    wi = rng.standard_normal((6, 5)).astype(np.float32)
    bi = rng.standard_normal(5).astype(np.float32)
    wo = rng.standard_normal((5, 2)).astype(np.float32)
    bo = rng.standard_normal(2).astype(np.float32)
    innermost = {"class_name": "Sequential", "config": {
        "name": "inner", "layers": [
            {"class_name": "Dense", "config": {
                "name": "din", "units": 5, "activation": "tanh",
                "use_bias": True, "batch_input_shape": [None, 6]}},
        ]}}
    mid = {"class_name": "Sequential", "config": {
        "name": "feat", "layers": [innermost]}}
    cfg = {"class_name": "Sequential", "config": {
        "name": "outer", "layers": [
            mid,
            {"class_name": "Dense", "config": {
                "name": "dout", "units": 2, "activation": "linear",
                "use_bias": True}},
        ]}}
    p = str(tmp_path / "legacy_deep.hdf5")
    _write_legacy_h5(p, cfg, {
        "feat": [("inner/din/kernel:0", wi), ("inner/din/bias:0", bi)],
        "dout": [("dout/kernel:0", wo), ("dout/bias:0", bo)]})
    model = ImportedModel.from_h5(p)
    x = rng.standard_normal((3, 6)).astype(np.float32)
    want = np.tanh(x @ wi + bi) @ wo + bo
    np.testing.assert_allclose(np.asarray(model(x)), want, rtol=1e-5,
                               atol=1e-6)


def test_nested_name_collision_raises(tmp_path, rng):
    """An inner layer sharing a name with an outer layer that appears
    AFTER the nested model (legal in Keras's per-model namespaces) must
    raise KerasImportError, not silently merge weights."""
    from inaspeechsegmenter_tpu.models.keras_h5 import (ImportedModel,
                                                        KerasImportError)

    w = rng.standard_normal((4, 4)).astype(np.float32)
    b = np.zeros(4, np.float32)
    inner = {"class_name": "Sequential", "config": {
        "name": "feat", "layers": [
            {"class_name": "Dense", "config": {
                "name": "dense", "units": 4, "activation": "relu",
                "use_bias": True, "batch_input_shape": [None, 4]}},
        ]}}
    cfg = {"class_name": "Sequential", "config": {
        "name": "outer", "layers": [
            inner,
            {"class_name": "Dense", "config": {
                "name": "dense", "units": 4, "activation": "linear",
                "use_bias": True}},
        ]}}
    p = str(tmp_path / "legacy_collide.hdf5")
    _write_legacy_h5(p, cfg, {
        "feat": [("dense/kernel:0", w), ("dense/bias:0", b)],
        "dense": [("dense/kernel:0", w), ("dense/bias:0", b)]})
    with pytest.raises(KerasImportError, match="collision"):
        ImportedModel.from_h5(p)
