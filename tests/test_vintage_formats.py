"""Serialization-VINTAGE fixtures for the importers.

The released inaSpeechSegmenter weights were written by a TF 2.8-era
stack (reference Dockerfile:1-7) with hdf5s dating back to Keras 2.1/2.2
(2018, reference remote_utils.py:7-15), and `final.onnx` by an older
torch/opset.  The in-environment TF and torch save NEWER layouts, so
these tests hand-craft files in the vintage conventions — Keras 2.x
Sequential configs stored as a bare LIST, `Model` (not `Functional`)
graphs with `[[['name', 0, 0, {}]]]` inbound nodes, nested
`layer/layer/weight:0` h5 dataset paths, fixed-width bytes attrs — and
an ONNX export with `keep_initializers_as_inputs` + the oldest opset the
in-env torch still emits, then assert the importers reproduce the SAME
forward pass as the modern-format save of identical weights.
"""

import io
import json

import numpy as np
import pytest

from inaspeechsegmenter_tpu.models import ImportedModel


def _vintage_conv_cfg(name, filters, kernel, activation, input_shape=None,
                      padding="valid", strides=(1, 1)):
    cfg = {
        "name": name, "trainable": True,
        "filters": filters, "kernel_size": list(kernel),
        "strides": list(strides), "padding": padding,
        "data_format": "channels_last", "dilation_rate": [1, 1],
        "activation": activation, "use_bias": True,
        "kernel_initializer": {"class_name": "VarianceScaling",
                               "config": {"scale": 1.0, "mode": "fan_avg",
                                          "distribution": "uniform",
                                          "seed": None}},
        "bias_initializer": {"class_name": "Zeros", "config": {}},
        "kernel_regularizer": None, "bias_regularizer": None,
        "activity_regularizer": None, "kernel_constraint": None,
        "bias_constraint": None,
    }
    if input_shape is not None:
        cfg["batch_input_shape"] = [None] + list(input_shape)
        cfg["dtype"] = "float32"
    return {"class_name": "Conv2D", "config": cfg}


def _vintage_dense_cfg(name, units, activation):
    return {"class_name": "Dense", "config": {
        "name": name, "trainable": True, "units": units,
        "activation": activation, "use_bias": True,
        "kernel_initializer": {"class_name": "VarianceScaling",
                               "config": {"scale": 1.0, "mode": "fan_avg",
                                          "distribution": "uniform",
                                          "seed": None}},
        "bias_initializer": {"class_name": "Zeros", "config": {}},
        "kernel_regularizer": None, "bias_regularizer": None,
        "activity_regularizer": None, "kernel_constraint": None,
        "bias_constraint": None}}


def _write_vintage_h5(path, model_config, weights, keras_version="2.1.6"):
    """Write an hdf5 in the 2018 Keras layout: JSON `model_config` attr,
    fixed-width bytes `layer_names` / `weight_names` attrs, datasets at
    the nested `model_weights/<layer>/<layer>/<weight>:0` paths."""
    import h5py

    with h5py.File(path, "w") as f:
        f.attrs["model_config"] = np.bytes_(json.dumps(model_config))
        f.attrs["keras_version"] = np.bytes_(keras_version)
        f.attrs["backend"] = np.bytes_("tensorflow")
        g = f.create_group("model_weights")
        g.attrs["layer_names"] = np.array(
            [np.bytes_(n) for n in weights], dtype="S64")
        g.attrs["keras_version"] = np.bytes_(keras_version)
        g.attrs["backend"] = np.bytes_("tensorflow")
        for lname, wlist in weights.items():
            lg = g.create_group(lname)
            wnames = [f"{lname}/{wn}:0" for wn, _ in wlist]
            lg.attrs["weight_names"] = np.array(
                [np.bytes_(n) for n in wnames], dtype="S96")
            for (wn, arr), full in zip(wlist, wnames):
                lg.create_dataset(full, data=np.asarray(arr, np.float32))


@pytest.fixture(scope="module")
def tf():
    return pytest.importorskip("tensorflow")


def test_keras21_sequential_list_config(tmp_path, tf, rng):
    """Keras 2.1-style Sequential: `config` is a bare LIST of layers, the
    first layer carries `batch_input_shape`, weights live at nested
    2018-era dataset paths.  Must reproduce the modern model bit-for-bit
    (same weights)."""
    keras = tf.keras
    modern = keras.Sequential([
        keras.layers.Input((68, 21, 1)),
        keras.layers.Conv2D(6, (5, 3), activation="relu"),
        keras.layers.MaxPooling2D((2, 1)),
        keras.layers.Conv2D(8, 3, activation="relu"),
        keras.layers.Flatten(),
        keras.layers.Dense(16, activation="relu"),
        keras.layers.Dense(3, activation="softmax"),
    ])
    w = {n: m.get_weights() for n, m in zip(
        ["conv2d_1", "conv2d_2", "dense_1", "dense_2"],
        [modern.layers[0], modern.layers[2], modern.layers[4],
         modern.layers[5]])}

    cfg = {"class_name": "Sequential", "config": [
        _vintage_conv_cfg("conv2d_1", 6, (5, 3), "relu",
                          input_shape=(68, 21, 1)),
        {"class_name": "MaxPooling2D", "config": {
            "name": "max_pooling2d_1", "trainable": True,
            "pool_size": [2, 1], "padding": "valid", "strides": [2, 1],
            "data_format": "channels_last"}},
        _vintage_conv_cfg("conv2d_2", 8, (3, 3), "relu"),
        {"class_name": "Flatten", "config": {
            "name": "flatten_1", "trainable": True,
            "data_format": "channels_last"}},
        _vintage_dense_cfg("dense_1", 16, "relu"),
        _vintage_dense_cfg("dense_2", 3, "softmax"),
    ]}
    weights = {
        "conv2d_1": [("kernel", w["conv2d_1"][0]), ("bias", w["conv2d_1"][1])],
        "max_pooling2d_1": [],
        "conv2d_2": [("kernel", w["conv2d_2"][0]), ("bias", w["conv2d_2"][1])],
        "flatten_1": [],
        "dense_1": [("kernel", w["dense_1"][0]), ("bias", w["dense_1"][1])],
        "dense_2": [("kernel", w["dense_2"][0]), ("bias", w["dense_2"][1])],
    }
    p = str(tmp_path / "keras21.h5")
    _write_vintage_h5(p, cfg, {k: v for k, v in weights.items() if v})

    x = rng.standard_normal((4, 68, 21, 1)).astype(np.float32)
    want = modern.predict(x, verbose=0)
    got = np.asarray(ImportedModel.from_h5(p)(x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_keras22_model_graph_inbound_nodes(tmp_path, tf, rng):
    """Keras 2.2-style Functional graph: class_name `Model`,
    `inbound_nodes: [[['name', 0, 0, {}]]]`, `input_layers` /
    `output_layers` as [name, node, tensor] triples, InputLayer with
    `batch_input_shape` + old `sparse` field."""
    keras = tf.keras
    inp = keras.layers.Input((12, 8, 1))
    a = keras.layers.Conv2D(4, 3, padding="same", activation="relu",
                            name="ma")(inp)
    b = keras.layers.Conv2D(4, 1, padding="same", name="mb")(inp)
    m = keras.layers.Add(name="madd")([a, b])
    f = keras.layers.Flatten(name="mflat")(m)
    out = keras.layers.Dense(2, activation="softmax", name="mout")(f)
    modern = keras.Model(inp, out)

    def conv_cfg(layer, name, **kw):
        c = _vintage_conv_cfg(name, layer.filters, layer.kernel_size,
                              "relu" if name == "ma" else "linear",
                              padding="same")
        return c["config"]

    cfg = {"class_name": "Model", "config": {
        "name": "model_1",
        "layers": [
            {"class_name": "InputLayer", "name": "input_1",
             "config": {"batch_input_shape": [None, 12, 8, 1],
                        "dtype": "float32", "sparse": False,
                        "name": "input_1"},
             "inbound_nodes": []},
            {"class_name": "Conv2D", "name": "ma",
             "config": conv_cfg(modern.get_layer("ma"), "ma"),
             "inbound_nodes": [[["input_1", 0, 0, {}]]]},
            {"class_name": "Conv2D", "name": "mb",
             "config": conv_cfg(modern.get_layer("mb"), "mb"),
             "inbound_nodes": [[["input_1", 0, 0, {}]]]},
            {"class_name": "Add", "name": "madd",
             "config": {"name": "madd", "trainable": True},
             "inbound_nodes": [[["ma", 0, 0, {}], ["mb", 0, 0, {}]]]},
            {"class_name": "Flatten", "name": "mflat",
             "config": {"name": "mflat", "trainable": True,
                        "data_format": "channels_last"},
             "inbound_nodes": [[["madd", 0, 0, {}]]]},
            {"class_name": "Dense", "name": "mout",
             "config": _vintage_dense_cfg("mout", 2, "softmax")["config"],
             "inbound_nodes": [[["mflat", 0, 0, {}]]]},
        ],
        "input_layers": [["input_1", 0, 0]],
        "output_layers": [["mout", 0, 0]],
    }}
    weights = {n: [("kernel", modern.get_layer(n).get_weights()[0]),
                   ("bias", modern.get_layer(n).get_weights()[1])]
               for n in ("ma", "mb", "mout")}
    p = str(tmp_path / "keras22.h5")
    _write_vintage_h5(p, cfg, weights, keras_version="2.2.4")

    x = rng.standard_normal((3, 12, 8, 1)).astype(np.float32)
    want = modern.predict(x, verbose=0)
    got = np.asarray(ImportedModel.from_h5(p)(x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_keras21_mlp_sigmoid(tmp_path, tf, rng):
    """2018-era MLP in the interspeech2023 shape (Dense sigmoid head,
    256-d input) via the bare-list Sequential config."""
    keras = tf.keras
    modern = keras.Sequential([
        keras.layers.Input((256,)),
        keras.layers.Dense(64, activation="relu"),
        keras.layers.Dense(1, activation="sigmoid"),
    ])
    cfg = {"class_name": "Sequential", "config": [
        dict(_vintage_dense_cfg("dense_1", 64, "relu"),
             config=dict(_vintage_dense_cfg("dense_1", 64, "relu")["config"],
                         batch_input_shape=[None, 256], dtype="float32")),
        _vintage_dense_cfg("dense_2", 1, "sigmoid"),
    ]}
    weights = {
        "dense_1": [("kernel", modern.layers[0].get_weights()[0]),
                    ("bias", modern.layers[0].get_weights()[1])],
        "dense_2": [("kernel", modern.layers[1].get_weights()[0]),
                    ("bias", modern.layers[1].get_weights()[1])],
    }
    p = str(tmp_path / "mlp21.h5")
    _write_vintage_h5(p, cfg, weights)
    x = rng.standard_normal((5, 256)).astype(np.float32)
    want = modern.predict(x, verbose=0)
    got = np.asarray(ImportedModel.from_h5(p)(x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Vintage ONNX conventions
# ---------------------------------------------------------------------------

torch = pytest.importorskip("torch")


def _export_vintage_onnx(model, x, opset):
    """torch.onnx.export in the oldest conventions the in-env torch still
    emits: initializers duplicated as graph inputs (the pre-1.3 default
    every old exporter used), low opset, no constant folding (separate
    BatchNormalization nodes, like a training-era export)."""
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = \
        lambda model_bytes, custom: model_bytes
    try:
        buf = io.BytesIO()
        torch.onnx.export(model, x, buf, opset_version=opset, dynamo=False,
                          do_constant_folding=False,
                          keep_initializers_as_inputs=True)
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig
    return buf.getvalue()


@pytest.mark.parametrize("opset", [9, 11])
def test_vintage_onnx_resnet(tmp_path, opset):
    """Old-opset, initializers-as-inputs, unfolded-BN export loads through
    the topology mapper and matches the torch forward."""
    from test_onnx_loader import _small_torch_model

    from inaspeechsegmenter_tpu.models.resnet import ResNetXVector
    from inaspeechsegmenter_tpu.vfs import _load_resnet_onnx

    tmodel, g = _small_torch_model((1, 1, 1, 1), 8, 16, 32)
    x = torch.randn(2, 16, 50, generator=g)
    with torch.no_grad():
        want = tmodel(x.clone()).numpy()
    p = tmp_path / f"vintage{opset}.onnx"
    p.write_bytes(_export_vintage_onnx(tmodel, x.clone(), opset))

    net = ResNetXVector("bottleneck", (1, 1, 1, 1), m_channels=8,
                        feat_dim=16, embed_dim=32)
    params = _load_resnet_onnx(net, str(p))
    got = np.asarray(net(params, x.numpy()))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
