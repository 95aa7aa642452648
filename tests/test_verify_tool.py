"""tools/verify_weights.py — the on-hardware acceptance kit.

Validates the topology-report path against hand-built real-format Keras
hdf5 files (the tool's golden battery is exercised by
tests/test_golden_weights.py logic when real weights are present).
"""

import json
import os
import subprocess
import sys

import h5py
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_h5(path, layers, layer_weights):
    cfg = {"class_name": "Sequential",
           "config": {"name": "m", "layers": layers}}
    with h5py.File(path, "w") as f:
        f.attrs["model_config"] = json.dumps(cfg).encode()
        f.attrs["keras_version"] = b"2.8.0"
        f.attrs["backend"] = b"tensorflow"
        mw = f.create_group("model_weights")
        mw.attrs["layer_names"] = [n.encode() for n in layer_weights]
        for lname, wlist in layer_weights.items():
            g = mw.create_group(lname)
            g.attrs["weight_names"] = [wn.encode() for wn, _ in wlist]
            for wn, arr in wlist:
                node = g
                parts = wn.split("/")
                for p in parts[:-1]:
                    node = node.require_group(p)
                node.create_dataset(parts[-1], data=arr)


def _patch_cnn_h5(path, nmel, nout, rng):
    k = rng.standard_normal((3, 3, 1, 4)).astype(np.float32)
    kb = np.zeros(4, np.float32)
    d = rng.standard_normal((4 * 68 * nmel, nout)).astype(np.float32)
    db = np.zeros(nout, np.float32)
    _write_h5(path, [
        {"class_name": "Conv2D", "config": {
            "name": "c0", "filters": 4, "kernel_size": [3, 3],
            "padding": "same", "activation": "relu", "use_bias": True,
            "batch_input_shape": [None, 68, nmel, 1]}},
        {"class_name": "Flatten", "config": {"name": "fl"}},
        {"class_name": "Dense", "config": {
            "name": "d0", "units": nout, "activation": "softmax",
            "use_bias": True}},
    ], {"c0": [("c0/kernel:0", k), ("c0/bias:0", kb)],
        "d0": [("d0/kernel:0", d), ("d0/bias:0", db)]})


def _mlp_h5(path, rng):
    w = rng.standard_normal((256, 1)).astype(np.float32)
    b = np.zeros(1, np.float32)
    _write_h5(path, [
        {"class_name": "Dense", "config": {
            "name": "g0", "units": 1, "activation": "sigmoid",
            "use_bias": True, "batch_input_shape": [None, 256]}},
    ], {"g0": [("g0/kernel:0", w), ("g0/bias:0", b)]})


def test_seg_diff_detail_quantifies_parity_misses():
    """A byte-parity FAIL must say HOW far off: numeric jitter (within the
    0.1% budget) reads differently from wrong weights (gross diff)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "verify_weights", os.path.join(REPO, "tools", "verify_weights.py"))
    vw = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vw)

    gold = [("male", 0.0, 5.0), ("noEnergy", 5.0, 10.0)]
    jitter = [("male", 0.0, 5.0), ("noEnergy", 5.0, 10.0)]
    assert "0.0000%" in vw.seg_diff_detail(gold, jitter)
    shifted = [("male", 0.0, 5.02), ("noEnergy", 5.02, 10.0)]
    d = vw.seg_diff_detail(gold, shifted)
    assert "0.2000%" in d and "OVER" in d and "1/1 matched" in d
    small = [("male", 0.0, 5.002), ("noEnergy", 5.002, 10.0)]
    assert "within the 0.1% budget" in vw.seg_diff_detail(gold, small)
    wrong = [("music", 0.0, 10.0)]
    assert "100.0000%" in vw.seg_diff_detail(gold, wrong)


def test_report_only_on_real_format_files(tmp_path):
    rng = np.random.default_rng(0)
    d = tmp_path / "models"
    d.mkdir()
    _patch_cnn_h5(str(d / "keras_speech_music_cnn.hdf5"), 21, 2, rng)
    _patch_cnn_h5(str(d / "keras_speech_music_noise_cnn.hdf5"), 21, 3, rng)
    _patch_cnn_h5(str(d / "keras_male_female_cnn.hdf5"), 24, 2, rng)
    _mlp_h5(str(d / "interspeech2023_all.hdf5"), rng)
    _mlp_h5(str(d / "interspeech2023_cvfr.hdf5"), rng)
    env = dict(os.environ, ISS_TPU_MODEL_DIR=str(d),
               JAX_PLATFORMS="cpu")
    jpath = str(tmp_path / "report.json")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "verify_weights.py"),
         "--report-only", "--json", jpath],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=240)
    assert r.returncode == 0, r.stdout + r.stderr
    out = r.stdout
    # every hdf5 got a topology PASS and a forward PASS
    assert out.count("topology") >= 5
    assert "FAIL" not in out
    assert "UNSUPPORTED" not in out
    assert out.count(": forward") == 5
    # machine-readable report (CI / Docker acceptance hooks parse this)
    rep = json.load(open(jpath))
    assert rep["ok"] and rep["verified"]
    assert rep["summary"]["fail"] == 0 and rep["summary"]["pass"] >= 10
    assert rep["models"]["keras_speech_music_cnn.hdf5"].endswith(".hdf5")
    assert rep["models"]["final.onnx"] is None
    assert {e["status"] for e in rep["results"]} == {"PASS"}


def test_report_flags_unsupported_layer(tmp_path):
    rng = np.random.default_rng(1)
    d = tmp_path / "models"
    d.mkdir()
    w = rng.standard_normal((16, 2)).astype(np.float32)
    _write_h5(str(d / "keras_speech_music_cnn.hdf5"), [
        {"class_name": "LSTM", "config": {
            "name": "l0", "units": 16,
            "batch_input_shape": [None, 10, 4]}},
        {"class_name": "Dense", "config": {
            "name": "d0", "units": 2, "activation": "softmax",
            "use_bias": True}},
    ], {"d0": [("d0/kernel:0", w), ("d0/bias:0", np.zeros(2, np.float32))]})
    env = dict(os.environ, ISS_TPU_MODEL_DIR=str(d), JAX_PLATFORMS="cpu")
    jpath = str(tmp_path / "report.json")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "verify_weights.py"),
         "--report-only", "--json", jpath],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=240)
    assert r.returncode == 1      # unsupported layer type -> FAIL
    assert "UNSUPPORTED" in r.stdout and "LSTM" in r.stdout
    rep = json.load(open(jpath))
    assert not rep["ok"]
    assert any(e["status"] == "FAIL" for e in rep["results"])
