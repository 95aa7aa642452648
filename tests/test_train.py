"""Training on the 8-device virtual mesh: loss decreases, shardings apply."""

import os

import numpy as np
import pytest


def test_train_step_dp_tp():
    import jax
    from jax.sharding import PartitionSpec as P

    from inaspeechsegmenter_tpu.models.synthetic import build_patch_cnn
    from inaspeechsegmenter_tpu.parallel.mesh import make_2d_mesh
    from inaspeechsegmenter_tpu.train import Trainer

    spec, params = build_patch_cnn(21, 3, seed=0, size="small")
    mesh = make_2d_mesh(data=4, model=2)
    trainer = Trainer(spec, params, mesh=mesh, learning_rate=3e-4)

    # fc1 kernel (1428, 256): tensor-sharded over the model axis
    fc1 = trainer.params["fc1"][0]
    assert fc1.sharding.spec == P(None, "model")

    rng = np.random.default_rng(0)
    x = rng.standard_normal((32, 68, 21, 1)).astype(np.float32)
    y = rng.integers(0, 3, 32).astype(np.int32)
    losses = [trainer.train_step(x, y) for _ in range(8)]
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()

    probs = trainer.predict_proba(x[:4])
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)


def test_overfit_tiny():
    """Sanity: the model family can memorize a tiny labeled set."""
    from inaspeechsegmenter_tpu.models.synthetic import build_gender_mlp
    from inaspeechsegmenter_tpu.parallel.mesh import make_2d_mesh
    from inaspeechsegmenter_tpu.train import Trainer

    spec, params = build_gender_mlp(in_dim=16, hidden=32, seed=1)
    # binary sigmoid head -> train as 1-logit softmax is degenerate; use the
    # patch-CNN style 2-class head instead by relabeling units
    spec["layers"][-1]["config"]["units"] = 2
    rngp = np.random.default_rng(0)
    params["out"] = [rngp.standard_normal((32, 2)).astype(np.float32) * 0.1,
                     np.zeros(2, np.float32)]
    mesh = make_2d_mesh(data=8, model=1)
    trainer = Trainer(spec, params, mesh=mesh, learning_rate=1e-2)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((64, 16)).astype(np.float32)
    y = (x[:, 0] > 0).astype(np.int32)
    trainer.fit(x, y, epochs=60, batch_size=64)
    acc = (trainer.predict_proba(x).argmax(1) == y).mean()
    assert acc > 0.9, acc


@pytest.mark.slow
def test_checkpoint_resume(tmp_path):
    """save/restore round-trips (params, opt_state): a resumed trainer takes
    bit-identical steps to an uninterrupted one."""
    import numpy as np
    from inaspeechsegmenter_tpu.models.synthetic import build_patch_cnn
    from inaspeechsegmenter_tpu.train import Trainer

    spec, params = build_patch_cnn(21, 3, seed=0, size="small")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 68, 21, 1)).astype(np.float32)
    y = rng.integers(0, 3, 16).astype(np.int32)

    a = Trainer(spec, params, learning_rate=1e-3)
    a.train_step(x, y)
    a.train_step(x, y)
    ckpt = str(tmp_path / "step2.npz")
    a.save_checkpoint(ckpt)
    expected = a.train_step(x, y)

    spec2, params2 = build_patch_cnn(21, 3, seed=9, size="small")
    b = Trainer(spec2, params2, learning_rate=1e-3)
    b.restore_checkpoint(ckpt)
    got = b.train_step(x, y)
    assert got == expected

    wrong_spec, wrong_params = build_patch_cnn(24, 2, seed=0, size="small")
    c = Trainer(wrong_spec, wrong_params)
    import pytest
    with pytest.raises(ValueError):
        c.restore_checkpoint(ckpt)


def test_fit_batch_not_divisible_by_mesh():
    """fit() must round batch sizes to the mesh data axis and tile datasets
    smaller than it — a 10-sample dataset on a data=4 mesh used to crash in
    jax.device_put with a divisibility ValueError before any step ran."""
    import numpy as np

    from inaspeechsegmenter_tpu.models.synthetic import build_gender_mlp
    from inaspeechsegmenter_tpu.parallel.mesh import make_2d_mesh
    from inaspeechsegmenter_tpu.train import Trainer

    spec, params = build_gender_mlp(in_dim=8, hidden=16, seed=0)
    spec["layers"][-1]["config"]["units"] = 2
    rngp = np.random.default_rng(0)
    params["out"] = [rngp.standard_normal((16, 2)).astype(np.float32) * 0.1,
                     np.zeros(2, np.float32)]
    mesh = make_2d_mesh(data=4, model=1)
    trainer = Trainer(spec, params, mesh=mesh)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((10, 8)).astype(np.float32)
    y = (x[:, 0] > 0).astype(np.int32)
    losses = trainer.fit(x, y, epochs=2)          # batch 10 -> 8
    assert losses and np.isfinite(losses).all()
    losses = trainer.fit(x, y, epochs=1, batch_size=6)   # -> 4
    assert len(losses) == 2                        # two 4-sample steps
    # dataset smaller than the data axis: tiled up, still trains
    losses = trainer.fit(x[:3], y[:3], epochs=1)
    assert losses and np.isfinite(losses).all()
    # explicit shard_batch keeps the clear divisibility error
    import pytest
    with pytest.raises(ValueError, match="not divisible"):
        trainer.shard_batch(x, y)


def _sig_of(kind, seconds, seed, sr=16000):
    """Class-separable synthetic audio: harmonic stack (music-like),
    4 Hz amplitude-modulated noise (speech-like), stationary noise."""
    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    t = np.arange(n, dtype=np.float32) / sr
    if kind == "music":
        f0 = 200.0 + 40.0 * rng.uniform()
        sig = sum(np.sin(2 * np.pi * f0 * k * t + rng.uniform(0, 6.28)) / k
                  for k in range(1, 6)) * 0.15
    elif kind == "speech":
        env = 0.65 + 0.35 * np.sin(2 * np.pi * 4.0 * t + rng.uniform(0, 6.28))
        sig = rng.standard_normal(n) * 0.12 * env
    else:  # stationary broadband noise
        sig = rng.standard_normal(n) * 0.1
    return sig.astype(np.float32)


def _class_patches(frontend, kind, seeds, seconds=10.0):
    """Labeled training patches through the PRODUCTION feature path
    (sidekit frontend + the fused pipeline's own patch gather/normalize)."""
    import jax.numpy as jnp

    from inaspeechsegmenter_tpu.dsp.patches import gather_normalized_patches

    out = []
    for seed in seeds:
        mspec, loge, t = frontend.mspec_loge(_sig_of(kind, seconds, seed))
        n20 = (t + 1) // 2
        j = np.arange(8, n20 - 8, 2, dtype=np.int32)  # interior, stride 2
        p, fin = gather_normalized_patches(mspec, jnp.asarray(j), t, 21)
        out.append(np.asarray(p)[np.asarray(fin)])
    return np.concatenate(out)[..., None]  # (B, 68, 21, 1)


def _dominant_label(lseg, a, b):
    tot = {}
    for lab, s, e in lseg:
        ov = max(0.0, min(e, b) - max(s, a))
        tot[lab] = tot.get(lab, 0.0) + ov
    return max(tot, key=tot.get)


def test_train_to_deployment_e2e(tmp_path, monkeypatch):
    """The full training capability, end to end: patches from the
    production frontend -> Trainer fit (loss decreases) -> held-out
    accuracy far above chance -> export_model into the registry dir ->
    a fresh Segmenter serves the TRAINED weights (no synthetic warning)
    through the fused pipeline -> batch_process exports a csv whose
    per-region dominant labels match the constructed ground truth."""
    import warnings

    from inaspeechsegmenter_tpu import Segmenter
    from inaspeechsegmenter_tpu.audio import write_wav
    from inaspeechsegmenter_tpu.models.synthetic import (
        build_patch_cnn, install_synthetic_models)
    from inaspeechsegmenter_tpu.train import Trainer

    d = install_synthetic_models(str(tmp_path / "models"), size="small")
    monkeypatch.setenv("ISS_TPU_MODEL_DIR", d)
    seg0 = Segmenter(vad_engine="smn", detect_gender=False, ffmpeg=None,
                     allow_download=False)

    # smn outlabels order = (speech, music, noise)
    kinds = ("speech", "music", "noise")
    xtr = [_class_patches(seg0.frontend, k, seeds=(7, 8)) for k in kinds]
    xho = [_class_patches(seg0.frontend, k, seeds=(9,)) for k in kinds]
    x = np.concatenate(xtr)
    y = np.concatenate([np.full(len(p), i, np.int32)
                        for i, p in enumerate(xtr)])
    x_ho = np.concatenate(xho)
    y_ho = np.concatenate([np.full(len(p), i, np.int32)
                           for i, p in enumerate(xho)])

    spec, params = build_patch_cnn(21, 3, seed=5, size="small")
    trainer = Trainer(spec, params, learning_rate=2e-3)
    losses = trainer.fit(x, y, epochs=3, batch_size=128, shuffle_seed=1)
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    acc = trainer.evaluate(x_ho, y_ho)
    assert acc > 0.85, acc  # chance = 1/3

    # deploy: the registry stem for the smn engine
    trainer.export_model(os.path.join(d, "keras_speech_music_noise_cnn.npz"))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        seg = Segmenter(vad_engine="smn", detect_gender=False, ffmpeg=None,
                        allow_download=False)
    assert not [x for x in w if "SYNTHETIC" in str(x.message)], \
        "trained weights must not raise the synthetic stand-in warning"

    regions = [("music", 101), ("speech", 102), ("noise", 103)]
    sig = np.concatenate([_sig_of(k, 12.0, s) for k, s in regions])
    wav = str(tmp_path / "mix.wav")
    write_wav(wav, np.clip(np.rint(sig * 32768.0), -32768,
                           32767).astype(np.int16), 16000)
    csv = str(tmp_path / "mix.csv")
    dur, n_ok, _, _ = seg.batch_process([wav], [csv])
    assert n_ok == 1

    import pandas as pd

    lseg = [tuple(r) for r in pd.read_csv(csv, sep="\t").itertuples(
        index=False)]
    for i, (kind, _) in enumerate(regions):
        got = _dominant_label(lseg, 12.0 * i + 1.5, 12.0 * (i + 1) - 1.5)
        assert got == kind, (kind, got, lseg)


def test_checkpoint_roundtrip_extensionless_path(tmp_path):
    """save_checkpoint/restore_checkpoint accept the SAME extension-less
    path (np.savez appends .npz, np.load does not)."""
    from inaspeechsegmenter_tpu.models.synthetic import build_patch_cnn
    from inaspeechsegmenter_tpu.train import Trainer

    spec, params = build_patch_cnn(21, 3, seed=0, size="small")
    t = Trainer(spec, params, learning_rate=1e-3)
    p = str(tmp_path / "ckpt")
    t.save_checkpoint(p)
    t.restore_checkpoint(p)
