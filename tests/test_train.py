"""Training on the 8-device virtual mesh: loss decreases, shardings apply."""

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
