"""train/data.py — labeled patch datasets from annotated media.

Exactness checks are built on constructed annotations where every patch's
true class is known from its time span.
"""

import numpy as np
import pytest

from inaspeechsegmenter_tpu.export import seg2csv
from inaspeechsegmenter_tpu.train import class_weights, patch_dataset
from inaspeechsegmenter_tpu.train.data import ENGINES

SR = 16000


def _sig(seconds, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(int(seconds * SR)) * 0.1).astype(np.float32)


def test_two_region_labels_and_times():
    sig = _sig(12.0)
    annot = [("speech", 0.0, 6.0), ("music", 6.0, 12.0)]
    x, y, times = patch_dataset([(sig, annot)], engine="smn",
                                return_times=True)
    assert x.shape[1:] == (68, 21, 1) and x.dtype == np.float32
    assert set(np.unique(y)) <= {0, 1}          # speech=0, music=1 (smn order)
    # label matches the patch's own time span (patch = 0.68 s window)
    for lab, (fidx, center) in zip(y, times):
        assert fidx == 0
        if center < 6.0 - 0.34:
            assert lab == 0, center
        elif center > 6.0 + 0.34:
            assert lab == 1, center
    # per-patch normalization: each patch is ~zero-mean unit-std
    flat = x.reshape(len(x), -1)
    np.testing.assert_allclose(flat.mean(axis=1), 0.0, atol=1e-4)
    np.testing.assert_allclose(flat.std(axis=1), 1.0, atol=1e-3)


def test_min_coverage_drops_boundary_straddlers():
    sig = _sig(12.0, seed=1)
    annot = [("speech", 0.0, 6.0), ("music", 6.0, 12.0)]
    _, _, times = patch_dataset([(sig, annot)], engine="smn",
                                min_coverage=1.0, return_times=True)
    # with full coverage required, no kept patch may touch the boundary
    centers = times[:, 1]
    assert not np.any((centers > 6.0 - 0.34) & (centers < 6.0 + 0.34))
    # lower coverage keeps more patches
    x_lo, _ = patch_dataset([(sig, annot)], engine="smn", min_coverage=0.6)
    assert len(x_lo) > len(centers)


def test_vad_alias_and_unlabeled_regions():
    sig = _sig(10.0, seed=2)
    # male/female count as speech for the VAD engines; noEnergy trains nothing
    annot = [("male", 0.0, 4.0), ("noEnergy", 4.0, 7.0),
             ("female", 7.0, 10.0)]
    x, y, times = patch_dataset([(sig, annot)], engine="smn",
                                min_coverage=1.0, return_times=True)
    assert len(x) and set(np.unique(y)) == {0}   # all mapped to speech
    assert not np.any((times[:, 1] > 4.34) & (times[:, 1] < 6.66))


def test_gender_engine_classes_and_nmel():
    sig = _sig(10.0, seed=3)
    annot = [("female", 0.0, 4.0), ("music", 4.0, 6.0), ("male", 6.0, 10.0)]
    x, y, times = patch_dataset([(sig, annot)], engine="gender",
                                min_coverage=1.0, return_times=True)
    assert x.shape[1:] == (68, 24, 1)            # gender consumes 24 mels
    classes, _ = ENGINES["gender"]
    assert classes == ("female", "male")
    for lab, (_, center) in zip(y, times):
        assert lab == (0 if center < 4.0 else 1)
    assert not np.any((times[:, 1] > 4.0) & (times[:, 1] < 6.0))


def test_csv_annotation_and_stride(tmp_path):
    sig = _sig(8.0, seed=4)
    annot = [("speech", 0.0, 8.0)]
    p = str(tmp_path / "a.csv")
    seg2csv(annot, p)
    x1, y1 = patch_dataset([(sig, p)], engine="smn")
    x_mem, _ = patch_dataset([(sig, annot)], engine="smn")
    np.testing.assert_array_equal(x1, x_mem)     # csv == in-memory
    x2, _ = patch_dataset([(sig, p)], engine="smn", stride=2)
    assert abs(len(x2) - (len(x1) + 1) // 2) <= 1


def test_short_and_empty_files_skip_with_warning():
    short = _sig(0.3, seed=5)                    # < 68 frames
    ok = _sig(4.0, seed=6)
    with pytest.warns(UserWarning, match="skipped"):
        x, y = patch_dataset([(short, [("speech", 0.0, 0.3)]),
                              (ok, [("speech", 0.0, 4.0)])], engine="smn")
    assert len(x) > 0
    # annotation with no target class at all -> contributes nothing
    with pytest.warns(UserWarning, match="contributed nothing"):
        x, y = patch_dataset([(ok, [("noEnergy", 0.0, 4.0)])], engine="smn")
    assert len(x) == 0 and x.shape[1:] == (68, 21, 1)


def test_unknown_engine_rejected():
    with pytest.raises(ValueError, match="unknown engine"):
        patch_dataset([], engine="bogus")


def test_class_weights_exact():
    w = class_weights(np.array([0, 0, 0, 1]), 2)
    np.testing.assert_allclose(w, [0.5, 1.5])    # mean 1, inverse frequency
    w = class_weights(np.array([0, 0, 1, 1]), 3)
    np.testing.assert_allclose(w, [1.0, 1.0, 0.0])   # absent class -> 0


def test_trainer_class_weight_changes_loss():
    from inaspeechsegmenter_tpu.models.synthetic import build_patch_cnn
    from inaspeechsegmenter_tpu.train import Trainer

    spec, params = build_patch_cnn(21, 3, seed=0, size="small")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 68, 21, 1)).astype(np.float32)
    y = np.array([0] * 6 + [1] * 2, np.int32)

    base = Trainer(spec, params, learning_rate=0.0)
    ones = Trainer(spec, params, learning_rate=0.0,
                   class_weight=np.ones(3, np.float32))
    wtd = Trainer(spec, params, learning_rate=0.0,
                  class_weight=class_weights(y, 3))
    l0, l1, l2 = (t.train_step(x, y) for t in (base, ones, wtd))
    assert l0 == pytest.approx(l1, rel=1e-6)     # all-ones == unweighted
    assert l2 != pytest.approx(l0, rel=1e-4)     # reweighting changes loss


def test_dataset_trains():
    """Integration: annotated-corpus patches flow into Trainer.fit."""
    from inaspeechsegmenter_tpu.models.synthetic import build_patch_cnn
    from inaspeechsegmenter_tpu.train import Trainer

    rng = np.random.default_rng(7)
    t = np.arange(6 * SR, dtype=np.float32) / SR
    tone = (np.sin(2 * np.pi * 440 * t) * 0.2).astype(np.float32)
    noise = (rng.standard_normal(6 * SR) * 0.1).astype(np.float32)
    pairs = [(tone, [("music", 0.0, 6.0)]), (noise, [("noise", 0.0, 6.0)])]
    x, y = patch_dataset(pairs, engine="smn", stride=3)
    assert set(np.unique(y)) == {1, 2}
    spec, params = build_patch_cnn(21, 3, seed=1, size="small")
    trainer = Trainer(spec, params, learning_rate=2e-3)
    losses = trainer.fit(x, y, epochs=2, batch_size=64, shuffle_seed=0)
    assert losses[-1] < losses[0]
