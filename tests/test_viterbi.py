"""Viterbi decode parity vs the reference implementation."""

import numpy as np
import pytest

from inaspeechsegmenter_tpu.decode import (viterbi_decoding, viterbi_path,
                                           pred2logemission, log_trans_exp,
                                           diag_trans_exp)


@pytest.mark.smoke
def test_transition_builders(ref_viterbi_utils):
    np.testing.assert_allclose(pred2logemission([0, 1, 1, 0]),
                               ref_viterbi_utils.pred2logemission([0, 1, 1, 0]))
    np.testing.assert_allclose(log_trans_exp(150, cost0=-5),
                               ref_viterbi_utils.log_trans_exp(150, cost0=-5))
    np.testing.assert_allclose(diag_trans_exp(80, 3),
                               ref_viterbi_utils.diag_trans_exp(80, 3))


@pytest.mark.parametrize("k,t,seed", [(2, 50, 0), (2, 2000, 1), (3, 500, 2),
                                      (5, 300, 3), (2, 1, 4)])
def test_random_parity(ref_viterbi, k, t, seed):
    rng = np.random.default_rng(seed)
    em = np.log(rng.dirichlet(np.ones(k), size=t)).astype(np.float64)
    trans = diag_trans_exp(3, k)
    ours = viterbi_decoding(em, trans)
    theirs = ref_viterbi.viterbi_decoding(em, trans)
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.smoke
def test_energy_vad_style(ref_viterbi, ref_viterbi_utils):
    rng = np.random.default_rng(7)
    act = rng.random(3000) > 0.6
    em = pred2logemission(act)
    trans = log_trans_exp(150, cost0=-5)
    ours = viterbi_decoding(em, trans)
    theirs = ref_viterbi.viterbi_decoding(
        ref_viterbi_utils.pred2logemission(act),
        ref_viterbi_utils.log_trans_exp(150, cost0=-5))
    np.testing.assert_array_equal(ours, theirs)


def test_initial(ref_viterbi):
    rng = np.random.default_rng(11)
    em = np.log(rng.dirichlet(np.ones(3), size=100))
    trans = diag_trans_exp(2, 3)
    init = np.log([0.8, 0.1, 0.1])
    np.testing.assert_array_equal(
        viterbi_decoding(em, trans, initial=init),
        ref_viterbi.viterbi_decoding(em, trans, initial=init))


def test_consecutive(ref_viterbi):
    rng = np.random.default_rng(13)
    em = np.log(rng.dirichlet(np.ones(2), size=200))
    trans = diag_trans_exp(1, 2)
    for consec in (3, [2, 5]):
        ours = viterbi_decoding(em, trans, consecutive=consec)
        theirs = ref_viterbi.viterbi_decoding(em, trans, consecutive=consec)
        np.testing.assert_array_equal(ours, theirs.astype(int))


def test_constraints(ref_viterbi):
    rng = np.random.default_rng(17)
    t, k = 150, 3
    em = np.log(rng.dirichlet(np.ones(k), size=t))
    trans = diag_trans_exp(1, k)
    constraint = np.zeros((t, k))
    constraint[10:20, 0] = 1   # forbidden
    constraint[50, 2] = 2      # mandatory
    ours = viterbi_decoding(em, trans, constraint=constraint)
    theirs = ref_viterbi.viterbi_decoding(em, trans, constraint=constraint)
    np.testing.assert_array_equal(ours, theirs)


def test_reset_equals_per_segment_decode(ref_viterbi):
    """The fused reset-mask decode must equal independent per-segment decodes
    — the exact equivalence the pipeline relies on."""
    rng = np.random.default_rng(19)
    t, k = 400, 3
    em = np.log(rng.dirichlet(np.ones(k), size=t)).astype(np.float32)
    trans = diag_trans_exp(2, k)
    bounds = [0, 120, 121, 300, 400]
    reset = np.zeros(t, bool)
    for b in bounds[:-1]:
        reset[b] = True
    fused = np.asarray(viterbi_path(em, trans, reset=reset))
    per_seg = np.concatenate([
        ref_viterbi.viterbi_decoding(em[a:b], trans)
        for a, b in zip(bounds[:-1], bounds[1:])])
    np.testing.assert_array_equal(fused, per_seg)


def test_parallel_equals_sequential():
    """The log-depth associative-scan decode must match the sequential scan
    (including segment resets and renormalization)."""
    from inaspeechsegmenter_tpu.decode.viterbi import viterbi_path

    rng = np.random.default_rng(29)
    for t, k in [(64, 2), (1000, 3), (777, 4), (2, 2)]:
        em = np.log(rng.dirichlet(np.ones(k), size=t)).astype(np.float32)
        trans = diag_trans_exp(2, k)
        reset = np.zeros(t, bool)
        reset[rng.integers(0, t, size=4)] = True
        seq = np.asarray(viterbi_path(em, trans, reset=reset))
        par = np.asarray(viterbi_path(em, trans, reset=reset, parallel=True))
        np.testing.assert_array_equal(seq, par)


def test_blocked_equals_sequential():
    """The two-level blocked decode must match the sequential scan across
    block-boundary, padding, and reset cases (block size 256)."""
    from inaspeechsegmenter_tpu.decode.viterbi import viterbi_path

    rng = np.random.default_rng(31)
    for t, k in [(64, 2), (256, 3), (257, 2), (511, 3), (512, 2),
                 (1000, 3), (4096, 4), (2, 2)]:
        em = np.log(rng.dirichlet(np.ones(k), size=t)).astype(np.float32)
        trans = diag_trans_exp(2, k)
        reset = np.zeros(t, bool)
        reset[rng.integers(0, t, size=6)] = True
        seq = np.asarray(viterbi_path(em, trans, reset=reset))
        blk = np.asarray(viterbi_path(em, trans, reset=reset,
                                      parallel="blocked"))
        np.testing.assert_array_equal(seq, blk)


def test_long_sequence_float32_stability(ref_viterbi):
    """Renormalized f32 scan must track the f64 reference over long T."""
    rng = np.random.default_rng(23)
    t = 50_000
    em = np.log(rng.dirichlet(np.ones(2), size=t))
    trans = log_trans_exp(4)
    ours = viterbi_decoding(em, trans)
    theirs = ref_viterbi.viterbi_decoding(em, trans)
    agree = np.mean(ours == theirs)
    assert agree > 0.9999, agree
