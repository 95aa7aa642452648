"""Sequence-parallel single-file decode (pipeline.run_sharded) on the
8-device virtual CPU mesh: labels must equal the single-device fused
program exactly — the chunk decomposition is the streaming one, so the
only new behavior under test is the sharded dispatch, the chunk-count
padding, and the chunk-0 left-edge repair."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def seg(synthetic_model_dir):
    from inaspeechsegmenter_tpu import Segmenter

    return Segmenter(vad_engine="smn", detect_gender=True, ffmpeg=None,
                     allow_download=False)


@pytest.fixture(scope="module")
def engine(seg):
    from inaspeechsegmenter_tpu.parallel import ParallelEngine

    return ParallelEngine(seg)


def _random_feats(rng, t, nmel=24):
    """Synthetic (mspec, loge) with silence stretches so every label path
    (noEnergy / vad / gender) is exercised."""
    mspec = rng.standard_normal((t, nmel)).astype(np.float32)
    loge = rng.standard_normal(t).astype(np.float32)
    loge[: t // 5] = -20.0          # leading silence
    loge[t // 2: t // 2 + t // 10] = -20.0
    return mspec, loge


@pytest.mark.parametrize("t", [5000,          # 2 chunks < 8 devices
                               40000])        # 10 chunks > 8 devices
def test_sharded_equals_fused(seg, engine, rng, t):
    import jax.numpy as jnp

    from inaspeechsegmenter_tpu.pipeline import bucket_chunks
    from inaspeechsegmenter_tpu.dsp.sidekit import CHUNK
    from inaspeechsegmenter_tpu.segmenter import patch_counts

    mspec, loge = _random_feats(rng, t)
    bucket = bucket_chunks(-(-t // CHUNK)) * CHUNK
    mspec_pad = np.zeros((bucket, 24), np.float32)
    mspec_pad[:t] = mspec
    loge_pad = np.full(bucket, -np.inf, np.float32)
    loge_pad[:t] = loge
    n_frames_patch, n20 = patch_counts(t, 0)

    vp = seg.vad.model.params
    gp = seg.gender.model.params
    want = np.asarray(seg.pipeline.run(
        vp, gp, jnp.asarray(mspec_pad), jnp.asarray(loge_pad),
        t, n_frames_patch, n20))[:n20]
    got = np.asarray(seg.pipeline.run_sharded(
        vp, gp, jnp.asarray(mspec_pad), jnp.asarray(loge_pad),
        t, n_frames_patch, n20, engine.mesh))[:n20]
    np.testing.assert_array_equal(got, want)


def test_sharded_sub_chunk_rows(seg, engine, rng):
    """Feature arrays shorter than one CHUNK (the dryrun's 2048-row case):
    one real chunk padded across all 8 devices."""
    import jax.numpy as jnp

    from inaspeechsegmenter_tpu.segmenter import patch_counts

    rows, t = 2048, 2048 - 100
    mspec, loge = _random_feats(rng, rows)
    loge[t:] = -np.inf
    n_frames_patch, n20 = patch_counts(t, 0)
    vp, gp = seg.vad.model.params, seg.gender.model.params
    want = np.asarray(seg.pipeline.run(
        vp, gp, jnp.asarray(mspec), jnp.asarray(loge),
        t, n_frames_patch, n20))[:n20]
    got = np.asarray(seg.pipeline.run_sharded(
        vp, gp, jnp.asarray(mspec), jnp.asarray(loge),
        t, n_frames_patch, n20, engine.mesh))[:n20]
    np.testing.assert_array_equal(got, want)


def test_sharded_no_gender(synthetic_model_dir, engine, rng):
    """detect_gender=False pipeline (g_params=None) through the sharded
    path."""
    import jax.numpy as jnp

    from inaspeechsegmenter_tpu import Segmenter
    from inaspeechsegmenter_tpu.dsp.sidekit import CHUNK
    from inaspeechsegmenter_tpu.segmenter import patch_counts

    seg = Segmenter(vad_engine="smn", detect_gender=False, ffmpeg=None,
                    allow_download=False)
    t = CHUNK * 3 - 77
    mspec, loge = _random_feats(rng, t)
    bucket = CHUNK * 4
    mspec_pad = np.zeros((bucket, 24), np.float32)
    mspec_pad[:t] = mspec
    loge_pad = np.full(bucket, -np.inf, np.float32)
    loge_pad[:t] = loge
    n_frames_patch, n20 = patch_counts(t, 0)
    want = np.asarray(seg.pipeline.run(
        seg.vad.model.params, None, jnp.asarray(mspec_pad),
        jnp.asarray(loge_pad), t, n_frames_patch, n20))[:n20]
    got = np.asarray(seg.pipeline.run_sharded(
        seg.vad.model.params, None, jnp.asarray(mspec_pad),
        jnp.asarray(loge_pad), t, n_frames_patch, n20, engine.mesh))[:n20]
    np.testing.assert_array_equal(got, want)


def test_sharded_short_media_difflen(seg, engine, rng):
    """t < 68 frames (difflen > 0): the one branch where the replicate
    left-edge repair and _fix_right_edge overlap (a single patch row
    covers the whole file) — via the user-level feats contract."""
    with pytest.warns(UserWarning, match="duration is short"):
        sig = (rng.standard_normal(8000) * 3000).astype(np.int16)  # 0.5 s
        feats = seg._sig2feats(sig, "<short>")
    assert feats[3] > 0  # difflen: the 68-frame pad path is exercised
    want = seg._fused_segment(*feats, 0)
    got = engine.segment_feats_sharded(*feats, 0)
    assert got == want


def test_engine_call_matches_segmenter(seg, engine, media_dir):
    """User surface: engine(file) == seg(file), including non-finite
    feature frames (real media) and the short-file pad path."""
    for f in ("musanmix.wav", "silence2sec.wav"):
        assert engine(f"{media_dir}/{f}") == seg(f"{media_dir}/{f}"), f


def test_sharded_start_sec_offset(seg, engine, media_dir):
    """start_sec offsets the lseg times exactly like the single-device
    path (times computed host-side from the same frame indices)."""
    feats = seg._media2feats(f"{media_dir}/musanmix.wav", None, None)
    base = engine.segment_feats_sharded(*feats, 0)
    off = engine.segment_feats_sharded(*feats, 7.5)
    assert off == [(lab, a + 7.5, b + 7.5) for lab, a, b in base]


def test_sharded_nondivisor_mesh_equals_fused(seg, rng):
    """run_sharded on a mesh whose device count (5) does not divide the
    chunk count: the ceil-per-device padding must still reproduce the
    fused program exactly."""
    import jax.numpy as jnp

    from inaspeechsegmenter_tpu.dsp.sidekit import CHUNK
    from inaspeechsegmenter_tpu.parallel.mesh import make_mesh
    from inaspeechsegmenter_tpu.pipeline import bucket_chunks
    from inaspeechsegmenter_tpu.segmenter import patch_counts

    t = 3 * CHUNK - 77                       # 3 chunks over 5 devices
    mspec, loge = _random_feats(rng, t)
    bucket = bucket_chunks(-(-t // CHUNK)) * CHUNK
    mspec_pad = np.zeros((bucket, 24), np.float32)
    mspec_pad[:t] = mspec
    loge_pad = np.full(bucket, -np.inf, np.float32)
    loge_pad[:t] = loge
    n_frames_patch, n20 = patch_counts(t, 0)

    vp = seg.vad.model.params
    gp = seg.gender.model.params
    want = np.asarray(seg.pipeline.run(
        vp, gp, jnp.asarray(mspec_pad), jnp.asarray(loge_pad),
        t, n_frames_patch, n20))[:n20]
    got = np.asarray(seg.pipeline.run_sharded(
        vp, gp, jnp.asarray(mspec_pad), jnp.asarray(loge_pad),
        t, n_frames_patch, n20, make_mesh(5)))[:n20]
    np.testing.assert_array_equal(got, want)
