"""Small-surface tests: bucket ladder, mesh helpers, spec utilities, cache."""

import numpy as np


def test_bucket_ladder_bounded():
    from inaspeechsegmenter_tpu.pipeline import bucket_chunks

    seen = set()
    for n in range(1, 2000):
        b = bucket_chunks(n)
        assert b >= n
        assert b <= 2 * n  # <=50% padding waste
        seen.add(b)
    assert len(seen) < 25  # bounded jit cache


def test_rle():
    from inaspeechsegmenter_tpu.pipeline import rle

    assert rle(np.array([0, 0, 1, 1, 1, 2])) == [(0, 0, 2), (1, 2, 5), (2, 5, 6)]
    assert rle(np.array([5])) == [(5, 0, 1)]
    assert rle(np.array([])) == []


def test_strip_final_softmax():
    from inaspeechsegmenter_tpu.models.keras_h5 import strip_final_softmax
    from inaspeechsegmenter_tpu.models.synthetic import build_patch_cnn

    spec, _ = build_patch_cnn(21, 3, size="small")
    assert spec["layers"][-1]["config"]["activation"] == "softmax"
    stripped = strip_final_softmax(spec)
    assert stripped["layers"][-1]["config"]["activation"] == "linear"
    # original untouched
    assert spec["layers"][-1]["config"]["activation"] == "softmax"


def test_mesh_helpers():
    import jax
    from jax.sharding import PartitionSpec as P

    from inaspeechsegmenter_tpu.parallel.mesh import (make_mesh, make_2d_mesh,
                                                      shard_batch, replicate)

    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())
    mesh2 = make_2d_mesh(data=4, model=2)
    assert dict(zip(mesh2.axis_names, mesh2.devices.shape)) == \
        {"data": 4, "model": 2}
    x = np.zeros((16, 3), np.float32)
    xs = shard_batch(mesh, x)
    assert xs.sharding.spec == P("data", None)
    tree = replicate(mesh, {"a": np.ones(4, np.float32)})
    assert tree["a"].sharding.spec == P()


def test_compilation_cache_config(tmp_path):
    from inaspeechsegmenter_tpu.utils.cache import enable_compilation_cache

    p = enable_compilation_cache(str(tmp_path / "cache"))
    import os

    assert os.path.isdir(p)


def test_frontend_env_selection(monkeypatch):
    from inaspeechsegmenter_tpu.segmenter import _default_frontend
    from inaspeechsegmenter_tpu.dsp.pallas_fe import PallasSidekitFrontend
    from inaspeechsegmenter_tpu.dsp.sidekit import SidekitFrontend

    monkeypatch.setenv("ISS_FRONTEND", "pallas")
    assert isinstance(_default_frontend(), PallasSidekitFrontend)
    monkeypatch.delenv("ISS_FRONTEND")
    assert isinstance(_default_frontend(), SidekitFrontend)


def test_per_stage_adjacent_same_label_segments(synthetic_model_dir,
                                                musanmix_sig):
    """The per-stage API decodes every lseg segment independently: two
    ADJACENT same-inlabel segments must give the same result as two
    separate calls (reference decodes per segment, segmenter.py:166-178)."""
    from inaspeechsegmenter_tpu import Segmenter

    seg = Segmenter(vad_engine="smn", detect_gender=False, ffmpeg=None)
    mspec, _ = seg.frontend.mspec_loge_np(musanmix_sig[: 16000 * 8])
    n20 = (len(mspec) + 1) // 2
    mid = n20 // 2
    split = seg.vad(mspec, [("energy", 0, mid), ("energy", mid, n20)])
    a = seg.vad(mspec, [("energy", 0, mid)])
    b = seg.vad(mspec, [("energy", mid, n20)])
    assert split == a + b


def test_media_too_short_clean_error(synthetic_model_dir, tmp_path):
    """Sub-frame media (<400 samples) raises an actionable ValueError, not
    a zero-size-reduction crash deep inside numpy."""
    import numpy as np
    import pytest

    from inaspeechsegmenter_tpu import Segmenter
    from inaspeechsegmenter_tpu.audio import write_wav

    p = str(tmp_path / "tiny.wav")
    write_wav(p, np.zeros(100, np.float32), 16000)
    seg = Segmenter(vad_engine="smn", detect_gender=False, ffmpeg=None)
    with pytest.raises(ValueError, match="too short"):
        seg(p)


def test_prefetch_depth_malformed_env(monkeypatch):
    """A malformed ISS_PREFETCH warns and falls back to the core-count
    default instead of aborting the whole corpus job at batch start."""
    import pytest

    from inaspeechsegmenter_tpu.utils.prefetch import prefetch_depth

    monkeypatch.setenv("ISS_PREFETCH", "4")
    assert prefetch_depth() == 4
    monkeypatch.setenv("ISS_PREFETCH", "auto")
    with pytest.warns(UserWarning, match="ISS_PREFETCH"):
        assert prefetch_depth() >= 1
    monkeypatch.setenv("ISS_PREFETCH", "")
    assert prefetch_depth() >= 1


def test_ensure_synthetic_env_respects_preset(monkeypatch, tmp_path):
    """A pre-set ISS_TPU_MODEL_DIR (real weights) short-circuits synthetic
    generation entirely."""
    from inaspeechsegmenter_tpu.models import synthetic

    real = tmp_path / "real_weights"
    real.mkdir()
    monkeypatch.setenv("ISS_TPU_MODEL_DIR", str(real))
    monkeypatch.setattr(synthetic, "install_synthetic_models",
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("generated stand-ins")))
    assert synthetic.ensure_synthetic_env(size="small") == str(real)


def test_link_probe_ttl_and_frontend_refresh(synthetic_model_dir,
                                             monkeypatch):
    """The link probe re-measures after its TTL, and refresh_frontend
    swaps the frontend only when the auto decision flips (never for an
    explicit ISS_FRONTEND)."""
    import inaspeechsegmenter_tpu.segmenter as S

    monkeypatch.setattr(S, "_LINK_MBPS", None)
    v1 = S._link_bandwidth_mbps()
    stamped = S._LINK_MBPS
    assert v1 == S._link_bandwidth_mbps() and S._LINK_MBPS is stamped
    # expired entry -> fresh probe (new stamp)
    monkeypatch.setattr(S, "_LINK_MBPS", (v1, stamped[1] - 1e6))
    S._link_bandwidth_mbps()
    assert S._LINK_MBPS[1] > stamped[1] - 1e5

    seg = S.Segmenter(vad_engine="smn", detect_gender=False, ffmpeg=None,
                      allow_download=False)
    fe = seg.frontend
    assert seg.refresh_frontend() is fe          # same decision: no swap
    monkeypatch.setenv("ISS_FRONTEND", "host")
    assert seg.refresh_frontend() is fe          # explicit choice: no-op
    monkeypatch.setenv("ISS_FRONTEND", "auto")

    from inaspeechsegmenter_tpu.dsp.host_fe import HostSidekitFrontend
    monkeypatch.setattr(S, "_default_frontend", lambda: HostSidekitFrontend())
    assert isinstance(seg.refresh_frontend(), HostSidekitFrontend)
