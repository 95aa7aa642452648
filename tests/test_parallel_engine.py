"""Data-parallel engine on the 8-device virtual CPU mesh: sharded batched
segmentation must equal single-file results exactly."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def seg(synthetic_model_dir):
    from inaspeechsegmenter_tpu import Segmenter

    return Segmenter(vad_engine="smn", detect_gender=True, ffmpeg=None,
                     allow_download=False)


def test_mesh_has_8_devices():
    import jax

    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_engine_matches_single(seg, media_dir):
    from inaspeechsegmenter_tpu.parallel import ParallelEngine

    engine = ParallelEngine(seg)
    files = [f"{media_dir}/musanmix.wav", f"{media_dir}/lamartine.wav",
             f"{media_dir}/silence2sec.wav"]
    feats = [seg._media2feats(f, None, None) for f in files]
    batched = engine.segment_many(feats)
    for f, ids in zip(files, batched):
        single = seg(f)
        from inaspeechsegmenter_tpu.pipeline import rle

        got = [(seg.labels[lab], start * .02, stop * .02)
               for lab, start, stop in rle(ids)]
        assert got == single, f


@pytest.mark.slow
def test_engine_batch_process(seg, media_dir, tmp_path):
    from inaspeechsegmenter_tpu.parallel import ParallelEngine

    engine = ParallelEngine(seg)
    inputs = [f"{media_dir}/silence2sec.wav", f"{media_dir}/musanmix.wav",
              "/nope.wav"]
    outputs = [str(tmp_path / "s.csv"), str(tmp_path / "m.csv"),
               str(tmp_path / "n.csv")]
    dur, n_ok, avg, msgs = engine.batch_process(inputs, outputs)
    assert n_ok == 2
    assert sorted(m[1] for m in msgs) == [0, 0, 2]
    with open(outputs[0]) as f:
        assert f.read() == "labels\tstart\tstop\nnoEnergy\t0.0\t1.98\n"
    # engine output must byte-match the single-file path
    seg.batch_process([inputs[1]], [str(tmp_path / "m_single.csv")])
    assert (tmp_path / "m.csv").read_text() == \
        (tmp_path / "m_single.csv").read_text()


def test_engine_batch_process_single_file(seg, media_dir, tmp_path):
    """One todo file routes through the sequence-parallel timeline shard;
    csv must byte-match the single-device path and status tuples keep the
    reference contract (including a skipped slot)."""
    from inaspeechsegmenter_tpu.parallel import ParallelEngine

    engine = ParallelEngine(seg)
    inputs = [f"{media_dir}/musanmix.wav", f"{media_dir}/silence2sec.wav"]
    outputs = [str(tmp_path / "m.csv"), str(tmp_path / "skip.csv")]
    (tmp_path / "skip.csv").write_text("preexisting\n")
    _, n_ok, _, msgs = engine.batch_process(inputs, outputs,
                                            skipifexist=True)
    assert n_ok == 1
    assert [m[1] for m in msgs] == [0, 1]
    seg.batch_process([inputs[0]], [str(tmp_path / "m_single.csv")])
    assert (tmp_path / "m.csv").read_text() == \
        (tmp_path / "m_single.csv").read_text()
    # error containment: a sole missing file reports status 2, no export
    _, n_ok, _, msgs = engine.batch_process(
        ["/nope.wav"], [str(tmp_path / "n.csv")])
    assert n_ok == 0 and msgs[0][1] == 2
    assert not (tmp_path / "n.csv").exists()
    # export-phase containment: dst is a DIRECTORY -> status 2 for that
    # file, the rest of the batch still lands (farm keeps going)
    bad = tmp_path / "isdir.csv"
    bad.mkdir()
    _, n_ok, _, msgs = engine.batch_process(
        [f"{media_dir}/silence2sec.wav", f"{media_dir}/silence2sec.wav"],
        [str(bad), str(tmp_path / "good.csv")])
    assert [m[1] for m in msgs] == [2, 0] and n_ok == 1
    assert (tmp_path / "good.csv").read_text().startswith("labels")


def _feat(rng, rows, t):
    import jax.numpy as jnp

    mspec = rng.standard_normal((rows, 24)).astype(np.float32)
    loge = rng.standard_normal(rows).astype(np.float32)
    return jnp.asarray(mspec), jnp.asarray(loge), t, 0


def _check_ids(seg, feats, ids):
    for (mspec, loge, t, _), got in zip(feats, ids):
        n20 = (t + 1) // 2
        want = np.asarray(seg.pipeline.run(
            seg.vad.model.params, seg.gender.model.params,
            mspec, loge, t, t, n20))[:n20]
        np.testing.assert_array_equal(got, want)


def test_ragged_tail_reuses_batched_program(seg, monkeypatch):
    """n_dev+1 same-bucket files: the 1-file tail group must stay on the
    batched program its bucket's full group already compiled (copy-padded
    mesh) — a timeline shard there would compile a second program for the
    same bucket — and labels must equal the single-device program."""
    from inaspeechsegmenter_tpu.parallel import ParallelEngine

    engine = ParallelEngine(seg)
    rng = np.random.default_rng(3)
    feats = [_feat(rng, 2048, 2048 - 40 - i)
             for i in range(engine.n_dev + 1)]
    monkeypatch.setattr(
        seg.pipeline, "run_sharded",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("sharded")))
    ids = engine.segment_many(feats)
    _check_ids(seg, feats, ids)


def test_lone_bucket_file_uses_timeline_shard(seg, monkeypatch):
    """A file that is ALONE in its length bucket has no batched program to
    share — it routes through the sequence-parallel timeline shard; labels
    equal the single-device program for every file either way."""
    from inaspeechsegmenter_tpu.parallel import ParallelEngine

    engine = ParallelEngine(seg)
    rng = np.random.default_rng(4)
    feats = [_feat(rng, 2048, 2048 - 40 - i)
             for i in range(engine.n_dev)]
    feats.append(_feat(rng, 4096, 4096 - 40))  # lone 4096-row bucket

    calls = []
    real = seg.pipeline.run_sharded
    monkeypatch.setattr(
        seg.pipeline, "run_sharded",
        lambda *a, **k: (calls.append(1), real(*a, **k))[1])
    ids = engine.segment_many(feats)
    assert len(calls) == 1  # exactly the lone-bucket file
    _check_ids(seg, feats, ids)


def test_corpus_tail_batch_process_stays_batched(seg, media_dir, tmp_path,
                                                 monkeypatch):
    """batch_process on a multi-file corpus never timeline-shards its
    ragged tail batch (shard_single_file=False): the batched program
    family serves the whole corpus."""
    from inaspeechsegmenter_tpu.parallel import ParallelEngine

    engine = ParallelEngine(seg)
    monkeypatch.setattr(
        seg.pipeline, "run_sharded",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("sharded")))
    n = engine.n_dev + 1
    inputs = [f"{media_dir}/silence2sec.wav"] * n
    outputs = [str(tmp_path / f"o{i}.csv") for i in range(n)]
    _, n_ok, _, _ = engine.batch_process(inputs, outputs)
    assert n_ok == n
    assert (tmp_path / f"o{n - 1}.csv").read_text() == \
        (tmp_path / "o0.csv").read_text()


def test_single_device_mesh_keeps_fused_path(seg, monkeypatch):
    """On a 1-device mesh every group has one file; those must stay on the
    plain fused batch-of-1 program (run_sharded would be pure overhead)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from inaspeechsegmenter_tpu.parallel import ParallelEngine

    engine = ParallelEngine(
        seg, mesh=Mesh(np.array(jax.devices()[:1]), ("data",)))
    assert engine.n_dev == 1
    monkeypatch.setattr(
        seg.pipeline, "run_sharded",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("sharded")))
    rng = np.random.default_rng(5)
    rows, t = 2048, 2000
    mspec = rng.standard_normal((rows, 24)).astype(np.float32)
    loge = rng.standard_normal(rows).astype(np.float32)
    ids = engine.segment_many([(jnp.asarray(mspec), jnp.asarray(loge), t, 0)])
    n20 = (t + 1) // 2
    want = np.asarray(seg.pipeline.run(
        seg.vad.model.params, seg.gender.model.params,
        jnp.asarray(mspec), jnp.asarray(loge), t, t, n20))[:n20]
    np.testing.assert_array_equal(ids[0], want)


def test_engine_status_order_with_skips(seg, media_dir, tmp_path):
    """Status tuples keep input order even when skipifexist skips some
    entries in the middle (reference contract: positional zip)."""
    from inaspeechsegmenter_tpu.parallel import ParallelEngine

    engine = ParallelEngine(seg)
    inputs = [f"{media_dir}/silence2sec.wav", f"{media_dir}/silence2sec.wav",
              "/nope.wav", f"{media_dir}/silence2sec.wav"]
    outputs = [str(tmp_path / f"o{i}.csv") for i in range(4)]
    (tmp_path / "o1.csv").write_text("preexisting\n")
    _, n_ok, _, msgs = engine.batch_process(inputs, outputs,
                                            skipifexist=True)
    assert n_ok == 2
    assert [m[1] for m in msgs] == [0, 1, 2, 0]
    assert [m[0] for m in msgs] == outputs
    assert (tmp_path / "o1.csv").read_text() == "preexisting\n"


def test_one_device_mesh_uses_fused_program(seg, media_dir):
    """On a 1-device mesh there is nothing to shard: __call__ must route
    to the plain fused program (shared with segment_many/batch_process)
    instead of compiling a dedicated shard_map chunk program + streaming
    tail that buys zero parallelism."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from inaspeechsegmenter_tpu.parallel import ParallelEngine

    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    engine = ParallelEngine(seg, mesh=mesh)

    def boom(*a, **k):
        raise AssertionError("run_sharded dispatched on a 1-device mesh")

    engine.seg.pipeline.run_sharded = boom
    out = engine(f"{media_dir}/silence2sec.wav")
    assert out == seg(f"{media_dir}/silence2sec.wav")
