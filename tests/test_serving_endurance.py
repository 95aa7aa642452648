"""Serving endurance: long-corpus steady state has no per-file leaks.

The framework is meant for corpus-scale production serving (SURVEY.md §2
#13/#20: the reference farms thousands of files through one long-lived
`Segmenter`, reference pyro_client.py:64-74).  A long-lived server must
reach a steady state: after the first batch compiles the bucket programs,
processing MORE same-shaped files must not
* compile anything new (jit cache growth == recompile tax on every file),
* accumulate device buffers (leaked per-file feature/emission arrays
  would OOM the HBM long before a corpus ends), or
* grow the Python heap per file (status tuples and csv paths are the
  only per-file state the API keeps, and the caller owns those).

These are exact counters, not timing, so the test is deterministic.
"""

import gc
import tracemalloc

import numpy as np
import pytest


def _jit_cache_sizes(*objs):
    """Compiled-program cache sizes of every jitted callable hanging off
    the given objects (attribute walk: the pipeline/frontend keep their
    jits as instance attributes, some lazily None until first use)."""
    sizes = {}
    for obj in objs:
        for name in dir(obj):
            if name.startswith("__"):
                continue
            try:
                v = getattr(obj, name)
            except Exception:
                continue
            cs = getattr(v, "_cache_size", None)
            if callable(cs):
                try:
                    sizes[f"{type(obj).__name__}.{name}"] = cs()
                except Exception:
                    pass
    return sizes


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """16 two-second PCM16 files with varied content (noise bursts /
    tones / silence) — same length, so they share one bucket's compiled
    programs, like a homogeneous broadcast corpus."""
    from inaspeechsegmenter_tpu.audio import write_wav

    d = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    files = []
    for i in range(16):
        n = 2 * 16000
        sig = np.zeros(n, np.float32)
        kind = i % 3
        if kind == 0:
            sig = rng.standard_normal(n).astype(np.float32) * 0.1
        elif kind == 1:
            t = np.arange(n, dtype=np.float32) / 16000.0
            sig = (np.sin(2 * np.pi * 220.0 * (i + 1) * t) * 0.2
                   ).astype(np.float32)
        pcm = np.clip(np.rint(sig * 32768.0), -32768, 32767).astype(np.int16)
        p = str(d / f"f{i:02d}.wav")
        write_wav(p, pcm, 16000)
        files.append(p)
    return files


def test_long_corpus_steady_state(synthetic_model_dir, corpus, tmp_path):
    import jax

    from inaspeechsegmenter_tpu import Segmenter

    seg = Segmenter(vad_engine="smn", detect_gender=True, ffmpeg=None,
                    allow_download=False)

    def run(tag, files):
        outs = [str(tmp_path / f"{tag}_{i}.csv") for i in range(len(files))]
        _, n_ok, _, lmsg = seg.batch_process(files, outs)
        assert n_ok == len(files), lmsg
        return outs

    # pass 1: compiles the bucket programs, uploads params, warms caches
    run("warm", corpus[:8])
    gc.collect()
    base_sizes = _jit_cache_sizes(seg.pipeline, seg.frontend)
    assert sum(base_sizes.values()) > 0          # the walk found the jits
    base_live = len(jax.live_arrays())

    tracemalloc.start()
    snap0 = tracemalloc.take_snapshot()
    # pass 2: steady state — 8 more files of the same shape
    run("steady", corpus[8:])
    gc.collect()
    snap1 = tracemalloc.take_snapshot()
    tracemalloc.stop()

    # no recompiles: same-bucket files reuse every compiled program
    steady_sizes = _jit_cache_sizes(seg.pipeline, seg.frontend)
    assert steady_sizes == base_sizes, (
        f"jit caches grew during steady-state serving: "
        f"{base_sizes} -> {steady_sizes}")

    # no device-buffer accumulation: per-file arrays must all be released
    # (a handful of slack covers donation scratch + codec staging that
    # floats between runs, NOT per-file growth: 8 files x >=6 arrays each
    # would trip this immediately)
    grow = len(jax.live_arrays()) - base_live
    assert grow <= 6, (
        f"{grow} device arrays accumulated over 8 steady-state files "
        f"(base {base_live})")

    # bounded Python-heap growth (not per-file: 8 MiB would be ~1 MiB per
    # 2 s file, orders above what the status tuples can justify)
    heap = sum(st.size_diff for st in snap1.compare_to(snap0, "filename"))
    assert heap < (8 << 20), (
        f"python heap grew {heap / 1e6:.1f} MB over 8 steady-state files")


def test_repeat_calls_share_one_program_set(synthetic_model_dir, corpus):
    """Single-file serving (`seg(path)` in a loop — the farm client's
    inner shape) must also be compile-stable and leak-free."""
    import jax

    from inaspeechsegmenter_tpu import Segmenter

    seg = Segmenter(vad_engine="smn", detect_gender=True, ffmpeg=None,
                    allow_download=False)
    first = seg(corpus[0])
    assert first  # non-empty timeline
    gc.collect()
    base_sizes = _jit_cache_sizes(seg.pipeline, seg.frontend)
    base_live = len(jax.live_arrays())
    for p in corpus[1:6]:
        assert seg(p)
    gc.collect()
    assert _jit_cache_sizes(seg.pipeline, seg.frontend) == base_sizes
    assert len(jax.live_arrays()) - base_live <= 4
