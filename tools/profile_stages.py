"""Per-stage TPU timing: find where the pipeline time goes.

Usage: python tools/profile_stages.py [seconds_of_audio]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, n=3):
    fn()  # warmup/compile
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from inaspeechsegmenter_tpu.utils.cache import enable_compilation_cache
    from inaspeechsegmenter_tpu.utils.env import apply_platform_env

    apply_platform_env()   # honor JAX_PLATFORMS over sitecustomize hooks
    enable_compilation_cache()
    seconds = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    from inaspeechsegmenter_tpu.models.synthetic import ensure_synthetic_env

    ensure_synthetic_env(size="full")

    import jax
    import jax.numpy as jnp

    from bench import synth_audio
    from inaspeechsegmenter_tpu import Segmenter
    from inaspeechsegmenter_tpu.dsp.sidekit import frame_count, CHUNK
    from inaspeechsegmenter_tpu.pipeline import bucket_chunks

    print("backend:", jax.default_backend())
    seg = Segmenter(vad_engine="smn", detect_gender=True, ffmpeg=None,
                    allow_download=False)
    sig = synth_audio(seconds)
    t = frame_count(len(sig))
    bucket = bucket_chunks(max(1, -(-t // CHUNK))) * CHUNK
    print(f"audio {seconds}s  frames {t}  bucket {bucket}")

    # stage 1: features (jnp frontend)
    def feats():
        m, l, _ = seg.frontend.mspec_loge(sig, pad_frames_to=bucket)
        jax.block_until_ready((m, l))
        return m, l

    tf = timeit(feats)
    mspec, loge = feats()
    print(f"features(jnp): {tf*1e3:8.1f} ms  ({seconds/tf:8.0f}x RT)")

    # pallas frontend
    from inaspeechsegmenter_tpu.dsp.pallas_fe import PallasSidekitFrontend

    pfe = PallasSidekitFrontend()

    def pfeats():
        m, l, _ = pfe.mspec_loge(sig, pad_frames_to=bucket)
        jax.block_until_ready((m, l))

    try:
        tpf = timeit(pfeats)
        print(f"features(pal): {tpf*1e3:8.1f} ms  ({seconds/tpf:8.0f}x RT)")
    except Exception as exc:
        print("pallas frontend failed:", type(exc).__name__, str(exc)[:200])

    # host->device transfer of raw signal
    def upload():
        jax.block_until_ready(jnp.asarray(sig))

    tu = timeit(upload)
    print(f"sig upload:    {tu*1e3:8.1f} ms")

    pipe = seg.pipeline
    n20 = (t + 1) // 2

    # stage 2: energy viterbi only
    ev = jax.jit(lambda lg, nf: pipe._energy_states20(lg, nf))

    def energy():
        jax.block_until_ready(ev(loge, t))

    te = timeit(energy)
    print(f"energy vit:    {te*1e3:8.1f} ms")

    # stage 3: one CNN pass
    cnn = jax.jit(lambda p, m, nf: pipe._cnn_probs(
        pipe.vad_forward, p, m, nf, pipe.vad_nmel, pipe.vad_nout))

    def vadcnn():
        jax.block_until_ready(cnn(seg.vad.model.params, mspec, t))

    tc = timeit(vadcnn)
    print(f"vad cnn:       {tc*1e3:8.1f} ms")

    # stage 4: vad viterbi on random probs
    probs = jnp.asarray(
        np.random.default_rng(0).dirichlet(np.ones(3), bucket // 2),
        jnp.float32)
    mask = jnp.asarray(np.random.default_rng(1).random(bucket // 2) > 0.5)
    mv = jax.jit(lambda pr, mk, n: pipe._masked_viterbi(
        pr, mk, n, pipe.v_trans, pipe.v_init))

    def vadvit():
        jax.block_until_ready(mv(probs, mask, n20))

    tv = timeit(vadvit)
    print(f"vad viterbi:   {tv*1e3:8.1f} ms")

    # full fused
    def full():
        ids = pipe.run(seg.vad.model.params, seg.gender.model.params,
                       mspec, loge, t, t, n20)
        np.asarray(ids)

    tfull = timeit(full)
    print(f"fused full:    {tfull*1e3:8.1f} ms  ({seconds/tfull:8.0f}x RT)")

    total = tf + tfull
    print(f"end-to-end:    {total*1e3:8.1f} ms  ({seconds/total:8.0f}x RT)")


if __name__ == "__main__":
    main()
