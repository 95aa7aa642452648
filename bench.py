"""Benchmark: real-time factor of the fused segmentation pipeline on 1 chip.

Measures end-to-end device throughput (features + energy VAD + VAD CNN +
gender CNN + 3 Viterbi decodes, smn engine with gender) over one hour of
synthetic 16 kHz broadcast-style audio, with full-size CNN weights.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`value` is the real-time factor (audio seconds per wall second per chip);
the reference publishes no throughput numbers (SURVEY.md §6), so
`vs_baseline` is reported against the project north-star target of 500x
real time per chip (BASELINE.json).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def synth_audio(seconds, sr=16000, seed=0):
    """Broadcast-ish mix: speech-band noise bursts, tones, silence."""
    rng = np.random.default_rng(seed)
    n = seconds * sr
    sig = np.zeros(n, np.float32)
    pos = 0
    while pos < n:
        kind = rng.integers(0, 4)
        dur = int(rng.uniform(0.5, 8.0) * sr)
        end = min(pos + dur, n)
        t = np.arange(end - pos, dtype=np.float32) / sr
        if kind == 0:
            pass  # silence
        elif kind == 1:  # noise burst
            sig[pos:end] = rng.standard_normal(end - pos) * 0.1
        elif kind == 2:  # tone stack (music-ish)
            f0 = rng.uniform(100, 1000)
            sig[pos:end] = sum(np.sin(2 * np.pi * f0 * k * t)
                               for k in range(1, 4)) * 0.1
        else:  # modulated noise (speech-ish)
            env = 0.5 + 0.5 * np.sin(2 * np.pi * 4 * t)
            sig[pos:end] = rng.standard_normal(end - pos) * 0.15 * env
        pos = end
    return sig


def main():
    from inaspeechsegmenter_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    d = os.path.expanduser("~/.cache/inaspeechsegmenter_tpu")
    from inaspeechsegmenter_tpu.models.synthetic import install_synthetic_models

    install_synthetic_models(d, size="full")
    os.environ.setdefault("ISS_TPU_MODEL_DIR", d)

    from inaspeechsegmenter_tpu import Segmenter

    seconds = int(os.environ.get("ISS_BENCH_SECONDS", "3600"))
    seg = Segmenter(vad_engine="smn", detect_gender=True, ffmpeg=None,
                    allow_download=False)

    # PCM16 like real broadcast sources: int16 halves the device upload and
    # converts to identical float32 on device
    sig = np.clip(np.rint(synth_audio(seconds) * 32768.0),
                  -32768, 32767).astype(np.int16)

    def run():
        from inaspeechsegmenter_tpu.dsp.sidekit import frame_count, CHUNK
        from inaspeechsegmenter_tpu.pipeline import bucket_chunks

        t = frame_count(len(sig))
        bucket = bucket_chunks(max(1, -(-t // CHUNK))) * CHUNK
        mspec, loge, t = seg.frontend.mspec_loge(sig, pad_frames_to=bucket)
        return seg._fused_segment(mspec, loge, t, 0, 0)

    run()  # warmup: compile both programs for this bucket
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run()
        best = min(best, time.perf_counter() - t0)
    assert len(out) >= 1

    rtf = seconds / best
    print(json.dumps({
        "metric": "segmentation_realtime_factor_1chip",
        "value": round(rtf, 1),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 500.0, 3),
    }))


if __name__ == "__main__":
    main()
