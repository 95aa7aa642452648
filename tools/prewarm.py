"""Pre-compile every pipeline bucket into the persistent XLA cache.

Production first-request latency on TPU is dominated by XLA compiles (minutes
per bucket on some hosts). This tool walks the bucket ladder up to
--max-hours of audio and compiles the frontend + fused programs for the
chosen engine configs, so serving processes start hot.

Usage: python tools/prewarm.py [--max-hours 2] [--engines smn,smn+gender]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-hours", type=float, default=1.5)
    ap.add_argument("--engines", default="smn+gender",
                    help="comma list of sm|smn[+gender]")
    args = ap.parse_args()

    from inaspeechsegmenter_tpu.utils.cache import enable_compilation_cache
    from inaspeechsegmenter_tpu.utils.env import apply_platform_env

    apply_platform_env()   # honor JAX_PLATFORMS over sitecustomize hooks
    enable_compilation_cache()

    import numpy as np

    from inaspeechsegmenter_tpu import Segmenter
    from inaspeechsegmenter_tpu.dsp.sidekit import CHUNK, HOP, WIN
    from inaspeechsegmenter_tpu.pipeline import bucket_chunks

    # enumerate ladder buckets up to max-hours
    max_frames = int(args.max_hours * 3600 * 100)
    buckets = []
    n = 1
    while n * CHUNK < max_frames + CHUNK:
        b = bucket_chunks(n)
        if b not in buckets:
            buckets.append(b)
        n = b + 1
    print("buckets (chunks):", buckets)

    for engine_spec in args.engines.split(","):
        engine = engine_spec.replace("+gender", "")
        gender = "+gender" in engine_spec
        seg = Segmenter(vad_engine=engine, detect_gender=gender, ffmpeg=None)
        for b in buckets:
            t0 = time.time()
            n_samples = (b * CHUNK - 1) * HOP + WIN
            sig = np.zeros(n_samples, np.int16)
            sig[::100] = 1000
            mspec, loge, t = seg.frontend.mspec_loge(
                sig, pad_frames_to=b * CHUNK)
            seg._fused_segment(mspec, loge, t, 0, 0)
            # the default single-file path is STREAMING (per-chunk CNN
            # programs + tail) — warm those programs too, or the first
            # serving request still compiles for minutes
            seg.segment_signal(sig)
            print(f"{engine_spec} bucket {b}: {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
