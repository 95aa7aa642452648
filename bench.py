"""Benchmark: real-time factor of the segmentation pipeline on 1 chip.

Measures the production batch workload (the reference's own headline path,
`batch_process`): one hour of synthetic 16 kHz broadcast-style audio split
across several WAV files, decoded, feature-extracted, and segmented with the
smn+gender engine and full-size CNN weights — host decode + upload of the
next file overlapping device compute of the current one, exactly as in
serving.

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
    from inaspeechsegmenter_tpu.utils.env import wait_for_device
    # the tunneled device link stalls for tens of minutes at a time: wait
    # (bounded) for it to answer instead of hanging the harness, and emit
    # a parseable record if it never does.  This must run BEFORE
    # enable_compilation_cache: the cache scopes per backend, which
    # initializes the backend and would itself hang on a dead link.
    state = os.path.expanduser(
        "~/.cache/inaspeechsegmenter_tpu/last_bench.json")
    if not wait_for_device(float(os.environ.get("ISS_BENCH_LINK_WAIT",
                                                "1800"))):
        rec = {"metric": "segmentation_realtime_factor_1chip",
               "value": 0, "unit": "x_realtime", "vs_baseline": 0,
               "error": "device link stalled; no measurement possible"}
        try:
            # context for the reader: clearly-labeled previous successful
            # measurement on this host (NOT a fresh number)
            with open(state) as fh:
                rec["last_successful_run"] = json.load(fh)
        except (OSError, ValueError):
            pass   # missing or corrupt state must not break the record
        print(json.dumps(rec))
        return
    enable_compilation_cache()
    # deterministic full-size synthetic stand-ins: the bench must measure
    # the same weights on every host.  ISS_TPU_MODEL_DIR is pointed at the
    # synthetic dir (which IS what resolves them — pre-set the var to bench
    # real weights instead)
    from inaspeechsegmenter_tpu.models.synthetic import ensure_synthetic_env

    ensure_synthetic_env(size="full")

    import tempfile

    from inaspeechsegmenter_tpu import Segmenter
    from inaspeechsegmenter_tpu.audio import write_wav

    seconds = int(os.environ.get("ISS_BENCH_SECONDS", "3600"))
    n_files = int(os.environ.get("ISS_BENCH_FILES", "3"))
    seg = Segmenter(vad_engine="smn", detect_gender=True, ffmpeg=None,
                    allow_download=False)

    # PCM16 WAV files like real broadcast sources (int16 halves the device
    # upload and converts to identical float32 on device)
    per_file = seconds // n_files
    tmp = tempfile.mkdtemp(prefix="iss_bench_")
    inputs = []
    for i in range(n_files):
        sig = np.clip(np.rint(synth_audio(per_file, seed=i) * 32768.0),
                      -32768, 32767).astype(np.int16)
        p = os.path.join(tmp, f"a{i}.wav")
        write_wav(p, sig, 16000)
        inputs.append(p)

    def run(tag):
        outs = [os.path.join(tmp, f"o{tag}_{i}.csv")
                for i in range(n_files)]
        dur, n_ok, _, _ = seg.batch_process(inputs, outs)
        assert n_ok == n_files
        return dur

    run("warm")  # compile the bucket programs
    # best-of-5: the tunneled link's throughput fluctuates ~2x between
    # runs (docs/performance.md); best-of captures the pipeline's actual
    # capability rather than the link's worst stall
    best = min(run(f"r{k}") for k in range(5))

    rtf = n_files * per_file / best
    rec = {
        "metric": "segmentation_realtime_factor_1chip",
        "value": round(rtf, 1),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 500.0, 3),
    }
    print(json.dumps(rec))
    try:
        import time

        os.makedirs(os.path.dirname(state), exist_ok=True)
        # atomic: a run killed mid-write must not leave a truncated file
        tmp_state = f"{state}.part{os.getpid()}"
        with open(tmp_state, "w") as fh:
            json.dump(dict(rec, measured_at=time.strftime(
                "%Y-%m-%d %H:%M UTC", time.gmtime())), fh)
        os.replace(tmp_state, state)
    except OSError:
        pass


if __name__ == "__main__":
    main()
