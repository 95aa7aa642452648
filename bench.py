"""Benchmark: real-time factors of BOTH production pipelines on 1 chip.

Measures, in one process, on the same deterministic synthetic broadcast
audio and full-size synthetic weights:

* **Segmentation** — the reference's own headline path (`batch_process`):
  one hour of 16 kHz audio split across several WAV files, decoded,
  feature-extracted, and segmented with the smn+gender engine — host
  decode + upload of the next file overlapping device compute of the
  current one, exactly as in serving.
* **Voice femininity scoring (VFS)** — the full
  `VoiceFemininityScoring.__call__` (decode -> VAD -> VBx features ->
  batched ResNet101 x-vectors -> MLP), the reference's "most costly part"
  (reference vbx_segmenter.py:174-176); measurement shared with
  tools/bench_vfs.py (`measure_vfs`).
* **Online monitoring latency** — `OnlineSegmenter` fed at a 1 s cadence:
  time to the first provisional label, per-feed feed()+current() latency,
  and finalize cost (tools/bench_online.py has the full battery).

Prints ONE JSON line.  The primary fields keep the historical shape
{"metric", "value", "unit", "vs_baseline"} (segmentation RTF vs the 500x
north star — the reference publishes no throughput numbers, SURVEY.md §6);
the VFS factor, the bench mix's effective label fractions (real-weight
runs will differ exactly as the speech fraction differs — the gender CNN
and the x-vector extractor only run on speech), and the online latencies
ride along as extra keys of the same record.
"""

from __future__ import annotations

import json
import os
import sys
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


def synth_int16(seconds, seed):
    """PCM16 like real broadcast sources (int16 halves the device upload
    and converts to identical float32 on device)."""
    return np.clip(np.rint(synth_audio(seconds, seed=seed) * 32768.0),
                   -32768, 32767).astype(np.int16)


def label_mix(csv_paths):
    """Effective per-label duration fractions of the bench mix, read back
    from the segmentation outputs.  Recorded so the first real-weight run
    is comparable: gender-CNN and x-vector work scale with the speech
    fraction, so a different mix means a different RTF."""
    import pandas as pd

    totals = {}
    for p in csv_paths:
        df = pd.read_csv(p, sep="\t")
        for lab, start, stop in df.itertuples(index=False):
            totals[lab] = totals.get(lab, 0.0) + (stop - start)
    grand = sum(totals.values()) or 1.0
    return {lab: round(dur / grand, 3) for lab, dur in sorted(totals.items())}


def _link_mbps_roundtrip(mib=16, rounds=3):
    """Effective host->device link bandwidth (MB/s), forced-round-trip:
    upload `mib` MiB of int16 and fetch a scalar reduction, best-of
    `rounds`, with the resident-buffer (compute+readback) time subtracted
    so the quotient is the transfer term alone.  Returns None when the
    transfer term is lost in timing noise (fast local backends): a
    garbage bandwidth figure would defeat the field's purpose."""
    import jax
    import jax.numpy as jnp

    buf = np.ones((mib << 20) // 2, np.int16)
    dev = jnp.asarray(buf)
    red = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    float(red(dev))                               # compile + warm
    base = min(_timed(lambda: float(red(dev))) for _ in range(rounds))
    up = min(_timed(lambda: float(red(jnp.asarray(buf))))
             for _ in range(rounds))
    net = up - base
    return None if net <= 0 else (mib << 20) / 1e6 / net


def _inprocess_device_ok(max_wait=120.0):
    """Can THIS process still run a device op?  Used by the mid-run abort
    retry: the subprocess probe (`wait_for_device`) cannot attach while
    this process holds an exclusive accelerator, so only an in-process op
    can distinguish a transient abort from a dead backend here."""
    import jax
    import jax.numpy as jnp

    deadline = time.monotonic() + max_wait
    while True:
        try:
            x = jnp.ones((128, 128), np.float32)
            float(jnp.sum(x @ x))
            return True
        except Exception:
            if time.monotonic() >= deadline:
                return False
            time.sleep(5)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def measure_stages(seg, inputs, seconds):
    """Per-stage decomposition of the segmentation pipeline on THIS host,
    each stage isolated on the same corpus the headline RTF measured:

    * ``read_s``     — WAV decode on the host (audio.io, dtype='auto');
    * ``pack_s``     — upload-codec encode on the host (pack_best per
                       upload group, exactly the serving group loop);
    * ``upload_s``   — shipping the packed bytes over the link, forced
                       round trip so the transfer cannot hide;
    * ``feats_s``    — feature chunk programs on device-RESIDENT packed
                       buffers (unpack + DFT + mel);
    * ``decode_s``   — CNN emissions + Viterbi tails on resident features;
    * ``readback_s`` — fetching the final label ids to the host.

    ``expected_wall_s`` reconstructs the serving wall under the pipeline's
    overlap model (host + max(link, device) + readback): the headline RTF
    is explained when it matches the measured wall within ~15%.  Stages
    are best-of-2; everything device-side is block_until_ready-fenced.
    """
    import jax
    import jax.numpy as jnp

    from inaspeechsegmenter_tpu.audio.io import media2sig16kmono
    from inaspeechsegmenter_tpu.dsp.codec import pack_best
    from inaspeechsegmenter_tpu.dsp.sidekit import CHUNK, HOP, frame_count
    from inaspeechsegmenter_tpu.pipeline import bucket_rows

    def best2(fn):
        return min(_timed(fn), _timed(fn))

    # one serving run timed NOW: the headline value is a best-of across
    # minutes of link weather, so the stage sum must reconcile against a
    # wall measured in the SAME weather as the stages themselves
    import tempfile

    outs = [os.path.join(tempfile.mkdtemp(prefix="iss_stage_"), f"o{i}.csv")
            for i in range(len(inputs))]
    wall_s = _timed(lambda: seg.batch_process(inputs, outs))

    read_s = best2(lambda: [media2sig16kmono(p, None, None, None, "auto")
                            for p in inputs])
    sigs = [media2sig16kmono(p, None, None, None, "auto") for p in inputs]

    def group_slices(sig):
        t = frame_count(len(sig))
        n_chunks = max(1, bucket_rows(t) // CHUNK)
        need = (n_chunks * CHUNK + 2) * HOP
        sig = np.pad(sig, (0, max(0, need - len(sig))))[:need]
        group = max(1, int(os.environ.get("ISS_UPLOAD_CHUNKS", "3")))
        return [(np.ascontiguousarray(
                    sig[g * CHUNK * HOP: ((g + k) * CHUNK + 2) * HOP]), k)
                for g in range(0, n_chunks, group)
                for k in [min(group, n_chunks - g)]]

    slices = [s for sig in sigs for s in group_slices(sig)]
    pack_s = best2(lambda: [pack_best(raw) for raw, _ in slices])
    packed = [(pack_best(raw), raw, k) for raw, k in slices]

    red = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))

    def upload_all():
        devs = [jnp.asarray(p[1] if p is not None else raw)
                for p, raw, _ in packed]
        float(red(devs[-1]))        # forced round trip
        return devs

    upload_all()
    upload_s = best2(upload_all)
    bufs = upload_all()

    fe = seg.frontend
    kinds = [None if p is None else p[0] for p, _, _ in packed]

    def feats_all():
        outs = []
        for buf, kind, (p, raw, k) in zip(bufs, kinds, packed):
            nb = len(raw) // 320
            if kind == "bits":
                res = fe._one_chunk_bits(buf, nb)
            elif kind is not None:
                res = fe._one_chunk_packed(buf, nb)
            else:
                res = fe._one_chunk(buf)
            outs.append(res)
        jax.block_until_ready(outs)
        return outs

    feats_all()
    feats_s = best2(feats_all)

    # resident-feature CNN + decode, per file (the fused streaming path)
    per_file = []
    for sig in sigs:
        t = frame_count(len(sig))
        chunks, _ = fe.mspec_loge_chunks(sig, pad_frames_to=bucket_rows(t))
        jax.block_until_ready([c[0] for c in chunks])
        per_file.append((chunks, t))

    def decode_all():
        out = []
        for chunks, t in per_file:
            ids = seg.pipeline.run_streaming(
                seg.vad.model.params,
                seg.gender.model.params if seg.detect_gender else None,
                chunks, t, t, (t + 1) // 2)
            out.append(ids)
        jax.block_until_ready(out)
        return out

    decode_all()
    decode_s = best2(decode_all)
    # fresh device results each time: a jax.Array caches its host copy, so
    # re-reading the same ids would measure a no-op
    readback_s = min(
        _timed(lambda: [np.asarray(i) for i in decode_all()]) - decode_s
        for _ in range(2))
    readback_s = max(readback_s, 0.0)

    device_s = feats_s + decode_s
    stages = {
        "wall_s": round(wall_s, 3),
        "read_s": round(read_s, 3), "pack_s": round(pack_s, 3),
        "upload_s": round(upload_s, 3), "feats_s": round(feats_s, 3),
        "decode_s": round(decode_s, 3), "readback_s": round(readback_s, 3),
        "device_s": round(device_s, 3),
        # serving overlap model: host stages serial (1-core bench hosts
        # cannot hide them), link and device overlapped, readback serial
        "expected_wall_s": round(read_s + pack_s + max(upload_s, device_s)
                                 + readback_s, 3),
    }
    stages["device_rtf"] = round(seconds / device_s, 1)
    return stages


def _xla_flops(fn, *args):
    """Analytic FLOPs of a jitted computation via XLA's cost analysis;
    None when the backend does not expose it."""
    import jax

    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        f = float(cost["flops"])
        return f if f > 0 else None
    except Exception:
        return None


V5E_PEAK_FLOPS = 394e12 / 2     # bf16 MACs: 197 TFLOP/s on v5e


def measure_mfu(seg):
    """MXU utilization of the two FLOP-heavy stages, driver-visible:

    * ``mfu_cnn``     — one VAD patch-CNN chunk program (the fused
                        pipeline's dominant kernel), analytic FLOPs from
                        XLA cost analysis over its measured runtime;
    * ``mfu_xvector`` — one full ResNet101 x-vector sub-batch (256, 64,
                        144) in the serving precision.

    Both divide by the v5e bf16 peak (197 TFLOP/s): exact-f32 stages run
    6 MXU passes per logical FLOP, so their ceiling is ~0.167 — quoted as
    ``*_roofline_frac`` (fraction of the precision's own ceiling) next to
    the raw MFU.
    """
    import jax
    import jax.numpy as jnp

    from inaspeechsegmenter_tpu.models.resnet import ResNet101XVector

    out = {}
    # patch CNN: the streaming chunk-emission program on one chunk
    pipe = seg.pipeline
    pipe._ensure_stream_jits()
    from inaspeechsegmenter_tpu.dsp.sidekit import CHUNK
    from inaspeechsegmenter_tpu.pipeline import STREAM_HALO
    rng = np.random.default_rng(0)
    m_c = jnp.asarray(rng.standard_normal((CHUNK, 24)), jnp.float32)
    halo = jnp.zeros((STREAM_HALO, 24), jnp.float32)
    vp = seg.vad.model.params

    def cnn(mp, h1, mc, h2):
        return pipe._chunk_probs_impl(pipe.vad_forward, pipe.vad_nmel,
                                      mp, h1, mc, h2, False)

    fl = _xla_flops(cnn, vp, halo, m_c, halo)
    def run_cnn():
        jax.block_until_ready(pipe._jit_vad_chunk(vp, halo, m_c, halo,
                                                  False))
    run_cnn()
    dt = min(_timed(run_cnn) for _ in range(3))
    if fl:
        mfu = fl / dt / V5E_PEAK_FLOPS
        passes = {"fast": 1, "high": 3, "highest": 6}.get(
            os.environ.get("ISS_CNN_PRECISION", "high"), 3)
        out["mfu_cnn"] = round(mfu, 4)
        out["mfu_cnn_roofline_frac"] = round(mfu * passes, 3)

    # ResNet101 x-vector sub-batch in serving precision
    net = ResNet101XVector()
    params = net.init_params(seed=1)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    x = jnp.asarray(rng.standard_normal((256, 64, 144)), jnp.float32)
    fl = _xla_flops(net.forward, params, x)
    def run_x():
        jax.block_until_ready(net(params, x))
    run_x()
    dt = min(_timed(run_x) for _ in range(3))
    if fl:
        mfu = fl / dt / V5E_PEAK_FLOPS
        passes = {"fast": 1, "high": 3, "highest": 6}.get(
            os.environ.get("ISS_XVEC_PRECISION", "highest"), 6)
        out["mfu_xvector"] = round(mfu, 4)
        out["mfu_xvector_roofline_frac"] = round(mfu * passes, 3)
    return out


def measure_single_file(seg, seconds, tmp):
    """ONE continuous `seconds`-long WAV through the streaming single-file
    path (`Segmenter.__call__` -> segment_signal) — the corpus RTF splits
    the hour across files, so the long-file bucket ladder and streaming
    chunk machinery would otherwise never face a full hour in the driver
    artifact.  Also reports peak device memory when the backend exposes
    it (long-file memory boundedness, SURVEY §5 long-context)."""
    import jax

    from inaspeechsegmenter_tpu.audio import write_wav

    path = os.path.join(tmp, "single.wav")
    write_wav(path, synth_int16(seconds, seed=0), 16000)
    seg(path)                                  # warm the long-file buckets
    best = min(_timed(lambda: seg(path)) for _ in range(3))
    out = {"single_file_rtf": round(seconds / best, 1),
           "single_file_seconds": seconds}
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and stats.get("peak_bytes_in_use"):
            out["peak_hbm_mb"] = round(stats["peak_bytes_in_use"] / 2**20)
    except Exception:
        pass                                   # observability only
    return out


def measure_online(seg, seconds=150):
    """Compact online-latency section: OnlineSegmenter fed 1 s blocks.

    The measurement itself (warm pass + measured pass at a fixed cadence)
    is tools/bench_online.py's `seg_cadence` — shared so the driver
    artifact and the full battery can never drift apart."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools"))
    from bench_online import seg_cadence

    out = dict(seg_cadence(seg, synth_int16(seconds, seed=7), cadence_s=1))
    out.pop("metric", None)     # rides inside the bench record instead
    out["feed_cadence_s"] = 1
    return out


def main():
    from inaspeechsegmenter_tpu.utils.cache import enable_compilation_cache
    from inaspeechsegmenter_tpu.utils.env import (apply_platform_env,
                                                  wait_for_device)

    # honor an explicit JAX_PLATFORMS pin in THIS process: some hosts
    # install a sitecustomize hook that force-selects an accelerator
    # plugin over the env var, which would route an intended-CPU bench
    # (tests, fallback runs on a stalled link) onto the tunneled device
    apply_platform_env()
    # the tunneled device link stalls for tens of minutes at a time: wait
    # (bounded) for it to answer instead of hanging the harness, and emit
    # a parseable record if it never does.  This must run BEFORE
    # enable_compilation_cache: the cache scopes per backend, which
    # initializes the backend and would itself hang on a dead link.
    state = os.path.expanduser(
        "~/.cache/inaspeechsegmenter_tpu/last_bench.json")

    def error_record(msg):
        """Parseable zero-record: the driver must ALWAYS get its one JSON
        line, whatever the link does mid-run."""
        rec = {"metric": "segmentation_realtime_factor_1chip",
               "value": 0, "unit": "x_realtime", "vs_baseline": 0,
               "vfs_realtime_factor_1chip": 0, "vfs_vs_baseline": 0,
               "error": msg}
        try:
            # context for the reader: clearly-labeled previous successful
            # measurement on this host (NOT a fresh number)
            with open(state) as fh:
                rec["last_successful_run"] = json.load(fh)
        except (OSError, ValueError):
            pass   # missing or corrupt state must not break the record
        print(json.dumps(rec))

    if not wait_for_device(float(os.environ.get("ISS_BENCH_LINK_WAIT",
                                                "1800"))):
        error_record("device link stalled; no measurement possible")
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

    per_file = seconds // n_files
    tmp = tempfile.mkdtemp(prefix="iss_bench_")
    inputs = []
    for i in range(n_files):
        p = os.path.join(tmp, f"a{i}.wav")
        write_wav(p, synth_int16(per_file, seed=i), 16000)
        inputs.append(p)

    def measure_seg():
        seg = Segmenter(vad_engine="smn", detect_gender=True, ffmpeg=None,
                        allow_download=False)

        def run(tag):
            outs = [os.path.join(tmp, f"o{tag}_{i}.csv")
                    for i in range(n_files)]
            dur, n_ok, _, _ = seg.batch_process(inputs, outs)
            assert n_ok == n_files
            return dur, outs

        _, warm_outs = run("warm")  # compile the bucket programs
        # best-of-5: the tunneled link's throughput fluctuates ~2x between
        # runs (docs/performance.md); best-of captures the pipeline's
        # actual capability rather than the link's worst stall
        best = min(run(f"r{k}")[0] for k in range(5))
        return seg, warm_outs, best

    # The tunneled runtime can abort mid-run (observed: JaxRuntimeError
    # ABORTED "TPU backend error" with the very next probe healthy).  One
    # retry with a fresh Segmenter (device params may be invalidated);
    # the driver must get a parseable record, never a traceback.  The
    # probe must be IN-PROCESS: wait_for_device's subprocess probe cannot
    # attach while this process holds an exclusive accelerator, so it
    # would report dead-link on every mid-run abort regardless of whether
    # this process's backend recovered.
    try:
        try:
            seg, warm_outs, best = measure_seg()
        except Exception:
            if not _inprocess_device_ok(120):
                raise
            seg, warm_outs, best = measure_seg()
    except Exception as e:
        error_record(f"measurement failed: {e!r}")
        return

    rtf = n_files * per_file / best
    rec = {
        "metric": "segmentation_realtime_factor_1chip",
        "value": round(rtf, 1),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 500.0, 3),
    }
    try:
        rec["label_mix"] = label_mix(warm_outs)
    except Exception as e:  # diagnostics must not cost the metric
        rec["label_mix_error"] = repr(e)
    try:
        # the end-to-end path is upload-bound on tunneled hosts and the
        # link swings 13-65 MB/s by the hour (docs/performance.md) — the
        # single variable behind cross-round RTF spread.  Record the
        # effective host->device bandwidth AT measurement time so the
        # artifact explains its own variance.  Forced round-trip (scalar
        # reduction fetched to host): plain block_until_ready on an
        # uploaded array returns before the transfer completes here.
        mbps = _link_mbps_roundtrip()
        if mbps is not None:        # None: transfer term lost in noise
            rec["link_mbps"] = round(mbps, 1)
    except Exception as e:
        rec["link_mbps_error"] = repr(e)
    try:
        # upload-codec effect on this mix (docs/performance.md): packed
        # link bytes / raw int16 bytes, with the REAL upload loop's
        # per-group accept/decline and page quantization (the measured
        # run ships one pack_best decision per ISS_UPLOAD_CHUNKS group,
        # not one per file)
        from inaspeechsegmenter_tpu.dsp.sidekit import group_shipped_bytes
        raw_b = packed_b = 0
        for i in range(n_files):
            shipped, raw = group_shipped_bytes(synth_int16(per_file, seed=i))
            packed_b += shipped
            raw_b += raw
        rec["upload_codec_byte_ratio"] = round(packed_b / raw_b, 3)
    except Exception as e:
        rec["upload_codec_error"] = repr(e)

    # per-stage decomposition: the record must explain its own wall time
    # (read/pack on host, upload on the link, feats/decode on device,
    # readback), with the resident-pipeline RTF (device_rtf) made
    # driver-visible at last
    try:
        rec["stages"] = measure_stages(seg, inputs, seconds)
    except Exception as e:
        rec["stages_error"] = repr(e)
    # MXU utilization of the FLOP-heavy kernels (analytic FLOPs from XLA
    # cost analysis over measured runtimes)
    try:
        rec.update(measure_mfu(seg))
    except Exception as e:
        rec["mfu_error"] = repr(e)
    # hour-scale SINGLE-file measurement (skippable: ISS_BENCH_SINGLE=0)
    if os.environ.get("ISS_BENCH_SINGLE", "1") != "0":
        try:
            rec.update(measure_single_file(seg, seconds, tmp))
        except Exception as e:
            rec["single_file_error"] = repr(e)

    # VFS pipeline (same measurement as tools/bench_vfs.py, smaller
    # best-of): its own try/except so a VFS-path failure still reports
    # the segmentation number rather than an empty artifact
    try:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        from bench_vfs import measure_vfs

        vfs_seconds = int(os.environ.get("ISS_BENCH_VFS_SECONDS", "1200"))
        rec.update(measure_vfs(vfs_seconds, rounds=3))
        rec["vfs_audio_seconds"] = vfs_seconds
    except Exception as e:
        rec["vfs_error"] = repr(e)

    # online monitoring latency (skippable: ISS_BENCH_ONLINE=0)
    if os.environ.get("ISS_BENCH_ONLINE", "1") != "0":
        try:
            rec["online"] = measure_online(seg, seconds=int(
                os.environ.get("ISS_BENCH_ONLINE_SECONDS", "150")))
        except Exception as e:
            rec["online_error"] = repr(e)

    print(json.dumps(rec))
    try:
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
