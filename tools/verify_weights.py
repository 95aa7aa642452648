#!/usr/bin/env python
"""Real released-weight acceptance kit.

This environment has no network, so the released inaSpeechSegmenter weight
files have never touched the importers.  On a host that HAS the files (set
``ISS_TPU_MODEL_DIR``, or let the registry use its ``~/.keras`` /
``/root/.keras`` caches), this one command runs the full golden battery the
reference's own test suite performs (reference run_test.py:62-195):

* per-file TOPOLOGY REPORT first — every hdf5's layer graph (class names,
  weight tensor counts, any unsupported layer type), the ONNX node-stream
  mapping, and the torch checkpoint key map — so an importer gap is
  diagnosed BEFORE any forward pass is attempted;
* musanmix sm+gender golden csv (labels + boundaries, run_test.py:90-105);
* musanmix / silence2sec smn+gender byte-identical csvs and the TextGrid
  byte-identical export (run_test.py:122-148);
* 0021.mp3 short-file result ``[('male', 0, 0.66)]`` via ffmpeg when both
  ffmpeg and the mp3 fixture are present (run_test.py:62-66);
* x-vector embedding vs media/test.h5 at decimal=4 (run_test.py:189-195);
* voice femininity score 0.534884 on lamartine.wav (run_test.py:177-187).

Parity-labeled entry point: CNN/x-vector precision default to exact f32
(``highest``) here regardless of backend — the TPU throughput default
(bf16 3-pass) is for serving, not for golden verification.  Override by
exporting ISS_CNN_PRECISION / ISS_XVEC_PRECISION explicitly.

Usage::

    python tools/verify_weights.py [--media-dir DIR] [--report-only]

Exit status: 0 = everything present PASSed; 1 = at least one FAIL.
SKIPs (missing optional files / ffmpeg) are reported but don't fail.
"""

from __future__ import annotations

import argparse
import filecmp
import os
import sys
import traceback

# parity before anything imports jax (read at trace time)
os.environ.setdefault("ISS_CNN_PRECISION", "highest")
os.environ.setdefault("ISS_XVEC_PRECISION", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from inaspeechsegmenter_tpu.utils.env import apply_platform_env  # noqa: E402

# honor an explicit JAX_PLATFORMS (e.g. cpu) even on hosts whose site
# hooks force-register an accelerator plugin
apply_platform_env()

HDF5_MODELS = [
    "keras_speech_music_cnn.hdf5",
    "keras_speech_music_noise_cnn.hdf5",
    "keras_male_female_cnn.hdf5",
    "interspeech2023_all.hdf5",
    "interspeech2023_cvfr.hdf5",
]

RESULTS = []


def record(name, status, detail=""):
    RESULTS.append((name, status, detail))
    pad = {"PASS": "\033[32mPASS\033[0m", "FAIL": "\033[31mFAIL\033[0m",
           "SKIP": "\033[33mSKIP\033[0m"}.get(status, status)
    print(f"  [{pad}] {name}" + (f" — {detail}" if detail else ""))


def find_model(name):
    from inaspeechsegmenter_tpu.models.registry import (ModelNotFoundError,
                                                        get_remote)

    try:
        return get_remote(name, allow_download=False)
    except (ModelNotFoundError, FileNotFoundError):
        return None


def is_synthetic(path):
    if not path.endswith(".npz"):
        return False
    # one owner for the semantics (and a metadata-only read instead of
    # materializing every weight array)
    from inaspeechsegmenter_tpu.models.registry import _npz_is_synthetic

    return _npz_is_synthetic(path)


# ---------------------------------------------------------------------------
# topology reports
# ---------------------------------------------------------------------------

def report_hdf5(name, path):
    from inaspeechsegmenter_tpu.models.keras_h5 import (LAYER_FNS, MERGE_FNS,
                                                        load_native, read_h5)

    print(f"\n== {name} ({path})")
    try:
        if path.endswith(".npz"):
            spec, params = load_native(path)
        else:
            import h5py

            with h5py.File(path, "r") as f:
                kv = f.attrs.get("keras_version", b"?")
                be = f.attrs.get("backend", b"?")
                kv = kv.decode() if isinstance(kv, bytes) else kv
                be = be.decode() if isinstance(be, bytes) else be
            print(f"   keras_version={kv} backend={be}")
            spec, params = read_h5(path)
    except Exception as exc:
        record(f"{name}: parse", "FAIL", f"{type(exc).__name__}: {exc}")
        traceback.print_exc(limit=2)
        return False
    unsupported = []
    for e in spec["layers"]:
        cname = e["class_name"]
        nw = len(params.get(e["name"], []))
        mark = ""
        if cname not in LAYER_FNS and cname not in MERGE_FNS:
            unsupported.append(cname)
            mark = "   <-- UNSUPPORTED layer type"
        print(f"   {e['name']:<32} {cname:<24} weights={nw}{mark}")
    if unsupported:
        record(f"{name}: topology", "FAIL",
               f"unsupported layer types: {sorted(set(unsupported))}")
        return False
    record(f"{name}: topology", "PASS",
           f"{len(spec['layers'])} layers, all types supported")
    # forward smoke test on a plausible input shape
    try:
        from inaspeechsegmenter_tpu.models.keras_h5 import ImportedModel

        model = ImportedModel(spec, params)
        shape = _guess_input_shape(spec)
        out = np.asarray(model(np.zeros(shape, np.float32)))
        record(f"{name}: forward", "PASS", f"in={shape} out={out.shape}")
        return True
    except Exception as exc:
        record(f"{name}: forward", "FAIL", f"{type(exc).__name__}: {exc}")
        traceback.print_exc(limit=2)
        return False


def _guess_input_shape(spec):
    for e in spec["layers"]:
        cfg = e["config"]
        shp = cfg.get("batch_input_shape") or cfg.get("batch_shape")
        if shp:
            return tuple(2 if d is None else int(d) for d in shp)
    # patch CNNs are (B, 68, nmel, 1); MLPs are (B, 256)
    for e in spec["layers"]:
        if e["class_name"] in ("Conv2D",):
            return (2, 68, 24, 1)
    return (2, 256)


def report_onnx(path):
    if path.endswith(".npz"):
        return report_xvec_npz("final.onnx", path)
    print(f"\n== final.onnx ({path})")
    try:
        from inaspeechsegmenter_tpu.models.onnx_reader import read_model
        from inaspeechsegmenter_tpu.models.resnet import ResNet101XVector
        from inaspeechsegmenter_tpu.vfs import _load_resnet_onnx

        g = read_model(path)
        counts = {}
        for n in g.nodes:
            counts[n.op_type] = counts.get(n.op_type, 0) + 1
        print("   nodes:", " ".join(f"{k}x{v}" for k, v in
                                    sorted(counts.items())))
        print(f"   initializers: {len(g.initializers)}")
        net = ResNet101XVector()
        params = _load_resnet_onnx(net, path)
        n_leaves = len(
            [1 for _ in _iter_leaves(params)])
        record("final.onnx: topology map", "PASS",
               f"{n_leaves} tensors mapped onto ResNet101")
        return True
    except Exception as exc:
        record("final.onnx: topology map", "FAIL",
               f"{type(exc).__name__}: {exc}")
        traceback.print_exc(limit=2)
        return False


def _iter_leaves(node):
    if isinstance(node, dict):
        for v in node.values():
            yield from _iter_leaves(v)
    elif isinstance(node, list):
        for v in node:
            yield from _iter_leaves(v)
    else:
        yield node


def report_xvec_npz(name, path):
    """The registry may resolve raw_81.pth / final.onnx to a converted
    native npz (save_resnet_npz) — report it as such instead of feeding
    the npz to the raw-format loaders (which would false-FAIL a supported
    weight configuration)."""
    print(f"\n== {name} ({path})")
    try:
        from inaspeechsegmenter_tpu.vfs import _load_resnet_npz

        params = _load_resnet_npz(path)
        n_leaves = len([1 for _ in _iter_leaves(params)])
        record(f"{name}: native npz checkpoint", "PASS",
               f"{n_leaves} tensors")
        return True
    except Exception as exc:
        record(f"{name}: native npz checkpoint", "FAIL",
               f"{type(exc).__name__}: {exc}")
        traceback.print_exc(limit=2)
        return False


def report_pth(path):
    if path.endswith(".npz"):
        return report_xvec_npz("raw_81.pth", path)
    print(f"\n== raw_81.pth ({path})")
    try:
        from inaspeechsegmenter_tpu.models.resnet import ResNet101XVector

        net = ResNet101XVector()
        params = net.load_torch_checkpoint(path)
        n_leaves = len([1 for _ in _iter_leaves(params)])
        record("raw_81.pth: state-dict map", "PASS",
               f"{n_leaves} tensors mapped onto ResNet101")
        return True
    except Exception as exc:
        record("raw_81.pth: state-dict map", "FAIL",
               f"{type(exc).__name__}: {exc}")
        traceback.print_exc(limit=2)
        return False


# ---------------------------------------------------------------------------
# golden battery
# ---------------------------------------------------------------------------

def golden_csv(media_dir, name):
    import pandas as pd

    df = pd.read_csv(os.path.join(media_dir, name), sep="\t",
                     float_precision="round_trip")
    return [(r.labels, r.start, r.stop) for r in df.itertuples()]


def seg_diff_detail(gold, got):
    """Quantify a parity miss with the eval metrics so the report separates
    numeric jitter (frame diff within the 0.1% budget, boundaries a frame
    off) from wrong weights (gross diff).  `gold`/`got` are csv paths or
    (label, start, stop) lists."""
    try:
        from inaspeechsegmenter_tpu import eval as ev

        fd = ev.frame_diff(gold, got)
        b = ev.boundary_report(gold, got, tolerance=0.1)
        verdict = ("within" if fd <= 0.001 else "OVER") + " the 0.1% budget"
        return (f"frame diff {fd:.4%} ({verdict}); boundaries "
                f"{b['matched']}/{b['n_ref']} matched within 0.1s, "
                f"mean |offset| {b['mean_abs_offset']}s")
    except Exception as exc:   # diagnostics must not mask the FAIL itself
        return f"diff metrics unavailable: {type(exc).__name__}: {exc}"


def run_golden(media_dir, tmp, have_cnns, have_mlp, have_xvec, ffmpeg):
    from inaspeechsegmenter_tpu import Segmenter, seg2csv, seg2textgrid

    musan = os.path.join(media_dir, "musanmix.wav")
    silence = os.path.join(media_dir, "silence2sec.wav")

    if have_cnns and os.path.exists(musan):
        try:
            seg = Segmenter(vad_engine="smn", detect_gender=True,
                            ffmpeg=None, allow_download=False)
            out = seg(musan)
            p = os.path.join(tmp, "musanmix-smn-gender.csv")
            seg2csv(out, p)
            gold_p = os.path.join(media_dir, "musanmix-smn-gender.csv")
            ok = filecmp.cmp(p, gold_p, shallow=False)
            record("musanmix smn+gender csv byte parity",
                   "PASS" if ok else "FAIL",
                   "" if ok else seg_diff_detail(gold_p, p))
            tg = os.path.join(tmp, "musanmix-smn-gender.TextGrid")
            seg2textgrid(out, tg)
            ok = filecmp.cmp(tg, os.path.join(media_dir,
                                              "musanmix-smn-gender.TextGrid"),
                             shallow=False)
            record("musanmix smn+gender TextGrid byte parity",
                   "PASS" if ok else "FAIL")

            out = seg(silence)
            p = os.path.join(tmp, "silence2sec-smn-gender.csv")
            seg2csv(out, p)
            gold_p = os.path.join(media_dir, "silence2sec-smn-gender.csv")
            ok = filecmp.cmp(p, gold_p, shallow=False)
            record("silence2sec smn+gender csv byte parity",
                   "PASS" if ok else "FAIL",
                   "" if ok else seg_diff_detail(gold_p, p))

            seg_sm = Segmenter(vad_engine="sm", detect_gender=True,
                               ffmpeg=None, allow_download=False)
            out = seg_sm(musan)
            gold = golden_csv(media_dir, "musanmix-sm-gender.csv")
            lab_ok = [a for a, _, _ in out] == [a for a, _, _ in gold]
            # boundaries are only comparable when the label sequences (and
            # therefore segment counts) match — np.allclose on different
            # lengths raises and would abort the rest of the battery
            b_ok = lab_ok and (
                np.allclose([s for _, s, _ in out],
                            [s for _, s, _ in gold], atol=5e-4)
                and np.allclose([e for _, _, e in out],
                                [e for _, _, e in gold], atol=5e-4))
            record("musanmix sm+gender labels+boundaries",
                   "PASS" if (lab_ok and b_ok) else "FAIL",
                   "" if (lab_ok and b_ok) else
                   ("label sequences differ; " if not lab_ok else "")
                   + seg_diff_detail(gold, out))

            mp3 = os.path.join(media_dir, "0021.mp3")
            if ffmpeg and os.path.exists(mp3):
                seg_f = Segmenter(vad_engine="smn", detect_gender=True,
                                  ffmpeg=ffmpeg, allow_download=False)
                got = seg_f(mp3)
                want = [("male", 0, 0.66)]
                ok = ([(a, round(s, 2), round(e, 2)) for a, s, e in got]
                      == want)
                record("0021.mp3 via ffmpeg == [('male', 0, 0.66)]",
                       "PASS" if ok else "FAIL", str(got) if not ok else "")
            else:
                record("0021.mp3 via ffmpeg", "SKIP",
                       "ffmpeg or mp3 fixture unavailable")
        except Exception as exc:
            record("segmentation golden battery", "FAIL",
                   f"{type(exc).__name__}: {exc}")
            traceback.print_exc(limit=3)
    else:
        record("segmentation golden battery", "SKIP",
               "CNN weights or musanmix.wav unavailable")

    testh5 = os.path.join(media_dir, "test.h5")
    if have_xvec and os.path.exists(testh5):
        try:
            import h5py

            from inaspeechsegmenter_tpu.vfs import JaxResnetExtractor

            with h5py.File(testh5, "r") as f:
                mel = np.array(f["lamartinemelbands"])
                expected = np.array(f["lamartineonnx"])
            ext = JaxResnetExtractor(allow_download=False)
            emb = ext.get_embedding(mel.astype(np.float32))
            diff = float(np.abs(emb - expected).max())
            record("x-vector embedding vs test.h5 (decimal=4)",
                   "PASS" if diff < 5e-5 * max(1.0, float(
                       np.abs(expected).max())) or diff < 1e-4 else "FAIL",
                   f"max |diff| = {diff:.2e}")
        except Exception as exc:
            record("x-vector embedding vs test.h5", "FAIL",
                   f"{type(exc).__name__}: {exc}")
            traceback.print_exc(limit=3)
    else:
        record("x-vector embedding vs test.h5", "SKIP",
               "x-vector weights or test.h5 unavailable")

    lam = os.path.join(media_dir, "lamartine.wav")
    if have_cnns and have_mlp and have_xvec and os.path.exists(lam):
        try:
            from inaspeechsegmenter_tpu import VoiceFemininityScoring

            vfs = VoiceFemininityScoring(gd_model_criteria="vfp",
                                         ffmpeg=None, allow_download=False)
            score, dur, n = vfs(lam)
            ok = score is not None and abs(score - 0.534884) < 5e-5
            record("VFS score on lamartine.wav == 0.534884",
                   "PASS" if ok else "FAIL",
                   f"score={score} dur={dur:.2f}s n={n}")
        except Exception as exc:
            record("VFS score on lamartine.wav", "FAIL",
                   f"{type(exc).__name__}: {exc}")
            traceback.print_exc(limit=3)
    else:
        record("VFS score on lamartine.wav", "SKIP",
               "CNN/MLP/x-vector weights or lamartine.wav unavailable")


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--media-dir", default=None,
                    help="directory with the reference media fixtures "
                         "(musanmix.wav, golden csvs, test.h5, ...)")
    ap.add_argument("--report-only", action="store_true",
                    help="topology reports only, skip the golden battery")
    ap.add_argument("--ffmpeg", default="ffmpeg")
    ap.add_argument("--json", default=os.environ.get("ISS_VERIFY_JSON"),
                    help="also write a machine-readable report to this path "
                         "(CI / Docker acceptance hooks parse it; env "
                         "ISS_VERIFY_JSON)")
    args = ap.parse_args()

    media_dir = args.media_dir
    if media_dir is None:
        for cand in ("/root/reference/media", "./media", "../media"):
            if os.path.exists(os.path.join(cand, "musanmix.wav")):
                media_dir = cand
                break
    print("media dir:", media_dir or "NOT FOUND")
    print("model search: ISS_TPU_MODEL_DIR=%s"
          % os.environ.get("ISS_TPU_MODEL_DIR", "<unset>"))
    print("precision: ISS_CNN_PRECISION=%s ISS_XVEC_PRECISION=%s"
          % (os.environ["ISS_CNN_PRECISION"],
             os.environ["ISS_XVEC_PRECISION"]))

    import shutil
    import tempfile

    ffmpeg = shutil.which(args.ffmpeg)

    have = {}
    print("\n--- model files ---")
    for name in HDF5_MODELS + ["final.onnx", "raw_81.pth"]:
        path = find_model(name)
        if path and is_synthetic(path):
            print(f"  {name:<36} SYNTHETIC stand-in ({path}) — not verified")
            have[name] = None
        else:
            print(f"  {name:<36} {path or 'NOT FOUND'}")
            have[name] = path

    print("\n--- topology reports ---")
    for name in HDF5_MODELS:
        if have.get(name):
            report_hdf5(name, have[name])
    if have.get("final.onnx"):
        report_onnx(have["final.onnx"])
    if have.get("raw_81.pth"):
        report_pth(have["raw_81.pth"])
    if not any(have.values()):
        print("  (no real weight files found — nothing to report)")

    if not args.report_only and media_dir:
        print("\n--- golden battery ---")
        have_cnns = all(have.get(n) for n in HDF5_MODELS[:3])
        have_mlp = bool(have.get("interspeech2023_cvfr.hdf5"))
        have_xvec = bool(have.get("raw_81.pth") or have.get("final.onnx"))
        with tempfile.TemporaryDirectory() as tmp:
            run_golden(media_dir, tmp, have_cnns, have_mlp, have_xvec,
                       ffmpeg)

    fails = [r for r in RESULTS if r[1] == "FAIL"]
    skips = [r for r in RESULTS if r[1] == "SKIP"]
    passes = [r for r in RESULTS if r[1] == "PASS"]
    print(f"\nsummary: {len(passes)} pass, "
          f"{len(fails)} fail, {len(skips)} skip")
    if args.json:
        import json
        import time

        rep = {
            "ok": not fails,
            "verified": bool(passes),  # False = nothing real was checked
            "summary": {"pass": len(passes), "fail": len(fails),
                        "skip": len(skips)},
            "results": [{"name": n, "status": s, "detail": d}
                        for n, s, d in RESULTS],
            "models": {k: (v if v else ("synthetic" if find_model(k)
                                        else None))
                       for k, v in have.items()},
            "media_dir": media_dir,
            "precision": {"cnn": os.environ["ISS_CNN_PRECISION"],
                          "xvec": os.environ["ISS_XVEC_PRECISION"]},
            "measured_at": time.strftime("%Y-%m-%d %H:%M UTC",
                                         time.gmtime()),
        }
        os.makedirs(os.path.dirname(os.path.abspath(args.json)),
                    exist_ok=True)
        tmp_json = f"{args.json}.part{os.getpid()}"
        with open(tmp_json, "w") as fh:
            json.dump(rep, fh, indent=1)
        os.replace(tmp_json, args.json)
        print(f"json report: {args.json}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
