"""Evaluation module: exact metric values on constructed segmentations.

The reference publishes accuracy claims but ships no scorer (SURVEY.md §6);
`inaspeechsegmenter_tpu.eval` is the first-party one.  Every expected
number here is computed by hand on the 20 ms frame grid.
"""

import json
import os

import numpy as np
import pytest

from inaspeechsegmenter_tpu import eval as ev
from inaspeechsegmenter_tpu.export import seg2csv

pytestmark = pytest.mark.smoke

REF = [("a", 0.0, 1.0), ("b", 1.0, 2.0)]
HYP_SHIFT = [("a", 0.0, 1.2), ("b", 1.2, 2.0)]  # boundary moved +0.2 s


def test_frame_labels_grid():
    fr = ev.frame_labels(REF)
    assert len(fr) == 100
    assert fr[0] == "a" and fr[49] == "a" and fr[50] == "b" and fr[99] == "b"
    # uncovered gap frames hold ""
    fr = ev.frame_labels([("x", 0.5, 1.0)], n_frames=60)
    assert list(fr[:25]) == [""] * 25 and fr[25] == "x" and fr[59] == ""


def test_frame_diff_exact_and_collar():
    # 0.2 s of 2.0 s differs
    assert ev.frame_diff(REF, HYP_SHIFT) == pytest.approx(0.1)
    assert ev.frame_diff(REF, REF) == 0.0
    # a 0.25 s collar around the ref boundary at t=1 excludes the whole
    # differing region
    assert ev.frame_diff(REF, HYP_SHIFT, collar=0.25) == 0.0
    # ... and a 0.1 s collar (5 frames each side of the boundaries at
    # 0 / 1 / 2 s -> 20 frames excluded of 100) leaves 5 differing of 80
    assert ev.frame_diff(REF, HYP_SHIFT, collar=0.1) == pytest.approx(5 / 80)


def test_shorter_hypothesis_counts_as_wrong():
    # empty / truncated hypotheses must not score as perfect
    assert ev.frame_diff(REF, []) == 1.0
    assert ev.frame_diff(REF, [("a", 0.0, 1.0)]) == pytest.approx(0.5)
    # symmetric: hypothesis longer than reference
    assert ev.frame_diff([("a", 0.0, 1.0)], REF) == pytest.approx(0.5)


def test_label_report_values():
    rep = ev.label_report(REF, HYP_SHIFT)
    assert rep["accuracy"] == pytest.approx(0.9)
    assert rep["scored_duration"] == pytest.approx(2.0)
    a, b = rep["labels"]["a"], rep["labels"]["b"]
    # a: ref 1.0 s, hyp 1.2 s, tp 1.0 s
    assert a["precision"] == pytest.approx(1.0 / 1.2)
    assert a["recall"] == pytest.approx(1.0)
    assert a["ref_duration"] == pytest.approx(1.0)
    assert a["hyp_duration"] == pytest.approx(1.2)
    # b: ref 1.0 s, hyp 0.8 s, tp 0.8 s
    assert b["precision"] == pytest.approx(1.0)
    assert b["recall"] == pytest.approx(0.8)
    f1 = 2 * 0.8 / 1.8
    assert b["f1"] == pytest.approx(f1, abs=1e-6)


def test_confusion_durations():
    c = ev.confusion(REF, HYP_SHIFT)
    assert c[("a", "a")] == pytest.approx(1.0)
    assert c[("b", "a")] == pytest.approx(0.2)
    assert c[("b", "b")] == pytest.approx(0.8)
    assert ("a", "b") not in c


def test_vad_report_exact():
    ref = [("male", 0.0, 1.0), ("noEnergy", 1.0, 2.0)]
    hyp = [("speech", 0.0, 0.5), ("noise", 0.5, 1.5), ("female", 1.5, 2.0)]
    v = ev.vad_report(ref, hyp)
    assert v["miss_rate"] == pytest.approx(0.5)   # [0.5,1.0) missed
    assert v["fa_rate"] == pytest.approx(0.5)     # [1.5,2.0) false alarm
    assert v["dcf"] == pytest.approx(0.75 * 0.5 + 0.25 * 0.5)
    assert v["speech_ref_duration"] == pytest.approx(1.0)
    assert v["nonspeech_ref_duration"] == pytest.approx(1.0)


def test_boundary_report_tolerance_and_label_changes():
    hyp = [("a", 0.0, 1.05), ("b", 1.05, 2.0)]
    b = ev.boundary_report(REF, hyp, tolerance=0.1)
    assert (b["matched"], b["n_ref"], b["n_hyp"]) == (1, 1, 1)
    assert b["precision"] == 1.0 and b["recall"] == 1.0
    assert b["mean_abs_offset"] == pytest.approx(0.05)
    b = ev.boundary_report(REF, hyp, tolerance=0.01)
    assert b["matched"] == 0 and b["f1"] == 0.0
    # adjacent same-label segments (csv artifacts) are NOT boundaries
    split = [("a", 0.0, 0.5), ("a", 0.5, 1.0), ("b", 1.0, 2.0)]
    assert ev.boundary_report(REF, split, tolerance=0.01)["n_hyp"] == 1


def test_boundary_matching_is_one_to_one():
    # two hyp boundaries near one ref boundary: only one may match
    hyp = [("a", 0.0, 0.95), ("c", 0.95, 1.05), ("b", 1.05, 2.0)]
    b = ev.boundary_report(REF, hyp, tolerance=0.1)
    assert b["n_hyp"] == 2 and b["matched"] == 1
    assert b["mean_abs_offset"] == pytest.approx(0.05)


def test_csv_roundtrip_and_loader_errors(tmp_path):
    p = str(tmp_path / "ref.csv")
    seg2csv(REF, p)
    assert ev.load_segmentation(p) == REF
    assert ev.frame_diff(REF, p) == 0.0
    bad = str(tmp_path / "bad.csv")
    with open(bad, "w") as f:
        f.write("x\ty\n1\t2\n")
    with pytest.raises(ValueError, match="not a segmentation csv"):
        ev.load_segmentation(bad)


def test_merge_confusions_duration_weighted():
    # file 1: 2 s perfect on 'a'; file 2: 1 s of 'a' all called 'b'
    c1 = {("a", "a"): 2.0}
    c2 = {("a", "b"): 1.0}
    agg = ev.merge_confusions([c1, c2])
    assert agg["accuracy"] == pytest.approx(2.0 / 3.0)
    assert agg["labels"]["a"]["recall"] == pytest.approx(2.0 / 3.0)
    assert agg["labels"]["b"]["precision"] == 0.0
    assert agg["scored_duration"] == pytest.approx(3.0)


def test_evaluate_combined_shape():
    rep = ev.evaluate(REF, HYP_SHIFT, collar=0.0)
    assert rep["frame_diff"] == pytest.approx(0.1)
    assert set(rep) >= {"frame_diff", "accuracy", "labels", "vad",
                        "boundaries"}


def test_cli_json_and_table(tmp_path, capsys):
    from inaspeechsegmenter_tpu.cli.evaluate import main

    rdir, hdir = tmp_path / "ref", tmp_path / "hyp"
    rdir.mkdir(), hdir.mkdir()
    seg2csv(REF, str(rdir / "f1.csv"))
    seg2csv(HYP_SHIFT, str(hdir / "f1.csv"))
    ref2 = [("male", 0.0, 1.0)]
    seg2csv(ref2, str(rdir / "f2.csv"))
    seg2csv(ref2, str(hdir / "f2.csv"))
    assert main(["-r", str(rdir), "-y", str(hdir), "--json"]) == 0
    doc = json.loads(capsys.readouterr().out)
    assert set(doc["files"]) == {"f1.csv", "f2.csv"}
    assert doc["files"]["f1.csv"]["frame_diff"] == pytest.approx(0.1)
    # corpus: 0.2 s wrong of 3.0 s total
    assert doc["corpus"]["accuracy"] == pytest.approx(1 - 0.2 / 3.0)
    assert doc["corpus"]["vad"]["miss_rate"] == 0.0
    assert doc["unmatched_references"] == []
    # table mode renders without error and mentions the corpus line
    assert main(["-r", str(rdir), "-y", str(hdir)]) == 0
    out = capsys.readouterr().out
    assert "corpus (2 file(s)" in out and "frame accuracy" in out


def test_cli_no_common_basenames(tmp_path, capsys):
    from inaspeechsegmenter_tpu.cli.evaluate import main

    rdir, hdir = tmp_path / "r", tmp_path / "h"
    rdir.mkdir(), hdir.mkdir()
    seg2csv(REF, str(rdir / "a.csv"))
    seg2csv(REF, str(hdir / "b.csv"))
    with pytest.raises(SystemExit):
        main(["-r", str(rdir), "-y", str(hdir)])


def test_cli_duplicate_basenames_rejected(tmp_path, capsys):
    """Basename collisions would silently last-win in the per-file report
    while double-counting in the corpus totals — hard error instead."""
    from inaspeechsegmenter_tpu.cli.evaluate import main

    d1, d2, h = tmp_path / "r1", tmp_path / "r2", tmp_path / "h"
    for d in (d1, d2, h):
        d.mkdir()
    seg2csv(REF, str(d1 / "f.csv"))
    seg2csv(REF, str(d2 / "f.csv"))
    seg2csv(REF, str(h / "f.csv"))
    with pytest.raises(SystemExit):
        main(["-r", str(d1), str(d2), "-y", str(h)])
    assert "duplicate reference basename" in capsys.readouterr().err


def test_cli_unmatched_pattern_rejected(tmp_path, capsys):
    """A glob/path matching nothing is a clean parser error up front, not
    a pandas FileNotFoundError traceback later."""
    from inaspeechsegmenter_tpu.cli.evaluate import main

    h = tmp_path / "h"
    h.mkdir()
    seg2csv(REF, str(h / "f.csv"))
    with pytest.raises(SystemExit):
        main(["-r", str(tmp_path / "nope" / "*.cvs"), "-y", str(h)])
    assert "matched no files" in capsys.readouterr().err
    (tmp_path / "emptydir").mkdir()
    with pytest.raises(SystemExit):
        main(["-r", str(tmp_path / "emptydir"), "-y", str(h)])
    assert "contains no *.csv" in capsys.readouterr().err


def test_evaluate_include_confusion_matches_standalone():
    rep = ev.evaluate(REF, HYP_SHIFT, include_confusion=True)
    assert rep["confusion"] == ev.confusion(REF, HYP_SHIFT)
    assert "confusion" not in ev.evaluate(REF, HYP_SHIFT)


def test_eval_on_pipeline_output(tmp_path, synthetic_model_dir):
    """End-to-end: a real segmentation scored against itself is perfect,
    and against a label-mangled copy is measurably imperfect."""
    from inaspeechsegmenter_tpu import Segmenter

    rng = np.random.default_rng(5)
    sig = (rng.standard_normal(16000 * 6) * 0.1).astype(np.float32)
    seg = Segmenter(vad_engine="smn", detect_gender=False, ffmpeg=None,
                    allow_download=False)
    lseg = seg.segment_signal(sig, 16000)
    assert ev.frame_diff(lseg, lseg) == 0.0
    rep = ev.evaluate(lseg, lseg)
    assert rep["accuracy"] == 1.0 and rep["boundaries"]["f1"] == 1.0
    mangled = [("noise" if lab == "speech" else lab, a, b)
               for lab, a, b in lseg]
    if mangled != lseg:
        assert ev.frame_diff(lseg, mangled) > 0.0


def test_cli_small_output_into_closed_pipe(tmp_path):
    """`... | head` with output SMALLER than the stdio buffer: nothing
    fails inside _render, so the BrokenPipeError surfaces at the final
    flush — which must happen INSIDE the handler (exit 0, no
    interpreter-shutdown 'Exception ignored' noise / exit 120)."""
    import subprocess
    import sys as _sys

    rdir, hdir = tmp_path / "ref", tmp_path / "hyp"
    rdir.mkdir(), hdir.mkdir()
    seg2csv([("male", 0.0, 1.0)], str(rdir / "f.csv"))
    seg2csv([("male", 0.0, 1.0)], str(hdir / "f.csv"))
    # `true` exits instantly: the read end is closed long before the CLI
    # (which pays ~1s of imports) writes its few hundred bytes.
    # PYTHONUNBUFFERED must be stripped: with it, every print write-through
    # fails INSIDE _render where the handler already catches it — the bug
    # only exists with default block-buffered piped stdout (normal shells)
    cmd = (f"env -u PYTHONUNBUFFERED {_sys.executable} "
           f"-m inaspeechsegmenter_tpu.cli.evaluate "
           f"-r {rdir} -y {hdir} --json | true; echo rc=${{PIPESTATUS[0]}}")
    r = subprocess.run(["bash", "-c", cmd], capture_output=True, text=True,
                       timeout=120, cwd="/root/repo")
    assert "rc=0" in r.stdout, (r.stdout, r.stderr)
    assert "Exception ignored" not in r.stderr, r.stderr
