"""CLI integration: run the real segment CLI in-process against WAV media
(the reference's test_program pattern, run_test.py:136-148, without golden
weights)."""

import os

import pytest


def test_cli_segment(synthetic_model_dir, media_dir, tmp_path, capsys):
    from inaspeechsegmenter_tpu.cli.segment import main

    outdir = str(tmp_path)
    main(["-i", f"{media_dir}/silence2sec.wav", f"{media_dir}/lamartine.wav",
          "-o", outdir, "-d", "smn", "-g", "false", "-b", "none",
          "-e", "csv"])
    with open(os.path.join(outdir, "silence2sec.csv")) as f:
        assert f.read() == "labels\tstart\tstop\nnoEnergy\t0.0\t1.98\n"
    assert os.path.exists(os.path.join(outdir, "lamartine.csv"))


def test_cli_textgrid(synthetic_model_dir, media_dir, tmp_path):
    from inaspeechsegmenter_tpu.cli.segment import main

    main(["-i", f"{media_dir}/silence2sec.wav", "-o", str(tmp_path),
          "-d", "smn", "-g", "true", "-b", "none", "-e", "textgrid"])
    content = (tmp_path / "silence2sec.textgrid").read_text()
    assert 'name = "inaSpeechSegmenter"' in content
    assert 'text = "noEnergy"' in content


def test_cli_glob_and_missing(synthetic_model_dir, tmp_path):
    from inaspeechsegmenter_tpu.cli.segment import main

    with pytest.raises(AssertionError, match="No existing media"):
        main(["-i", "/nonexistent/*.wav", "-o", str(tmp_path), "-b", "none"])


def test_cli_parallel(synthetic_model_dir, media_dir, tmp_path):
    from inaspeechsegmenter_tpu.cli.segment import main

    main(["-i", f"{media_dir}/silence2sec.wav", "-o", str(tmp_path),
          "-d", "smn", "-g", "true", "-b", "none", "--parallel"])
    assert (tmp_path / "silence2sec.csv").read_text() == \
        "labels\tstart\tstop\nnoEnergy\t0.0\t1.98\n"


def test_cli_vfs(synthetic_model_dir, media_dir, tmp_path, monkeypatch):
    """ina_speech_segmenter_vfs writes one score csv per input.

    The synthetic model dir carries no x-vector weights, so inject a tiny
    ResNet through the class symbol the CLI resolves at call time.
    """
    import functools

    import inaspeechsegmenter_tpu.vfs as vfs_mod
    from inaspeechsegmenter_tpu.models.resnet import ResNetXVector

    net = ResNetXVector("bottleneck", (1, 1, 1, 1), 8, 64, 256)
    monkeypatch.setattr(
        vfs_mod, "VoiceFemininityScoring",
        functools.partial(vfs_mod.VoiceFemininityScoring,
                          allow_download=False, xvector_net=net,
                          xvector_params=net.init_params(seed=7)))
    from inaspeechsegmenter_tpu.cli.vfs import main

    main(["-i", f"{media_dir}/silence2sec.wav", f"{media_dir}/lamartine.wav",
          "-o", str(tmp_path), "-c", "vfp", "-b", "none"])
    header, row = (tmp_path / "silence2sec.csv").read_text().splitlines()
    assert header == "score\tspeech_duration\tnb_vectors"
    assert row.split("\t") == ["", "0.0", "0"]      # silence: score None
    header, row = (tmp_path / "lamartine.csv").read_text().splitlines()
    score, dur, n = row.split("\t")
    assert float(dur) >= 0.0 and int(n) >= 0
    if score:
        assert 0.0 <= float(score) <= 1.0


def test_cli_vfs_missing_input(synthetic_model_dir, tmp_path):
    from inaspeechsegmenter_tpu.cli.vfs import main

    with pytest.raises(AssertionError, match="No existing media"):
        main(["-i", "/nonexistent/*.wav", "-o", str(tmp_path), "-b", "none"])


def test_setjobs_and_server_cli(tmp_path, capsys):
    import pandas as pd

    from inaspeechsegmenter_tpu.parallel import JobServer
    from inaspeechsegmenter_tpu.cli.setjobs import main as setjobs_main

    csv = tmp_path / "jobs.csv"
    pd.DataFrame({"source_path": ["/a.wav"], "dest_path": ["/a.csv"]}
                 ).to_csv(csv, index=False)
    srv = JobServer(str(csv))
    tcp, uri = srv.serve(host="127.0.0.1", port=0)
    try:
        setjobs_main([uri, str(csv)])
        out = capsys.readouterr().out
        assert "jobs from" in out and "queued" in out
    finally:
        tcp.shutdown()
        tcp.server_close()


def test_setjobs_cli_usage_errors():
    """setjobs uses argparse like its siblings: missing args and --help
    exit cleanly with usage text instead of IndexError/tracebacks."""
    import pytest

    from inaspeechsegmenter_tpu.cli.setjobs import main

    with pytest.raises(SystemExit) as e:
        main([])
    assert e.value.code != 0
    with pytest.raises(SystemExit) as e:
        main(["--help"])
    assert e.value.code == 0


def test_client_vfs_parallel_builds_mesh(monkeypatch, synthetic_model_dir):
    """--parallel with --vfs shards x-vector batches over a local mesh
    instead of being silently ignored."""
    import inaspeechsegmenter_tpu.parallel as par
    import inaspeechsegmenter_tpu.vfs as vfs_mod
    from inaspeechsegmenter_tpu.cli.client import main

    captured = {}

    class FakeVFS:
        def __init__(self, **kw):
            captured.update(kw)

    monkeypatch.setattr(vfs_mod, "VoiceFemininityScoring", FakeVFS)
    monkeypatch.setattr(par, "client_work_loop",
                        lambda uri, worker, **kw: captured.setdefault(
                            "looped", True))
    main(["tcp://127.0.0.1:1", "--vfs", "--parallel",
          "--ffmpeg_binary", "none"])
    assert captured["looped"] and captured["mesh"] is not None
    assert captured["mesh"].devices.size >= 1
    captured.clear()
    main(["tcp://127.0.0.1:1", "--vfs", "--ffmpeg_binary", "none"])
    assert captured["mesh"] is None


def test_verify_tool_xvec_npz_report(tmp_path, capsys):
    """The acceptance tool reports a registry-resolved native npz as a
    native checkpoint instead of false-FAILing the raw-format loaders."""
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    try:
        import verify_weights as vw
    finally:
        sys.path.pop(0)
    import numpy as np

    from inaspeechsegmenter_tpu.vfs import save_resnet_npz

    p = str(tmp_path / "raw_81.npz")
    save_resnet_npz(p, {"a": np.zeros(3), "b": [np.ones((2, 2))]})
    vw.RESULTS.clear()
    assert vw.report_pth(p) is True
    out = capsys.readouterr().out
    assert "native npz checkpoint" in out and "PASS" in out
