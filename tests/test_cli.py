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
