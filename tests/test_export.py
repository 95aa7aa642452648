"""Export byte-parity: csv and TextGrid against golden reference fixtures."""

import filecmp

import pandas as pd

from inaspeechsegmenter_tpu.export import seg2csv, seg2textgrid

import pytest

pytestmark = pytest.mark.smoke


def _golden_lseg(media_dir, name):
    df = pd.read_csv(f"{media_dir}/{name}", sep="\t",
                     float_precision="round_trip")
    return [(r.labels, r.start, r.stop) for r in df.itertuples()]


def test_csv_roundtrip_bytes(tmp_path, media_dir):
    """Float formatting must survive a read->write roundtrip byte-exactly
    (values like 22.480000000000002 from 0.02 arithmetic)."""
    for name in ["musanmix-sm-gender.csv", "musanmix-smn-gender.csv",
                 "0021-smn-gender.csv", "silence2sec-smn-gender.csv"]:
        lseg = _golden_lseg(media_dir, name)
        out = str(tmp_path / name)
        seg2csv(lseg, out)
        assert filecmp.cmp(out, f"{media_dir}/{name}", shallow=False), name


def test_textgrid_bytes(tmp_path, media_dir):
    lseg = _golden_lseg(media_dir, "musanmix-smn-gender.csv")
    out = str(tmp_path / "m.TextGrid")
    seg2textgrid(lseg, out)
    assert filecmp.cmp(out, f"{media_dir}/musanmix-smn-gender.TextGrid",
                       shallow=False)


def test_frame_time_arithmetic():
    """start_sec + frame*0.02 must reproduce the reference float artifacts."""
    assert repr(0 + 1124 * .02) == "22.48"
    assert repr(0 + 1454 * .02) == "29.080000000000002"
    assert repr(0 + 2640 * .02) == "52.800000000000004"


def test_textgrid_empty_lseg(tmp_path):
    """An empty segmentation exports an empty 0-duration tier instead of
    crashing (reachable via batch_process(output_format='textgrid') on a
    filtered-to-empty result)."""
    out = str(tmp_path / "empty.TextGrid")
    seg2textgrid([], out)
    body = open(out).read()
    assert "intervals: size = 0" in body
    assert "xmin = 0.000000" in body and "xmax = 0.000000" in body
