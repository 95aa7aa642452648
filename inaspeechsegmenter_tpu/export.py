"""Segmentation export: tab-separated csv and Praat TextGrid.

Byte-compatible with the reference exports (reference export_funcs.py:29-39):
csv is written through pandas with default float formatting (so values like
`22.480000000000002` survive verbatim), and the TextGrid writer reproduces
the pytextgrid `PraatTextGrid` layout (single tier named 'inaSpeechSegmenter',
%f-formatted times, tab indentation) without the pytextgrid dependency.
"""

from __future__ import annotations

import pandas as pd


def seg2csv(lseg, fout=None):
    df = pd.DataFrame.from_records(lseg, columns=["labels", "start", "stop"])
    df.to_csv(fout, sep="\t", index=False)


def seg2textgrid(lseg, fout=None):
    # an empty segmentation exports an empty tier (0-duration grid) rather
    # than crashing — reachable via batch_process(output_format='textgrid')
    # on a file whose segments were all filtered out
    xmin = lseg[0][1] if lseg else 0.0
    xmax = lseg[-1][2] if lseg else 0.0
    lines = [
        'File type = "ooTextFile"',
        'Object class = "TextGrid"',
        "",
        "xmin = %f" % xmin,
        "xmax = %f" % xmax,
        "tiers? <exists> ",
        "size = 1",
        "item []:",
        "\titem [1]:",
        '\t\tclass = "IntervalTier"',
        '\t\tname = "inaSpeechSegmenter"',
        "\t\txmin = %f" % xmin,
        "\t\txmax = %f" % xmax,
        "\t\tintervals: size = %d" % len(lseg),
    ]
    for i, (label, start, stop) in enumerate(lseg, start=1):
        lines.append("\t\tintervals[%d]:" % i)
        lines.append("\t\t\t xmin = %f" % start)
        lines.append("\t\t\t xmax = %f" % stop)
        lines.append('\t\t\t text = "%s"' % label)
    payload = "\n".join(lines) + "\n"
    if fout is None:
        return payload
    if hasattr(fout, "write"):
        fout.write(payload)
    else:
        with open(fout, "w") as f:
            f.write(payload)
