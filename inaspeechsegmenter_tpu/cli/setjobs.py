"""CLI: re-feed a running job server (replaces
reference scripts/ina_speech_segmenter_pyro_client_setjobs.py)."""

from __future__ import annotations

import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    uri, csvfname = argv[0], argv[1]

    from inaspeechsegmenter_tpu.parallel import JobClient

    client = JobClient(uri)
    print(client.set_jobs(csvfname))
    client.close()


if __name__ == '__main__':
    main()
