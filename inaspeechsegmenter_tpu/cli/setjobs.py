"""CLI: re-feed a running job server (replaces
reference scripts/ina_speech_segmenter_pyro_client_setjobs.py)."""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(
        description='Feed a new job csv (source_path,dest_path columns) to '
                    'a running job server.')
    parser.add_argument('uri', type=str,
                        help='Server uri, e.g. tcp://host:4040')
    parser.add_argument('csvjobs', type=str,
                        help='csv file with source_path,dest_path columns')
    args = parser.parse_args(argv)

    from inaspeechsegmenter_tpu.parallel import JobClient

    client = JobClient(args.uri)
    print(client.set_jobs(args.csvjobs))
    client.close()


if __name__ == '__main__':
    main()
