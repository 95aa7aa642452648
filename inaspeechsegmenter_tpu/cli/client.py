"""CLI: job-lease worker client (replaces the Pyro4 client script,
reference scripts/ina_speech_segmenter_pyro_client.py:34-74)."""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(
        description='Start a segmentation worker that pulls job leases.')
    parser.add_argument('uri', type=str,
                        help='Server uri, e.g. tcp://host:4040')
    parser.add_argument('--batch_size', type=int, default=1024)
    parser.add_argument('--ffmpeg_binary', default='ffmpeg', type=str)
    parser.add_argument('--parallel', action='store_true',
                        help='Shard leased files across local devices.')
    parser.add_argument('--vfs', action='store_true',
                        help='Run voice-femininity-scoring jobs instead of '
                             'segmentation (one score csv per input).')
    parser.add_argument('--gd_model_criteria', default='bgc',
                        choices=['bgc', 'vfp'],
                        help='VFS gender-detection model criteria.')
    parser.add_argument('--lease_timeout', type=float, default=30.0,
                        help='Seconds per job-server socket op before the '
                             'worker retries and then exits cleanly.')
    parser.add_argument('--lease_reconnect', type=int, default=2,
                        help='Fresh-connection retries per lease call.')
    args = parser.parse_args(argv)

    from inaspeechsegmenter_tpu.cli._common import (bootstrap_runtime,
                                                    resolve_ffmpeg)

    args.ffmpeg_binary = resolve_ffmpeg(args.ffmpeg_binary)
    # restarted workers (per lease batch / after a crash) warm-start from
    # the persistent cache instead of repaying 20-40 s per bucket compile
    bootstrap_runtime()

    from inaspeechsegmenter_tpu.parallel import client_work_loop

    if args.vfs:
        from inaspeechsegmenter_tpu.vfs import VoiceFemininityScoring

        mesh = None
        if args.parallel:
            # --parallel for VFS jobs: shard each file's x-vector window
            # batches over the local devices (the ResNet dominates VFS
            # cost; silently ignoring the flag here ran the farm at a
            # fraction of expected throughput)
            from inaspeechsegmenter_tpu.parallel import make_mesh

            mesh = make_mesh()
        worker = VoiceFemininityScoring(
            gd_model_criteria=args.gd_model_criteria,
            ffmpeg=args.ffmpeg_binary, mesh=mesh)
    else:
        from inaspeechsegmenter_tpu import Segmenter

        worker = Segmenter(batch_size=args.batch_size,
                           ffmpeg=args.ffmpeg_binary)
        if args.parallel:
            from inaspeechsegmenter_tpu.parallel import ParallelEngine

            worker = ParallelEngine(worker)
    client_work_loop(args.uri, worker, timeout=args.lease_timeout,
                     reconnect=args.lease_reconnect)


if __name__ == '__main__':
    main()
