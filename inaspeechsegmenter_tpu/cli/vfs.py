"""CLI: voice femininity scoring to csv.

Framework extension: the reference exposes VoiceFemininityScoring only as
a Python API (reference vbx_segmenter.py:92-202; its CLI scripts cover
segmentation only).  This command gives the VFS pipeline the same shell
surface as `ina_speech_segmenter` — glob inputs, output directory, retry
and resume semantics — writing one tab-separated csv per input with
columns `score / speech_duration / nb_vectors`.
"""

from __future__ import annotations

import argparse
import warnings

description = (
    "Score voice femininity of media files: x-vector speaker embeddings "
    "(ResNet101) over detected speech, scored by the interspeech2023 MLP. "
    "Writes one tab-separated csv per input (score, speech_duration, "
    "nb_vectors; score is empty when no speech is detected). TPU-native "
    "engine with the inaSpeechSegmenter command-line conventions."
)


def build_parser():
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument('-i', '--input', nargs='+', required=True,
                        help='Input media to analyse: full path(s), glob '
                             'pattern(s), or http urls (urls need ffmpeg).')
    parser.add_argument('-o', '--output_directory', required=True,
                        help='Directory used to store score csvs (same base '
                             'name as input, csv extension).')
    parser.add_argument('-c', '--gd_model_criteria', default='bgc',
                        choices=['bgc', 'vfp'],
                        help='Gender-detection model criteria: bgc = '
                             'interspeech2023_all (VAD overlap 0.7), vfp = '
                             'interspeech2023_cvfr (0.62).')
    parser.add_argument('-b', '--ffmpeg_binary', default='ffmpeg',
                        help="Custom ffmpeg binary; 'none' to disable "
                             '(inputs must then be 16 kHz WAV).')
    parser.add_argument('--skipifexist', action='store_true',
                        help='Skip inputs whose output csv already exists '
                             '(idempotent corpus reruns).')
    parser.add_argument('--nbtry', type=int, default=1,
                        help='Attempts per file before reporting an error.')
    parser.add_argument('--parallel', action='store_true',
                        help='Shard each file\'s x-vector window batches '
                             'across all local devices (data-parallel '
                             'mesh); scores are identical to the '
                             'single-device path.')
    parser.add_argument('--follow', action='store_true',
                        help='Tail ONE growing PCM16 mono 16 kHz WAV file '
                             '(a recording in progress): print provisional '
                             'scores, write the csv when it stops growing.')
    parser.add_argument('--follow_idle', type=float, default=10.0,
                        help='Seconds without file growth before --follow '
                             'finalizes.')
    return parser


def main(argv=None):
    from inaspeechsegmenter_tpu.cli._common import (bootstrap_runtime,
                                                    check_outdir,
                                                    expand_inputs,
                                                    output_paths,
                                                    resolve_ffmpeg)

    parser = build_parser()
    args = parser.parse_args(argv)
    args.ffmpeg_binary = resolve_ffmpeg(args.ffmpeg_binary)
    if args.follow:
        # parser.error (not assert: stripped under python -O) — and the
        # corpus flags are meaningless on a live tail
        if len(args.input) != 1:
            parser.error('--follow takes exactly one input file')
        if args.skipifexist:
            parser.error('--skipifexist does not combine with --follow '
                         '(a live tail always writes its csv at finalize)')
        # the followed recording may not exist YET (a recorder about to
        # start writing) — skip the exists-assert glob expansion
        input_files = list(args.input)
    else:
        input_files = expand_inputs(args.input, allow_urls=True)
    odir = check_outdir(args.output_directory)
    bootstrap_runtime()

    from inaspeechsegmenter_tpu.vfs import (VoiceFemininityScoring,
                                            score_to_csv)

    mesh = None
    if args.parallel:
        import jax

        from inaspeechsegmenter_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) > 1:
            mesh = make_mesh()
        else:
            print('[vfs] --parallel: one local device, '
                  'running single-device', flush=True)
    vfs = VoiceFemininityScoring(gd_model_criteria=args.gd_model_criteria,
                                 ffmpeg=args.ffmpeg_binary, mesh=mesh)

    output_files = output_paths(input_files, odir, 'csv')
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        if args.follow:
            from inaspeechsegmenter_tpu.online import follow_wav_vfs

            def report(o):
                fed = o.vad_online.seconds_fed
                if o.vad_online.chunks_ready < 2:
                    # current() on a sub-group prefix would re-run the
                    # offline VAD over the whole buffer per tick (same
                    # guard as the segmentation CLI's report)
                    print(f'[follow] {fed:.0f}s fed (buffering first '
                          'chunks)', flush=True)
                    return
                score, dur, n = o.current()
                print(f'[follow] {fed:.0f}s fed, provisional score='
                      f'{"-" if score is None else f"{score:.3f}"} '
                      f'(speech {dur:.1f}s, {n} windows)', flush=True)

            result = follow_wav_vfs(input_files[0], vfs,
                                    idle_timeout=args.follow_idle,
                                    on_update=report)
            score_to_csv(result, output_files[0])
            print(f'[follow] finalized -> {output_files[0]}', flush=True)
        else:
            vfs.batch_score(input_files, output_files, verbose=True,
                            skipifexist=args.skipifexist, nbtry=args.nbtry)


if __name__ == '__main__':
    main()
