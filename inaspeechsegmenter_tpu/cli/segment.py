"""CLI: speech/music(/noise) + gender segmentation to csv/TextGrid.

Flag-compatible with the reference script
(reference scripts/ina_speech_segmenter.py:45-84): -i input globs/urls,
-o output dir, -s batch size, -d vad engine, -g detect gender, -b ffmpeg
binary ('none' to disable), -e export format, -r energy ratio.  Adds
--parallel to shard files across all local TPU chips.
"""

from __future__ import annotations

import argparse
import os
import warnings

description = (
    "Segment media files into speech/music(/noise) regions, optionally "
    "splitting speech by speaker gender, and write one CSV (or TextGrid) "
    "timeline per input. Regions labelled 'noEnergy' are excluded from all "
    "downstream analysis; 'speech'/'male'/'female' cover speech even when "
    "mixed with music or noise, while 'music' and 'noise' denote pure "
    "non-speech regions. TPU-native engine with the inaSpeechSegmenter "
    "command-line surface."
)


def build_parser():
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument('-i', '--input', nargs='+', required=True,
                        help='Input media to analyse: full path(s), glob '
                             'pattern(s), or http urls.')
    parser.add_argument('-o', '--output_directory', required=True,
                        help='Directory used to store segmentations (same '
                             'base name as input, csv/TextGrid extension).')
    parser.add_argument('-s', '--batch_size', type=int, default=32,
                        help='API-parity batch size hint (the TPU pipeline '
                             'always uses fixed device chunks).')
    parser.add_argument('-d', '--vad_engine', choices=['sm', 'smn'],
                        default='smn')
    parser.add_argument('-g', '--detect_gender', choices=['true', 'false'],
                        default='true')
    parser.add_argument('-b', '--ffmpeg_binary', default='ffmpeg',
                        help="Custom ffmpeg binary; 'none' to disable.")
    parser.add_argument('-e', '--export_format', choices=['csv', 'textgrid'],
                        default='csv')
    parser.add_argument('-r', '--energy_ratio', default=0.03, type=float)
    parser.add_argument('--parallel', action='store_true',
                        help='Shard files across all local devices.')
    parser.add_argument('--follow', action='store_true',
                        help='Tail ONE growing PCM16 mono 16 kHz WAV file '
                             '(a recording in progress): segment appended '
                             'audio incrementally, finalize + export when '
                             'the file stops growing.')
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
        if len(args.input) != 1:   # parser.error: assert strips under -O
            parser.error('--follow takes exactly one input file')
        # the followed recording may not exist YET (a recorder about to
        # start writing) — skip the exists-assert glob expansion
        input_files = list(args.input)
    else:
        input_files = expand_inputs(args.input, allow_urls=True)
    odir = check_outdir(args.output_directory)
    bootstrap_runtime()

    from inaspeechsegmenter_tpu import Segmenter

    detect_gender = args.detect_gender.lower() == 'true'
    seg = Segmenter(vad_engine=args.vad_engine, detect_gender=detect_gender,
                    ffmpeg=args.ffmpeg_binary, energy_ratio=args.energy_ratio,
                    batch_size=args.batch_size)

    import contextlib

    trace_dir = os.environ.get('ISS_TRACE_DIR')
    if trace_dir:
        from inaspeechsegmenter_tpu.utils.timing import jax_trace

        trace_cm = jax_trace(trace_dir)
    else:
        trace_cm = contextlib.nullcontext()

    with warnings.catch_warnings(), trace_cm:
        warnings.simplefilter('ignore')
        output_files = output_paths(input_files, odir, args.export_format)
        if args.follow:
            from inaspeechsegmenter_tpu.export import seg2csv, seg2textgrid
            from inaspeechsegmenter_tpu.online import follow_wav

            fexport = {'csv': seg2csv, 'textgrid': seg2textgrid}[
                args.export_format]

            def report(o):
                if o.chunks_ready >= 2:
                    # provisional decode reuses cached emissions; before
                    # two chunks exist current() would re-segment the
                    # whole buffered prefix per tick — print cheap
                    # progress instead
                    print(f'[follow] {o.seconds_fed:.0f}s fed, '
                          f'{len(o.current())} provisional segments',
                          flush=True)
                else:
                    print(f'[follow] {o.seconds_fed:.0f}s fed '
                          '(buffering first chunks)', flush=True)

            lseg = follow_wav(input_files[0], seg,
                              idle_timeout=args.follow_idle,
                              on_update=report)
            fexport(lseg, output_files[0])
            print(f'[follow] finalized {len(lseg)} segments -> '
                  f'{output_files[0]}', flush=True)
        elif args.parallel:
            from inaspeechsegmenter_tpu.parallel import ParallelEngine

            ParallelEngine(seg).batch_process(
                input_files, output_files, verbose=True,
                output_format=args.export_format)
        else:
            seg.batch_process(input_files, output_files, verbose=True,
                              output_format=args.export_format)


if __name__ == '__main__':
    main()
