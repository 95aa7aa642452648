"""Shared CLI bootstrap for the segmentation and VFS commands."""

from __future__ import annotations

import glob
import os


def resolve_ffmpeg(name):
    """The reference's 'none' convention: returns None (WAV-only mode) with
    the reference's notice printed, else the binary name unchanged."""
    if name.lower() == 'none' or name == '':
        print('Disabling ffmpeg. Make sure your audio files are already '
              'sampled at 16kHz.')
        return None
    return name


def expand_inputs(patterns, allow_urls=False):
    """Glob expansion keeping http urls verbatim when allowed (reference
    scripts/ina_speech_segmenter.py:62-68); asserts a non-empty result."""
    files = []
    for e in patterns:
        if allow_urls and e.startswith('http'):
            files.append(e)
        else:
            files += glob.glob(e)
    assert len(files) > 0, \
        'No existing media selected for analysis! Bad values provided to ' \
        '-i (%s)' % patterns
    return files


def check_outdir(output_directory):
    """Strip/normalize the output dir and assert it is writable."""
    odir = output_directory.strip(' \t\n\r').rstrip('/')
    assert os.access(odir, os.W_OK), 'Directory %s is not writable!' % odir
    return odir


def output_paths(input_files, odir, ext):
    return [os.path.join(odir,
                         os.path.splitext(os.path.basename(e))[0] + '.' + ext)
            for e in input_files]


def bootstrap_runtime():
    """Honor an explicit JAX_PLATFORMS and enable the persistent compile
    cache — call before constructing any model."""
    from inaspeechsegmenter_tpu.utils.cache import enable_compilation_cache
    from inaspeechsegmenter_tpu.utils.env import apply_platform_env

    apply_platform_env()
    enable_compilation_cache()
