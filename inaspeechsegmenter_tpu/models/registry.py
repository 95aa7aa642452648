"""Model weight resolution and caching.

Mirrors the reference registry (remote_utils.py:4-27): 7 model filenames
mapped to 2 GitHub release URLs, with a Docker-baked `/root/.keras` fast path
and a user cache.  Additions for the TPU build:

* native `.npz` checkpoints (spec+params, see keras_h5.save_native) are
  preferred when present — hdf5 files found once are converted and cached so
  subsequent loads skip hdf5 parsing;
* `ISS_TPU_MODEL_DIR` env var points at an offline weight directory;
* downloads degrade gracefully to a clear error when there is no network
  (TPU pods frequently run egress-less).
"""

from __future__ import annotations

import os
import urllib.request

ISS_URL = "https://github.com/ina-foss/inaSpeechSegmenter/releases/download/models/"
VFS_URL = "https://github.com/ina-foss/inaSpeechSegmenter/releases/download/interspeech23/"

DMODELS = {
    "keras_speech_music_cnn.hdf5": ISS_URL,
    "keras_speech_music_noise_cnn.hdf5": ISS_URL,
    "keras_male_female_cnn.hdf5": ISS_URL,
    "interspeech2023_all.hdf5": VFS_URL,
    "interspeech2023_cvfr.hdf5": VFS_URL,
    "final.onnx": VFS_URL,
    "raw_81.pth": VFS_URL,
}


class ModelNotFoundError(FileNotFoundError):
    pass


def _search_dirs():
    dirs = []
    env = os.environ.get("ISS_TPU_MODEL_DIR")
    if env:
        dirs.append(env)
    dirs.append("/root/.keras/inaSpeechSegmenter")
    dirs.append(os.path.expanduser("~/.keras/inaSpeechSegmenter"))
    dirs.append(os.path.expanduser("~/.cache/inaspeechsegmenter_tpu"))
    return dirs


def cache_dir():
    d = os.environ.get("ISS_TPU_MODEL_DIR") or os.path.expanduser(
        "~/.cache/inaspeechsegmenter_tpu")
    os.makedirs(d, exist_ok=True)
    return d


def get_remote(model_fname, allow_download=True):
    """Resolve a model filename to a local path.

    Search order: native-converted `.npz` in any search dir, the exact
    filename in any search dir, then (optionally) download from the release
    URL into the cache dir.
    """
    stem = os.path.splitext(model_fname)[0]
    for d in _search_dirs():
        p = os.path.join(d, stem + ".npz")
        if os.access(p, os.R_OK):
            return p
    for d in _search_dirs():
        p = os.path.join(d, model_fname)
        if os.access(p, os.R_OK):
            return p
    if allow_download and model_fname in DMODELS:
        url = DMODELS[model_fname] + model_fname
        dest = os.path.join(cache_dir(), model_fname)
        try:
            urllib.request.urlretrieve(url, dest)  # noqa: S310
            return dest
        except Exception as exc:
            raise ModelNotFoundError(
                f"model {model_fname} not found locally and download from "
                f"{url} failed ({exc}). Place the file in one of "
                f"{_search_dirs()} or set ISS_TPU_MODEL_DIR."
            ) from exc
    raise ModelNotFoundError(
        f"model {model_fname} not found in {_search_dirs()}")


def load_patch_model(model_fname, allow_download=True):
    """Load a CNN/MLP by registry name, converting hdf5 -> native on first use."""
    from .keras_h5 import ImportedModel

    path = get_remote(model_fname, allow_download=allow_download)
    if path.endswith(".npz"):
        return ImportedModel.from_native(path)
    model = ImportedModel.from_h5(path)
    # cache the converted form next time
    try:
        stem = os.path.splitext(os.path.basename(path))[0]
        model.save_native(os.path.join(cache_dir(), stem + ".npz"))
    except OSError:
        pass
    return model
