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

import json
import os
import urllib.request
import warnings

import numpy as np

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


_HASH_CACHE = {}


def _file_sha256(path):
    """Content hash, memoized on (path, size, mtime_ns) so repeated
    resolutions of the same weight file hash it once per process."""
    import hashlib

    st = os.stat(path)
    key = (path, st.st_size, st.st_mtime_ns)
    h = _HASH_CACHE.get(key)
    if h is None:
        hh = hashlib.sha256()
        with open(path, "rb") as fh:
            for blk in iter(lambda: fh.read(1 << 20), b""):
                hh.update(blk)
        h = _HASH_CACHE[key] = hh.hexdigest()
    return h


def _npz_spec(path):
    """The embedded spec dict of a native checkpoint; ``{}`` for a valid
    npz without one (e.g. a ResNet checkpoint); ``None`` if the file is
    not a readable npz at all (corrupt / truncated — callers must not
    treat it as a checkpoint)."""
    try:
        with np.load(path, allow_pickle=False) as z:
            if "__spec__" not in z.files:
                return {}
            return json.loads(bytes(z["__spec__"].tobytes()).decode())
    except Exception:
        return None


def _npz_matches_source(spec, source_path):
    """Does the conversion cache's recorded source identity match
    ``source_path``?  ``None`` when the npz predates source recording
    (callers fall back to the mtime heuristic).  Content-based: an mtime
    comparison alone misclassifies timestamp-preserving installs
    (cp -p / rsync -a) of updated weights."""
    src = spec.get("source")
    if not isinstance(src, dict):
        return None
    if src.get("size") != os.path.getsize(source_path):
        return False
    return src.get("sha256") == _file_sha256(source_path)


def _npz_is_synthetic(path):
    """True if a native checkpoint is a random-weight synthetic stand-in."""
    spec = _npz_spec(path)
    return bool(spec and spec.get("synthetic"))


def _synthetic_allowed(path):
    """Synthetic stand-ins require explicit opt-in.

    Opt-in = the file lives under ISS_TPU_MODEL_DIR (the user pointed the
    registry there on purpose) or ISS_ALLOW_SYNTHETIC=1.  Without it a
    synthetic npz sitting in a shared cache directory must never shadow real
    released weights (it would silently produce garbage segmentations).
    """
    val = os.environ.get("ISS_ALLOW_SYNTHETIC", "").strip().lower()
    if val and val not in ("0", "false", "off", "no"):
        return True
    env = os.environ.get("ISS_TPU_MODEL_DIR")
    if env and os.path.abspath(path).startswith(os.path.abspath(env) + os.sep):
        return True
    return False


def get_remote(model_fname, allow_download=True, allow_synthetic=False):
    """Resolve a model filename to a local path.

    Search order: per directory in priority order (ISS_TPU_MODEL_DIR, the
    keras caches, the user cache), a native-converted `.npz` then the exact
    filename; then (optionally) download from the release URL into the
    cache dir.  A real weight file in a higher-priority directory therefore
    always beats a converted npz cached in a lower-priority one, and a
    same-directory npz older than its source file is ignored (stale
    conversion after a weight update).  Synthetic stand-in checkpoints are
    skipped unless explicitly opted into (see _synthetic_allowed); a
    skipped synthetic never shadows a real hdf5 found later in the search.
    """
    stem = os.path.splitext(model_fname)[0]

    def _usable_npz(p, source=None):
        if not os.access(p, os.R_OK):
            return False
        spec = _npz_spec(p)
        if spec is None:
            warnings.warn(
                f"ignoring unreadable native checkpoint {p} (corrupt or "
                "truncated npz); delete it to silence this warning",
                stacklevel=3)
            return False
        if spec.get("synthetic"):
            if source is not None:
                # real weights installed next to the stand-in always win
                return False
            return allow_synthetic or _synthetic_allowed(p)
        if source is not None:
            match = _npz_matches_source(spec, source)
            if match is not None:
                return match       # content-verified conversion (or not)
            if os.path.getmtime(p) < os.path.getmtime(source):
                return False       # stale conversion of an updated source
        return True

    for d in _search_dirs():
        npz = os.path.join(d, stem + ".npz")
        exact = os.path.join(d, model_fname)
        if _usable_npz(npz, exact if os.access(exact, os.R_OK) else None):
            return npz
        if os.access(exact, os.R_OK):
            # the conversion cache may live in a lower-priority dir (the
            # user cache): use it when it is REAL (a synthetic stand-in
            # must never shadow a real weight file) and provably derived
            # from this source — content identity when recorded, the
            # mtime heuristic for legacy caches without it
            for d2 in _search_dirs():
                p2 = os.path.join(d2, stem + ".npz")
                if not os.access(p2, os.R_OK):
                    continue
                spec2 = _npz_spec(p2)
                if not isinstance(spec2, dict) or spec2.get("synthetic"):
                    continue
                match = _npz_matches_source(spec2, exact)
                if (match if match is not None else
                        os.path.getmtime(p2) >= os.path.getmtime(exact)):
                    return p2
            return exact
    if allow_download and model_fname in DMODELS:
        url = DMODELS[model_fname] + model_fname
        dest = os.path.join(cache_dir(), model_fname)
        try:
            # download to a per-process temp name: an interrupted transfer
            # must not leave a truncated file at the path every later run
            # resolves, and concurrent farm workers sharing the cache dir
            # must not truncate each other's in-flight downloads
            tmp = f"{dest}.part{os.getpid()}"
            try:
                # explicit timeout: a packet-dropping firewall (common on
                # egress-less TPU hosts) must yield the clear error below,
                # not an indefinite hang on the first segmentation run
                with urllib.request.urlopen(url, timeout=60) as r, \
                        open(tmp, "wb") as fh:  # noqa: S310
                    import shutil

                    shutil.copyfileobj(r, fh)
                os.replace(tmp, dest)
            finally:
                if os.path.exists(tmp):
                    os.remove(tmp)
            return dest
        except Exception as exc:
            raise ModelNotFoundError(
                f"model {model_fname} not found locally and download from "
                f"{url} failed ({exc}). Place the file in one of "
                f"{_search_dirs()} or set ISS_TPU_MODEL_DIR."
            ) from exc
    raise ModelNotFoundError(
        f"model {model_fname} not found in {_search_dirs()}")


def load_patch_model(model_fname, allow_download=True, allow_synthetic=False):
    """Load a CNN/MLP by registry name, converting hdf5 -> native on first use."""
    from .keras_h5 import ImportedModel

    path = get_remote(model_fname, allow_download=allow_download,
                      allow_synthetic=allow_synthetic)
    if path.endswith(".npz"):
        model = ImportedModel.from_native(path)
        if model.spec.get("synthetic"):
            warnings.warn(
                f"loading SYNTHETIC random-weight stand-in {path} for "
                f"{model_fname}: outputs are not meaningful segmentations "
                "(install the released weights to get real results)",
                stacklevel=2)
        return model
    model = ImportedModel.from_h5(path)
    # record the source identity so cache reuse can verify CONTENT, not
    # just mtimes (timestamp-preserving weight installs otherwise resolve
    # to a stale conversion of the previous release)
    model.spec["source"] = {
        "name": os.path.basename(path),
        "size": os.path.getsize(path),
        "sha256": _file_sha256(path),
    }
    # cache the converted form for next time — atomically and with a
    # per-process temp name, like the download path: a worker killed
    # mid-write (or two converting concurrently) must not leave a
    # truncated npz that every later run resolves first
    try:
        stem = os.path.splitext(os.path.basename(path))[0]
        dest = os.path.join(cache_dir(), stem + ".npz")
        tmp = f"{dest}.part{os.getpid()}.npz"
        try:
            model.save_native(tmp)
            os.replace(tmp, dest)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
    except OSError:
        pass
    return model
