"""Sliding-patch extraction + per-patch normalization, on device.

The reference materializes every (68, nmel) patch with skimage
`view_as_windows`, normalizes each patch by its own mean/std, then
replicate-pads 17 patches at the front and `16 + T%2` at the back so the
output counts one patch per 20 ms frame (reference segmenter.py:76-88).

TPU formulation: patch j (one per 20 ms output frame, j in [0, ceil(T/2)))
reads rows [2r, 2r+68) of the mel spectrogram where
``r = clip(j - 17, 0, n_rows-1)`` and ``n_rows = (T-68)//2 + 1`` — the clip
reproduces the replicate padding exactly without ever materializing the
duplicated edge patches.  Gather + normalization run in fixed-size chunks so
shapes stay static and memory bounded regardless of file length.
"""

from __future__ import annotations

import jax.numpy as jnp

PATCH_W = 68
PATCH_STEP = 2
LPAD = PATCH_W // (2 * PATCH_STEP)  # 17


def n_output_frames(n_frames: int):
    """Number of 20 ms output frames = ceil(T/2); works on traced values."""
    return (n_frames + 1) // 2


def patch_rows(j, n_frames):
    """Map output-frame index j -> starting mel row of its patch (clipped)."""
    n_rows = (n_frames - PATCH_W) // PATCH_STEP + 1
    r = jnp.clip(j - LPAD, 0, n_rows - 1)
    return r * PATCH_STEP


def gather_normalized_patches(mspec, j_idx, n_frames, nmel):
    """Gather patches for output frames `j_idx` and normalize per patch.

    :param mspec: (Tpad, >=nmel) device array (may be padded past n_frames).
    :param j_idx: (B,) int32 output-frame indices.
    :param n_frames: true number of 10 ms frames (traced scalar ok).
    :param nmel: number of mel bands consumed by the model (static).
    :return: (patches (B, 68, nmel) f32, finite (B,) bool)
    """
    starts = patch_rows(j_idx, n_frames)                      # (B,)
    rows = starts[:, None] + jnp.arange(PATCH_W)[None, :]     # (B, 68)
    patches = mspec[rows, :nmel]                              # (B, 68, nmel)
    flat = patches.reshape(patches.shape[0], -1)
    mean = jnp.mean(flat, axis=1, keepdims=True)
    std = jnp.std(flat, axis=1, keepdims=True)
    norm = (flat - mean) / std
    finite = jnp.all(jnp.isfinite(norm), axis=1)
    return norm.reshape(patches.shape), finite
