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

import jax
import jax.numpy as jnp

PATCH_W = 68
PATCH_STEP = 2
LPAD = PATCH_W // (2 * PATCH_STEP)  # 17


def n_output_frames(n_frames: int):
    """Number of 20 ms output frames = ceil(T/2); works on traced values."""
    return (n_frames + 1) // 2


def patch_rows(j, n_frames):
    """Map output-frame index j -> starting mel row of its patch (clipped).

    n_frames < 68 clamps to one row-0 patch (callers are expected to pad
    short media to 68 frames first — reference segmenter.py:60-66 — but a
    negative clip bound would silently wrap indices into garbage)."""
    n_rows = jnp.maximum((n_frames - PATCH_W) // PATCH_STEP + 1, 1)
    r = jnp.clip(j - LPAD, 0, n_rows - 1)
    return r * PATCH_STEP


def normalized_windows_ext(mspec, n_frames, nmel):
    """Gather-free patch construction for the fused pipeline.

    Materializes every stride-2 window of `mspec` via 68 strided row slices
    (pure vector ops — XLA gathers of small rows run on the TPU scalar core
    and are ~100x slower), normalizes per window, then prepends 17 copies of
    window 0 so that output frame j's patch is simply row j of the result
    for j <= n_rows+16; callers fix the right replicate edge with the also
    returned last valid window (reference padding semantics,
    segmenter.py:83-85).

    :param mspec: (Tpad, >=nmel) with Tpad even.
    :param n_frames: true 10 ms frame count (traced ok).
    :param nmel: static mel truncation.
    :return: (norm_ext (Tpad/2+17, 68*nmel), fin_ext (Tpad/2+17,),
              last_norm (1, 68*nmel), last_fin (1,), n_rows)
    """
    t_pad = mspec.shape[0]
    r_pad = t_pad // 2
    m = mspec[:, :nmel]
    m = jnp.pad(m, ((0, PATCH_W), (0, 0)))
    # windows[r, k] = m[2r + k]: stack 68 stride-2 row slices
    cols = [jax.lax.slice(m, (k, 0), (k + 2 * (r_pad - 1) + 1, nmel), (2, 1))
            for k in range(PATCH_W)]
    w = jnp.stack(cols, axis=1)                        # (r_pad, 68, nmel)
    flat = w.reshape(r_pad, -1)
    mean = jnp.mean(flat, axis=1, keepdims=True)
    std = jnp.std(flat, axis=1, keepdims=True)
    norm = (flat - mean) / std
    finite = jnp.all(jnp.isfinite(norm), axis=1)

    n_rows = jnp.maximum((n_frames - PATCH_W) // PATCH_STEP + 1, 1)
    norm_ext = jnp.concatenate(
        [jnp.broadcast_to(norm[0:1], (LPAD, norm.shape[1])), norm])
    fin_ext = jnp.concatenate(
        [jnp.broadcast_to(finite[0:1], (LPAD,)), finite])
    last_norm = jax.lax.dynamic_slice(
        norm, (n_rows - 1, 0), (1, norm.shape[1]))
    last_fin = jax.lax.dynamic_slice(finite, (n_rows - 1,), (1,))
    return norm_ext, fin_ext, last_norm, last_fin, n_rows


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
