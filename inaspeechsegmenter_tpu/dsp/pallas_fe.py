"""Pallas TPU kernel: fully fused SIDEKIT feature extraction.

One kernel fuses the whole per-frame chain of reference
sidekit_mfcc.py:200-237 — framing (400/160), per-frame pre-emphasis,
log-energy (post-pre-emphasis, pre-window), Hann window, 512-pt real DFT,
power spectrum, mel projection, log — reading the raw signal from HBM once
and writing a packed (T, 32) block per frame (cols 0..23 = log-mel,
col 24 = log-energy).  The (T, 512) frame matrix the reference materializes
never exists.

TPU mapping: everything linear is folded into matmul operands at build time.
Pre-emphasis is a per-frame linear map Pm, the window a diagonal, the DFT a
dense matrix — so `spec = |(preemph(frame) * w) @ D|^2` becomes
`|frame @ (Pm · diag(w) · D)|^2`, and framing's 400-sample windows over a
160-hop are expressed by *splitting each operand into three row blocks*
(rows [0:160), [160:320), [320:400)) applied to three consecutive row-slices
of the signal laid out as (rows, 160):

    frame_i = [s[i], s[i+1], s[i+2][:80]]            (concat, lane-misaligned)
    frame_i @ M = s[i] @ M0 + s[i+1] @ M1 + s[i+2][:,:80] @ M2   (pure MXU)

No concats, no gathers, no shuffles — just nine MXU matmuls per block plus
elementwise VPU work.  Numerics match the jnp frontend (dsp/sidekit.py) to
float32 rounding; both are parity-tested against the numpy reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .mel import htk_triangular_fbank
from .sidekit import _dft_matrices, WIN, HOP, NFFT, CHUNK

B = 256             # frames per grid program
NPAD = 384          # padded DFT bins (257 -> 3*128 lanes)
PPAD = 512          # padded pre-emphasis output lanes (400 -> 4*128)
OUT_LANES = 32      # packed output: 24 mel + 1 loge + 7 pad
SLICE_ROWS = B + 3  # signal rows of HOP samples loaded per program


def _preemph_matrix(prefac):
    """(WIN, WIN) matrix Pm with (f @ Pm)[j] = f[j] - prefac*f[j-1]
    (f[0] -> (1-prefac)*f[0]), the reference's per-frame pre-emphasis."""
    pm = np.eye(WIN, dtype=np.float64)
    pm[0, 0] = 1.0 - prefac
    for j in range(1, WIN):
        pm[j - 1, j] = -prefac
    return pm


def _row_blocks(m):
    """Split a (WIN, N) operand into the three framing row blocks."""
    return (np.ascontiguousarray(m[0:HOP]),
            np.ascontiguousarray(m[HOP:2 * HOP]),
            np.ascontiguousarray(m[2 * HOP:WIN]))


class PallasSidekitFrontend:
    """Drop-in alternative to SidekitFrontend.mspec_loge using the fused
    kernel.  Interface-compatible: returns (mspec, loge, n_frames) with the
    same chunk-padded layout."""

    def __init__(self, lowfreq=100, maxfreq=8000, nlinfilt=0, nlogfilt=24,
                 fs=16000, prefac=0.97, interpret=False):
        self.nmel = nlinfilt + nlogfilt
        self.interpret = interpret

        fbank, _ = htk_triangular_fbank(fs, NFFT, lowfreq, maxfreq,
                                        nlinfilt, nlogfilt)
        fb = np.zeros((NPAD, OUT_LANES), np.float32)
        fb[: NFFT // 2 + 1, : self.nmel] = fbank.T
        self.fbank_pad = jnp.asarray(fb)

        pm = _preemph_matrix(prefac)
        window = np.hanning(WIN)
        dcos, dsin = _dft_matrices(WIN, NFFT)

        # fold pre-emphasis + window into the DFT operands
        cc = np.zeros((WIN, NPAD))
        ss = np.zeros((WIN, NPAD))
        cc[:, : NFFT // 2 + 1] = pm @ (window[:, None] * dcos)
        ss[:, : NFFT // 2 + 1] = pm @ (window[:, None] * dsin)
        # pre-emphasis alone (padded lanes) for the log-energy path
        pp = np.zeros((WIN, PPAD))
        pp[:, :WIN] = pm

        self.cos_blocks = tuple(jnp.asarray(b.astype(np.float32))
                                for b in _row_blocks(cc))
        self.sin_blocks = tuple(jnp.asarray(b.astype(np.float32))
                                for b in _row_blocks(ss))
        self.pre_blocks = tuple(jnp.asarray(b.astype(np.float32))
                                for b in _row_blocks(pp))

    @partial(jax.jit, static_argnames=("self",))
    def _features_padded(self, sig_pad):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        n_rows = sig_pad.shape[0] // HOP
        t_pad = n_rows - 3
        grid = t_pad // B
        sig2d = sig_pad.reshape(n_rows, HOP)

        const_spec = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda g: (0, 0), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            _kernel,
            grid=(grid,),
            in_specs=[
                # raw signal stays in HBM; each program DMAs its overlapping
                # (B+3)-row slice into VMEM scratch itself
                pl.BlockSpec(memory_space=pl.ANY),
                const_spec((HOP, NPAD)), const_spec((HOP, NPAD)),
                const_spec((WIN - 2 * HOP, NPAD)),
                const_spec((HOP, NPAD)), const_spec((HOP, NPAD)),
                const_spec((WIN - 2 * HOP, NPAD)),
                const_spec((HOP, PPAD)), const_spec((HOP, PPAD)),
                const_spec((WIN - 2 * HOP, PPAD)),
                const_spec((NPAD, OUT_LANES)),
            ],
            out_specs=pl.BlockSpec((B, OUT_LANES), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t_pad, OUT_LANES), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((SLICE_ROWS, HOP), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=self.interpret,
        )(sig2d, *self.cos_blocks, *self.sin_blocks, *self.pre_blocks,
          self.fbank_pad)
        return out[:, : self.nmel], out[:, 24]

    def mspec_loge(self, sig, pad_frames_to=None):
        from .sidekit import frame_count

        sig = np.ascontiguousarray(sig, dtype=np.float32)
        t = frame_count(len(sig))
        want = t if pad_frames_to is None else max(t, pad_frames_to)
        n_chunks = max(1, -(-want // CHUNK))
        t_pad = n_chunks * CHUNK
        need = (t_pad + 3) * HOP
        if len(sig) < need:
            sig = np.pad(sig, (0, need - len(sig)))
        else:
            sig = sig[:need]
        mspec, loge = self._features_padded(jnp.asarray(sig))
        return mspec, loge, t

    def mspec_loge_np(self, sig):
        mspec, loge, t = self.mspec_loge(sig)
        return np.asarray(mspec[:t]), np.asarray(loge[:t])

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


def _kernel(sig_hbm, c0, c1, c2, s0, s1, s2, p0, p1, p2, fbank_ref,
            out_ref, scratch, sem):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    dma = pltpu.make_async_copy(
        sig_hbm.at[pl.ds(g * B, SLICE_ROWS), :], scratch, sem)
    dma.start()
    dma.wait()
    s = scratch[...]                                   # (SLICE_ROWS, HOP)
    f0 = s[0:B, :]
    f1 = s[1:B + 1, :]
    f2 = s[2:B + 2, 0: WIN - 2 * HOP]

    def fr_matmul(a0, a1, a2):
        acc = jnp.dot(f0, a0[...], preferred_element_type=jnp.float32)
        acc += jnp.dot(f1, a1[...], preferred_element_type=jnp.float32)
        acc += jnp.dot(f2, a2[...], preferred_element_type=jnp.float32)
        return acc

    pf = fr_matmul(p0, p1, p2)                         # (B, PPAD) pre-emphasized
    loge = jnp.log(jnp.sum(pf * pf, axis=1, keepdims=True))
    re = fr_matmul(c0, c1, c2)                         # (B, NPAD)
    im = fr_matmul(s0, s1, s2)
    spec = re * re + im * im
    mel = jnp.dot(spec, fbank_ref[...], preferred_element_type=jnp.float32)
    out = jnp.log(mel)
    lane = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
    out_ref[...] = jnp.where(lane == 24, loge, out)
