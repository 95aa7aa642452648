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
`|frame @ (Pm · diag(w) · D)|^2`.  Framing's 400-sample windows over a
160-hop never materialize either: the signal is laid out as lane-aligned
(rows, 256) tiles holding 160 valid samples each, and each operand is split
into three row blocks applied to three consecutive row-slices:

    frame_i = [row_i[:160], row_{i+1}[:160], row_{i+2}[:80]]
    frame_i @ M = row_i @ M0' + row_{i+1} @ M1' + row_{i+2} @ M2'

where Mk' are (256, N) blocks with zeros in the padding rows — the lane
padding costs a little MXU K-dim but removes every unaligned slice.  The
kernel is nine MXU matmuls plus elementwise VPU work per 256-frame block.

Numerics match the jnp frontend (dsp/sidekit.py) to float32 rounding; both
are parity-tested against the numpy reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .mel import htk_triangular_fbank
from .sidekit import _dft_matrices, WIN, HOP, NFFT, CHUNK

B = 256             # frames per grid program
LANES = 256         # lane-aligned samples per signal row (HOP=160 valid)
NPAD = 384          # padded DFT bins (257 -> 3*128 lanes)
PPAD = 512          # padded pre-emphasis output lanes (400 -> 4*128)
OUT_LANES = 32      # packed output: 24 mel + 1 loge + 7 pad
SLICE_ROWS = B + 8  # signal rows DMA'd per program (8-aligned; 2 extra used)


def _preemph_matrix(prefac):
    """(WIN, WIN) matrix Pm with (f @ Pm)[j] = f[j] - prefac*f[j-1]
    (f[0] -> (1-prefac)*f[0]), the reference's per-frame pre-emphasis."""
    pm = np.eye(WIN, dtype=np.float64)
    pm[0, 0] = 1.0 - prefac
    for j in range(1, WIN):
        pm[j - 1, j] = -prefac
    return pm


def _row_blocks(m):
    """Split a (WIN, N) operand into three (LANES, N) blocks matching the
    lane-padded signal rows (zeros in pad rows)."""
    n = m.shape[1]
    b0 = np.zeros((LANES, n))
    b1 = np.zeros((LANES, n))
    b2 = np.zeros((LANES, n))
    b0[:HOP] = m[0:HOP]
    b1[:HOP] = m[HOP:2 * HOP]
    b2[: WIN - 2 * HOP] = m[2 * HOP: WIN]
    return b0, b1, b2


class PallasSidekitFrontend:
    """Drop-in alternative to SidekitFrontend.mspec_loge using the fused
    kernel.  Interface-compatible: returns (mspec, loge, n_frames) with the
    same chunk-padded layout."""

    def __init__(self, lowfreq=100, maxfreq=8000, nlinfilt=0, nlogfilt=24,
                 fs=16000, prefac=0.97, interpret=False):
        self.nmel = nlinfilt + nlogfilt
        if self.nmel > 24:
            # the packed (T, 32) kernel output reserves lane 24 for the
            # log-energy; wider banks would silently collide with it —
            # use SidekitFrontend (arbitrary nmel) instead
            raise ValueError(
                f"PallasSidekitFrontend supports at most 24 mel bands "
                f"(got {self.nmel}); use SidekitFrontend for wider banks")
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

        if sig_pad.dtype == jnp.int16:
            # device-side PCM16 -> float32 (int16/2^15 is exact)
            sig_pad = sig_pad.astype(jnp.float32) * np.float32(1 / 32768.0)
        # lane-aligned layout built on device: (n_rows, HOP) -> pad to LANES
        n_rows = sig_pad.shape[0] // HOP
        sig2d = jnp.pad(sig_pad.reshape(n_rows, HOP),
                        ((0, 0), (0, LANES - HOP)))
        t_pad = n_rows - (SLICE_ROWS - B)
        grid = t_pad // B

        const_spec = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda g: (0, 0), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            _kernel,
            grid=(grid,),
            in_specs=[
                # signal stays in HBM; each program DMAs its overlapping
                # row slice into VMEM scratch itself
                pl.BlockSpec(memory_space=pl.ANY),
                const_spec((LANES, NPAD)), const_spec((LANES, NPAD)),
                const_spec((LANES, NPAD)),
                const_spec((LANES, NPAD)), const_spec((LANES, NPAD)),
                const_spec((LANES, NPAD)),
                const_spec((LANES, PPAD)), const_spec((LANES, PPAD)),
                const_spec((LANES, PPAD)),
                const_spec((NPAD, OUT_LANES)),
            ],
            out_specs=pl.BlockSpec((B, OUT_LANES), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t_pad, OUT_LANES), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((SLICE_ROWS, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=self.interpret,
        )(sig2d, *self.cos_blocks, *self.sin_blocks, *self.pre_blocks,
          self.fbank_pad)
        return out[:, : self.nmel], out[:, 24]

    def mspec_loge(self, sig, pad_frames_to=None):
        from .sidekit import frame_count

        keep = np.int16 if np.asarray(sig).dtype == np.int16 else np.float32
        sig = np.ascontiguousarray(sig, dtype=keep)
        t = frame_count(len(sig))
        want = t if pad_frames_to is None else max(t, pad_frames_to)
        n_chunks = max(1, -(-want // CHUNK))
        t_pad = n_chunks * CHUNK
        n_rows = t_pad + SLICE_ROWS - B
        need = n_rows * HOP
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
    s = scratch[...]                                   # (SLICE_ROWS, LANES)
    f0 = s[0:B, :]
    # rows shifted up by 1 / 2 (circular; wrapped tail rows land past B and
    # are never read)
    f1 = pltpu.roll(s, SLICE_ROWS - 1, 0)[0:B, :]
    f2 = pltpu.roll(s, SLICE_ROWS - 2, 0)[0:B, :]

    def fr_matmul(a0, a1, a2):
        acc = jnp.dot(f0, a0[...], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        acc += jnp.dot(f1, a1[...], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        acc += jnp.dot(f2, a2[...], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        return acc

    pf = fr_matmul(p0, p1, p2)                         # (B, PPAD) pre-emphasized
    loge = jnp.log(jnp.sum(pf * pf, axis=1, keepdims=True))
    re = fr_matmul(c0, c1, c2)                         # (B, NPAD)
    im = fr_matmul(s0, s1, s2)
    spec = re * re + im * im
    mel = jnp.dot(spec, fbank_ref[...], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    out = jnp.log(mel)
    lane = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
    out_ref[...] = jnp.where(lane == 24, loge, out)
