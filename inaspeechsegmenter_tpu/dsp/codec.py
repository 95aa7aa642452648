"""Lossless PCM16 upload codecs: zero-block elision + predictive bit-pack.

On tunneled / thin host->device links the segmentation pipeline is
link-bound (docs/performance.md): int16 PCM costs 32 KB per audio-second
and the chip's compute hides entirely behind the transfers.  Two lossless
codecs attack the link bytes; both reconstruct the EXACT int16 samples on
device, so every downstream number (features, CNN, Viterbi, golden csv
bytes) is unchanged — asserted in tests/test_codec.py.

**Zero-block elision** (`pack_zero_elide`, round 2): broadcast material
routinely contains digital silence (hard-trimmed program boundaries, DAI
insertion points, synthesized padding); those samples are exactly zero
and carry no information, yet ship at full rate.

This codec removes them losslessly:

* the signal slice is split into fixed blocks of ``BLOCK`` samples;
* blocks that are entirely zero are elided; the survivors are compacted
  into a pool;
* the pool ships as ONE transfer shaped ``(n_pages, PAGE*BLOCK)`` — padded
  up to whole pages of ``PAGE`` blocks so the jit cache is keyed on the
  small bounded ``n_pages`` instead of the exact pool length (a new XLA
  program per pool length would cost 20-40 s of tunnel compile each);
* a per-block ``(nb,)`` int8 mask ships alongside (0.16% overhead);
* the device reconstructs the exact int16 signal with a cumsum + row
  gather + mask multiply — measured ~3 ms per 20 min of audio on v5e,
  fully hidden behind the remaining transfers.

Content with no digital silence takes the raw path untouched
(`pack_zero_elide` returns None unless at least one full page is saved).

**Predictive bit-packing** (`pack_bits`, round 4): audible audio is far
from white — speech and music are strongly low-pass and locally
predictable, so short-horizon fixed predictors shrink the entropy per
sample well below 16 bits.  Per 320-sample block:

* the host picks the cheapest of three fixed predictors — order 0 (raw
  sample), order 1 (first difference), order 2 (second difference, the
  classic "shorten"/FLAC fixed-predictor ladder) — stores the first two
  samples verbatim, zigzag-maps the remaining 318 residuals to unsigned,
  and packs them at the smallest sufficient bit width 0..16 as one
  little-endian bitstream (8 samples span exactly w whole bytes, so the
  stream stays byte-vectorizable at EVERY width, odd included — v1 of
  this format rounded widths up to even, wasting ~0.5 bit/sample);
* an all-zero or constant or linear block needs width 0 — 5 bytes total —
  so digital silence is subsumed (elision's only remaining edge is its
  lower 1-byte/block overhead on near-total silence);
* each block's packed bytes are padded to whole 32-byte SUB-ROWS (v1
  padded to full 128-byte rows — measured 15-25% overhead on typical
  width mixes vs ~4% at 32 bytes) and the sub-rows concatenate into ONE
  uint8 pool padded to `BYTE_PAGE` pages, with the per-block 2-sample
  heads and a 1-byte (order<<5 | width) meta appended — a single
  transfer whose jit cache is keyed on the bounded ``(n_byte_pages,
  nb)`` exactly like the elision codec;
* the device rebuilds every block in one vectorized program with NO
  element gathers (byte-granularity gathers run on the TPU scalar core —
  measured ~80 ms per upload group, vs ~30 ms of link time saved): one
  ROW gather on 128-byte physical rows (the elision codec's fast
  primitive) lands each block's span, four static 32-byte-shifted slices
  selected by the sub-row phase align it, sixteen static-width dense
  unpack candidates (slice/shift/or on the lane axis) are summed under
  one-hot width masks, then two `cumsum`s invert the predictor ladder
  and a `where` on the order selects the right reconstruction.

`pack_bits` returns None unless it saves ≥ `min_save` of the raw bytes —
incompressible content (full-scale white noise) costs nothing and falls
back to elision/raw.  `pack_best` chains the two codecs.
"""

from __future__ import annotations

import os

import numpy as np

BLOCK = 320   # samples per elision block (20 ms @ 16 kHz; divides every
              # upload-group slice length (k*CHUNK+2)*HOP)
PAGE = 512    # blocks per transfer page (512*320 int16 = 320 KB)
BYTE_PAGE = 128 * 1024   # bits-codec pool padding granularity (avg waste
                         # 64 KB ~ 1.6% of a default 3-chunk upload group;
                         # bounded jit keys: <= 32 page counts per group
                         # size, one-time compiles held by the persistent
                         # cache)


def pack_zero_elide(sig_i16: np.ndarray):
    """Pack an int16 signal slice for upload, eliding all-zero blocks.

    :param sig_i16: 1-D contiguous int16, length a multiple of ``BLOCK``.
    :return: one int16 buffer ``(n_pages*PAGE*BLOCK + nb,)`` — the compacted
        pool pages (zero-padded tail page) with the per-block 0/1 mask
        appended as int16 (mask and pool ride ONE transfer: this link has a
        strong per-transfer cost) — or ``None`` when elision would not save
        at least one full page over the raw upload (caller then uploads
        raw).
    """
    assert sig_i16.dtype == np.int16 and sig_i16.ndim == 1
    nb = sig_i16.shape[0] // BLOCK
    assert nb * BLOCK == sig_i16.shape[0]
    # zero-test via an int64 view (4 samples per word): 4x fewer elements
    # than int16 and no abs() temporary (~18x faster than abs().max(axis=1))
    mask = sig_i16.view(np.int64).reshape(nb, BLOCK // 4).any(axis=1)
    n_nz = int(np.count_nonzero(mask))
    n_pages = -(-n_nz // PAGE) if n_nz else 1
    raw_pages = -(-nb // PAGE)
    if n_pages >= raw_pages:          # nothing (or a rounding error) saved
        return None
    buf = np.zeros(n_pages * PAGE * BLOCK + nb, np.int16)
    pool = buf[:n_pages * PAGE * BLOCK].reshape(n_pages * PAGE, BLOCK)
    pool[:n_nz] = sig_i16.reshape(nb, BLOCK)[mask]
    buf[n_pages * PAGE * BLOCK:] = mask
    return buf


def unpack_zero_elide(buf, nb):
    """Traced device-side inverse of `pack_zero_elide`.

    :param buf: packed int16 device array from `pack_zero_elide`.
    :param nb: static block count of the original slice.
    :return: ``(nb*BLOCK,)`` int16 — the exact original signal slice.
    """
    import jax.numpy as jnp

    pool = buf[:buf.shape[0] - nb].reshape(-1, BLOCK)
    mask = buf[buf.shape[0] - nb:]
    idx = jnp.cumsum(mask.astype(jnp.int32)) - 1
    rows = pool[jnp.clip(idx, 0)]
    rows = rows * mask[:, None]
    return rows.reshape(-1)


# --------------------------------------------------------------------------
# Predictive bit-packing codec
# --------------------------------------------------------------------------

def _block_width(r):
    """Smallest sufficient bit width per block for int32 residual rows
    ``r`` (nb, m) under zigzag mapping — exact, via per-block min/max only
    (zigzag(v) = 2v for v>=0, -2v-1 for v<0, so the block's largest
    zigzag value is max(2*max, -2*min-1)).  Widths above 16 mean "this
    predictor order is unusable"; order 0 always fits 16 bits, so a valid
    choice always exists."""
    zmax = np.maximum(2 * r.max(axis=1).astype(np.int64),
                      -2 * r.min(axis=1).astype(np.int64) - 1)
    # exact integer bit length: #{j in 0..15 : zmax >= 2^j}
    w = (zmax[:, None] >= (np.int64(1) << np.arange(16))).sum(axis=1)
    return np.where(zmax > 65535, 18, w.astype(np.int64))


def _sub_rows(w):
    """Pool sub-rows (32 bytes each) a block of width ``w`` occupies:
    320 slots * w bits / 8 = 40*w bytes, rounded up to whole sub-rows."""
    return (40 * w + 31) // 32


def pack_bits(sig_i16: np.ndarray, min_save: float = 0.05,
              allow_native: bool = True):
    """Pack an int16 signal slice with per-block predictive bit-packing.

    Uses the native single-pass encoder (native/issaudio.cc
    ``iss_pack_bits``) when the library is built — byte-identical output,
    ~5x cheaper on the host (tests/test_codec.py asserts the identity) —
    and this numpy implementation otherwise (also the readable spec).

    :param sig_i16: 1-D contiguous int16, length a multiple of ``BLOCK``.
    :param min_save: required fractional saving vs the raw int16 upload;
        below it the caller should fall back (elision / raw path).
    :param allow_native: force the numpy encoder when False (tests).
    :return: one uint8 buffer ``(n_pages*BYTE_PAGE + 5*nb,)`` — the packed
        residual pool (page-padded) with per-block heads (2 int16 LE) and
        1-byte ``order<<5 | width`` meta appended — or ``None``.
    """
    assert sig_i16.dtype == np.int16 and sig_i16.ndim == 1
    nb = sig_i16.shape[0] // BLOCK
    assert nb * BLOCK == sig_i16.shape[0]
    if allow_native:
        from ..audio import native
        r = native.pack_bits(sig_i16, min_save)
        if r is not None:
            return r if len(r) else None
    x = sig_i16.reshape(nb, BLOCK).astype(np.int32)
    d1 = np.diff(x, axis=1)                  # (nb, 319) first differences
    r1 = d1[:, 1:]                           # order-1 residuals for n>=2
    r2 = np.diff(d1, axis=1)                 # (nb, 318) order-2 residuals
    r0 = x[:, 2:]                            # order-0 "residuals"
    ws = np.stack([_block_width(r0), _block_width(r1), _block_width(r2)])
    order = ws.argmin(axis=0)                # ties -> lowest order
    w = ws[order, np.arange(nb)]             # (nb,) widths 0..16
    total = int(_sub_rows(w).sum()) * 32     # sub-row-aligned pool bytes
    n_pages = max(1, -(-total // BYTE_PAGE))
    raw_bytes = nb * BLOCK * 2
    if n_pages * BYTE_PAGE + 5 * nb >= raw_bytes * (1.0 - min_save):
        return None
    buf = np.zeros(n_pages * BYTE_PAGE + 5 * nb, np.uint8)
    pool = buf[:n_pages * BYTE_PAGE]
    hp = n_pages * BYTE_PAGE
    buf[hp:hp + 4 * nb] = x[:, :2].astype("<i2").view(np.uint8).reshape(-1)
    buf[hp + 4 * nb:] = ((order << 5) | w).astype(np.uint8)
    # residual selection + zigzag in ONE pass over the data (318 -> 320
    # zero-padded slots so 8 samples always span whole bytes)
    rsel = np.where((order == 1)[:, None], r1,
                    np.where((order == 2)[:, None], r2, r0))
    z32 = np.zeros((nb, BLOCK), np.int32)
    z32[:, :318] = (rsel << 1) ^ (rsel >> 31)
    # pool layout is GROUPED BY WIDTH (ascending, block order within a
    # width): every group writes one contiguous pool slice — no host-side
    # byte scatter — and the device recomputes the identical offsets from
    # the width metadata alone
    pos = 0
    for wv in range(1, 17):
        sel = np.nonzero(w == wv)[0]
        if not len(sel):
            continue
        z = z32[sel]
        rowb = 32 * _sub_rows(wv)
        by = np.zeros((len(sel), rowb), np.uint8)
        # little-endian bitstream at width wv: sample-major, LSB-first
        bits = ((z[:, :, None] >> np.arange(wv)) & 1).astype(np.uint8)
        by[:, :40 * wv] = np.packbits(
            bits.reshape(len(sel), BLOCK * wv), axis=1, bitorder="little")
        size = len(sel) * rowb
        pool[pos:pos + size] = by.reshape(-1)
        pos += size
    return buf


def unpack_bits(buf, nb):
    """Traced device-side inverse of `pack_bits`.

    One program for every width/order mix, built from TPU-fast primitives
    only: a row gather on 128-byte physical rows lands each block's span,
    four static 32-byte-shifted slices selected by the sub-row phase align
    it, sixteen static-width dense unpack candidates (slice/shift/or along
    the lane axis — no element gathers) are summed under one-hot width
    masks, two row cumsums invert the predictor ladder, and a `where` on
    the order picks the reconstruction.

    :param buf: packed uint8 device array from `pack_bits`.
    :param nb: static block count of the original slice.
    :return: ``(nb*BLOCK,)`` int16 — the exact original signal slice.
    """
    import jax.numpy as jnp

    hp = buf.shape[0] - 5 * nb
    pool = buf[:hp].reshape(-1, 128)
    hb = buf[hp:hp + 4 * nb].reshape(nb, 2, 2).astype(jnp.int32)
    heads = hb[..., 0] | (hb[..., 1] << 8)
    heads = (heads ^ 0x8000) - 0x8000                     # (nb, 2) signed
    meta = buf[hp + 4 * nb:].astype(jnp.int32)
    w = meta & 0x1F
    order = meta >> 5
    # per-block pool SUB-ROW (32-byte) offsets under the width-grouped
    # layout (ascending width, block order within a width) — recomputed
    # from the widths alone
    sstart = jnp.zeros(nb, jnp.int32)
    acc = jnp.int32(0)
    for wv in range(1, 17):
        m = (w == wv).astype(jnp.int32)
        within = (jnp.cumsum(m) - m) * _sub_rows(wv)
        sstart = sstart + m * (acc + within)
        acc = acc + m.sum() * _sub_rows(wv)
    # physical-row gather (6 rows = 768 bytes covers the worst case: 640
    # block bytes + up to 96 bytes of sub-row phase), then a 4-way static
    # slice select aligns the block to its sub-row start
    ridx = jnp.clip((sstart >> 2)[:, None] + jnp.arange(6, dtype=jnp.int32),
                    0, pool.shape[0] - 1)
    span = pool[ridx].reshape(nb, 768).astype(jnp.int32)  # (nb, 6*128)
    phase = sstart & 3
    rows = jnp.zeros((nb, 640), jnp.int32)
    for r in range(4):
        rows = rows + jnp.where((phase == r)[:, None],
                                span[:, 32 * r:32 * r + 640], 0)
    # dense per-width unpack candidates, summed under one-hot width masks
    # (a block's true-width candidate reads only its own 40*w bytes; the
    # other candidates read this block's padding / neighbours' rows and
    # are masked to zero)
    z = jnp.zeros((nb, BLOCK), jnp.int32)
    for wv in range(1, 17):
        g = rows[:, :40 * wv].reshape(nb, 40, wv)
        vals = []
        for j in range(8):                     # 8 samples per wv-byte unit
            start = j * wv
            b0 = start >> 3
            v = g[..., b0]
            if b0 + 1 < wv:
                v = v | (g[..., b0 + 1] << 8)
            if b0 + 2 < wv:
                v = v | (g[..., b0 + 2] << 16)
            vals.append((v >> (start & 7)) & ((1 << wv) - 1))
        cand = jnp.stack(vals, axis=-1).reshape(nb, BLOCK)
        z = z + jnp.where((w == wv)[:, None], cand, 0)
    r = (z >> 1) ^ -(z & 1)                               # un-zigzag
    r = r[:, :318]
    x0 = heads[:, 0:1]
    x1 = heads[:, 1:2]
    c1 = jnp.cumsum(r, axis=1)
    o1 = x1 + c1
    o2 = x1 + jnp.cumsum((x1 - x0) + c1, axis=1)
    body = jnp.where(order[:, None] == 0, r,
                     jnp.where(order[:, None] == 1, o1, o2))
    x = jnp.concatenate([x0, x1, body], axis=1).astype(jnp.int16)
    return x.reshape(-1)


def _pack_bits_enabled() -> bool:
    """`ISS_UPLOAD_PACK`: predictive bit-packing on int16 uploads.

    `auto`/unset (default): on — `pack_bits` is per-group adaptive (it
    declines incompressible groups itself), so the only standing cost is
    the host-side encode (~6 ms per 3-chunk upload group with the native
    encoder; measured, docs/performance.md).  Measured
    on the tunneled v5e batch bench: median RTF 1105x vs 897x packing off,
    csv byte-equal.  `0` restores round-3 behavior (elision only).
    """
    return os.environ.get("ISS_UPLOAD_PACK", "auto") not in ("0", "off")


def pack_best(sig_i16: np.ndarray):
    """Best available lossless packing of an int16 upload slice.

    :return: ``("bits", uint8 buf)`` | ``("elide", int16 buf)`` | ``None``
        (raw upload).  Callers dispatch to `unpack_bits` /
        `unpack_zero_elide` by tag.
    """
    if _pack_bits_enabled():
        b = pack_bits(sig_i16)
        if b is not None:
            return ("bits", b)
    e = pack_zero_elide(sig_i16)
    if e is not None:
        return ("elide", e)
    return None
