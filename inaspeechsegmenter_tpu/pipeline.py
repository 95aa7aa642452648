"""Fused on-device segmentation pipeline.

Reference control flow (segmenter.py:250-276) is: energy Viterbi on the host,
run-length encode, gather per-segment CNN batches, `keras.predict`, then one
Python Viterbi *per segment* — with host<->device transfers around every CNN
call and interpreted Viterbi loops in between.

The TPU formulation compiles the entire post-feature pipeline into ONE XLA
program per length bucket:

    loge  -> energy Viterbi (lax.scan, 2 states, 10 ms frames)
          -> 20 ms decimation
    mspec -> patch gather+normalize -> VAD CNN  (fixed-size chunks, MXU)
          -> VAD Viterbi with *segment resets* at every energy/noEnergy
             boundary (exactly equivalent to per-segment decoding, see
             decode/viterbi.py)
          -> gender CNN + gender Viterbi with resets at speech boundaries
    -> single (T20,) int32 label sequence

The only host work left is run-length encoding a few-KB int array.  Per-frame
label semantics are identical to the reference: the CNNs only *influence*
frames inside their `inlabel` segments, non-finite patches are forced to
p=0.5 (segmenter.py:175), Viterbi smoothing never crosses segment boundaries.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

import os
from functools import partial

from .decode.transitions import log_trans_exp, diag_trans_exp
from .decode.viterbi import (_viterbi_scan, _viterbi_parallel,
                             _viterbi_blocked)
from .dsp.patches import normalized_windows_ext, LPAD, PATCH_W

CNN_CHUNK = 1024  # patches per CNN invocation inside lax.map
EPS = 1e-10
STREAM_HALO = 40  # mel rows borrowed from neighbor chunks (>= 2*LPAD + 2)


def default_viterbi_mode():
    """'blocked' (two-level scan-block decode) on accelerators, 'scan'
    (sequential, reference-rounding-exact) on CPU; override with
    ISS_VITERBI_MODE."""
    mode = os.environ.get("ISS_VITERBI_MODE")
    if mode in ("scan", "parallel", "blocked"):
        return mode
    return "scan" if jax.default_backend() == "cpu" else "blocked"


def _shift_right(x):
    return jnp.concatenate([x[:1], x[:-1]])


class FusedPipeline:
    """Holds device constants + jitted fused program for one engine config.

    :param vad: (forward_fn, nmel, n_out, viterbi_arg) for the VAD CNN.
    :param gender: same tuple for the gender CNN, or None.
    """

    def __init__(self, vad, gender=None, energy_ratio=0.03, viterbi_mode=None,
                 skip_inactive=True):
        # skip_inactive: lax.cond-skip CNN chunks with no analyzed frames —
        # disable under vmap (cond lowers to select there: both branches run
        # anyway and compile time doubles)
        self.skip_inactive = skip_inactive
        mode = viterbi_mode or default_viterbi_mode()
        self._viterbi = {"parallel": _viterbi_parallel,
                         "blocked": _viterbi_blocked,
                         "scan": _viterbi_scan}[mode]
        self.vad_forward, self.vad_nmel, self.vad_nout, vad_arg = vad
        self.gender = gender
        if gender is not None:
            (self.g_forward, self.g_nmel, self.g_nout, g_arg) = gender
            self.g_trans = jnp.asarray(diag_trans_exp(g_arg, self.g_nout),
                                       jnp.float32)
            self.g_init = jnp.full((self.g_nout,),
                                   float(np.log(1.0 / self.g_nout)), jnp.float32)
        self.energy_ratio = energy_ratio
        self.e_trans = jnp.asarray(log_trans_exp(150, cost0=-5), jnp.float32)
        self.e_init = jnp.asarray(np.log([0.5, 0.5]), jnp.float32)
        self.v_trans = jnp.asarray(diag_trans_exp(vad_arg, self.vad_nout),
                                   jnp.float32)
        self.v_init = jnp.full((self.vad_nout,),
                               float(np.log(1.0 / self.vad_nout)), jnp.float32)
        self._jit_run = None
        self._sharded_progs = {}
        self._jit_vad_chunk = None
        self._jit_g_chunk = None
        self._jit_tail = None

    # -- helpers (all traced) ----------------------------------------------

    def _energy_states20(self, loge_pad, n_frames, ext=None):
        """20 ms energy activity.  ``ext`` (suffix decodes only): a
        ``(sum, cnt, e_init)`` triple — finite-log-energy statistics of
        the frames LEFT of this window (so the threshold stays the global
        mean) and the energy-Viterbi initial distribution at the window's
        first frame (a near-one-hot of the committed seam state)."""
        valid = jnp.arange(loge_pad.shape[0]) < n_frames
        finite = jnp.isfinite(loge_pad) & valid
        ext_sum, ext_cnt, e_init = (ext if ext is not None
                                    else (0.0, 0.0, self.e_init))
        cnt = jnp.maximum(jnp.sum(finite) + ext_cnt, 1)
        mean = (jnp.sum(jnp.where(finite, loge_pad, 0.0)) + ext_sum) / cnt
        thr = mean + jnp.log(self.energy_ratio)
        act = loge_pad > thr
        em = jnp.stack([
            jnp.where(act, np.float32(np.log(EPS)), np.float32(np.log(1 - EPS))),
            jnp.where(act, np.float32(np.log(1 - EPS)), np.float32(np.log(EPS))),
        ], axis=1)
        reset = jnp.zeros(loge_pad.shape[0], bool)
        reset = reset.at[0].set(True).at[n_frames].set(True, mode="drop")
        states = self._viterbi(em, self.e_trans, e_init, reset)
        return states[::2] == 1  # 20 ms energy activity

    def _cnn_probs(self, forward, params, mspec_pad, n_frames_patch, nmel,
                   nout, inmask=None):
        t20 = mspec_pad.shape[0] // 2
        nb = t20 // CNN_CHUNK
        assert t20 % CNN_CHUNK == 0, (t20, CNN_CHUNK)

        norm_ext, fin_ext, last_norm, last_fin, n_rows = \
            normalized_windows_ext(mspec_pad, n_frames_patch, nmel)
        if inmask is not None and not self.skip_inactive:
            inmask = None
        if inmask is not None:
            # reference semantics: the CNN only runs on `inlabel` segments
            # (segmenter.py:156-163); skip chunks with no analyzed frame —
            # their emissions are masked to uniform downstream anyway
            chunk_active = jnp.any(inmask.reshape(nb, CNN_CHUNK), axis=1)
        else:
            chunk_active = jnp.ones((nb,), bool)

        def compute(ib):
            j0 = ib * CNN_CHUNK
            sl = jax.lax.dynamic_slice(
                norm_ext, (j0, 0), (CNN_CHUNK, norm_ext.shape[1]))
            fin = jax.lax.dynamic_slice(fin_ext, (j0,), (CNN_CHUNK,))
            j = j0 + jnp.arange(CNN_CHUNK)
            over = j > n_rows + (LPAD - 1)   # right replicate edge
            sl = jnp.where(over[:, None], last_norm, sl)
            fin = jnp.where(over, last_fin[0], fin)
            patches = sl.reshape(CNN_CHUNK, 68, nmel)
            p = forward(params, patches[..., None])
            return jnp.where(fin[:, None], p, 0.5)

        def chunk(ib):
            return jax.lax.cond(
                chunk_active[ib], compute,
                lambda _: jnp.full((CNN_CHUNK, nout), 0.5, jnp.float32), ib)

        probs = jax.lax.map(chunk, jnp.arange(nb))
        return probs.reshape(t20, nout)

    def _masked_viterbi(self, probs, inmask, n20, trans, init):
        """Viterbi over log(probs) restricted to `inmask` runs (segment
        resets at every mask transition and at the padding boundary)."""
        em = jnp.log(probs)
        em = jnp.where((inmask & (jnp.arange(probs.shape[0]) < n20))[:, None],
                       em, 0.0)
        reset = inmask != _shift_right(inmask)
        reset = reset.at[0].set(True).at[n20].set(True, mode="drop")
        return self._viterbi(em, trans, init, reset)

    # -- fused program ------------------------------------------------------

    def _run_impl(self, vad_params, g_params, mspec_pad, loge_pad, n_frames,
                  n_frames_patch, n20):
        energy20 = self._energy_states20(loge_pad, n_frames)

        probs_v = self._cnn_probs(self.vad_forward, vad_params, mspec_pad,
                                  n_frames_patch, self.vad_nmel, self.vad_nout,
                                  inmask=energy20)
        states_v = self._masked_viterbi(probs_v, energy20, n20,
                                        self.v_trans, self.v_init)
        # label ids: 0 = noEnergy, 1..vad_nout = vad outlabels
        labels = jnp.where(energy20, states_v + 1, 0).astype(jnp.int32)

        if self.gender is not None:
            speech20 = labels == 1  # outlabels[0] == 'speech' for sm and smn
            probs_g = self._cnn_probs(self.g_forward, g_params, mspec_pad,
                                      n_frames_patch, self.g_nmel, self.g_nout,
                                      inmask=speech20)
            states_g = self._masked_viterbi(probs_g, speech20, n20,
                                            self.g_trans, self.g_init)
            labels = jnp.where(speech20,
                               states_g + 1 + self.vad_nout, labels)
        return labels

    def run(self, vad_params, g_params, mspec_pad, loge_pad, n_frames,
            n_frames_patch, n20):
        """Execute; returns (T20pad,) int32 device array of label ids."""
        if self._jit_run is None:
            self._jit_run = jax.jit(self._run_impl)
        return self._jit_run(vad_params, g_params, mspec_pad, loge_pad,
                             jnp.int32(n_frames), jnp.int32(n_frames_patch),
                             jnp.int32(n20))

    # -- streaming single-file path -----------------------------------------
    #
    # The fused program above is one XLA computation: it cannot start before
    # the LAST feature chunk has landed on the device, so on link-limited
    # hosts a single file pays upload + full compute serially.  The streaming
    # decomposition dispatches one VAD-CNN program per feature chunk — each
    # depends only on chunks c-1..c+1, so CNN emissions execute while later
    # chunks are still in flight — and a tail program (energy Viterbi, VAD
    # Viterbi, gender CNN + Viterbi) that alone waits for the whole file.
    # The gender Viterbi consumes only speech segments from the global VAD
    # decode (reference semantics, segmenter.py:270-274), but the gender CNN
    # *emissions* are per-patch and segment-independent (per-patch mean/std
    # normalization, segmenter.py:86) — so they CAN stream speculatively
    # over all chunks (ISS_STREAM_GENDER=1), exactly equal on the frames
    # the Viterbi later reads.  Measured on the tunneled v5e host it is
    # net-slower (799x vs 872x median single-file RTF): the extra per-chunk
    # dispatches contend with the upload stream and the bf16-high gender
    # CNN in the tail is cheap — so gender-in-tail is the default and
    # speculation stays an opt-in for hosts with slow CNNs + fast links.
    #
    # Exactness: patch j reads mel rows [2*clip(j-17, 0, n_rows-1), +68)
    # (dsp/patches.py).  For a chunk starting at 20 ms frame j0 the program
    # sees rows [2*j0 - STREAM_HALO, 2*(j0 + C20) + STREAM_HALO) assembled
    # from the neighbor chunks, so unclipped patches are plain static
    # slices; the left clip only occurs in chunk 0 (replicate window 0) and
    # the right clip/replicate edge is repaired exactly in the tail by
    # recomputing the single last valid window (`_fix_right_edge`).

    def _chunk_probs_impl(self, forward, nmel, params, prev_tail, own,
                          next_head, is_first):
        m = jnp.concatenate([prev_tail, own, next_head])[:, :nmel]
        c20 = own.shape[0] // 2
        n_w = (m.shape[0] - PATCH_W) // 2 + 1
        cols = [jax.lax.slice(m, (k, 0), (k + 2 * (n_w - 1) + 1, nmel),
                              (2, 1)) for k in range(PATCH_W)]
        w = jnp.stack(cols, axis=1).reshape(n_w, -1)
        mean = jnp.mean(w, axis=1, keepdims=True)
        std = jnp.std(w, axis=1, keepdims=True)
        norm = (w - mean) / std
        finite = jnp.all(jnp.isfinite(norm), axis=1)
        base = STREAM_HALO // 2 - LPAD          # unclipped patch l -> w[l+base]
        if is_first:
            # left replicate: frames l < 17 use window 0 (= w[HALO/2])
            z = STREAM_HALO // 2
            sel = jnp.concatenate([
                jnp.broadcast_to(norm[z:z + 1], (LPAD, norm.shape[1])),
                norm[z:z + c20 - LPAD]])
            fin = jnp.concatenate([
                jnp.broadcast_to(finite[z:z + 1], (LPAD,)),
                finite[z:z + c20 - LPAD]])
        else:
            sel = norm[base:base + c20]
            fin = finite[base:base + c20]
        p = forward(params, sel.reshape(c20, PATCH_W, nmel)[..., None])
        return jnp.where(fin[:, None], p, 0.5)

    def _fix_right_edge(self, forward, params, mspec_pad, probs,
                        n_frames_patch, nmel):
        """Overwrite replicate-edge frames (j > n_rows + 16) with the
        prediction of the last valid window — the reference's right
        replicate padding (segmenter.py:83-85), done once, exactly."""
        n_rows = jnp.maximum((n_frames_patch - PATCH_W) // 2 + 1, 1)
        lastw = jax.lax.dynamic_slice(
            mspec_pad[:, :nmel], (2 * (n_rows - 1), 0), (PATCH_W, nmel))
        flat = lastw.reshape(1, -1)
        norm = (flat - jnp.mean(flat)) / jnp.std(flat)
        fin = jnp.all(jnp.isfinite(norm))
        p_last = forward(params, norm.reshape(1, PATCH_W, nmel)[..., None])[0]
        p_last = jnp.where(fin, p_last, 0.5)
        over = jnp.arange(probs.shape[0]) > n_rows + (LPAD - 1)
        return jnp.where(over[:, None], p_last[None, :], probs)

    def _tail_impl(self, vad_params, g_params, mspec_pad, loge_pad, probs_v,
                   n_frames, n_frames_patch, n20, probs_g=None, ext=None):
        """Streaming tail.  If gender emissions were streamed speculatively
        they arrive as `probs_g` (needing only the right-edge repair);
        otherwise (None — a distinct jit cache entry) the gender CNN runs
        here on the decoded speech mask.  ``ext`` turns this into a SUFFIX
        decode (see `_energy_states20`): the online family decodes only
        the uncommitted tail of a long stream through it."""
        energy20 = self._energy_states20(loge_pad, n_frames, ext)
        probs_v = self._fix_right_edge(self.vad_forward, vad_params,
                                       mspec_pad, probs_v, n_frames_patch,
                                       self.vad_nmel)
        states_v = self._masked_viterbi(probs_v, energy20, n20,
                                        self.v_trans, self.v_init)
        labels = jnp.where(energy20, states_v + 1, 0).astype(jnp.int32)
        if self.gender is not None:
            speech20 = labels == 1
            if probs_g is None:
                probs_g = self._cnn_probs(self.g_forward, g_params,
                                          mspec_pad, n_frames_patch,
                                          self.g_nmel, self.g_nout,
                                          inmask=speech20)
            else:
                probs_g = self._fix_right_edge(self.g_forward, g_params,
                                               mspec_pad, probs_g,
                                               n_frames_patch, self.g_nmel)
            states_g = self._masked_viterbi(probs_g, speech20, n20,
                                            self.g_trans, self.g_init)
            labels = jnp.where(speech20,
                               states_g + 1 + self.vad_nout, labels)
        return labels

    def _ensure_stream_jits(self):
        """Lazy-build the per-chunk streaming programs (shared by
        run_streaming and the OnlineSegmenter)."""
        if self._jit_vad_chunk is None:
            # the guard attribute (_jit_vad_chunk) is assigned LAST:
            # concurrent first callers (prefetch threads sharing one
            # pipeline, e.g. VFS batch_score producers) must never see it
            # non-None while _jit_tail/_jit_g_chunk are still None; a
            # racing re-build is idempotent and harmless
            self._jit_tail = jax.jit(self._tail_impl)
            if self.gender is not None:
                self._jit_g_chunk = jax.jit(
                    partial(self._chunk_probs_impl, self.g_forward,
                            self.g_nmel), static_argnums=(4,))
            self._jit_vad_chunk = jax.jit(
                partial(self._chunk_probs_impl, self.vad_forward,
                        self.vad_nmel), static_argnums=(4,))

    def chunk_emissions(self, vad_params, g_params, chunks, c,
                        zero_right=False):
        """CNN emissions for chunk ``c`` of a per-chunk feature list —
        the ONE owner of the streaming halo policy (prev-tail/next-head
        STREAM_HALO slices, zero boundary halos, first-chunk replicate
        flag), shared by `run_streaming` and the OnlineSegmenter: the
        online finalize() == segment_signal() bit-exactness depends on
        both sides building IDENTICAL halos, so neither may carry its
        own copy of this arithmetic.

        :param g_params: gender CNN params, or None to skip the gender
            pass (a distinct jit signature either way).
        :param zero_right: treat ``c`` as the stream frontier (no right
            context yet) even if later chunks exist — the online
            provisional path.
        :return: (vad_probs, gender_probs | None).
        """
        self._ensure_stream_jits()
        m_c = chunks[c][0]
        zeros = jnp.zeros((STREAM_HALO, m_c.shape[1]), m_c.dtype)
        prev = chunks[c - 1][0][-STREAM_HALO:] if c else zeros
        nxt = (zeros if zero_right or c + 1 >= len(chunks)
               else chunks[c + 1][0][:STREAM_HALO])
        pv = self._jit_vad_chunk(vad_params, prev, m_c, nxt, c == 0)
        pg = None
        if g_params is not None:
            pg = self._jit_g_chunk(g_params, prev, m_c, nxt, c == 0)
        return pv, pg

    def run_streaming(self, vad_params, g_params, chunks, n_frames,
                      n_frames_patch, n20):
        """Streaming execution over per-chunk features.

        :param chunks: [(mspec_c (C,nmel'), loge_c (C,))] device arrays,
            C = feature chunk size (even), len(chunks) >= 2.
        :return: (T20pad,) int32 labels, T20pad = len(chunks)*C/2.
        """
        spec_gender = (self.gender is not None and
                       os.environ.get("ISS_STREAM_GENDER", "0") == "1")
        probs, probs_gl = [], []
        for c in range(len(chunks)):
            pv, pg = self.chunk_emissions(
                vad_params, g_params if spec_gender else None, chunks, c)
            probs.append(pv)
            if spec_gender:
                probs_gl.append(pg)
        return self.stream_decode(vad_params, g_params, chunks, probs,
                                  probs_gl if spec_gender else None,
                                  n_frames, n_frames_patch, n20)

    def stream_decode(self, vad_params, g_params, chunks, probs_v_list,
                      probs_g_list, n_frames, n_frames_patch, n20, ext=None):
        """Assemble per-chunk features + emissions and run the streaming
        tail program.  ONE owner of the tail argument construction, shared
        by run_streaming and the OnlineSegmenter (whose finalize()
        exactness depends on calling the tail identically).  A non-ladder
        chunk count is padded to the bucket ladder (inert rows: the tail
        masks by n_frames/n20), so every decode reuses the same compiled
        tail set as the offline path."""
        self._ensure_stream_jits()
        m = len(chunks)
        pad = bucket_chunks(m) - m
        rows = chunks[0][0].shape[0]
        probs_v_list = list(probs_v_list)
        mels = [x for x, _ in chunks]
        loges = [x for _, x in chunks]
        if pad:
            mels.append(jnp.zeros((pad * rows, chunks[0][0].shape[1]),
                                  chunks[0][0].dtype))
            loges.append(jnp.full(pad * rows, -jnp.inf))
            probs_v_list.append(jnp.full(
                (pad * rows // 2, probs_v_list[0].shape[1]), 0.5))
        probs_v = jnp.concatenate(probs_v_list)
        mspec_pad = jnp.concatenate(mels)
        loge_pad = jnp.concatenate(loges)
        probs_g = None
        if probs_g_list is not None:
            probs_g_list = list(probs_g_list)
            if pad:
                probs_g_list.append(jnp.full(
                    (pad * rows // 2, probs_g_list[0].shape[1]), 0.5))
            probs_g = jnp.concatenate(probs_g_list)
        if ext is not None:
            ext = (jnp.float32(ext[0]), jnp.float32(ext[1]),
                   jnp.asarray(ext[2], jnp.float32))
        return self._jit_tail(vad_params, g_params, mspec_pad, loge_pad,
                              probs_v, jnp.int32(n_frames),
                              jnp.int32(n_frames_patch), jnp.int32(n20),
                              probs_g, ext)

    # -- sequence-parallel single-file path ---------------------------------
    #
    # The multi-file engine (parallel/engine.py) shards *files* over the
    # mesh; this shards ONE file's timeline: the feature rows are split
    # into the streaming path's halo'd chunks and each device computes the
    # patch-CNN emissions for its slice (`jax.shard_map`, no collectives —
    # per-chunk emissions are independent, exactly the batch the reference
    # ships to one GPU at segmenter.py:162-163).  The cheap sequential
    # stages (energy/VAD/gender Viterbi, O(T) with K<=3 state) run in the
    # replicated streaming tail program.  Gender emissions are computed
    # speculatively over all chunks (segment-independent per-patch
    # normalization, reference segmenter.py:86): exactly equal on every
    # frame the masked gender Viterbi reads.

    def _sharded_chunk_prog(self, mesh):
        """jitted shard_map: (vad_params, g_params, mspec_pad) -> per-chunk
        CNN probs, chunk axis sharded over the mesh 'data' axis.

        The halo'd windows are built INSIDE the mapped body: ``mspec_pad``
        arrives replicated (one broadcast over ICI) and each device gathers
        only its own chunk windows via `lax.axis_index` — no serial
        full-file window materialization on one chip followed by a
        resharding of the whole tensor, which would put an O(file) copy on
        the single-file latency path this mode exists to shorten."""
        prog = self._sharded_progs.get(mesh)
        if prog is not None:
            return prog
        from jax.sharding import PartitionSpec as P

        from .dsp.sidekit import CHUNK

        axis = "data" if "data" in mesh.axis_names else mesh.axis_names[0]
        n_shard = mesh.shape[axis]

        def chunk_probs(forward, nmel, params, win):
            h = STREAM_HALO
            return self._chunk_probs_impl(
                forward, nmel, params, win[:h], win[h:win.shape[0] - h],
                win[win.shape[0] - h:], False)

        with_gender = self.gender is not None

        def body(vp, gp, mspec_pad):
            # per-device window build: rows [i*CHUNK - HALO,
            # (i+1)*CHUNK + HALO) with zeros outside the file (identical
            # to run_streaming's zero prev/next tails)
            t_rows, nmel_all = mspec_pad.shape
            n_chunks = -(-t_rows // CHUNK)
            per_dev = -(-n_chunks // n_shard)
            ext = jnp.zeros((per_dev * n_shard * CHUNK + 2 * STREAM_HALO,
                             nmel_all), mspec_pad.dtype)
            ext = jax.lax.dynamic_update_slice(
                ext, mspec_pad, (STREAM_HALO, 0))
            base = jax.lax.axis_index(axis) * (per_dev * CHUNK)
            idx = (base + (jnp.arange(per_dev) * CHUNK)[:, None]
                   + jnp.arange(CHUNK + 2 * STREAM_HALO)[None, :])
            wins = ext[idx]
            # lax.map (not vmap) over this device's chunks: activation
            # memory stays bounded at one chunk's CNN batch regardless of
            # file length
            pv = jax.lax.map(
                lambda w: chunk_probs(self.vad_forward, self.vad_nmel,
                                      vp, w), wins)
            if with_gender:
                pg = jax.lax.map(
                    lambda w: chunk_probs(self.g_forward, self.g_nmel,
                                          gp, w), wins)
                return pv, pg
            return (pv,)

        prog = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(), P()), out_specs=P(axis)))
        self._sharded_progs[mesh] = prog
        return prog

    def run_sharded(self, vad_params, g_params, mspec_pad, loge_pad,
                    n_frames, n_frames_patch, n20, mesh):
        """Sequence-parallel execution of one file over ``mesh``.

        Labels are identical to `run` / `run_streaming`
        (tests/test_sharded_file.py): the chunk decomposition is the
        exactness-proven streaming one, with chunk 0's left replicate
        edge repaired afterwards — frames < LPAD are overwritten with
        frame LPAD's emission, the very value the dedicated first-chunk
        branch selects for them (both are window 0's prediction,
        reference segmenter.py:83-85).
        """
        from .dsp.sidekit import CHUNK

        t_rows, _ = mspec_pad.shape
        # t_rows need not be a CHUNK multiple: rows past the file are zeros
        # in the chunk windows, and every emission that would read them is a
        # replicate-edge frame the tail repairs (_fix_right_edge) or lies
        # past t20 and is sliced off
        assert t_rows % 2 == 0, t_rows
        axis = "data" if "data" in mesh.axis_names else mesh.axis_names[0]
        n_shard = mesh.shape[axis]
        n_chunks = -(-t_rows // CHUNK)
        n_pad = -(-n_chunks // n_shard) * n_shard

        out = self._sharded_chunk_prog(mesh)(vad_params, g_params, mspec_pad)
        t20 = t_rows // 2

        def fix_left(p):
            p = p.reshape(n_pad * (CHUNK // 2), -1)[:t20]
            return p.at[:LPAD].set(p[LPAD])

        probs_v = fix_left(out[0])
        probs_g = fix_left(out[1]) if self.gender is not None else None
        if self._jit_tail is None:
            self._jit_tail = jax.jit(self._tail_impl)
        return self._jit_tail(vad_params, g_params, mspec_pad, loge_pad,
                              probs_v, jnp.int32(n_frames),
                              jnp.int32(n_frames_patch), jnp.int32(n20),
                              probs_g)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


def rle(labels: np.ndarray):
    """Run-length encode an int label array -> [(label, start, stop)]."""
    labels = np.asarray(labels)
    if len(labels) == 0:
        return []
    change = np.flatnonzero(np.diff(labels)) + 1
    bounds = np.concatenate([[0], change, [len(labels)]])
    return [(int(labels[a]), int(a), int(b))
            for a, b in zip(bounds[:-1], bounds[1:])]


def bucket_chunks(n: int):
    """Round a chunk count up to a bounded set of bucket sizes (1.5x ladder)
    so jit caches stay small while padding waste stays <= 50%."""
    b = 1
    while b < n:
        b = b * 2 if b < 4 else (b * 3 + 1) // 2
    return b


def bucket_rows(n_frames: int):
    """Padded feature-ROW count for ``n_frames`` frames: the chunk-bucket
    ladder times the feature chunk size.  The ONE owner of the row-bucket
    policy — `_sig2feats`, `segment_feats` and `segment_signal` all pad to
    this, and they must agree or their jit caches silently split (a fresh
    20-40 s compile per divergent shape through a remote-compile link)."""
    from .dsp.sidekit import CHUNK

    return bucket_chunks(max(1, -(-n_frames // CHUNK))) * CHUNK
