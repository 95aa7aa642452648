"""Multi-file data-parallel segmentation engine.

Replaces the reference's process-per-GPU Pyro4 farm with a single engine
that shards *files* across TPU chips: each device processes a different
file's features through the fused pipeline simultaneously (vmapped fused
program, batch axis sharded over the mesh data axis, params replicated).

Files are grouped by length bucket so one compiled program serves each
group; host decode + feature staging for the next group overlaps device
execution of the current one.

A single file (where file-level data parallelism has nothing to shard)
instead has its TIMELINE sharded over the mesh: `__call__` /
`segment_feats_sharded` dispatch `pipeline.run_sharded`, and
`segment_many` routes a file that is alone in its length bucket through
it automatically (the ragged tail of a multi-group bucket stays on the
already-compiled batched program instead — see segment_many).
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..export import seg2csv, seg2textgrid
from ..segmenter import patch_counts
from ..utils.retry import retry_call
from .mesh import make_mesh


class ParallelEngine:
    """Data-parallel wrapper around a Segmenter.

    :param segmenter: a constructed `Segmenter` (models + fused pipeline).
    :param mesh: optional 1-D `Mesh`; defaults to all local devices.
    """

    def __init__(self, segmenter, mesh=None):
        self.seg = segmenter
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_dev = self.mesh.devices.size
        # rebuild the pipeline without cond-based chunk skipping: vmap turns
        # lax.cond into select (both branches execute), so the skip only
        # costs compile time here
        from ..pipeline import FusedPipeline

        pipeline = FusedPipeline(
            segmenter.vad.as_pipeline_stage(),
            segmenter.gender.as_pipeline_stage()
            if segmenter.detect_gender else None,
            energy_ratio=segmenter.energy_ratio, skip_inactive=False)

        batched = jax.vmap(pipeline._run_impl,
                           in_axes=(None, None, 0, 0, 0, 0, 0))
        data_sharding = NamedSharding(self.mesh, P("data"))
        rep = NamedSharding(self.mesh, P())
        self._batched = jax.jit(
            batched,
            in_shardings=(rep, rep, data_sharding, data_sharding,
                          data_sharding, data_sharding, data_sharding),
            out_shardings=data_sharding)

    def __call__(self, medianame, start_sec=None, stop_sec=None):
        """Single-file segmentation with the file's timeline sharded over
        the mesh -> [(label, start_s, stop_s)].

        Sequence-parallel counterpart to `Segmenter.__call__`: the
        dominant patch-CNN emissions are computed chip-parallel over the
        file's feature chunks (pipeline.run_sharded) — the latency answer
        for ONE long file on a pod, where `segment_many`'s file-level
        data parallelism has nothing to shard.  Output is identical to
        the single-device path (tests/test_sharded_file.py).
        """
        feats = self.seg._media2feats(medianame, start_sec, stop_sec)
        return self.segment_feats_sharded(
            *feats, 0 if start_sec is None else start_sec)

    def segment_feats_sharded(self, mspec_dev, loge_dev, t, difflen,
                              start_sec=0):
        """Sharded-timeline decode of prepared features -> lseg."""
        if self.n_dev == 1:
            # nothing to shard: the plain fused program is identical,
            # already shared with segment_many/batch_process, and skips
            # compiling a dedicated shard_map chunk program + streaming
            # tail (20-40 s each through a remote-compile tunnel) that
            # would buy zero parallelism (same guard segment_many takes)
            return self.seg._fused_segment(mspec_dev, loge_dev, t,
                                           difflen, start_sec)
        n_frames_patch, n20 = patch_counts(t, difflen)
        with self.seg.timers.time("segment"):
            ids = self.seg.pipeline.run_sharded(
                self.seg.vad.model.params,
                self.seg.gender.model.params if self.seg.detect_gender
                else None,
                mspec_dev, loge_dev, t, n_frames_patch, n20, self.mesh)
            ids = np.asarray(ids)[:n20]
        return self.seg.ids_to_lseg(ids, start_sec)

    def segment_many(self, feats_list, shard_single_file=True):
        """Segment a list of (mspec_pad, loge_pad, t, difflen) with one
        sharded dispatch per device-sized group; returns label-id arrays.

        ``shard_single_file=False`` forces every group onto the batched
        copy-padded program (callers that know the batched program is
        already warm for the file's bucket — e.g. the ragged tail of a
        corpus — avoid compiling a second, sharded program for it)."""
        out = [None] * len(feats_list)
        # group indices by padded length so shapes are uniform per dispatch
        groups = defaultdict(list)
        for i, (mspec, loge, t, difflen) in enumerate(feats_list):
            groups[mspec.shape[0]].append(i)
        for _, idxs in groups.items():
            for j0 in range(0, len(idxs), self.n_dev):
                chunk = idxs[j0:j0 + self.n_dev]
                if (len(idxs) == 1 and self.n_dev > 1
                        and shard_single_file):
                    # a bucket whose ONLY file is this one has no file-level
                    # parallelism and no batched program to share — shard its
                    # TIMELINE instead of padding the mesh with copies
                    # (identical labels, tests/test_sharded_file.py).  A
                    # ragged TAIL of a multi-group bucket stays on the
                    # batched program below: it is already compiled for the
                    # bucket's full groups, so copy-padding is free while a
                    # timeline shard would compile a fresh program per
                    # bucket shape (20-40 s through a remote-compile
                    # tunnel).  On a 1-device mesh the plain fused
                    # batch-of-1 below is already optimal (and its program
                    # is shared with the multi-file groups)
                    i = chunk[0]
                    mspec, loge, t, difflen = feats_list[i]
                    nfp, n_out = patch_counts(t, difflen)
                    ids = self.seg.pipeline.run_sharded(
                        self.seg.vad.model.params,
                        self.seg.gender.model.params
                        if self.seg.detect_gender else None,
                        jnp.asarray(mspec), jnp.asarray(loge),
                        t, nfp, n_out, self.mesh)
                    out[i] = np.asarray(ids)[:n_out]
                    continue
                pad_to = self.n_dev
                # features are usually already device-resident (jnp
                # frontend): stack on device — np.asarray here would
                # round-trip every file's features over the link
                ms = [feats_list[i][0] for i in chunk]
                lg = [feats_list[i][1] for i in chunk]
                nf, nfp, n20 = [], [], []
                for i in chunk:
                    _, _, t, difflen = feats_list[i]
                    frames_patch, n_out = patch_counts(t, difflen)
                    nf.append(t)
                    nfp.append(frames_patch)
                    n20.append(n_out)
                while len(ms) < pad_to:  # pad group with a copy
                    ms.append(ms[0])
                    lg.append(lg[0])
                    nf.append(nf[0])
                    nfp.append(nfp[0])
                    n20.append(n20[0])
                ids = self._batched(
                    self.seg.vad.model.params,
                    self.seg.gender.model.params if self.seg.detect_gender
                    else None,
                    jnp.stack([jnp.asarray(m) for m in ms]),
                    jnp.stack([jnp.asarray(l) for l in lg]),
                    jnp.asarray(nf, jnp.int32), jnp.asarray(nfp, jnp.int32),
                    jnp.asarray(n20, jnp.int32))
                ids = np.asarray(ids)
                for k, i in enumerate(chunk):
                    out[i] = ids[k][:n20[k]]
        return out

    def batch_process(self, linput, loutput, verbose=False, skipifexist=False,
                      nbtry=1, trydelay=2., output_format="csv"):
        """Data-parallel batch processing with reference-compatible status
        tuple returns; host feature staging overlaps device execution."""
        if output_format not in ("csv", "textgrid"):
            # same error contract as Segmenter.batch_process
            raise NotImplementedError()
        fexport = {"csv": seg2csv, "textgrid": seg2textgrid}[output_format]
        t0 = time.time()
        # status tuples keep INPUT order (reference contract: callers zip
        # loutput with lmsg positionally), so skips reserve their slot
        lmsg = [None] * len(linput)
        todo = []
        for pos, (src, dst) in enumerate(zip(linput, loutput)):
            if skipifexist and os.path.exists(dst):
                lmsg[pos] = (dst, 1, "already exists")
                continue
            dname = os.path.dirname(dst)
            if dname and not os.path.isdir(dname):
                os.makedirs(dname, exist_ok=True)
            todo.append((pos, src, dst))

        def stage(item):
            # per-file retry with randomized backoff, identical semantics to
            # Segmenter.batch_process (flaky remote/NFS media on farm nodes)
            _, src, dst = item
            feats, err = retry_call(
                lambda: self.seg._media2feats(src, None, None),
                nbtry=nbtry, trydelay=trydelay)
            if feats is None:
                return None, (dst, 2, "error: " + str(err))
            return feats, (dst, 0, "ok")

        # process in device-sized groups; stage the next group's features on
        # a worker thread while the current group runs on the mesh.  A
        # single-file WORKLOAD is sharded over its timeline inside
        # segment_many (the latency case); the 1-file ragged tail of a
        # multi-file corpus instead reuses the batched program its earlier
        # groups already compiled (shard_single_file=False)
        shard_single = len(todo) == 1
        group = self.n_dev
        batches = [todo[i:i + group] for i in range(0, len(todo), group)]
        done = 0
        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(lambda b: [stage(x) for x in b],
                              batches[0]) if batches else None
            for bi, batch in enumerate(batches):
                staged = fut.result()
                fut = (pool.submit(lambda b: [stage(x) for x in b],
                                   batches[bi + 1])
                       if bi + 1 < len(batches) else None)
                ok = [(i, f) for i, (f, m) in enumerate(staged)
                      if f is not None]
                results = self.segment_many(
                    [f for _, f in ok],
                    shard_single_file=shard_single) if ok else []
                res_by_idx = {i: r for (i, _), r in zip(ok, results)}
                for i, (feats, msg) in enumerate(staged):
                    pos = batch[i][0]
                    lmsg[pos] = msg
                    done += 1
                    if feats is not None:
                        # contain export failures per file (unwritable dst,
                        # dst-is-a-directory, ...) exactly like
                        # Segmenter.batch_process: status 2, farm keeps going
                        b = time.time()
                        try:
                            lseg = self.seg.ids_to_lseg(res_by_idx[i])
                            fexport(lseg, batch[i][2])
                            lmsg[pos] = (msg[0], msg[1],
                                         "ok " + str(time.time() - b))
                        except Exception as e:  # noqa: BLE001
                            # repr, matching utils/prefetch.py's containment
                            # (str(e) can be empty, e.g. a bare OSError())
                            lmsg[pos] = (msg[0], 2, "error: " + repr(e))
                    if verbose:
                        print("%d/%d" % (done, len(todo)), [lmsg[pos]])

        dur = time.time() - t0
        n_ok = len([e for e in lmsg if e is not None and e[1] == 0])
        return dur, n_ok, dur / n_ok if n_ok else -1, lmsg
