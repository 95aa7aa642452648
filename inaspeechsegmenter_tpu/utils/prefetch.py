"""Depth-N producer/consumer batch driver.

The reference overlaps the NEXT file's decode+features with the CURRENT
file's inference via featGenerator/ThreadReturning (reference
segmenter.py:377-387).  This generalizes that pattern once for every
corpus surface (Segmenter.batch_process, VoiceFemininityScoring
.batch_score): ``ISS_PREFETCH`` producer threads run ``produce`` ahead
while the consumer drains serially, and any exception escaping
``produce``/``consume`` becomes that file's (dst, 2, 'error: ...') status
tuple instead of aborting the batch.
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor


def prefetch_depth():
    """Producer-thread depth: ``ISS_PREFETCH`` when it parses, else the
    core-count default (one-ahead only on >=4-core hosts — on low-core
    hosts concurrent producers contend with the device driver, measured 2x
    slower on a 1-core TPU host).  A malformed value warns and falls back
    instead of aborting the whole corpus job at batch start."""
    import warnings

    default = 2 if (os.cpu_count() or 1) >= 4 else 1
    raw = os.environ.get("ISS_PREFETCH", "").strip()
    if raw:
        try:
            return max(1, int(raw))
        except ValueError:
            warnings.warn(f"ignoring malformed ISS_PREFETCH={raw!r}; "
                          f"using the default depth {default}")
    return default


def staged_producer(stage, skipifexist=False, nbtry=1, trydelay=2.):
    """Build the standard corpus ``produce`` callback: skipifexist check,
    output-dir mkdir, retried ``stage(src)``, reference status tuples
    (exception CLASS in the error text, like reference
    segmenter.py:360-372).  One owner for the skeleton shared by
    Segmenter.batch_process and VoiceFemininityScoring.batch_score so the
    resume/retry policy cannot drift between the two batch surfaces."""
    from .retry import retry_call

    def produce(item):
        src, dst = item
        if skipifexist and os.path.exists(dst):
            return None, (dst, 1, "already exists")
        dname = os.path.dirname(dst)
        if dname and not os.path.isdir(dname):
            os.makedirs(dname, exist_ok=True)
        payload, err = retry_call(lambda: stage(src),
                                  nbtry=nbtry, trydelay=trydelay)
        if payload is None:
            return None, (dst, 2, "error: " + str(err))
        return payload, (dst, 0, "ok")

    return produce


def run_prefetched(items, produce, consume, verbose=False):
    """Drive ``items`` (src, dst) through produce (threaded) + consume.

    ``produce(item) -> (payload | None, msg)`` with ``msg`` a reference
    status tuple ``(dst, 0|1|2, text)``; payload None means skip/error.
    ``consume(payload, item, msg) -> msg`` runs serially in call order.

    Returns the reference batch accounting
    ``(total_s, n_ok, avg_s_per_ok, lmsg)`` with ``lmsg`` in input order.

    Depth default: one-ahead only on >=4-core hosts — on low-core hosts
    concurrent producers just contend with the device driver (measured 2x
    slower on a 1-core TPU host).
    """
    t0 = time.time()
    lmsg = []
    items = list(items)
    depth = prefetch_depth()
    with ThreadPoolExecutor(max_workers=depth) as pool:
        futs = {i: pool.submit(produce, items[i])
                for i in range(min(depth, len(items)))}
        for i, item in enumerate(items):
            try:
                payload, msg = futs.pop(i).result()
            except Exception as exc:   # produce escaping its own retry
                payload, msg = None, (item[1], 2, "error: " + repr(exc))
            j = i + depth
            if j < len(items):
                futs[j] = pool.submit(produce, items[j])
            lmsg.append(msg)
            if payload is not None:
                try:
                    lmsg[-1] = consume(payload, item, msg)
                except Exception as exc:  # bad dst, full disk, ...
                    lmsg[-1] = (item[1], 2, "error: " + repr(exc))
            if verbose:
                print("%d/%d" % (len(lmsg), len(items)), [lmsg[-1]])
    dur = time.time() - t0
    n_ok = len([e for e in lmsg if e[1] == 0])
    return dur, n_ok, dur / n_ok if n_ok else -1, lmsg
