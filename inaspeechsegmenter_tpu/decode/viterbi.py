"""On-device log-domain Viterbi decoding.

The reference decodes with an interpreted Python loop over T frames
(reference pyannote_viterbi.py:202-220), called once per segment — the
dominant cost on hour-scale audio.  Here the forward pass and backtracking are
`lax.scan`s compiled by XLA, and the per-segment decoding of the reference is
expressed as a *single* full-sequence decode with **segment resets**: a
boolean per-frame `reset` mask marks frames that begin an independent segment;
at those frames the recursion restarts from the initial distribution and the
backtracking restarts from that segment's own final argmax.  This is exactly
equivalent to looping over segments, but runs as one fused kernel with no
host round-trips and no recompilation per segment length.

Numerics: carried scores are renormalized (subtract running max) every step so
float32 stays exact-enough over hour-long sequences; renormalization never
changes the argmax path.

Capability parity: `viterbi_decoding` reproduces the full constrained API of
the reference (initial / consecutive min-duration via state duplication /
per-frame FORBIDDEN-MANDATORY constraints, pyannote_viterbi.py:118-224).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

VITERBI_CONSTRAINT_NONE = 0
VITERBI_CONSTRAINT_FORBIDDEN = 1
VITERBI_CONSTRAINT_MANDATORY = 2

LOG_ZERO = float(np.log(1e-200))


@partial(jax.jit, static_argnames=())
def _viterbi_scan(emission, transition, initial, reset):
    """Core scan. emission (T,K) f32, transition (K,K), initial (K,),
    reset (T,) bool with reset[0] == True.

    Returns states (T,) int32.
    """
    K = emission.shape[1]
    idstates = jnp.arange(K, dtype=jnp.int32)

    def fwd(v, inp):
        em, rst = inp
        # tmp[k, k'] = v[k] + transition[k, k']
        tmp = v[:, None] + transition
        ptr = jnp.argmax(tmp, axis=0).astype(jnp.int32)          # (K,)
        score = em + jnp.max(tmp, axis=0)                        # (K,)
        v_new = jnp.where(rst, em + initial, score)
        ptr = jnp.where(rst, idstates, ptr)
        v_new = v_new - jnp.max(v_new)                           # renormalize
        amax = jnp.argmax(v_new).astype(jnp.int32)
        return v_new, (ptr, amax)

    v0 = jnp.full((K,), 0.0, emission.dtype)
    _, (ptrs, amax) = jax.lax.scan(fwd, v0, (emission, reset))

    # Backtrack. seg_end[t] means frame t is the last frame of a segment.
    T = emission.shape[0]
    seg_end = jnp.concatenate([reset[1:], jnp.ones((1,), bool)])
    # next_ptr[t] = ptrs[t+1] (pointer from t+1 back to t); unused at seg ends.
    next_ptr = jnp.concatenate([ptrs[1:], ptrs[-1:]], axis=0)

    def bwd(x_next, inp):
        p_next, end, am = inp
        x = jnp.where(end, am, p_next[x_next])
        return x, x

    _, states_rev = jax.lax.scan(
        bwd, jnp.int32(0), (next_ptr[::-1], seg_end[::-1], amax[::-1]))
    return states_rev[::-1]


def viterbi_path(emission, transition, initial=None, reset=None):
    """Most probable state path, with optional independent-segment resets.

    :param emission: (T, K) log-emissions (array-like, any float dtype).
    :param transition: (K, K) log-transitions.
    :param initial: optional (K,) log-initial; defaults to uniform.
    :param reset: optional (T,) bool; True at frames that start a new
        independent segment (frame 0 is always a segment start).
    :return: (T,) int32 state sequence (device array).
    """
    emission = jnp.asarray(emission, jnp.float32)
    T, K = emission.shape
    transition = jnp.asarray(transition, jnp.float32)
    if initial is None:
        initial = jnp.full((K,), float(np.log(1.0 / K)), jnp.float32)
    else:
        initial = jnp.asarray(initial, jnp.float32)
    if reset is None:
        reset = jnp.zeros((T,), bool)
    else:
        reset = jnp.asarray(reset, bool)
    reset = reset.at[0].set(True)
    return _viterbi_scan(emission, transition, initial, reset)


# ---------------------------------------------------------------------------
# Full constrained API (parity with reference pyannote_viterbi.viterbi_decoding)
# ---------------------------------------------------------------------------

def _expand_consecutive(emission, transition, initial, constraint, consecutive):
    """Implement minimum-consecutive-state constraints by state duplication.

    State i is split into C[i] chained sub-states: entering i lands on the
    first sub-state, each sub-state deterministically advances to the next,
    and only the last sub-state may transition out — enforcing a minimum dwell
    of C[i] frames (same construction as pyannote_viterbi.py:51-115).
    """
    K = len(consecutive)
    newK = int(np.sum(consecutive))
    bounds = np.concatenate([[0], np.cumsum(consecutive)])
    start, end = bounds[:-1], bounds[1:] - 1

    new_T = np.full((newK, newK), LOG_ZERO)
    for i in range(1, newK):
        new_T[i - 1, i] = 0.0  # log(1): forced advance within the chain
    for i in range(K):
        for j in range(K):
            new_T[end[i], start[j]] = transition[i, j]

    new_I = np.full((newK,), LOG_ZERO)
    new_I[start] = initial

    # duplicate emission / constraint columns per sub-state
    col_of = np.concatenate([np.full(c, i) for i, c in enumerate(consecutive)])
    new_E = emission[:, col_of]
    new_C = constraint[:, col_of]
    return new_E, new_T, new_I, new_C, col_of


def viterbi_decoding(emission, transition, initial=None, consecutive=None,
                     constraint=None, reset=None):
    """(Constrained) Viterbi decoding — reference-compatible signature.

    Parameters match reference pyannote_viterbi.py:118-144: emission (T,K)
    log-probs, transition (K,K), optional initial (K,), optional
    `consecutive` min-duration (int or per-state array), optional per-frame
    constraint matrix (0 none / 1 forbidden / 2 mandatory).  The extra
    `reset` argument exposes the fused independent-segment decode.

    :return: numpy int array (T,) of most probable states.
    """
    emission = np.asarray(emission, dtype=np.float32)
    T, K = emission.shape

    if consecutive is None:
        consecutive = np.ones((K,), dtype=int)
    elif np.isscalar(consecutive):
        consecutive = int(consecutive) * np.ones((K,), dtype=int)
    else:
        consecutive = np.array(consecutive, dtype=int).reshape((K,))
    consecutive = np.maximum(1, consecutive)

    if initial is None:
        initial = np.log(np.ones((K,)) / K)
    else:
        initial = np.asarray(initial, dtype=np.float64)

    if constraint is None:
        constraint = np.zeros((T, K))
    constraint = np.asarray(constraint)

    transition = np.asarray(transition, dtype=np.float64)

    if np.any(consecutive > 1):
        emission, transition, initial, constraint, col_of = _expand_consecutive(
            emission, transition, initial, constraint, consecutive)
    else:
        col_of = np.arange(K)

    # apply forbidden / mandatory constraints to the emission matrix
    emission = np.array(emission, dtype=np.float32, copy=True)
    emission[constraint == VITERBI_CONSTRAINT_FORBIDDEN] = LOG_ZERO
    mand_t, mand_k = np.where(constraint == VITERBI_CONSTRAINT_MANDATORY)
    for t, k in zip(mand_t, mand_k):
        keep = emission[t, k]
        emission[t, :] = LOG_ZERO
        emission[t, k] = keep

    states = np.asarray(viterbi_path(emission, transition, initial, reset))
    return col_of[states] if np.any(consecutive > 1) else states
