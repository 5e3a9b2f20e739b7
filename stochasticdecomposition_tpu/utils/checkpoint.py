"""Checkpoint / resume.

The reference has none (SURVEY.md §5: state lives in RAM, runs are short).
For production preemptible-TPU runs the full SDState pytree (pools, cuts,
incumbent, PRNG key) serializes to one .npz; restoring reproduces the
replication bit-for-bit from the save point.

Alongside SDState, host-side loop state is persisted so resumed runs match
uninterrupted ones exactly:
  * ``eval_key`` — the bootstrap full-test PRNG key (its split sequence
    would otherwise restart and change which iteration the test passes at);
  * ``pool_alpha``/``pool_beta`` — the host feasibility-cut pool
    (updtFeasCutPool's accumulated (ray x observation) cuts, cuts.c:465-517;
    state.f_updt's watermarks make the pool unreconstructable without them).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from stochasticdecomposition_tpu.core.state import SDState

_HOST_PREFIX = "__host_"


def save_state(path: str, state: SDState, *, eval_key=None,
               pool_alpha: Optional[List[float]] = None,
               pool_beta: Optional[List[np.ndarray]] = None) -> None:
    arrays = {f: np.asarray(getattr(state, f)) for f in SDState._fields}
    if eval_key is not None:
        arrays[_HOST_PREFIX + "eval_key"] = np.asarray(eval_key)
    if pool_alpha:
        arrays[_HOST_PREFIX + "pool_alpha"] = np.asarray(pool_alpha)
        arrays[_HOST_PREFIX + "pool_beta"] = np.stack(pool_beta)
    np.savez_compressed(path, **arrays)


def load_state(path: str, like: SDState) -> SDState:
    """Load a checkpoint; ``like`` supplies dtypes/structure (a fresh
    init_state with identical capacities)."""
    state, _ = load_checkpoint(path, like)
    return state


def load_checkpoint(path: str, like: SDState) -> Tuple[SDState, dict]:
    """Load a checkpoint plus the host-side extras dict (possibly empty for
    checkpoints written before the extras existed)."""
    import jax.numpy as jnp

    data = np.load(path)
    kwargs = {}
    for f in SDState._fields:
        ref = getattr(like, f)
        if f not in data:
            # A checkpoint from an older code version with fewer fields
            # would resume with MIXED restored/fresh state — a silent break
            # of the bit-identical-resume guarantee.  Fail loudly instead.
            raise ValueError(
                f"checkpoint {path} lacks state field {f!r} (written by an "
                "older code version?); resuming it would silently mix "
                "restored and fresh state")
        arr = data[f]
        if arr.shape != np.asarray(ref).shape:
            raise ValueError(
                f"checkpoint field {f} has shape {arr.shape}, expected "
                f"{np.asarray(ref).shape} (capacities/config must match)")
        kwargs[f] = jnp.asarray(arr, np.asarray(ref).dtype)

    extras = {}
    if _HOST_PREFIX + "eval_key" in data:
        extras["eval_key"] = jnp.asarray(data[_HOST_PREFIX + "eval_key"])
    if _HOST_PREFIX + "pool_alpha" in data:
        extras["pool_alpha"] = [float(a)
                                for a in data[_HOST_PREFIX + "pool_alpha"]]
        extras["pool_beta"] = [np.asarray(b)
                               for b in data[_HOST_PREFIX + "pool_beta"]]
    return SDState(**kwargs), extras


# ---- meshed-path wave checkpoints (parallel/runner.py) --------------------
# The production (--mesh) driver steps a WAVE of replications as one
# vmapped+sharded program; its checkpoint is the stacked [W, ...] SDState
# plus the per-replication host loop state (done/optimal masks, eval-key
# streams, feasibility-cut pools, uncertified-master counters) so a killed
# run resumes bit-identically.


def save_wave_checkpoint(path: str, stacked, *, wave_start: int, done,
                         optimal, eval_keys, master_fails: dict,
                         pools: dict) -> None:
    W = len(done)
    arrays = {f: np.asarray(getattr(stacked, f)) for f in SDState._fields}
    arrays[_HOST_PREFIX + "wave_start"] = np.asarray(wave_start, np.int64)
    arrays[_HOST_PREFIX + "done"] = np.asarray(done, bool)
    arrays[_HOST_PREFIX + "optimal"] = np.asarray(optimal, bool)
    arrays[_HOST_PREFIX + "eval_keys"] = np.stack(
        [np.asarray(k) for k in eval_keys])
    arrays[_HOST_PREFIX + "master_fails"] = np.asarray(
        [int(master_fails.get(i, 0)) for i in range(W)], np.int64)
    for i, (pa_, pb_) in pools.items():
        if pa_:
            arrays[_HOST_PREFIX + f"pool_alpha_{i}"] = np.asarray(pa_)
            arrays[_HOST_PREFIX + f"pool_beta_{i}"] = np.stack(pb_)
    np.savez_compressed(path, **arrays)


def load_wave_checkpoint(path: str, like_stacked):
    """Returns (stacked_state_numpy_pytree, extras).  ``like_stacked``
    supplies the expected [W, ...] shapes/dtypes (a freshly staged wave)."""
    import jax.numpy as jnp

    data = np.load(path)
    kwargs = {}
    for f in SDState._fields:
        ref = np.asarray(getattr(like_stacked, f))
        if f not in data:
            # See load_checkpoint: silent fresh-value substitution would
            # break the bit-identical-resume guarantee without any signal.
            raise ValueError(
                f"wave checkpoint {path} lacks state field {f!r} (written "
                "by an older code version?); resuming it would silently "
                "mix restored and fresh state")
        arr = data[f]
        if arr.shape != ref.shape:
            raise ValueError(
                f"wave checkpoint field {f} has shape {arr.shape}, expected "
                f"{ref.shape} (mesh/capacities/config must match)")
        kwargs[f] = arr.astype(ref.dtype)

    done = data[_HOST_PREFIX + "done"]
    W = len(done)
    pools = {i: ([], []) for i in range(W)}
    for i in range(W):
        ka = _HOST_PREFIX + f"pool_alpha_{i}"
        if ka in data:
            pools[i] = ([float(a) for a in data[ka]],
                        [np.asarray(b)
                         for b in data[_HOST_PREFIX + f"pool_beta_{i}"]])
    mf = data[_HOST_PREFIX + "master_fails"]
    extras = dict(
        wave_start=int(data[_HOST_PREFIX + "wave_start"]),
        done=np.asarray(done, bool),
        optimal=np.asarray(data[_HOST_PREFIX + "optimal"], bool),
        eval_keys=[jnp.asarray(k)
                   for k in data[_HOST_PREFIX + "eval_keys"]],
        master_fails={i: int(mf[i]) for i in range(W) if mf[i]},
        pools=pools,
    )
    return SDState(**kwargs), extras
