"""Checkpoint / resume.

The reference has none (SURVEY.md §5: state lives in RAM, runs are short).
For production preemptible-TPU runs the full SDState pytree (pools, cuts,
incumbent, PRNG key) serializes to one .npz; restoring reproduces the
replication bit-for-bit from the save point.
"""

from __future__ import annotations

import numpy as np

from stochasticdecomposition_tpu.core.state import SDState


def save_state(path: str, state: SDState) -> None:
    arrays = {f: np.asarray(getattr(state, f)) for f in SDState._fields}
    np.savez_compressed(path, **arrays)


def load_state(path: str, like: SDState) -> SDState:
    """Load a checkpoint; ``like`` supplies dtypes/structure (a fresh
    init_state with identical capacities)."""
    import jax.numpy as jnp

    data = np.load(path)
    kwargs = {}
    for f in SDState._fields:
        ref = getattr(like, f)
        arr = data[f]
        if arr.shape != np.asarray(ref).shape:
            raise ValueError(
                f"checkpoint field {f} has shape {arr.shape}, expected "
                f"{np.asarray(ref).shape} (capacities/config must match)")
        kwargs[f] = jnp.asarray(arr, np.asarray(ref).dtype)
    return SDState(**kwargs)
