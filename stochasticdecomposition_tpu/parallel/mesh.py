"""Device-mesh sharding of the SD algorithm.

The reference is strictly single-process (SURVEY.md §2c); parallelism here is
architected from the problem structure, not ported:

  * axis "rep"  — replications (algo.c:36-76's sequential loop) run
    data-parallel: one SD cell per mesh slot, no cross-talk until the
    compromise stage.  This is the framework's DP axis.
  * axis "obs"  — the scenario/observation dimension: the omega pool, the
    delta table's observation axis, cut iStar records, and evaluation
    batches shard across devices.  The argmax accumulation (cuts.c:116-169)
    becomes per-shard partial sums combined by XLA-inserted collectives —
    the psum-style combine of SURVEY.md §5.

Implementation follows the GSPMD recipe: annotate shardings on the state
pytree, jit the *same* pure step function, let XLA insert collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stochasticdecomposition_tpu.config import SDConfig
from stochasticdecomposition_tpu.core.state import SDState


def make_mesh(n_rep: int = 1, n_obs: Optional[int] = None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_obs is None:
        n_obs = n // n_rep
    assert n_rep * n_obs == n, f"mesh {n_rep}x{n_obs} != {n} devices"
    dev_array = np.array(devices).reshape(n_rep, n_obs)
    return Mesh(dev_array, axis_names=("rep", "obs"))


# PartitionSpec per SDState field, for a state WITHOUT the leading rep axis.
# The "obs" axis shards the observation dimension of each pool.
_FIELD_SPECS = {
    "omega_vals": P("obs", None),
    "omega_w": P("obs"),
    "delta_pib": P(None, "obs"),
    "delta_piC": P(None, "obs", None),
    "cut_istar": P(None, "obs"),
}


def state_shardings(mesh: Mesh, with_rep_axis: bool) -> SDState:
    """A pytree of NamedShardings matching SDState's structure."""
    specs = {}
    for field in SDState._fields:
        spec = _FIELD_SPECS.get(field, P())
        if with_rep_axis:
            spec = P("rep", *spec)
        specs[field] = NamedSharding(mesh, spec)
    return SDState(**specs)


def make_multi_rep_step(pa, spec, cfg: SDConfig, mesh: Mesh):
    """vmapped-over-replications SD step, sharded over (rep, obs)."""
    from stochasticdecomposition_tpu.core.step import make_step

    step = make_step(pa, spec, cfg, jit=False)
    shardings = state_shardings(mesh, with_rep_axis=True)
    return jax.jit(jax.vmap(step), in_shardings=(shardings,),
                   out_shardings=shardings, donate_argnums=0)


def init_multi_rep_state(pa, caps, cfg: SDConfig, x0, seeds,
                         mesh: Mesh) -> SDState:
    """Stacked per-replication states, device_put with (rep, obs) sharding."""
    from stochasticdecomposition_tpu.core.state import init_state

    states = [init_state(pa, caps, cfg, x0,
                         jax.random.PRNGKey(int(s) % (2 ** 63 - 1)))
              for s in seeds]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    return jax.device_put(stacked, state_shardings(mesh, with_rep_axis=True))


def make_sharded_eval(pa, spec, batch: int, mesh: Mesh):
    """Observation-sharded evaluation batch: the scenario-DP showpiece.

    Replaces the sequential evaluate loop (evaluate.c:49-103): each device
    solves batch/n_obs subproblem LPs; the sums reduce across the mesh.
    """
    from stochasticdecomposition_tpu.core.evaluate import (
        eval_lane_plan, warm_staged_chunk_solver,
    )
    from stochasticdecomposition_tpu.sampler import sample_omega

    n_shard = mesh.shape["rep"] * mesh.shape["obs"]
    assert batch % n_shard == 0

    batch_sharding = NamedSharding(mesh, P(("rep", "obs")))

    def eval_batch(x, key):
        dtype = pa.c1.dtype
        w_raw = sample_omega(spec, key, batch, dtype=dtype)
        w_raw = jax.lax.with_sharding_constraint(w_raw, batch_sharding)
        w = w_raw - pa.omega_mean[None, :]

        # Same per-dispatch lane plan and warm/staged chunk solver as the
        # single-device evaluator (core/evaluate.py): MAX_VMAP_LANES
        # guards the wide-vmap miscompile, mem_lane_cap the PER-DEVICE
        # HBM peak, and the two-stage kernel-fault guard applies on
        # storm-class row counts.  The chunk width is max_lanes * n_shard
        # so each lax.map step still spreads max_lanes lanes per device;
        # the per-chunk sharding constraint keeps the observation axis
        # distributed.
        max_lanes, staged = eval_lane_plan(pa, None)
        solve_chunk = warm_staged_chunk_solver(pa, x, staged, None)
        chunk_w = max_lanes * n_shard
        if batch > chunk_w:
            assert batch % chunk_w == 0, (
                f"sharded eval batch {batch} must be a multiple of "
                f"{chunk_w} (lane cap x mesh size) to chunk evenly")
            n_chunks = batch // chunk_w
            w_c = w.reshape(n_chunks, chunk_w, -1)
            w_c = jax.lax.with_sharding_constraint(
                w_c, NamedSharding(mesh, P(None, ("rep", "obs"), None)))
            objs, ok = jax.lax.map(solve_chunk, w_c)
            objs = objs.reshape(-1)
            ok = ok.reshape(-1)
        else:
            objs, ok = solve_chunk(w)
        objs = jnp.where(ok, objs, 0.0)
        # Same (mean, M2, n_ok) Welford-batch contract as make_eval_batch;
        # the sums below are global (XLA inserts the cross-device psum).
        n_ok = jnp.sum(ok)
        mean = jnp.sum(objs) / jnp.maximum(n_ok, 1)
        dev = jnp.where(ok, objs - mean, 0.0)
        m2 = jnp.sum(dev * dev)
        return mean, m2, n_ok

    return jax.jit(eval_batch)
