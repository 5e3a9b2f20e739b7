"""Multi-device sharding: scenario-parallel evaluation and the sharded SD
step over a (replication x observation) device mesh."""

from stochasticdecomposition_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, make_sharded_eval, make_multi_rep_step, state_shardings,
)
