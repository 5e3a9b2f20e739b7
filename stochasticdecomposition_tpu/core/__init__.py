"""Core SD algorithm: pools, cut formation, master, stopping rules."""

from stochasticdecomposition_tpu.core.state import (  # noqa: F401
    ProblemArrays, SDState, init_state, stage_problem,
)
