"""Device-side numerical kernels: batched simplex LP solver and proximal QP."""

from stochasticdecomposition_tpu.ops.simplex import (  # noqa: F401
    LPResult, solve_lp, make_standard_form,
    STATUS_OPTIMAL, STATUS_INFEASIBLE, STATUS_UNBOUNDED, STATUS_ITER_LIMIT,
    AT_LOWER, BASIC, AT_UPPER, FREE_NB,
)
from stochasticdecomposition_tpu.ops.qp import QPResult, solve_qp  # noqa: F401
