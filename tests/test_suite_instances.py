"""Scale-faithful benchmark-suite instances: parse, decompose, run SD steps.

The reference suite (sd_experiments.sh:21) is exercised here at its real
stage dimensions via models/suite.py stand-ins.  Full-size members (ssnlike,
stormlike) are covered by bench.py on the device; here the mid-scale members
prove the whole pipeline (parse -> decompose -> iterate -> evaluate) at
dimensions beyond toy size.
"""

import numpy as np
import pytest

from stochasticdecomposition_tpu.config import SDConfig
from stochasticdecomposition_tpu.models.suite import SUITE, load_suite_instance
from stochasticdecomposition_tpu.prob import decompose
from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc


def test_suite_registry_shapes():
    """Every suite member parses and decomposes to its declared shape."""
    for name in ("cep1like", "baa99like", "lands3like"):
        core, tim, stoc = load_suite_instance(name)
        sp = attach_stoc(decompose(core, tim, stoc), stoc)
        kw = SUITE[name]
        # second stage: m2 rows, n2 structural + m2 surplus columns
        assert sp.second.D.shape[0] == kw["m2"]
        assert sp.second.D.shape[1] == kw["n2"] + kw["m2"]
        assert len(sp.rv_order) >= kw["n_rv"]


@pytest.mark.slow
@pytest.mark.parametrize("name", ["cep1like", "baa99-20like"])
def test_suite_sd_converges_loose(name):
    """Mid-scale members run SD to a sane estimate (vs extensive form when
    enumerable)."""
    core, tim, stoc = load_suite_instance(name)
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    cfg = SDConfig(MAX_ITER=120, MIN_ITER=30, EVAL_FLAG=False, SCAN_LEN=32,
                   EPSILON=0.01)
    solver = SDSolver(sp, cfg)
    r = solver.solve_replication(0)
    ev = solver.evaluate_x(r.incumb_x)
    # candidate estimate and out-of-sample estimate agree to ~10% (loose,
    # small iteration budget; exact parity is bench.py's job)
    assert ev.mean > 0
    assert abs(r.incumb_est - ev.mean) / abs(ev.mean) < 0.15


@pytest.mark.slow
def test_4nodelike_steps():
    """A mid-large member (74x186 second stage, 12 RVs) advances and forms
    cuts without blowing pools."""
    core, tim, stoc = load_suite_instance("4nodelike")
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    cfg = SDConfig(MAX_ITER=12, EVAL_FLAG=False, SCAN_LEN=16)
    solver = SDSolver(sp, cfg)
    from stochasticdecomposition_tpu.core.state import init_state
    import jax

    state = init_state(solver.pa, solver.caps, cfg, solver.mean_sol,
                       jax.random.PRNGKey(0))
    for _ in range(6):
        state = solver.step(state)
    assert int(state.k) == 6
    assert int(np.sum(np.asarray(state.cut_mask))) >= 1
    assert bool(np.all(np.isfinite(np.asarray(state.incumb_x))))
