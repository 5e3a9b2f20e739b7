"""BLOCKS / NORMAL / UNIFORM distribution coverage (stoch-file surface)."""

import os
import tempfile

import jax
import numpy as np
import pytest

from stochasticdecomposition_tpu.config import SDConfig
from stochasticdecomposition_tpu.models.extensive import (
    enumerate_scenarios, solve_extensive_form,
)
from stochasticdecomposition_tpu.prob import decompose
from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc
from stochasticdecomposition_tpu.sampler import build_sampler, sample_omega
from stochasticdecomposition_tpu.smps import read_core, read_stoc, read_time

_CORE = """NAME          BLK
ROWS
 N  OBJ
 G  R1A
 G  R2A
 G  R2B
COLUMNS
    X1        OBJ       2.0    R1A       1.0
    X1        R2A       -0.5
    X2        OBJ       1.5    R1A       1.0
    X2        R2B       -0.5
    Y1        OBJ       3.0    R2A       1.0
    Y2        OBJ       2.0    R2B       1.0
    S1        OBJ       40.0   R2A       1.0
    S2        OBJ       40.0   R2B       1.0
RHS
    RHS       R1A       2.0    R2A       3.0
    RHS       R2B       2.0
ENDATA
"""

_TIME = """TIME          BLK
PERIODS       IMPLICIT
    X1        R1A       STAGE1
    Y1        R2A       STAGE2
ENDATA
"""

# Joint (BLOCKS) distribution over both demand rows.
_STOC_BLOCKS = """STOCH         BLK
BLOCKS        DISCRETE
 BL B1        STAGE2    0.4
    RHS       R2A       2.0
    RHS       R2B       1.0
 BL B1        STAGE2    0.6
    RHS       R2A       4.0
    RHS       R2B       3.0
ENDATA
"""

_STOC_NORMAL = """STOCH         BLK
INDEP         NORMAL
    RHS       R2A       3.0    STAGE2    0.25
INDEP         UNIFORM
    RHS       R2B       1.0    STAGE2    3.0
ENDATA
"""


def _parse(stoc_text):
    with tempfile.TemporaryDirectory() as td:
        cp, tp, sp_ = (os.path.join(td, x) for x in ("b.cor", "b.tim", "b.sto"))
        for p, s in ((cp, _CORE), (tp, _TIME), (sp_, stoc_text)):
            with open(p, "w") as fh:
                fh.write(s)
        core = read_core(cp)
        tim = read_time(tp, core)
        stoc = read_stoc(sp_, core)
    return core, tim, stoc


def test_blocks_parse_and_sample():
    core, tim, stoc = _parse(_STOC_BLOCKS)
    assert len(stoc.blocks) == 1
    blk = stoc.blocks[0]
    assert blk.outcomes.shape == (2, 2)
    np.testing.assert_allclose(blk.probs, [0.4, 0.6])
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    spec = build_sampler(stoc, sp.rv_order)
    obs = np.asarray(sample_omega(spec, jax.random.PRNGKey(0), 3000))
    # Joint outcomes only: (2,1) or (4,3).
    combos = set(map(tuple, obs.round(6)))
    assert combos <= {(2.0, 1.0), (4.0, 3.0)}
    frac = np.mean(obs[:, 0] == 4.0)
    assert abs(frac - 0.6) < 0.05


@pytest.mark.slow
def test_blocks_sd_converges():
    core, tim, stoc = _parse(_STOC_BLOCKS)
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    outs, probs = enumerate_scenarios(stoc, sp.rv_order)
    assert len(probs) == 2
    ef_obj, _ = solve_extensive_form(sp, outs, probs)
    solver = SDSolver(sp, SDConfig(MAX_ITER=200, EVAL_FLAG=False))
    r = solver.solve_replication(0)
    ev = solver.evaluate_x(r.incumb_x)
    assert abs(ev.mean - ef_obj) / abs(ef_obj) < 0.01


@pytest.mark.slow
def test_continuous_distributions_run():
    core, tim, stoc = _parse(_STOC_NORMAL)
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    spec = build_sampler(stoc, sp.rv_order)
    obs = np.asarray(sample_omega(spec, jax.random.PRNGKey(1), 5000))
    assert abs(obs[:, 0].mean() - 3.0) < 0.05          # normal mean
    assert abs(obs[:, 0].std() - 0.5) < 0.05           # sqrt(0.25)
    assert obs[:, 1].min() >= 1.0 and obs[:, 1].max() <= 3.0   # uniform
    np.testing.assert_allclose(sp.rv.omega_mean, [3.0, 2.0])

    # SD runs with continuous support (every observation distinct).
    solver = SDSolver(sp, SDConfig(MAX_ITER=80, EVAL_FLAG=False))
    r = solver.solve_replication(0)
    assert r.unique_omegas == r.iterations   # no dedup hits
    assert np.isfinite(r.incumb_est)
