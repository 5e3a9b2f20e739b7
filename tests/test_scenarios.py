"""SMPS SCENARIOS sections lowered to BLOCKS-equivalent joint outcomes.

Beyond reference parity (the reference documents INDEP+BLOCKS only,
/root/reference README.md:23): several SIPLIB originals ship as SCENARIOS,
so the parser lowers them at read time to one Block whose outcomes are the
fully-resolved scenario vectors (smps/stoc.py _flush_scenarios).
"""

import os

import numpy as np
import pytest

from stochasticdecomposition_tpu.models.extensive import (
    enumerate_scenarios, solve_extensive_form,
)
from stochasticdecomposition_tpu.models.instances import (
    _LANDS_CORE, _LANDS_TIME, load_instance,
)
from stochasticdecomposition_tpu.prob import decompose
from stochasticdecomposition_tpu.smps import read_core, read_stoc, read_time
from stochasticdecomposition_tpu.smps.stoc import DIST_BLOCK

_LANDS_SCEN_STOC = """STOCH         LANDS
SCENARIOS     DISCRETE
 SC LOW       ROOT      0.33333333333333    STAGE2
    RHS       DEM1      3.0
 SC MID       ROOT      0.33333333333334    STAGE2
    RHS       DEM1      5.0
 SC HIGH      ROOT      0.33333333333333    STAGE2
    RHS       DEM1      7.0
ENDATA
"""


def _parse_lands_with_stoc(tmp_path, stoc_text):
    cp, tp, sp = (os.path.join(tmp_path, n)
                  for n in ("p.cor", "p.tim", "p.sto"))
    for p, s in ((cp, _LANDS_CORE), (tp, _LANDS_TIME), (sp, stoc_text)):
        with open(p, "w") as fh:
            fh.write(s)
    core = read_core(cp)
    tim = read_time(tp, core)
    return core, tim, read_stoc(sp, core)


def test_scenarios_lowered_to_block(tmp_path):
    core, tim, stoc = _parse_lands_with_stoc(str(tmp_path), _LANDS_SCEN_STOC)
    assert stoc.num_omega == 1
    el = stoc.elements[0]
    assert el.dist == DIST_BLOCK and el.block_id == 0
    blk = stoc.blocks[0]
    np.testing.assert_allclose(blk.outcomes[:, 0], [3.0, 5.0, 7.0])
    np.testing.assert_allclose(blk.probs.sum(), 1.0)
    # Same mean as the INDEP formulation shipped with the instance.
    _, _, stoc_indep = load_instance("lands")
    np.testing.assert_allclose(stoc.means(), stoc_indep.means(), rtol=1e-12)


def test_scenarios_extensive_form_matches_indep(tmp_path):
    core, tim, stoc = _parse_lands_with_stoc(str(tmp_path), _LANDS_SCEN_STOC)
    sp = decompose(core, tim, stoc)
    outs, probs = enumerate_scenarios(stoc, sp.rv_order)
    assert outs.shape == (3, 1)
    obj, _ = solve_extensive_form(sp, outs, probs)
    # Classical published optimum for 3-scenario LandS is ~381.853.
    assert abs(obj - 381.853) < 0.5


def test_scenarios_parent_inheritance(tmp_path):
    # HIGH branches from MID and overrides only DEM1: DEM2 must inherit
    # MID's 4.0 (not the core's 3.0), and LOW keeps core values for
    # positions it never mentions.
    text = """STOCH         LANDS
SCENARIOS
 SC LOW       ROOT      0.5    STAGE2
    RHS       DEM1      3.0
 SC MID       ROOT      0.3    STAGE2
    RHS       DEM1      5.0
    RHS       DEM2      4.0
 SC HIGH      MID       0.2    STAGE2
    RHS       DEM1      7.0
ENDATA
"""
    core, tim, stoc = _parse_lands_with_stoc(str(tmp_path), text)
    blk = stoc.blocks[0]
    assert blk.outcomes.shape == (3, 2)
    # Position order is first-seen: DEM1 then DEM2. Core DEM2 rhs is 3.0.
    dem2_core = float(core.b[core.row_index["DEM2"]])
    np.testing.assert_allclose(blk.outcomes[0], [3.0, dem2_core])  # LOW
    np.testing.assert_allclose(blk.outcomes[1], [5.0, 4.0])        # MID
    np.testing.assert_allclose(blk.outcomes[2], [7.0, 4.0])        # HIGH

    sp = decompose(core, tim, stoc)
    outs, probs = enumerate_scenarios(stoc, sp.rv_order)
    assert outs.shape == (3, 2)
    np.testing.assert_allclose(probs, [0.5, 0.3, 0.2])


@pytest.mark.slow
def test_scenarios_sd_end_to_end(tmp_path):
    # The lowered block feeds the full SD pipeline (sampler -> SD loop).
    from stochasticdecomposition_tpu.config import SDConfig
    from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc

    core, tim, stoc = _parse_lands_with_stoc(str(tmp_path), _LANDS_SCEN_STOC)
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    solver = SDSolver(sp, SDConfig(MAX_ITER=60, EVAL_FLAG=False))
    res = solver.run()
    r = res.replications[0]
    assert r.iterations >= 60 or r.optimal
    # 3-scenario LandS optimum ~381.853; a 60-iteration LB estimate should
    # already be in the neighborhood from below-ish.
    assert 300.0 < r.incumb_est < 420.0


def test_scenarios_undefined_parent_rejected(tmp_path):
    text = """STOCH         LANDS
SCENARIOS
 SC A         B         1.0    STAGE2
    RHS       DEM1      3.0
ENDATA
"""
    with pytest.raises(ValueError, match="undefined"):
        _parse_lands_with_stoc(str(tmp_path), text)


def test_scenarios_bad_probability_sum_rejected(tmp_path):
    text = """STOCH         LANDS
SCENARIOS
 SC A         ROOT      0.5    STAGE2
    RHS       DEM1      3.0
 SC B         ROOT      0.3    STAGE2
    RHS       DEM1      5.0
ENDATA
"""
    with pytest.raises(ValueError, match="sum to"):
        _parse_lands_with_stoc(str(tmp_path), text)
