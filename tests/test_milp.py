"""MILP/MIQP master modes (MASTER_TYPE 1/7).

Reference: config.sd:10-11 ("0 for LP, 1 for MILP, 5 for QP and 7 for
MIQP"); master.c:41 passes config.MASTER_TYPE to CPLEX's solveProblem and
master.c:331 records it on the master ("LP, QP, MIP or MIQP").  Here the
MIP machinery is the in-framework branch-and-bound (core/bnb.py) over the
LP/QP master relaxations, with integrality read from the SMPS core file's
MARKER INTORG/INTEND sections.

The ``intcaplike`` instance has two integer capacities on a 6x6 grid and
complete continuous recourse, so its EF-MIP optimum is brute-forceable
exactly — the parity oracle below enumerates every integer first stage and
prices the recourse greedily (y1 cost 2 < y2 cost 5 < slack 20).
"""

import numpy as np
import pytest

from stochasticdecomposition_tpu.config import (
    MASTER_MILP, MASTER_MIQP, SDConfig,
)
from stochasticdecomposition_tpu.models.instances import load_instance
from stochasticdecomposition_tpu.prob import decompose
from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc

DEMANDS = np.array([1.0, 2.0, 3.0])
PROBS = np.array([0.3, 0.4, 0.3])


def _ef_mip_optimum():
    """Enumerate the 6x6 integer grid; greedy recourse is exact here."""
    best, best_x = np.inf, None
    for x1 in range(6):
        for x2 in range(6):
            if x1 + x2 < 1:
                continue
            exp = 0.0
            for d, p in zip(DEMANDS, PROBS):
                y1 = min(x1, d)
                y2 = min(x2, d - y1)
                s = d - y1 - y2
                exp += p * (2.0 * y1 + 5.0 * y2 + 20.0 * s)
            tot = 3.0 * x1 + 2.0 * x2 + exp
            if tot < best - 1e-12:
                best, best_x = tot, (x1, x2)
    return best, best_x


def _setup(master_type, **cfg_kw):
    core, tim, stoc = load_instance("intcaplike")
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    cfg = SDConfig(MASTER_TYPE=master_type, EVAL_FLAG=False, **cfg_kw)
    return SDSolver(sp, cfg)


def test_marker_sections_reach_the_staged_problem():
    core, tim, stoc = load_instance("intcaplike")
    assert list(np.where(core.is_integer)[0]) == [0, 1]
    sp = decompose(core, tim, stoc)
    assert sp.first.is_int.tolist() == [True, True]


def _true_cost(x1, x2, demands=DEMANDS, probs=PROBS):
    exp = sum(p * (2.0 * min(x1, d) + 5.0 * min(x2, d - min(x1, d)) +
                   20.0 * (d - min(x1, d) - min(x2, d - min(x1, d))))
              for d, p in zip(demands, probs))
    return 3.0 * x1 + 2.0 * x2 + exp


def test_miqp_master_finds_exact_optimum_deterministic():
    """Single-scenario demand: SD's cuts become exact supports of h(x) once
    the dual vertices are pooled, so the B&B master must land EXACTLY on
    the brute-force integer optimum — a pure branch-and-bound correctness
    check with no sampling noise."""
    core, tim, stoc = load_instance("intcaplike")
    # Collapse the demand RV to a point mass at 2.4 (fractional, so the
    # LP-relaxed master is fractional and the B&B actually has to branch).
    el = stoc.elements[0]
    el.values = np.array([2.4])
    el.probs = np.array([1.0])
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    solver = SDSolver(sp, SDConfig(MASTER_TYPE=MASTER_MIQP, MAX_ITER=60,
                                   MIN_ITER=10, EVAL_FLAG=False))
    assert solver.mip_master is not None
    r = solver.solve_replication(0)
    xi = r.incumb_x[:2]
    assert np.allclose(xi, np.round(xi), atol=1e-6), \
        f"MIQP incumbent not integral: {xi}"
    best = min((_true_cost(a, b, [2.4], [1.0]), (a, b))
               for a in range(6) for b in range(6) if a + b >= 1)
    got = _true_cost(int(round(xi[0])), int(round(xi[1])), [2.4], [1.0])
    assert abs(got - best[0]) < 1e-9, \
        f"B&B returned {xi} (cost {got}); optimum {best[1]} (cost {best[0]})"


@pytest.mark.slow
def test_miqp_master_near_optimal_stochastic():
    ef_obj, ef_x = _ef_mip_optimum()
    solver = _setup(MASTER_MIQP, MAX_ITER=120, MIN_ITER=40)
    r = solver.solve_replication(0)
    xi = r.incumb_x[:2]
    assert np.allclose(xi, np.round(xi), atol=1e-6), \
        f"MIQP incumbent not integral: {xi}"
    # The true cost at the reported integer point must be within sampling
    # tolerance of the brute-force EF-MIP optimum (the runner-up grid point
    # is only 0.78% worse — indistinguishable at ~120 samples).
    tot = _true_cost(int(round(xi[0])), int(round(xi[1])))
    gap = (tot - ef_obj) / abs(ef_obj)
    assert gap < 0.01, f"MIQP solution {xi} costs {tot}, " \
                       f"EF-MIP optimum {ef_x} costs {ef_obj}"


def test_milp_master_candidate_is_integral():
    ef_obj, _ = _ef_mip_optimum()
    solver = _setup(MASTER_MILP, MAX_ITER=80)
    r = solver.solve_replication(0)
    # MILP inherits the LP-mode MAX_ITER stop (no MIP duals for the
    # bootstrap test; optimal.c:104-108 analog).
    assert r.iterations == 80 and not r.optimal
    xi = r.incumb_x[:2]
    assert np.allclose(xi, np.round(xi), atol=1e-6)
    tot = _true_cost(int(round(xi[0])), int(round(xi[1])))
    assert (tot - ef_obj) / abs(ef_obj) < 0.02


def test_mip_master_requires_check_every_one():
    with pytest.raises(ValueError, match="CHECK_EVERY=1"):
        SDConfig(MASTER_TYPE=MASTER_MIQP, CHECK_EVERY=4)


def test_unknown_master_type_still_rejected():
    with pytest.raises(ValueError, match="unknown MASTER_TYPE"):
        SDConfig(MASTER_TYPE=3)


def test_second_stage_integers_rejected():
    core, tim, stoc = load_instance("intcaplike")
    core.is_integer[3] = True   # mark a Y column integer
    with pytest.raises(ValueError, match="continuous recourse"):
        decompose(core, tim, stoc)


@pytest.mark.slow
def test_integer_compromise_is_integral():
    """Multi-replication MIQP run: the compromise decision must honor the
    integrality flags (compromise.c:260 applies MASTER_TYPE to the batch
    problem)."""
    solver = _setup(MASTER_MIQP, MAX_ITER=80, MIN_ITER=30, MULTIPLE_REP=2,
                    COMPROMISE_PROB=True)
    res = solver.run()
    cx = res.compromise_x[:2]
    assert cx is not None
    assert np.allclose(cx, np.round(cx), atol=1e-6), \
        f"integer compromise not integral: {cx}"
    tot = _true_cost(int(round(cx[0])), int(round(cx[1])))
    ef_obj, _ = _ef_mip_optimum()
    assert (tot - ef_obj) / abs(ef_obj) < 0.01


def test_continuous_problem_under_miqp_runs_as_qp():
    """MASTER_TYPE=7 on a problem with no integer columns degrades to the
    plain QP master (the B&B is keyed off pa.int1)."""
    core, tim, stoc = load_instance("lands")
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    solver = SDSolver(sp, SDConfig(MASTER_TYPE=MASTER_MIQP, MAX_ITER=30,
                                   EVAL_FLAG=False))
    assert solver.mip_master is None
    r = solver.solve_replication(0)
    assert r.iterations == 30
