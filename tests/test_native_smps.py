"""Native (C++) SMPS parser golden tests vs the pure-Python reference."""

import os
import tempfile

import numpy as np
import pytest

from stochasticdecomposition_tpu.models.instances import INSTANCES
from stochasticdecomposition_tpu.models.synthetic import random_two_stage
from stochasticdecomposition_tpu.smps.core import _read_core_py
from stochasticdecomposition_tpu.smps.native import (
    native_available, read_core_native,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


def _roundtrip(text):
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "x.cor")
        with open(p, "w") as fh:
            fh.write(text)
        return read_core_native(p), _read_core_py(p)


@pytest.mark.parametrize("name", sorted(INSTANCES))
def test_native_matches_python_instances(name):
    cn, cp = _roundtrip(INSTANCES[name][0])
    assert cn.row_names == cp.row_names
    assert cn.col_names == cp.col_names
    assert cn.obj_name == cp.obj_name
    np.testing.assert_allclose(cn.A, cp.A)
    np.testing.assert_allclose(cn.b, cp.b)
    np.testing.assert_allclose(cn.c, cp.c)
    np.testing.assert_allclose(cn.lb, cp.lb)
    np.testing.assert_allclose(cn.ub, cp.ub)
    np.testing.assert_array_equal(cn.sense, cp.sense)
    np.testing.assert_array_equal(cn.is_integer, cp.is_integer)


_INT_BOUNDS_CORE = """NAME          IBND
ROWS
 N  OBJ
 G  R1
COLUMNS
    X1        OBJ       1.0    R1        1.0
    X2        OBJ       1.0    R1        1.0
    X3        OBJ       1.0    R1        1.0
RHS
    RHS       R1        1.0
BOUNDS
 BV BND       X1
 LI BND       X2        2.0
 UI BND       X3        7.0
ENDATA
"""


def test_integer_bound_types_bv_li_ui():
    """BV / LI / UI mark integrality (and set bounds) in BOTH parsers."""
    cn, cp = _roundtrip(_INT_BOUNDS_CORE)
    for c in (cn, cp):
        assert c.is_integer.tolist() == [True, True, True]
        np.testing.assert_allclose(c.lb, [0.0, 2.0, 0.0])
        np.testing.assert_allclose(c.ub, [1.0, np.inf, 7.0])


def test_native_matches_python_synthetic():
    cor, _, _ = random_two_stage(seed=9, n1=20, m1=3, n2=80, m2=40, n_rv=5)
    cn, cp = _roundtrip(cor)
    np.testing.assert_allclose(cn.A, cp.A)
    np.testing.assert_allclose(cn.b, cp.b)
    np.testing.assert_allclose(cn.c, cp.c)


_RANGES_CORE_N = """NAME          RNGTEST
ROWS
 N  OBJ
 L  RL
 G  RG
 E  REP
 E  REN
COLUMNS
    X         OBJ       1.0    RL        1.0
    Y         OBJ       2.0    RG        1.0
    Z         OBJ       1.0    REP       1.0
    W         OBJ       1.0    REN       1.0
RHS
    RHS       RL        10.0   RG        2.0
    RHS       REP       1.0    REN       8.0
RANGES
    RNG       RL        4.0    RG        3.0
    RNG       REP       2.0    REN       -2.0
ENDATA
"""


def test_native_matches_python_ranges():
    """RANGES lowering (equality + bounded slack) is golden-equal in both
    parsers: names, matrix, senses, rhs, bounds and the slack map."""
    cn, cp = _roundtrip(_RANGES_CORE_N)
    assert cn.col_names == cp.col_names
    assert cn.row_names == cp.row_names
    np.testing.assert_allclose(cn.A, cp.A)
    np.testing.assert_allclose(cn.b, cp.b)
    np.testing.assert_allclose(cn.c, cp.c)
    np.testing.assert_allclose(cn.lb, cp.lb)
    np.testing.assert_allclose(cn.ub, cp.ub)
    np.testing.assert_array_equal(cn.sense, cp.sense)
    assert list(cn.range_slacks) == list(cp.range_slacks)
    assert cn.range_slacks == [(0, 4), (1, 5), (2, 6), (3, 7)]
