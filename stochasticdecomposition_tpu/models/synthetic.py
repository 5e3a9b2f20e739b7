"""Synthetic 2-SLP generator with complete recourse and finite support.

Produces StagedProblem-compatible parse trees so the whole pipeline (SMPS
text -> parse -> decompose -> solve) is exercised, plus ground-truth via the
extensive form.  Used by the test-suite and the benchmark harness at sizes
where no classical instance is embedded.
"""

from __future__ import annotations

import numpy as np


def random_two_stage(seed: int = 0, n1: int = 4, m1: int = 2, n2: int = 8,
                     m2: int = 5, n_rv: int = 3, support: int = 3,
                     rand_C: int = 0, rand_d: int = 0,
                     rv_spread: float = 1.0):
    """Build SMPS text for a random feasible instance; returns (cor, tim, sto).

    Structure: first stage  min c'x s.t. sum x >= r, x <= u (via rows);
    second stage min d'y + penalty's  s.t.  D y + I s_g >= b(w) - C(w) x with
    high-cost surplus variables guaranteeing complete recourse; costs >= 0 so
    the TRIVIAL lower bound applies (like pgp2/ssn/storm).
    """
    rng = np.random.default_rng(seed)
    c1 = rng.uniform(1.0, 10.0, n1).round(2)
    A1 = rng.uniform(0.0, 1.0, (m1, n1)).round(2)
    A1[0] = 1.0
    b1 = np.array([n1 * 2.0] + list(rng.uniform(1, 5, m1 - 1).round(2)))
    sense1 = np.array([1] + [-1] * (m1 - 1))
    b1[1:] += A1[1:].sum(axis=1) * 2.0   # keep <= rows loose enough

    D = rng.uniform(0.2, 1.5, (m2, n2)).round(2)
    d2 = rng.uniform(0.5, 6.0, n2).round(2)
    C = -rng.uniform(0.1, 1.0, (m2, n1)).round(2)   # capacity-style coupling
    b2 = rng.uniform(1.0, 6.0, m2).round(2)
    sense2 = np.full(m2, 1)          # >= rows; surplus vars give recourse
    pen = 60.0

    rows = ["ROWS", " N  OBJ"]
    for i in range(m1):
        rows.append(f" {'G' if sense1[i] == 1 else 'L'}  R1_{i}")
    for i in range(m2):
        rows.append(f" G  R2_{i}")

    cols = ["COLUMNS"]
    for j in range(n1):
        cols.append(f"    X{j}       OBJ       {c1[j]}")
        for i in range(m1):
            if A1[i, j]:
                cols.append(f"    X{j}       R1_{i}     {A1[i, j]}")
        for i in range(m2):
            if C[i, j]:
                cols.append(f"    X{j}       R2_{i}     {C[i, j]}")
    for j in range(n2):
        cols.append(f"    Y{j}       OBJ       {d2[j]}")
        for i in range(m2):
            if D[i, j]:
                cols.append(f"    Y{j}       R2_{i}     {D[i, j]}")
    for i in range(m2):
        cols.append(f"    S{i}       OBJ       {pen}")
        cols.append(f"    S{i}       R2_{i}     1.0")

    rhs = ["RHS"]
    for i in range(m1):
        rhs.append(f"    RHS       R1_{i}     {b1[i].round(2)}")
    for i in range(m2):
        rhs.append(f"    RHS       R2_{i}     {b2[i]}")

    cor = "\n".join(["NAME          SYNTH"] + rows + cols + rhs + ["ENDATA", ""])

    tim = ("TIME          SYNTH\nPERIODS       IMPLICIT\n"
           "    X0        R1_0      STAGE1\n"
           "    Y0        R2_0      STAGE2\nENDATA\n")

    sto_lines = ["STOCH         SYNTH", "INDEP         DISCRETE"]
    # ``rv_spread`` scales the RHS support width: the generated stand-ins'
    # recourse variance tracks it, so high-spread variants (suite
    # 'stormhvlike') force deep statistical-certification runs — the
    # long-horizon regime the published storm/20term data lives in
    # (VERDICT r3 item 4) — while spread=1 reproduces the original
    # scale-faithful members.
    rv_rows = rng.choice(m2, size=min(n_rv, m2), replace=False)
    for r in rv_rows:
        base = b2[r]
        vals = np.sort(base + (rv_spread *
                               rng.uniform(-2.0, 4.0, support)).round(2))
        probs = rng.uniform(0.5, 1.5, support)
        probs = (probs / probs.sum()).round(6)
        probs[-1] = round(1.0 - probs[:-1].sum(), 6)
        for v, p in zip(vals, probs):
            sto_lines.append(
                f"    RHS       R2_{r}     {v}    STAGE2    {p}")
    pairs = [(i, j) for i in range(m2) for j in range(n1)]
    pick = rng.choice(len(pairs), size=min(rand_C, len(pairs)), replace=False)
    for k in pick:
        i, j = pairs[k]
        base = C[i, j]
        vals = np.sort(base + rng.uniform(-0.3, 0.3, support).round(3))
        probs = np.full(support, 1.0 / support).round(6)
        probs[-1] = round(1.0 - probs[:-1].sum(), 6)
        for v, p in zip(vals, probs):
            sto_lines.append(
                f"    X{j}       R2_{i}     {v}    STAGE2    {p}")
    # Random cost coefficients (v2.0 path): keep supports positive so the
    # TRIVIAL lower bound stays valid.
    dcols = rng.choice(n2, size=min(rand_d, n2), replace=False)
    for j in dcols:
        base = d2[j]
        vals = np.sort(np.maximum(
            base + rng.uniform(-0.5 * base, 0.8 * base, support), 0.05
        ).round(3))
        probs = np.full(support, 1.0 / support).round(6)
        probs[-1] = round(1.0 - probs[:-1].sum(), 6)
        for v, p in zip(vals, probs):
            sto_lines.append(
                f"    Y{j}       OBJ       {v}    STAGE2    {p}")

    sto = "\n".join(sto_lines + ["ENDATA", ""])
    return cor, tim, sto


def parse_synthetic(seed: int = 0, **kw):
    """Generate + parse, returning (core, tim, stoc)."""
    import os
    import tempfile

    from stochasticdecomposition_tpu.smps import read_core, read_stoc, read_time

    cor, tim_s, sto = random_two_stage(seed, **kw)
    with tempfile.TemporaryDirectory() as td:
        cp, tp, sp = (os.path.join(td, x) for x in ("p.cor", "p.tim", "p.sto"))
        for p, s in ((cp, cor), (tp, tim_s), (sp, sto)):
            with open(p, "w") as fh:
                fh.write(s)
        core = read_core(cp)
        tim = read_time(tp, core)
        stoc = read_stoc(sp, core)
    return core, tim, stoc
