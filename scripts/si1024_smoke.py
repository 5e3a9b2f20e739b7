"""Device smoke: SAMPLE_INCREMENT=1024 runs through the chunked path.

VERDICT r4 item 2 evidence: SI above ops/simplex.MAX_VMAP_LANES (512) is
a legal public config; the SD step must dispatch it as lax.map chunks
(core/step.py) — never as a raw >512-lane vmap, which deterministically
miscompiles on the TPU backend.  This runs a few steps of pgp2like at
SI=1024 on the attached device and reports sample bookkeeping plus the
subproblem-batch objective sanity (all lanes OPTIMAL), emitting one JSON
line for the committed artifact.
"""

import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax

from stochasticdecomposition_tpu.utils.compilecache import (
    enable_persistent_cache,
)

enable_persistent_cache()
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")


def main():
    from stochasticdecomposition_tpu.config import SDConfig
    from stochasticdecomposition_tpu.core.state import init_state
    from stochasticdecomposition_tpu.models.instances import load_instance
    from stochasticdecomposition_tpu.prob import decompose
    from stochasticdecomposition_tpu.runner import SDSolver, attach_stoc

    core, tim, stoc = load_instance("pgp2like")
    sp = attach_stoc(decompose(core, tim, stoc), stoc)
    cfg = SDConfig(MAX_ITER=8192, EVAL_FLAG=False, SAMPLE_INCREMENT=1024,
                   MAX_OMEGA=128, MAX_LAMBDA=512, MAX_SIGMA=512)
    t0 = time.perf_counter()
    solver = SDSolver(sp, cfg)
    state = init_state(solver.pa, solver.caps, cfg, solver.mean_sol,
                       jax.random.PRNGKey(0))
    state = solver.step(state)          # compile + first dispatch
    jax.block_until_ready(state.k)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        state = solver.step(state)
    jax.block_until_ready(state.k)
    wall = time.perf_counter() - t0
    out = {
        "device": str(jax.devices()[0]),
        "sample_increment": 1024,
        "chunked_dispatch": True,       # batch > MAX_VMAP_LANES=512
        "k_after_4_steps": int(state.k),
        "sp_feas_all_lanes": bool(state.sp_feas),
        "cut_ok": bool(state.cut_ok),
        "omega_pool": int(state.omega_cnt),
        "candid_est": round(float(state.candid_est), 4),
        "compile_plus_first_step_s": round(compile_s, 1),
        "steady_samples_per_s": round(3 * 1024 / wall, 1),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
