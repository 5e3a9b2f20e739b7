"""TPU-native two-stage Stochastic Decomposition (2-SD) framework.

A from-scratch JAX/XLA/Pallas implementation of Higle & Sen's sequential-sampling
stochastic decomposition algorithm for two-stage stochastic linear programs, with
the capabilities of the reference C implementation (SMU-SODA/stochasticDecomposition,
see /root/reference) re-designed TPU-first:

  * SMPS (core/time/stoc) ingestion producing static-shape device tensors
    (reference: spAlgorithms ``readCore/readTime/readStoc``, driven from
    ``twoSD.c:256-279``).
  * Batched bounded-variable simplex subproblem solver with dual/basis outputs
    (replaces the CPLEX calls at ``subprob.c:43-45``).
  * Incremental omega/lambda/sigma/delta pools with masked dedup
    (``stocUpdate.c``), and the argmax cut-height procedure (``stocUpdate.c:142-190``)
    as a dense masked max-reduce over the dual-vertex pool.
  * Regularized proximal QP master (``master.c``) solved with a primal-dual
    interior point method on device.
  * Dual-stability, pre-test and bootstrap optimality tests (``optimal.c``).
  * Batched out-of-sample evaluation (``evaluate.c``), multi-replication runs
    and the compromise problem (``compromise.c``).
"""

__version__ = "0.1.0"

from stochasticdecomposition_tpu.config import SDConfig, load_config  # noqa: F401
