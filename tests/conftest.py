"""Test configuration: force the CPU backend with a virtual 8-device mesh.

The axon sitecustomize pins JAX_PLATFORMS to the TPU tunnel; tests run on CPU
(f64 linear algebra, multi-device sharding via host platform device count).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
