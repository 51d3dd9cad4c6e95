"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the standard JAX fake-cluster
technique, SURVEY.md section 4d) so multi-chip sharding logic is exercised
without TPU hardware; kernels are identical on TPU. x64 is ENABLED (not
forced onto arrays) so parity tests can compare against the float64 oracle
while f32-typed inputs still exercise the default precision path.
"""

import os

# Force CPU (the ambient axon sitecustomize registers the TPU backend and
# overrides the JAX_PLATFORMS env var — only the config flag wins): tests
# exercise numerics + sharding on a virtual CPU mesh; the bench harness is
# what runs on real TPU hardware.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# This JAX build ignores the JAX_ENABLE_X64 env var; set the flag directly.
jax.config.update("jax_enable_x64", True)
