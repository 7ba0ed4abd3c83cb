"""Hermetic test env: 8 virtual CPU devices so DP/TP/SP tests run anywhere.

Note: the axon TPU sitecustomize (if present) force-selects its backend via
jax.config at interpreter start, so setting JAX_PLATFORMS in the environment
is not enough — we must override the config knob itself before any backend
is initialized, and disable the plugin's pool hookup for subprocess safety.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env is set)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", jax.default_backend()
