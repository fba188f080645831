"""Test configuration: force an 8-device CPU mesh so sharding tests run
without TPU hardware.

The environment's axon sitecustomize pins ``jax_platforms="axon,cpu"`` via
jax.config at interpreter boot, so the env var alone is not enough — we
re-update the config before any backend initializes.  Set CTOK_TEST_TPU=1
to run the suite against the real chip instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

if os.environ.get("CTOK_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
