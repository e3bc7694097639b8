"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4: multi-chip behavior is validated via XLA host-platform device
emulation (the "multi-node without a cluster" strategy); real-TPU numbers come from
bench.py, not the unit suite.

Note: the jaxtyping pytest plugin imports jax before this conftest runs, so the
JAX_PLATFORMS env var alone is latched too late — we must also update jax.config.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the session presets axon (real TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
