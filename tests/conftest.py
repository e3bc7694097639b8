"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4: multi-chip behavior is validated via XLA host-platform device
emulation (the "multi-node without a cluster" strategy); real-TPU numbers come from
bench.py, not the unit suite.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
