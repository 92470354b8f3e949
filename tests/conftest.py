"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the reference's CPU-only CI strategy (SURVEY.md §4): all tests run on
CPU jax with 8 virtual devices so sharding/distributed logic is exercised
without TPU hardware. Must run before jax is imported anywhere.
"""

import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # disable the axon TPU platform
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon sitecustomize (TPU tunnel) may have force-registered its platform
# before this file ran; override so tests run on the virtual 8-CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
