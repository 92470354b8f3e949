"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the reference's CPU-only CI strategy (SURVEY.md §4): all tests run on
CPU jax with 8 virtual devices so sharding/distributed logic is exercised
without TPU hardware. Must run before jax is imported anywhere.
"""

import os

# LAMP_TPU_TESTS=1 selects the real-hardware tier (the reference's CudaTest
# analogue, nn.test.scala:18-19 / build.sbt:86-87): the axon TPU platform is
# kept, x64 stays off (TPUs have no f64), and only ``-m tpu`` tests should
# run. Everything else (the default) runs on the virtual 8-CPU mesh.
TPU_MODE = bool(int(os.environ.get("LAMP_TPU_TESTS", "0") or "0"))

if not TPU_MODE:
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # disable the axon platform
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not TPU_MODE:
    # the axon sitecustomize (TPU tunnel) may have force-registered its
    # platform before this file ran; override so tests run on the virtual
    # 8-CPU mesh.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8, jax.devices()

import pytest  # noqa: E402

_GATE_FILE = os.path.join(os.path.dirname(__file__), "gate_list.txt")


def pytest_collection_modifyitems(config, items):
    """Gate-marker application + tpu-tier gating.

    ``tpu``-marked tests are skipped unless LAMP_TPU_TESTS=1 (they need the
    real chip); in TPU mode everything UNMARKED is skipped (the CPU suite's
    f64 gradchecks and 8-device meshes don't exist on the single chip).

    ``tests/gate_list.txt`` holds one node-id prefix per line (comments with
    #). The gate is the <=10-minute subset run before every commit
    (``pytest -m gate``); the full non-slow suite runs once per round. Every
    listed prefix must match at least one collected test so the gate cannot
    silently shrink when tests are renamed."""
    skip_tpu = pytest.mark.skip(
        reason="real-hardware tier: run with LAMP_TPU_TESTS=1 -m tpu")
    skip_cpu = pytest.mark.skip(
        reason="CPU-suite test; unset LAMP_TPU_TESTS to run")
    for item in items:
        has_tpu = item.get_closest_marker("tpu") is not None
        if has_tpu and not TPU_MODE:
            item.add_marker(skip_tpu)
        elif TPU_MODE and not has_tpu:
            item.add_marker(skip_cpu)
    try:
        with open(_GATE_FILE) as fh:
            prefixes = [
                ln.strip() for ln in fh
                if ln.strip() and not ln.lstrip().startswith("#")
            ]
    except OSError:
        return
    matched = set()
    for item in items:
        nodeid = item.nodeid
        for p in prefixes:
            if nodeid.startswith(p):
                item.add_marker(pytest.mark.gate)
                matched.add(p)
    if config.getoption("-m") and "gate" in config.getoption("-m"):
        stale = [p for p in prefixes if p not in matched]
        if stale:
            raise pytest.UsageError(
                f"gate_list.txt entries match no collected test: {stale}"
            )
