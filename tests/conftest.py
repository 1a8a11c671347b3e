"""Test configuration: force JAX onto CPU with 8 virtual devices so sharding
tests run anywhere (mirrors the driver's dryrun_multichip environment).

This container's sitecustomize registers a remote-TPU PJRT backend and sets
JAX_PLATFORMS=axon, which would route every tiny test jit through a network
tunnel. Backend *selection* is still lazy, so overriding the platform here —
before anything touches a device — pins tests to the in-process CPU client.
Set FRUITNERF_TEST_TPU=1 to run the suite on the real TPU backend instead.
"""
import os

if os.environ.get("FRUITNERF_TEST_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: reference-scale tests (minutes, not seconds)"
    )
