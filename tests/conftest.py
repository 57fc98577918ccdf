import os

# Force a virtual 8-device CPU mesh for all tests: multi-chip sharding tests
# run without TPUs, and CPU keeps the suite runnable anywhere. The session's
# axon site hook pins JAX_PLATFORMS=axon (a tunneled TPU), so we must override
# through jax.config after import — env vars alone don't win.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running (minutes) test")
