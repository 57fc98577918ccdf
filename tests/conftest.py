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
    config.addinivalue_line("markers", "fast: iteration tier (<10 min total)")


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (round-4 verdict weak #7: heavy compile modules cost
    tens of CPU-minutes). Every test not explicitly marked `slow` is `fast`,
    so `pytest -m fast` is the iteration tier and `pytest -m slow` the heavy
    tier; the two partition the suite exactly."""
    import pytest as _pytest
    for item in items:
        if item.get_closest_marker("slow") is None:
            item.add_marker(_pytest.mark.fast)


import pytest  # noqa: E402

_HEAVY_MODULES = ("test_trainer_e2e", "test_parallel", "test_maskcache",
                  "test_vjp_tensorf")


@pytest.fixture(autouse=True)
def _bound_compile_cache(request):
    """Clear jax's compiled-executable caches after compile-heavy tests.

    The XLA CPU backend segfaults inside `backend_compile_and_load` once a
    single process accumulates a few hundred compiled programs (reproduced
    twice at ~test 133 of the full suite; the same tests pass in isolation).
    Dropping the caches between trainer-scale tests keeps the live executable
    count bounded. Costs recompiles only in modules that recompile anyway.
    """
    yield
    if any(m in request.module.__name__ for m in _HEAVY_MODULES):
        jax.clear_caches()
