"""Test harness: CPU backend with 8 fake devices (SURVEY.md sections 4, 5.8).

Must run before the first `import jax` anywhere in the test process: forces
the CPU platform (tests are deterministic and runnable off-TPU) and carves it
into 8 XLA devices so the GSPMD mesh/sharding code paths run for real -
the idiomatic TPU equivalent of a fake distributed backend.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# jax may already be imported (pytest plugins) - the JAX_PLATFORMS env var is
# latched at import, so set the config directly; platform selection is lazy,
# and XLA_FLAGS (fake device count) is read at backend creation, so both
# still apply as long as no backend is live yet.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    f"tests must run on the fake-device CPU backend, got {jax.default_backend()}; "
    "a plugin initialized a backend before tests/conftest.py ran"
)


def _enable_test_compile_cache():
    """Persistent XLA compile cache for the suite: most test wall time is
    re-compiling the same tiny programs every run (measured 3.3x on
    tests/unit/test_loss.py warm vs cold). XLA:CPU cache entries embed the
    compiling host's CPU features (molvax.utils.enable_persistent_cache
    doc), so the directory is keyed by a hash of the host CPU signature +
    jax version — a different machine gets a fresh cache instead of
    poisoned replays."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            sig = "".join(
                ln for ln in f if ln.startswith(("flags", "model name"))
            )[:4096]
    except OSError:
        import platform

        sig = platform.processor() or platform.machine()
    key = hashlib.md5((sig + jax.__version__).encode()).hexdigest()[:12]
    cache_dir = f"/tmp/molvax_test_cache_{key}"
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # subprocess-based tests (preemption, CLI) opt in via this env var
    os.environ["MOLVAX_TEST_COMPILE_CACHE"] = cache_dir


_enable_test_compile_cache()

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Tier the suite: everything not explicitly @pytest.mark.slow gets
    `quick`, so `pytest -m quick` is the fast iteration lane (~4.6 min on the
    dev box, 210 tests as of round 3; slow lane ~24 min) and the full
    (unfiltered) run is unchanged (VERDICT r1 weak 8)."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 fake CPU devices, got {len(devs)}"
    return devs
