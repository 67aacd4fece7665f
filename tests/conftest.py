"""Test configuration.

Tests run on a virtual 8-device CPU platform (the 'fake cluster' the
reference lacks — SURVEY.md §4).

The environment's axon/TPU sitecustomize hook (installed at interpreter
startup when PALLAS_AXON_POOL_IPS is set) routes every XLA compilation
through a relay round-trip, even on the CPU backend — compile-heavy tests
run ~5-10x slower. Since the hook precedes conftest, `pytest_configure`
re-execs pytest once in a cleaned environment, after stopping pytest's
global capture so the child's output reaches the real stdout.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()


def pytest_configure(config):
    if (
        os.environ.get("PALLAS_AXON_POOL_IPS")
        and os.environ.get("D3ROMA_TEST_REEXEC") != "1"
    ):
        capman = config.pluginmanager.getplugin("capturemanager")
        try:
            if capman is not None:
                capman.stop_global_capturing()
        except Exception:
            pass
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
        env["D3ROMA_TEST_REEXEC"] = "1"
        os.execve(
            sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env
        )


import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# Parity tests compare against torch fp32; stop the backend from silently
# dropping matmuls to lower precision.
jax.config.update("jax_default_matmul_precision", "float32")
# Cache compiles across test runs. Only executables that took real
# compile time are worth persisting: with min_compile_time 0 every tiny
# eager-op executable is written too (hundreds per suite run), and that
# write storm on a cold cache — especially with two pytest processes
# sharing the directory — has produced rare hard aborts (SIGABRT inside
# an eager op's compile path; observed twice after an environment reset
# wiped the cache, never once the cache was warm). 0.5 s keeps the big
# UNet/pipeline/scan compiles cached and skips the noise.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
