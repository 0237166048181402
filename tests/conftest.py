"""Test configuration: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4).

This environment's sitecustomize imports jax and registers a remote-TPU PJRT
plugin at *interpreter boot* (before pytest even starts) whenever
PALLAS_AXON_POOL_IPS is set — by the time any test code runs, the platform
choice and XLA_FLAGS are locked.  The only reliable fix is to re-exec the
test process once with a corrected environment; the exec happens from a
pytest hook so global output capture can be stopped first (otherwise the
re-exec'd process inherits pytest's captured fd 1 and all output vanishes).
"""
import os
import sys

_WANT_FLAG = "--xla_force_host_platform_device_count=8"


def _env_ok() -> bool:
    if os.environ.get("JAX_PLATFORMS") != "cpu":
        return False
    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        return False
    return "xla_force_host_platform_device_count" in os.environ.get(
        "XLA_FLAGS", "")


def pytest_cmdline_main(config):
    if _env_ok() or os.environ.get("_PT_TEST_REEXEC") == "1":
        return None
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        try:
            capman.stop_global_capturing()
        except Exception:
            pass
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + _WANT_FLAG).strip()
    env["_PT_TEST_REEXEC"] = "1"
    args = list(config.invocation_params.args)
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + args, env)


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def pytest_configure(config):
    """Build the native host runtime so its tests run instead of skipping
    (best-effort: missing toolchain just leaves the PIL fallback paths)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lib = os.path.join(root, "native", "libptruntime.so")
    if not os.path.exists(lib):
        import subprocess
        try:
            subprocess.run(["make", "-C", os.path.join(root, "native")],
                           capture_output=True, timeout=120, check=False)
        except Exception:
            pass
