"""Test configuration: force an 8-device virtual CPU backend.

This is the "fake backend" the reference never had (SURVEY.md §4): sharding /
collective logic is exercised on `--xla_force_host_platform_device_count=8` CPU
devices so data-parallel tests run without a TPU pod. The axon TPU plugin registers
itself in every process via sitecustomize, so the platform must also be forced back
to cpu at runtime.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# keep test numerics deterministic and fp32-exact
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: the WGAN-GP grad-of-grad steps dominate suite time;
# repeat runs hit the cache (first run still compiles)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


def _ensure_native_decoder() -> None:
    """Build csrc/libnifti_tpu.so if absent so the native-decoder parity and
    property tests run instead of skipping on a fresh checkout. Best-effort:
    no toolchain (or a failed build) degrades back to the skip path."""
    import shutil
    import subprocess
    from pathlib import Path

    csrc = Path(__file__).resolve().parents[1] / "csrc"
    if (csrc / "libnifti_tpu.so").exists() or not (csrc / "Makefile").exists():
        return
    if shutil.which("make") is None:
        return
    try:
        subprocess.run(["make", "-C", str(csrc)], check=False,
                       capture_output=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        pass


_ensure_native_decoder()


@pytest.fixture(scope="session")
def rng():
    return jax.random.key(0)
