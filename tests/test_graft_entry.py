"""Contract tests for __graft_entry__.py — the driver's two entry points.

Run in subprocesses so the entry's own backend self-provisioning (virtual CPU
mesh) is exercised exactly as the driver invokes it.
"""

import subprocess
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])


def _run(code: str, timeout: int = 420) -> str:
    out = subprocess.run(
        [sys.executable, "-u", "-c", code],
        capture_output=True, text=True, timeout=timeout)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    return out.stdout


def test_dryrun_multichip_8():
    out = _run(
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        f"import sys; sys.path.insert(0, {REPO!r}); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    assert "dryrun_multichip(8) ok" in out
    assert "dp + critic-head tp + spatial sharding" in out


def test_entry_compiles():
    out = _run(
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        f"import sys; sys.path.insert(0, {REPO!r}); "
        "import __graft_entry__ as g; fn, args = g.entry(); "
        "r = jax.jit(fn)(*args); print('entry-shape', r.shape)"
    )
    assert "entry-shape (4, 96, 96, 1)" in out
