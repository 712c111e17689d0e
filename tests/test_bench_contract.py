"""Contract test for bench.py — the driver-visible artifact.

Runs the benchmark at tiny shapes in a subprocess (CPU) and asserts the ONE
JSON line the driver parses: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

BENCH = Path(__file__).resolve().parents[1] / "bench.py"


def _run(args=(), extra_env=None):
    env = dict(os.environ)
    env.update(BENCH_BATCH="2", BENCH_IMAGE="16", BENCH_STEPS="2",
               BENCH_DTYPE="float32", BENCH_DATASET="8")
    env.update(extra_env or {})
    # force the CPU backend BEFORE bench touches jax (the environment's
    # sitecustomize registers a TPU plugin and ignores JAX_PLATFORMS)
    wrapper = (
        "import jax, runpy, sys; "
        "jax.config.update('jax_platforms', 'cpu'); "
        f"sys.argv = ['bench.py'] + {list(args)!r}; "
        f"runpy.run_path({str(BENCH)!r}, run_name='__main__')"
    )
    out = subprocess.run(
        [sys.executable, "-u", "-c", wrapper],
        capture_output=True, text=True, timeout=420, env=env)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, out.stdout[-2000:]
    return json.loads(lines[-1])


def test_headline_json_contract():
    rec = _run()
    assert set(rec) >= {"metric", "value", "unit", "vs_baseline"}
    assert rec["unit"] == "images/sec/chip"
    assert rec["value"] > 0
    assert abs(rec["vs_baseline"] - round(rec["value"] / 5000.0, 3)) < 1e-9


def test_paper_mode_runs():
    rec = _run(["--paper"])
    assert "Larsen-paper" in rec["metric"] and rec["value"] > 0


def test_loader_mode_runs():
    rec = _run(["--loader"])
    assert rec["unit"] == "images/sec" and rec["value"] > 0


def test_lazy_gp_mode_labels_metric():
    """BENCH_GP_EVERY > 1 reports the amortized lazy-GP rate with the schedule
    named in the metric string (the driver-recorded line must be self-
    describing about the non-faithful schedule)."""
    rec = _run(extra_env={"BENCH_GP_EVERY": "2", "BENCH_STEPS": "4"})
    assert "lazy GP 1/2" in rec["metric"]
    assert rec["unit"] == "images/sec/chip" and rec["value"] > 0


def test_loop_mode_runs():
    """--loop drives the real train() end-to-end (hbm_cache feed + logging)
    and reports the loop's wall-clock rate in the same JSON contract."""
    rec = _run(["--loop"], extra_env={"BENCH_GP_EVERY": "2", "BENCH_STEPS": "4"})
    assert "end-to-end training loop" in rec["metric"]
    assert "hbm_cache" in rec["metric"] and "lazy GP 1/2" in rec["metric"]
    assert rec["unit"] == "images/sec/chip" and rec["value"] > 0
    assert abs(rec["vs_baseline"] - round(rec["value"] / 5000.0, 3)) < 1e-9
