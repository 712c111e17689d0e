"""Two-process multi-host execution test (SURVEY.md §2.4 communication backend).

Launches 2 localhost processes (4 virtual CPU devices each -> an 8-device global
mesh over DCN), bootstrapped via vaegan_tpu.parallel.dist.initialize. Each
process feeds its distinct shard of one global batch through
``device_prefetch``'s ``make_array_from_process_local_data`` branch and runs one
data-parallel train step — the gradient allreduce crosses the process boundary.

This is the test that makes parallel/dist.py + the multi-host feed path
(data/pipeline.py) executed code rather than an untested stub.
"""

import re
import socket
import subprocess
import sys
from pathlib import Path

WORKER = Path(__file__).parent / "_multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_step(tmp_path):
    # bounded by the workers' communicate(timeout=900) below
    port = _free_port()
    env_base = dict(
        # a fresh env WITHOUT the test-session's 8-device XLA_FLAGS: the worker
        # provisions its own 4 devices
        PATH=__import__("os").environ.get("PATH", ""),
        HOME=__import__("os").environ.get("HOME", "/root"),
        PYTHONPATH=__import__("os").environ.get("PYTHONPATH", ""),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", str(WORKER), str(port), str(pid),
             str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env_base)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"MULTIHOST_OK pid={pid}" in out, out[-2000:]

    # the two processes must have fed DIFFERENT data shards (the pre-fix bug
    # duplicated the full global batch on every host)
    sums = [float(re.search(r"local_sum=([-\d.]+)", o).group(1)) for o in outs]
    assert sums[0] != sums[1], "hosts fed identical shards — loader not process-sharded"
    # ...while computing IDENTICAL global losses (one logical computation)
    for metric in ("d_loss", "g_loss"):
        vals = [float(re.search(rf"{metric}=([-\d.]+)", o).group(1)) for o in outs]
        assert abs(vals[0] - vals[1]) < 1e-5, (metric, vals)

    # the one-call production entry point ran 2 loop steps in the same setting
    for pid, out in enumerate(outs):
        assert f"TRAINDP_OK pid={pid}" in out, out[-2000:]
    for metric in ("d_loss", "g_loss"):
        vals = [float(re.search(rf"TRAINDP_OK pid=\d+ .*?{metric}=([-\d.]+)", o,
                                re.DOTALL).group(1)) for o in outs]
        assert abs(vals[0] - vals[1]) < 1e-5, ("train_data_parallel", metric, vals)

    # critic-head TP composed with cross-host DP (4x2 mesh): sharded-leaf
    # placement via shard_state + one step, identical losses on both hosts
    for pid, out in enumerate(outs):
        assert f"TP_OK pid={pid}" in out, out[-2000:]
    for metric in ("d_loss", "g_loss"):
        vals = [float(re.search(rf"TP_OK pid=\d+ .*?{metric}=([-\d.]+)", o,
                                re.DOTALL).group(1)) for o in outs]
        assert abs(vals[0] - vals[1]) < 1e-5, ("dp_x_tp", metric, vals)

    # durability: collectively written orbax checkpoint restored + resumed
    # across processes with EMA tracked throughout — the resumed state must be
    # ONE logical state (identical params/EMA digests on both hosts)
    for pid, out in enumerate(outs):
        assert f"DURABLE_OK pid={pid} step=3" in out, out[-2000:]
    for metric in ("d_loss", "ema_digest", "par_digest"):
        vals = [float(re.search(rf"DURABLE_OK pid=\d+ .*?{metric}=([-\d.]+)", o,
                                re.DOTALL).group(1)) for o in outs]
        assert abs(vals[0] - vals[1]) < 1e-4, ("durable_resume", metric, vals)

    # the paper-faithful three-optimizer step (BASELINE config 3) across hosts
    for pid, out in enumerate(outs):
        assert f"PAPER_OK pid={pid}" in out, out[-2000:]
    for metric in ("d_loss", "g_loss"):
        vals = [float(re.search(rf"PAPER_OK pid=\d+ .*?{metric}=([-\d.]+)", o,
                                re.DOTALL).group(1)) for o in outs]
        assert abs(vals[0] - vals[1]) < 1e-5, ("paper_step_dp", metric, vals)
