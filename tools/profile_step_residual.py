"""Name the train step's above-memory-floor residual (VERDICT r3 item 3b).

Every roofline-attributed step sits 1-13% above its measured HBM-bandwidth
floor (BENCH_NOTES): the headline WGAN-GP step at 90.2% of achieved bandwidth,
the lazy-GP off-step at 87.4%. That residual has so far been *called* "the
compute-bound fraction of the schedule" without naming the ops. This tool
traces N executions of the configured step on the attached device with
jax.profiler, parses the xplane with jax.profiler.ProfileData, and aggregates
per-op device time — so "compute-bound fraction" becomes a ranked list of HLO
ops with their share of the step.

    python tools/profile_step_residual.py                 # headline WGAN-GP step
    python tools/profile_step_residual.py --gp-every 4    # lazy-GP off-step
    python tools/profile_step_residual.py --vae | --paper # the other steps

Output: one JSON document with the top-k ops by device time, each with its
total ms across the traced steps and its fraction of traced device time,
grouped two ways (exact op name, and op family — fusion/convolution/etc).
"""

import argparse
import json
import re
import tempfile
from collections import defaultdict
from pathlib import Path

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache_bench"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def build_step(args):
    from vaegan_tpu.config import preset
    from vaegan_tpu.train import (create_train_state, make_paper_train_step,
                                  make_train_step)

    name = ("vaegan_paper" if args.paper
            else "notebook_vae" if args.vae else "notebook")
    cfg = preset(name)
    cfg = cfg.replace(
        data=cfg.data.replace(image_size=args.image_size, batch_size=args.batch),
        train=cfg.train.replace(dtype=args.dtype))
    state = create_train_state(cfg, jax.random.key(0))
    if cfg.optim.scheme == "three":
        fn = make_paper_train_step(cfg)
    else:
        fn = make_train_step(cfg, do_g_update=not args.critic_only,
                             do_gp=args.gp_every <= 1)
    step = jax.jit(fn, donate_argnums=0)
    batch = jax.random.uniform(jax.random.key(1),
                               (args.batch, args.image_size, args.image_size, 1))
    key = jax.random.key(2, impl=cfg.train.rng_impl)
    if args.critic_only:
        # axon-backend quirk (see bench.py): a do_g_update=False program wedges
        # unless a full (T,T) step at the SAME shapes ran first in this process
        pstate, _ = jax.jit(make_train_step(cfg, do_g_update=True,
                                            do_gp=args.gp_every <= 1))(
            state, batch, key)
        float(jax.device_get(jax.tree.leaves(pstate)[0]).ravel()[0])
        del pstate
    label = {"notebook": "WGAN-GP", "vaegan_paper": "Larsen-paper",
             "notebook_vae": "plain-VAE"}[name]
    if args.critic_only:
        label += " critic-only"
    if args.gp_every > 1:
        label += " no-GP off-step"
    return step, state, batch, key, label


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--image-size", type=int, default=96)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--vae", action="store_true")
    ap.add_argument("--paper", action="store_true")
    ap.add_argument("--critic-only", action="store_true")
    ap.add_argument("--gp-every", type=int, default=1,
                    help=">1 profiles the lazy-GP off-step (no grad-of-grad)")
    args = ap.parse_args()

    step, state, batch, key, label = build_step(args)
    # compile + warm OUTSIDE the trace
    for i in range(3):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
    float(jax.device_get(metrics["d_loss"]))

    tmp = tempfile.mkdtemp(prefix="xprof_")
    with jax.profiler.trace(tmp):
        for i in range(args.steps):
            state, metrics = step(state, batch, jax.random.fold_in(key, 100 + i))
        float(jax.device_get(metrics["d_loss"]))

    # parse the xplane. The TPU device plane carries named lines:
    #   'XLA Modules'   — one event per executed program (jit_step(...))
    #   'XLA Ops'       — one event per HLO instruction (the compute timeline)
    #   'Async XLA Ops' — copy-start/done pairs overlapped with compute
    # Per-op time comes from 'XLA Ops'; the denominator is the jit_step module
    # time (summing every line would triple-count: module ⊃ ops, steps).
    files = sorted(Path(tmp).rglob("*.xplane.pb"))
    assert files, f"no xplane written under {tmp}"
    data = jax.profiler.ProfileData.from_file(str(files[-1]))
    per_instr = defaultdict(float)   # '%fusion.10' -> total ns
    instr_text = {}                  # '%fusion.10' -> HLO text (for shapes)
    per_fam = defaultdict(float)     # opcode -> total ns
    module_total = 0.0
    async_total = 0.0
    ops_total = 0.0
    for plane in data.planes:
        if "/device:TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name == "XLA Modules":
                module_total += sum(ev.duration_ns for ev in line.events
                                    if ev.name.startswith("jit_step"))
            elif line.name == "XLA Ops":
                for ev in line.events:
                    instr = ev.name.split(" = ")[0]
                    per_instr[instr] += ev.duration_ns
                    instr_text.setdefault(instr, ev.name)
                    per_fam[re.sub(r"\.\d+$", "", instr.lstrip("%"))] += ev.duration_ns
                    ops_total += ev.duration_ns
            elif line.name == "Async XLA Ops":
                async_total += sum(ev.duration_ns for ev in line.events)

    if module_total == 0.0:
        print(json.dumps({"error": "no jit_step module events parsed",
                          "planes": [p.name for p in data.planes]}))
        return

    def shapes(instr):
        # first tensor shape in the HLO text = the op's output (tuple: first leaf)
        m = re.search(r"(?:bf16|f32|f16|s32|u32|s8|u8|pred)\[[^\]]*\]",
                      instr_text.get(instr, ""))
        return m.group(0) if m else ""

    rows = sorted(per_instr.items(), key=lambda kv: -kv[1])[: args.top]
    top_ops = [{"op": n, "out": shapes(n), "ms_total": round(v / 1e6, 2),
                "pct_of_step_time": round(100.0 * v / module_total, 1)}
               for n, v in rows]
    fam_rows = sorted(per_fam.items(), key=lambda kv: -kv[1])[: args.top]
    top_families = [{"op": n, "ms_total": round(v / 1e6, 2),
                     "pct_of_step_time": round(100.0 * v / module_total, 1)}
                    for n, v in fam_rows]

    print(json.dumps({
        "step": label,
        "operating_point": f"{args.image_size}^2 batch {args.batch} {args.dtype}",
        "traced_steps": args.steps,
        "step_time_ms": round(module_total / 1e6 / args.steps, 1),
        "xla_ops_ms_per_step": round(ops_total / 1e6 / args.steps, 1),
        "async_copy_ms_per_step_overlapped": round(async_total / 1e6 / args.steps, 1),
        "top_ops": top_ops,
        "top_families": top_families,
    }, indent=1))


if __name__ == "__main__":
    main()
