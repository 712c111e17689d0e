"""BASELINE config 2 (`gan_only`) at a DCGAN-class step budget (VERDICT r3 #6).

Round 3 established the short-budget behavior honestly: the BCE game is
D-dominant (D loss -> 0 within one epoch at every probed setting, including a
capacity-matched critic), while the generator keeps learning under the
non-saturating loss — the un-optimized reconstruction proxy fell 4.2 -> 1.1
over 600 steps. BENCH_NOTES ends with "an unanchored BCE game needs orders of
magnitude more than this 600-step budget"; this tool runs that budget
(10-20k steps, the scale DCGAN-class games train at) and records the evidence
either way:

- the reconstruction-proxy curve (eval-mode one-batch MSE, the reference's own
  metric, measured every --eval-every steps on a HELD fixed batch — not
  optimized by any loss term in this config, so it is a pure measure of G
  absorbing data statistics from adversarial pressure alone);
- periodic 5x5 sample grids (the qualitative DCGAN deliverable);
- a log-log least-squares fit of proxy vs steps, making "the trend line" a fit
  with a slope, not a guess.

    python tools/gan_only_budget.py --steps 20000 --batch 64 --out result/gan_only_budget
"""

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache_bench"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from vaegan_tpu.config import preset
from vaegan_tpu.data.pipeline import SyntheticDataset
from vaegan_tpu.train import create_train_state, make_train_step
from vaegan_tpu.train.state import build_models
from vaegan_tpu.utils.imaging import save_image_grid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--image-size", type=int, default=96)
    ap.add_argument("--dataset", type=int, default=1200)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--style", default="blobs",
                    choices=["blobs", "edges", "texture"])
    ap.add_argument("--lr-d", type=float, default=None,
                    help="optional TTUR critic lr (round 3 probed 3e-5)")
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--grid-every", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--keep-best", action="store_true",
                    help="operational recipe for the unanchored BCE game "
                         "(VERDICT r4 #8): snapshot (g_params, g_stats) "
                         "on-device whenever the held-batch proxy improves, "
                         "and deliver the BEST iterate alongside the live "
                         "endpoint — the curve minimum survives the game's "
                         "post-~13k divergence (result/gan_only_budget) "
                         "instead of being destroyed by it")
    ap.add_argument("--out", default="result/gan_only_budget")
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    cfg = preset("gan_only")
    cfg = cfg.replace(
        data=cfg.data.replace(image_size=args.image_size, batch_size=args.batch),
        optim=cfg.optim.replace(lr_d=args.lr_d),
        train=cfg.train.replace(dtype=args.dtype, seed=args.seed),
    )

    # whole dataset in HBM, batches gathered on-device (the large_batch_recipe
    # pattern: a probe costs step time only, never the tunnel's H2D)
    ds = SyntheticDataset(args.dataset, args.image_size, seed=0, style=args.style)
    data = jnp.asarray(ds.load_batch(range(args.dataset)))
    rng = np.random.default_rng(args.seed)

    state = create_train_state(cfg, jax.random.key(args.seed, impl=cfg.train.rng_impl))
    step = jax.jit(make_train_step(cfg, do_g_update=True), donate_argnums=0)

    @jax.jit
    def gather(idx):
        return jnp.take(data, idx, 0)

    gen, _ = build_models(cfg)

    @jax.jit
    def recon_mse(g_params, g_stats, batch):
        out_ = gen.apply({"params": g_params, "batch_stats": g_stats},
                         batch, train=False)
        r = out_[0] if cfg.generator.is_vae else out_
        return jnp.mean(jnp.square(r.astype(jnp.float32) - batch.astype(jnp.float32)))

    @jax.jit
    def sample_grid(g_params, g_stats, batch, key):
        out_, _ = gen.apply({"params": g_params, "batch_stats": g_stats},
                            batch, train=True, mutable=["batch_stats"],
                            rngs={"dropout": key, "noise": key})
        return (out_[0] if cfg.generator.is_vae else out_)[:25]

    held = gather(jnp.asarray(rng.permutation(args.dataset)[: args.batch]))
    from vaegan_tpu.inference import mean_predictor_floor
    floor = mean_predictor_floor(held)
    key = jax.random.key(args.seed + 1, impl=cfg.train.rng_impl)
    curve = []
    best = None  # (proxy, step, g_params, g_stats) — device-resident snapshot
    t0 = time.time()
    for s in range(args.steps):
        idx = jnp.asarray(rng.integers(0, args.dataset, size=args.batch))
        state, metrics = step(state, gather(idx), jax.random.fold_in(key, s))
        sno = s + 1
        if sno % args.eval_every == 0 or sno == 1:
            row = {"step": sno,
                   "recon_proxy": float(jax.device_get(
                       recon_mse(state.g_params, state.g_stats, held))),
                   "d_loss": float(jax.device_get(metrics["d_loss"])),
                   "g_loss": float(jax.device_get(metrics["g_loss"])),
                   "wall_s": round(time.time() - t0, 1)}
            curve.append(row)
            print(json.dumps(row), flush=True)
            if args.keep_best and (best is None or row["recon_proxy"] < best[0]):
                # device-side copy (donated buffers would otherwise alias):
                # ~2.3 MB for this G — negligible next to the step
                snap = jax.tree.map(lambda x: x + 0,
                                    (state.g_params, state.g_stats))
                best = (row["recon_proxy"], sno, *snap)
        if sno % args.grid_every == 0 or sno == 1:
            imgs = jax.device_get(sample_grid(state.g_params, state.g_stats,
                                              held, jax.random.fold_in(key, s)))
            save_image_grid(np.asarray(imgs, np.float32),
                            str(out / f"samples_{sno:06d}.png"), nrow=5)
    wall = time.time() - t0

    # the endpoint's eval-mode deliverables: a deterministic (no reparam
    # noise, running-stats BN) recon panel against the held originals — run
    # with --steps at the curve's minimum to render the best iterate
    @jax.jit
    def recon_eval(g_params, g_stats, batch):
        out_ = gen.apply({"params": g_params, "batch_stats": g_stats},
                         batch, train=False)
        return (out_[0] if cfg.generator.is_vae else out_)[:12]
    recons = jax.device_get(recon_eval(state.g_params, state.g_stats, held))
    orig = jax.device_get(held[:12])
    panel = np.stack([np.asarray(orig, np.float32),
                      np.asarray(recons, np.float32)], 1).reshape(
                          -1, *orig.shape[1:])
    save_image_grid(panel, str(out / "final_recon_panel.png"), nrow=6)
    if args.keep_best and best is not None:
        b_recons = jax.device_get(recon_eval(best[2], best[3], held))
        b_panel = np.stack([np.asarray(orig, np.float32),
                            np.asarray(b_recons, np.float32)], 1).reshape(
                                -1, *orig.shape[1:])
        save_image_grid(b_panel, str(out / "best_recon_panel.png"), nrow=6)

    (out / "curve.jsonl").write_text(
        "\n".join(json.dumps(r) for r in curve) + "\n")
    # log-log fit over the measured tail (skip the first 10%: compile-time
    # transient + the proxy's fast initial drop)
    tail = [r for r in curve if r["step"] >= args.steps // 10]
    xs = np.log([r["step"] for r in tail])
    ys = np.log([max(r["recon_proxy"], 1e-9) for r in tail])
    slope, intercept = np.polyfit(xs, ys, 1)
    # extrapolate: steps needed for the proxy to reach the anchored configs'
    # band (~0.05) IF the fitted power law held
    target = 0.05
    steps_to_target = (float(np.exp((np.log(target) - intercept) / slope))
                       if slope < 0 else None)
    summary = {
        "run": "gan_only long budget",
        "operating_point": f"{args.image_size}^2 batch {args.batch} "
                           f"{args.dtype}, {args.steps} steps, style={args.style}"
                           + (f", lr_d={args.lr_d}" if args.lr_d else ""),
        "recon_proxy_first": curve[0]["recon_proxy"],
        "recon_proxy_last": curve[-1]["recon_proxy"],
        "recon_proxy_mean_predictor_floor": round(float(floor), 4),
        "d_loss_last": curve[-1]["d_loss"],
        "g_loss_last": curve[-1]["g_loss"],
        "loglog_fit": {"slope": round(float(slope), 3),
                       "intercept": round(float(intercept), 3),
                       "fit_points": len(tail)},
        "extrapolated_steps_to_0.05_proxy": (round(steps_to_target)
                                             if steps_to_target else None),
        "images_per_sec": round(args.steps * args.batch / wall, 1),
        "wall_s": round(wall, 1),
        "out": str(out),
    }
    if args.keep_best and best is not None:
        summary["keep_best"] = {
            "best_step": best[1], "best_recon_proxy": round(best[0], 4),
            "vs_live_endpoint": curve[-1]["recon_proxy"],
            "panel": "best_recon_panel.png"}
    (out / "summary.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
