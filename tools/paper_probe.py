"""Config-3 (Larsen Algorithm-1) convergence probes (VERDICT r4 #1).

The first on-chip run of `vaegan_paper` at the reference operating point
failed honestly: the notebook's 140M-param SN critic saturates the BCE game
within an epoch (bce_real -> 0, bce_fake -> 0, so BOTH the decoder's
adversarial gradient and the GAN's feature-shaping pressure vanish), Dis_l
plateaus ~2.4, and eval pixel MSE lands at ~1.55 vs a 0.017 mean-predictor
floor (result/paper_quality/run_seed_default). Larsen et al. balanced this
game on a ~1M-param 64^2 critic; the notebook's critic (reference
README.md:422-498) is three orders heavier.

This tool probes the knobs the config surface sanctions — the Dis_l tap
(`feature_tap`: res_out / pool / fc1), the decoder's feature-matching weight
`gamma` (Larsen alg. 1), and the TTUR lr split (`lr_d`, the same lever the
large-batch WGAN recipe needed) — cheaply: the synthetic dataset is staged in
HBM once (the large_batch_recipe pattern), so a 900-step probe costs ~step
time only, plus per-interval saturation diagnostics (mean |logit| on real and
fake, the four loss components) that the train loop's metric line doesn't
expose.

    python tools/paper_probe.py --steps 900 --batch 4 --image-size 96 \
        --feature-tap pool --lr-d 3e-5 --out result/paper_probes

Prints one JSON line per probe; eval = the reference's one-batch MSE over 3
repeat draws (cell 23 protocol) + the mean-predictor floor.
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
from vaegan_tpu.train import create_train_state, make_paper_train_step
from vaegan_tpu.train.state import build_models


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=900)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--image-size", type=int, default=96)
    ap.add_argument("--dataset", type=int, default=1200)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--style", default="blobs",
                    choices=["blobs", "edges", "texture"])
    ap.add_argument("--data-dir", default=None,
                    help="on-disk NIfTI dir (tools/make_nifti_dataset.py): "
                         "stage the decoded dataset in HBM and run the probe "
                         "on the real-data distribution instead of the "
                         "in-process synthetic stand-in")
    ap.add_argument("--keep-best", action="store_true",
                    help="snapshot the best held-batch iterate (EMA when "
                         "--ema-decay is set, else live) on device and report "
                         "the 3-draw eval from THAT iterate too — the "
                         "oscillating-game operational recipe")
    ap.add_argument("--save-visuals", default=None, metavar="DIR",
                    help="render the reference's qualitative deliverables "
                         "from the best iterate (requires --keep-best)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--feature-tap", default=None,
                    choices=["res_out", "pool", "fc1"])
    ap.add_argument("--gamma", type=float, default=None)
    ap.add_argument("--lr-d", type=float, default=None,
                    help="TTUR split: critic lr (generator keeps optim.lr)")
    ap.add_argument("--kl-weight", type=float, default=None)
    ap.add_argument("--recon-weight", type=float, default=None)
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--ema-decay", type=float, default=None,
                    help="track a generator EMA and also evaluate its iterate "
                         "(the oscillating-game recipe: the game reaches the "
                         "pixel-configs' band transiently then oscillates — "
                         "see the 2700-step curves in result/paper_probes)")
    ap.add_argument("--out", default=None, help="append the JSON line here")
    args = ap.parse_args()

    cfg = preset("vaegan_paper")
    cfg = cfg.replace(
        data=cfg.data.replace(image_size=args.image_size, batch_size=args.batch),
        train=cfg.train.replace(dtype=args.dtype, seed=args.seed,
                                ema_decay=args.ema_decay),
    )
    if args.feature_tap:
        cfg = cfg.replace(discriminator=cfg.discriminator.replace(
            feature_tap=args.feature_tap))
    opt = cfg.optim
    if args.gamma is not None:
        opt = opt.replace(gamma=args.gamma)
    if args.lr_d is not None:
        opt = opt.replace(lr_d=args.lr_d)
    cfg = cfg.replace(optim=opt)
    loss = cfg.loss
    if args.kl_weight is not None:
        loss = loss.replace(kl_weight=args.kl_weight)
    if args.recon_weight is not None:
        loss = loss.replace(reconstruction_weight=args.recon_weight)
    cfg = cfg.replace(loss=loss)

    if args.data_dir:
        from vaegan_tpu.data.pipeline import make_dataset
        cfg = cfg.replace(data=cfg.data.replace(
            root_dir=args.data_dir, synthetic=False, cache=True))
        ds = make_dataset(cfg.data)
        args.dataset = len(ds)
    else:
        ds = SyntheticDataset(args.dataset, args.image_size, seed=0,
                              style=args.style)
    # device-resident dataset passed as a jit ARGUMENT, never closed over: a
    # captured constant is embedded in the compile payload, and the 256^2
    # dataset (315 MB) exceeds the dev tunnel's remote_compile request limit
    # (HTTP 413) — the 96^2 one (44 MB) merely bloated it
    data = jax.device_put(jnp.asarray(ds.load_batch(range(args.dataset))))
    rng = np.random.default_rng(args.seed)

    state = create_train_state(cfg, jax.random.key(args.seed, impl=cfg.train.rng_impl))
    step = jax.jit(make_paper_train_step(cfg), donate_argnums=0)

    gen, disc = build_models(cfg)

    @jax.jit
    def gather(data, idx):
        return jnp.take(data, idx, 0)

    @jax.jit
    def ema_mse(st, batch):
        out = gen.apply({"params": st.g_ema, "batch_stats": st.g_stats},
                        batch, train=False)
        return jnp.mean(jnp.square(out[0].astype(jnp.float32)
                                   - batch.astype(jnp.float32)))

    @jax.jit
    def diagnostics(st, batch, key):
        """Eval-mode pixel MSE + critic saturation probes (mean |logit|)."""
        out = gen.apply({"params": st.g_params, "batch_stats": st.g_stats},
                        batch, train=False)
        recon = out[0]
        mse = jnp.mean(jnp.square(recon.astype(jnp.float32)
                                  - batch.astype(jnp.float32)))
        lr_ = disc.apply({"params": st.d_params, "batch_stats": st.d_stats,
                          "spectral": st.d_spectral}, batch, train=False)
        lf_ = disc.apply({"params": st.d_params, "batch_stats": st.d_stats,
                          "spectral": st.d_spectral}, recon.astype(batch.dtype),
                         train=False)
        return mse, jnp.mean(jnp.abs(lr_)), jnp.mean(jnp.abs(lf_))

    held = gather(data, jnp.asarray(rng.permutation(args.dataset)[: max(args.batch, 4)]))
    from vaegan_tpu.inference import mean_predictor_floor
    floor = mean_predictor_floor(held)
    key = jax.random.key(args.seed + 1, impl=cfg.train.rng_impl)
    curve = []
    best = None  # (held_mse, step, g_params, g_stats) — device-resident
    t0 = time.time()
    for s in range(args.steps):
        idx = jnp.asarray(rng.integers(0, args.dataset, size=args.batch))
        state, metrics = step(state, gather(data, idx), jax.random.fold_in(key, s))
        sno = s + 1
        if sno % args.eval_every == 0 or sno == 1:
            mse, alr, alf = diagnostics(state, held,
                                        jax.random.fold_in(key, 1_000_000 + sno))
            row = {"step": sno,
                   **({"eval_mse_ema": round(float(jax.device_get(
                       ema_mse(state, held))), 4)}
                      if args.ema_decay else {}),
                   "eval_mse_held": round(float(jax.device_get(mse)), 4),
                   "dis_l": round(float(jax.device_get(metrics["recon_loss"])), 4),
                   "l_gan": round(float(jax.device_get(metrics["adv_loss"])), 4),
                   "bce_real": round(float(jax.device_get(metrics["d_real_loss"])), 4),
                   "bce_fake": round(float(jax.device_get(metrics["d_fake_loss"])), 4),
                   "kl_per_sample": round(float(jax.device_get(metrics["kl"])), 1),
                   "abs_logit_real": round(float(jax.device_get(alr)), 2),
                   "abs_logit_fake": round(float(jax.device_get(alf)), 2),
                   "wall_s": round(time.time() - t0, 1)}
            curve.append(row)
            print(json.dumps(row), flush=True)
            if args.keep_best:
                score = row.get("eval_mse_ema", row["eval_mse_held"])
                if best is None or score < best[0]:
                    params = state.g_ema if args.ema_decay else state.g_params
                    snap = jax.tree.map(lambda x: x + 0,
                                        (params, state.g_stats))
                    best = (score, sno, *snap)
    wall = time.time() - t0

    # cell-23 protocol: 3 fresh-draw one-batch eval MSEs
    @jax.jit
    def mse_with(g_params, g_stats, batch):
        out = gen.apply({"params": g_params, "batch_stats": g_stats},
                        batch, train=False)
        return jnp.mean(jnp.square(out[0].astype(jnp.float32)
                                   - batch.astype(jnp.float32)))

    draws, ema_draws, best_draws = [], [], []
    for d in range(3):
        b = gather(data, jnp.asarray(rng.permutation(args.dataset)[: args.batch]))
        mse, _, _ = diagnostics(state, b, jax.random.fold_in(key, 10_000 + d))
        draws.append(round(float(jax.device_get(mse)), 4))
        if args.ema_decay:
            ema_draws.append(round(float(jax.device_get(ema_mse(state, b))), 4))
        if best is not None:
            best_draws.append(round(float(jax.device_get(
                mse_with(best[2], best[3], b))), 4))

    out = {
        "probe": {"feature_tap": cfg.discriminator.feature_tap,
                  "gamma": cfg.optim.gamma, "lr_d": cfg.optim.lr_d,
                  "kl_weight": cfg.loss.kl_weight,
                  "recon_weight": cfg.loss.reconstruction_weight},
        "operating_point": f"{args.image_size}^2 batch {args.batch} "
                           f"{args.dtype}, {args.steps} steps, style={args.style}, "
                           f"seed {args.seed}",
        "eval_mse_repeat_draws": draws,
        **({"eval_mse_repeat_draws_ema": ema_draws,
            "ema_decay": args.ema_decay} if args.ema_decay else {}),
        **({"eval_mse_repeat_draws_best_iterate": best_draws,
            "best_iterate_step": best[1],
            "best_iterate_held_mse": round(best[0], 4)}
           if best is not None else {}),
        "eval_mse_mean_predictor_floor": round(float(floor), 4),
        "curve_min": min((r["eval_mse_held"], r["step"]) for r in curve),
        **({"curve_min_ema": min((r["eval_mse_ema"], r["step"]) for r in curve)}
           if args.ema_decay else {}),
        "final": curve[-1],
        "first": curve[0],
        "images_per_sec": round(args.steps * args.batch / wall, 1),
        "wall_s": round(wall, 1),
    }
    if args.save_visuals and best is not None:
        from vaegan_tpu import inference
        vis_state = state.replace(g_params=best[2], g_stats=best[3])
        b = gather(data, jnp.asarray(rng.permutation(args.dataset)[: max(args.batch, 4)]))
        out["visuals"] = inference.save_visual_evidence(
            cfg, vis_state, b, args.save_visuals,
            key=jax.random.key(7),
            prefix=f"paper_best_s{args.seed}_")
        out["visuals_iterate"] = f"best@{best[1]}"

    line = json.dumps(out)
    print(line, flush=True)
    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
