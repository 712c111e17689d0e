"""Reproduce the reference's headline experiment at its native operating point.

The reference's published numbers (README.md:938-961, 1266, 1358-1388) come from
256x256 images, batch 4, 3 epochs, lr 3e-4, with eval = one-batch reconstruction
MSE repeated over fresh shuffled draws (cell 23's protocol; VAE-GAN band
0.0518-0.0573, plain-VAE 0.0790-0.0983 on the hand X-rays).

    python examples/reproduce_headline.py                 # VAE-GAN, synthetic
    python examples/reproduce_headline.py --vae           # plain-VAE ablation
    python examples/reproduce_headline.py --data-dir nii  # the real dataset

Prints one JSON line with the final train metrics and the repeat-draw eval MSEs.
"""

import argparse
import json
import time
from pathlib import Path


import jax

# persistent compiled-program cache (same store as bench/tools): the 256^2
# composed step costs ~10 min to compile fresh over the dev tunnel, and the
# multi-seed quality drivers run this script 8+ times back to back
jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache_bench"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from vaegan_tpu import inference
from vaegan_tpu.config import preset
from vaegan_tpu.data.pipeline import make_loader
from vaegan_tpu.train.loop import train


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vae", action="store_true",
                    help="the plain-VAE ablation (adv weight 0, dummy critic)")
    ap.add_argument("--preset", default=None,
                    choices=["notebook", "notebook_vae", "vaegan_paper"],
                    help="config preset; default notebook (or notebook_vae "
                         "with --vae). 'vaegan_paper' = BASELINE config 3: "
                         "Dis_l feature-matching + BCE + three optimizers "
                         "(Larsen et al. Algorithm 1)")
    ap.add_argument("--feature-tap", default=None,
                    choices=["res_out", "pool", "fc1"],
                    help="Dis_l tap override (paper preset only)")
    ap.add_argument("--gamma", type=float, default=None,
                    help="decoder feature-matching weight override (Larsen "
                         "alg. 1; paper preset only)")
    ap.add_argument("--n-critics", type=int, default=None,
                    help="override TrainConfig.n_critics (G every n-th batch; "
                         "the reference's experiment() default is 5, its "
                         "published runs pass 1)")
    ap.add_argument("--gp-every", type=int, default=None,
                    help="override TrainConfig.gp_every (lazy-GP schedule; "
                         "1 = reference-faithful every-step GP)")
    ap.add_argument("--data-dir", default=None,
                    help="real NIfTI dir; default: the synthetic stand-in sized "
                         "like the reference's dataset (~1200 images)")
    ap.add_argument("--data-style", default="blobs",
                    choices=["blobs", "edges", "texture"],
                    help="synthetic-data style (ignored with --data-dir): "
                         "'edges' has the sharp, learnable high-frequency "
                         "structure where the adversarial term has MSE upside; "
                         "'texture' keeps that structure's edge-pixel fraction "
                         "constant across resolutions (the 256^2 regime)")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--max-steps", type=int, default=None,
                    help="cap total train steps (smoke/verify drives)")
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--draws", type=int, default=3,
                    help="repeat-draw eval count (cell 23 runs it repeatedly)")
    ap.add_argument("--out", default="headline_out")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--ema-decay", type=float, default=None,
                    help="track a generator-param EMA and report BOTH iterates "
                         "at eval (the large-batch recipe's stabilizer, "
                         "BENCH_NOTES; e.g. 0.999)")
    ap.add_argument("--recalibrate-bn", type=int, default=0, metavar="N",
                    help="also report eval MSE after re-estimating the BN "
                         "running stats from N data batches (standing-stats "
                         "recalibration; repairs the train/eval gap of a long "
                         "adversarial run — inference.recalibrate_bn_stats)")
    ap.add_argument("--use-pallas", default=None, choices=["off", "losses", "all"],
                    help="override TrainConfig.use_pallas (the r3 records ran "
                         "with the then-default 'losses' stream; r4's default "
                         "is 'off' — at batch 4 the adversarial game is "
                         "trajectory-chaotic, so the stream choice moves the "
                         "endpoint within the documented run-to-run spread)")
    ap.add_argument("--seed", type=int, default=None,
                    help="override TrainConfig.seed")
    ap.add_argument("--save-visuals", default=None, metavar="DIR",
                    help="write the reference's qualitative deliverables "
                         "(orig-vs-recon panel, prior-sample grid, latent "
                         "interpolation strips — gan_files/*.png, "
                         "README.md:1262/1315) for the final state to DIR")
    args = ap.parse_args()

    preset_name = args.preset or ("notebook_vae" if args.vae else "notebook")
    if args.vae and args.preset not in (None, "notebook_vae"):
        raise SystemExit("--vae conflicts with --preset " + args.preset)
    cfg = preset(preset_name)
    if args.feature_tap is not None:
        cfg = cfg.replace(discriminator=cfg.discriminator.replace(
            feature_tap=args.feature_tap))
    if args.gamma is not None:
        cfg = cfg.replace(optim=cfg.optim.replace(gamma=args.gamma))
    cfg = cfg.replace(
        data=cfg.data.replace(
            image_size=args.image_size, batch_size=args.batch_size,
            root_dir=args.data_dir or "nii", synthetic=args.data_dir is None,
            synthetic_style=args.data_style, cache=args.data_dir is not None),
        train=cfg.train.replace(
            n_epochs=args.epochs, dtype=args.dtype, sample_interval=100,
            sample_dir=f"{args.out}/samples", log_every=50,
            ema_decay=args.ema_decay,
            **({"use_pallas": args.use_pallas} if args.use_pallas else {}),
            **({"seed": args.seed} if args.seed is not None else {}),
            **({"n_critics": args.n_critics} if args.n_critics is not None else {}),
            **({"gp_every": args.gp_every} if args.gp_every is not None else {}),
            **({"max_steps": args.max_steps} if args.max_steps is not None else {})),
    )
    Path(args.out).mkdir(parents=True, exist_ok=True)

    t0 = time.time()
    state, logger = train(cfg)
    wall = time.time() - t0

    # cell-23 protocol: fresh shuffled one-batch MSE per draw
    loader = make_loader(cfg.data, seed=1)
    floor = inference.mean_predictor_floor(next(iter(loader)))
    draws = [inference.evaluate_mse(cfg, state, iter(loader))
             for _ in range(args.draws)]
    ema_draws = None
    if args.ema_decay is not None:
        ema_state = inference.with_ema(state)
        ema_draws = [inference.evaluate_mse(cfg, ema_state, iter(loader))
                     for _ in range(args.draws)]
    recal_draws = None
    if args.recalibrate_bn:
        recal = inference.recalibrate_bn_stats(
            cfg, state, make_loader(cfg.data, seed=2),
            num_batches=args.recalibrate_bn)
        recal_draws = [inference.evaluate_mse(cfg, recal, iter(loader))
                       for _ in range(args.draws)]

    tail = [m for m in logger.history if "_wall_s" not in m][-1]
    run_name = {"notebook": "VAE-GAN", "notebook_vae": "plain-VAE",
                "vaegan_paper": "VAE-GAN-paper"}[preset_name]
    out = {
        "run": run_name,
        "preset": preset_name,
        "operating_point": f"{args.image_size}^2 batch {args.batch_size} "
                           f"x {args.epochs} epochs ({args.dtype})",
        "data": args.data_dir or f"synthetic:{args.data_style}",
        "steps": int(jax.device_get(state.step)),
        "train_wall_s": round(wall, 1),
        "final_train_metrics": {k: round(float(v), 4) for k, v in tail.items()},
        "eval_mse_repeat_draws": [round(m, 4) for m in draws],
        # the strongest trivial baseline on THIS data (per-image variance):
        # an eval MSE is only meaningful relative to it — band positions are
        # dataset-variance-dependent (inference.mean_predictor_floor)
        "eval_mse_mean_predictor_floor": round(floor, 4),
        "reference_band": (
            "0.0790-0.0983" if args.vae else
            # config 3 has no reference run (the notebook never implements the
            # paper step, SURVEY.md §0); the pixel-loss VAE-GAN band is the
            # comparison anchor per VERDICT r4 item 1
            "n/a (comparison anchor: VAE-GAN 0.0518-0.0573)"
            if preset_name == "vaegan_paper" else "0.0518-0.0573"),
    }
    if preset_name == "vaegan_paper":
        out["feature_tap"] = cfg.discriminator.feature_tap
        out["gamma"] = cfg.optim.gamma
    if args.n_critics is not None or args.gp_every is not None:
        out["schedule"] = {"n_critics": cfg.train.n_critics,
                           "gp_every": cfg.train.gp_every}
    if ema_draws is not None:
        out["eval_mse_repeat_draws_ema"] = [round(m, 4) for m in ema_draws]
    if recal_draws is not None:
        out["eval_mse_repeat_draws_bn_recalibrated"] = [round(m, 4)
                                                        for m in recal_draws]
    if args.save_visuals:
        # render from the best-evaluating iterate reported above: EMA when it
        # wins, BN-recalibrated when requested, else the live params
        vis_state, tag = state, "live"
        if ema_draws is not None and min(ema_draws) < min(draws):
            vis_state, tag = inference.with_ema(state), "ema"
        if recal_draws is not None and min(recal_draws) < min(
                ema_draws or draws):
            vis_state, tag = recal, "bn_recalibrated"
        batch = next(iter(make_loader(cfg.data, seed=1)))
        out["visuals"] = inference.save_visual_evidence(
            cfg, vis_state, batch, args.save_visuals,
            key=jax.random.key(7), prefix=f"{out['run']}_{tag}_".replace(" ", ""))
        out["visuals_iterate"] = tag
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
