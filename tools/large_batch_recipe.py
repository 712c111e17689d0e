"""Large-batch WGAN-GP recipe probe (BASELINE config 5 / preset vaegan_256_dp).

The reference's adversarial recipe is tuned for batch 4 / lr 3e-4; at batch 128
the game destabilizes late (round-2 BENCH_NOTES: train recon reaches 0.13 by
step 1800, then critic real-score drift to ±26 and eval MSE 0.79). This driver
probes candidate mitigations (TTUR lr split, n_critics, lr scaling) cheaply:

- the WHOLE synthetic dataset is staged on-device once (1,200 x 96^2 x f32 =
  44 MB) and batches are gathered on-chip from host-shuffled index arrays, so a
  probe costs step time only — the dev tunnel's ~2 s/batch H2D never enters;
- every `--log-every` steps it records critic real/fake scores and train recon;
- at the end it evaluates eval-mode reconstruction MSE on held-back batches
  (the reference's one-batch metric, averaged over 3 draws).

    python tools/large_batch_recipe.py --steps 3000 --batch 128 \
        --lr-g 1e-4 --lr-d 3e-4 --n-critics 1 --dtype bfloat16

Prints one JSON line per probe. Verdict fields: final eval MSE, max |critic
score| over the run, last-window train recon.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--image-size", type=int, default=96)
    ap.add_argument("--dataset", type=int, default=1200)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--lr-g", type=float, default=None)
    ap.add_argument("--lr-d", type=float, default=None)
    ap.add_argument("--n-critics", type=int, default=1)
    ap.add_argument("--clip", type=float, default=0.01)
    ap.add_argument("--lambda-gp", type=float, default=10.0)
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="microbatch accumulation (e.g. 4 at 256^2 batch 64: "
                         "the single-step GP graph OOMs 16 GB HBM past b16)")
    ap.add_argument("--ema-decay", type=float, default=None,
                    help="track a generator EMA and also report its eval MSE")
    ap.add_argument("--gp-every", type=int, default=1,
                    help="lazy GP cadence (lambda_gp scaled by k on GP steps)")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--save-visuals", default=None, metavar="DIR",
                    help="write orig-vs-recon / prior-sample / interpolation "
                         "PNGs for the best-evaluating iterate (live vs EMA) "
                         "to DIR (inference.save_visual_evidence)")
    args = ap.parse_args()

    cfg = preset("notebook")
    cfg = cfg.replace(
        data=cfg.data.replace(image_size=args.image_size, batch_size=args.batch),
        loss=cfg.loss.replace(clip_value=args.clip or None,
                              lambda_gp=args.lambda_gp),
        optim=cfg.optim.replace(lr=args.lr, lr_g=args.lr_g, lr_d=args.lr_d),
        train=cfg.train.replace(dtype=args.dtype, n_critics=args.n_critics,
                                seed=args.seed, grad_accum=args.grad_accum,
                                ema_decay=args.ema_decay,
                                gp_every=args.gp_every),
    )

    # whole dataset resident in HBM; batches gathered on-device (inside the
    # jit), one jitted dispatch per step — see the comment on run_step below.
    ds = SyntheticDataset(args.dataset, args.image_size, seed=0)
    data = jax.device_put(jnp.asarray(ds.load_batch(range(args.dataset))))

    state = create_train_state(cfg, jax.random.key(args.seed))
    key = jax.random.key(args.seed, impl=cfg.train.rng_impl)
    nc = args.n_critics

    from functools import partial

    # one jitted call per STEP (bench.py proves per-step jit dispatch runs at
    # chip rate over the tunnel); the batch gather lives INSIDE the jit — an
    # eager per-step jnp.take was the dispatch-latency killer.
    def jit_variant(do_g, do_gp=True):
        fn = make_train_step(cfg, do_g_update=do_g, do_gp=do_gp,
                             gp_lambda_scale=float(args.gp_every))

        @partial(jax.jit, donate_argnums=0)
        def jstep(state, data, idx, sno):
            return fn(state, jnp.take(data, idx, axis=0),
                      jax.random.fold_in(key, sno))
        return jstep

    jstep_g, jstep_d = jit_variant(True), jit_variant(False)
    if args.gp_every > 1:
        jstep_g_nogp = jit_variant(True, do_gp=False)
        jstep_d_nogp = jit_variant(False, do_gp=False)

    rng = np.random.default_rng(args.seed)
    n_batches = args.dataset // args.batch

    def index_stream():
        while True:
            order = rng.permutation(args.dataset)
            for i in range(n_batches):
                yield order[i * args.batch:(i + 1) * args.batch]
    stream = index_stream()

    history = []
    t0 = time.time()
    for sno in range(args.steps):
        idx = np.asarray(next(stream), np.int32)
        do_g = (sno % (args.dataset // args.batch) % nc == 0)
        do_gp = args.gp_every == 1 or sno % args.gp_every == 0
        if do_gp:
            jstep = jstep_g if do_g else jstep_d
        else:
            jstep = jstep_g_nogp if do_g else jstep_d_nogp
        state, metrics = jstep(state, data, idx, np.int32(sno))
        if (sno + 1) % args.log_every == 0:
            m = {k: float(jax.device_get(v)) for k, v in metrics.items()}
            history.append({"step": sno + 1,
                            "recon": m["recon_loss"],
                            "d_real": -m["d_real_loss"],
                            "d_fake": m["d_fake_loss"],
                            "gp": m["gp"]})
            print(json.dumps(history[-1]), flush=True)
            if not all(np.isfinite(list(history[-1].values()))):
                print(json.dumps({"verdict": "diverged", "at": sno + 1}), flush=True)
                break
    wall = time.time() - t0

    # eval: reference one-batch MSE protocol, 3 fresh draws, eval-mode generator
    gen, _ = build_models(cfg)

    @jax.jit
    def recon_mse(state, batch):
        out = gen.apply({"params": state.g_params, "batch_stats": state.g_stats},
                        batch, train=False)
        r = out[0] if cfg.generator.is_vae else out
        return jnp.mean(jnp.square(r.astype(jnp.float32) - batch.astype(jnp.float32)))

    draws, ema_draws = [], []
    for d in range(3):
        idx = jnp.asarray(rng.permutation(args.dataset)[: args.batch])
        b = jnp.take(data, idx, 0)
        draws.append(float(jax.device_get(recon_mse(state, b))))
        if state.g_ema is not None:
            ema_draws.append(float(jax.device_get(
                recon_mse(state.replace(g_params=state.g_ema), b))))

    visuals = None
    if args.save_visuals:
        from vaegan_tpu import inference
        vis_state, tag = state, "live"
        if ema_draws and min(ema_draws) < min(draws):
            vis_state, tag = state.replace(g_params=state.g_ema), "ema"
        idx = jnp.asarray(rng.permutation(args.dataset)[: args.batch])
        visuals = inference.save_visual_evidence(
            cfg, vis_state, jnp.take(data, idx, 0), args.save_visuals,
            key=jax.random.key(7),
            prefix=f"b{args.batch}_{args.image_size}px_{tag}_")
        visuals["iterate"] = tag

    scores = [abs(h["d_real"]) for h in history] + [abs(h["d_fake"]) for h in history]
    tail = history[-5:]
    print(json.dumps({
        "probe": {"batch": args.batch, "image": args.image_size,
                  "lr": args.lr, "lr_g": args.lr_g, "lr_d": args.lr_d,
                  "n_critics": args.n_critics, "clip": args.clip,
                  "lambda_gp": args.lambda_gp, "dtype": args.dtype,
                  "steps": args.steps, "seed": args.seed,
                  "grad_accum": args.grad_accum, "ema_decay": args.ema_decay,
                  "gp_every": args.gp_every},
        "eval_mse_draws": [round(x, 4) for x in draws],
        **({"ema_eval_mse_draws": [round(x, 4) for x in ema_draws]}
           if ema_draws else {}),
        "max_abs_critic_score": round(max(scores), 2) if scores else None,
        "tail_recon": [round(h["recon"], 4) for h in tail],
        "wall_s": round(wall, 1),
        **({"visuals": visuals} if visuals else {}),
    }), flush=True)


if __name__ == "__main__":
    main()
