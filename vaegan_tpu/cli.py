"""Command-line interface.

The reference has no CLI (it is a notebook); this exposes the framework's surface:

    python -m vaegan_tpu.cli train --preset notebook --data-dir nii
    python -m vaegan_tpu.cli train --config cfg.json --synthetic --epochs 1
    python -m vaegan_tpu.cli eval --checkpoint ckpt/ --preset vae_96 --data-dir nii
    python -m vaegan_tpu.cli sample --checkpoint ckpt/ --preset notebook -n 25 -o out.png
    python -m vaegan_tpu.cli interpolate --checkpoint ckpt/ ... -o interp.png
    python -m vaegan_tpu.cli import --generator g.pt --checkpoint ckpt/ --preset notebook
    python -m vaegan_tpu.cli export-serving --checkpoint ckpt/ --out bundle/
    python -m vaegan_tpu.cli search --trials 8 --results result/params.json
    python -m vaegan_tpu.cli print-config --preset vaegan_paper
    python -m vaegan_tpu.cli fetch-data --dest nii
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _load_cfg(args):
    from vaegan_tpu.config import Config, preset

    if getattr(args, "config", None):
        cfg = Config.from_json(args.config)
    else:
        cfg = preset(args.preset)
    d = cfg.data
    if getattr(args, "data_dir", None):
        d = d.replace(root_dir=args.data_dir)
    if getattr(args, "synthetic", False):
        d = d.replace(synthetic=True)
    if getattr(args, "synthetic_style", None):
        d = d.replace(synthetic_style=args.synthetic_style)
    if getattr(args, "hbm_cache", False):
        d = d.replace(hbm_cache=True)
    if getattr(args, "batch_size", None):
        d = d.replace(batch_size=args.batch_size)
    if getattr(args, "image_size", None):
        d = d.replace(image_size=args.image_size)
    cfg = cfg.replace(data=d)
    t = cfg.train
    if getattr(args, "epochs", None) is not None:
        t = t.replace(n_epochs=args.epochs)
    if getattr(args, "checkpoint", None):
        t = t.replace(checkpoint_dir=args.checkpoint)
    if getattr(args, "seed", None) is not None:
        t = t.replace(seed=args.seed)
    if getattr(args, "grad_accum", None) is not None:
        if args.grad_accum < 1:
            raise SystemExit(f"--grad-accum must be >= 1, got {args.grad_accum}")
        t = t.replace(grad_accum=args.grad_accum)
    if getattr(args, "ema_decay", None) is not None:
        t = t.replace(ema_decay=args.ema_decay)
    if getattr(args, "gp_every", None) is not None:
        t = t.replace(gp_every=args.gp_every)
    if getattr(args, "max_steps", None) is not None:
        # 0 = unbounded (matches examples/train_multichip.py), overriding any
        # budget in the loaded config
        t = t.replace(max_steps=args.max_steps or None)
    return cfg.replace(train=t)


def _restore(cfg, ckpt_dir):
    import jax

    from vaegan_tpu.checkpoint import CheckpointManager
    from vaegan_tpu.train import create_train_state

    mgr = CheckpointManager(ckpt_dir)
    # match the template's g_ema leaf to what the checkpoint actually carries
    # (the decay VALUE is irrelevant at inference) so restore works whether or
    # not the current flags/config mention ema_decay
    t = cfg.train
    saved = mgr.saved_has_g_ema()
    if saved is True:
        tmpl_cfg = cfg if t.ema_decay is not None else cfg.replace(
            train=t.replace(ema_decay=0.999))
    elif saved is False:
        tmpl_cfg = cfg if t.ema_decay is None else cfg.replace(
            train=t.replace(ema_decay=None))
    else:  # undeterminable metadata layout — trust the current flags
        tmpl_cfg = cfg
    template = create_train_state(tmpl_cfg, jax.random.key(t.seed))
    state = mgr.restore(template)
    mgr.close()
    return state


def cmd_train(args):
    from vaegan_tpu.train.loop import train
    from vaegan_tpu.utils.metrics import JsonlSink, MetricsLogger, StdoutSink

    cfg = _load_cfg(args)
    sinks = [StdoutSink()]
    if args.metrics_jsonl:
        sinks.append(JsonlSink(args.metrics_jsonl))
    logger = MetricsLogger(sinks=sinks, flush_every=cfg.train.log_every)
    if getattr(args, "dp", False):
        from vaegan_tpu.parallel.train import train_data_parallel
        state, logger = train_data_parallel(cfg, logger=logger,
                                            resume=getattr(args, "resume", False))
    else:
        state, logger = train(cfg, logger=logger, resume=getattr(args, "resume", False))
    logger.close()
    print(f"done: {sum(1 for m in logger.history if '_wall_s' not in m)} steps")
    return 0


def cmd_export_serving(args):
    """Checkpoint -> self-contained StableHLO serving bundle (jax.export)."""
    from vaegan_tpu import inference, serving

    cfg = _load_cfg(args)
    state = _restore(cfg, args.checkpoint)
    if getattr(args, "ema", False):
        state = inference.with_ema(state)
    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    mpath = serving.save_bundle(
        args.out, cfg, state, platforms=platforms,
        batch_size=args.batch or None,
        image_size=getattr(args, "image_size", None))
    print(f"serving bundle ({', '.join(platforms)}; batch "
          f"{'symbolic' if not args.batch else args.batch}) -> {mpath}")
    return 0


def cmd_eval(args):
    import jax.numpy as jnp

    from vaegan_tpu import inference
    from vaegan_tpu.data.pipeline import make_loader

    cfg = _load_cfg(args)
    state = _restore(cfg, args.checkpoint)
    if getattr(args, "ema", False):
        state = inference.with_ema(state)
    if getattr(args, "recalibrate_bn", 0):
        state = inference.recalibrate_bn_stats(
            cfg, state, make_loader(cfg.data, seed=cfg.train.seed + 1),
            num_batches=args.recalibrate_bn)
    loader = make_loader(cfg.data, seed=cfg.train.seed)
    mse = inference.evaluate_mse(cfg, state, iter(loader), num_batches=args.num_batches)
    print(f"Mean squared error between original and reconstructed images: {mse:.4f}")
    return 0


def cmd_export(args):
    from vaegan_tpu.interop import export_reference_state_dicts

    cfg = _load_cfg(args)
    state = _restore(cfg, args.checkpoint)
    gen_sd, disc_sd = export_reference_state_dicts(cfg, state)
    try:
        import torch

        gen_out = {k: torch.from_numpy(v.copy()) for k, v in gen_sd.items()}
        disc_out = {k: torch.from_numpy(v.copy()) for k, v in disc_sd.items()}
        torch.save(gen_out, args.generator_out)
        torch.save(disc_out, args.discriminator_out)
        print(f"exported generator ({len(gen_sd)} tensors) -> "
              f"{args.generator_out}, discriminator ({len(disc_sd)} tensors) "
              f"-> {args.discriminator_out}")
        return 0
    except ImportError:  # numpy fallback: loadable via np.load + from_numpy
        import numpy as _np

        g_path, d_path = (p if p.endswith(".npz") else p + ".npz"
                          for p in (args.generator_out, args.discriminator_out))
        _np.savez(g_path, **gen_sd)
        _np.savez(d_path, **disc_sd)
        print("torch unavailable — wrote numpy archives instead: "
              f"generator ({len(gen_sd)} tensors) -> {g_path}, "
              f"discriminator ({len(disc_sd)} tensors) -> {d_path}")
        return 0


def cmd_import(args):
    """Reference torch state_dicts -> a framework checkpoint (inverse of export)."""
    import numpy as np

    from vaegan_tpu.checkpoint import CheckpointManager
    from vaegan_tpu.interop import import_reference_state_dicts

    def load_sd(path):
        if path.endswith(".npz"):
            with np.load(path) as z:
                return {k: z[k] for k in z.files}
        try:
            import torch
        except ImportError:
            raise SystemExit(
                f"torch is unavailable; convert {path} to .npz first "
                "(np.savez(path, **{k: v.numpy() for k, v in sd.items()}))")
        return torch.load(path, map_location="cpu", weights_only=True)

    cfg = _load_cfg(args)
    gen_sd = load_sd(args.generator)
    disc_sd = load_sd(args.discriminator) if args.discriminator else None
    state = import_reference_state_dicts(cfg, gen_sd, disc_sd)
    mgr = CheckpointManager(args.checkpoint)
    mgr.save(state, force=True)
    mgr.wait()
    mgr.close()
    critic = (f"critic from {args.discriminator}" if args.discriminator
              else "fresh-initialized critic")
    print(f"imported generator from {args.generator} ({len(gen_sd)} tensors), "
          f"{critic} -> checkpoint at {args.checkpoint} (step 0)")
    return 0


def cmd_sample(args):
    import jax

    from vaegan_tpu import inference
    from vaegan_tpu.utils.imaging import save_image_grid

    cfg = _load_cfg(args)
    state = _restore(cfg, args.checkpoint)
    if getattr(args, "ema", False):
        state = inference.with_ema(state)
    imgs = inference.sample(cfg, state, jax.random.key(args.seed or 0), n=args.num)
    save_image_grid(jax.device_get(imgs), args.output, nrow=5)
    print(f"wrote {args.num} prior samples to {args.output}")
    return 0


def cmd_interpolate(args):
    import jax
    import jax.numpy as jnp

    from vaegan_tpu import inference
    from vaegan_tpu.data.pipeline import make_loader
    from vaegan_tpu.utils.imaging import save_image_grid

    cfg = _load_cfg(args)
    state = _restore(cfg, args.checkpoint)
    if getattr(args, "ema", False):
        state = inference.with_ema(state)
    loader = make_loader(cfg.data, seed=cfg.train.seed)
    batch = jnp.asarray(next(iter(loader)))
    seq = inference.interpolate(cfg, state, batch[:1], batch[1:2], steps=args.steps)
    save_image_grid(jax.device_get(seq[:, 0]), args.output, nrow=args.steps)
    print(f"wrote {args.steps}-step interpolation to {args.output}")
    return 0


def cmd_print_config(args):
    cfg = _load_cfg(args)
    print(cfg.to_json())
    return 0


def cmd_search(args):
    from vaegan_tpu.search import random_search

    cfg = _load_cfg(args)
    random_search(cfg, n_trials=args.trials, results_path=args.results,
                  archive_dir=args.archive, seed=args.seed or 0,
                  max_steps_per_trial=args.max_steps_per_trial or None)
    return 0


def cmd_fetch_data(args):
    from vaegan_tpu.data.fetch import REFERENCE_DATASET_URL, fetch_dataset

    n = fetch_dataset(url=args.url or REFERENCE_DATASET_URL, dest=args.dest,
                      archive_path=args.archive)
    print(f"extracted {n} NIfTI files into {args.dest}")
    return 0


def cmd_bench(args):
    import runpy

    # accept bare words (argparse rejects unknown --flags): `bench loader`
    valid = {"paper", "vae", "loader", "roofline", "infer"}
    modes = [m.lstrip("-") for m in (args.mode or [])]
    bad = [m for m in modes if m not in valid]
    if bad:
        print(f"unknown bench mode(s) {bad}; valid: {sorted(valid)}",
              file=sys.stderr)
        return 2
    # bench.py runs exactly one mode; the only valid combination is roofline
    # with a step selector (`bench roofline paper` attributes the Larsen step)
    combo_ok = "roofline" in modes and all(
        m in ("roofline", "paper", "vae") for m in modes) and len(modes) <= 2
    if len(modes) > 1 and not combo_ok:
        print(f"pass at most one bench mode (or 'roofline' plus 'paper'|'vae'), "
              f"got {modes}", file=sys.stderr)
        return 2
    sys.argv = ["bench.py"] + [f"--{m}" for m in modes]
    runpy.run_path(str(Path(__file__).resolve().parents[1] / "bench.py"),
                   run_name="__main__")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="vaegan-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, ckpt_required=False):
        sp.add_argument("--preset", default="notebook")
        sp.add_argument("--config", help="JSON config file (overrides --preset)")
        sp.add_argument("--data-dir")
        sp.add_argument("--synthetic", action="store_true")
        sp.add_argument("--synthetic-style",
                        choices=["blobs", "edges", "texture"],
                        help="synthetic-data style (data.pipeline."
                             "SyntheticDataset)")
        sp.add_argument("--batch-size", type=int)
        sp.add_argument("--image-size", type=int)
        sp.add_argument("--seed", type=int)
        sp.add_argument("--checkpoint", required=ckpt_required,
                        help="checkpoint directory")

    sp = sub.add_parser("train", help="run training")
    common(sp)
    sp.add_argument("--epochs", type=int)
    sp.add_argument("--metrics-jsonl", help="write metrics to this JSONL file")
    sp.add_argument("--resume", action="store_true",
                    help="restore the latest checkpoint and continue")
    sp.add_argument("--dp", action="store_true",
                    help="data-parallel over all visible devices (mesh from cfg.parallel)")
    sp.add_argument("--ema-decay", type=float,
                    help="maintain a generator-param EMA at this decay "
                         "(e.g. 0.999); evaluate via inference.with_ema")
    sp.add_argument("--gp-every", type=int,
                    help="lazy gradient penalty: run the WGAN-GP term (and its "
                         "grad-of-grad) every k-th step with lambda_gp scaled "
                         "by k (StyleGAN2 lazy regularization; 1 = reference-"
                         "faithful every-step GP)")
    sp.add_argument("--grad-accum", type=int,
                    help="microbatch accumulation factor >= 1 (one optimizer "
                         "update per accumulated batch)")
    sp.add_argument("--hbm-cache", action="store_true",
                    help="stage the whole decoded dataset in device memory and "
                         "gather batches on-device (removes the per-step H2D "
                         "image feed; single-process runs, dataset must fit "
                         "in HBM — docs/DATA.md §4b)")
    sp.add_argument("--max-steps", type=int,
                    help="hard optimizer-step budget; 0 = unbounded "
                         "(overrides the config)")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("export",
                        help="export a checkpoint to the reference notebook's "
                             "torch state_dict layout")
    common(sp, ckpt_required=True)
    sp.add_argument("--generator-out", default="generator_state_dict.pt")
    sp.add_argument("--discriminator-out", default="discriminator_state_dict.pt")
    sp.set_defaults(fn=cmd_export)

    sp = sub.add_parser("import",
                        help="import reference-notebook torch state_dicts "
                             "(.pt or .npz) as a framework checkpoint")
    common(sp, ckpt_required=True)
    sp.add_argument("--generator", required=True,
                    help="UnsupervisedGeneratorNetwork.state_dict() file")
    sp.add_argument("--discriminator",
                    help="Discriminator.state_dict() file (optional; the "
                         "reference's experiment() only returns the generator)")
    sp.set_defaults(fn=cmd_import)

    sp = sub.add_parser("export-serving",
                        help="export a checkpoint as a self-contained StableHLO "
                             "serving bundle (reconstruct/encode/decode; loads "
                             "with jax alone, no model code)")
    common(sp, ckpt_required=True)
    sp.add_argument("--out", default="serving_bundle",
                    help="output bundle directory")
    sp.add_argument("--platforms", default="cpu,tpu",
                    help="comma-separated lowering platforms (default cpu,tpu)")
    sp.add_argument("--batch", type=int, default=0,
                    help="pin the batch dimension (default 0 = symbolic: one "
                         "artifact serves any batch size)")
    sp.add_argument("--ema", action="store_true",
                    help="export the generator-EMA iterate")
    sp.set_defaults(fn=cmd_export_serving)

    sp = sub.add_parser("eval", help="reconstruction MSE on data batches")
    common(sp, ckpt_required=True)
    sp.add_argument("--ema", action="store_true",
                    help="evaluate the generator-EMA iterate (requires a checkpoint trained with ema_decay)")
    sp.add_argument("--num-batches", type=int, default=1)
    sp.add_argument("--recalibrate-bn", type=int, default=0, metavar="N",
                    help="re-estimate the generator's BN running stats from N "
                         "data batches before evaluating (standing-stats "
                         "recalibration — repairs the train/eval gap a long "
                         "adversarial run opens; see inference.recalibrate_bn_stats)")
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser("sample", help="decode prior samples")
    common(sp, ckpt_required=True)
    sp.add_argument("--ema", action="store_true",
                    help="evaluate the generator-EMA iterate (requires a checkpoint trained with ema_decay)")
    sp.add_argument("-n", "--num", type=int, default=25)
    sp.add_argument("-o", "--output", default="samples.png")
    sp.set_defaults(fn=cmd_sample)

    sp = sub.add_parser("interpolate", help="latent interpolation between two images")
    common(sp, ckpt_required=True)
    sp.add_argument("--ema", action="store_true",
                    help="evaluate the generator-EMA iterate (requires a checkpoint trained with ema_decay)")
    sp.add_argument("--steps", type=int, default=8)
    sp.add_argument("-o", "--output", default="interpolation.png")
    sp.set_defaults(fn=cmd_interpolate)

    sp = sub.add_parser("search", help="hyperparameter random search")
    common(sp)
    sp.add_argument("--trials", type=int, default=8)
    sp.add_argument("--results", default="result/params.json")
    sp.add_argument("--archive", default="result/archive")
    sp.add_argument("--max-steps-per-trial", type=int, default=200,
                    help="per-trial optimizer-step cap; 0 = uncapped "
                         "(full n_epochs per trial, like the reference)")
    sp.set_defaults(fn=cmd_search)

    sp = sub.add_parser("print-config", help="dump the resolved config JSON")
    common(sp)
    sp.set_defaults(fn=cmd_print_config)

    sp = sub.add_parser("fetch-data",
                        help="download + extract the reference's hand X-ray "
                             "dataset (or any NIfTI zip) into a flat dir")
    sp.add_argument("--dest", default="nii", help="output directory (default nii)")
    sp.add_argument("--url", help="zip URL (default: the reference's Drive link)")
    sp.add_argument("--archive", help="already-downloaded zip (skips the download)")
    sp.set_defaults(fn=cmd_fetch_data)

    sp = sub.add_parser("bench", help="run the throughput benchmark")
    sp.add_argument("mode", nargs="*",
                    help="bench mode: paper | vae | loader | roofline "
                         "(default: headline WGAN-GP step); 'roofline paper' / "
                         "'roofline vae' attribute those steps instead")
    sp.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
