"""End-to-end example: train a VAE-GAN, evaluate reconstructions, sample the prior,
interpolate — the complete user journey of the reference notebook
(/root/reference/README.md:938-961, 1215-1346) on this framework.

Run with real data:   python examples/train_vaegan.py --data-dir nii
Run synthetically:    python examples/train_vaegan.py
"""

import argparse
from pathlib import Path


import jax
import jax.numpy as jnp

from vaegan_tpu import inference
from vaegan_tpu.api import visualize_reconstructions
from vaegan_tpu.config import preset
from vaegan_tpu.data.pipeline import make_loader
from vaegan_tpu.train.loop import train
from vaegan_tpu.utils.imaging import save_image_grid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--image-size", type=int, default=96)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--out", default="vaegan_out")
    args = ap.parse_args()

    cfg = preset("notebook")  # the reference's exact VAE-GAN configuration
    cfg = cfg.replace(
        data=cfg.data.replace(
            image_size=args.image_size, batch_size=args.batch_size,
            root_dir=args.data_dir or "nii", synthetic=args.data_dir is None),
        train=cfg.train.replace(
            n_epochs=args.epochs, dtype="bfloat16",
            checkpoint_dir=f"{args.out}/ckpt", sample_dir=f"{args.out}/samples"),
    )
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    state, logger = train(cfg)

    loader = make_loader(cfg.data, seed=0)
    mse = visualize_reconstructions(cfg, state, loader, num_images=4,
                                    out_path=str(out / "reconstructions.png"))

    samples = inference.sample(cfg, state, jax.random.key(0), n=25)
    save_image_grid(jax.device_get(samples), str(out / "prior_samples.png"))

    batch = jnp.asarray(next(iter(loader)))
    seq = inference.interpolate(cfg, state, batch[:1], batch[1:2], steps=8)
    save_image_grid(jax.device_get(seq[:, 0]), str(out / "interpolation.png"), nrow=8)
    print(f"artifacts in {out}/ — recon MSE {mse:.4f}")


if __name__ == "__main__":
    main()
