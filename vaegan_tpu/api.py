"""High-level API mirroring the reference's entry points.

``experiment(...)`` takes the same surface as the reference's ``experiment()``
(README.md:860-935: depth/length/feature_size, discriminator params dict, loss
weights, lr, n_critics, ...) mapped onto the Config tree, trains, and returns the
final TrainState plus the Config. ``visualize_reconstructions(...)`` reproduces
README.md:1215-1256: one eval batch through the generator, original-vs-reconstruction
grid PNG, printed MSE.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vaegan_tpu import inference
from vaegan_tpu.config import Config, DiscriminatorConfig, GeneratorConfig
from vaegan_tpu.train.loop import train
from vaegan_tpu.train.state import TrainState


def experiment(
    *,
    network_depth: int = 2,
    network_length: int = 1,
    feature_size: int = 64,
    discriminator_params: Optional[Dict[str, Any]] = None,
    is_vae: bool = True,
    lr: float = 3e-4,
    n_epochs: int = 3,
    adversarial_loss_weight: float = 1.0,
    reconstruction_loss_weight: float = 10.0,
    kl_weight: float = 0.1,
    n_critics: int = 1,
    image_size: int = 96,
    batch_size: int = 4,
    root_dir: str = "nii",
    synthetic_data: bool = False,
    seed: int = 0,
    config_overrides: Optional[Config] = None,
    loader=None,
    neptune_run=None,
) -> Tuple[TrainState, Config]:
    """Train a VAE-GAN with the reference's experiment surface; returns
    (state, config). ``adversarial_loss_weight=0`` reproduces the plain-VAE run
    (README.md:1283-1306).

    ``neptune_run``: the reference's ``use_neptune`` knob (README.md:768-773,
    842-849) — pass a ``neptune.init_run``-style object and the 7 reference
    channels stream to it via :class:`~vaegan_tpu.utils.metrics.NeptuneSink`
    (``run.stop()`` is called at the end, README.md:856-857)."""
    if config_overrides is not None:
        cfg = config_overrides
    else:
        d = discriminator_params or dict(
            num_stride_conv1=1, num_features_conv1=64, num_blocks=(1, 1, 1),
            num_strides_res=(1, 2, 2), num_features_res=(128, 256, 512))
        base = Config()
        cfg = base.replace(
            generator=GeneratorConfig(
                depth=network_depth, length=network_length,
                feature_size=feature_size, is_vae=is_vae),
            discriminator=DiscriminatorConfig(
                **{k: tuple(v) if isinstance(v, (list, tuple)) else v
                   for k, v in d.items()}),
            loss=base.loss.replace(
                adversarial_weight=adversarial_loss_weight,
                reconstruction_weight=reconstruction_loss_weight,
                kl_weight=kl_weight),
            optim=base.optim.replace(lr=lr),
            data=base.data.replace(
                image_size=image_size, batch_size=batch_size, root_dir=root_dir,
                synthetic=synthetic_data),
            train=base.train.replace(n_epochs=n_epochs, n_critics=n_critics, seed=seed),
        )
    logger = None
    if neptune_run is not None:
        from vaegan_tpu.utils.metrics import MetricsLogger, NeptuneSink, StdoutSink

        logger = MetricsLogger(sinks=[StdoutSink(), NeptuneSink(neptune_run)],
                               flush_every=cfg.train.log_every)
    state, logger = train(cfg, loader=loader, logger=logger)
    if neptune_run is not None:
        logger.close()  # flush + run.stop(), README.md:856-857
    return state, cfg


def visualize_reconstructions(
    cfg: Config,
    state: TrainState,
    loader,
    num_images: int = 5,
    out_path: Optional[str] = None,
) -> float:
    """Eval-mode reconstruction of one loader batch; writes an
    original/reconstruction grid PNG and returns the MSE (README.md:1215-1256)."""
    batch = jnp.asarray(next(iter(loader)))
    recon, mse = inference.reconstruct(cfg, state, batch)
    n = min(num_images, batch.shape[0])
    if out_path is not None:
        from vaegan_tpu.utils.imaging import save_image_grid
        pairs = np.concatenate(
            [np.asarray(batch[:n]), np.asarray(recon[:n])], axis=0)
        save_image_grid(pairs, out_path, nrow=n)
    mse_f = float(mse)
    print(f"Mean squared error between original and reconstructed images: {mse_f:.4f}")
    return mse_f
