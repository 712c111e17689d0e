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
    network_depth: Optional[int] = None,      # default 2
    network_length: Optional[int] = None,     # default 1
    feature_size: Optional[int] = None,       # default 64
    discriminator_params: Optional[Dict[str, Any]] = None,
    is_vae: Optional[bool] = None,            # default True
    lr: Optional[float] = None,               # default 3e-4
    n_epochs: Optional[int] = None,           # default 3
    adversarial_loss_weight: Optional[float] = None,   # default 1.0
    reconstruction_loss_weight: Optional[float] = None,  # default 10.0
    kl_weight: Optional[float] = None,        # default 0.1
    n_critics: Optional[int] = None,          # default 1
    image_size: Optional[int] = None,         # default 96
    batch_size: Optional[int] = None,         # default 4
    root_dir: Optional[str] = None,           # default "nii"
    synthetic_data: Optional[bool] = None,    # default False
    seed: Optional[int] = None,               # default 0
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
    kwargs = dict(
        network_depth=network_depth, network_length=network_length,
        feature_size=feature_size, discriminator_params=discriminator_params,
        is_vae=is_vae, lr=lr, n_epochs=n_epochs,
        adversarial_loss_weight=adversarial_loss_weight,
        reconstruction_loss_weight=reconstruction_loss_weight,
        kl_weight=kl_weight, n_critics=n_critics, image_size=image_size,
        batch_size=batch_size, root_dir=root_dir,
        synthetic_data=synthetic_data, seed=seed)
    if config_overrides is not None:
        passed = [k for k, v in kwargs.items() if v is not None]
        if passed:
            # config_overrides is a COMPLETE config, not a base to merge into —
            # silently discarding explicit kwargs would train with
            # hyperparameters the caller did not ask for
            raise ValueError(
                f"config_overrides replaces the whole config; also passing "
                f"{passed} is ambiguous — set those fields on the Config "
                f"(cfg.replace(...)) instead")
        cfg = config_overrides
    else:
        defaults = dict(
            network_depth=2, network_length=1, feature_size=64, is_vae=True,
            lr=3e-4, n_epochs=3, adversarial_loss_weight=1.0,
            reconstruction_loss_weight=10.0, kl_weight=0.1, n_critics=1,
            image_size=96, batch_size=4, root_dir="nii",
            synthetic_data=False, seed=0)
        v = {k: (defaults[k] if kwargs.get(k) is None else kwargs[k])
             for k in defaults}
        d = discriminator_params or dict(
            num_stride_conv1=1, num_features_conv1=64, num_blocks=(1, 1, 1),
            num_strides_res=(1, 2, 2), num_features_res=(128, 256, 512))
        base = Config()
        cfg = base.replace(
            generator=GeneratorConfig(
                depth=v["network_depth"], length=v["network_length"],
                feature_size=v["feature_size"], is_vae=v["is_vae"]),
            discriminator=DiscriminatorConfig(
                **{k: tuple(x) if isinstance(x, (list, tuple)) else x
                   for k, x in d.items()}),
            loss=base.loss.replace(
                adversarial_weight=v["adversarial_loss_weight"],
                reconstruction_weight=v["reconstruction_loss_weight"],
                kl_weight=v["kl_weight"]),
            optim=base.optim.replace(lr=v["lr"]),
            data=base.data.replace(
                image_size=v["image_size"], batch_size=v["batch_size"],
                root_dir=v["root_dir"], synthetic=v["synthetic_data"]),
            train=base.train.replace(n_epochs=v["n_epochs"],
                                     n_critics=v["n_critics"], seed=v["seed"]),
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
