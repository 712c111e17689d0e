"""Inference / evaluation API.

- ``reconstruct``: eval-mode encode->decode + per-batch MSE, the reference's only
  quantitative metric (``visualize_reconstructions``, README.md:1215-1256).
- ``sample``: decoder-only generation from z ~ N(0, I) spatial latents — the
  BASELINE config-4 path the reference never implements (its "generate samples"
  cell just reruns reconstruction, README.md:1340-1346).
- ``interpolate``: latent interpolation between two image batches over the
  ``encode()`` means.

All functions are jitted per (shape, config) and run eval-mode semantics: BN running
stats, dropout off, deterministic z = mu (README.md:1217-1218).
"""

from __future__ import annotations

import functools
import itertools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vaegan_tpu.config import Config
from vaegan_tpu.train.state import TrainState, build_models


def _gen_vars(state: TrainState):
    return {"params": state.g_params, "batch_stats": state.g_stats}


def eval_reconstruct(cfg: Config, gen, gvars, batch: jax.Array):
    """Eval-mode reconstruction + the reference's one-batch MSE
    (README.md:1235). Shared by the jitted inference path below and the
    serving export (vaegan_tpu.serving), so the served metric's definition
    lives in exactly one place."""
    out = gen.apply(gvars, batch, train=False)
    recon = out[0] if cfg.generator.is_vae else out
    mse = jnp.mean(jnp.square(recon.astype(jnp.float32) - batch.astype(jnp.float32)))
    return recon, mse


def with_ema(state: TrainState) -> TrainState:
    """View of ``state`` whose generator params are the EMA iterate
    (``cfg.train.ema_decay``); every inference function then evaluates the
    averaged generator: ``reconstruct(cfg, with_ema(state), batch)``."""
    if state.g_ema is None:
        raise ValueError("state carries no generator EMA — set "
                         "cfg.train.ema_decay to maintain one during training")
    return state.replace(g_params=state.g_ema)


@functools.partial(jax.jit, static_argnums=0)
def _reconstruct(cfg: Config, state: TrainState, batch: jax.Array):
    gen, _ = build_models(cfg)
    return eval_reconstruct(cfg, gen, _gen_vars(state), batch)


def reconstruct(cfg: Config, state: TrainState, batch: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Returns (reconstructions, scalar MSE) — the README.md:1235 metric."""
    return _reconstruct(cfg, state, batch)


def latent_shape(cfg: Config, image_size: Optional[int] = None) -> Tuple[int, int, int]:
    """Spatial latent (H', W', C') for the configured resolution: the encoder
    divides by 2**depth; channels = feature_depth."""
    s = image_size or cfg.data.image_size
    f = 2 ** cfg.generator.depth
    return (s // f, s // f, cfg.generator.feature_depth)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def _sample(cfg: Config, state: TrainState, n: int, image_size: int, key: jax.Array):
    gen, _ = build_models(cfg)
    h, w, c = latent_shape(cfg, image_size)
    z = jax.random.normal(key, (n, h, w, c), jnp.float32)
    return gen.apply(_gen_vars(state), z, train=False, method=gen.decode)


def sample(cfg: Config, state: TrainState, key: jax.Array, n: int = 25,
           image_size: Optional[int] = None) -> jax.Array:
    """Decode n prior samples z ~ N(0, I) into images."""
    return _sample(cfg, state, n, image_size or cfg.data.image_size, key)


@functools.partial(jax.jit, static_argnums=(0, 3))
def _interpolate(cfg: Config, state: TrainState, pair: Tuple[jax.Array, jax.Array], steps: int):
    gen, _ = build_models(cfg)
    x1, x2 = pair
    z1 = gen.apply(_gen_vars(state), x1, train=False, method=gen.encode)
    z2 = gen.apply(_gen_vars(state), x2, train=False, method=gen.encode)
    ts = jnp.linspace(0.0, 1.0, steps).reshape(steps, 1, 1, 1, 1)
    zs = (1.0 - ts) * z1[None] + ts * z2[None]          # (steps, B, h, w, c)
    flat = zs.reshape((-1,) + z1.shape[1:])
    imgs = gen.apply(_gen_vars(state), flat, train=False, method=gen.decode)
    return imgs.reshape((steps,) + x1.shape)


def interpolate(cfg: Config, state: TrainState, x1: jax.Array, x2: jax.Array,
                steps: int = 8) -> jax.Array:
    """Linear interpolation in latent space between encode(x1) and encode(x2);
    returns (steps, B, H, W, C) decoded images."""
    if x1.shape[0] == 0 or x2.shape[0] == 0 or x1.shape != x2.shape:
        raise ValueError(
            f"interpolate needs two equal non-empty batches, got {x1.shape} and "
            f"{x2.shape} (a batch of at least 2 images is required to take both "
            "endpoints from one batch)")
    return _interpolate(cfg, state, (x1, x2), steps)


def save_visual_evidence(cfg: Config, state: TrainState, batch, out_dir,
                         key: Optional[jax.Array] = None,
                         prefix: str = "") -> dict:
    """Write the reference's qualitative deliverables as PNGs.

    The reference's primary published evidence is images, not numbers: the
    orig-vs-recon grids its eval cells render (README.md:1262, 1315 — the
    gan_files/*.png committed to its repo). This writes the same artifacts for
    a trained state, plus the two generation-path visuals the reference's
    config-4 intends (README.md:1340-1346):

    - ``{prefix}recon_panel.png`` — top row originals, bottom row eval-mode
      reconstructions (one column per image);
    - ``{prefix}samples.png`` — 5x5 grid decoded from z ~ N(0, I);
    - ``{prefix}interpolation.png`` — latent interpolation strips between the
      batch's first and second images (one row per interpolation step pair).

    Returns {name: path} for the files written.
    """
    import numpy as np

    from pathlib import Path

    from vaegan_tpu.utils.imaging import save_image_grid

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    batch = np.asarray(jax.device_get(batch), np.float32)
    n = min(8, batch.shape[0])
    written = {}

    recon, _ = reconstruct(cfg, state, batch[:n])
    panel = np.concatenate([batch[:n], np.asarray(jax.device_get(recon), np.float32)])
    p = out / f"{prefix}recon_panel.png"
    save_image_grid(panel, str(p), nrow=n)
    written["recon_panel"] = str(p)

    if key is None:
        key = jax.random.key(0)
    smp = sample(cfg, state, key, n=25, image_size=batch.shape[1])
    p = out / f"{prefix}samples.png"
    save_image_grid(jax.device_get(smp), str(p), nrow=5)
    written["samples"] = str(p)

    if n >= 2:
        k = min(4, n // 2)  # k strips of 8 steps each
        strips = interpolate(cfg, state, batch[:k], batch[k:2 * k], steps=8)
        # (steps, k, H, W, C) -> row-major strips: one row per pair
        imgs = np.asarray(jax.device_get(strips), np.float32)
        imgs = np.transpose(imgs, (1, 0, 2, 3, 4)).reshape((-1,) + imgs.shape[2:])
        p = out / f"{prefix}interpolation.png"
        save_image_grid(imgs, str(p), nrow=8)
        written["interpolation"] = str(p)
    return written


def recalibrate_bn_stats(cfg: Config, state: TrainState, loader,
                         num_batches: int = 50) -> TrainState:
    """Re-estimate the generator's BatchNorm running statistics from the FINAL
    parameters (standing-stats recalibration, the standard GAN eval repair —
    cf. BigGAN's standing statistics / SWA's ``update_bn``).

    Why it exists: the reference's eval protocol normalizes with running BN
    stats (``model.eval()``, README.md:1217), which are an EMA over the whole
    training trajectory. A long adversarial run drifts — the terminal params'
    activation distribution no longer matches stats averaged over the orbit,
    opening a train/eval reconstruction gap (measured at 256²x9-epochs:
    train recon 0.18 vs eval MSE 1.2-1.37, BENCH_NOTES.md). This pass replays
    ``num_batches`` through the generator in stat-collection mode — batch-stat
    normalization, each module's own momentum derived numerically from the
    update itself, dropout OFF, deterministic z = mu (the eval distribution) — without
    touching any parameter, and returns a state whose ``g_stats`` describe the
    final generator instead of the trajectory.

    The result is the EXACT mean of the per-batch moments over ``num_batches``
    (SWA's ``update_bn`` form, not an EMA) — the stale stats contribute nothing
    regardless of how far they drifted. Deterministic: no RNG is consumed
    (dropout is disabled by construction and the code is evaluated at its
    mean).
    """
    # dropout off so collected stats match the eval-mode data flow; same param
    # tree (dropout is parameterless), so state.g_params applies unchanged
    rcfg = cfg.replace(generator=cfg.generator.replace(dropout_prob=0.0))
    zeros = jax.tree.map(jnp.zeros_like, state.g_stats)
    ones = jax.tree.map(jnp.ones_like, state.g_stats)

    @functools.partial(jax.jit, static_argnums=0)
    def collect(cfg_: Config, params, stats, batch):
        """One stat-collection forward from the given running stats; with the
        update rule new = (1-m)*old + m*batch, old = 0 yields m*batch. (Train-
        mode normalization uses the batch stats, so the old values never touch
        the activations — the output stats are the only thing `old` affects.)"""
        gen, _ = build_models(cfg_)
        eps = None
        if cfg_.generator.is_vae:
            h, w, c = latent_shape(cfg_, batch.shape[1])
            eps = jnp.zeros((batch.shape[0], h, w, c), jnp.float32)  # z = mu
        _, upd = gen.apply({"params": params, "batch_stats": stats}, batch,
                           train=True, eps=eps, mutable=["batch_stats"])
        return upd["batch_stats"]

    acc = None
    n = 0
    momentum = None  # per-leaf momentum tree, derived numerically on batch 1
    # a re-iterable loader (anything that is not already an iterator) is looped
    # over as many epochs as num_batches needs; a bare iterator is consumed once
    reiterable = not (hasattr(loader, "__next__") and iter(loader) is loader)
    while n < num_batches:
        before = n
        for batch in loader:
            batch = jnp.asarray(batch)
            from_zero = collect(rcfg, state.g_params, zeros, batch)
            if momentum is None:
                # derive each module's ACTUAL momentum instead of trusting the
                # class default: from old=1 the update gives (1-m) + m*batch,
                # so (from_one - from_zero) = 1-m leafwise. Robust to any
                # per-module momentum override (ADVICE r3).
                from_one = collect(rcfg, state.g_params, ones, batch)
                momentum = jax.tree.map(lambda o, z: 1.0 - (o - z),
                                        from_one, from_zero)
            bm = jax.tree.map(lambda new, m: new / m, from_zero, momentum)
            acc = bm if acc is None else jax.tree.map(
                lambda a, b, k=n: a + (b - a) / (k + 1), acc, bm)
            n += 1
            if n >= num_batches:
                break  # count checked AFTER consuming, so a one-shot iterator
                # never loses an un-processed batch (ADVICE r3)
        if n == before or not reiterable:
            break
    if n == 0:
        raise ValueError("recalibrate_bn_stats got an empty loader")
    return state.replace(g_stats=acc)


def mean_predictor_floor(batch) -> float:
    """MSE of the strongest trivial baseline on a batch: predicting each
    image's own mean (available to any autoencoder). Equals the mean per-image
    variance. Eval-MSE numbers are only meaningful relative to this floor —
    it is set by the DATASET's variance, not by model quality, so 'inside the
    reference's published band' (README.md:1266/1319) can be above or below
    the floor depending on the data the band is measured on."""
    b = jnp.asarray(batch, jnp.float32)
    return float(jnp.mean(jnp.var(b, axis=tuple(range(1, b.ndim)))))


def evaluate_mse(cfg: Config, state: TrainState, loader, num_batches: int = 1) -> float:
    """Reference eval protocol: MSE over ``num_batches`` loader batches
    (README.md:1219-1235 uses exactly one)."""
    total, n = 0.0, 0
    # islice, not enumerate+break: the latter pulls (and discards) one batch
    # past the budget, silently losing it from a caller's one-shot iterator
    for batch in itertools.islice(iter(loader), num_batches):
        _, mse = reconstruct(cfg, state, jnp.asarray(batch))
        total += float(mse)
        n += 1
    if n == 0:
        # a silent 0.0 would rank as a PERFECT score downstream (the search
        # orders trials by this number) — an empty loader is a data-path bug
        raise ValueError("evaluate_mse got an empty loader (no batches); "
                         "check root_dir / dataset size vs batch_size")
    return total / n
