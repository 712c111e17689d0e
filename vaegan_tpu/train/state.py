"""Train state: one pytree carrying params, mutable model state, and optimizer states.

The reference keeps this implicitly in torch module/optimizer objects
(README.md:886-919); here it is an explicit, jit-transparent flax struct so the whole
train step is a pure function ``(state, batch, key) -> (state, metrics)`` — the shape
pjit shards over the device mesh.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from vaegan_tpu.config import Config, pallas_mode
from vaegan_tpu.models import Discriminator, UnsupervisedGeneratorNetwork
from vaegan_tpu.train.optim import build_optimizer


@flax.struct.dataclass
class TrainState:
    step: jax.Array                     # int32 scalar
    g_params: Any
    d_params: Any
    g_stats: Any                        # generator batch_stats
    d_stats: Any                        # discriminator batch_stats
    d_spectral: Any                     # discriminator spectral-norm (u, v) state
    opt_g: Any                          # two-opt: one state; three-opt: {"enc","dec"}
    opt_d: Any
    g_metrics: Dict[str, jax.Array]     # last G-half metrics (the reference prints
    #                                     stale G values on critic-only steps,
    #                                     README.md:837 — reproduced intentionally)
    g_ema: Any = None                   # generator-param EMA (cfg.train.ema_decay;
    #                                     None = off, an empty pytree node)


def _dtype(cfg: Config):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cfg.train.dtype]


def build_models(cfg: Config, axis_name=None) -> Tuple[UnsupervisedGeneratorNetwork, Discriminator]:
    dt = _dtype(cfg)
    gen = UnsupervisedGeneratorNetwork(
        cfg=cfg.generator, init_scheme=cfg.train.init_scheme, dtype=dt,
        axis_name=axis_name, remat=cfg.train.remat,
        use_pallas=pallas_mode(cfg.train.use_pallas) == "all",
        fuse_reparam=pallas_mode(cfg.train.use_pallas) in ("losses", "all"))
    # custom_vjp (the fused kernels) is not twice-differentiable; the WGAN gradient
    # penalty takes grad-of-grad THROUGH the critic, so the critic only fuses when
    # no GP is configured.
    uses_gp = cfg.loss.adversarial == "wgan" and cfg.loss.lambda_gp > 0.0
    disc = Discriminator(
        cfg=cfg.discriminator, init_scheme=cfg.train.init_scheme, dtype=dt,
        axis_name=axis_name, remat=cfg.train.remat,
        use_pallas=pallas_mode(cfg.train.use_pallas) == "all" and not uses_gp)
    return gen, disc


def create_train_state(cfg: Config, key: jax.Array, axis_name=None) -> TrainState:
    """Initialize params/state/optimizers for the configured models.

    Uses the configured image size for shape inference; batch size 1 is enough (all
    shapes are batch-polymorphic except the critic's flatten, which only depends on
    spatial dims).
    """
    gen, disc = build_models(cfg, axis_name)
    s = cfg.data.image_size
    x = jnp.zeros((1, s, s, cfg.generator.in_channels), jnp.float32)
    kg, kd, kdrop, knoise = jax.random.split(key, 4)
    gv = gen.init({"params": kg, "dropout": kdrop, "noise": knoise}, x, train=False)
    dv = disc.init({"params": kd, "dropout": kdrop}, x, train=False)

    tx_g = build_optimizer(cfg.optim)
    tx_d = build_optimizer(cfg.optim)
    if cfg.optim.scheme == "three":
        # paper-faithful split: encoder+code_processor | decoder | discriminator
        enc_params = {k: gv["params"][k] for k in ("encoder", "code_processor")}
        dec_params = {k: gv["params"][k] for k in ("decoder",)}
        opt_g = {"enc": tx_g.init(enc_params), "dec": tx_g.init(dec_params)}
    else:
        opt_g = tx_g.init(gv["params"])
    opt_d = tx_d.init(dv["params"])

    zero = jnp.zeros((), jnp.float32)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=gv["params"],
        d_params=dv["params"],
        g_stats=gv.get("batch_stats", {}),
        d_stats=dv.get("batch_stats", {}),
        d_spectral=dv.get("spectral", {}),
        opt_g=opt_g,
        opt_d=opt_d,
        g_metrics={"g_loss": zero, "adv_loss": zero, "recon_loss": zero, "kl": zero},
        # jnp.copy, not an aliasing identity map: the loop's jitted step donates
        # the state, and an aliased g_params/g_ema leaf would be donated twice
        g_ema=(jax.tree.map(jnp.copy, gv["params"])
               if cfg.train.ema_decay is not None else None),
    )
