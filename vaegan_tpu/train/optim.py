"""Optimizers with torch-exact semantics.

The reference trains with ``torch.optim.RMSprop(params, lr=3e-4, weight_decay=1e-5)``
(README.md:918-919). optax's ``rmsprop`` differs from torch in two ways that break
step-for-step parity: optax computes ``g * rsqrt(nu + eps)`` (eps inside the root)
while torch computes ``g / (sqrt(nu) + eps)``, and optax has no coupled L2 term.
``torch_rmsprop`` reproduces torch exactly:

    g   <- g + weight_decay * p          (coupled L2, applied before the moment update)
    nu  <- alpha * nu + (1 - alpha) * g^2
    p   <- p - lr * g / (sqrt(nu) + eps)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from vaegan_tpu.config import OptimConfig


class RmsState(NamedTuple):
    nu: optax.Updates


def torch_rmsprop(
    lr: float,
    alpha: float = 0.99,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    def init_fn(params):
        return RmsState(nu=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        if weight_decay:
            if params is None:
                raise ValueError("torch_rmsprop with weight_decay needs params")
            updates = jax.tree.map(lambda g, p: g + weight_decay * p, updates, params)
        nu = jax.tree.map(lambda n, g: alpha * n + (1.0 - alpha) * jnp.square(g),
                          state.nu, updates)
        updates = jax.tree.map(lambda g, n: -lr * g / (jnp.sqrt(n) + eps), updates, nu)
        return updates, RmsState(nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(cfg: OptimConfig, role: str = None) -> optax.GradientTransformation:
    """``role``: "g" / "d" selects the per-network learning rate
    (``cfg.lr_g`` / ``cfg.lr_d``, TTUR split) when set; None / unset roles use
    ``cfg.lr`` — the reference's single shared lr (README.md:918-919)."""
    role_lr = {"g": cfg.lr_g, "d": cfg.lr_d}.get(role)
    lr = role_lr if role_lr is not None else cfg.lr  # 0.0 = freeze, not "unset"
    if cfg.optimizer == "rmsprop":
        return torch_rmsprop(lr, cfg.rms_decay, cfg.eps, cfg.weight_decay)
    if cfg.optimizer == "adam":
        tx = optax.adam(lr, b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.eps)
        if cfg.weight_decay:
            tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
        return tx
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
