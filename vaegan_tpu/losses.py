"""Loss functions, torch-reduction-exact.

Reference semantics (README.md:717-831):
- pixel reconstruction = L1Loss() + MSELoss(), both mean-reduced (README.md:818-819, 921);
- KL summed over batch AND all spatial-latent dims — the trailing ``.mean()`` in the
  notebook is a no-op on a scalar (README.md:822-825); ``reduction="mean"`` divides by
  the batch size instead (per-sample KL), the sane option for large-batch TPU runs;
- WGAN critic loss -E[D(real)] + E[D(fake)] (README.md:792-793) with the
  gradient penalty of Gulrajani et al. (README.md:717-739);
- BCE adversarial + Dis_l feature-matching reconstruction for the paper-faithful
  Larsen et al. configuration (BASELINE config 3) which the notebook doesn't implement.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def mse_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(jnp.square(d))


def pixel_reconstruction_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """L1 + MSE, the reference's ``reconstruction_loss_funs`` (README.md:921)."""
    return l1_loss(pred, target) + mse_loss(pred, target)


def kl_divergence(mu: jax.Array, log_var: jax.Array, reduction: str = "sum") -> jax.Array:
    """-0.5 * sum(1 + log_var - mu^2 - exp(log_var)).

    ``"sum"`` reduces over batch and dims (reference README.md:822-825 — hence the
    1e9-scale KL values in its logs); ``"mean"`` divides by batch size.
    """
    mu = mu.astype(jnp.float32)
    log_var = log_var.astype(jnp.float32)
    kl = -0.5 * jnp.sum(1.0 + log_var - jnp.square(mu) - jnp.exp(log_var))
    if reduction == "sum":
        return kl
    if reduction == "mean":
        return kl / mu.shape[0]
    raise ValueError(f"unknown kl reduction {reduction!r}")


def bce_with_logits(logits: jax.Array, target: float) -> jax.Array:
    """Numerically-stable BCE on logits vs a constant target (0. or 1.),
    mean-reduced — matches ``torch.nn.BCEWithLogitsLoss``."""
    x = logits.astype(jnp.float32)
    t = jnp.asarray(target, jnp.float32)
    return jnp.mean(jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x))))


def wgan_critic_loss(real_logits: jax.Array, fake_logits: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Returns (real_loss, fake_loss) = (-E[D(real)], +E[D(fake)]) (README.md:792-793)."""
    return -jnp.mean(real_logits.astype(jnp.float32)), jnp.mean(fake_logits.astype(jnp.float32))


def wgan_generator_loss(fake_logits: jax.Array) -> jax.Array:
    """-E[D(fake)] (README.md:816)."""
    return -jnp.mean(fake_logits.astype(jnp.float32))


def feature_matching_loss(real_features: jax.Array, fake_features: jax.Array) -> jax.Array:
    """Dis_l Gaussian-observation reconstruction loss (Larsen et al. §3): MSE in the
    discriminator's l-th feature space."""
    return mse_loss(fake_features, real_features)


def gradient_penalty(
    critic: Callable[[jax.Array], Any],
    real: jax.Array,
    fake: jax.Array,
    key: jax.Array,
    alpha: Any = None,
) -> Tuple[jax.Array, Any]:
    """WGAN-GP (reference README.md:717-739).

    ``critic`` must map images -> per-sample logits (any trailing shape); it is
    differentiated w.r.t. its input (grad-of-grad happens when this penalty is then
    differentiated w.r.t. critic params — nested AD, JAX-native).

    alpha ~ U(0,1) per sample, broadcast over (H, W, C); penalty =
    E[(||d D(x_hat)/d x_hat||_2 - 1)^2] with the norm over flattened per-sample dims.

    ``critic`` may return ``(logits, aux)`` where aux carries mutable model state
    (batch-stat / spectral updates from the forward on the interpolates — torch
    updates them there too); the aux is routed through ``jax.grad(..., has_aux=True)``
    and returned alongside the penalty.
    """
    b = real.shape[0]
    if alpha is None:
        alpha = jax.random.uniform(key, (b, 1, 1, 1), jnp.float32)
    else:
        # parity-harness override: replay the reference's numpy alpha draw
        alpha = jnp.asarray(alpha, jnp.float32).reshape(b, 1, 1, 1)
    interp = alpha * real.astype(jnp.float32) + (1.0 - alpha) * fake.astype(jnp.float32)
    interp = interp.astype(real.dtype)

    def scalar_critic(x):
        out = critic(x)
        logits, aux = out if isinstance(out, tuple) else (out, None)
        return jnp.sum(logits.astype(jnp.float32)), aux

    grads, aux = jax.grad(scalar_critic, has_aux=True)(interp)
    grads = grads.reshape(b, -1).astype(jnp.float32)
    norms = jnp.sqrt(jnp.sum(jnp.square(grads), axis=1) + 1e-24)
    gp = jnp.mean(jnp.square(norms - 1.0))
    return gp, aux
