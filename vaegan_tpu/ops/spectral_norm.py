"""Spectral normalization via power iteration, torch-exact.

The reference wraps both critic convs and the 1x1 shortcut conv in
``torch.nn.utils.spectral_norm`` (README.md:378-388). torch semantics reproduced here:

- the weight is reshaped to (out_channels, -1) — for our HWIO kernels that is a
  transpose+reshape to match torch's OIHW-first flattening order so imported torch
  ``u``/``v`` vectors stay valid;
- one power iteration per *training* forward updates the ``(u, v)`` buffers
  (stop-gradient state); eval mode reuses the stored pair without recomputation,
  exactly like ``torch.nn.utils.spectral_norm``'s ``do_power_iteration`` flag;
- sigma = u^T W v with u, v detached; the normalized weight W/sigma is differentiable
  w.r.t. W — required for the gradient penalty's grad-of-grad through the critic
  (README.md:717-739).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _l2_normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    # torch F.normalize: v / max(||v||, eps)
    return v / jnp.maximum(jnp.linalg.norm(v), eps)


def _as_matrix(kernel: jax.Array) -> jax.Array:
    """(KH, KW, I, O) HWIO kernel -> (O, I*KH*KW) matrix in torch's flatten order."""
    if kernel.ndim == 4:
        w = jnp.transpose(kernel, (3, 2, 0, 1))  # OIHW
        return w.reshape(w.shape[0], -1)
    if kernel.ndim == 2:  # linear (in, out) -> (out, in)
        return kernel.T
    raise ValueError(f"unsupported kernel rank {kernel.ndim}")


def spectral_normalize(
    kernel: jax.Array,
    u: jax.Array,
    v: jax.Array,
    *,
    update: bool,
    n_iterations: int = 1,
    eps: float = 1e-12,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Return ``(kernel / sigma, new_u, new_v)``.

    Args:
        kernel: parameter in its storage layout (HWIO conv or (in, out) linear).
        u: (out_dim,) left singular vector estimate (state, not a parameter).
        v: (in_dim*kh*kw,) right singular vector estimate (state).
        update: run power iteration(s) and return updated vectors (train mode).
    """
    w = _as_matrix(kernel.astype(jnp.float32))
    if update:
        for _ in range(n_iterations):
            v = _l2_normalize(w.T @ u, eps)
            u = _l2_normalize(w @ v, eps)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
    else:
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
    sigma = u @ (w @ v)
    return (kernel / sigma.astype(kernel.dtype)), u, v
