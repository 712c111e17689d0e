"""Functional batch normalization with torch-exact semantics.

The reference leans on ``nn.BatchNorm2d`` in every residual block (README.md:143-169,
376-392). Two semantics matter for parity and for TPU data parallelism:

1. torch normalizes with the *biased* batch variance but updates the running variance
   with the *unbiased* (Bessel-corrected) one, with
   ``running = (1 - momentum) * running + momentum * batch`` and momentum = 0.1.
2. Under data parallelism the batch statistics must be *global*. Two paths:
   - under ``jit`` + GSPMD sharding (the framework default), ``jnp.mean`` over a
     batch-sharded array already reduces across devices — XLA inserts the ICI
     all-reduce, nothing to do;
   - under ``shard_map``/``pmap`` the reduction is per-shard, so an ``axis_name``
     triggers explicit ``lax.pmean`` of mean / mean-of-squares.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def batch_stats(
    x: jax.Array,
    running_mean: jax.Array,
    running_var: jax.Array,
    *,
    use_running_average: bool,
    momentum: float = 0.1,
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Compute the (mean, var) used for normalization plus the updated running
    stats — the stats half of ``batch_norm``, exposed for fused-kernel callers."""
    c = x.shape[-1]
    red = tuple(range(x.ndim - 1))
    if use_running_average:
        return running_mean, running_var, running_mean, running_var
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=red)
    mean_sq = jnp.mean(jnp.square(xf), axis=red)
    if axis_name is not None:
        mean = lax.pmean(mean, axis_name)
        mean_sq = lax.pmean(mean_sq, axis_name)
    var = mean_sq - jnp.square(mean)
    n = jnp.asarray(x.size // c, jnp.float32)
    if axis_name is not None:
        n = n * lax.psum(1, axis_name)
    bessel = n / jnp.maximum(n - 1.0, 1.0)
    new_mean = ((1.0 - momentum) * running_mean + momentum * mean).astype(running_mean.dtype)
    new_var = ((1.0 - momentum) * running_var + momentum * (var * bessel)).astype(running_var.dtype)
    return mean, var, new_mean, new_var


def batch_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    running_mean: jax.Array,
    running_var: jax.Array,
    *,
    use_running_average: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Normalize over (N, H, W) per channel (NHWC input).

    Returns ``(y, new_running_mean, new_running_var)``; the running stats are passed
    through unchanged when ``use_running_average`` is True (eval mode).
    """
    mean, var, new_mean, new_var = batch_stats(
        x, running_mean, running_var, use_running_average=use_running_average,
        momentum=momentum, axis_name=axis_name)
    inv = lax.rsqrt(var.astype(jnp.float32) + eps)
    scale_eff = (scale.astype(jnp.float32) * inv).astype(x.dtype)
    bias_eff = (bias.astype(jnp.float32) - mean.astype(jnp.float32) * scale.astype(jnp.float32) * inv).astype(x.dtype)
    y = x * scale_eff + bias_eff
    return y, new_mean, new_var
