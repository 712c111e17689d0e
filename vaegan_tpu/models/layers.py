"""Thin linen wrappers over vaegan_tpu.ops with torch-exact semantics.

These exist (instead of ``flax.linen.Conv``/``BatchNorm``) so that:
- kernel layouts / inits match the torch reference exactly (see ops.initializers);
- spectral norm threads its (u, v) power-iteration state through a dedicated
  ``spectral`` variable collection;
- batch norm follows torch's biased/unbiased variance split (ops.norm) and exposes an
  ``axis_name`` for explicit cross-replica stats under shard_map;
- the fused Pallas paths can be swapped in beneath a stable module interface.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vaegan_tpu.ops import conv as conv_ops
from vaegan_tpu.ops import initializers as inits
from vaegan_tpu.ops.norm import batch_norm
from vaegan_tpu.ops.spectral_norm import _as_matrix, spectral_normalize

Dtype = Any


class Conv2D(nn.Module):
    """Conv / ConvTranspose with optional spectral normalization.

    Mirrors ``nn.Conv2d`` / ``nn.ConvTranspose2d`` /
    ``utils.spectral_norm(nn.Conv2d(...))`` from the reference (README.md:148-170,
    378-388). NHWC in/out, HWIO kernel.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = False
    transpose: bool = False
    spectral: bool = False
    init_scheme: str = "reference"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        kshape = (self.kernel_size, self.kernel_size, in_ch, self.features)
        kernel = self.param(
            "kernel",
            inits.conv_init(self.init_scheme, transpose=self.transpose, spectral=self.spectral),
            kshape,
        )
        if self.spectral:
            w = _as_matrix(kernel)

            def _init_vec(dim):
                # torch wrap-time init: normalized N(0,1) for both u and v
                def init():
                    k = self.make_rng("params") if self.has_rng("params") else jax.random.key(0)
                    g = jax.random.normal(jax.random.fold_in(k, dim), (dim,), jnp.float32)
                    return g / jnp.maximum(jnp.linalg.norm(g), 1e-12)
                return init

            u = self.variable("spectral", "u", _init_vec(w.shape[0]))
            v = self.variable("spectral", "v", _init_vec(w.shape[1]))
            kernel_n, u_new, v_new = spectral_normalize(
                kernel, u.value, v.value, update=train)
            if train and not self.is_initializing():
                u.value = u_new
                v.value = v_new
            kernel = kernel_n
        kernel = kernel.astype(self.dtype)
        xc = x.astype(self.dtype)
        if self.transpose:
            y = conv_ops.conv_transpose2d(xc, kernel, self.stride, self.padding)
        else:
            y = conv_ops.conv2d(xc, kernel, self.stride, self.padding)
        if self.use_bias:
            b = self.param("bias", inits.zeros, (self.features,))
            y = y + b.astype(self.dtype)
        return y


class Linear(nn.Module):
    features: int
    use_bias: bool = True
    init_scheme: str = "reference"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param("kernel", inits.linear_init(self.init_scheme),
                            (x.shape[-1], self.features))
        y = x.astype(self.dtype) @ kernel.astype(self.dtype)
        if self.use_bias:
            b = self.param("bias", inits.zeros, (self.features,))
            y = y + b.astype(self.dtype)
        return y


class BatchNorm(nn.Module):
    """torch-exact BatchNorm2d over NHWC (see ops.norm.batch_norm).

    ``fuse=(slope, p)`` runs normalize + LeakyReLU(slope) + dropout(p) as ONE
    Pallas pass (ops.pallas_fused.bn_act_dropout) — the pre-activation res-block's
    elementwise chain per the BASELINE north star. The dropout seed is drawn from
    the module's ``dropout`` rng stream; the mask is replayed from the seed in the
    backward kernel (never materialized).
    """

    momentum: float = 0.1
    eps: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool,
                 fuse: Optional[Tuple[float, float]] = None) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", inits.ones, (c,))
        bias = self.param("bias", inits.zeros, (c,))
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        if fuse is None:
            y, new_mean, new_var = batch_norm(
                x.astype(self.dtype), scale, bias, mean.value, var.value,
                use_running_average=not train,
                momentum=self.momentum, eps=self.eps, axis_name=self.axis_name,
            )
        else:
            from vaegan_tpu.ops.norm import batch_stats
            from vaegan_tpu.ops.pallas_fused import bn_act_dropout

            slope, p = fuse
            m, v, new_mean, new_var = batch_stats(
                x, mean.value, var.value, use_running_average=not train,
                momentum=self.momentum, axis_name=self.axis_name)
            p_eff = float(p) if train else 0.0
            if p_eff > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max,
                    dtype=jnp.int32)
            else:
                seed = jnp.zeros((), jnp.int32)
            y = bn_act_dropout(x.astype(self.dtype), m, v, scale, bias, seed,
                               float(slope), p_eff, float(self.eps))
        if train and not self.is_initializing():
            mean.value = new_mean
            var.value = new_var
        return y


class Dropout(nn.Module):
    """Inverted dropout; ``channelwise=True`` reproduces ``nn.Dropout2d``
    (drops whole feature maps — broadcast over H, W in NHWC).

    A read-only ``masks`` collection passed to ``apply`` overrides the random
    draw with a precomputed keep-mask at this module's path (parity harness:
    replay the reference's torch dropout masks through the composed step,
    tests/test_reference_parity.py)."""

    rate: float
    channelwise: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        if not train or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        if self.has_variable("masks", "mask"):
            mask = self.get_variable("masks", "mask")
        else:
            key = self.make_rng("dropout")
            shape = (x.shape[0], 1, 1, x.shape[-1]) if self.channelwise else x.shape
            mask = jax.random.bernoulli(key, keep, shape)
        return jnp.where(mask, x / jnp.asarray(keep, x.dtype), jnp.zeros((), x.dtype))


def leaky_relu(x: jax.Array, negative_slope: float) -> jax.Array:
    # strict ``x > 0``: the primal is identical either way, but the VJP routes
    # x == 0 through the slope branch, matching torch's subgradient convention
    # (torch backward: ``x > 0 ? g : g*slope``). The measure-zero point is HIT in
    # practice: a fully-dropped channel feeds BN zeros, whose output is exactly
    # the (zero-initialized) bias — found by dropout-active one-step parity.
    return jnp.where(x > 0, x, x * jnp.asarray(negative_slope, x.dtype))
