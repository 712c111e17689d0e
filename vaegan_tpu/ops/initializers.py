"""Weight initializers reproducing the reference's (quirky) init scheme.

``init_weights`` (reference README.md:700-707) applies kaiming-normal to
``nn.Conv2d``/``nn.Linear`` weights and zeroes biases; BatchNorm gets weight 1 /
bias 0. Two documented quirks are reproduced under ``scheme="reference"``
(SURVEY.md §2.1-C10):

- ``isinstance(module, nn.Conv2d)`` does not match ``ConvTranspose2d``, so upsample
  kernels keep torch's *default* conv init (kaiming-uniform with a=sqrt(5), whose
  fan-in for ConvTranspose2d is computed on the (in, out, kh, kw) weight as
  ``out_channels * kh * kw``);
- spectral-norm-wrapped convs have their *computed* weight re-initialized but the
  underlying ``weight_orig`` untouched, so the kaiming init is voided at the first
  forward — their effective init is also torch's default kaiming-uniform.

``scheme="clean"`` applies kaiming-normal everywhere (the sane choice for production).

All initializers take/produce HWIO kernels (KH, KW, I, O) or (in, out) linears.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def _conv_fan_in(shape: Sequence[int]) -> int:
    kh, kw, i, _ = shape
    return kh * kw * i


def kaiming_normal(key, shape, dtype=jnp.float32):
    """torch ``kaiming_normal_`` defaults: fan_in mode, leaky_relu gain sqrt(2)."""
    if len(shape) == 4:
        fan_in = _conv_fan_in(shape)
    elif len(shape) == 2:
        fan_in = shape[0]  # (in, out) linear
    else:
        raise ValueError(shape)
    std = math.sqrt(2.0) / math.sqrt(fan_in)
    return std * jax.random.normal(key, shape, dtype)


def torch_default_conv(key, shape, dtype=jnp.float32):
    """torch's Conv2d default init: kaiming_uniform_(a=sqrt(5)) => U(-b, b) with
    b = 1/sqrt(fan_in), fan_in = in_channels * kh * kw."""
    bound = 1.0 / math.sqrt(_conv_fan_in(shape))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_default_conv_transpose(key, shape, dtype=jnp.float32):
    """torch's ConvTranspose2d default init. torch stores the weight as
    (in, out, kh, kw) and ``_calculate_fan_in_and_fan_out`` reads fan_in from
    dim 1 * receptive field = out_channels * kh * kw."""
    kh, kw, _, o = shape
    bound = 1.0 / math.sqrt(o * kh * kw)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_default_linear(key, shape, dtype=jnp.float32):
    """torch's Linear default weight init: U(-b, b), b = 1/sqrt(in_features)."""
    bound = 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def conv_init(scheme: str, *, transpose: bool = False, spectral: bool = False):
    """Initializer for a conv kernel under the given scheme."""
    if scheme == "clean":
        return kaiming_normal
    if scheme == "reference":
        if transpose:
            return torch_default_conv_transpose
        if spectral:
            return torch_default_conv
        return kaiming_normal
    raise ValueError(f"unknown init scheme {scheme!r}")


def linear_init(scheme: str):
    # 'clean' and 'reference' coincide for Linear: the reference's
    # init_weights hits every nn.Linear with kaiming (README.md:700-707).
    # Still validate so a typo'd scheme fails here too, not only at the
    # first Conv2D (a linear-only path would otherwise silently accept it).
    if scheme not in ("clean", "reference"):
        raise ValueError(f"unknown init scheme {scheme!r}")
    return kaiming_normal


zeros = jax.nn.initializers.zeros
ones = jax.nn.initializers.ones
