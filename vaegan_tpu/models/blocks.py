"""Residual blocks, matching the reference semantics exactly.

- ``ResBlockVAE``: reference README.md:126-197. Pre-activation (default) order is
  BN -> LeakyReLU(0.01) -> Dropout -> conv1 -> BN -> LeakyReLU -> conv2, plus an
  *always-conv* shortcut (conv + BN even in "level" mode — identity is commented out
  at README.md:149-153). Elementwise dropout p=0.5; all convs bias-free.
- ``ResBlockDiscriminator``: reference README.md:356-419. Both convs and the 1x1
  shortcut conv are spectral-normalized; channel dropout (``nn.Dropout2d``);
  LeakyReLU slope 0.2; the shortcut is identity when stride == 1 and channels match.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vaegan_tpu.models.layers import BatchNorm, Conv2D, Dropout, leaky_relu

Dtype = Any


class ResBlockVAE(nn.Module):
    out_channels: int
    mode: str = "level"                 # "level" | "upsample" | "downsample"
    res_mode: str = "pre-activation"    # | "standard"
    dropout_prob: float = 0.5
    negative_slope: float = 0.01        # torch nn.LeakyReLU default (README.md:172)
    init_scheme: str = "reference"
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None
    use_pallas: bool = False            # fuse BN+LeakyReLU+dropout into one kernel

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        kw = dict(init_scheme=self.init_scheme, dtype=self.dtype)
        bn_kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        if self.mode == "level":
            conv1 = Conv2D(self.out_channels, 3, 1, 1, name="conv1", **kw)
            sc_conv = Conv2D(self.out_channels, 3, 1, 1, name="shortcut_conv", **kw)
        elif self.mode == "upsample":
            conv1 = Conv2D(self.out_channels, 4, 2, 1, transpose=True, name="conv1", **kw)
            sc_conv = Conv2D(self.out_channels, 4, 2, 1, transpose=True, name="shortcut_conv", **kw)
        elif self.mode == "downsample":
            conv1 = Conv2D(self.out_channels, 3, 2, 1, name="conv1", **kw)
            sc_conv = Conv2D(self.out_channels, 3, 2, 1, name="shortcut_conv", **kw)
        else:
            raise ValueError(f"unknown mode {self.mode!r}")
        conv2 = Conv2D(self.out_channels, 3, 1, 1, name="conv2", **kw)
        bn1 = BatchNorm(name="bn1", **bn_kw)
        bn2 = BatchNorm(name="bn2", **bn_kw)
        sc_bn = BatchNorm(name="shortcut_bn", **bn_kw)
        dropout = Dropout(self.dropout_prob, name="dropout")

        act = lambda t: leaky_relu(t, self.negative_slope)
        shortcut = sc_bn(sc_conv(x), train=train)
        slope, p = self.negative_slope, self.dropout_prob

        if self.res_mode == "standard":
            out = conv1(x)
            if self.use_pallas:  # BN -> act -> dropout, one fused pass
                out = bn1(out, train=train, fuse=(slope, p))
            else:
                out = dropout(act(bn1(out, train=train)), train=train)
            out = conv2(out)
            out = bn2(out, train=train)
            out = out + shortcut
            out = act(out)
        elif self.res_mode == "pre-activation":
            if self.use_pallas:
                out = bn1(x, train=train, fuse=(slope, p))
                out = conv1(out)
                out = bn2(out, train=train, fuse=(slope, 0.0))
            else:
                out = dropout(act(bn1(x, train=train)), train=train)
                out = conv1(out)
                out = act(bn2(out, train=train))
            out = conv2(out)
            out = out + shortcut
        else:
            raise ValueError(f"unknown res_mode {self.res_mode!r}")
        return out


class ResBlockDiscriminator(nn.Module):
    out_channels: int
    res_stride: int = 1
    res_mode: str = "pre-activation"
    dropout_prob: float = 0.5
    negative_slope: float = 0.2         # README.md:394
    init_scheme: str = "reference"
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None
    use_pallas: bool = False            # NOTE: incompatible with the gradient
    # penalty (custom_vjp is not twice-differentiable); build_models disables it
    # for the critic under WGAN-GP configs

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        kw = dict(init_scheme=self.init_scheme, dtype=self.dtype)
        bn_kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        in_ch = x.shape[-1]
        conv1 = Conv2D(self.out_channels, 3, self.res_stride, 1, spectral=True,
                       name="conv1", **kw)
        conv2 = Conv2D(self.out_channels, 3, 1, 1, spectral=True, name="conv2", **kw)
        bn1 = BatchNorm(name="bn1", **bn_kw)
        bn2 = BatchNorm(name="bn2", **bn_kw)
        dropout = Dropout(self.dropout_prob, channelwise=True, name="dropout")

        act = lambda t: leaky_relu(t, self.negative_slope)

        # README.md:385-392 — projection shortcut only on shape change
        if self.res_stride != 1 or self.out_channels != in_ch:
            sc = Conv2D(self.out_channels, 1, self.res_stride, 0, spectral=True,
                        name="shortcut_conv", **kw)(x, train=train)
            shortcut = BatchNorm(name="shortcut_bn", **bn_kw)(sc, train=train)
        else:
            shortcut = x.astype(self.dtype)

        fuse = (self.negative_slope, 0.0) if self.use_pallas else None
        if self.res_mode == "standard":
            out = conv1(x, train=train)
            out = dropout(out, train=train)
            out = bn1(out, train=train, fuse=fuse) if fuse else act(bn1(out, train=train))
            out = conv2(out, train=train)
            out = bn2(out, train=train)
            out = out + shortcut
            out = act(out)
        elif self.res_mode == "pre-activation":
            out = bn1(x, train=train, fuse=fuse) if fuse else act(bn1(x, train=train))
            out = conv1(out, train=train)
            out = dropout(out, train=train)
            out = bn2(out, train=train, fuse=fuse) if fuse else act(bn2(out, train=train))
            out = conv2(out, train=train)
            out = out + shortcut
        else:
            raise ValueError(f"unknown res_mode {self.res_mode!r}")
        return out
