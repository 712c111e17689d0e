"""Encoder / Decoder / code processor / generator / critic.

Faithful to the reference's composition:
- ``Encoder``: README.md:204-249 — ``length`` level blocks at depth 0, then per depth
  one downsample block doubling channels + (length-1) level blocks.
- ``Decoder``: README.md:252-294 — mirror with upsample blocks halving channels and a
  final level block to ``reconstruction_channels``; NO output activation (the
  reconstruction is unbounded — a documented reference property).
- ``SpatialVAECodeProcessor``: README.md:522-597 — fully-convolutional mu / log_var
  heads, log-var clamped to ±50, reparameterization in train mode.
- ``UnsupervisedGeneratorNetwork``: README.md:600-668.
- ``Discriminator``: README.md:422-498 — first conv+BN+LeakyReLU(0.2), configurable
  residual stages, avg-pool 4, then 4 linear layers to a single logit (no sigmoid:
  WGAN critic). The reference hardcodes 256x256 input (README.md:435); here the
  flatten width is derived from the traced shape, so any resolution works.
  ``return_features`` exposes the Dis_l feature tap for the Larsen et al.
  feature-matching reconstruction loss.

Module names mirror the torch ``OrderedDict`` keys (e.g. ``encoder-depth_1-downsample``)
so torch checkpoints map 1:1 (see vaegan_tpu.interop).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vaegan_tpu.config import DiscriminatorConfig, GeneratorConfig
from vaegan_tpu.models.blocks import ResBlockDiscriminator, ResBlockVAE
from vaegan_tpu.models.layers import BatchNorm, Conv2D, Linear, leaky_relu
from vaegan_tpu.ops.conv import avg_pool

Dtype = Any


def _block_runner(remat: bool, train: bool):
    """Run a residual block, optionally under jax.checkpoint (remat): recompute the
    block's activations in the backward pass instead of storing them — the step is
    HBM-bandwidth-bound on TPU, so trading FLOPs for bytes wins (SURVEY.md §7)."""
    def run(blk, x):
        return blk(x, train=train)
    return nn.remat(run) if remat else run


class Encoder(nn.Module):
    depth: int
    length: int
    feature_size: int
    res_mode: str = "pre-activation"
    dropout_prob: float = 0.5
    init_scheme: str = "reference"
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None
    remat: bool = False
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        kw = dict(res_mode=self.res_mode, dropout_prob=self.dropout_prob,
                  init_scheme=self.init_scheme, dtype=self.dtype, axis_name=self.axis_name,
                  use_pallas=self.use_pallas)
        run = _block_runner(self.remat, train)
        feature_size = self.feature_size
        for i in range(self.length):
            x = run(ResBlockVAE(feature_size, mode="level",
                                name=f"encoder-depth_0-level_{i}", **kw), x)
        for d in range(1, self.depth + 1):
            feature_size *= 2
            x = run(ResBlockVAE(feature_size, mode="downsample",
                                name=f"encoder-depth_{d}-downsample", **kw), x)
            for item in range(self.length - 1):
                x = run(ResBlockVAE(feature_size, mode="level",
                                    name=f"encoder-depth_{d}-level_{item}", **kw), x)
        return x


class Decoder(nn.Module):
    depth: int
    length: int
    in_channels: int            # = feature_depth (latent channels)
    reconstruction_channels: int = 1
    res_mode: str = "pre-activation"
    dropout_prob: float = 0.5
    init_scheme: str = "reference"
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None
    remat: bool = False
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        kw = dict(res_mode=self.res_mode, dropout_prob=self.dropout_prob,
                  init_scheme=self.init_scheme, dtype=self.dtype, axis_name=self.axis_name,
                  use_pallas=self.use_pallas)
        run = _block_runner(self.remat, train)
        feature_size = self.in_channels // 2
        for d in range(self.depth, 0, -1):
            x = run(ResBlockVAE(feature_size, mode="upsample",
                                name=f"decoder-depth_{d}-upsample", **kw), x)
            for item in range(self.length - 1):
                x = run(ResBlockVAE(feature_size, mode="level",
                                    name=f"decoder-depth_{d}-level_{item}", **kw), x)
            feature_size //= 2
        x = run(ResBlockVAE(self.reconstruction_channels, mode="level",
                            name="decoder-depth_0-reconstruction", **kw), x)
        return x


class SpatialVAECodeProcessor(nn.Module):
    feature_depth: int
    logvar_bound: float = 50.0
    init_scheme: str = "reference"
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    def setup(self):
        kw = dict(use_bias=True, init_scheme=self.init_scheme, dtype=self.dtype)
        self.mu = Conv2D(self.feature_depth, 3, 1, 1, name="mu", **kw)
        self.log_var = Conv2D(self.feature_depth, 3, 1, 1, name="log_var", **kw)

    def __call__(self, x: jax.Array, *, train: bool,
                 eps: Optional[jax.Array] = None) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """``eps`` overrides the reparameterization noise (torch-parity harness:
        inject torch-generated randn_like noise for image-for-image fidelity)."""
        log_var = jnp.clip(self.log_var(x), -self.logvar_bound, self.logvar_bound)
        mu = self.mu(x)
        if train:
            if eps is None and self.use_pallas:
                from vaegan_tpu.ops.pallas_fused import reparam_kl

                seed = jax.random.randint(self.make_rng("noise"), (), 0,
                                          jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
                # in-kernel eps generation is the win here; the fused KL sum
                # rides along for free (the loss recomputes KL with the
                # configured reduction from mu/log_var, so the extra output's
                # cotangent is zero — a no-op in the backward kernel)
                z, _ = reparam_kl(mu, log_var, seed)
            else:
                if eps is None:
                    eps = jax.random.normal(self.make_rng("noise"), mu.shape, mu.dtype)
                z = mu + jnp.exp(jnp.asarray(0.5, log_var.dtype) * log_var) * eps.astype(mu.dtype)
        else:
            z = mu
        return z, mu, log_var

    def encode(self, x: jax.Array) -> jax.Array:
        return self.mu(x)

    def decode(self, x: jax.Array) -> jax.Array:
        return x


class UnsupervisedGeneratorNetwork(nn.Module):
    """encoder -> code processor -> decoder (reference README.md:600-668)."""

    cfg: GeneratorConfig
    init_scheme: str = "reference"
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None
    remat: bool = False
    use_pallas: bool = False       # fuse res-block BN+act+dropout chains
    fuse_reparam: bool = False     # fuse reparameterization (+KL ride-along)

    def setup(self):
        c = self.cfg
        kw = dict(res_mode=c.res_mode, dropout_prob=c.dropout_prob,
                  init_scheme=self.init_scheme, dtype=self.dtype, axis_name=self.axis_name,
                  remat=self.remat, use_pallas=self.use_pallas)
        self.encoder = Encoder(depth=c.depth, length=c.length,
                               feature_size=c.feature_size, name="encoder", **kw)
        self.decoder = Decoder(depth=c.depth, length=c.length,
                               in_channels=c.feature_depth,
                               reconstruction_channels=c.in_channels, name="decoder", **kw)
        self.code_processor = SpatialVAECodeProcessor(
            feature_depth=c.feature_depth, logvar_bound=c.logvar_bound,
            init_scheme=self.init_scheme, dtype=self.dtype,
            use_pallas=self.use_pallas or self.fuse_reparam, name="code_processor")

    def __call__(self, x: jax.Array, *, train: bool, eps: Optional[jax.Array] = None):
        h = self.encoder(x, train=train)
        if self.cfg.is_vae:
            z, mu, log_var = self.code_processor(h, train=train, eps=eps)
            recon = self.decoder(z, train=train)
            return recon, mu, log_var
        recon = self.decoder(h, train=train)
        return recon

    def encode(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        h = self.encoder(x, train=train)
        if not self.cfg.is_vae:
            # non-VAE: __call__ never touches the code head, so its params are
            # never created (and would be untrained noise if they were) — the
            # encoder features ARE the code. The reference's own is_vae=False
            # forward is unusable anyway (README.md:646 binds the processor's
            # 3-tuple into the decoder), so there is no behavior to mirror.
            return h
        return self.code_processor.encode(h)

    def decode(self, z: jax.Array, *, train: bool = False) -> jax.Array:
        return self.decoder(self.code_processor.decode(z), train=train)


class Discriminator(nn.Module):
    cfg: DiscriminatorConfig
    init_scheme: str = "reference"
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None
    remat: bool = False
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool, return_features: bool = False):
        c = self.cfg
        run = _block_runner(self.remat, train)
        act = lambda t: leaky_relu(t, 0.2)
        out = Conv2D(c.num_features_conv1, 3, c.num_stride_conv1, 1,
                     init_scheme=self.init_scheme, dtype=self.dtype, name="conv1")(x)
        bn1 = BatchNorm(name="bn1", axis_name=self.axis_name, dtype=self.dtype)
        if self.use_pallas:
            out = bn1(out, train=train, fuse=(0.2, 0.0))
        else:
            out = act(bn1(out, train=train))

        # residual stages (reference _make_layer, README.md:488-498)
        for i, (planes, blocks, stride) in enumerate(
                zip(c.num_features_res, c.num_blocks, c.num_strides_res)):
            out = run(ResBlockDiscriminator(
                planes, res_stride=stride, res_mode=c.res_mode,
                dropout_prob=c.dropout_prob, init_scheme=self.init_scheme,
                dtype=self.dtype, axis_name=self.axis_name, use_pallas=self.use_pallas,
                name=f"res_layers_{i}_0"), out)
            for b in range(1, blocks):
                out = run(ResBlockDiscriminator(
                    planes, res_stride=1, res_mode=c.res_mode,
                    dropout_prob=c.dropout_prob, init_scheme=self.init_scheme,
                    dtype=self.dtype, axis_name=self.axis_name, use_pallas=self.use_pallas,
                    name=f"res_layers_{i}_{b}"), out)

        features = {"res_out": out}
        out = avg_pool(out, c.pool_size)
        features["pool"] = out
        out = out.reshape(out.shape[0], -1)

        for j, width in enumerate(c.linear_widths):
            out = Linear(width, init_scheme=self.init_scheme, dtype=self.dtype,
                         name=f"linear_{j + 1}")(out)
            out = act(out)
            if j == 0:
                features["fc1"] = out
        logit = Linear(1, init_scheme=self.init_scheme, dtype=self.dtype,
                       name=f"linear_{len(c.linear_widths) + 1}")(out)
        if return_features:
            return logit, features[c.feature_tap]
        return logit
