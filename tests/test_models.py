"""Structural tests: shapes and parameter counts against the verified reference
numbers (SURVEY.md §2.1, derived from /root/reference/README.md:886-961 and confirmed
by instantiating the torch modules)."""

import jax
import jax.numpy as jnp
import pytest

from vaegan_tpu.config import DiscriminatorConfig, GeneratorConfig, preset
from vaegan_tpu.models import (
    Decoder,
    Discriminator,
    Encoder,
    SpatialVAECodeProcessor,
    UnsupervisedGeneratorNetwork,
)


def count(tree):
    return sum(x.size for x in jax.tree.leaves(tree))


KEY = jax.random.key(0)
RNGS = {"params": KEY, "dropout": KEY, "noise": KEY}


def shape_init(module, x_shape, **kw):
    """Abstract-init (no FLOPs) for parameter counting."""
    return jax.eval_shape(
        lambda: module.init(RNGS, jnp.zeros(x_shape, jnp.float32), **kw)
    )


class TestParamCounts:
    def test_encoder(self):
        v = shape_init(Encoder(depth=2, length=1, feature_size=64), (2, 256, 256, 1), train=False)
        assert count(v["params"]) == 1_514_754

    def test_decoder(self):
        v = shape_init(Decoder(depth=2, length=1, in_channels=256), (2, 64, 64, 256), train=False)
        assert count(v["params"]) == 1_497_869

    def test_code_processor(self):
        v = shape_init(SpatialVAECodeProcessor(feature_depth=256), (2, 64, 64, 256), train=False)
        assert count(v["params"]) == 1_180_160

    def test_generator(self):
        v = shape_init(UnsupervisedGeneratorNetwork(cfg=GeneratorConfig()), (2, 256, 256, 1), train=False)
        assert count(v["params"]) == 4_192_783

    def test_discriminator_notebook_at_256(self):
        v = shape_init(Discriminator(cfg=preset("notebook").discriminator), (2, 256, 256, 1), train=False)
        # reference README.md:435 hardcodes 256x256; 139,697,217 params verified
        assert count(v["params"]) == 139_697_217


class TestShapes:
    def test_generator_roundtrip_96(self):
        gen = UnsupervisedGeneratorNetwork(cfg=GeneratorConfig())
        x = jnp.zeros((2, 96, 96, 1))
        v = gen.init(RNGS, x, train=False)
        recon, mu, lv = gen.apply(v, x, train=False)
        assert recon.shape == (2, 96, 96, 1)
        assert mu.shape == (2, 24, 24, 256)
        assert lv.shape == (2, 24, 24, 256)

    def test_discriminator_any_resolution(self):
        """The reference crashes at 96x96 (README.md:435 hardcode); we derive the
        flatten width from the traced shape."""
        disc = Discriminator(cfg=preset("notebook").discriminator)
        for size in (96, 64):
            x = jnp.zeros((2, size, size, 1))
            v = disc.init(RNGS, x, train=False)
            assert disc.apply(v, x, train=False).shape == (2, 1)

    def test_discriminator_features(self):
        disc = Discriminator(cfg=preset("notebook").discriminator)
        x = jnp.zeros((2, 96, 96, 1))
        v = disc.init(RNGS, x, train=False)
        logit, feats = disc.apply(v, x, train=False, return_features=True)
        assert logit.shape == (2, 1)
        assert feats.shape == (2, 24, 24, 512)  # res_out tap: 96 / (1*2*2) = 24

    def test_non_vae_mode(self):
        cfg = GeneratorConfig(is_vae=False)
        gen = UnsupervisedGeneratorNetwork(cfg=cfg)
        x = jnp.zeros((2, 32, 32, 1))
        v = gen.init(RNGS, x, train=False)
        out = gen.apply(v, x, train=False)
        assert out.shape == (2, 32, 32, 1)

    def test_encode_decode_paths(self):
        gen = UnsupervisedGeneratorNetwork(cfg=GeneratorConfig())
        x = jnp.zeros((2, 32, 32, 1))
        v = gen.init(RNGS, x, train=False)
        z = gen.apply(v, x, train=False, method=gen.encode)
        assert z.shape == (2, 8, 8, 256)
        out = gen.apply(v, z, train=False, method=gen.decode)
        assert out.shape == (2, 32, 32, 1)

    def test_encode_decode_paths_non_vae(self):
        """is_vae=False creates no code-head params (the forward skips it);
        encode must return the encoder features instead of crashing on the
        missing mu conv — serving always exports an encode entry."""
        gen = UnsupervisedGeneratorNetwork(cfg=GeneratorConfig(is_vae=False))
        x = jnp.zeros((2, 32, 32, 1))
        v = gen.init(RNGS, x, train=False)
        assert "code_processor" not in v["params"]
        z = gen.apply(v, x, train=False, method=gen.encode)
        assert z.shape == (2, 8, 8, 256)
        out = gen.apply(v, z, train=False, method=gen.decode)
        assert out.shape == (2, 32, 32, 1)


class TestSemantics:
    def test_eval_deterministic_train_stochastic(self):
        gen = UnsupervisedGeneratorNetwork(cfg=GeneratorConfig(depth=1, feature_size=8))
        x = jax.random.normal(jax.random.key(1), (2, 16, 16, 1))
        v = gen.init(RNGS, x, train=False)
        r1, _, _ = gen.apply(v, x, train=False)
        r2, _, _ = gen.apply(v, x, train=False)
        assert jnp.allclose(r1, r2)
        # train mode uses reparam noise + dropout -> different rngs differ
        kw = dict(mutable=["batch_stats", "spectral"])
        (r3, _, _), _ = gen.apply(v, x, train=True,
                                  rngs={"dropout": jax.random.key(2), "noise": jax.random.key(3)}, **kw)
        (r4, _, _), _ = gen.apply(v, x, train=True,
                                  rngs={"dropout": jax.random.key(4), "noise": jax.random.key(5)}, **kw)
        assert not jnp.allclose(r3, r4)
        # same rngs -> identical (the train step relies on this to reuse gen_imgs
        # between the D and G halves like the reference does, README.md:789/816)
        (r5, _, _), _ = gen.apply(v, x, train=True,
                                  rngs={"dropout": jax.random.key(2), "noise": jax.random.key(3)}, **kw)
        assert jnp.allclose(r3, r5)

    def test_logvar_clamp(self):
        cp = SpatialVAECodeProcessor(feature_depth=4, logvar_bound=50.0)
        x = jax.random.normal(jax.random.key(1), (1, 4, 4, 4)) * 1e6
        v = cp.init(RNGS, x, train=False)
        _, _, lv = cp.apply(v, x, train=False)
        assert jnp.all(lv <= 50.0) and jnp.all(lv >= -50.0)

    def test_batch_stats_update_in_train_only(self):
        gen = UnsupervisedGeneratorNetwork(cfg=GeneratorConfig(depth=1, feature_size=8))
        x = jax.random.normal(jax.random.key(1), (2, 16, 16, 1))
        v = gen.init(RNGS, x, train=False)
        _, new_state = gen.apply(
            v, x, train=True, rngs={"dropout": KEY, "noise": KEY},
            mutable=["batch_stats", "spectral"])
        old = jax.tree.leaves(v["batch_stats"])
        new = jax.tree.leaves(new_state["batch_stats"])
        assert any(not jnp.allclose(a, b) for a, b in zip(old, new))

    def test_spectral_norm_bounds_singular_value(self):
        from vaegan_tpu.ops.spectral_norm import _as_matrix, spectral_normalize
        k = jax.random.normal(jax.random.key(0), (3, 3, 8, 16)) * 5.0
        w = _as_matrix(k)
        u = jax.random.normal(jax.random.key(1), (w.shape[0],))
        u = u / jnp.linalg.norm(u)
        v = jax.random.normal(jax.random.key(2), (w.shape[1],))
        v = v / jnp.linalg.norm(v)
        kn = k
        for _ in range(50):
            kn, u, v = spectral_normalize(k, u, v, update=True)
        sigma = jnp.linalg.svd(_as_matrix(kn), compute_uv=False)[0]
        assert jnp.abs(sigma - 1.0) < 1e-3
