"""Fused-op semantics tests (CPU: exercises the jnp fallback, which defines the
math; the TPU kernel path is validated against the fallback on-device by the
verify drive / bench, since CPU cannot run Mosaic kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaegan_tpu.ops import pallas_fused as pf
from vaegan_tpu.ops.norm import batch_norm, batch_stats


class TestBnActDropoutFallback:
    def test_matches_unfused_p0(self):
        """p=0: fused == BN + LeakyReLU exactly."""
        x = jax.random.normal(jax.random.key(0), (4, 8, 8, 16))
        scale = jax.random.uniform(jax.random.key(1), (16,), minval=0.5, maxval=1.5)
        bias = jax.random.normal(jax.random.key(2), (16,)) * 0.1
        mean, var, _, _ = batch_stats(x, jnp.zeros(16), jnp.ones(16),
                                      use_running_average=False)
        y_fused = pf.bn_act_dropout(x, mean, var, scale, bias,
                                    jnp.zeros((), jnp.int32), 0.01, 0.0)
        y_ref, _, _ = batch_norm(x, scale, bias, jnp.zeros(16), jnp.ones(16),
                                 use_running_average=False)
        y_ref = jnp.where(y_ref >= 0, y_ref, 0.01 * y_ref)
        np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_dropout_statistics(self):
        x = jnp.ones((8, 16, 16, 32)) * 2.0
        mean = jnp.zeros(32)
        var = jnp.ones(32)
        y = pf.bn_act_dropout(x, mean, var, jnp.ones(32), jnp.zeros(32),
                              jnp.asarray(7, jnp.int32), 0.01, 0.5)
        kept = np.asarray(y) != 0
        rate = kept.mean()
        assert 0.45 < rate < 0.55          # ~half kept
        np.testing.assert_allclose(np.asarray(y)[kept], 4.0, rtol=1e-5)  # 2/(1-0.5)

    def test_grads_match_unfused_p0(self):
        """Full VJP (dx, dmean, dvar, dscale, dbias) vs autodiff of the unfused math."""
        x = jax.random.normal(jax.random.key(0), (2, 4, 4, 8))
        scale = jax.random.uniform(jax.random.key(1), (8,), minval=0.5, maxval=1.5)
        bias = jax.random.normal(jax.random.key(2), (8,)) * 0.1
        mean, var, _, _ = batch_stats(x, jnp.zeros(8), jnp.ones(8),
                                      use_running_average=False)

        def fused(x, mean, var, scale, bias):
            y = pf.bn_act_dropout(x, mean, var, scale, bias,
                                  jnp.zeros((), jnp.int32), 0.01, 0.0)
            return jnp.sum(jnp.sin(y))

        def unfused(x, mean, var, scale, bias):
            inv = jax.lax.rsqrt(var + 1e-5)
            a = (x - mean) * (inv * scale) + bias
            y = jnp.where(a >= 0, a, 0.01 * a)
            return jnp.sum(jnp.sin(y))

        g1 = jax.grad(fused, argnums=(0, 1, 2, 3, 4))(x, mean, var, scale, bias)
        g2 = jax.grad(unfused, argnums=(0, 1, 2, 3, 4))(x, mean, var, scale, bias)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    def test_grad_through_full_train_bn(self):
        """End-to-end: grads w.r.t. x through batch stats + fused op match the
        plain batch_norm+act composition (train mode, stats are functions of x)."""
        x = jax.random.normal(jax.random.key(0), (2, 4, 4, 8))
        scale = jnp.ones(8)
        bias = jnp.zeros(8)

        def fused(x):
            m, v, _, _ = batch_stats(x, jnp.zeros(8), jnp.ones(8),
                                     use_running_average=False)
            y = pf.bn_act_dropout(x, m, v, scale, bias,
                                  jnp.zeros((), jnp.int32), 0.01, 0.0)
            return jnp.sum(y ** 2)

        def unfused(x):
            y, _, _ = batch_norm(x, scale, bias, jnp.zeros(8), jnp.ones(8),
                                 use_running_average=False)
            y = jnp.where(y >= 0, y, 0.01 * y)
            return jnp.sum(y ** 2)

        np.testing.assert_allclose(np.asarray(jax.grad(fused)(x)),
                                   np.asarray(jax.grad(unfused)(x)),
                                   rtol=1e-4, atol=1e-5)


class TestReparamKlFallback:
    def test_kl_matches_losses(self):
        from vaegan_tpu import losses
        mu = jax.random.normal(jax.random.key(0), (2, 4, 4, 8))
        lv = jax.random.normal(jax.random.key(1), (2, 4, 4, 8))
        _, kl = pf.reparam_kl(mu, lv, jnp.asarray(3, jnp.int32))
        ref = losses.kl_divergence(mu, lv, "sum")
        np.testing.assert_allclose(float(kl), float(ref), rtol=1e-5)

    def test_z_statistics(self):
        mu = jnp.full((64, 8, 8, 16), 1.5)
        lv = jnp.zeros((64, 8, 8, 16))  # std 1
        z, _ = pf.reparam_kl(mu, lv, jnp.asarray(11, jnp.int32))
        assert abs(float(jnp.mean(z)) - 1.5) < 0.02
        assert abs(float(jnp.std(z)) - 1.0) < 0.02

    def test_grads(self):
        mu = jax.random.normal(jax.random.key(0), (2, 4, 4, 8))
        lv = jax.random.normal(jax.random.key(1), (2, 4, 4, 8)) * 0.1

        def f(mu, lv):
            z, kl = pf.reparam_kl(mu, lv, jnp.asarray(5, jnp.int32))
            return jnp.sum(z ** 2) + 0.1 * kl

        g_mu, g_lv = jax.grad(f, argnums=(0, 1))(mu, lv)
        assert np.isfinite(np.asarray(g_mu)).all()
        assert np.isfinite(np.asarray(g_lv)).all()
        # dkl/dmu = 0.1 * mu contribution present: check against manual for z-part
        # by re-deriving with the same fallback eps
        k = jax.random.fold_in(jax.random.key(1), 5)
        eps = jax.random.normal(k, mu.shape, jnp.float32)
        z = mu + jnp.exp(0.5 * lv) * eps
        expect_mu = 2 * z + 0.1 * mu
        np.testing.assert_allclose(np.asarray(g_mu), np.asarray(expect_mu),
                                   rtol=1e-4, atol=1e-5)


class TestReconLossFallback:
    def test_sums_and_grads_match(self):
        from vaegan_tpu import losses
        r = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
        t = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))

        def fused(r):
            s = pf.recon_loss_sums(r, t)
            return (s[0] + s[1]) / r.size

        def ref(r):
            return losses.pixel_reconstruction_loss(r, t)

        np.testing.assert_allclose(float(fused(r)), float(ref(r)), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(jax.grad(fused)(r)),
                                   np.asarray(jax.grad(ref)(r)), rtol=1e-4, atol=1e-6)


class TestFusedModelPath:
    def test_fused_block_eval_equals_unfused(self):
        """Eval mode, p inactive: use_pallas block == plain block exactly
        (fallback math on CPU; same property checked on TPU by the verify drive)."""
        from vaegan_tpu.models.blocks import ResBlockVAE
        x = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
        rngs = {"params": jax.random.key(0), "dropout": jax.random.key(2)}
        b_plain = ResBlockVAE(out_channels=6, use_pallas=False)
        b_fused = ResBlockVAE(out_channels=6, use_pallas=True)
        v = b_plain.init(rngs, x, train=False)
        y0 = b_plain.apply(v, x, train=False)
        y1 = b_fused.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-5, atol=1e-5)

    def test_fused_train_step_runs(self):
        """A full train step with use_pallas=True (fallback path on CPU) stays
        finite and updates params."""
        from vaegan_tpu.config import Config, DiscriminatorConfig, GeneratorConfig
        from vaegan_tpu.train import create_train_state, make_train_step
        base = Config()
        cfg = base.replace(
            generator=GeneratorConfig(depth=1, length=1, feature_size=8),
            discriminator=DiscriminatorConfig(
                num_stride_conv1=1, num_features_conv1=8, num_blocks=(1,),
                num_strides_res=(2,), num_features_res=(16,), pool_size=2,
                linear_widths=(16, 8, 8)),
            data=base.data.replace(image_size=16, batch_size=4),
            train=base.train.replace(use_pallas=True),
        )
        state = create_train_state(cfg, jax.random.key(0))
        step = jax.jit(make_train_step(cfg, do_g_update=True))
        batch = jax.random.uniform(jax.random.key(1), (4, 16, 16, 1))
        new_state, m = step(state, batch, jax.random.key(2))
        for k, v in m.items():
            assert np.isfinite(float(v)), k
        assert not jnp.allclose(jax.tree.leaves(new_state.g_params)[0],
                                jax.tree.leaves(state.g_params)[0])
