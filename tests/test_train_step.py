"""Train-step behavior tests on a tiny config (16x16, feature_size 8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaegan_tpu.config import Config, DiscriminatorConfig, GeneratorConfig, preset
from vaegan_tpu.train import create_train_state, make_paper_train_step, make_train_step


def tiny_config(**loss_kw) -> Config:
    base = Config()
    return base.replace(
        generator=GeneratorConfig(depth=1, length=1, feature_size=8),
        discriminator=DiscriminatorConfig(
            num_stride_conv1=1, num_features_conv1=8,
            num_blocks=(1,), num_strides_res=(2,), num_features_res=(16,),
            pool_size=2, linear_widths=(16, 8, 8)),
        data=base.data.replace(image_size=16, batch_size=4),
        loss=base.loss.replace(**loss_kw),
    )


def batch_of(cfg, key):
    return jax.random.uniform(
        key, (cfg.data.batch_size, cfg.data.image_size, cfg.data.image_size, 1))


class TestTwoOptStep:
    def test_step_updates_and_metrics(self):
        cfg = tiny_config()
        state = create_train_state(cfg, jax.random.key(0))
        step = jax.jit(make_train_step(cfg, do_g_update=True))
        batch = batch_of(cfg, jax.random.key(1))
        new_state, metrics = step(state, batch, jax.random.key(2))

        assert int(new_state.step) == 1
        for k in ("d_loss", "g_loss", "recon_loss", "kl", "d_real_loss",
                  "d_fake_loss", "adv_loss", "gp"):
            assert k in metrics and np.isfinite(float(metrics[k])), k
        # both nets actually moved
        assert not jnp.allclose(
            jax.tree.leaves(new_state.g_params)[0], jax.tree.leaves(state.g_params)[0])
        assert not jnp.allclose(
            jax.tree.leaves(new_state.d_params)[0], jax.tree.leaves(state.d_params)[0])

    def test_weight_clip(self):
        cfg = tiny_config()
        state = create_train_state(cfg, jax.random.key(0))
        step = jax.jit(make_train_step(cfg, do_g_update=True))
        new_state, _ = step(state, batch_of(cfg, jax.random.key(1)), jax.random.key(2))
        # every critic param clamped to ±0.01 (reference README.md:805-806)
        for leaf in jax.tree.leaves(new_state.d_params):
            assert float(jnp.max(jnp.abs(leaf))) <= 0.01 + 1e-7

    def test_critic_only_step_keeps_stale_g_metrics(self):
        cfg = tiny_config()
        state = create_train_state(cfg, jax.random.key(0))
        step_g = jax.jit(make_train_step(cfg, do_g_update=True))
        step_d = jax.jit(make_train_step(cfg, do_g_update=False))
        b = batch_of(cfg, jax.random.key(1))
        state, m1 = step_g(state, b, jax.random.key(2))
        g_before = state.g_params
        state, m2 = step_d(state, b, jax.random.key(3))
        # G untouched; stale metrics repeated (reference README.md:837 closure quirk)
        assert jnp.allclose(jax.tree.leaves(g_before)[0], jax.tree.leaves(state.g_params)[0])
        assert float(m2["g_loss"]) == float(m1["g_loss"])
        assert float(m2["d_loss"]) != float(m1["d_loss"])

    def test_vae_only_config_trains_without_adv(self):
        """BASELINE config 1: adversarial weight 0 — D still trains (README.md:1283)."""
        cfg = tiny_config(adversarial="none", adversarial_weight=0.0)
        state = create_train_state(cfg, jax.random.key(0))
        step = jax.jit(make_train_step(cfg, do_g_update=True))
        b = batch_of(cfg, jax.random.key(1))
        losses_seen = []
        for i in range(8):
            state, m = step(state, b, jax.random.key(10 + i))
            losses_seen.append(float(m["recon_loss"]))
        assert all(np.isfinite(losses_seen))
        # overfit smoke: recon on the fixed batch should drop
        assert losses_seen[-1] < losses_seen[0]

    def test_bce_gan_only_config(self):
        """BASELINE config 2: DCGAN-style BCE adversarial training."""
        cfg = tiny_config(adversarial="bce", reconstruction_weight=0.0,
                          kl_weight=0.0, lambda_gp=0.0, clip_value=None)
        state = create_train_state(cfg, jax.random.key(0))
        step = jax.jit(make_train_step(cfg, do_g_update=True))
        state, m = step(state, batch_of(cfg, jax.random.key(1)), jax.random.key(2))
        assert np.isfinite(float(m["d_loss"]))
        assert float(m["gp"]) == 0.0
        # no clip: some |param| should exceed 0.01
        assert any(float(jnp.max(jnp.abs(l))) > 0.01 for l in jax.tree.leaves(state.d_params))

    def test_determinism(self):
        cfg = tiny_config()
        state = create_train_state(cfg, jax.random.key(0))
        step = jax.jit(make_train_step(cfg, do_g_update=True))
        b = batch_of(cfg, jax.random.key(1))
        s1, m1 = step(state, b, jax.random.key(2))
        s2, m2 = step(state, b, jax.random.key(2))
        assert float(m1["g_loss"]) == float(m2["g_loss"])
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(s1.g_params)[0]),
            np.asarray(jax.tree.leaves(s2.g_params)[0]))


class TestPaperStep:
    def test_three_optimizer_step(self):
        cfg = tiny_config(adversarial="bce", reconstruction="dis_l",
                          lambda_gp=0.0, clip_value=None, kl_reduction="mean")
        cfg = cfg.replace(optim=cfg.optim.replace(scheme="three"))
        state = create_train_state(cfg, jax.random.key(0))
        step = jax.jit(make_paper_train_step(cfg))
        b = batch_of(cfg, jax.random.key(1))
        new_state, m = step(state, b, jax.random.key(2))
        for k in ("d_loss", "g_loss", "recon_loss", "kl"):
            assert np.isfinite(float(m[k])), k
        # all three groups moved
        for group in ("encoder", "decoder", "code_processor"):
            assert not jnp.allclose(
                jax.tree.leaves(new_state.g_params[group])[0],
                jax.tree.leaves(state.g_params[group])[0]), group
        assert not jnp.allclose(
            jax.tree.leaves(new_state.d_params)[0], jax.tree.leaves(state.d_params)[0])

    def test_dis_l_recon_decreases_on_fixed_batch(self):
        cfg = tiny_config(adversarial="bce", reconstruction="dis_l",
                          lambda_gp=0.0, clip_value=None, kl_reduction="mean",
                          kl_weight=0.01)
        cfg = cfg.replace(optim=cfg.optim.replace(scheme="three"))
        state = create_train_state(cfg, jax.random.key(0))
        step = jax.jit(make_paper_train_step(cfg))
        b = batch_of(cfg, jax.random.key(1))
        vals = []
        for i in range(6):
            state, m = step(state, b, jax.random.key(5 + i))
            vals.append(float(m["recon_loss"]))
        assert all(np.isfinite(vals))


class TestCriticBatching:
    def test_concat_mode_runs_and_default_is_separate(self):
        from vaegan_tpu.config import Config
        assert Config().train.critic_batching == "separate"  # reference semantics
        cfg = tiny_config()
        cfg = cfg.replace(train=cfg.train.replace(critic_batching="concat"))
        state = create_train_state(cfg, jax.random.key(0))
        step = jax.jit(make_train_step(cfg, do_g_update=True))
        state, m = step(state, batch_of(cfg, jax.random.key(1)), jax.random.key(2))
        for k, v in m.items():
            assert np.isfinite(float(v)), k


class TestPlainAutoencoderMode:
    def test_is_vae_false_trains(self):
        """is_vae=False (reference README.md:643-653): plain AE + GAN; KL term
        is identically zero and the step still trains both nets."""
        cfg = tiny_config()
        cfg = cfg.replace(generator=cfg.generator.replace(is_vae=False))
        state = create_train_state(cfg, jax.random.key(0))
        step = jax.jit(make_train_step(cfg, do_g_update=True))
        new_state, m = step(state, batch_of(cfg, jax.random.key(1)), jax.random.key(2))
        assert float(m["kl"]) == 0.0
        for k, v in m.items():
            assert np.isfinite(float(v)), k
        assert not jnp.allclose(jax.tree.leaves(new_state.g_params)[0],
                                jax.tree.leaves(state.g_params)[0])
