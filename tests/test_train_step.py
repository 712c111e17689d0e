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

    def test_ttur_lr_split(self):
        """lr_g / lr_d override the shared lr per network (TTUR); defaults
        (None) reproduce the single-lr behavior exactly."""
        cfg = tiny_config()
        base_state = create_train_state(cfg, jax.random.key(0))
        b = batch_of(cfg, jax.random.key(1))

        # defaults: lr_g=lr_d=None == shared lr (bitwise same step)
        cfg_same = cfg.replace(optim=cfg.optim.replace(lr_g=cfg.optim.lr,
                                                       lr_d=cfg.optim.lr))
        s1, _ = jax.jit(make_train_step(cfg, do_g_update=True))(
            base_state, b, jax.random.key(2))
        s2, _ = jax.jit(make_train_step(cfg_same, do_g_update=True))(
            create_train_state(cfg_same, jax.random.key(0)), b, jax.random.key(2))
        np.testing.assert_array_equal(np.asarray(jax.tree.leaves(s1.g_params)[0]),
                                      np.asarray(jax.tree.leaves(s2.g_params)[0]))

        # lr_d=tiny: critic barely moves while the generator moves normally
        cfg_split = cfg.replace(
            optim=cfg.optim.replace(lr_d=1e-12, weight_decay=0.0),
            loss=cfg.loss.replace(clip_value=None))
        s3, _ = jax.jit(make_train_step(cfg_split, do_g_update=True))(
            create_train_state(cfg_split, jax.random.key(0)), b, jax.random.key(2))
        s0 = create_train_state(cfg_split, jax.random.key(0))
        d_delta = max(float(jnp.max(jnp.abs(a - b_)))
                      for a, b_ in zip(jax.tree.leaves(s3.d_params),
                                       jax.tree.leaves(s0.d_params)))
        g_delta = max(float(jnp.max(jnp.abs(a - b_)))
                      for a, b_ in zip(jax.tree.leaves(s3.g_params),
                                       jax.tree.leaves(s0.g_params)))
        assert d_delta < 1e-8, d_delta
        assert g_delta > 1e-5, g_delta

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

    def test_weight_zero_wgan_still_runs_g_half_critic_forward(self):
        """The reference's plain-VAE run (adversarial_loss_weight=0, README.md:1283)
        still executes discriminator(gen_imgs) in the G half — the forward advances
        critic BN stats / spectral u/v and the printed adversarial loss is the real
        value, just weighted by 0 in g_loss. Only adversarial='none' skips it."""
        cfg = tiny_config(adversarial="wgan", adversarial_weight=0.0)
        state = create_train_state(cfg, jax.random.key(0))
        step = jax.jit(make_train_step(cfg, do_g_update=True))
        new_state, m = step(state, batch_of(cfg, jax.random.key(1)), jax.random.key(2))
        assert float(m["adv_loss"]) != 0.0  # real critic score, reference-print parity
        # g_loss excludes it entirely
        want = 10.0 * float(m["recon_loss"]) + 0.1 * float(m["kl"])
        np.testing.assert_allclose(float(m["g_loss"]), want, rtol=1e-5)

        # the skip path ('none') must differ in critic-state cadence: same seed,
        # the wgan@0 run does one extra critic forward -> different spectral u
        cfg_none = tiny_config(adversarial="none", adversarial_weight=0.0)
        state2 = create_train_state(cfg_none, jax.random.key(0))
        step2 = jax.jit(make_train_step(cfg_none, do_g_update=True))
        new2, m2 = step2(state2, batch_of(cfg_none, jax.random.key(1)), jax.random.key(2))
        assert float(m2["adv_loss"]) == 0.0
        u_a = jax.tree.leaves(new_state.d_spectral)[0]
        u_b = jax.tree.leaves(new2.d_spectral)[0]
        assert not np.allclose(np.asarray(u_a), np.asarray(u_b))

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


class TestGradAccum:
    """grad_accum=k: microbatch lax.scan with ONE optimizer update (SURVEY §2.3)."""

    def test_accum_equals_full_batch_on_duplicated_micros(self):
        """With the batch = concat(x, x), dropout p=0 and the reparam eps / GP
        alpha injected identically, per-microbatch BN statistics equal the
        full-batch statistics, so accumulated gradients must reproduce the
        full-batch step exactly (up to spectral power-iteration cadence — u/v are
        pre-converged by warmup steps so that residue is ~1e-5)."""
        from vaegan_tpu.train.step import make_accum_train_step

        base = tiny_config()
        cfg = base.replace(
            generator=base.generator.replace(dropout_prob=0.0),
            discriminator=base.discriminator.replace(dropout_prob=0.0))
        cfg_accum = cfg.replace(train=cfg.train.replace(grad_accum=2))

        state = create_train_state(cfg, jax.random.key(0))
        warm = jax.jit(make_train_step(cfg, do_g_update=True))
        for i in range(3):  # converge spectral u/v before the comparison
            state, _ = warm(state, batch_of(cfg, jax.random.key(5 + i)),
                            jax.random.key(20 + i))

        x = jax.random.uniform(jax.random.key(1), (2, 16, 16, 1))
        batch = jnp.concatenate([x, x])                      # micro 0 == micro 1
        fd, s = cfg.generator.feature_depth, 16 // 2 ** cfg.generator.depth
        e = jax.random.normal(jax.random.key(2), (2, s, s, fd))
        a = jax.random.uniform(jax.random.key(3), (2, 1, 1, 1))
        inject = {"eps": jnp.concatenate([e, e]), "alpha": jnp.concatenate([a, a])}

        full = jax.jit(make_train_step(cfg, do_g_update=True, inject=inject))
        accum = jax.jit(make_accum_train_step(cfg_accum, do_g_update=True,
                                              inject=inject))
        sf, mf = full(state, batch, jax.random.key(9))
        sa, ma = accum(state, batch, jax.random.key(9))

        # NOTE the two paths consume the step key differently (full: one 8-way
        # split; accum: k-way then 8-way) — irrelevant here because p=0 dropout
        # masks and injected eps/alpha remove every random draw from the math.
        for k in ("d_loss", "d_real_loss", "d_fake_loss", "gp",
                  "adv_loss", "recon_loss", "kl", "g_loss"):
            np.testing.assert_allclose(float(ma[k]), float(mf[k]), rtol=2e-3,
                                       atol=1e-5, err_msg=k)
        for name, got, want in (("g_params", sa.g_params, sf.g_params),
                                ("d_params", sa.d_params, sf.d_params)):
            for (pg, g), (_, w) in zip(
                    jax.tree_util.tree_flatten_with_path(got)[0],
                    jax.tree_util.tree_flatten_with_path(want)[0]):
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(w), rtol=5e-3, atol=1e-4,
                    err_msg=f"{name}{jax.tree_util.keystr(pg)}")

    def test_make_train_step_dispatches_on_grad_accum(self):
        cfg = tiny_config().replace(train=tiny_config().train.replace(grad_accum=2))
        state = create_train_state(cfg, jax.random.key(0))
        step = jax.jit(make_train_step(cfg, do_g_update=True))
        new_state, m = step(state, batch_of(cfg, jax.random.key(1)), jax.random.key(2))
        assert int(new_state.step) == 1
        assert all(np.isfinite(float(v)) for v in m.values())
        # critic clamp still applies after the single accumulated update
        for leaf in jax.tree.leaves(new_state.d_params):
            assert float(jnp.max(jnp.abs(leaf))) <= 0.01 + 1e-7

    def test_paper_accum_equals_full_batch_on_duplicated_micros(self):
        """Same equivalence contract for the three-optimizer Algorithm-1 step:
        duplicated microbatches + injected prior sample + p=0 dropout must
        reproduce the full-batch step's updates (single scan — all three
        optimizers update after all losses)."""
        base = tiny_config(adversarial="bce", reconstruction="dis_l",
                           lambda_gp=0.0, clip_value=None, kl_reduction="sum")
        cfg = base.replace(
            generator=base.generator.replace(dropout_prob=0.0),
            discriminator=base.discriminator.replace(dropout_prob=0.0),
            optim=base.optim.replace(scheme="three"))
        cfg_accum = cfg.replace(train=cfg.train.replace(grad_accum=2))

        state = create_train_state(cfg, jax.random.key(0))
        warm = jax.jit(make_paper_train_step(cfg))
        # converge spectral u/v well: unlike the two-opt test, the Dis_l
        # feature-matching recon loss flows THROUGH the SN critic, so the
        # per-microbatch power-iteration cadence residue shows up in recon_loss
        for i in range(8):
            state, _ = warm(state, batch_of(cfg, jax.random.key(5 + i)),
                            jax.random.key(20 + i))

        x = jax.random.uniform(jax.random.key(1), (2, 16, 16, 1))
        batch = jnp.concatenate([x, x])
        fd, s = cfg.generator.feature_depth, 16 // 2 ** cfg.generator.depth
        z = jax.random.normal(jax.random.key(2), (2, s, s, fd))
        e = jax.random.normal(jax.random.key(3), (2, s, s, fd))
        inject = {"z_p": jnp.concatenate([z, z]), "eps": jnp.concatenate([e, e])}

        full = jax.jit(make_paper_train_step(cfg, inject=inject))
        accum = jax.jit(make_paper_train_step(cfg_accum, inject=inject))
        sf, mf = full(state, batch, jax.random.key(9))
        sa, ma = accum(state, batch, jax.random.key(9))

        for k in ("d_loss", "d_real_loss", "d_fake_loss",
                  "adv_loss", "recon_loss", "kl", "g_loss"):
            np.testing.assert_allclose(float(ma[k]), float(mf[k]), rtol=2e-3,
                                       atol=1e-5, err_msg=k)
        for name, got, want in (("g_params", sa.g_params, sf.g_params),
                                ("d_params", sa.d_params, sf.d_params)):
            for (pg, g), (_, w) in zip(
                    jax.tree_util.tree_flatten_with_path(got)[0],
                    jax.tree_util.tree_flatten_with_path(want)[0]):
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(w), rtol=5e-3, atol=1e-4,
                    err_msg=f"{name}{jax.tree_util.keystr(pg)}")


class TestPaperStep:
    def test_concat_critic_batching_trains(self):
        """critic_batching='concat' folds the paper step's real/x_tilde/x_p
        scoring into ONE critic apply (a documented BN deviation; measured
        slower on TPU, kept opt-in — BENCH_NOTES). Must train finitely and
        move all four parameter groups."""
        cfg = tiny_config(adversarial="bce", reconstruction="dis_l",
                          lambda_gp=0.0, clip_value=None, kl_reduction="mean")
        cfg = cfg.replace(optim=cfg.optim.replace(scheme="three"),
                          train=cfg.train.replace(critic_batching="concat"))
        state = create_train_state(cfg, jax.random.key(0))
        step = jax.jit(make_paper_train_step(cfg))
        new_state, m = step(state, batch_of(cfg, jax.random.key(1)), jax.random.key(2))
        for k in ("d_loss", "g_loss", "recon_loss", "kl",
                  "d_real_loss", "d_fake_loss"):
            assert np.isfinite(float(m[k])), k
        for group in ("encoder", "decoder", "code_processor"):
            assert not jnp.allclose(
                jax.tree.leaves(new_state.g_params[group])[0],
                jax.tree.leaves(state.g_params[group])[0]), group
        assert not jnp.allclose(jax.tree.leaves(new_state.d_params)[0],
                                jax.tree.leaves(state.d_params)[0])

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

    def test_stop_gradient_decomposition_equals_three_explicit_grads(self):
        """Golden test of the paper step's single-backward trick: the combined
        scalar with stop-gradient placement must yield per-group gradients equal
        to three explicit value_and_grads of the Algorithm-1 losses (same rngs) —
        the trick is pure CSE, not an approximation."""
        cfg = tiny_config(adversarial="bce", reconstruction="dis_l",
                          lambda_gp=0.0, clip_value=None, kl_reduction="mean")
        cfg = cfg.replace(optim=cfg.optim.replace(scheme="three"))
        state = create_train_state(cfg, jax.random.key(0))
        step = jax.jit(make_paper_train_step(cfg, debug_grads=True))
        _, m = step(state, batch_of(cfg, jax.random.key(1)), jax.random.key(2))
        combined, explicit = m["debug_grads"]["combined"], m["debug_grads"]["explicit"]
        for name, got, want in zip(("enc", "dec", "dis"), combined, explicit):
            for (pg, g), (_, w) in zip(
                    jax.tree_util.tree_flatten_with_path(got)[0],
                    jax.tree_util.tree_flatten_with_path(want)[0]):
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(w), rtol=1e-6, atol=1e-7,
                    err_msg=f"{name}{jax.tree_util.keystr(pg)}")

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

    def test_concat3_folds_gp_into_one_apply(self):
        cfg = tiny_config()
        cfg = cfg.replace(train=cfg.train.replace(critic_batching="concat3"))
        state = create_train_state(cfg, jax.random.key(0))
        step = jax.jit(make_train_step(cfg, do_g_update=True))
        state, m = step(state, batch_of(cfg, jax.random.key(1)), jax.random.key(2))
        assert float(m["gp"]) > 0.0
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


class TestGeneratorEMA:
    """Opt-in generator-param EMA (cfg.train.ema_decay; no reference analogue)."""

    def test_off_by_default(self):
        cfg = tiny_config()
        state = create_train_state(cfg, jax.random.key(0))
        step = jax.jit(make_train_step(cfg, do_g_update=True))
        state, _ = step(state, batch_of(cfg, jax.random.key(1)), jax.random.key(2))
        assert state.g_ema is None

    def test_ema_is_exact_blend_and_freezes_on_critic_steps(self):
        d = 0.75
        cfg = tiny_config()
        cfg = cfg.replace(train=cfg.train.replace(ema_decay=d))
        state = create_train_state(cfg, jax.random.key(0))
        # at init the EMA equals the params
        for e, p in zip(jax.tree.leaves(state.g_ema), jax.tree.leaves(state.g_params)):
            np.testing.assert_array_equal(np.asarray(e), np.asarray(p))

        step_g = jax.jit(make_train_step(cfg, do_g_update=True))
        step_d = jax.jit(make_train_step(cfg, do_g_update=False))
        ema0 = state.g_ema
        s1, _ = step_g(state, batch_of(cfg, jax.random.key(1)), jax.random.key(2))
        want = jax.tree.map(lambda e, p: d * e + (1 - d) * p, ema0, s1.g_params)
        for a, b in zip(jax.tree.leaves(s1.g_ema), jax.tree.leaves(want)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
        # critic-only step: G params and the EMA both stay put
        s2, _ = step_d(s1, batch_of(cfg, jax.random.key(3)), jax.random.key(4))
        for a, b in zip(jax.tree.leaves(s2.g_ema), jax.tree.leaves(s1.g_ema)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_paper_step_tracks_ema(self):
        cfg = tiny_config()
        cfg = cfg.replace(optim=cfg.optim.replace(scheme="three"),
                          train=cfg.train.replace(ema_decay=0.5))
        state = create_train_state(cfg, jax.random.key(0))
        step = jax.jit(make_paper_train_step(cfg))
        s1, _ = step(state, batch_of(cfg, jax.random.key(1)), jax.random.key(2))
        want = jax.tree.map(lambda e, p: 0.5 * e + 0.5 * p,
                            state.g_ema, s1.g_params)
        for a, b in zip(jax.tree.leaves(s1.g_ema), jax.tree.leaves(want)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    def test_with_ema_inference_view(self):
        from vaegan_tpu import inference
        cfg = tiny_config()
        cfg = cfg.replace(train=cfg.train.replace(ema_decay=0.9))
        state = create_train_state(cfg, jax.random.key(0))
        step = jax.jit(make_train_step(cfg, do_g_update=True))
        for i in range(2):
            state, _ = step(state, batch_of(cfg, jax.random.key(i)),
                            jax.random.key(10 + i))
        batch = batch_of(cfg, jax.random.key(42))
        r_live, mse_live = inference.reconstruct(cfg, state, batch)
        r_ema, mse_ema = inference.reconstruct(cfg, inference.with_ema(state), batch)
        assert np.isfinite(float(mse_live)) and np.isfinite(float(mse_ema))
        # the EMA lags the live params after updates -> different outputs
        assert not np.allclose(np.asarray(r_live), np.asarray(r_ema))

    def test_with_ema_requires_tracking(self):
        from vaegan_tpu import inference
        cfg = tiny_config()
        state = create_train_state(cfg, jax.random.key(0))
        with pytest.raises(ValueError, match="ema"):
            inference.with_ema(state)

    def test_ema_decay_validated(self):
        cfg = tiny_config()
        with pytest.raises(ValueError, match="ema_decay"):
            cfg.replace(train=cfg.train.replace(ema_decay=1.5))


class TestLazyGP:
    """Lazy gradient-penalty schedule (cfg.train.gp_every; StyleGAN2-style
    amortization of the GP grad-of-grad — opt-in, no reference analogue)."""

    def test_no_gp_variant_skips_penalty(self):
        cfg = tiny_config()
        state = create_train_state(cfg, jax.random.key(0))
        step = jax.jit(make_train_step(cfg, do_g_update=True, do_gp=False))
        _, metrics = step(state, batch_of(cfg, jax.random.key(1)), jax.random.key(2))
        assert float(metrics["gp"]) == 0.0
        np.testing.assert_allclose(
            float(metrics["d_loss"]),
            float(metrics["d_real_loss"]) + float(metrics["d_fake_loss"]),
            rtol=1e-6)

    def test_gp_lambda_scale_is_explicit_not_config_derived(self):
        """λ·k scaling is applied by the SCHEDULER via gp_lambda_scale; a step
        built directly from a gp_every=4 config (no scale argument) trains with
        the configured λ — never a silently k-scaled one."""
        cfg1 = tiny_config()
        cfg4 = cfg1.replace(train=cfg1.train.replace(gp_every=4))
        b, k = batch_of(cfg1, jax.random.key(1)), jax.random.key(2)
        s1 = create_train_state(cfg1, jax.random.key(0))
        s4 = create_train_state(cfg4, jax.random.key(0))
        _, m1 = jax.jit(make_train_step(cfg1, do_g_update=True))(s1, b, k)
        _, m4 = jax.jit(make_train_step(cfg4, do_g_update=True))(s4, b, k)
        # default scale: gp_every in the config does NOT change the step
        np.testing.assert_allclose(float(m4["d_loss"]), float(m1["d_loss"]),
                                   rtol=1e-6)
        # the scheduled GP variant: λ scaled by the explicit factor
        s4b = create_train_state(cfg4, jax.random.key(0))
        _, m4s = jax.jit(make_train_step(cfg4, do_g_update=True,
                                         gp_lambda_scale=4.0))(s4b, b, k)
        np.testing.assert_allclose(float(m4s["gp"]), float(m1["gp"]), rtol=1e-6)
        lam = cfg1.loss.lambda_gp
        np.testing.assert_allclose(
            float(m4s["d_loss"]) - float(m1["d_loss"]),
            (4 - 1) * lam * float(m1["gp"]), rtol=1e-4)

    def test_make_step_variants_includes_no_gp_iff_lazy(self):
        from vaegan_tpu.train.step import make_step_variants
        calls = []
        builder = lambda do_g, do_gp, scale: calls.append((do_g, do_gp, scale)) or "s"
        cfg = tiny_config()
        assert set(make_step_variants(cfg, builder)) == {(True, True), (False, True)}
        assert all(s == 1.0 for _, _, s in calls)
        calls.clear()
        cfg4 = cfg.replace(train=cfg.train.replace(gp_every=4))
        v = make_step_variants(cfg4, builder)
        assert set(v) == {(True, True), (False, True), (True, False), (False, False)}
        assert all(s == 4.0 for _, _, s in calls)

    def test_rng_alignment_across_variants(self):
        """The off-step consumes the same split width: everything except the
        GP term is bitwise identical between do_gp variants."""
        cfg = tiny_config()
        state = create_train_state(cfg, jax.random.key(0))
        b, k = batch_of(cfg, jax.random.key(1)), jax.random.key(2)
        _, m_on = jax.jit(make_train_step(cfg, do_g_update=True))(state, b, k)
        state2 = create_train_state(cfg, jax.random.key(0))
        _, m_off = jax.jit(make_train_step(cfg, do_g_update=True, do_gp=False))(
            state2, b, k)
        for key in ("d_real_loss", "d_fake_loss"):
            np.testing.assert_allclose(float(m_off[key]), float(m_on[key]),
                                       rtol=1e-6, err_msg=key)

    def test_accum_variant_supports_do_gp(self):
        cfg = tiny_config()
        cfg = cfg.replace(train=cfg.train.replace(grad_accum=2, gp_every=2))
        state = create_train_state(cfg, jax.random.key(0))
        step = jax.jit(make_train_step(cfg, do_g_update=True, do_gp=False))
        _, metrics = step(state, batch_of(cfg, jax.random.key(1)), jax.random.key(2))
        assert float(metrics["gp"]) == 0.0

    def test_loop_schedules_gp_every(self, tmp_path):
        """train() runs the GP variant exactly on steps where
        global_step % gp_every == 0."""
        from vaegan_tpu.train.loop import train
        base = tiny_config()
        cfg = base.replace(
            data=base.data.replace(synthetic=True, synthetic_size=8),
            train=base.train.replace(
                n_epochs=2, gp_every=2, sample_interval=0,
                sample_dir=str(tmp_path / "s")))
        _, logger = train(cfg)
        gps = [m["gp"] for m in logger.history if "gp" in m]
        assert len(gps) == 4
        assert gps[1] == 0.0 and gps[3] == 0.0   # off-steps
        assert gps[0] != 0.0 and gps[2] != 0.0   # GP steps

    def test_gp_every_validated(self):
        cfg = tiny_config()
        with pytest.raises(ValueError, match="gp_every"):
            cfg.replace(train=cfg.train.replace(gp_every=0))


class TestRemat:
    """``train.remat`` (jax.checkpoint over the residual blocks) is a pure
    memory/time trade — it must not change the math beyond float
    reassociation (recomputed regions re-fuse, so reductions can associate
    differently; measured ulp-level drift ~1e-7 relative). This is the knob
    the 256² DP validation leans on (tools/run_256dp_virtual_mesh.py:
    without it 8 concurrent GP-step activation sets exceed host RAM), so
    its equivalence is load-bearing evidence, not a nicety."""

    def _run_one(self, remat: bool, make=make_train_step, **loss_kw):
        cfg = tiny_config(**loss_kw)
        if make is make_paper_train_step:
            cfg = cfg.replace(optim=cfg.optim.replace(scheme="three"))
        cfg = cfg.replace(train=cfg.train.replace(remat=remat))
        state = create_train_state(cfg, jax.random.key(0))
        kw = {} if make is make_paper_train_step else {"do_g_update": True}
        step = jax.jit(make(cfg, **kw))
        new_state, metrics = step(
            state, batch_of(cfg, jax.random.key(1)), jax.random.key(2))
        return new_state, metrics

    def _assert_identical(self, a, b):
        (sa, ma), (sb, mb) = a, b
        for k in ma:
            np.testing.assert_allclose(float(ma[k]), float(mb[k]),
                                       rtol=1e-5, atol=1e-7, err_msg=k)
        for name, ta, tb in (("g_params", sa.g_params, sb.g_params),
                             ("d_params", sa.d_params, sb.d_params),
                             ("g_stats", sa.g_stats, sb.g_stats)):
            for la, lb in zip(jax.tree.leaves(ta), jax.tree.leaves(tb)):
                np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                           rtol=1e-4, atol=1e-6, err_msg=name)

    def test_wgan_gp_step_equivalent_under_remat(self):
        # the hard case: grad-of-grad (GP) through rematted critic blocks,
        # dropout RNG replayed inside the checkpointed regions
        self._assert_identical(self._run_one(False), self._run_one(True))

    def test_paper_step_equivalent_under_remat(self):
        kw = dict(adversarial="bce", reconstruction="dis_l",
                  lambda_gp=0.0, clip_value=None, kl_reduction="mean")
        self._assert_identical(
            self._run_one(False, make=make_paper_train_step, **kw),
            self._run_one(True, make=make_paper_train_step, **kw))
