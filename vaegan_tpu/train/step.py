"""Jitted train steps.

``make_train_step`` reproduces the reference's per-batch procedure
(README.md:775-834) as one pure function, with the reference's exact event order:

D half (every step):
  1. one generator forward (train mode) producing gen_imgs             README.md:789
  2. critic on real, on detached fakes, gradient penalty on the
     interpolates (each forward updates BN stats + spectral u/v,
     exactly like torch train-mode forwards)                           README.md:792-798
  3. RMSprop update + clamp of ALL critic params to ±clip_value
     (the reference clamps on top of GP — a quirk, kept as default)    README.md:802-806

G half (every ``n_critics``-th step — a *static* choice, so each variant jits to a
lean graph with no dead branches):
  4. the SAME gen_imgs (same dropout/reparam keys -> bitwise-identical
     recompute, differentiable w.r.t. G) scored by the UPDATED critic  README.md:812-816
  5. g_loss = w_adv * adv + w_rec * (L1+MSE) + w_kl * KL(sum)          README.md:818-831

On critic-only steps the returned G metrics are the previous step's (the reference
prints stale closure values, README.md:837).

``make_paper_train_step`` is the Larsen et al. Algorithm-1 three-optimizer step
(BASELINE config 3), which the notebook never implements: BCE GAN loss over
{real, reconstruction, prior sample}, Dis_l feature-matching reconstruction, and
per-network (enc / dec / dis) gradients of their respective losses.

No per-step host sync anywhere: metrics stay on-device; the loop decides when to
fetch (the reference's seven ``.item()`` calls per batch were its throughput killer,
SURVEY.md §3.2).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from vaegan_tpu import losses
from vaegan_tpu.config import Config, pallas_mode
from vaegan_tpu.train.optim import build_optimizer
from vaegan_tpu.train.state import TrainState, build_models

Metrics = Dict[str, jax.Array]

# RNG split widths of each step variant. Threefry subkeys depend on the TOTAL
# split width, so anything replaying a step's generator keys (make_sampler) must
# split with exactly the same width.
TWO_OPT_RNG_KEYS = 8
PAPER_RNG_KEYS = 7


def _clip_params(params, clip):
    return jax.tree.map(lambda p: jnp.clip(p, -clip, clip), params)


def _ema_update(cfg: Config, g_ema, new_g_params):
    """Refresh the generator-param EMA after a G-optimizer update (no-op when
    ``cfg.train.ema_decay`` is unset; ``g_ema`` is then the empty None node)."""
    d = cfg.train.ema_decay
    if d is None or g_ema is None:
        return g_ema
    return jax.tree.map(lambda e, p: d * e + (1.0 - d) * p, g_ema, new_g_params)


def _gen_forward_fn(cfg, gen):
    """Generator train-mode forward returning ((recon, mu, log_var), new_stats);
    non-VAE configs get zero mu/log_var so the KL is identically 0
    (README.md:643-653)."""

    def gen_forward(g_params, g_stats, batch, rngs, eps, masks=None):
        variables = {"params": g_params, "batch_stats": g_stats}
        if masks is not None:  # parity harness: replay torch dropout masks
            variables["masks"] = masks
        out, mut = gen.apply(
            variables, batch, train=True, rngs=rngs, mutable=["batch_stats"], eps=eps)
        if cfg.generator.is_vae:
            r, m, lv = out
        else:
            r = out
            m = lv = jnp.zeros((r.shape[0], 1), r.dtype)
        return (r, m, lv), mut["batch_stats"]

    return gen_forward


def lazy_gp_enabled(cfg: Config) -> bool:
    """Whether ``cfg.train.gp_every > 1`` actually engages the lazy-GP
    schedule: only the two-optimizer WGAN step with an active penalty has a
    GP term to amortize. The single source of truth for the loop and the
    parallel step builder — they must agree or the loop's (do_g, do_gp) step
    lookup KeyErrors mid-run."""
    return (cfg.train.gp_every > 1 and cfg.optim.scheme != "three"
            and cfg.loss.adversarial == "wgan" and cfg.loss.lambda_gp > 0.0)


def make_step_variants(cfg: Config, builder) -> dict:
    """Assemble the ``(do_g_update, do_gp) -> step`` dict the train loop
    schedules. ``builder(do_g_update, do_gp, gp_lambda_scale)`` compiles one
    variant; the no-GP variants (and the λ·gp_every scaling on GP steps) are
    included exactly when :func:`lazy_gp_enabled` — keeping the loop and the
    parallel builder structurally in agreement instead of by convention."""
    lazy = lazy_gp_enabled(cfg)
    scale = float(cfg.train.gp_every) if lazy else 1.0
    variants = {(True, True): builder(True, True, scale),
                (False, True): builder(False, True, scale)}
    if lazy:
        variants[(True, False)] = builder(True, False, scale)
        variants[(False, False)] = builder(False, False, scale)
    return variants


def _critic_loss(cfg, disc, d_params, d_stats, d_spec, batch, gen_imgs_sg,
                 keys, alpha_inject, mask_trees=(None, None, None),
                 do_gp=True, gp_lambda_scale=1.0):
    """D-half loss body (README.md:792-798): critic on real, on detached fakes,
    gradient penalty on the interpolates; every forward threads BN stats +
    spectral u/v like torch train-mode forwards.

    ``keys`` = (k_real, k_fake, k_interp, k_alpha); ``mask_trees`` = optional
    injected dropout-mask collections for the (real, fake, interp) forwards
    (parity harness; "separate" batching only). ``do_gp=False`` is the lazy-
    regularization off-step (cfg.train.gp_every > 1): the penalty term and its
    grad-of-grad are skipped entirely; ``gp_lambda_scale`` (λ·gp_every on GP
    steps, applied by the SCHEDULER, not derived from cfg — a step built
    directly always defaults to the faithful λ) keeps the time-averaged
    pressure of the skipping schedule equal to every-step GP (StyleGAN2 lazy
    regularization)."""
    lcfg = cfg.loss
    use_gp = do_gp and lcfg.adversarial == "wgan" and lcfg.lambda_gp > 0.0
    lam_gp = lcfg.lambda_gp * gp_lambda_scale
    k_dreal, k_dfake, k_dinterp, k_alpha = keys
    m_real, m_fake, m_interp = mask_trees
    dstate = {"batch_stats": d_stats, "spectral": d_spec}

    def d_apply(x, st, k, m=None):
        v = {"params": d_params, **st}
        if m is not None:
            v["masks"] = m
        logits, mut = disc.apply(
            v, x, train=True,
            rngs={"dropout": k}, mutable=["batch_stats", "spectral"])
        return logits, {"batch_stats": mut["batch_stats"], "spectral": mut["spectral"]}

    if cfg.train.critic_batching == "concat3" and use_gp:
        # 3-in-1: score real/fake AND run the GP interpolate forward in ONE
        # critic apply over concat(real, fake, interp) — one big batch instead
        # of three small ones (fewer, larger kernels). Extends the "concat"
        # mode's documented BN deviation: batch statistics mix all three
        # sub-batches, and the inner GP gradient flows through the shared
        # statistics. Opt-in for throughput; the reference semantics stay
        # "separate".
        b = batch.shape[0]
        if alpha_inject is None:
            alpha = jax.random.uniform(k_alpha, (b, 1, 1, 1), jnp.float32)
        else:
            alpha = jnp.asarray(alpha_inject, jnp.float32).reshape(b, 1, 1, 1)
        interp = (alpha * batch.astype(jnp.float32)
                  + (1.0 - alpha) * gen_imgs_sg.astype(jnp.float32)).astype(batch.dtype)

        def scalar3(xi):
            all3, st = d_apply(
                jnp.concatenate(
                    [batch, gen_imgs_sg.astype(batch.dtype), xi], axis=0),
                dstate, k_dreal)
            return jnp.sum(all3[2 * b:].astype(jnp.float32)), (all3, st)

        gi, (all3, st) = jax.grad(scalar3, has_aux=True)(interp)
        real_logits, fake_logits = all3[:b], all3[b:2 * b]
        g2 = gi.reshape(b, -1).astype(jnp.float32)
        norms = jnp.sqrt(jnp.sum(jnp.square(g2), axis=1) + 1e-24)
        gp = jnp.mean(jnp.square(norms - 1.0))
        # use_gp implies adversarial == "wgan"; bce configs take the concat-2 path
        real_loss, fake_loss = losses.wgan_critic_loss(real_logits, fake_logits)
        d_loss = real_loss + fake_loss + lam_gp * gp
        return d_loss, (st, real_loss, fake_loss, gp)

    if cfg.train.critic_batching in ("concat", "concat3"):
        b = batch.shape[0]
        both, st = d_apply(
            jnp.concatenate([batch, gen_imgs_sg.astype(batch.dtype)], axis=0),
            dstate, k_dreal)
        real_logits, fake_logits = both[:b], both[b:]
    else:
        real_logits, st = d_apply(batch, dstate, k_dreal, m_real)
        fake_logits, st = d_apply(gen_imgs_sg, st, k_dfake, m_fake)

    if lcfg.adversarial == "bce":
        real_loss = losses.bce_with_logits(real_logits, 1.0)
        fake_loss = losses.bce_with_logits(fake_logits, 0.0)
    else:  # wgan (also covers "none": D still trains, unused by G — README.md:1283)
        real_loss, fake_loss = losses.wgan_critic_loss(real_logits, fake_logits)

    if use_gp:
        gp, st = losses.gradient_penalty(
            lambda x, st=st: d_apply(x, st, k_dinterp, m_interp),
            batch, gen_imgs_sg, k_alpha, alpha=alpha_inject)
    else:
        gp = jnp.zeros((), jnp.float32)
    d_loss = real_loss + fake_loss + lam_gp * gp
    return d_loss, (st, real_loss, fake_loss, gp)


def _gen_losses(cfg, disc, d_params, d_stats, d_spec, batch, g_imgs, mu2, lv2,
                k_dgen, k_dfeat, kl_scale=1.0, d_masks=None):
    """G-half loss body (README.md:812-831). The reference executes
    discriminator(gen_imgs) even at adversarial weight 0 (its plain-VAE run,
    README.md:816 + 1283) — the forward still advances critic BN stats and
    spectral u/v; only our own adversarial="none" mode skips it (documented
    deviation). ``kl_scale`` rescales the KL term so gradient accumulation's
    mean-over-microbatches reproduces the full-batch sum-reduced KL."""
    lcfg = cfg.loss
    _pallas_losses = pallas_mode(cfg.train.use_pallas) in ("losses", "all")
    want_feats = lcfg.reconstruction == "dis_l"
    no_adv = lcfg.adversarial == "none"
    if no_adv and not want_feats:
        adv = jnp.zeros((), jnp.float32)
        d_mut2 = {"batch_stats": d_stats, "spectral": d_spec}
    else:
        v = {"params": d_params, "batch_stats": d_stats, "spectral": d_spec}
        if d_masks is not None:  # parity harness: replay torch dropout masks
            v["masks"] = d_masks
        out, mut = disc.apply(
            v, g_imgs, train=True, rngs={"dropout": k_dgen},
            mutable=["batch_stats", "spectral"],
            return_features=want_feats)
        logits, feats = out if want_feats else (out, None)
        d_mut2 = {"batch_stats": mut["batch_stats"], "spectral": mut["spectral"]}
        if no_adv:
            adv = jnp.zeros((), jnp.float32)
        elif lcfg.adversarial == "bce":
            adv = losses.bce_with_logits(logits, 1.0)
        else:
            adv = losses.wgan_generator_loss(logits)
    if want_feats:
        (_, real_feats), mut_r = disc.apply(
            {"params": d_params, **d_mut2}, batch, train=True,
            rngs={"dropout": k_dfeat}, mutable=["batch_stats", "spectral"],
            return_features=True)
        # thread this train-mode forward's BN/spectral updates like every other
        # critic forward in the step
        d_mut2 = {"batch_stats": mut_r["batch_stats"],
                  "spectral": mut_r["spectral"]}
        recon = losses.feature_matching_loss(
            jax.lax.stop_gradient(real_feats), feats)
    elif _pallas_losses:
        from vaegan_tpu.ops.pallas_fused import recon_loss_sums
        sums = recon_loss_sums(g_imgs, batch)
        recon = (sums[0] + sums[1]) / g_imgs.size
    else:
        recon = losses.pixel_reconstruction_loss(g_imgs, batch)
    kl = losses.kl_divergence(mu2, lv2, lcfg.kl_reduction)
    g_loss = (lcfg.adversarial_weight * adv
              + lcfg.reconstruction_weight * recon
              + lcfg.kl_weight * kl_scale * kl)
    return g_loss, (d_mut2, adv, recon, kl)


def make_train_step(cfg: Config, do_g_update: bool, axis_name=None,
                    inject: Dict[str, jax.Array] = None,
                    do_gp: bool = True, gp_lambda_scale: float = 1.0) -> Callable:
    """Two-optimizer step (the notebook's scheme). Returns
    ``step(state, batch, key) -> (state, metrics)``; wrap in jit/pjit yourself or use
    vaegan_tpu.parallel.make_parallel_step.

    ``inject`` (parity harness only) overrides the step's random draws with
    externally supplied tensors: ``{"eps": NHWC reparam noise, "alpha": (B,1,1,1)
    GP mixing factors}`` plus optional dropout-mask collections ``g_masks`` (the
    generator forward) and ``d_masks_real`` / ``d_masks_fake`` / ``d_masks_interp``
    / ``d_masks_gen`` (the four critic forwards, in the reference's event order) —
    used to replay the reference's torch/numpy draws so one step is comparable
    number-for-number at the trained dropout p=0.5 (tests/test_reference_parity.py;
    build the collections with interop.reference_dropout_masks_to_collection).

    ``do_gp`` (static, like ``do_g_update``): False compiles the lazy-
    regularization off-step — no GP term, no grad-of-grad (cfg.train.gp_every;
    the loop schedules which variant runs each step). RNG split width is
    unchanged, so samplers/replays stay key-aligned across variants.

    ``gp_lambda_scale``: multiplier on ``loss.lambda_gp``, default 1.0 (the
    faithful coefficient). The SCHEDULER that actually skips GP steps passes
    ``cfg.train.gp_every`` here (λ·k lazy regularization) — it is deliberately
    NOT derived from cfg, so a step built directly and run every step trains
    with the configured λ, never a silently k-scaled one. Use
    :func:`make_step_variants` to assemble the scheduled variants.
    """
    if cfg.train.grad_accum > 1:
        return make_accum_train_step(cfg, do_g_update, axis_name, inject,
                                     do_gp, gp_lambda_scale)
    inject = inject or {}
    mask_keys = [k for k in inject if k.endswith("masks")]
    if mask_keys and pallas_mode(cfg.train.use_pallas) == "all":
        # block fusion routes BN+act+dropout through the Pallas kernel, which
        # draws its own PRNG mask and never consults the Dropout module's
        # injected 'masks' collection — a parity replay would silently compare
        # against different dropout
        raise ValueError(
            f"dropout-mask injection ({mask_keys}) is incompatible with "
            f"use_pallas='all' (the fused block kernel bypasses the Dropout "
            f"modules); use use_pallas='losses' or 'off' for parity replays")
    gen, disc = build_models(cfg, axis_name)
    tx_g = build_optimizer(cfg.optim, "g")
    tx_d = build_optimizer(cfg.optim, "d")
    lcfg = cfg.loss
    gen_forward = _gen_forward_fn(cfg, gen)

    def step(state: TrainState, batch: jax.Array, key: jax.Array) -> Tuple[TrainState, Metrics]:
        if axis_name is not None:
            # shard_map/pmap path: per-replica RNG so dropout masks / noise differ
            # across the per-shard batches (under GSPMD the global-shape RNG is
            # already correct and axis_name is None)
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        (k_gdrop, k_gnoise, k_dreal, k_dfake, k_dinterp, k_alpha, k_dgen,
         k_dfeat) = jax.random.split(key, TWO_OPT_RNG_KEYS)
        g_rngs = {"dropout": k_gdrop, "noise": k_gnoise}

        # ---- generator forward, ONCE (README.md:789) -------------------------
        # Captured through jax.vjp so the G half can pull gradients back through
        # this same forward without recomputing it (the reference reuses the same
        # tensor with its autograd graph intact; this is the JAX equivalent).
        def fwd(g_params):
            return gen_forward(g_params, state.g_stats, batch, g_rngs,
                               inject.get("eps"), inject.get("g_masks"))

        if do_g_update:
            (gen_imgs, mu, log_var), gen_vjp, new_g_stats = jax.vjp(
                fwd, state.g_params, has_aux=True)
        else:
            (gen_imgs, mu, log_var), new_g_stats = fwd(state.g_params)
        gen_imgs_sg = jax.lax.stop_gradient(gen_imgs)

        # ---- discriminator half ---------------------------------------------
        def d_loss_fn(d_params):
            return _critic_loss(
                cfg, disc, d_params, state.d_stats, state.d_spectral, batch,
                gen_imgs_sg, (k_dreal, k_dfake, k_dinterp, k_alpha),
                inject.get("alpha"),
                (inject.get("d_masks_real"), inject.get("d_masks_fake"),
                 inject.get("d_masks_interp")), do_gp, gp_lambda_scale)

        (d_loss, (d_st, real_loss, fake_loss, gp)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        if axis_name is not None:
            d_grads = jax.lax.pmean(d_grads, axis_name)
        d_updates, new_opt_d = tx_d.update(d_grads, state.opt_d, state.d_params)
        new_d_params = optax.apply_updates(state.d_params, d_updates)
        if lcfg.clip_value is not None:
            new_d_params = _clip_params(new_d_params, lcfg.clip_value)  # README.md:805

        new_d_stats, new_d_spectral = d_st["batch_stats"], d_st["spectral"]
        new_g_params, new_opt_g, g_metrics = state.g_params, state.opt_g, state.g_metrics

        # ---- generator half (README.md:812-834) ------------------------------
        if do_g_update:
            def g_loss_fn(gen_outputs):
                # differentiated w.r.t. the generator OUTPUTS; the cotangents are
                # then pulled back through the stored gen_vjp — one generator
                # forward per step total
                g_imgs, mu2, lv2 = gen_outputs
                return _gen_losses(
                    cfg, disc, new_d_params, new_d_stats, new_d_spectral, batch,
                    g_imgs, mu2, lv2, k_dgen, k_dfeat,
                    d_masks=inject.get("d_masks_gen"))

            (g_loss, (d_mut2, adv, recon, kl)), out_cts = jax.value_and_grad(
                g_loss_fn, has_aux=True)((gen_imgs, mu, log_var))
            (g_grads,) = gen_vjp(out_cts)
            if axis_name is not None:
                g_grads = jax.lax.pmean(g_grads, axis_name)
            g_updates, new_opt_g = tx_g.update(g_grads, state.opt_g, state.g_params)
            new_g_params = optax.apply_updates(state.g_params, g_updates)
            new_d_stats, new_d_spectral = d_mut2["batch_stats"], d_mut2["spectral"]
            g_metrics = {"g_loss": g_loss, "adv_loss": adv, "recon_loss": recon, "kl": kl}

        metrics = {
            "d_loss": d_loss, "d_real_loss": real_loss, "d_fake_loss": fake_loss,
            "gp": gp, **g_metrics,
        }
        new_state = state.replace(
            step=state.step + 1,
            g_params=new_g_params, d_params=new_d_params,
            g_stats=new_g_stats, d_stats=new_d_stats, d_spectral=new_d_spectral,
            opt_g=new_opt_g, opt_d=new_opt_d, g_metrics=g_metrics,
            g_ema=(_ema_update(cfg, state.g_ema, new_g_params)
                   if do_g_update else state.g_ema),
        )
        return new_state, metrics

    return step


def make_accum_train_step(cfg: Config, do_g_update: bool, axis_name=None,
                          inject: Dict[str, jax.Array] = None,
                          do_gp: bool = True,
                          gp_lambda_scale: float = 1.0) -> Callable:
    """Gradient-accumulation variant of the two-optimizer step (SURVEY.md §2.3:
    "trivial under ``jax.lax.scan``" — the reference has no such capability).

    The global batch is split into ``cfg.train.grad_accum`` microbatches and
    scanned twice:

    - pass 1 accumulates critic gradients (critic params FIXED at their pre-step
      values across all microbatches, exactly like ``loss.backward()`` accumulation
      in torch), threading BN stats + spectral u/v through the microbatch forwards;
      then ONE optimizer update + clamp;
    - pass 2 recomputes each microbatch's generator forward bitwise-identically
      (same per-microbatch rng keys; train-mode BN normalizes by batch statistics,
      so the recompute does not depend on the threaded running stats) and
      accumulates generator gradients against the UPDATED critic (the reference's
      event order, README.md:812-816); then ONE generator update.

    Equivalence contract: with the same total batch, the accumulated gradients
    equal the full-batch step's up to (a) BN batch statistics computed per
    microbatch instead of per full batch, and (b) one spectral power iteration per
    microbatch forward instead of per full-batch forward. Mean-reduced loss terms
    accumulate by averaging; the reference's batch-SUMMED KL (README.md:822-825)
    is rescaled by ``grad_accum`` inside the microbatch loss so the average
    reproduces the full-batch sum. Cost: one extra generator forward per
    microbatch (the full-batch step's vjp-reuse trick cannot cross a scan carry).
    """
    inject = inject or {}
    k = int(cfg.train.grad_accum)
    gen, disc = build_models(cfg, axis_name)
    tx_g = build_optimizer(cfg.optim, "g")
    tx_d = build_optimizer(cfg.optim, "d")
    lcfg = cfg.loss
    gen_forward = _gen_forward_fn(cfg, gen)
    kl_scale = float(k) if lcfg.kl_reduction == "sum" else 1.0

    def step(state: TrainState, batch: jax.Array, key: jax.Array) -> Tuple[TrainState, Metrics]:
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        B = batch.shape[0]
        if B % k:
            raise ValueError(f"batch size {B} not divisible by grad_accum {k}")
        m = B // k
        xs = {"batch": batch.reshape(k, m, *batch.shape[1:]),
              "key": jax.random.split(key, k)}
        if "eps" in inject:
            e = inject["eps"]
            xs["eps"] = e.reshape(k, m, *e.shape[1:])
        if "alpha" in inject:
            a = inject["alpha"]
            xs["alpha"] = a.reshape(k, m, *a.shape[1:])

        zeros_d = jax.tree.map(jnp.zeros_like, state.d_params)
        zero = jnp.zeros((), jnp.float32)

        # ---- pass 1: critic gradients accumulated over microbatches ----------
        def d_micro(carry, x):
            g_stats, d_stats, d_spec, gsum, msum = carry
            ks = jax.random.split(x["key"], TWO_OPT_RNG_KEYS)
            (gen_imgs, _, _), g_stats = gen_forward(
                state.g_params, g_stats, x["batch"],
                {"dropout": ks[0], "noise": ks[1]}, x.get("eps"))
            gen_sg = jax.lax.stop_gradient(gen_imgs)

            def d_loss_fn(d_params):
                return _critic_loss(cfg, disc, d_params, d_stats, d_spec,
                                    x["batch"], gen_sg, (ks[2], ks[3], ks[4], ks[5]),
                                    x.get("alpha"), do_gp=do_gp,
                                    gp_lambda_scale=gp_lambda_scale)

            (d_loss, (st, rl, fl, gp)), grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.d_params)
            gsum = jax.tree.map(jnp.add, gsum, grads)
            msum = {"d_loss": msum["d_loss"] + d_loss,
                    "d_real_loss": msum["d_real_loss"] + rl,
                    "d_fake_loss": msum["d_fake_loss"] + fl,
                    "gp": msum["gp"] + gp}
            return (g_stats, st["batch_stats"], st["spectral"], gsum, msum), None

        init = (state.g_stats, state.d_stats, state.d_spectral, zeros_d,
                {"d_loss": zero, "d_real_loss": zero, "d_fake_loss": zero, "gp": zero})
        (new_g_stats, d_stats1, d_spec1, d_gsum, d_msum), _ = jax.lax.scan(
            d_micro, init, xs)
        d_grads = jax.tree.map(lambda g: g / k, d_gsum)
        if axis_name is not None:
            d_grads = jax.lax.pmean(d_grads, axis_name)
        d_updates, new_opt_d = tx_d.update(d_grads, state.opt_d, state.d_params)
        new_d_params = optax.apply_updates(state.d_params, d_updates)
        if lcfg.clip_value is not None:
            new_d_params = _clip_params(new_d_params, lcfg.clip_value)  # README.md:805

        d_metrics = {kk: v / k for kk, v in d_msum.items()}
        new_d_stats, new_d_spectral = d_stats1, d_spec1
        new_g_params, new_opt_g, g_metrics = state.g_params, state.opt_g, state.g_metrics

        # ---- pass 2: generator gradients against the updated critic ----------
        if do_g_update:
            zeros_g = jax.tree.map(jnp.zeros_like, state.g_params)

            def g_micro(carry, x):
                d_stats, d_spec, gsum, msum = carry
                ks = jax.random.split(x["key"], TWO_OPT_RNG_KEYS)

                def g_loss_fn(g_params):
                    # recompute (bitwise-identical: same keys; train-mode BN output
                    # does not depend on the running-stat collection)
                    (g_imgs, mu2, lv2), _ = gen_forward(
                        g_params, state.g_stats, x["batch"],
                        {"dropout": ks[0], "noise": ks[1]}, x.get("eps"))
                    return _gen_losses(cfg, disc, new_d_params, d_stats, d_spec,
                                       x["batch"], g_imgs, mu2, lv2, ks[6], ks[7],
                                       kl_scale=kl_scale)

                (gl, (d_mut2, adv, recon, kl)), grads = jax.value_and_grad(
                    g_loss_fn, has_aux=True)(state.g_params)
                gsum = jax.tree.map(jnp.add, gsum, grads)
                msum = {"adv_loss": msum["adv_loss"] + adv,
                        "recon_loss": msum["recon_loss"] + recon,
                        "kl": msum["kl"] + kl}
                return (d_mut2["batch_stats"], d_mut2["spectral"], gsum, msum), None

            ginit = (new_d_stats, new_d_spectral, zeros_g,
                     {"adv_loss": zero, "recon_loss": zero, "kl": zero})
            (new_d_stats, new_d_spectral, g_gsum, g_msum), _ = jax.lax.scan(
                g_micro, ginit, xs)
            g_grads = jax.tree.map(lambda g: g / k, g_gsum)
            if axis_name is not None:
                g_grads = jax.lax.pmean(g_grads, axis_name)
            g_updates, new_opt_g = tx_g.update(g_grads, state.opt_g, state.g_params)
            new_g_params = optax.apply_updates(state.g_params, g_updates)
            adv = g_msum["adv_loss"] / k
            recon = g_msum["recon_loss"] / k
            # sum-reduced KL: the full-batch value is the SUM over microbatches
            kl = g_msum["kl"] if lcfg.kl_reduction == "sum" else g_msum["kl"] / k
            g_metrics = {
                "g_loss": (lcfg.adversarial_weight * adv
                           + lcfg.reconstruction_weight * recon
                           + lcfg.kl_weight * kl),
                "adv_loss": adv, "recon_loss": recon, "kl": kl,
            }

        metrics = {**d_metrics, **g_metrics}
        new_state = state.replace(
            step=state.step + 1,
            g_params=new_g_params, d_params=new_d_params,
            g_stats=new_g_stats, d_stats=new_d_stats, d_spectral=new_d_spectral,
            opt_g=new_opt_g, opt_d=new_opt_d, g_metrics=g_metrics,
            g_ema=(_ema_update(cfg, state.g_ema, new_g_params)
                   if do_g_update else state.g_ema),
        )
        return new_state, metrics

    return step


def make_paper_train_step(cfg: Config, axis_name=None,
                          debug_grads: bool = False,
                          inject: Dict[str, jax.Array] = None) -> Callable:
    """Larsen et al. Algorithm 1 (three optimizers, BASELINE config 3).

    L_prior  = KL(q(z|x) || N(0, I))                 (mean-per-sample reduction)
    L_llike  = MSE in the critic's Dis_l feature space between x and x~
    L_GAN    = BCE[D(x), 1] + BCE[D(x~), 0] + BCE[D(x_p), 0],  x_p = Dec(z_p~N(0,I))

    theta_Enc <- grad (L_prior + L_llike)
    theta_Dec <- grad (gamma * L_llike - L_GAN)
    theta_Dis <- grad (L_GAN)

    Implemented as ONE backward of a combined scalar whose per-group terms see the
    other groups through stop_gradient — primal-identical forwards CSE to a single
    forward, and each group receives exactly its own loss's gradient.
    """
    if not cfg.generator.is_vae:
        raise ValueError("the Larsen Algorithm-1 step requires a VAE code "
                         "distribution (generator.is_vae=True); use "
                         "make_train_step for plain-AE configurations")
    inject = inject or {}
    gen, disc = build_models(cfg, axis_name)
    tx_g = build_optimizer(cfg.optim, "g")   # enc + dec (TTUR split optional)
    tx_d = build_optimizer(cfg.optim, "d")
    lcfg, gamma = cfg.loss, cfg.optim.gamma
    k_accum = int(cfg.train.grad_accum)
    if debug_grads and k_accum > 1:
        raise ValueError("debug_grads is a k=1 test hook; combine it with "
                         "grad_accum=1")
    sg = jax.lax.stop_gradient

    def split_g(params):
        enc = {k: params[k] for k in ("encoder", "code_processor")}
        dec = {k: params[k] for k in ("decoder",)}
        return enc, dec

    def merge_g(enc, dec):
        return {**enc, **dec}

    def make_forward(batch, keys, g_stats0, d_stats0, d_spec0, z_p_inject=None,
                     eps_inject=None):
        """Algorithm-1 forward over one (micro)batch, parametrized by the BN/SN
        state it threads from (the plain step passes the TrainState's; the
        accumulation scan passes its carry). ``z_p_inject`` / ``eps_inject``
        (test hooks) replace the prior-sample / reparameterization draws."""
        (k_gdrop, k_gnoise, k_prior, k_pdrop, k_dr, k_df, k_dp) = keys
        g_rngs = {"dropout": k_gdrop, "noise": k_gnoise}

        def forward(enc_p, dec_p, d_p):
            g_params = merge_g(enc_p, dec_p)
            (x_tilde, mu, lv), g_mut = gen.apply(
                {"params": g_params, "batch_stats": g_stats0},
                batch, train=True, rngs=g_rngs, mutable=["batch_stats"],
                eps=eps_inject)
            z_p = (jax.random.normal(k_prior, mu.shape, mu.dtype)
                   if z_p_inject is None else z_p_inject.astype(mu.dtype))
            # the prior-sample decode is a train-mode forward: thread its BN
            # stat updates after the x_tilde forward's (torch-parity cadence)
            # dedicated dropout key: Algorithm 1 treats x_tilde and x_p as
            # independent fakes — reusing g_rngs would give both decodes
            # identical dropout masks
            x_p, p_mut = gen.apply(
                {"params": g_params, "batch_stats": g_mut["batch_stats"]},
                z_p, train=True, rngs={"dropout": k_pdrop}, mutable=["batch_stats"],
                method=gen.decode)
            g_stats_out = p_mut["batch_stats"]

            dstate = {"batch_stats": d_stats0, "spectral": d_spec0}

            def d_apply(x, st, k):
                (logits, feats), mut = disc.apply(
                    {"params": d_p, **st}, x, train=True, rngs={"dropout": k},
                    mutable=["batch_stats", "spectral"], return_features=True)
                return logits, feats, {"batch_stats": mut["batch_stats"],
                                       "spectral": mut["spectral"]}

            if cfg.train.critic_batching in ("concat", "concat3"):
                # one critic apply over concat(real, x_tilde, x_p): 3x fewer,
                # 3x larger critic kernels. No GP here, so none of the concat3
                # double-backprop widening the two-optimizer step measured
                # (BENCH_NOTES); BN statistics mix the three sub-batches — the
                # same documented deviation as the two-optimizer "concat" mode.
                b = batch.shape[0]
                all3, feats3, st = d_apply(
                    jnp.concatenate([batch, x_tilde.astype(batch.dtype),
                                     x_p.astype(batch.dtype)], axis=0),
                    dstate, k_dr)
                lr_, lt_, lp_ = all3[:b], all3[b:2 * b], all3[2 * b:]
                fr_, ft_ = feats3[:b], feats3[b:2 * b]
            else:
                # Dis_l pair masks: the notebook critic carries Dropout2d
                # p=0.5 (reference README.md:394) that Larsen's discriminator
                # does not have. With INDEPENDENT masks on the real and
                # x_tilde forwards, the feature-matching MSE acquires an
                # irreducible stochastic floor E||2(m_r - m_f) f(x)||^2 ~
                # 2 E[f^2] that buries the reconstruction signal at batch 4
                # (measured: dis_l plateaus 1.2-2.8 while eval pixel MSE sits
                # 60x above the mean-predictor floor — result/paper_probes).
                # "shared" evaluates the pair under ONE dropout draw (the
                # standard feature-matching treatment of a stochastic feature
                # extractor); the GAN-loss statistics are unchanged in
                # expectation, and x_p keeps its own draw.
                shared = lcfg.dis_l_shared_dropout
                lr_, fr_, st = d_apply(batch, dstate, k_dr)
                lt_, ft_, st = d_apply(x_tilde, st, k_dr if shared else k_df)
                lp_, _, st = d_apply(x_p, st, k_dp)

            l_prior = losses.kl_divergence(mu, lv, lcfg.kl_reduction)
            l_llike = losses.feature_matching_loss(fr_, ft_)
            bce_real = losses.bce_with_logits(lr_, 1.0)
            bce_fake = losses.bce_with_logits(lt_, 0.0) + losses.bce_with_logits(lp_, 0.0)
            l_gan = bce_real + bce_fake
            aux = (g_stats_out, st, l_prior, l_llike, l_gan, bce_real, bce_fake)
            return l_prior, l_llike, l_gan, aux

        return forward

    def make_combined(forward, kl_scale=1.0):
        # One combined scalar realizing all three per-group losses via
        # stop-gradient placement: each forward call is primal-identical (same
        # rng keys), so XLA CSEs them to a single forward; each term's backward
        # only flows into its live (non-stop-gradient) parameter group. Exactly
        # equivalent to three separate value_and_grads of the Algorithm-1
        # losses, at ~1/3 the forward cost.
        def combined(enc_p, dec_p, d_p):
            l_prior_e, l_llike_e, _, aux = forward(enc_p, sg(dec_p), sg(d_p))
            _, l_llike_d, l_gan_d, _ = forward(sg(enc_p), dec_p, sg(d_p))
            _, _, l_gan_i, _ = forward(sg(enc_p), sg(dec_p), d_p)
            enc_l = (lcfg.kl_weight * kl_scale * l_prior_e
                     + lcfg.reconstruction_weight * l_llike_e)
            dec_l = (gamma * lcfg.reconstruction_weight * l_llike_d
                     - lcfg.adversarial_weight * l_gan_d)
            dis_l = lcfg.adversarial_weight * l_gan_i
            return enc_l + dec_l + dis_l, (aux, enc_l, dec_l, dis_l)

        return combined

    if k_accum > 1:
        return _make_paper_accum_step(
            cfg, axis_name, (tx_g, tx_d), lcfg, split_g, merge_g, make_forward,
            make_combined, _clip_params, inject)

    def step(state: TrainState, batch: jax.Array, key: jax.Array) -> Tuple[TrainState, Metrics]:
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        keys = jax.random.split(key, PAPER_RNG_KEYS)
        enc0, dec0 = split_g(state.g_params)
        forward = make_forward(batch, keys, state.g_stats, state.d_stats,
                               state.d_spectral, z_p_inject=inject.get("z_p"),
                               eps_inject=inject.get("eps"))
        combined = make_combined(forward)

        (_, (aux, enc_l, dec_l, dis_l)), (enc_g, dec_g, dis_g) = jax.value_and_grad(
            combined, argnums=(0, 1, 2), has_aux=True)(enc0, dec0, state.d_params)
        if axis_name is not None:
            enc_g, dec_g, dis_g = jax.lax.pmean((enc_g, dec_g, dis_g), axis_name)

        debug = {}
        if debug_grads:
            # test-only: the honest three-backward decomposition of Algorithm 1,
            # for golden-testing the stop-gradient/CSE trick above (each explicit
            # grad differentiates the SAME forward fn with the same rng keys)
            def enc_loss(e):
                lp, ll, _, _ = forward(e, dec0, state.d_params)
                return lcfg.kl_weight * lp + lcfg.reconstruction_weight * ll

            def dec_loss(d):
                _, ll, lg, _ = forward(enc0, d, state.d_params)
                return (gamma * lcfg.reconstruction_weight * ll
                        - lcfg.adversarial_weight * lg)

            def dis_loss(p):
                _, _, lg, _ = forward(enc0, dec0, p)
                return lcfg.adversarial_weight * lg

            debug["debug_grads"] = {
                "combined": (enc_g, dec_g, dis_g),
                "explicit": (jax.grad(enc_loss)(enc0), jax.grad(dec_loss)(dec0),
                             jax.grad(dis_loss)(state.d_params)),
            }

        new_g_stats, d_st, l_prior, l_llike, l_gan, bce_real, bce_fake = aux
        enc_up, opt_enc = tx_g.update(enc_g, state.opt_g["enc"], enc0)
        dec_up, opt_dec = tx_g.update(dec_g, state.opt_g["dec"], dec0)
        dis_up, opt_d = tx_d.update(dis_g, state.opt_d, state.d_params)
        new_enc = optax.apply_updates(enc0, enc_up)
        new_dec = optax.apply_updates(dec0, dec_up)
        new_d = optax.apply_updates(state.d_params, dis_up)
        # the ±clip is the notebook's WGAN device (README.md:805); Algorithm 1 has
        # no weight clamp — applying the DEFAULT clip_value=0.01 to a BCE critic
        # would silently cripple it. Clamp only for explicit WGAN configurations.
        if lcfg.clip_value is not None and lcfg.adversarial == "wgan":
            new_d = _clip_params(new_d, lcfg.clip_value)

        g_metrics = {"g_loss": enc_l + dec_l, "adv_loss": l_gan,
                     "recon_loss": l_llike, "kl": l_prior}
        metrics = {"d_loss": dis_l, "d_real_loss": bce_real, "d_fake_loss": bce_fake,
                   "gp": jnp.zeros((), jnp.float32), **g_metrics, **debug}
        new_g_params = merge_g(new_enc, new_dec)
        new_state = state.replace(
            step=state.step + 1,
            g_params=new_g_params, d_params=new_d,
            g_stats=new_g_stats,
            d_stats=d_st["batch_stats"], d_spectral=d_st["spectral"],
            opt_g={"enc": opt_enc, "dec": opt_dec}, opt_d=opt_d,
            g_metrics=g_metrics,
            g_ema=_ema_update(cfg, state.g_ema, new_g_params),
        )
        return new_state, metrics

    return step


def _make_paper_accum_step(cfg, axis_name, txs, lcfg, split_g, merge_g,
                           make_forward, make_combined, clip_params,
                           inject=None):
    """Gradient-accumulation variant of the Algorithm-1 step. Unlike the
    two-optimizer step (whose critic updates BETWEEN the D and G halves), all
    three optimizers here update after all losses, so accumulation is a single
    ``lax.scan``: per microbatch one combined backward (the same stop-gradient
    CSE trick), grads summed per group, ONE update per optimizer. BN batch
    statistics are per-microbatch and spectral u/v advance once per microbatch
    forward (same caveats as make_accum_train_step). A sum-reduced KL is
    rescaled by ``grad_accum`` inside the microbatch loss so the averaged
    gradients reproduce the full-batch sum."""
    inject = inject or {}
    tx_g, tx_d = txs
    k = int(cfg.train.grad_accum)
    kl_scale = float(k) if lcfg.kl_reduction == "sum" else 1.0

    def step(state: TrainState, batch: jax.Array, key: jax.Array) -> Tuple[TrainState, Metrics]:
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        B = batch.shape[0]
        if B % k:
            raise ValueError(f"batch size {B} not divisible by grad_accum {k}")
        m = B // k
        xs = {"batch": batch.reshape(k, m, *batch.shape[1:]),
              "key": jax.random.split(key, k)}
        if "z_p" in inject:
            z = inject["z_p"]
            xs["z_p"] = z.reshape(k, m, *z.shape[1:])
        if "eps" in inject:
            e = inject["eps"]
            xs["eps"] = e.reshape(k, m, *e.shape[1:])
        enc0, dec0 = split_g(state.g_params)
        zero = jnp.zeros((), jnp.float32)
        zsum = lambda tree: jax.tree.map(jnp.zeros_like, tree)

        def micro(carry, x):
            g_stats, d_stats, d_spec, eg_s, dg_s, ig_s, msum = carry
            keys = jax.random.split(x["key"], PAPER_RNG_KEYS)
            forward = make_forward(x["batch"], keys, g_stats, d_stats, d_spec,
                                   z_p_inject=x.get("z_p"),
                                   eps_inject=x.get("eps"))
            combined = make_combined(forward, kl_scale=kl_scale)
            (_, (aux, enc_l, dec_l, dis_l)), (eg, dg, ig) = jax.value_and_grad(
                combined, argnums=(0, 1, 2), has_aux=True)(
                    enc0, dec0, state.d_params)
            g_stats, d_st, l_prior, l_llike, l_gan, bce_real, bce_fake = aux
            eg_s = jax.tree.map(jnp.add, eg_s, eg)
            dg_s = jax.tree.map(jnp.add, dg_s, dg)
            ig_s = jax.tree.map(jnp.add, ig_s, ig)
            msum = {
                "g_loss": msum["g_loss"] + enc_l + dec_l,
                "d_loss": msum["d_loss"] + dis_l,
                "adv_loss": msum["adv_loss"] + l_gan,
                "recon_loss": msum["recon_loss"] + l_llike,
                "kl": msum["kl"] + l_prior,
                "d_real_loss": msum["d_real_loss"] + bce_real,
                "d_fake_loss": msum["d_fake_loss"] + bce_fake,
            }
            return (g_stats, d_st["batch_stats"], d_st["spectral"],
                    eg_s, dg_s, ig_s, msum), None

        init = (state.g_stats, state.d_stats, state.d_spectral,
                zsum(enc0), zsum(dec0), zsum(state.d_params),
                {kk: zero for kk in ("g_loss", "d_loss", "adv_loss", "recon_loss",
                                     "kl", "d_real_loss", "d_fake_loss")})
        (new_g_stats, new_d_stats, new_d_spec, eg, dg, ig, msum), _ = jax.lax.scan(
            micro, init, xs)
        enc_g, dec_g, dis_g = (jax.tree.map(lambda g: g / k, t)
                               for t in (eg, dg, ig))
        if axis_name is not None:
            enc_g, dec_g, dis_g = jax.lax.pmean((enc_g, dec_g, dis_g), axis_name)

        enc_up, opt_enc = tx_g.update(enc_g, state.opt_g["enc"], enc0)
        dec_up, opt_dec = tx_g.update(dec_g, state.opt_g["dec"], dec0)
        dis_up, opt_d = tx_d.update(dis_g, state.opt_d, state.d_params)
        new_enc = optax.apply_updates(enc0, enc_up)
        new_dec = optax.apply_updates(dec0, dec_up)
        new_d = optax.apply_updates(state.d_params, dis_up)
        if lcfg.clip_value is not None and lcfg.adversarial == "wgan":
            new_d = clip_params(new_d, lcfg.clip_value)

        mean = {kk: v / k for kk, v in msum.items()}
        kl = msum["kl"] if lcfg.kl_reduction == "sum" else mean["kl"]
        g_metrics = {"g_loss": mean["g_loss"], "adv_loss": mean["adv_loss"],
                     "recon_loss": mean["recon_loss"], "kl": kl}
        metrics = {"d_loss": mean["d_loss"], "d_real_loss": mean["d_real_loss"],
                   "d_fake_loss": mean["d_fake_loss"],
                   "gp": jnp.zeros((), jnp.float32), **g_metrics}
        new_g_params = merge_g(new_enc, new_dec)
        new_state = state.replace(
            step=state.step + 1,
            g_params=new_g_params, d_params=new_d,
            g_stats=new_g_stats, d_stats=new_d_stats, d_spectral=new_d_spec,
            opt_g={"enc": opt_enc, "dec": opt_dec}, opt_d=opt_d,
            g_metrics=g_metrics,
            g_ema=_ema_update(cfg, state.g_ema, new_g_params),
        )
        return new_state, metrics

    return step
