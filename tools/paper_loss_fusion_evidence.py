"""Byte audit of the Larsen paper step's LOSS SECTION (north-star clause).

BASELINE.json's north star asks for the Algorithm-1 losses — reparameterization,
KL, the Dis_l feature-matching term, and the three BCE terms — "as one fused
loss kernel inside a jitted three-optimizer step". tools/conv_fusion_evidence.py
closed the res-block half of the fused-kernel mandate by showing XLA's schedule
already moves the fully-fused ideal's HBM bytes; this tool does the same for the
paper step's loss section.

It isolates exactly the loss math `make_paper_train_step` runs downstream of the
network forwards (vaegan_tpu/train/step.py:646-655 — the same losses.py calls,
the same reductions, the same weighting into the three per-group scalars) plus
the reparameterization draw that produces z (networks.py SpatialVAECodeProcessor),
and adds a `z_cot` input standing in for the decoder's incoming cotangent so the
backward through z -> (mu, log_var) is part of the audit. Forward AND backward
are compiled for the attached device; XLA cost-analysis bytes are compared
against the fused ideal:

- aggressive ideal: ONE fused pass — read mu, log_var, z_cot, f_real, f_tilde
  once each (eps generated in-register, logits negligible), write z, dmu,
  dlog_var, df_real, df_tilde once each.
- conservative ideal: + one re-read of each forward input by a separate
  backward pass (mu, log_var, f_real, f_tilde).

~1x against either bound means the loss section costs no HBM round-trips beyond
its tensor traffic — there is nothing left for a hand-written monolithic loss
kernel to remove, the same verdict the res-block audit reached.

    python tools/paper_loss_fusion_evidence.py            # notebook scale
    python tools/paper_loss_fusion_evidence.py --pallas   # fused reparam_kl path
    python tools/paper_loss_fusion_evidence.py --hlo out.txt
"""

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp

from vaegan_tpu import losses
from vaegan_tpu.config import preset
from vaegan_tpu.inference import latent_shape
from vaegan_tpu.train.state import build_models


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--image-size", type=int, default=96)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--pallas", action="store_true",
                    help="route the reparameterization through the fused "
                         "reparam_kl Pallas kernel (the config.use_pallas="
                         "'losses' default) instead of plain jnp ops")
    ap.add_argument("--hlo", help="dump the optimized fwd+bwd HLO here")
    args = ap.parse_args()

    dt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[args.dtype]
    cfg = preset("vaegan_paper")
    cfg = cfg.replace(data=cfg.data.replace(image_size=args.image_size,
                                            batch_size=args.batch),
                      train=cfg.train.replace(dtype=args.dtype))
    lcfg, gamma = cfg.loss, cfg.optim.gamma

    # shapes straight from the configured models (no hardcoding): the latent
    # from the encoder geometry, the Dis_l tap from an abstract critic apply
    b = args.batch
    h, w, c = latent_shape(cfg, args.image_size)
    _, disc = build_models(cfg)
    dvars = jax.eval_shape(
        lambda k: disc.init({"params": k, "dropout": k},
                            jnp.zeros((1, args.image_size, args.image_size, 1), dt),
                            train=False),
        jax.random.key(0))
    feat_shape = jax.eval_shape(
        lambda v, x: disc.apply(v, x, train=False, return_features=True)[1],
        dvars, jax.ShapeDtypeStruct((b, args.image_size, args.image_size, 1), dt),
    ).shape

    def reparam(mu, lv, seed):
        if args.pallas:
            from vaegan_tpu.ops.pallas_fused import reparam_kl
            z, _ = reparam_kl(mu, lv, seed)
            return z
        k = jax.random.fold_in(jax.random.key(1), seed)
        eps = jax.random.normal(k, mu.shape, mu.dtype)
        return mu + jnp.exp(jnp.asarray(0.5, lv.dtype) * lv) * eps

    def loss_section(mu, lv, f_real, f_tilde, lr_, lt_, lp_, z_cot, seed):
        # verbatim step.py:646-655 loss math
        z = reparam(mu, lv, seed)
        l_prior = losses.kl_divergence(mu, lv, lcfg.kl_reduction)
        l_llike = losses.feature_matching_loss(f_real, f_tilde)
        bce_real = losses.bce_with_logits(lr_, 1.0)
        bce_fake = (losses.bce_with_logits(lt_, 0.0)
                    + losses.bce_with_logits(lp_, 0.0))
        l_gan = bce_real + bce_fake
        enc_l = lcfg.kl_weight * l_prior + lcfg.reconstruction_weight * l_llike
        dec_l = (gamma * lcfg.reconstruction_weight * l_llike
                 - lcfg.adversarial_weight * l_gan)
        dis_l = lcfg.adversarial_weight * l_gan
        # z_cot: the cotangent the decoder sends back through z in the real
        # step — folding it in makes grad() produce the z->(mu,lv) backward
        return enc_l + dec_l + dis_l + jnp.sum(z * z_cot.astype(z.dtype)), z

    grad_fn = jax.value_and_grad(loss_section, argnums=(0, 1, 2, 3), has_aux=True)

    mu = jax.ShapeDtypeStruct((b, h, w, c), dt)
    feat = jax.ShapeDtypeStruct(feat_shape, dt)
    logit = jax.ShapeDtypeStruct((b, 1), dt)
    seed = jax.ShapeDtypeStruct((), jnp.int32)
    compiled = (jax.jit(grad_fn)
                .lower(mu, mu, feat, feat, logit, logit, logit, mu, seed)
                .compile())
    if args.hlo:
        Path(args.hlo).write_text(compiled.as_text())
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    measured = float(ca.get("bytes accessed", float("nan")))

    bpe = jnp.dtype(dt).itemsize
    latent_b = b * h * w * c * bpe
    feat_b = 1
    for s in feat_shape:
        feat_b *= s
    feat_b *= bpe
    # aggressive: one fused pass — 3 latent reads (mu, lv, z_cot) + 2 feature
    # reads; writes z + dmu + dlv (latent) and df_real + df_tilde (features)
    ideal_aggr = (3 + 3) * latent_b + (2 + 2) * feat_b
    # conservative: a separate backward pass re-reads each forward input once
    ideal_cons = ideal_aggr + 2 * latent_b + 2 * feat_b

    print(json.dumps({
        "backend": jax.devices()[0].platform,
        "device": jax.devices()[0].device_kind,
        "operating_point": f"{args.image_size}^2 batch {b} {args.dtype}"
                           + (", pallas reparam_kl" if args.pallas else ""),
        "latent_shape": [b, h, w, c],
        "dis_l_feature_shape": list(feat_shape),
        "measured_bytes_MB": round(measured / 1e6, 1),
        "ideal_fused_MB_aggressive": round(ideal_aggr / 1e6, 1),
        "ideal_fused_MB_conservative": round(ideal_cons / 1e6, 1),
        "ratio_vs_aggressive": round(measured / ideal_aggr, 2),
        "ratio_vs_conservative": round(measured / ideal_cons, 2),
    }, indent=1))


if __name__ == "__main__":
    main()
