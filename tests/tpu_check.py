"""On-chip Pallas kernel-vs-fallback correctness check (run on a real TPU).

The CPU test suite can only exercise the jnp fallbacks (tests/test_pallas_fused.py);
this script runs the three fused kernels (ops/pallas_fused.py) fwd+bwd ON THE CHIP
against FORCE_FALLBACK=True and asserts agreement:

- ``bn_act_dropout`` p=0: forward and (x, scale, bias) grads vs fallback <= 1e-3.
- ``bn_act_dropout`` p=0.5: the seed-replayed backward dropout mask (the riskiest
  numerics in the repo — pallas_fused.py:82-116) is validated by a directional
  derivative: central finite difference of the forward vs <analytic grad, v>.
  A mismatched fwd/bwd mask cannot pass this.
- ``reparam_kl``: KL + KL-grads vs fallback; the in-kernel eps replay is validated
  by exact identities grad_mu(sum z) = 1 and grad_lv(sum z) = 0.5*(z - mu), plus
  distributional moments of (z - mu) * exp(-0.5 lv) ~ N(0, 1).
- ``recon_loss_sums``: sums + grads vs fallback <= 1e-3.

Usage: ``timeout 600 python -u tests/tpu_check.py`` (on the TPU host). Prints one
JSON line per check and PASS/FAIL; exit code 0 only if all pass.
"""

import json
import sys


import jax
import jax.numpy as jnp
import numpy as np

from vaegan_tpu.ops import pallas_fused as pf

RESULTS = []


def record(name, max_err, tol):
    ok = bool(max_err <= tol)
    RESULTS.append(ok)
    print(json.dumps({"check": name, "max_err": float(max_err), "tol": tol,
                      "ok": ok}), flush=True)


def fresh(fn):
    """jit with a fresh function object so FORCE_FALLBACK flips retrace."""
    return jax.jit(lambda *a: fn(*a))


def run(fn, *args, fallback: bool):
    pf.FORCE_FALLBACK = fallback
    try:
        out = fresh(fn)(*args)
        return jax.device_get(out)
    finally:
        pf.FORCE_FALLBACK = False


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b) / (np.abs(b) + 1e-3)))


def check_bn_p0():
    k = jax.random.key(0)
    c = 256
    x = jax.random.normal(jax.random.fold_in(k, 1), (8, 24, 24, c), jnp.float32)
    mean = jax.random.normal(jax.random.fold_in(k, 2), (c,)) * 0.1
    var = jax.random.uniform(jax.random.fold_in(k, 3), (c,), minval=0.5, maxval=2.0)
    scale = jax.random.normal(jax.random.fold_in(k, 4), (c,)) * 0.5 + 1.0
    bias = jax.random.normal(jax.random.fold_in(k, 5), (c,)) * 0.1
    seed = jnp.int32(7)

    def fwd(x, mean, var, scale, bias):
        return pf.bn_act_dropout(x, mean, var, scale, bias, seed, 0.01, 0.0)

    def loss(x, mean, var, scale, bias):
        y = pf.bn_act_dropout(x, mean, var, scale, bias, seed, 0.01, 0.0)
        return jnp.sum(y * y)

    y_k = run(fwd, x, mean, var, scale, bias, fallback=False)
    y_f = run(fwd, x, mean, var, scale, bias, fallback=True)
    record("bn_act_dropout p=0 forward", rel_err(y_k, y_f), 1e-3)

    g_k = run(jax.grad(loss, argnums=(0, 3, 4)), x, mean, var, scale, bias,
              fallback=False)
    g_f = run(jax.grad(loss, argnums=(0, 3, 4)), x, mean, var, scale, bias,
              fallback=True)
    for name, a, b in zip(("dx", "dscale", "dbias"), g_k, g_f):
        record(f"bn_act_dropout p=0 grad {name}", rel_err(a, b), 1e-3)


def check_bn_dropout_mask_replay():
    k = jax.random.key(10)
    c = 256
    x = jax.random.normal(jax.random.fold_in(k, 1), (4, 16, 16, c), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(k, 2), x.shape, jnp.float32)
    mean = jnp.zeros((c,))
    var = jnp.ones((c,))
    scale = jnp.ones((c,))
    bias = jnp.zeros((c,))
    seed = jnp.int32(23)

    def f(x):
        y = pf.bn_act_dropout(x, mean, var, scale, bias, seed, 0.2, 0.5)
        return jnp.sum(y * jnp.cos(y))

    pf.FORCE_FALLBACK = False
    jf = fresh(f)
    jg = jax.jit(jax.grad(lambda xx: f(xx)))
    eps = 1e-3
    num = (float(jf(x + eps * v)) - float(jf(x - eps * v))) / (2 * eps)
    ana = float(jnp.vdot(jg(x), v))
    denom = max(abs(num), abs(ana), 1e-3)
    record("bn_act_dropout p=0.5 directional-derivative (mask replay)",
           abs(num - ana) / denom, 2e-2)


def check_reparam():
    k = jax.random.key(20)
    c = 256
    mu = jax.random.normal(jax.random.fold_in(k, 1), (8, 12, 12, c), jnp.float32)
    lv = jax.random.normal(jax.random.fold_in(k, 2), mu.shape, jnp.float32) * 0.5
    seed = jnp.int32(31)

    def kl_of(mu, lv):
        return pf.reparam_kl(mu, lv, seed)[1]

    kl_k = run(kl_of, mu, lv, fallback=False)
    kl_f = run(kl_of, mu, lv, fallback=True)
    record("reparam_kl KL value", rel_err(kl_k, kl_f), 1e-3)

    gk = run(jax.grad(kl_of, argnums=(0, 1)), mu, lv, fallback=False)
    gf = run(jax.grad(kl_of, argnums=(0, 1)), mu, lv, fallback=True)
    for name, a, b in zip(("dmu", "dlv"), gk, gf):
        record(f"reparam_kl KL grad {name}", rel_err(a, b), 1e-3)

    # eps-replay identities (independent of WHICH eps the kernel drew):
    #   z = mu + exp(0.5 lv) eps  =>  d sum(z)/d mu = 1,  d sum(z)/d lv = (z-mu)/2
    pf.FORCE_FALLBACK = False
    z = jax.device_get(fresh(lambda m, l: pf.reparam_kl(m, l, seed)[0])(mu, lv))
    gz = run(jax.grad(lambda m, l: jnp.sum(pf.reparam_kl(m, l, seed)[0]),
                      argnums=(0, 1)), mu, lv, fallback=False)
    record("reparam_kl z-replay grad_mu == 1",
           float(np.max(np.abs(np.asarray(gz[0]) - 1.0))), 1e-3)
    record("reparam_kl z-replay grad_lv == (z-mu)/2",
           rel_err(gz[1], (z - np.asarray(mu)) * 0.5), 1e-3)
    # distributional sanity of the in-kernel normal draws
    eps_hat = (z - np.asarray(mu)) * np.exp(-0.5 * np.asarray(lv))
    record("reparam_kl eps mean ~ 0", abs(float(eps_hat.mean())), 0.02)
    record("reparam_kl eps std ~ 1", abs(float(eps_hat.std()) - 1.0), 0.03)


def check_recon():
    k = jax.random.key(30)
    r = jax.random.uniform(jax.random.fold_in(k, 1), (8, 96, 96, 1), jnp.float32)
    t = jax.random.uniform(jax.random.fold_in(k, 2), r.shape, jnp.float32)

    def sums(r, t):
        return pf.recon_loss_sums(r, t)

    def loss(r, t):
        s = pf.recon_loss_sums(r, t)
        return s[0] * 0.3 + s[1] * 0.7

    s_k = run(sums, r, t, fallback=False)
    s_f = run(sums, r, t, fallback=True)
    record("recon_loss_sums values", rel_err(s_k, s_f), 1e-3)
    g_k = run(jax.grad(loss, argnums=(0, 1)), r, t, fallback=False)
    g_f = run(jax.grad(loss, argnums=(0, 1)), r, t, fallback=True)
    for name, a, b in zip(("drecon", "dtarget"), g_k, g_f):
        record(f"recon_loss_sums grad {name}", rel_err(a, b), 1e-3)


def main():
    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(json.dumps({"error": f"not on TPU (backend={backend}); the kernel "
                          "path only engages on tpu/axon"}))
        sys.exit(2)
    # sanity: the kernel path is actually live for c=256
    assert pf._use_pallas(256), "pallas path not engaged — check pltpu import"
    check_bn_p0()
    check_bn_dropout_mask_replay()
    check_reparam()
    check_recon()
    ok = all(RESULTS)
    print(json.dumps({"summary": "PASS" if ok else "FAIL",
                      "checks": len(RESULTS), "backend": backend}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
