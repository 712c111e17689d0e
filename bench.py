"""Benchmark: full VAE-GAN train-step throughput, 96x96 images/sec/chip.

Measures the notebook-config (depth 2, length 1, feature_size 64 generator;
[128,256,512] critic) WGAN-GP train step — generator forward, critic on
real/fake/interpolates with grad-of-grad penalty, both optimizer updates and the
weight clamp — on synthetic on-device data, steady-state.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = value / 5000 (the BASELINE.json target of >=5k imgs/s/chip),
derived from the rounded printed value so the record is self-consistent.

Env knobs: BENCH_BATCH (default 128 — the measured optimum), BENCH_DTYPE
(bfloat16|float32, default bfloat16), BENCH_STEPS (default 20),
BENCH_IMAGE (default 96), BENCH_GP_EVERY (headline default 8 — the fastest
quality-verified lazy-GP schedule, named in the metric string; 1 = the
reference-faithful every-step GP; --vae/--paper default 1), BENCH_N_CRITICS
(headline default 5 — the reference's own experiment() default schedule,
quality-verified as a PAIR with gp8 in round 5; 1 = the published runs'
schedule).

Modes: (default) bare train step; --vae / --paper alternate steps; --loop
end-to-end train() loop incl. the HBM-staged feed; --infer serving paths;
--loader host pipeline; --roofline achieved-BW attribution.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

try:  # driver contract: must run from an uninstalled checkout too
    import vaegan_tpu  # noqa: F401
except ImportError:  # pragma: no cover - `pip install -e .` is the normal path
    sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp

# persistent compile cache: the WGAN-GP double-backprop step costs minutes to
# compile; repeat bench invocations hit the cache
jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent / ".jax_cache_bench"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def bench_loader() -> None:
    """Host-pipeline headroom: CachedDataset -> DataLoader -> device_prefetch
    images/sec, NO train step. Answers whether the 1-core host can feed the
    measured plain-VAE step rate (~3k img/s at 96x96)."""
    batch_size = int(os.environ.get("BENCH_BATCH", 128))
    image = int(os.environ.get("BENCH_IMAGE", 96))
    n = int(os.environ.get("BENCH_DATASET", 1200))

    from vaegan_tpu.data.pipeline import (
        CachedDataset, DataLoader, SyntheticDataset, device_prefetch)

    ds = CachedDataset(SyntheticDataset(n, image))  # decode once up front
    dl = DataLoader(ds, batch_size=batch_size, shuffle=True, drop_last=True,
                    prefetch_batches=4)

    # (a) host-side serving rate (cache -> assembled numpy batches): the actual
    # question — can the 1-core host keep up with the train step's img/s?
    for _ in iter(dl):
        pass  # warm page cache
    t0 = time.perf_counter()
    imgs = 0
    for _ in range(3):
        for b in iter(dl):
            imgs += b.shape[0]
    host_rate = imgs / (time.perf_counter() - t0)

    # (b) with device placement. NOTE: in this environment the chip sits behind a
    # network tunnel, so H2D here measures TUNNEL bandwidth, not the DMA a
    # co-located TPU host would do — reported for completeness only.
    last = None
    for b in device_prefetch(iter(dl), depth=2):
        last = b
    jax.block_until_ready(last)
    t0 = time.perf_counter()
    imgs = 0
    for _ in range(2):
        for b in device_prefetch(iter(dl), depth=2):
            imgs += b.shape[0]
            last = b
    float(jax.device_get(last[0, 0, 0, 0]))  # hard sync (tunnel-safe)
    h2d_rate = imgs / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": f"{image}x{image} cached-dataset host serving rate (batch {batch_size})",
        "value": round(host_rate, 1),
        "unit": "images/sec",
        "vs_baseline": round(round(host_rate, 1) / 5000.0, 3),
        "h2d_images_per_sec_tunnel": round(h2d_rate, 1),
    }))


def bench_loop() -> None:
    """End-to-end TRAINING-LOOP throughput — not the bare step but everything
    ``train()`` runs per step: the HBM-staged data feed (``data.hbm_cache`` —
    on-device batch gather, no per-step H2D), lazy-GP variant scheduling,
    reference-format logging with batched metric flushes, NaN guard off,
    checkpointing off. The gap between this number and the bare-step bench is
    the framework's whole non-compute overhead."""
    batch_size = int(os.environ.get("BENCH_BATCH", 128))
    image = int(os.environ.get("BENCH_IMAGE", 96))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    gp_every = int(os.environ.get("BENCH_GP_EVERY", 8))
    n_steps = int(os.environ.get("BENCH_STEPS", 80))
    n_steps = max(gp_every, n_steps - n_steps % gp_every)  # whole GP cycles
    n1 = 2 * gp_every                                      # short-run size
    if n_steps <= n1:
        n_steps = 2 * n1

    from vaegan_tpu.config import preset
    from vaegan_tpu.train.loop import train

    n_per_epoch = 10
    tmp = tempfile.TemporaryDirectory(prefix="bench_loop_")  # removed at exit
    cfg = preset("notebook")
    cfg = cfg.replace(
        data=cfg.data.replace(
            image_size=image, batch_size=batch_size, synthetic=True,
            synthetic_size=n_per_epoch * batch_size, drop_last=True,
            hbm_cache=True),
        train=cfg.train.replace(
            dtype=dtype, gp_every=gp_every, sample_interval=0,
            # reference-faithful per-batch metric flush by default (each flush
            # is one host sync — over the dev tunnel that is the dominant loop
            # overhead; BENCH_LOG_EVERY=k batches the sync to every k steps)
            log_every=int(os.environ.get("BENCH_LOG_EVERY", 1)),
            n_epochs=(n_steps + n_per_epoch - 1) // n_per_epoch + 1,
            # keep the bench out of the CWD (the notebook preset's sample_dir
            # is the reference's gan_inference folder, wiped at train start)
            sample_dir=os.path.join(tmp.name, "samples")),
    )
    # pass 0 compiles both lazy-GP variants into the persistent cache; passes
    # 1 and 2 each pay the same fixed costs (state init, dataset staging,
    # executable-cache load) plus n steps of loop — the difference quotient is
    # the steady-state loop rate with the fixed costs cancelled out
    walls = {}
    for max_steps in (n1, n1, n_steps):
        run_cfg = cfg.replace(train=cfg.train.replace(max_steps=max_steps))
        _, logger = train(run_cfg)
        tail = logger.history[-1]
        walls[tail["_steps"]] = tail["_wall_s"]
    rate = (n_steps - n1) * batch_size / (walls[n_steps] - walls[n1])
    print(json.dumps({
        "metric": f"{image}x{image} end-to-end training loop images/sec/chip "
                  f"(train(): hbm_cache feed + logging; batch {batch_size}, "
                  f"{dtype}, lazy GP 1/{gp_every}, marginal over "
                  f"{n_steps - n1} steps)",
        "value": round(rate, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(round(rate, 1) / 5000.0, 3),
        "fixed_overhead_s": round(walls[n1] - n1 * batch_size / rate, 1),
        "log_every": int(os.environ.get("BENCH_LOG_EVERY", 1)),
    }))


def bench_roofline(preset_name: str = "notebook") -> None:
    """Measurement-backed roofline: the 856 img/s 'memory roofline' in
    BENCH_NOTES assumed the chip's PAPER bandwidth (820 GB/s). Real kernels
    never reach paper bandwidth; this mode measures (a) the chip's ACHIEVED
    HBM bandwidth with a bandwidth-optimal elementwise triad (2 reads + 1
    write per element, zero flops of substance), (b) the train step's XLA
    cost-analysis bytes and measured time, and reports the step's implied
    bandwidth as a fraction of the ACHIEVED ceiling.

    Combine with ``--paper`` / ``--vae`` to attribute the Larsen three-optimizer
    step or the plain-VAE step instead of the notebook WGAN-GP step."""
    batch_size = int(os.environ.get("BENCH_BATCH", 128))
    image = int(os.environ.get("BENCH_IMAGE", 96))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")

    from vaegan_tpu.config import preset
    from vaegan_tpu.train import (
        create_train_state, make_paper_train_step, make_train_step)

    # (a) achieved HBM bandwidth: y <- a*y + b iterated ON DEVICE in one dispatch
    # (per-call dispatch crosses the network tunnel here and would pollute the
    # measurement), ~1 GiB working set per array
    n = (256 * 2 ** 20)  # 256M f32 elements = 1 GiB per array
    reps = 50

    @jax.jit
    def triad(y, b):
        return jax.lax.fori_loop(0, reps, lambda i, y: 1.0001 * y + b, y)

    y = jnp.ones((n,), jnp.float32)
    b = jnp.full((n,), 2.0, jnp.float32)
    y = triad(y, b)
    float(jax.device_get(y[0]))  # compile + warm
    t0 = time.perf_counter()
    y = triad(y, b)
    float(jax.device_get(y[0]))
    dt = time.perf_counter() - t0
    triad_bytes = 3 * 4 * n * reps  # 2 reads + 1 write per element per iteration
    achieved_gbs = triad_bytes / dt / 1e9

    # (b) the step: cost analysis + measured time
    cfg = preset(preset_name)
    cfg = cfg.replace(
        data=cfg.data.replace(image_size=image, batch_size=batch_size),
        train=cfg.train.replace(dtype=dtype),
    )
    state = create_train_state(cfg, jax.random.key(0))
    # BENCH_GP_EVERY > 1 attributes the lazy-regularization OFF-step (no GP
    # term, no grad-of-grad) — the variant that runs (k-1)/k of the time under
    # cfg.train.gp_every = k; the GP step itself is the default attribution.
    # BENCH_CRITIC_ONLY=1 attributes the D-only step (do_g_update=False) — the
    # variant that runs (n_critics-1)/n_critics of the time under
    # cfg.train.n_critics = n (README.md:812's schedule, its own search grid).
    no_gp = int(os.environ.get("BENCH_GP_EVERY", 1)) > 1
    do_g = os.environ.get("BENCH_CRITIC_ONLY", "0") != "1"
    step = (make_paper_train_step(cfg) if cfg.optim.scheme == "three"
            else make_train_step(cfg, do_g_update=do_g, do_gp=not no_gp))
    batch = jax.random.uniform(jax.random.key(1), (batch_size, image, image, 1))
    key = jax.random.key(2, impl=cfg.train.rng_impl)
    # time via the regular jit dispatch path; cost analysis comes from an AOT
    # lower().compile() AFTER timing (identical HLO -> persistent-cache hit).
    # Two axon-backend quirks mandate this order + the donated prime below
    # (both isolated 2026-08-19): (1) executing the AOT `compiled` object
    # directly trips InvalidArgument when the step passes donated buffers
    # through unchanged (do_g_update=False leaves the G half untouched);
    # (2) a do_g_update=False program fails or WEDGES THE DEVICE (several-
    # minute recovery) unless a full (T,T) step at the SAME shapes ran first
    # in this process via the same donated-jit dispatch path — an undonated
    # prime or a 32^2 prime does not cover it, and an interposed AOT compile
    # breaks the cover. train()'s schedule always runs (T,T) first, so real
    # training never sees this; it is purely a bench-the-variant-alone issue.
    jstep = jax.jit(step, donate_argnums=0)
    if not do_g:
        # prime with the full (T,T, GP) step — the variant every known-good
        # sequence (train(), the n_critics bench) executes first
        state, metrics = jax.jit(
            make_train_step(cfg, do_g_update=True, do_gp=True),
            donate_argnums=0)(state, batch, key)
        float(jax.device_get(metrics["d_loss"]))
    for i in range(3):
        state, metrics = jstep(state, batch, jax.random.fold_in(key, i))
    float(jax.device_get(metrics["d_loss"]))
    n_steps = int(os.environ.get("BENCH_STEPS", 20))
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = jstep(state, batch, jax.random.fold_in(key, 100 + i))
    float(jax.device_get(metrics["d_loss"]))
    step_s = (time.perf_counter() - t0) / n_steps

    lowered = jax.jit(step, donate_argnums=0).lower(state, batch, key)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    bytes_ = float(ca.get("bytes accessed", 0.0))

    implied_gbs = bytes_ / step_s / 1e9
    label = {"notebook": "VAE-GAN", "vaegan_paper": "Larsen-paper",
             "notebook_vae": "plain-VAE"}.get(preset_name, preset_name)
    if not do_g:
        label += " critic-only"
    if no_gp:
        label += " no-GP off-step"
    print(json.dumps({
        "metric": f"roofline attribution, {label} step (achieved-BW-normalized)",
        "achieved_hbm_gbs_triad": round(achieved_gbs, 1),
        "step_cost_flops_T": round(flops / 1e12, 2),
        "step_cost_bytes_GB": round(bytes_ / 1e9, 2),
        "step_ms": round(step_s * 1e3, 1),
        "images_per_sec": round(batch_size / step_s, 1),
        "step_implied_gbs": round(implied_gbs, 1),
        "fraction_of_achieved_bw": round(implied_gbs / achieved_gbs, 3),
        "memory_floor_ms_at_achieved_bw": round(bytes_ / achieved_gbs / 1e6, 1),
    }))


def bench_infer() -> None:
    """Serving-side numbers the reference has no analogue for: eval-mode
    reconstruction throughput (the encode+decode path behind
    ``visualize_reconstructions``/``evaluate_mse``), prior-sample decode
    throughput, and batch-1 reconstruction latency."""
    batch_size = int(os.environ.get("BENCH_BATCH", 128))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    n_steps = int(os.environ.get("BENCH_STEPS", 20))
    image = int(os.environ.get("BENCH_IMAGE", 96))

    from vaegan_tpu import inference
    from vaegan_tpu.config import preset
    from vaegan_tpu.train import create_train_state

    cfg = preset("notebook")
    cfg = cfg.replace(
        data=cfg.data.replace(image_size=image, batch_size=batch_size),
        train=cfg.train.replace(dtype=dtype))
    state = create_train_state(cfg, jax.random.key(0))
    key = jax.random.key(2, impl=cfg.train.rng_impl)

    def sync(out):
        o = out[0] if isinstance(out, tuple) else out
        float(jax.device_get(o.reshape(-1)[0]))  # hard sync (tunnel-safe)

    def timed(fn, n=n_steps, per_call_imgs=batch_size):
        sync(fn())  # compile + warm
        t0 = time.perf_counter()
        for _ in range(n - 1):
            fn()
        sync(fn())
        dt = time.perf_counter() - t0
        return per_call_imgs * n / dt, dt / n

    batch = jax.random.uniform(jax.random.key(1), (batch_size, image, image, 1),
                               jnp.float32)
    recon_rate, _ = timed(lambda: inference.reconstruct(cfg, state, batch))
    sample_rate, _ = timed(lambda: inference.sample(cfg, state, key, n=batch_size))
    one = batch[:1]
    _, lat1 = timed(lambda: inference.reconstruct(cfg, state, one), per_call_imgs=1)

    print(json.dumps({
        "metric": f"{image}x{image} eval-mode reconstruction images/sec/chip "
                  f"(batch {batch_size}, {dtype})",
        "value": round(recon_rate, 1), "unit": "images/sec/chip",
        "vs_baseline": round(round(recon_rate, 1) / 5000.0, 3)}))
    print(json.dumps({
        "metric": f"{image}x{image} prior-sample decode images/sec/chip "
                  f"(batch {batch_size}, {dtype})",
        "value": round(sample_rate, 1), "unit": "images/sec/chip",
        "vs_baseline": round(round(sample_rate, 1) / 5000.0, 3)}))
    print(json.dumps({
        "metric": f"{image}x{image} batch-1 reconstruction latency",
        "value": round(lat1 * 1e3, 2), "unit": "ms", "vs_baseline": None}))


def main(preset_name: str = "notebook") -> None:
    """Default: the notebook WGAN-GP step (the headline). ``--paper`` measures
    the Larsen three-optimizer step (BASELINE config 3); ``--vae`` the plain-VAE
    run (adv weight 0, dummy critic still training, README.md:1283) — the
    secondary rows of the BENCH_NOTES table."""
    batch_size = int(os.environ.get("BENCH_BATCH", 128))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    n_steps = int(os.environ.get("BENCH_STEPS", 20))
    image = int(os.environ.get("BENCH_IMAGE", 96))
    # headline default: the fastest quality-verified lazy-GP schedule
    # (gp_every=8 — paired against the every-step control at the reference's
    # recipe in BENCH_NOTES, identical eval MSE; the metric string below
    # self-describes it). BENCH_GP_EVERY=1 measures the reference-faithful
    # every-step GP (559.8-560.7 img/s, 90.2% of achieved HBM bandwidth);
    # 4 is the conservative lower-staleness schedule (791). The --vae/--paper
    # secondary rows stay faithful by default: their recorded numbers and
    # roofline attributions predate the schedule and the paper step has no GP
    # to amortize anyway.
    gp_every = int(os.environ.get("BENCH_GP_EVERY",
                                  8 if preset_name == "notebook" else 1))
    # BENCH_N_CRITICS=n measures the reference's n_critics schedule
    # (README.md:812 — G updated every n-th batch, D every batch; n is in the
    # reference's own search grid, README.md:1041): the amortized rate over
    # whole cycles mixing the (do_g_update, do_gp) jit variants exactly as
    # train() schedules them. Headline default is 5 — the reference's OWN
    # `experiment()` default (README.md:762) — since round 5 quality-verified
    # the combined nc5+gp8 schedule as a PAIR: at the reference recipe (96^2
    # batch 4, 900 steps, f32, same-day paired control) it lands 0.051-0.066
    # (inside the reference's published VAE-GAN band; the nc1 control is 2x
    # lower at this matched-step budget — G-update starvation, not
    # instability, max|critic| 1.15), and at the large-batch stress point
    # (96^2 b128 bf16, 2,400 steps, the matrix's worst seed, EMA 0.999) the
    # EMA iterate lands 0.040-0.045 — BETTER than the gp8-only stress record
    # (0.086-0.092). BENCH_N_CRITICS=1 reproduces the published runs' schedule
    # (849.5 at gp8; with BENCH_GP_EVERY=1, the faithful 559.8-560.7).
    n_critics = int(os.environ.get(
        "BENCH_N_CRITICS", 5 if preset_name == "notebook" else 1))

    import math

    from vaegan_tpu.config import preset
    from vaegan_tpu.train import (
        create_train_state, make_paper_train_step, make_train_step)
    from vaegan_tpu.train.step import lazy_gp_enabled, make_step_variants

    cfg = preset(preset_name)
    cfg = cfg.replace(
        data=cfg.data.replace(image_size=image, batch_size=batch_size),
        train=cfg.train.replace(
            dtype=dtype, gp_every=gp_every, n_critics=n_critics,
            critic_batching=os.environ.get("BENCH_CRITIC_BATCHING", "separate"),
            # BENCH_PALLAS=off|losses|all A/Bs the Pallas kernels in the real
            # step (default: the preset's setting, normally "losses")
            use_pallas=os.environ.get("BENCH_PALLAS", cfg.train.use_pallas),
        ),
    )

    state = create_train_state(cfg, jax.random.key(0))
    if cfg.optim.scheme == "three":
        fn = jax.jit(make_paper_train_step(cfg), donate_argnums=0)
        variants = {(True, True): fn}
        lazy = False

        def pick(i):
            return fn
    else:
        # the exact variant dict train() schedules (λ·gp_every scaling on GP
        # steps included); jit compiles lazily so unused variants cost nothing
        variants = make_step_variants(cfg, lambda do_g, do_gp, scale: jax.jit(
            make_train_step(cfg, do_g_update=do_g, do_gp=do_gp,
                            gp_lambda_scale=scale),
            donate_argnums=0))
        lazy = lazy_gp_enabled(cfg)

        def pick(i):  # mirrors train.loop: do_g per-batch, do_gp per-step
            do_g = (i % n_critics) == 0
            do_gp = (not lazy) or (i % gp_every == 0)
            return variants[(do_g, do_gp)]

    cycle = math.lcm(n_critics, gp_every if lazy else 1)
    batch = jax.random.uniform(jax.random.key(1), (batch_size, image, image, 1), jnp.float32)
    # the shipped training loop's key stream (TrainConfig.rng_impl, default rbg —
    # the hardware-friendly counter RNG; threefry costs ~15% of the generator
    # forward at 96x96): bench measures exactly what train() runs
    key = jax.random.key(2, impl=cfg.train.rng_impl)

    # compile + warmup. NOTE: sync via device_get of a value — on the tunneled
    # axon backend block_until_ready returns before execution completes.
    for i in range(3 if cycle == 1 else 2 * cycle):
        state, metrics = pick(i)(state, batch, jax.random.fold_in(key, i))
    float(jax.device_get(metrics["d_loss"]))

    if cycle > 1:  # time whole schedule cycles
        n_steps = max(cycle, n_steps - n_steps % cycle)
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = pick(i)(state, batch, jax.random.fold_in(key, 100 + i))
    float(jax.device_get(metrics["d_loss"]))
    dt = time.perf_counter() - t0

    imgs_per_sec = batch_size * n_steps / dt
    label = {"notebook": "VAE-GAN", "vaegan_paper": "Larsen-paper",
             "notebook_vae": "plain-VAE"}.get(preset_name, preset_name)
    sched = "" if not lazy else f", lazy GP 1/{gp_every}"
    if n_critics > 1:
        sched += f", G every {n_critics} (n_critics)"
    print(json.dumps({
        "metric": f"{image}x{image} {label} train-step images/sec/chip "
                  f"(batch {batch_size}, {dtype}{sched})",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(round(imgs_per_sec, 1) / 5000.0, 3),
    }))


if __name__ == "__main__":
    if "--loader" in sys.argv:
        bench_loader()
    elif "--loop" in sys.argv:
        bench_loop()
    elif "--infer" in sys.argv:
        bench_infer()
    elif "--roofline" in sys.argv:
        bench_roofline("vaegan_paper" if "--paper" in sys.argv
                       else "notebook_vae" if "--vae" in sys.argv
                       else "notebook")
    elif "--paper" in sys.argv:
        main("vaegan_paper")
    elif "--vae" in sys.argv:
        main("notebook_vae")
    else:
        main()
