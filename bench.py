"""Benchmark: full VAE-GAN train-step throughput, 96x96 images/sec/chip.

Measures the notebook-config (depth 2, length 1, feature_size 64 generator;
[128,256,512] critic) WGAN-GP train step — generator forward, critic on
real/fake/interpolates with grad-of-grad penalty, both optimizer updates and the
weight clamp — on synthetic on-device data, steady-state.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = value / 5000 (the BASELINE.json target of >=5k imgs/s/chip).

Env knobs: BENCH_BATCH (default 128 — the measured optimum), BENCH_DTYPE
(bfloat16|float32, default bfloat16), BENCH_STEPS (default 20),
BENCH_IMAGE (default 96).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp


def main() -> None:
    batch_size = int(os.environ.get("BENCH_BATCH", 128))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    n_steps = int(os.environ.get("BENCH_STEPS", 20))
    image = int(os.environ.get("BENCH_IMAGE", 96))

    from vaegan_tpu.config import preset
    from vaegan_tpu.train import create_train_state, make_train_step

    cfg = preset("notebook")
    cfg = cfg.replace(
        data=cfg.data.replace(image_size=image, batch_size=batch_size),
        train=cfg.train.replace(dtype=dtype),
    )

    state = create_train_state(cfg, jax.random.key(0))
    step = jax.jit(make_train_step(cfg, do_g_update=True), donate_argnums=0)
    batch = jax.random.uniform(jax.random.key(1), (batch_size, image, image, 1), jnp.float32)
    # rbg: hardware-friendly counter RNG for the dropout/noise streams (threefry
    # costs ~15% of the generator forward at 96x96)
    key = jax.random.key(2, impl="rbg")

    # compile + warmup. NOTE: sync via device_get of a value — on the tunneled
    # axon backend block_until_ready returns before execution completes.
    for i in range(3):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
    float(jax.device_get(metrics["d_loss"]))

    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = step(state, batch, jax.random.fold_in(key, 100 + i))
    float(jax.device_get(metrics["d_loss"]))
    dt = time.perf_counter() - t0

    imgs_per_sec = batch_size * n_steps / dt
    print(json.dumps({
        "metric": f"{image}x{image} VAE-GAN train-step images/sec/chip "
                  f"(batch {batch_size}, {dtype})",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / 5000.0, 3),
    }))


if __name__ == "__main__":
    main()
