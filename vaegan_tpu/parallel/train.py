"""Data-parallel training entry: mesh + sharded steps + the standard loop, wired.

BASELINE config 5 ("scaled 256x256 VAE-GAN, large batch, data-parallel over a TPU
pod slice via ICI allreduce") as a one-call API:

    from vaegan_tpu.parallel.train import train_data_parallel
    state, logger = train_data_parallel(preset("vaegan_256_dp"))

Builds the mesh from ``cfg.parallel`` (all visible devices by default), places the
state per ``state_shardings`` (replicated params + TP critic head if a model axis
is configured), compiles the two step variants with data-sharded batch inputs, and
runs the standard loop — batches flow through ``device_prefetch`` straight into
their sharded layout. Multi-host: call ``vaegan_tpu.parallel.dist.initialize``
first; each process feeds its addressable shard.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from vaegan_tpu.config import Config
from vaegan_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    make_parallel_train_step,
    shard_state,
    state_shardings,
)
from vaegan_tpu.train.loop import train
from vaegan_tpu.train.state import TrainState, create_train_state
from vaegan_tpu.utils.metrics import MetricsLogger


def train_data_parallel(
    cfg: Config,
    loader=None,
    logger: Optional[MetricsLogger] = None,
    mesh=None,
    resume: bool = False,
) -> Tuple[TrainState, MetricsLogger]:
    p = cfg.parallel
    if mesh is None:
        mesh = make_mesh(num_data=p.num_data, num_model=p.num_model,
                         data_axis=p.data_axis, model_axis=p.model_axis)
    n_data = mesh.shape[p.data_axis]
    if cfg.data.batch_size % n_data != 0:
        raise ValueError(
            f"global batch {cfg.data.batch_size} must be divisible by the data-axis "
            f"size ({n_data})")

    if loader is None:
        # a trailing partial batch cannot be sharded across the data axis;
        # drop it (pass your own loader to override). In a multi-process run
        # each process serves only its own batch_size/process_count shard —
        # device_prefetch assembles the global batch from the per-process
        # shards (data/pipeline.py). data.hbm_cache stages the dataset in HBM
        # (replicated over the mesh) and gathers batches straight into the
        # data-sharded layout (single-process meshes only).
        from vaegan_tpu.data.pipeline import make_loader
        loader = make_loader(cfg.data, seed=cfg.train.seed, drop_last=True,
                             sharding=batch_sharding(mesh, p.data_axis))

    state = create_train_state(
        cfg, jax.random.key(cfg.train.seed, impl=cfg.train.rng_impl))
    spec = state_shardings(state, mesh, model_axis=p.model_axis)
    # shard_state (not a bare device_put): in a multi-process run device_put
    # cannot target non-addressable devices; shard_state assembles global
    # arrays from the per-process replica instead
    state = shard_state(state, mesh, model_axis=p.model_axis)
    if cfg.optim.scheme == "three":
        # the paper step has no critic-only variant; don't compile twice
        step_g = make_parallel_train_step(cfg, mesh, do_g_update=True,
                                          state_spec=spec)
        step_fns = {(True, True): step_g, (False, True): step_g}
    else:
        from vaegan_tpu.train.step import make_step_variants
        step_fns = make_step_variants(
            cfg, lambda do_g, do_gp, scale: make_parallel_train_step(
                cfg, mesh, do_g_update=do_g, state_spec=spec, do_gp=do_gp,
                gp_lambda_scale=scale))

    return train(
        cfg, loader=loader, state=state, logger=logger,
        sharding=batch_sharding(mesh, p.data_axis),
        step_fns=step_fns,
        resume=resume,
    )
