"""Device mesh + sharding rules: data parallelism over ICI.

The reference is strictly single-device (``cuda:0``, README.md:694; no
DataParallel/DDP anywhere — SURVEY.md §2.3). The TPU-native scaling story
(BASELINE config 5) is GSPMD:

- a 1-D (or 2-D, with a ``model`` axis reserved for future tensor parallelism)
  ``jax.sharding.Mesh`` over the slice;
- batches sharded along ``data``; params/optimizer state replicated;
- the train step stays the *same pure function* — ``jit`` with sharding-annotated
  inputs lets XLA insert the ICI collectives: global batch-norm statistics fall out
  of ``jnp.mean`` over the sharded batch axis, and the gradient all-reduce falls out
  of differentiating a replicated-param loss of sharded data. No hand-written
  NCCL/MPI equivalents (SURVEY.md §2.4).

A 1-device mesh is the degenerate case, so the single-chip and pod-slice paths are
the same code.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vaegan_tpu.config import Config
from vaegan_tpu.train.state import TrainState
from vaegan_tpu.train.step import make_paper_train_step, make_train_step


def make_mesh(num_data: int = -1, num_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None,
              data_axis: str = "data", model_axis: str = "model") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if num_data == -1:
        num_data = len(devices) // num_model
    if num_data < 1 or num_data * num_model > len(devices):
        raise ValueError(
            f"make_mesh needs {num_data}x{num_model}={num_data * num_model} devices, "
            f"have {len(devices)} ({devices[0].platform if devices else 'none'}); "
            "on a single-chip host force a virtual CPU mesh first "
            "(XLA_FLAGS=--xla_force_host_platform_device_count=N + "
            "jax.config.update('jax_platforms', 'cpu'))"
        )
    use = np.array(devices[: num_data * num_model]).reshape(num_data, num_model)
    return Mesh(use, (data_axis, model_axis))


def batch_sharding(mesh: Mesh, data_axis: str = "data",
                   spatial_axis: Optional[str] = None) -> NamedSharding:
    """NHWC batches sharded along the batch dim, optionally also along H.

    ``spatial_axis`` is the framework's sequence/context-parallel analogue
    (SURVEY.md §2.3): the model has no sequence dimension, but image resolution is
    the equivalent scaling axis — sharding H over a mesh axis lets a single image
    batch exceed one chip's HBM (e.g. 256²+ at depth 2). GSPMD inserts the conv
    halo exchanges; verified numerically identical to the unsharded forward.
    """
    if spatial_axis is not None:
        return NamedSharding(mesh, P(data_axis, spatial_axis, None, None))
    return NamedSharding(mesh, P(data_axis, None, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def state_shardings(state: TrainState, mesh: Mesh, model_axis: str = "model") -> TrainState:
    """Per-leaf NamedShardings for a TrainState.

    Default: everything replicated (pure data parallelism). When the mesh has a
    non-trivial ``model`` axis, the critic's dense-head kernels (the reference's
    131072x1024 linear holds 96% of its parameters, README.md:458 / SURVEY.md C7)
    are sharded along their output-features dim — tensor parallelism for the only
    TP-worthy tensors in the model (SURVEY.md §2.3). The matching optimizer-state
    leaves shard identically (their tree paths mirror the param paths), and GSPMD
    derives the partitioned matmuls + collectives.
    """
    rep = P()
    tp = mesh.shape.get(model_axis, 1) > 1

    n_model = mesh.shape.get(model_axis, 1)

    def rule(path, leaf):
        if tp and hasattr(leaf, "ndim") and leaf.ndim == 2 and leaf.shape[-1] % n_model == 0:
            keys = [str(getattr(p, "key", "")) for p in path]
            if any(k.startswith("linear_") for k in keys) and keys and keys[-1] == "kernel":
                return NamedSharding(mesh, P(None, model_axis))
        return NamedSharding(mesh, rep)

    return jax.tree_util.tree_map_with_path(rule, state)


def shard_state(state: TrainState, mesh: Mesh, model_axis: str = "model") -> TrainState:
    """Place the state per ``state_shardings`` (replicated, or TP for the critic
    head when the mesh has a model axis).

    In a multi-process run (mesh spanning hosts over DCN) ``jax.device_put``
    cannot target non-addressable devices; every process holds the identical
    full state (deterministic init from the same seed), so each leaf is
    assembled into a global array by slicing the process-local full copy per
    the leaf's sharding (``make_array_from_callback`` materializes only the
    addressable shards). Works for replicated leaves AND sharded ones — e.g.
    critic-head TP composed with cross-host DP (BASELINE config 5 at pod
    scale)."""
    shardings = state_shardings(state, mesh, model_axis=model_axis)
    if jax.process_count() > 1:
        def to_global(leaf, sh):
            arr = np.asarray(leaf)
            return jax.make_array_from_callback(
                arr.shape, sh, lambda idx, a=arr: a[idx])

        return jax.tree.map(to_global, state, shardings)
    return jax.device_put(state, shardings)


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place every leaf of the state according to the mesh (see shard_state)."""
    return shard_state(state, mesh)


def make_parallel_train_step(cfg: Config, mesh: Mesh, do_g_update: bool = True,
                             state_spec: Optional[TrainState] = None,
                             batch_spec: Optional[NamedSharding] = None,
                             do_gp: bool = True,
                             gp_lambda_scale: float = 1.0) -> Callable:
    """pjit-compiled train step: batch sharded along the data axis (pass
    ``batch_spec`` to add spatial sharding), params/opt state placed per
    ``state_shardings`` (replicated, plus TP of the critic head over the model
    axis when present) and donated.

    XLA emits the ICI all-reduces for gradients and cross-replica batch-norm
    statistics from the sharding annotations alone.
    """
    if cfg.optim.scheme == "three":
        if not do_gp:
            # the Larsen step has no GP term to skip — honoring the flag
            # silently would hand back the full paper step to a caller that
            # asked for a cheaper variant
            raise ValueError(
                "do_gp=False is meaningless for the three-optimizer paper "
                "scheme (no gradient penalty); lazy GP applies to the "
                "two-optimizer WGAN-GP step only")
        step = make_paper_train_step(cfg)
    else:
        step = make_train_step(cfg, do_g_update=do_g_update, do_gp=do_gp,
                               gp_lambda_scale=gp_lambda_scale)
    rep = replicated(mesh)
    bsh = batch_spec if batch_spec is not None else batch_sharding(mesh, mesh.axis_names[0])
    if state_spec is None:
        # shardings need leaf structure; jit infers out_shardings from inputs when
        # we pass AUTO-like replicated specs — build from an abstract state
        in_state = rep
        out_state = rep
    else:
        in_state = state_spec
        out_state = state_spec
    return jax.jit(
        step,
        in_shardings=(in_state, bsh, rep),
        out_shardings=(out_state, rep),
        donate_argnums=0,
    )
