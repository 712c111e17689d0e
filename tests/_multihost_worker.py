"""Worker for the two-process multi-host test (run via subprocess, never imported
by pytest directly).

Each process provisions 4 virtual CPU devices (8 global over 2 processes),
bootstraps DCN via vaegan_tpu.parallel.dist.initialize, feeds ONE global batch
through the process-sharded loader + device_prefetch's
``make_array_from_process_local_data`` branch, and runs ONE data-parallel train
step over the global mesh. Exercises the §2.4 communication backend for real:
jax.distributed + cross-process XLA collectives (gradient allreduce emitted by
GSPMD over the 2x4-device mesh).

Usage: python tests/_multihost_worker.py <coordinator_port> <process_id>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(port: int, pid: int) -> None:
    from vaegan_tpu.parallel import dist

    dist.initialize(coordinator_address=f"localhost:{port}",
                    num_processes=2, process_id=pid)
    assert dist.is_multihost(), "process_count should be 2"
    assert jax.process_count() == 2 and len(jax.devices()) == 8, (
        jax.process_count(), len(jax.devices()))

    import numpy as np

    from vaegan_tpu.config import Config, DiscriminatorConfig, GeneratorConfig
    from vaegan_tpu.data.pipeline import device_prefetch, make_loader
    from vaegan_tpu.parallel import (
        batch_sharding, make_mesh, make_parallel_train_step, shard_state)
    from vaegan_tpu.train import create_train_state

    base = Config()
    cfg = base.replace(
        generator=GeneratorConfig(depth=1, length=1, feature_size=8),
        discriminator=DiscriminatorConfig(
            num_stride_conv1=1, num_features_conv1=8, num_blocks=(1,),
            num_strides_res=(2,), num_features_res=(16,), pool_size=2,
            linear_widths=(16, 8, 8)),
        data=base.data.replace(image_size=16, batch_size=8, synthetic=True,
                               synthetic_size=16),
    )

    # process-sharded loader: global batch 8 -> 4 per host, identical shuffle
    loader = make_loader(cfg.data, seed=0)
    assert loader.process_count == 2 and loader.process_index == pid

    mesh = make_mesh(num_data=8)
    bsh = batch_sharding(mesh)
    it = device_prefetch(iter(loader), bsh, depth=1,
                         global_batch=cfg.data.batch_size)
    batch = next(it)
    assert batch.shape == (8, 16, 16, 1), batch.shape  # GLOBAL batch assembled
    # this process only holds its own half
    local = [s.data for s in batch.addressable_shards]
    assert sum(x.shape[0] for x in local) == 4

    # cross-host duplication check: hash the local shard halves on each process
    # via a psum of a shard-dependent scalar — if both hosts fed the same data
    # (the pre-fix bug) the two per-process sums would be equal
    local_sum = float(np.sum([np.asarray(x, np.float64).sum() for x in local]))

    state = shard_state(create_train_state(cfg, jax.random.key(0)), mesh)
    step = make_parallel_train_step(cfg, mesh, do_g_update=True)
    key = jax.make_array_from_process_local_data(
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
        jax.random.key_data(jax.random.key(2)))
    key = jax.random.wrap_key_data(key)
    new_state, metrics = step(state, batch, key)
    vals = {k: float(jax.device_get(v)) for k, v in metrics.items()}
    assert int(jax.device_get(new_state.step)) == 1
    for k, v in vals.items():
        assert np.isfinite(v), (k, v)

    print(f"MULTIHOST_OK pid={pid} local_sum={local_sum:.6f} "
          f"d_loss={vals['d_loss']:.6f} g_loss={vals['g_loss']:.6f}", flush=True)

    # the production one-call entry point (BASELINE config 5) in the same
    # 2-process setting: shard_state placement + process-sharded default loader
    # + device_prefetch global-batch assembly, 2 full loop steps
    from vaegan_tpu.parallel.train import train_data_parallel

    cfg2 = cfg.replace(train=cfg.train.replace(
        n_epochs=10, max_steps=2, sample_interval=0, log_every=1))
    final_state, logger = train_data_parallel(cfg2)
    assert int(jax.device_get(final_state.step)) == 2
    h = [m for m in logger.history if "_wall_s" not in m]
    assert len(h) == 2 and all(np.isfinite(v) for m in h for v in m.values())
    print(f"TRAINDP_OK pid={pid} d_loss={h[-1]['d_loss']:.6f} "
          f"g_loss={h[-1]['g_loss']:.6f}", flush=True)

    # critic-head TP composed with cross-host DP (BASELINE config 5 at pod
    # scale): 4x2 data x model mesh over the same 8 devices. shard_state
    # assembles the SHARDED leaves from each process's full local copy via
    # make_array_from_callback (pre-round-3 this raised NotImplementedError).
    from jax.sharding import PartitionSpec as P

    from vaegan_tpu.parallel.mesh import state_shardings

    cfg3 = cfg.replace(parallel=cfg.parallel.replace(num_data=4, num_model=2))
    mesh2 = make_mesh(num_data=4, num_model=2)
    state2 = shard_state(create_train_state(cfg3, jax.random.key(0)), mesh2)
    lw = state2.d_params["linear_1"]["kernel"]
    assert lw.sharding.spec == P(None, "model"), lw.sharding.spec
    spec = state_shardings(state2, mesh2)
    step2 = make_parallel_train_step(cfg3, mesh2, do_g_update=True,
                                     state_spec=spec)
    it2 = device_prefetch(loader.iter_batches(0), batch_sharding(mesh2),
                          depth=1, global_batch=cfg.data.batch_size)
    new2, m2 = step2(state2, next(it2), key)
    vals2 = {k: float(jax.device_get(v)) for k, v in m2.items()}
    assert int(jax.device_get(new2.step)) == 1
    for k, v in vals2.items():
        assert np.isfinite(v), (k, v)
    print(f"TP_OK pid={pid} d_loss={vals2['d_loss']:.6f} "
          f"g_loss={vals2['g_loss']:.6f}", flush=True)

    # --- durability across processes (VERDICT r4 #5): orbax checkpoint saved
    # collectively by both processes, then a RESUMED run restores it onto the
    # same 2-process mesh and continues — with EMA tracked under the multi-host
    # mesh through both phases. Config 5 says "pod slice"; this is the proof a
    # multi-host run that dies can actually come back.
    shared_dir = sys.argv[3]
    import jax.numpy as jnp

    cfg4 = cfg.replace(train=cfg.train.replace(
        n_epochs=10, max_steps=2, sample_interval=0, log_every=1,
        ema_decay=0.5, checkpoint_every=1,
        checkpoint_dir=os.path.join(shared_dir, "ckpt")))
    st4, lg4 = train_data_parallel(cfg4)
    assert int(jax.device_get(st4.step)) == 2
    assert st4.g_ema is not None, "EMA must be tracked under the multi-host mesh"

    # phase B: a fresh train_data_parallel call restores the collectively
    # written checkpoint (orbax multi-process coordination) and runs 1 more step
    cfg4b = cfg4.replace(train=cfg4.train.replace(max_steps=3))
    st4b, lg4b = train_data_parallel(cfg4b, resume=True)
    assert int(jax.device_get(st4b.step)) == 3
    assert st4b.g_ema is not None, "restore must keep the EMA leaf"
    h4 = [m for m in lg4b.history if "_wall_s" not in m]
    assert len(h4) == 1, ("resume must fast-forward past completed steps", h4)
    assert all(np.isfinite(v) for m in h4 for v in m.values())

    # replicated scalar digests (device_get of a non-addressable global array
    # is illegal in multi-process; a jitted full-reduce scalar is replicated)
    digest = jax.jit(lambda t: sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                                   for x in jax.tree.leaves(t)))
    ema_digest = float(jax.device_get(digest(st4b.g_ema)))
    par_digest = float(jax.device_get(digest(st4b.g_params)))
    assert np.isfinite(ema_digest) and np.isfinite(par_digest)
    # EMA is a genuinely distinct trajectory from the live params
    assert ema_digest != par_digest
    print(f"DURABLE_OK pid={pid} step={int(jax.device_get(st4b.step))} "
          f"d_loss={h4[-1]['d_loss']:.6f} ema_digest={ema_digest:.6f} "
          f"par_digest={par_digest:.6f}", flush=True)

    # --- the paper-faithful three-optimizer step (BASELINE config 3) across
    # hosts: Dis_l + BCE losses, enc/dec/disc grads each allreduced over DCN
    cfg5 = cfg.replace(
        loss=cfg.loss.replace(
            adversarial="bce", reconstruction="dis_l", clip_value=None,
            lambda_gp=0.0, kl_reduction="mean", adversarial_weight=1.0,
            reconstruction_weight=1.0, kl_weight=1.0),
        optim=cfg.optim.replace(scheme="three"),
    )
    state5 = shard_state(create_train_state(cfg5, jax.random.key(0)), mesh)
    step5 = make_parallel_train_step(cfg5, mesh, do_g_update=True)
    new5, m5 = step5(state5, batch, key)
    vals5 = {k: float(jax.device_get(v)) for k, v in m5.items()}
    assert int(jax.device_get(new5.step)) == 1
    for k, v in vals5.items():
        assert np.isfinite(v), (k, v)
    print(f"PAPER_OK pid={pid} d_loss={vals5['d_loss']:.6f} "
          f"g_loss={vals5['g_loss']:.6f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]))
