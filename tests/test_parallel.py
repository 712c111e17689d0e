"""Data-parallel tests on the 8-device virtual CPU mesh (conftest forces
--xla_force_host_platform_device_count=8) — the multi-device story the reference
never had (SURVEY.md §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vaegan_tpu.config import Config, DiscriminatorConfig, GeneratorConfig
from vaegan_tpu.parallel import (
    batch_sharding,
    make_mesh,
    make_parallel_train_step,
    replicate_state,
)
from vaegan_tpu.train import create_train_state, make_train_step


def tiny_cfg() -> Config:
    base = Config()
    return base.replace(
        generator=GeneratorConfig(depth=1, length=1, feature_size=8),
        discriminator=DiscriminatorConfig(
            num_stride_conv1=1, num_features_conv1=8, num_blocks=(1,),
            num_strides_res=(2,), num_features_res=(16,), pool_size=2,
            linear_widths=(16, 8, 8)),
        data=base.data.replace(image_size=16, batch_size=16),
    )


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual devices"
    return make_mesh()


class TestMesh:
    def test_mesh_shape(self, mesh):
        assert mesh.devices.shape == (8, 1)
        assert mesh.axis_names == ("data", "model")

    def test_batch_is_sharded(self, mesh):
        b = jax.device_put(np.zeros((16, 16, 16, 1), np.float32), batch_sharding(mesh))
        assert len(b.sharding.device_set) == 8


class TestParallelStep:
    def test_step_runs_on_8_devices(self, mesh):
        cfg = tiny_cfg()
        state = replicate_state(create_train_state(cfg, jax.random.key(0)), mesh)
        step = make_parallel_train_step(cfg, mesh, do_g_update=True)
        batch = jax.device_put(
            jax.random.uniform(jax.random.key(1), (16, 16, 16, 1)),
            batch_sharding(mesh))
        key = jax.device_put(jax.random.key(2), NamedSharding(mesh, P()))
        new_state, metrics = step(state, batch, key)
        assert int(jax.device_get(new_state.step)) == 1
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k

    def test_dp_matches_single_device(self, mesh):
        """The GSPMD-sharded step must compute EXACTLY the single-device result:
        global BN stats, global loss means, allreduced grads."""
        cfg = tiny_cfg()
        batch_host = np.asarray(jax.random.uniform(jax.random.key(1), (16, 16, 16, 1)))
        key = jax.random.key(2)

        # single device
        s0 = create_train_state(cfg, jax.random.key(0))
        step1 = jax.jit(make_train_step(cfg, do_g_update=True))
        s1, m1 = step1(s0, jnp.asarray(batch_host), key)

        # 8-way data parallel
        s0b = replicate_state(create_train_state(cfg, jax.random.key(0)), mesh)
        stepN = make_parallel_train_step(cfg, mesh, do_g_update=True)
        bN = jax.device_put(batch_host, batch_sharding(mesh))
        kN = jax.device_put(key, NamedSharding(mesh, P()))
        sN, mN = stepN(s0b, bN, kN)

        for k in m1:
            np.testing.assert_allclose(
                float(m1[k]), float(mN[k]), rtol=2e-4, atol=1e-5, err_msg=k)
        # params equal after one step (tolerance: global-sum reduction order
        # differs between 1 and 8 shards; the losses are float32 sums over
        # ~40M elements)
        l1 = jax.tree.leaves(jax.device_get(s1.g_params))
        lN = jax.tree.leaves(jax.device_get(sN.g_params))
        for a, b in zip(l1, lN):
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-5)

    def test_batchnorm_stats_are_global(self, mesh):
        """Per-shard batches with different means must produce identical (global)
        running stats vs the unsharded computation."""
        cfg = tiny_cfg()
        # craft a batch whose per-device shards have wildly different statistics
        batch = np.concatenate(
            [np.full((2, 16, 16, 1), i, np.float32) for i in range(8)], axis=0)
        s0 = create_train_state(cfg, jax.random.key(0))
        step1 = jax.jit(make_train_step(cfg, do_g_update=True))
        s1, _ = step1(s0, jnp.asarray(batch), jax.random.key(2))

        s0b = replicate_state(create_train_state(cfg, jax.random.key(0)), mesh)
        stepN = make_parallel_train_step(cfg, mesh, do_g_update=True)
        sN, _ = stepN(s0b, jax.device_put(batch, batch_sharding(mesh)),
                      jax.device_put(jax.random.key(2), NamedSharding(mesh, P())))
        a = jax.tree.leaves(jax.device_get(s1.g_stats))
        b = jax.tree.leaves(jax.device_get(sN.g_stats))
        for x, y in zip(a, b):
            np.testing.assert_allclose(x, y, rtol=2e-4, atol=1e-6)


class TestTensorParallel:
    def test_tp_critic_head_matches_replicated(self):
        """4-way data x 2-way model mesh: the critic's linear kernels shard over
        the model axis; the step result must match pure DP/single-device."""
        from vaegan_tpu.parallel import shard_state, state_shardings
        cfg = tiny_cfg()
        batch_host = np.asarray(jax.random.uniform(jax.random.key(1), (16, 16, 16, 1)))
        key = jax.random.key(2)

        s0 = create_train_state(cfg, jax.random.key(0))
        step1 = jax.jit(make_train_step(cfg, do_g_update=True))
        s1, m1 = step1(s0, jnp.asarray(batch_host), key)

        mesh_tp = make_mesh(num_data=4, num_model=2)
        spec = state_shardings(create_train_state(cfg, jax.random.key(0)), mesh_tp)
        # the critic head kernels actually got a model-sharded spec
        tp_leaves = [s for s in jax.tree.leaves(spec)
                     if s.spec == jax.sharding.PartitionSpec(None, "model")]
        assert len(tp_leaves) > 0
        sTP = shard_state(create_train_state(cfg, jax.random.key(0)), mesh_tp)
        stepTP = make_parallel_train_step(cfg, mesh_tp, do_g_update=True, state_spec=spec)
        bTP = jax.device_put(batch_host, batch_sharding(mesh_tp))
        kTP = jax.device_put(key, NamedSharding(mesh_tp, P()))
        s2, m2 = stepTP(sTP, bTP, kTP)
        for k in m1:
            np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                       rtol=2e-3, atol=1e-5, err_msg=k)
        l1 = jax.tree.leaves(jax.device_get(s1.d_params))
        l2 = jax.tree.leaves(jax.device_get(s2.d_params))
        for a, b in zip(l1, l2):
            # atol sized to the weight-clamp scale (0.01): TP shards the head
            # matmuls, so psum reduction order differs from the replicated
            # step, and the GP grad-of-grad amplifies that float noise into
            # O(1e-4) on individual weights near the clamp boundary (observed:
            # 1/2304 elements at 2.3e-4 on one eps stream). Exactness up to
            # reduction order is what sharding can promise; the metrics above
            # stay tight.
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=5e-4)


class TestPaperStepParallel:
    def test_paper_step_dp_matches_single_device(self, mesh):
        """BASELINE config 3 (three-optimizer Larsen step) under BASELINE
        config 5's data parallelism: the sharded step must reproduce the
        single-device result (global BN stats, allreduced per-group grads)."""
        from vaegan_tpu.train import make_paper_train_step

        base = tiny_cfg()
        cfg = base.replace(
            loss=base.loss.replace(adversarial="bce", reconstruction="dis_l",
                                   lambda_gp=0.0, clip_value=None,
                                   kl_reduction="mean"),
            optim=base.optim.replace(scheme="three"))
        batch_host = np.asarray(jax.random.uniform(jax.random.key(1), (16, 16, 16, 1)))
        key = jax.random.key(2)

        s0 = create_train_state(cfg, jax.random.key(0))
        step1 = jax.jit(make_paper_train_step(cfg))
        s1, m1 = step1(s0, jnp.asarray(batch_host), key)

        s0b = replicate_state(create_train_state(cfg, jax.random.key(0)), mesh)
        stepN = make_parallel_train_step(cfg, mesh)
        sN, mN = stepN(s0b, jax.device_put(batch_host, batch_sharding(mesh)),
                       jax.device_put(key, NamedSharding(mesh, P())))
        for k in m1:
            np.testing.assert_allclose(float(m1[k]), float(mN[k]),
                                       rtol=2e-3, atol=1e-5, err_msg=k)
        for name, a_tree, b_tree in (("g_params", s1.g_params, sN.g_params),
                                     ("d_params", s1.d_params, sN.d_params)):
            for a, b in zip(jax.tree.leaves(jax.device_get(a_tree)),
                            jax.tree.leaves(jax.device_get(b_tree))):
                np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-5,
                                           err_msg=name)


class TestCombinedSharding:
    def test_dp_tp_spatial_step_matches_single_device(self):
        """The full composite strategy the driver's dryrun exercises (4-way data
        x 2-way model mesh, critic-head TP + spatial-H batch sharding + DP):
        one train step must reproduce the single-device step."""
        from vaegan_tpu.parallel import shard_state, state_shardings
        cfg = tiny_cfg()
        batch_host = np.asarray(jax.random.uniform(jax.random.key(1), (16, 16, 16, 1)))
        key = jax.random.key(2)

        s0 = create_train_state(cfg, jax.random.key(0))
        step1 = jax.jit(make_train_step(cfg, do_g_update=True))
        s1, m1 = step1(s0, jnp.asarray(batch_host), key)

        mesh2d = make_mesh(num_data=4, num_model=2)
        spec = state_shardings(create_train_state(cfg, jax.random.key(0)), mesh2d)
        bsh = batch_sharding(mesh2d, "data", spatial_axis="model")
        sC = shard_state(create_train_state(cfg, jax.random.key(0)), mesh2d)
        stepC = make_parallel_train_step(cfg, mesh2d, do_g_update=True,
                                         state_spec=spec, batch_spec=bsh)
        bC = jax.device_put(batch_host, bsh)
        assert len(bC.sharding.device_set) == 8  # sharded over BOTH axes
        kC = jax.device_put(key, NamedSharding(mesh2d, P()))
        s2, m2 = stepC(sC, bC, kC)
        for k in m1:
            np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                       rtol=2e-3, atol=1e-5, err_msg=k)
        for name, a_tree, b_tree in (("g_params", s1.g_params, s2.g_params),
                                     ("d_params", s1.d_params, s2.d_params)):
            for a, b in zip(jax.tree.leaves(jax.device_get(a_tree)),
                            jax.tree.leaves(jax.device_get(b_tree))):
                np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-5,
                                           err_msg=name)


class TestSpatialSharding:
    def test_spatially_sharded_forward_is_exact(self):
        """Resolution is this model's sequence axis (SURVEY.md §2.3): sharding H
        over a mesh axis must be numerically exact (GSPMD conv halo exchange)."""
        from vaegan_tpu.models import UnsupervisedGeneratorNetwork
        mesh = make_mesh(num_data=2, num_model=4, model_axis="spatial")
        gen = UnsupervisedGeneratorNetwork(cfg=GeneratorConfig(depth=1, length=1, feature_size=8))
        x = jax.random.uniform(jax.random.key(0), (4, 32, 32, 1))
        v = gen.init({"params": jax.random.key(1), "dropout": jax.random.key(2),
                      "noise": jax.random.key(3)}, x, train=False)
        ref = gen.apply(v, x, train=False)[0]
        bs = batch_sharding(mesh, "data", spatial_axis="spatial")
        out = jax.jit(
            lambda v, x: gen.apply(v, x, train=False)[0],
            in_shardings=(NamedSharding(mesh, P()), bs),
        )(jax.device_put(v, NamedSharding(mesh, P())), jax.device_put(x, bs))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestTrainDataParallel:
    def test_one_call_dp_training(self, tmp_path):
        """train_data_parallel: BASELINE config 5's shape on the virtual mesh."""
        from vaegan_tpu.parallel.train import train_data_parallel
        cfg = tiny_cfg()
        cfg = cfg.replace(
            data=cfg.data.replace(batch_size=16, synthetic=True, synthetic_size=32),
            train=cfg.train.replace(n_epochs=1, sample_interval=10,
                                    sample_dir=str(tmp_path / "s")))
        state, logger = train_data_parallel(cfg)
        assert int(jax.device_get(state.step)) == 2  # 32 imgs / batch 16
        h = [m for m in logger.history if "_wall_s" not in m]
        assert len(h) == 2 and all(np.isfinite(v) for m in h for v in m.values())

    def test_lazy_gp_under_dp(self, tmp_path):
        """gp_every composes with the GSPMD step map: the one-call DP entry
        compiles the (do_g, do_gp) variants and the loop schedules them —
        the gp metric is nonzero exactly on every gp_every-th global step."""
        from vaegan_tpu.parallel.train import train_data_parallel
        cfg = tiny_cfg()
        cfg = cfg.replace(
            data=cfg.data.replace(batch_size=16, synthetic=True, synthetic_size=64),
            train=cfg.train.replace(n_epochs=1, gp_every=2, sample_interval=0,
                                    sample_dir=str(tmp_path / "s")))
        state, logger = train_data_parallel(cfg)
        gps = [m["gp"] for m in logger.history if "gp" in m]
        assert len(gps) == 4
        assert gps[0] != 0.0 and gps[2] != 0.0
        assert gps[1] == 0.0 and gps[3] == 0.0

    def test_grad_accum_under_dp(self, mesh):
        """grad_accum's microbatch scan composes with the GSPMD-sharded step."""
        cfg = tiny_cfg()
        cfg = cfg.replace(train=cfg.train.replace(grad_accum=2))
        state = replicate_state(create_train_state(cfg, jax.random.key(0)), mesh)
        step = make_parallel_train_step(cfg, mesh, do_g_update=True)
        b = jax.device_put(
            np.asarray(jax.random.uniform(jax.random.key(1), (16, 16, 16, 1))),
            batch_sharding(mesh))
        k = jax.device_put(jax.random.key(2), NamedSharding(mesh, P()))
        s, m = step(state, b, k)
        assert int(jax.device_get(s.step)) == 1
        assert all(np.isfinite(float(v)) for v in m.values())

    def test_checkpoint_resume_under_dp(self, tmp_path):
        """Orbax save/restore of mesh-placed state through the one-call entry."""
        from vaegan_tpu.parallel.train import train_data_parallel
        cfg = tiny_cfg()
        cfg = cfg.replace(
            data=cfg.data.replace(batch_size=16, synthetic=True, synthetic_size=64),
            train=cfg.train.replace(n_epochs=2, max_steps=3, sample_interval=0,
                                    checkpoint_dir=str(tmp_path / "ckpt"),
                                    checkpoint_every=1))
        s1, _ = train_data_parallel(cfg)
        assert int(jax.device_get(s1.step)) == 3
        cfg2 = cfg.replace(train=cfg.train.replace(max_steps=5))
        s2, _ = train_data_parallel(cfg2, resume=True)
        assert int(jax.device_get(s2.step)) == 5

    def test_batch_divisibility_error(self):
        from vaegan_tpu.parallel.train import train_data_parallel
        cfg = tiny_cfg()
        cfg = cfg.replace(data=cfg.data.replace(batch_size=15, synthetic=True))
        with pytest.raises(ValueError, match="divisible"):
            train_data_parallel(cfg)

    def test_hbm_cache_under_dp_matches_host_feed(self, tmp_path):
        """data.hbm_cache under the one-call DP entry: the dataset is staged
        replicated over the mesh and batches gather straight into the
        data-sharded layout — trained params identical to the host feed."""
        from vaegan_tpu.parallel.train import train_data_parallel
        cfg = tiny_cfg()
        cfg = cfg.replace(
            data=cfg.data.replace(batch_size=16, synthetic=True,
                                  synthetic_size=32),
            train=cfg.train.replace(n_epochs=1, sample_interval=0,
                                    sample_dir=str(tmp_path / "s")))
        s_host, _ = train_data_parallel(cfg)
        s_dev, _ = train_data_parallel(
            cfg.replace(data=cfg.data.replace(hbm_cache=True)))
        assert int(jax.device_get(s_dev.step)) == 2
        for a, b in zip(jax.tree.leaves(jax.device_get(s_host.g_params)),
                        jax.tree.leaves(jax.device_get(s_dev.g_params))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
