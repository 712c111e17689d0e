"""End-to-end slice: tiny synthetic training run through the full loop, inference
APIs, checkpoint round-trip, metric sinks, sample dumps."""

import io
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaegan_tpu import inference
from vaegan_tpu.api import experiment, visualize_reconstructions
from vaegan_tpu.config import Config, DiscriminatorConfig, GeneratorConfig
from vaegan_tpu.data.pipeline import DataLoader, SyntheticDataset
from vaegan_tpu.train import create_train_state
from vaegan_tpu.train.loop import train
from vaegan_tpu.utils.metrics import JsonlSink, MetricsLogger, StdoutSink


def tiny_cfg(tmp_path, **train_kw) -> Config:
    base = Config()
    return base.replace(
        generator=GeneratorConfig(depth=1, length=1, feature_size=8),
        discriminator=DiscriminatorConfig(
            num_stride_conv1=1, num_features_conv1=8, num_blocks=(1,),
            num_strides_res=(2,), num_features_res=(16,), pool_size=2,
            linear_widths=(16, 8, 8)),
        data=base.data.replace(image_size=16, batch_size=4, synthetic=True,
                               synthetic_size=16),
        train=base.train.replace(
            n_epochs=1, sample_interval=2, sample_dir=str(tmp_path / "samples"),
            **train_kw),
    )


class TestLoop:
    def test_end_to_end_tiny_run(self, tmp_path):
        cfg = tiny_cfg(tmp_path)
        out = io.StringIO()
        logger = MetricsLogger(sinks=[StdoutSink(out), JsonlSink(str(tmp_path / "m.jsonl"))])
        state, logger = train(cfg, logger=logger)
        assert int(jax.device_get(state.step)) == 4  # 16 imgs / batch 4
        lines = out.getvalue().strip().splitlines()
        assert len(lines) == 4
        # reference-formatted line (README.md:837-839)
        assert lines[0].startswith("[Epoch 0/1] [Batch 0/4] [D loss: ")
        assert "adversarial loss" in lines[0]
        # jsonl sink wrote reference-named keys (README.md:842-849)
        import json
        rec = json.loads(open(tmp_path / "m.jsonl").readline())
        for k in ("D loss", "G loss", "Recon loss", "KL", "D Real loss",
                  "D Fake loss", "adversarial loss"):
            assert k in rec, k
        # sample grids dumped at batches 0 and 2
        dumps = sorted(os.listdir(tmp_path / "samples"))
        assert dumps == ["0.png", "2.png"]

    def test_max_steps_budget(self, tmp_path):
        # 16 imgs / batch 4 x 3 epochs = 12 steps unbounded; budget stops at 5
        cfg = tiny_cfg(tmp_path, max_steps=5)
        cfg = cfg.replace(train=cfg.train.replace(n_epochs=3))
        state, logger = train(cfg)
        assert int(jax.device_get(state.step)) == 5
        assert len([m for m in logger.history if "_wall_s" not in m]) == 5

    def test_sample_dir_wiped_on_fresh_run_kept_on_resume(self, tmp_path):
        """The reference deletes+recreates its inference-image folder at every
        training start (shutil.rmtree, README.md:765-766); a resumed run keeps
        prior grids."""
        cfg = tiny_cfg(tmp_path, checkpoint_dir=str(tmp_path / "ck"),
                       checkpoint_every=2)
        stale = tmp_path / "samples" / "stale.png"
        stale.parent.mkdir(parents=True, exist_ok=True)
        stale.write_bytes(b"x")
        train(cfg)
        assert not stale.exists()  # wiped like the reference
        marker = tmp_path / "samples" / "0.png"
        assert marker.exists()
        train(cfg, resume=True)
        assert marker.exists()  # resume preserves the folder

    def test_partial_tail_batch_trains(self, tmp_path):
        """drop_last=False (the reference's DataLoader default, README.md:96-99):
        a dataset not divisible by the batch size yields a short tail batch —
        the step re-jits for the tail shape and the loop completes."""
        cfg = tiny_cfg(tmp_path)
        cfg = cfg.replace(data=cfg.data.replace(synthetic_size=18, batch_size=4))
        state, logger = train(cfg)
        assert int(jax.device_get(state.step)) == 5  # 4 full + 1 tail(2)
        h = [m for m in logger.history if "_wall_s" not in m]
        assert len(h) == 5 and all(np.isfinite(v) for m in h for v in m.values())

    def test_max_steps_not_exceeded_on_resume(self, tmp_path):
        """Resuming a run whose checkpoint already sits at the budget must not
        execute (and re-checkpoint) extra steps: the budget check runs BEFORE a
        step, not only after."""
        cfg = tiny_cfg(tmp_path, max_steps=3,
                       checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_every=1)
        cfg = cfg.replace(train=cfg.train.replace(n_epochs=5, sample_interval=0))
        state, _ = train(cfg)
        assert int(jax.device_get(state.step)) == 3
        state2, logger2 = train(cfg, resume=True)
        assert int(jax.device_get(state2.step)) == 3  # no overshoot
        assert [m for m in logger2.history if "_wall_s" not in m] == []

    def test_grad_accum_drops_partial_tail_batch(self, tmp_path):
        """With grad_accum > 1 the default loader forces drop_last: a partial
        tail batch (18 % 4 = 2, not divisible by grad_accum 2) would otherwise
        abort training at the end of epoch 1 (ADVICE r2)."""
        cfg = tiny_cfg(tmp_path, grad_accum=2)
        cfg = cfg.replace(data=cfg.data.replace(synthetic_size=18, batch_size=4))
        state, logger = train(cfg)
        assert int(jax.device_get(state.step)) == 4  # tail dropped: 4 full batches
        h = [m for m in logger.history if "_wall_s" not in m]
        assert len(h) == 4 and all(np.isfinite(v) for m in h for v in m.values())

    def test_resume_ignores_interrupted_checkpoint_tmp(self, tmp_path):
        """A crash DURING an orbax save leaves a ``<step>.orbax-checkpoint-tmp``
        dir next to the last complete checkpoint; resume must restore the
        complete one and train to the budget (suite-enforced version of the
        round-2 kill-mid-save soak, BENCH_NOTES.md)."""
        ckdir = tmp_path / "ck"
        cfg = tiny_cfg(tmp_path, max_steps=2, checkpoint_dir=str(ckdir),
                       checkpoint_every=1)
        cfg = cfg.replace(train=cfg.train.replace(n_epochs=5, sample_interval=0))
        train(cfg)
        # fabricate an interrupted step-3 save: a tmp dir with partial content
        tmp_ck = ckdir / "3.orbax-checkpoint-tmp"
        tmp_ck.mkdir()
        (tmp_ck / "manifest.ocdbt").write_bytes(b"\x00partial")
        from vaegan_tpu.checkpoint import CheckpointManager
        mgr = CheckpointManager(str(ckdir))
        assert mgr.latest_step() == 2  # the tmp dir is not a restorable step
        mgr.close()
        cfg2 = cfg.replace(train=cfg.train.replace(max_steps=4))
        state, logger = train(cfg2, resume=True)
        assert int(jax.device_get(state.step)) == 4
        executed = [m for m in logger.history if "_wall_s" not in m]
        assert len(executed) == 2  # resumed from 2, ran exactly 2 more

    def test_n_critics_scheduling(self, tmp_path):
        cfg = tiny_cfg(tmp_path, n_critics=2)
        state, logger = train(cfg)
        # G half ran on batches 0, 2 only: g metrics identical on 0/1 pairs
        h = [m for m in logger.history if "_wall_s" not in m]
        assert h[0]["g_loss"] == h[1]["g_loss"]          # stale repeat
        assert h[2]["g_loss"] != h[1]["g_loss"]
        assert h[0]["d_loss"] != h[1]["d_loss"]

    def test_checkpoint_roundtrip(self, tmp_path):
        cfg = tiny_cfg(tmp_path, checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_every=2)
        state, _ = train(cfg)
        from vaegan_tpu.checkpoint import CheckpointManager
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        template = create_train_state(cfg, jax.random.key(0))
        restored = mgr.restore(template)
        assert int(jax.device_get(restored.step)) == 4
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(restored.g_params)[0]),
            np.asarray(jax.device_get(jax.tree.leaves(state.g_params)[0])))
        mgr.close()


class TestInference:
    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("run")
        cfg = tiny_cfg(tmp)
        state, _ = train(cfg)
        return cfg, state

    def test_evaluate_mse_empty_loader_raises(self, trained):
        """An empty loader must not score a perfect 0.0 (the search ranks
        trials by this number)."""
        cfg, state = trained
        with pytest.raises(ValueError, match="empty loader"):
            inference.evaluate_mse(cfg, state, iter(()))

    def test_recalibrate_bn_stats_repairs_polluted_stats(self, tmp_path):
        """Standing-stats recalibration: garbage running BN stats (the drift
        signature of a long adversarial run, BENCH_NOTES 256²x9-epochs) are
        re-estimated from the final params and the eval metric recovers.

        Needs a model trained long enough that its BN running stats genuinely
        matter (a near-init model's stats squash activations and accidentally
        score BETTER than true moments), hence its own 160-step fixture."""
        cfg = tiny_cfg(tmp_path)
        cfg = cfg.replace(train=cfg.train.replace(n_epochs=40, sample_interval=0))
        state, _ = train(cfg)
        from vaegan_tpu.data.pipeline import make_loader
        loader = make_loader(cfg.data, seed=0)
        base = inference.evaluate_mse(cfg, state, iter(loader))
        # pollute: scale/shift every running stat far from the data
        bad = jax.tree.map(lambda x: x * 400.0 + 20.0, state.g_stats)
        polluted = state.replace(g_stats=bad)
        hurt = inference.evaluate_mse(cfg, polluted, iter(loader))
        assert hurt > base * 10, (base, hurt)
        fixed = inference.recalibrate_bn_stats(
            cfg, polluted, make_loader(cfg.data, seed=0), num_batches=60)
        recovered = inference.evaluate_mse(cfg, fixed, iter(loader))
        assert recovered < base * 1.3, (base, hurt, recovered)
        # params untouched; only batch_stats replaced; deterministic
        for a, b in zip(jax.tree.leaves(state.g_params),
                        jax.tree.leaves(fixed.g_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        again = inference.recalibrate_bn_stats(
            cfg, polluted, make_loader(cfg.data, seed=0), num_batches=60)
        for a, b in zip(jax.tree.leaves(fixed.g_stats),
                        jax.tree.leaves(again.g_stats)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_recalibrate_empty_loader_raises(self, trained):
        cfg, state = trained
        with pytest.raises(ValueError, match="empty loader"):
            inference.recalibrate_bn_stats(cfg, state, iter(()))

    def test_mask_injection_rejected_under_full_pallas_fusion(self, trained):
        """The fused block kernel bypasses the Dropout modules, so a parity
        mask replay under use_pallas='all' must fail loudly, not silently
        compare different dropout."""
        from vaegan_tpu.train import make_train_step
        cfg, _ = trained
        cfg_all = cfg.replace(train=cfg.train.replace(use_pallas="all"))
        with pytest.raises(ValueError, match="mask"):
            make_train_step(cfg_all, do_g_update=True,
                            inject={"g_masks": {}})

    def test_reconstruct(self, trained):
        cfg, state = trained
        batch = jnp.asarray(SyntheticDataset(4, 16).load_batch([0, 1, 2, 3]))
        recon, mse = inference.reconstruct(cfg, state, batch)
        assert recon.shape == batch.shape
        assert np.isfinite(float(mse))

    def test_sample_prior(self, trained):
        cfg, state = trained
        imgs = inference.sample(cfg, state, jax.random.key(0), n=3)
        assert imgs.shape == (3, 16, 16, 1)
        assert bool(jnp.isfinite(imgs).all())
        # different keys -> different samples
        imgs2 = inference.sample(cfg, state, jax.random.key(1), n=3)
        assert not jnp.allclose(imgs, imgs2)

    def test_interpolate(self, trained):
        cfg, state = trained
        ds = SyntheticDataset(8, 16)
        x1 = jnp.asarray(ds.load_batch([0, 1]))
        x2 = jnp.asarray(ds.load_batch([2, 3]))
        seq = inference.interpolate(cfg, state, x1, x2, steps=5)
        assert seq.shape == (5, 2, 16, 16, 1)
        # endpoints equal the direct reconstructions of x1/x2 (z = encode means)
        r1, _ = inference.reconstruct(cfg, state, x1)
        np.testing.assert_allclose(np.asarray(seq[0]), np.asarray(r1), rtol=1e-4, atol=1e-5)

    def test_save_visual_evidence_writes_all_three(self, trained, tmp_path):
        cfg, state = trained
        batch = SyntheticDataset(8, 16).load_batch(range(8))
        written = inference.save_visual_evidence(
            cfg, state, batch, tmp_path, key=jax.random.key(1), prefix="x_")
        assert set(written) == {"recon_panel", "samples", "interpolation"}
        for name, path in written.items():
            p = Path(path)
            assert p.exists() and p.stat().st_size > 0, name
            assert p.name.startswith("x_")

    def test_visualize_reconstructions_api(self, trained, tmp_path):
        cfg, state = trained
        dl = DataLoader(SyntheticDataset(8, 16), 4, shuffle=False, prefetch_batches=0)
        mse = visualize_reconstructions(cfg, state, dl, num_images=4,
                                        out_path=str(tmp_path / "recon.png"))
        assert np.isfinite(mse)
        assert (tmp_path / "recon.png").exists()


class TestExperimentApi:
    def test_experiment_surface(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        state, cfg = experiment(
            network_depth=1, network_length=1, feature_size=8,
            discriminator_params=dict(
                num_stride_conv1=1, num_features_conv1=8, num_blocks=[1],
                num_strides_res=[2], num_features_res=[16]),
            n_epochs=1, image_size=16, batch_size=4, synthetic_data=True,
            adversarial_loss_weight=0.0)
        assert int(jax.device_get(state.step)) > 0

    def test_experiment_neptune_knob(self, tmp_path, monkeypatch):
        """The reference's use_neptune path (README.md:768-773, 842-857): the 7
        channels stream to the injected run object and run.stop() fires."""
        monkeypatch.chdir(tmp_path)

        class FakeChannel(list):
            append = list.append

        class FakeRun(dict):
            def __init__(self):
                super().__init__()
                self.stopped = False

            def __getitem__(self, k):
                return self.setdefault(k, FakeChannel())

            def stop(self):
                self.stopped = True

        run = FakeRun()
        experiment(
            network_depth=1, network_length=1, feature_size=8,
            discriminator_params=dict(
                num_stride_conv1=1, num_features_conv1=8, num_blocks=[1],
                num_strides_res=[2], num_features_res=[16]),
            n_epochs=1, image_size=16, batch_size=4, synthetic_data=True,
            neptune_run=run)
        assert run.stopped  # README.md:856-857
        for ch in ("D loss", "G loss", "Recon loss", "KL", "D Real loss",
                   "D Fake loss", "adversarial loss"):
            # one append per batch: 1200 synthetic images / batch 4 = 300
            assert len(run[ch]) == 300, ch


class TestResume:
    def test_resume_continues_from_checkpoint(self, tmp_path):
        cfg = tiny_cfg(tmp_path, checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=2)
        # first run: full epoch (4 steps), checkpoints at 2 and 4
        state1, _ = train(cfg)
        # second run with 2 epochs total, resuming: fast-forwards past step 4
        cfg2 = cfg.replace(train=cfg.train.replace(n_epochs=2))
        state2, logger = train(cfg2, resume=True)
        assert int(jax.device_get(state2.step)) == 8
        steps_run = sum(1 for m in logger.history if "_wall_s" not in m)
        assert steps_run == 4  # only the second epoch executed

    def test_resume_round_trips_generator_ema(self, tmp_path):
        """ema_decay on: the g_ema leaf is checkpointed and restored (and keeps
        lagging the live params after resume)."""
        cfg = tiny_cfg(tmp_path, checkpoint_dir=str(tmp_path / "ck"),
                       checkpoint_every=2, ema_decay=0.9)
        state1, _ = train(cfg)
        assert state1.g_ema is not None
        cfg2 = cfg.replace(train=cfg.train.replace(n_epochs=2))
        state2, _ = train(cfg2, resume=True)
        assert state2.g_ema is not None
        leaves_e = jax.tree.leaves(state2.g_ema)
        leaves_p = jax.tree.leaves(state2.g_params)
        assert len(leaves_e) == len(leaves_p)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves_e)
        # after 8 G updates the EMA still lags the live params
        assert any(not np.allclose(np.asarray(a), np.asarray(b))
                   for a, b in zip(leaves_e, leaves_p))

    def test_resume_ema_checkpoint_without_flag_errors_clearly(self, tmp_path):
        """Resuming an EMA-trained checkpoint without ema_decay must raise an
        actionable error, not orbax's structure-mismatch traceback."""
        import pytest
        cfg = tiny_cfg(tmp_path, checkpoint_dir=str(tmp_path / "ck"),
                       checkpoint_every=2, ema_decay=0.9)
        train(cfg)
        cfg2 = cfg.replace(train=cfg.train.replace(n_epochs=2, ema_decay=None))
        with pytest.raises(ValueError, match="ema_decay"):
            train(cfg2, resume=True)

    def test_force_save_overwrites_existing_step(self, tmp_path):
        """save(force=True) must overwrite a step that already exists —
        cmd_import re-imports into an existing dir and a silent no-op would
        serve stale weights."""
        from vaegan_tpu.checkpoint import CheckpointManager
        cfg = tiny_cfg(tmp_path)
        state = create_train_state(cfg, jax.random.key(0))
        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(state, force=True)
        mgr.wait()
        bumped = state.replace(g_params=jax.tree.map(lambda x: x + 1.0,
                                                     state.g_params))
        mgr.save(bumped, force=True)  # same step value
        mgr.wait()
        restored = mgr.restore(state)
        mgr.close()
        a = jax.tree.leaves(restored.g_params)[0]
        b = jax.tree.leaves(state.g_params)[0]
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_saved_has_g_ema_unreadable_metadata_is_none(self, tmp_path):
        """The EMA probe is tri-state: an orbax metadata layout it does not
        recognize (e.g. after an orbax upgrade) returns None ("undeterminable,
        trust the flags"), never a silent False that would route an EMA
        checkpoint into the wrong restore branch."""
        from vaegan_tpu.checkpoint import CheckpointManager
        cfg = tiny_cfg(tmp_path, checkpoint_dir=str(tmp_path / "ck"),
                       checkpoint_every=2)
        train(cfg)
        mgr = CheckpointManager(str(tmp_path / "ck"))
        step = mgr.latest_step()
        assert mgr.saved_has_g_ema() is False  # recognized layout, no EMA leaf
        mgr.close()
        md = tmp_path / "ck" / str(step) / "default" / "_METADATA"
        if md.exists():  # corrupt it: the probe must degrade to None, not False
            md.write_text("{not json")
            mgr2 = CheckpointManager(str(tmp_path / "ck"))
            assert mgr2.saved_has_g_ema() is None
            mgr2.close()

    def test_resume_pre_ema_checkpoint_starts_ema_from_restored_params(self, tmp_path):
        """Turning EMA on when resuming an older (no-EMA) checkpoint restores
        cleanly and seeds the average from the restored params."""
        cfg = tiny_cfg(tmp_path, checkpoint_dir=str(tmp_path / "ck"),
                       checkpoint_every=2)
        train(cfg)
        cfg2 = cfg.replace(train=cfg.train.replace(n_epochs=2, ema_decay=0.9))
        state2, _ = train(cfg2, resume=True)
        assert int(jax.device_get(state2.step)) == 8
        assert state2.g_ema is not None
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree.leaves(state2.g_ema))


class TestNeptuneSink:
    def test_reference_channel_protocol(self, tmp_path):
        from vaegan_tpu.utils.metrics import NeptuneSink

        class FakeChannel(list):
            append_calls = 0

        class FakeRun(dict):
            stopped = False
            def __getitem__(self, k):
                return self.setdefault(k, FakeChannel())
            def stop(self):
                self.stopped = True

        run = FakeRun()
        cfg = tiny_cfg(tmp_path)
        logger = MetricsLogger(sinks=[NeptuneSink(run)])
        train(cfg, logger=logger)
        logger.close()
        for channel in ("D loss", "G loss", "Recon loss", "KL", "D Real loss",
                        "D Fake loss", "adversarial loss"):
            assert len(run[channel]) == 4, channel
        assert run.stopped


class TestNanGuard:
    def test_diverged_run_raises(self, tmp_path, monkeypatch):
        from vaegan_tpu.train import loop as loop_mod
        cfg = tiny_cfg(tmp_path, nan_check=True)
        # poison the step to produce a NaN metric on step 2
        import vaegan_tpu.train.step as step_mod
        real_make = step_mod.make_train_step
        def poisoned(cfg_, do_g_update, axis_name=None, **kw):
            inner = real_make(cfg_, do_g_update, axis_name, **kw)
            def step(state, batch, key):
                new_state, m = inner(state, batch, key)
                m = dict(m)
                m["d_loss"] = m["d_loss"] + jnp.where(state.step >= 1, jnp.nan, 0.0)
                return new_state, m
            return step
        monkeypatch.setattr(loop_mod, "make_train_step", poisoned)
        with pytest.raises(loop_mod.TrainingDiverged, match="non-finite"):
            train(cfg)


class TestReproducibility:
    def test_same_seed_same_params(self, tmp_path):
        cfg = tiny_cfg(tmp_path)
        s1, _ = train(cfg)
        s2, _ = train(cfg)
        for a, b in zip(jax.tree.leaves(jax.device_get(s1.g_params)),
                        jax.tree.leaves(jax.device_get(s2.g_params))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_different_seed_different_params(self, tmp_path):
        cfg = tiny_cfg(tmp_path)
        s1, _ = train(cfg)
        s2, _ = train(cfg.replace(train=cfg.train.replace(seed=1)))
        assert not np.allclose(
            np.asarray(jax.tree.leaves(jax.device_get(s1.g_params))[0]),
            np.asarray(jax.tree.leaves(jax.device_get(s2.g_params))[0]))

    def test_hbm_cache_loader_is_bit_identical_to_host_loader(self, tmp_path):
        """data.hbm_cache swaps the feed (host decode+H2D -> on-device gather)
        without touching semantics: same seed => identical trained params."""
        cfg = tiny_cfg(tmp_path)
        s_host, _ = train(cfg)
        s_dev, _ = train(cfg.replace(data=cfg.data.replace(hbm_cache=True)))
        assert int(jax.device_get(s_dev.step)) == int(jax.device_get(s_host.step))
        for a, b in zip(jax.tree.leaves(jax.device_get(s_host.g_params)),
                        jax.tree.leaves(jax.device_get(s_dev.g_params))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestResumeFastForward:
    def test_skip_without_decode(self, tmp_path, monkeypatch):
        """Resuming must not decode already-completed batches."""
        from vaegan_tpu.data.pipeline import SyntheticDataset
        decoded = []
        orig = SyntheticDataset.load_batch
        def counting(self, indices):
            decoded.append(list(indices))
            return orig(self, indices)
        monkeypatch.setattr(SyntheticDataset, "load_batch", counting)

        cfg = tiny_cfg(tmp_path, checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=2)
        train(cfg)  # 4 steps, 1 epoch
        decoded.clear()
        cfg2 = cfg.replace(train=cfg.train.replace(n_epochs=2))
        state, logger = train(cfg2, resume=True)
        assert int(jax.device_get(state.step)) == 8
        # epoch 0 fully skipped via RNG replay: only the 4 batches of epoch 1 decoded
        assert len(decoded) == 4, decoded

    def test_partial_epoch_resume_offsets_batches(self, tmp_path):
        """Resume mid-epoch: remaining batches decode from the right offset and
        the sample/batch indexing stays aligned."""
        cfg = tiny_cfg(tmp_path, checkpoint_dir=str(tmp_path / "ck2"), checkpoint_every=2)
        # run only half an epoch by stopping after checkpoint step 2: emulate by
        # training 1 epoch then restoring step-2 checkpoint
        train(cfg)
        from vaegan_tpu.checkpoint import CheckpointManager
        mgr = CheckpointManager(str(tmp_path / "ck2"))
        assert 2 in (mgr.all_steps if False else mgr._mgr.all_steps())
        # restore step 2 explicitly, then resume to finish the epoch
        template = create_train_state(cfg, jax.random.key(0))
        state2 = mgr.restore(template, step=2)
        mgr.close()
        logger = None
        from vaegan_tpu.train.loop import train as train_fn
        # place restored checkpoint as the only resume point
        import shutil
        shutil.rmtree(tmp_path / "ck2")
        mgr2 = CheckpointManager(str(tmp_path / "ck2"))
        mgr2.save(state2, force=True)
        mgr2.wait()
        mgr2.close()
        state3, logger = train_fn(cfg, resume=True)
        assert int(jax.device_get(state3.step)) == 4
        steps_run = sum(1 for m in logger.history if "_wall_s" not in m)
        assert steps_run == 2
