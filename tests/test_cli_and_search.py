"""CLI + hyperparameter-search subsystem tests (tiny synthetic configs)."""

import json

import numpy as np
import pytest

from vaegan_tpu.config import Config, DiscriminatorConfig, GeneratorConfig
from vaegan_tpu import search as S


def tiny_base(tmp_path) -> Config:
    base = Config()
    return base.replace(
        data=base.data.replace(image_size=16, batch_size=4, synthetic=True,
                               synthetic_size=8),
        train=base.train.replace(n_epochs=1, sample_interval=1,
                                 sample_dir=str(tmp_path / "samples")),
    )


class TestSearchHelpers:
    def test_check_ascending(self):
        assert S.check_ascending([1, 2, 2, 3])
        assert not S.check_ascending([2, 1])

    def test_make_random_params_valid_and_seeded(self):
        rng1 = np.random.default_rng(0)
        rng2 = np.random.default_rng(0)
        p1 = S.make_random_params(rng1)
        p2 = S.make_random_params(rng2)
        assert p1 == p2
        assert S.is_valid(p1)

    def test_registry_dedup(self, tmp_path):
        path = tmp_path / "params.json"
        params = {"a": 1, "num_blocks": [1]}
        assert not S.check_already_done(params, path)
        S.register_in_json({"id": "x", "params": params}, path)
        assert S.check_already_done(params, path)
        assert len(json.load(open(path))) == 1

    def test_params_to_config(self):
        rng = np.random.default_rng(1)
        p = S.make_random_params(rng)
        cfg = S.params_to_config(Config(), p)
        assert cfg.generator.depth == p["network_depth"]
        assert list(cfg.discriminator.num_features_res) == p["num_features_res"]
        assert cfg.optim.lr == p["lr"]

    def test_params_to_config_preserves_unsearched_fields(self):
        """Trials must explore the BASE architecture family: non-searched
        fields (in_channels, is_vae, pool_size…) survive into every trial."""
        from vaegan_tpu.config import Config
        base = Config()
        base = base.replace(
            generator=base.generator.replace(in_channels=3, is_vae=False),
            discriminator=base.discriminator.replace(pool_size=2,
                                                     feature_tap="pool"))
        p = S.make_random_params(np.random.default_rng(1))
        cfg = S.params_to_config(base, p)
        assert cfg.generator.in_channels == 3
        assert cfg.generator.is_vae is False
        assert cfg.discriminator.pool_size == 2
        assert cfg.discriminator.feature_tap == "pool"

    def test_register_if_new_atomic_dedup_and_update(self, tmp_path):
        """register_if_new reserves under one lock (concurrent same-seed
        searches can't both run a trial); update_in_json finalizes by id."""
        path = tmp_path / "params.json"
        params = {"a": 1, "num_blocks": [1]}
        e1 = {"id": "x", "params": params, "status": "pending"}
        assert S.register_if_new(e1, path) is True
        assert S.register_if_new({"id": "y", "params": params,
                                  "status": "pending"}, path) is False
        e1 = {**e1, "status": "ok", "recon_mse": 0.5}
        S.update_in_json(e1, path)
        reg = json.load(open(path))
        assert len(reg) == 1
        assert reg[0]["status"] == "ok" and reg[0]["recon_mse"] == 0.5

    def test_registry_concurrent_appends_lose_nothing(self, tmp_path):
        """Two searches sharing a registry (the natural multi-chip-host usage)
        must not drop each other's trials: register_in_json serializes its
        read-modify-write through an flock (VERDICT r2 weak #6)."""
        from concurrent.futures import ProcessPoolExecutor
        path = str(tmp_path / "params.json")
        workers, per = 4, 25
        with ProcessPoolExecutor(max_workers=workers) as ex:
            list(ex.map(_append_entries, [(path, w, per) for w in range(workers)]))
        registry = json.load(open(path))
        ids = [e["id"] for e in registry]
        assert len(ids) == workers * per
        assert len(set(ids)) == workers * per


def _append_entries(args):
    path, worker, n = args
    from vaegan_tpu.search import register_in_json
    for i in range(n):
        register_in_json({"id": f"{worker}-{i}"}, path)


class TestConfigValidation:
    def test_critic_batching_typo_fails_loudly(self):
        from vaegan_tpu.config import TrainConfig
        with pytest.raises(ValueError, match="critic_batching"):
            TrainConfig(critic_batching="concat2")
        for ok in ("separate", "concat", "concat3"):
            TrainConfig(critic_batching=ok)

    def test_use_pallas_typo_fails_loudly(self):
        from vaegan_tpu.config import TrainConfig
        with pytest.raises(ValueError, match="use_pallas"):
            TrainConfig(use_pallas="loss")
        for ok in ("off", "losses", "all", True, False, None):
            TrainConfig(use_pallas=ok)

    def test_image_size_must_divide_by_encoder_depth(self):
        """100x100 at depth 3 cannot round-trip (the stride-2 chain ceils to 13,
        the decoder doubles back to 104) — rejected at config time."""
        from vaegan_tpu.config import Config, DataConfig, GeneratorConfig
        with pytest.raises(ValueError, match="divisible"):
            Config(generator=GeneratorConfig(depth=3),
                   data=DataConfig(image_size=100))
        Config(generator=GeneratorConfig(depth=3), data=DataConfig(image_size=96))

    def test_feature_tap_validated(self):
        from vaegan_tpu.config import DiscriminatorConfig
        with pytest.raises(ValueError, match="feature_tap"):
            DiscriminatorConfig(feature_tap="fc2")
        with pytest.raises(ValueError, match="fc1"):
            DiscriminatorConfig(feature_tap="fc1", linear_widths=())
        for ok in ("res_out", "pool", "fc1"):
            DiscriminatorConfig(feature_tap=ok)

    def test_experiment_rejects_kwargs_alongside_config_overrides(self):
        """config_overrides is a complete config; silently discarding explicit
        kwargs would train with hyperparameters the caller didn't ask for."""
        from vaegan_tpu.api import experiment
        from vaegan_tpu.config import preset
        with pytest.raises(ValueError, match="config_overrides"):
            experiment(lr=1e-4, config_overrides=preset("notebook"))


class TestRandomSearchRun:
    def test_one_trial_end_to_end(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        base = tiny_base(tmp_path)
        # shrink the space so the trial is fast on CPU
        monkeypatch.setattr(S, "SEARCH_SPACE", {
            **S.SEARCH_SPACE,
            "network_depth": [1], "network_length": [1], "feature_size": [8],
            "num_features_conv1": [8],
            "num_blocks": [[1]], "num_strides_res": [[2]], "num_features_res": [[16]],
            "n_critics": [1],
        })
        entries = S.random_search(base, n_trials=1,
                                  results_path=str(tmp_path / "r/params.json"),
                                  archive_dir=str(tmp_path / "r/archive"), seed=0)
        assert len(entries) == 1
        e = entries[0]
        assert e["status"] == "ok", e
        assert np.isfinite(e["recon_mse"])
        # archived sample exists under the UUID
        assert (tmp_path / "r" / "archive" / f"{e['id']}.png").exists()
        # registry written, dedup active
        assert S.check_already_done(e["params"], tmp_path / "r/params.json")

    def test_trial_step_budget_is_bounded(self, tmp_path, monkeypatch):
        # a trial may not run the base config's full epochs: max_steps_per_trial
        # caps it (the reference's search ran a full experiment per trial)
        base = tiny_base(tmp_path).replace(
            train=tiny_base(tmp_path).train.replace(n_epochs=50))
        seen = {}
        from vaegan_tpu.train import loop as loop_mod
        orig_train = loop_mod.train

        def spy_train(cfg, *a, **k):
            seen["max_steps"] = cfg.train.max_steps
            return orig_train(cfg, *a, **k)

        # random_search does `from vaegan_tpu.train.loop import train` at call
        # time, so patch the source module
        monkeypatch.setattr(loop_mod, "train", spy_train)
        monkeypatch.setattr(S, "SEARCH_SPACE", {
            **S.SEARCH_SPACE,
            "network_depth": [1], "network_length": [1], "feature_size": [8],
            "num_features_conv1": [8],
            "num_blocks": [[1]], "num_strides_res": [[2]], "num_features_res": [[16]],
            "n_critics": [1],
        })
        entries = S.random_search(base, n_trials=1,
                                  results_path=str(tmp_path / "r3/params.json"),
                                  archive_dir=str(tmp_path / "r3/archive"), seed=0,
                                  max_steps_per_trial=3)
        assert seen["max_steps"] == 3
        assert entries[0]["status"] == "ok"

    def test_failed_trial_is_recorded(self, tmp_path, monkeypatch):
        base = tiny_base(tmp_path)
        monkeypatch.setattr(S, "params_to_config",
                            lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom")))
        entries = S.random_search(base, n_trials=1,
                                  results_path=str(tmp_path / "r2/params.json"),
                                  archive_dir=str(tmp_path / "r2/archive"), seed=0)
        assert entries[0]["status"] == "failed"
        assert "boom" in entries[0]["error"]


class TestCli:
    def test_bench_knows_every_mode(self, capsys):
        """All bench.py modes are reachable through `vaegan-tpu bench`
        (regression: --infer shipped without being added to the CLI's valid
        set). Pair each with a second mode: the invalid-COMBO error proves the
        mode itself passed the unknown-mode gate without running the bench."""
        from vaegan_tpu.cli import main
        for mode in ("infer", "paper", "vae", "loader", "roofline"):
            rc = main(["bench", mode, "loader" if mode != "loader" else "vae"])
            err = capsys.readouterr().err
            assert rc == 2 and "unknown bench mode" not in err, (mode, err)
            assert "at most one bench mode" in err

    def test_print_config(self, capsys):
        from vaegan_tpu.cli import main
        assert main(["print-config", "--preset", "vaegan_paper"]) == 0
        out = capsys.readouterr().out
        cfg = json.loads(out)
        assert cfg["optim"]["scheme"] == "three"
        assert cfg["loss"]["reconstruction"] == "dis_l"

    def test_train_and_eval_roundtrip(self, tmp_path, capsys, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from vaegan_tpu.cli import main
        cfg = tiny_base(tmp_path).replace(
            generator=GeneratorConfig(depth=1, length=1, feature_size=8),
            discriminator=DiscriminatorConfig(
                num_stride_conv1=1, num_features_conv1=8, num_blocks=(1,),
                num_strides_res=(2,), num_features_res=(16,), pool_size=2,
                linear_widths=(16, 8, 8)))
        cfg.to_json(str(tmp_path / "cfg.json"))
        rc = main(["train", "--config", str(tmp_path / "cfg.json"),
                   "--checkpoint", str(tmp_path / "ckpt"),
                   "--metrics-jsonl", str(tmp_path / "m.jsonl")])
        assert rc == 0
        assert (tmp_path / "m.jsonl").exists()
        rc = main(["eval", "--config", str(tmp_path / "cfg.json"),
                   "--checkpoint", str(tmp_path / "ckpt")])
        assert rc == 0
        out = capsys.readouterr().out
        assert "Mean squared error" in out
        # standing-stats recalibration before eval
        rc = main(["eval", "--config", str(tmp_path / "cfg.json"),
                   "--checkpoint", str(tmp_path / "ckpt"),
                   "--recalibrate-bn", "3"])
        assert rc == 0
        assert "Mean squared error" in capsys.readouterr().out
        # --hbm-cache drives the same run through the DeviceDataLoader
        rc = main(["train", "--config", str(tmp_path / "cfg.json"),
                   "--hbm-cache", "--max-steps", "1"])
        assert rc == 0

    def test_eval_ema_flag(self, tmp_path, capsys, monkeypatch):
        """train --ema-decay then eval --ema: the EMA leaf round-trips through
        the checkpoint and the CLI evaluates the averaged generator."""
        monkeypatch.chdir(tmp_path)
        from vaegan_tpu.cli import main
        cfg = tiny_base(tmp_path).replace(
            generator=GeneratorConfig(depth=1, length=1, feature_size=8),
            discriminator=DiscriminatorConfig(
                num_stride_conv1=1, num_features_conv1=8, num_blocks=(1,),
                num_strides_res=(2,), num_features_res=(16,), pool_size=2,
                linear_widths=(16, 8, 8)))
        cfg.to_json(str(tmp_path / "cfg.json"))
        assert main(["train", "--config", str(tmp_path / "cfg.json"),
                     "--ema-decay", "0.9",
                     "--checkpoint", str(tmp_path / "ckpt")]) == 0
        assert main(["eval", "--config", str(tmp_path / "cfg.json"), "--ema",
                     "--checkpoint", str(tmp_path / "ckpt")]) == 0
        assert "Mean squared error" in capsys.readouterr().out

    def test_eval_ema_checkpoint_without_flag_uses_live_params(
            self, tmp_path, capsys, monkeypatch):
        """An EMA-trained checkpoint restores for plain eval too — the template
        adapts to what the checkpoint carries (review finding, round 3)."""
        monkeypatch.chdir(tmp_path)
        from vaegan_tpu.cli import main
        cfg = tiny_base(tmp_path).replace(
            generator=GeneratorConfig(depth=1, length=1, feature_size=8),
            discriminator=DiscriminatorConfig(
                num_stride_conv1=1, num_features_conv1=8, num_blocks=(1,),
                num_strides_res=(2,), num_features_res=(16,), pool_size=2,
                linear_widths=(16, 8, 8)))
        cfg.to_json(str(tmp_path / "cfg.json"))
        assert main(["train", "--config", str(tmp_path / "cfg.json"),
                     "--ema-decay", "0.9",
                     "--checkpoint", str(tmp_path / "ckpt")]) == 0
        # no --ema: live params of the EMA checkpoint
        assert main(["eval", "--config", str(tmp_path / "cfg.json"),
                     "--checkpoint", str(tmp_path / "ckpt")]) == 0
        assert "Mean squared error" in capsys.readouterr().out

    def test_eval_ema_flag_on_plain_checkpoint_errors_clearly(
            self, tmp_path, capsys, monkeypatch):
        monkeypatch.chdir(tmp_path)
        import pytest

        from vaegan_tpu.cli import main
        cfg = tiny_base(tmp_path).replace(
            generator=GeneratorConfig(depth=1, length=1, feature_size=8),
            discriminator=DiscriminatorConfig(
                num_stride_conv1=1, num_features_conv1=8, num_blocks=(1,),
                num_strides_res=(2,), num_features_res=(16,), pool_size=2,
                linear_widths=(16, 8, 8)))
        cfg.to_json(str(tmp_path / "cfg.json"))
        assert main(["train", "--config", str(tmp_path / "cfg.json"),
                     "--checkpoint", str(tmp_path / "ckpt")]) == 0
        with pytest.raises(ValueError, match="no generator EMA"):
            main(["eval", "--config", str(tmp_path / "cfg.json"), "--ema",
                  "--checkpoint", str(tmp_path / "ckpt")])

    def test_export_command(self, tmp_path, capsys, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from vaegan_tpu.cli import main
        cfg = tiny_base(tmp_path).replace(
            generator=GeneratorConfig(depth=1, length=1, feature_size=8),
            discriminator=DiscriminatorConfig(
                num_stride_conv1=1, num_features_conv1=8, num_blocks=(1,),
                num_strides_res=(2,), num_features_res=(16,), pool_size=2,
                linear_widths=(16, 8, 8)))
        cfg.to_json(str(tmp_path / "cfg.json"))
        main(["train", "--config", str(tmp_path / "cfg.json"),
              "--checkpoint", str(tmp_path / "ckpt")])
        rc = main(["export", "--config", str(tmp_path / "cfg.json"),
                   "--checkpoint", str(tmp_path / "ckpt"),
                   "--generator-out", str(tmp_path / "g.pt"),
                   "--discriminator-out", str(tmp_path / "d.pt")])
        assert rc == 0
        assert "exported generator" in capsys.readouterr().out
        import torch
        g = torch.load(str(tmp_path / "g.pt"))
        d = torch.load(str(tmp_path / "d.pt"))
        # reference state_dict layouts: nested block names + SN triplets
        assert any(k.startswith("encoder.encoder.") for k in g)
        assert any(k.endswith("weight_orig") for k in d)
        assert any(k.endswith("weight_u") for k in d)

    def test_import_command_roundtrip(self, tmp_path, capsys, monkeypatch):
        """export -> import: the re-imported checkpoint reproduces the trained
        model's eval MSE exactly (weights survive torch layout + back)."""
        monkeypatch.chdir(tmp_path)
        from vaegan_tpu.cli import main
        cfg = tiny_base(tmp_path).replace(
            generator=GeneratorConfig(depth=1, length=1, feature_size=8),
            discriminator=DiscriminatorConfig(
                num_stride_conv1=1, num_features_conv1=8, num_blocks=(1,),
                num_strides_res=(2,), num_features_res=(16,), pool_size=2,
                linear_widths=(16, 8, 8)))
        cfg.to_json(str(tmp_path / "cfg.json"))
        main(["train", "--config", str(tmp_path / "cfg.json"),
              "--checkpoint", str(tmp_path / "ckpt")])
        main(["export", "--config", str(tmp_path / "cfg.json"),
              "--checkpoint", str(tmp_path / "ckpt"),
              "--generator-out", str(tmp_path / "g.pt"),
              "--discriminator-out", str(tmp_path / "d.pt")])
        rc = main(["import", "--config", str(tmp_path / "cfg.json"),
                   "--checkpoint", str(tmp_path / "ckpt2"),
                   "--generator", str(tmp_path / "g.pt"),
                   "--discriminator", str(tmp_path / "d.pt")])
        assert rc == 0
        assert "imported generator" in capsys.readouterr().out
        assert main(["eval", "--config", str(tmp_path / "cfg.json"),
                     "--checkpoint", str(tmp_path / "ckpt")]) == 0
        mse_orig = capsys.readouterr().out
        assert main(["eval", "--config", str(tmp_path / "cfg.json"),
                     "--checkpoint", str(tmp_path / "ckpt2")]) == 0
        mse_imported = capsys.readouterr().out
        assert mse_orig == mse_imported  # same printed 4-decimal MSE

    def test_import_wrong_architecture_errors(self, tmp_path, monkeypatch):
        """A state_dict from a different architecture fails loudly, not at
        some later orbax restore."""
        monkeypatch.chdir(tmp_path)
        import numpy as np
        import pytest

        from vaegan_tpu.cli import main
        cfg = tiny_base(tmp_path).replace(
            generator=GeneratorConfig(depth=1, length=1, feature_size=8),
            discriminator=DiscriminatorConfig(
                num_stride_conv1=1, num_features_conv1=8, num_blocks=(1,),
                num_strides_res=(2,), num_features_res=(16,), pool_size=2,
                linear_widths=(16, 8, 8)))
        cfg.to_json(str(tmp_path / "cfg.json"))
        np.savez(str(tmp_path / "bogus.npz"),
                 **{"encoder.encoder.bogus.weight": np.zeros((4, 4, 3, 3))})
        with pytest.raises(ValueError, match="does not match"):
            main(["import", "--config", str(tmp_path / "cfg.json"),
                  "--checkpoint", str(tmp_path / "ckpt3"),
                  "--generator", str(tmp_path / "bogus.npz")])

    def test_sample_command(self, tmp_path, capsys, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from vaegan_tpu.cli import main
        cfg = tiny_base(tmp_path).replace(
            generator=GeneratorConfig(depth=1, length=1, feature_size=8),
            discriminator=DiscriminatorConfig(
                num_stride_conv1=1, num_features_conv1=8, num_blocks=(1,),
                num_strides_res=(2,), num_features_res=(16,), pool_size=2,
                linear_widths=(16, 8, 8)))
        cfg.to_json(str(tmp_path / "cfg.json"))
        main(["train", "--config", str(tmp_path / "cfg.json"),
              "--checkpoint", str(tmp_path / "ckpt")])
        rc = main(["sample", "--config", str(tmp_path / "cfg.json"),
                   "--checkpoint", str(tmp_path / "ckpt"),
                   "-n", "4", "-o", str(tmp_path / "s.png")])
        assert rc == 0
        assert (tmp_path / "s.png").exists()
