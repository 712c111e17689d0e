"""Serving-bundle tests: jax.export StableHLO artifacts (vaegan_tpu.serving).

The reference's only deployment story is the in-memory generator returned by
``experiment()`` (README.md:935); these tests cover the framework's portable
serving path — export, reload-without-model-code, numerical parity, symbolic
batch, and the CLI surface.
"""

import json
import os

import jax
import numpy as np
import pytest

from vaegan_tpu import inference, serving
from vaegan_tpu.config import Config, DiscriminatorConfig, GeneratorConfig
from vaegan_tpu.train import create_train_state


def tiny_cfg(tmp_path) -> Config:
    base = Config()
    return base.replace(
        generator=GeneratorConfig(depth=1, length=1, feature_size=8),
        discriminator=DiscriminatorConfig(
            num_stride_conv1=1, num_features_conv1=8, num_blocks=(1,),
            num_strides_res=(2,), num_features_res=(16,), pool_size=2,
            linear_widths=(16, 8, 8)),
        data=base.data.replace(image_size=16, batch_size=4, synthetic=True,
                               synthetic_size=8),
        train=base.train.replace(n_epochs=1, sample_interval=10,
                                 sample_dir=str(tmp_path / "samples")),
    )


@pytest.fixture(scope="module")
def cfg_state(tmp_path_factory):
    cfg = tiny_cfg(tmp_path_factory.mktemp("serving"))
    state = create_train_state(cfg, jax.random.key(0))
    return cfg, state


class TestBundle:
    def test_roundtrip_parity_and_manifest(self, cfg_state, tmp_path):
        cfg, state = cfg_state
        mpath = serving.save_bundle(str(tmp_path), cfg, state, platforms=("cpu",))
        assert os.path.basename(mpath) == serving.MANIFEST_NAME
        bundle = serving.load_bundle(str(tmp_path))

        x = np.random.default_rng(0).random((4, 16, 16, 1), np.float32)
        r_srv, mse_srv = bundle.reconstruct(x)
        r_ref, mse_ref = inference.reconstruct(cfg, state, x)
        np.testing.assert_allclose(np.asarray(r_srv), np.asarray(r_ref),
                                   atol=1e-5)
        assert abs(float(mse_srv) - float(mse_ref)) < 1e-5

        m = bundle.manifest
        assert m["bundle_version"] == serving.BUNDLE_VERSION
        assert m["image_size"] == 16 and m["channels"] == 1
        assert m["batch"] == "symbolic"
        assert tuple(m["latent_shape"]) == inference.latent_shape(cfg)
        assert set(m["entries"]) == {"reconstruct", "encode", "decode"}
        # the resolved config rides along so a serving host can validate requests
        assert m["config"]["generator"]["feature_size"] == 8
        # manifest is valid JSON on disk (symbolic dims stringified)
        with open(mpath) as f:
            assert json.load(f)["entries"]["reconstruct"]["in_shapes"][0][0] == "b"

    def test_symbolic_batch_serves_any_size(self, cfg_state, tmp_path):
        cfg, state = cfg_state
        serving.save_bundle(str(tmp_path), cfg, state, platforms=("cpu",))
        bundle = serving.load_bundle(str(tmp_path))
        for b in (1, 7):
            x = np.zeros((b, 16, 16, 1), np.float32)
            recon, _ = bundle.reconstruct(x)
            assert recon.shape == (b, 16, 16, 1)

    def test_encode_decode_chain(self, cfg_state, tmp_path):
        cfg, state = cfg_state
        serving.save_bundle(str(tmp_path), cfg, state, platforms=("cpu",))
        bundle = serving.load_bundle(str(tmp_path))
        x = np.random.default_rng(1).random((3, 16, 16, 1), np.float32)
        z = bundle.encode(x)
        assert z.shape == (3,) + bundle.latent_shape
        dec = bundle.decode(np.asarray(z))
        assert dec.shape == x.shape
        # round-trip through the serving pair matches the in-framework pair
        r_ref, _ = inference.reconstruct(cfg, state, x)
        np.testing.assert_allclose(np.asarray(dec), np.asarray(r_ref), atol=1e-5)

    def test_pinned_batch_rejects_other_sizes(self, cfg_state, tmp_path):
        cfg, state = cfg_state
        serving.save_bundle(str(tmp_path), cfg, state, platforms=("cpu",),
                            batch_size=4)
        bundle = serving.load_bundle(str(tmp_path))
        assert bundle.manifest["batch"] == 4
        recon, _ = bundle.reconstruct(np.zeros((4, 16, 16, 1), np.float32))
        assert recon.shape == (4, 16, 16, 1)
        with pytest.raises(Exception):
            bundle.reconstruct(np.zeros((2, 16, 16, 1), np.float32))

    def test_cross_platform_export_from_cpu_host(self, cfg_state, tmp_path):
        """The default bundle lowers for BOTH cpu and tpu from a CPU-only
        host — the artifact built in CI serves on the TPU fleet unchanged."""
        cfg, state = cfg_state
        serving.save_bundle(str(tmp_path), cfg, state, platforms=("cpu", "tpu"))
        bundle = serving.load_bundle(str(tmp_path))
        assert bundle.manifest["platforms"] == ["cpu", "tpu"]
        recon, _ = bundle.reconstruct(np.zeros((2, 16, 16, 1), np.float32))
        assert recon.shape == (2, 16, 16, 1)

    def test_pallas_all_config_exports_portably(self, cfg_state, tmp_path):
        """A use_pallas='all' training config must still export a cpu+tpu
        bundle: the entry builder disables fusion (eval-mode fused BN is
        p=0-identical; Mosaic kernels have no CPU lowering)."""
        cfg, state = cfg_state
        cfg_pallas = cfg.replace(train=cfg.train.replace(use_pallas="all"))
        serving.save_bundle(str(tmp_path), cfg_pallas, state,
                            platforms=("cpu", "tpu"))
        bundle = serving.load_bundle(str(tmp_path))
        batch = np.random.default_rng(0).random((2, 16, 16, 1), np.float32)
        recon, mse = bundle.reconstruct(batch)
        r_ref, m_ref = inference.reconstruct(cfg, state, jax.numpy.asarray(batch))
        np.testing.assert_allclose(np.asarray(recon), np.asarray(r_ref),
                                   rtol=2e-5, atol=2e-5)

    def test_future_version_rejected(self, cfg_state, tmp_path):
        cfg, state = cfg_state
        mpath = serving.save_bundle(str(tmp_path), cfg, state, platforms=("cpu",))
        with open(mpath) as f:
            m = json.load(f)
        m["bundle_version"] = serving.BUNDLE_VERSION + 1
        with open(mpath, "w") as f:
            json.dump(m, f)
        with pytest.raises(ValueError, match="version"):
            serving.load_bundle(str(tmp_path))


class TestCliExportServing:
    def test_train_then_export_serving(self, tmp_path, capsys, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from vaegan_tpu.cli import main
        cfg = tiny_cfg(tmp_path)
        cfg.to_json(str(tmp_path / "cfg.json"))
        assert main(["train", "--config", str(tmp_path / "cfg.json"),
                     "--checkpoint", str(tmp_path / "ckpt")]) == 0
        assert main(["export-serving", "--config", str(tmp_path / "cfg.json"),
                     "--checkpoint", str(tmp_path / "ckpt"),
                     "--platforms", "cpu",
                     "--out", str(tmp_path / "bundle")]) == 0
        out = capsys.readouterr().out
        assert "serving bundle" in out
        bundle = serving.load_bundle(str(tmp_path / "bundle"))
        recon, mse = bundle.reconstruct(np.zeros((2, 16, 16, 1), np.float32))
        assert recon.shape == (2, 16, 16, 1) and np.isfinite(float(mse))
