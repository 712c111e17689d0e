"""Distribution-level tests of the reference init scheme vs torch's ACTUAL draws.

The `reference` scheme (ops/initializers.py) claims to reproduce, per layer type,
what the reference's ``init_weights`` + torch defaults produce (README.md:700-707
and the two C10 quirks: ConvTranspose2d not matched by the Conv2d isinstance
check; spectral-norm convs voiding the kaiming re-init). These tests pin the
moments/bounds of our initializers against torch's own initialized modules, so a
fan-in convention drift (e.g. reading fan-in off the wrong weight dim) fails
loudly.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from vaegan_tpu.ops import initializers as I  # noqa: E402

KEY = jax.random.key(42)


def stats(a):
    a = np.asarray(a, np.float64).ravel()
    return a.mean(), a.std(), np.abs(a).max()


class TestKaimingNormal:
    """init_weights applies kaiming_normal_ to Conv2d/Linear weights (README.md:702-704)."""

    def test_conv_matches_torch_kaiming_normal(self):
        kh = kw = 3
        cin, cout = 32, 64
        ours = I.kaiming_normal(KEY, (kh, kw, cin, cout))
        w = torch.empty(cout, cin, kh, kw)
        torch.manual_seed(0)
        torch.nn.init.kaiming_normal_(w)
        m_o, s_o, _ = stats(ours)
        m_t, s_t, _ = stats(w.numpy())
        want_std = math.sqrt(2.0 / (cin * kh * kw))
        assert abs(m_o) < 4 * want_std / math.sqrt(ours.size)
        np.testing.assert_allclose(s_o, want_std, rtol=0.02)
        np.testing.assert_allclose(s_t, want_std, rtol=0.02)  # convention check
        np.testing.assert_allclose(s_o, s_t, rtol=0.04)

    def test_linear_matches_torch_kaiming_normal(self):
        fin, fout = 256, 128
        ours = I.kaiming_normal(KEY, (fin, fout))
        w = torch.empty(fout, fin)
        torch.manual_seed(0)
        torch.nn.init.kaiming_normal_(w)
        want_std = math.sqrt(2.0 / fin)
        np.testing.assert_allclose(stats(ours)[1], want_std, rtol=0.02)
        np.testing.assert_allclose(stats(w.numpy())[1], want_std, rtol=0.02)


class TestTorchDefaultConv:
    """Spectral-norm convs keep torch's Conv2d default (C10 quirk 2): the
    kaiming-re-init hits the computed weight, not weight_orig."""

    def test_bound_and_moments_match_real_conv2d(self):
        torch.manual_seed(1)
        conv = torch.nn.Conv2d(16, 48, 3, bias=False)
        w = conv.weight.detach().numpy()
        fan_in = 16 * 3 * 3
        bound = 1.0 / math.sqrt(fan_in)
        # torch's actual default respects the same bound we hardcode
        assert stats(w)[2] <= bound + 1e-7
        np.testing.assert_allclose(stats(w)[1], bound / math.sqrt(3), rtol=0.05)

        ours = I.torch_default_conv(KEY, (3, 3, 16, 48))
        assert stats(ours)[2] <= bound + 1e-7
        np.testing.assert_allclose(stats(ours)[1], bound / math.sqrt(3), rtol=0.05)

    def test_fan_in_convention_matches_torch_calculation(self):
        conv = torch.nn.Conv2d(7, 13, 5, bias=False)
        fi, _ = torch.nn.init._calculate_fan_in_and_fan_out(conv.weight)
        assert fi == I._conv_fan_in((5, 5, 7, 13))


class TestTorchDefaultConvTranspose:
    """ConvTranspose2d keeps torch defaults (C10 quirk 1: isinstance(Conv2d)
    misses it). torch stores its weight (in, out, kh, kw), so fan_in =
    out_channels * kh * kw — NOT in_channels * kh * kw."""

    def test_bound_and_moments_match_real_convtranspose2d(self):
        torch.manual_seed(2)
        cin, cout, k = 24, 12, 4
        convt = torch.nn.ConvTranspose2d(cin, cout, k, stride=2, bias=False)
        w = convt.weight.detach().numpy()
        fan_in_torch, _ = torch.nn.init._calculate_fan_in_and_fan_out(convt.weight)
        assert fan_in_torch == cout * k * k  # the quirky convention, pinned
        bound = 1.0 / math.sqrt(cout * k * k)
        assert stats(w)[2] <= bound + 1e-7
        np.testing.assert_allclose(stats(w)[1], bound / math.sqrt(3), rtol=0.06)

        ours = I.torch_default_conv_transpose(KEY, (k, k, cin, cout))
        assert stats(ours)[2] <= bound + 1e-7
        np.testing.assert_allclose(stats(ours)[1], bound / math.sqrt(3), rtol=0.06)

    def test_wrong_convention_would_fail(self):
        # guard the guard: with cin != cout the in-channel convention gives a
        # DIFFERENT bound, so this test genuinely discriminates
        cin, cout, k = 24, 12, 4
        assert not math.isclose(1.0 / math.sqrt(cout * k * k),
                                1.0 / math.sqrt(cin * k * k))


class TestModelInitIntegration:
    """The assembled models draw from the right initializer per layer class."""

    def test_generator_reference_scheme_moments(self):
        from vaegan_tpu.config import GeneratorConfig
        from vaegan_tpu.models import UnsupervisedGeneratorNetwork
        import jax.numpy as jnp

        cfg = GeneratorConfig(depth=1, length=1, feature_size=32)
        model = UnsupervisedGeneratorNetwork(cfg=cfg)
        variables = model.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)},
            jnp.zeros((1, 32, 32, 1)), train=False)
        flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
        checked = {"kaiming": 0, "convt": 0}
        for path, leaf in flat:
            keys = [str(getattr(p, "key", "")) for p in path]
            if keys[-1] != "kernel" or leaf.ndim != 4:
                continue
            kh, kw, cin, cout = leaf.shape
            emp_std = float(np.asarray(leaf, np.float64).std())
            if "upsample" in "/".join(keys) and keys[-2] in ("conv1", "shortcut_conv"):
                # ConvTranspose kernels: torch-default uniform, quirky fan-in
                bound = 1.0 / math.sqrt(cout * kh * kw)
                assert float(np.abs(np.asarray(leaf)).max()) <= bound + 1e-7, keys
                np.testing.assert_allclose(emp_std, bound / math.sqrt(3), rtol=0.25,
                                           err_msg="/".join(keys))
                checked["convt"] += 1
            elif "shortcut" in "/".join(keys) or keys[-2].startswith("conv"):
                want = math.sqrt(2.0 / (cin * kh * kw))
                np.testing.assert_allclose(emp_std, want, rtol=0.25,
                                           err_msg="/".join(keys))
                checked["kaiming"] += 1
        assert checked["convt"] >= 1 and checked["kaiming"] >= 3

    def test_discriminator_spectral_convs_keep_torch_default(self):
        from vaegan_tpu.config import DiscriminatorConfig
        from vaegan_tpu.models import Discriminator
        import jax.numpy as jnp

        cfg = DiscriminatorConfig(
            num_stride_conv1=1, num_features_conv1=16, num_blocks=(1,),
            num_strides_res=(2,), num_features_res=(64,), pool_size=2,
            linear_widths=(32, 16, 8))
        model = Discriminator(cfg=cfg)
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            jnp.zeros((1, 32, 32, 1)), train=False)
        flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
        n_sn = 0
        for path, leaf in flat:
            keys = [str(getattr(p, "key", "")) for p in path]
            if keys[-1] != "kernel" or leaf.ndim != 4 or "res_layers" not in keys[0]:
                continue
            kh, kw, cin, cout = leaf.shape
            bound = 1.0 / math.sqrt(cin * kh * kw)
            # SN-wrapped convs: torch-default uniform (bounded), NOT kaiming
            # normal (unbounded — would exceed the bound with ~certainty at
            # this size)
            assert float(np.abs(np.asarray(leaf)).max()) <= bound + 1e-7, keys
            n_sn += 1
        assert n_sn >= 2  # both res convs (+1x1 shortcut when shapes change)
