"""Numerical parity against PyTorch (CPU) at the op, block, and network level.

The torch fixtures here are built from *our* module spec (plain torch API calls and
functional composition); weights flow torch -> jax through vaegan_tpu.interop, then
both sides run the same input and must agree to float tolerance. This realizes the
BASELINE.json fidelity requirement (import torch tensors; compare image-for-image).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vaegan_tpu import interop  # noqa: E402
from vaegan_tpu.ops.conv import avg_pool, conv2d, conv_transpose2d  # noqa: E402
from vaegan_tpu.ops.norm import batch_norm  # noqa: E402
from vaegan_tpu.ops.spectral_norm import _as_matrix, spectral_normalize  # noqa: E402

torch.manual_seed(0)
RTOL, ATOL = 1e-5, 1e-5


def t2j_nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def j2t_nchw(a):
    return torch.from_numpy(np.asarray(a).transpose(0, 3, 1, 2))


def assert_close(j, t_nchw, rtol=RTOL, atol=ATOL):
    np.testing.assert_allclose(
        np.asarray(j), t_nchw.detach().numpy().transpose(0, 2, 3, 1), rtol=rtol, atol=atol)


class TestConvParity:
    @pytest.mark.parametrize("k,s,p,cin,cout", [(3, 1, 1, 3, 8), (3, 2, 1, 4, 8), (1, 2, 0, 8, 16), (4, 1, 2, 2, 5)])
    def test_conv2d(self, k, s, p, cin, cout):
        x = torch.randn(2, cin, 13, 13)
        w = torch.randn(cout, cin, k, k)
        ref = TF.conv2d(x, w, stride=s, padding=p)
        out = conv2d(t2j_nhwc(x), jnp.asarray(interop.conv_weight(w.numpy())), s, p)
        assert_close(out, ref)

    @pytest.mark.parametrize("k,s,p,op", [(4, 2, 1, 0), (3, 2, 1, 1), (2, 2, 0, 0), (3, 1, 1, 0)])
    def test_conv_transpose2d(self, k, s, p, op):
        x = torch.randn(2, 4, 9, 9)
        w = torch.randn(4, 6, k, k)
        ref = TF.conv_transpose2d(x, w, stride=s, padding=p, output_padding=op)
        out = conv_transpose2d(
            t2j_nhwc(x), jnp.asarray(interop.conv_transpose_weight(w.numpy())), s, p, op)
        assert_close(out, ref)

    @pytest.mark.parametrize("size", [8, 9, 13])
    def test_avg_pool_floors_like_torch(self, size):
        x = torch.randn(2, 3, size, size)
        ref = TF.avg_pool2d(x, 4)
        out = avg_pool(t2j_nhwc(x), 4)
        assert_close(out, ref)


class TestBatchNormParity:
    def test_train_mode_and_running_stats(self):
        bn = torch.nn.BatchNorm2d(5)
        bn.train()
        x = torch.randn(4, 5, 7, 7)
        ref = bn(x)
        y, new_mean, new_var = batch_norm(
            t2j_nhwc(x), jnp.ones(5), jnp.zeros(5), jnp.zeros(5), jnp.ones(5),
            use_running_average=False)
        assert_close(y, ref)
        np.testing.assert_allclose(np.asarray(new_mean), bn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(new_var), bn.running_var.numpy(), rtol=1e-5, atol=1e-6)

    def test_eval_mode(self):
        bn = torch.nn.BatchNorm2d(5)
        bn.running_mean.uniform_(-1, 1)
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.data.uniform_(0.5, 1.5)
        bn.bias.data.uniform_(-1, 1)
        bn.eval()
        x = torch.randn(4, 5, 7, 7)
        ref = bn(x)
        y, _, _ = batch_norm(
            t2j_nhwc(x), jnp.asarray(bn.weight.detach().numpy()),
            jnp.asarray(bn.bias.detach().numpy()),
            jnp.asarray(bn.running_mean.numpy()), jnp.asarray(bn.running_var.numpy()),
            use_running_average=True)
        assert_close(y, ref)


class TestSpectralNormParity:
    def test_power_iteration_matches_torch(self):
        conv = torch.nn.Conv2d(6, 8, 3, bias=False)
        conv = torch.nn.utils.spectral_norm(conv)
        conv.train()
        x = torch.randn(2, 6, 9, 9)

        kernel = jnp.asarray(interop.conv_weight(conv.weight_orig.detach().numpy().copy()))
        # .copy(): torch updates u/v in-place each forward and jnp.asarray can
        # alias the numpy view's memory on the CPU backend
        u = jnp.asarray(conv.weight_u.numpy().copy())
        v = jnp.asarray(conv.weight_v.numpy().copy())

        for it in range(3):
            ref = conv(x)  # runs one power iteration + normalized conv
            kn, u, v = spectral_normalize(kernel, u, v, update=True)
            out = conv2d(t2j_nhwc(x), kn, 1, 0)
            assert_close(out, ref, rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.asarray(u), conv.weight_u.numpy().copy(), rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(v), conv.weight_v.numpy().copy(), rtol=1e-4, atol=1e-5)

        # eval mode: stored (u, v), no update
        conv.eval()
        ref = conv(x)
        kn, _, _ = spectral_normalize(kernel, u, v, update=False)
        out = conv2d(t2j_nhwc(x), kn, 1, 0)
        assert_close(out, ref, rtol=1e-4, atol=1e-4)


def build_torch_vae_block(params, mode, res_mode="pre-activation"):
    """Functional torch forward of a ResBlockVAE from flax params (eval-mode BN)."""

    def bn(x, p, stats):
        return TF.batch_norm(
            x, torch.tensor(np.asarray(stats["mean"])), torch.tensor(np.asarray(stats["var"])),
            torch.tensor(np.asarray(p["scale"])), torch.tensor(np.asarray(p["bias"])),
            training=False, eps=1e-5)

    def conv(x, p, stride, padding, transpose=False):
        k = np.asarray(p["kernel"])
        if transpose:
            w = torch.tensor(k.transpose(2, 3, 0, 1))  # HWIO -> IOHW
            return TF.conv_transpose2d(x, w, stride=stride, padding=padding)
        w = torch.tensor(k.transpose(3, 2, 0, 1))      # HWIO -> OIHW
        return TF.conv2d(x, w, stride=stride, padding=padding)

    def forward(x, p, stats):
        tr = mode == "upsample"
        s = 2 if mode in ("upsample", "downsample") else 1
        pad = 1
        act = lambda t: TF.leaky_relu(t, 0.01)
        sc = bn(conv(x, p["shortcut_conv"], s, pad, tr), p["shortcut_bn"], stats["shortcut_bn"])
        if res_mode == "pre-activation":
            out = bn(x, p["bn1"], stats["bn1"])
            out = act(out)
            out = conv(out, p["conv1"], s, pad, tr)
            out = bn(out, p["bn2"], stats["bn2"])
            out = act(out)
            out = conv(out, p["conv2"], 1, 1)
            return out + sc
        out = conv(x, p["conv1"], s, pad, tr)
        out = bn(out, p["bn1"], stats["bn1"])
        out = act(out)
        out = conv(out, p["conv2"], 1, 1)
        out = bn(out, p["bn2"], stats["bn2"])
        out = out + sc
        return act(out)

    return forward


class TestBlockParity:
    @pytest.mark.parametrize("mode", ["level", "upsample", "downsample"])
    @pytest.mark.parametrize("res_mode", ["pre-activation", "standard"])
    def test_resblock_vae_eval(self, mode, res_mode):
        from vaegan_tpu.models.blocks import ResBlockVAE

        block = ResBlockVAE(out_channels=6, mode=mode, res_mode=res_mode)
        x = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
        variables = block.init({"params": jax.random.key(0), "dropout": jax.random.key(2)}, x, train=False)
        # randomize batch_stats so eval-mode BN is a real test
        stats = jax.tree.map(lambda a: a + 0.3 * jax.random.normal(jax.random.key(3), a.shape) ** 2,
                             variables["batch_stats"])
        variables = {"params": variables["params"], "batch_stats": stats}
        out = block.apply(variables, x, train=False)

        fwd = build_torch_vae_block(variables["params"], mode, res_mode)
        ref = fwd(j2t_nchw(x), variables["params"], variables["batch_stats"])
        assert_close(out, ref, rtol=1e-4, atol=1e-4)


class TestGeneratorParity:
    def test_full_generator_eval(self):
        """Composition order check: flax generator vs a torch functional walk of the
        same architecture (depth 1, feature 8, 16x16) with shared weights."""
        from vaegan_tpu.config import GeneratorConfig
        from vaegan_tpu.models import UnsupervisedGeneratorNetwork

        cfg = GeneratorConfig(depth=1, length=2, feature_size=8)
        gen = UnsupervisedGeneratorNetwork(cfg=cfg)
        x = jax.random.normal(jax.random.key(1), (2, 16, 16, 1))
        v = gen.init({"params": jax.random.key(0), "dropout": jax.random.key(2),
                      "noise": jax.random.key(3)}, x, train=False)
        recon, mu, lv = gen.apply(v, x, train=False)

        p, st = v["params"], v["batch_stats"]
        xt = j2t_nchw(x)

        def walk_block(xt, name, mode, scope):
            fwd = build_torch_vae_block(p[scope][name], mode)
            return fwd(xt, p[scope][name], st[scope][name])

        h = walk_block(xt, "encoder-depth_0-level_0", "level", "encoder")
        h = walk_block(h, "encoder-depth_0-level_1", "level", "encoder")
        h = walk_block(h, "encoder-depth_1-downsample", "downsample", "encoder")
        h = walk_block(h, "encoder-depth_1-level_0", "level", "encoder")

        def conv_b(x, pp):
            w = torch.tensor(np.asarray(pp["kernel"]).transpose(3, 2, 0, 1))
            return TF.conv2d(x, w, torch.tensor(np.asarray(pp["bias"])), stride=1, padding=1)

        lv_t = torch.clamp(conv_b(h, p["code_processor"]["log_var"]), -50.0, 50.0)
        mu_t = conv_b(h, p["code_processor"]["mu"])
        z = mu_t  # eval mode

        d = walk_block(z, "decoder-depth_1-upsample", "upsample", "decoder")
        d = walk_block(d, "decoder-depth_1-level_0", "level", "decoder")
        d = walk_block(d, "decoder-depth_0-reconstruction", "level", "decoder")

        assert_close(mu, mu_t, rtol=1e-4, atol=1e-4)
        assert_close(lv, lv_t, rtol=1e-4, atol=1e-4)
        assert_close(recon, d, rtol=1e-3, atol=1e-4)


class TestInterop:
    def test_torch_state_dict_roundtrip(self):
        """Build torch layers named like our modules, import the state_dict, and
        check the imported forward matches torch (conv + bn + linear chain)."""
        import torch.nn as tnn

        class Tiny(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = tnn.Conv2d(2, 4, 3, stride=1, padding=1, bias=False)
                self.bn1 = tnn.BatchNorm2d(4)
                self.linear_1 = tnn.Linear(4 * 4 * 4, 3)

            def forward(self, x):
                h = TF.leaky_relu(self.bn1(self.conv1(x)), 0.2)
                h = TF.avg_pool2d(h, 2)
                return self.linear_1(h.flatten(1))

        m = Tiny().eval()
        m.bn1.running_mean.uniform_(-1, 1)
        m.bn1.running_var.uniform_(0.5, 2)
        x = torch.randn(2, 2, 8, 8)
        ref = m(x)

        var = interop.torch_state_dict_to_variables(
            m.state_dict(), first_linear="linear_1", pool_shape=(4, 4, 4))
        xj = t2j_nhwc(x)
        h = conv2d(xj, jnp.asarray(var["params"]["conv1"]["kernel"]), 1, 1)
        h, _, _ = batch_norm(
            h, jnp.asarray(var["params"]["bn1"]["scale"]), jnp.asarray(var["params"]["bn1"]["bias"]),
            jnp.asarray(var["batch_stats"]["bn1"]["mean"]), jnp.asarray(var["batch_stats"]["bn1"]["var"]),
            use_running_average=True)
        h = jnp.where(h >= 0, h, 0.2 * h)
        h = avg_pool(h, 2)
        out = h.reshape(2, -1) @ jnp.asarray(var["params"]["linear_1"]["kernel"]) + jnp.asarray(
            var["params"]["linear_1"]["bias"])
        np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(), rtol=1e-4, atol=1e-5)


class TestPhaseDecomposedConvT:
    def test_phase_path_matches_dilated_path(self):
        """The opt-in phase-decomposed lowering must be numerically exact."""
        from vaegan_tpu.ops import conv as conv_mod
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 9, 9, 6)).astype(np.float32))
        k = jnp.asarray(np.random.default_rng(1).normal(size=(4, 4, 6, 8)).astype(np.float32))
        ref = conv_mod.conv_transpose2d(x, k, 2, 1)
        try:
            conv_mod.PHASE_DECOMPOSE_CONV_TRANSPOSE = True
            got = conv_mod.conv_transpose2d(x, k, 2, 1)
        finally:
            conv_mod.PHASE_DECOMPOSE_CONV_TRANSPOSE = False
        assert got.shape == ref.shape == (2, 18, 18, 8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


class TestDiscriminatorParity:
    def test_full_critic_eval_with_imported_torch_weights(self):
        """Build the reference critic in torch (SN convs + BN + linears), import its
        state_dict through interop (incl. the flatten-order permutation of the
        first linear), and compare eval-mode logits."""
        import torch.nn as tnn

        class TorchBlock(tnn.Module):
            # matches ResBlockDiscriminator pre-activation semantics with our names
            def __init__(self, cin, cout, stride):
                super().__init__()
                self.bn1 = tnn.BatchNorm2d(cin)
                self.conv1 = torch.nn.utils.spectral_norm(
                    tnn.Conv2d(cin, cout, 3, stride, 1, bias=False))
                self.bn2 = tnn.BatchNorm2d(cout)
                self.conv2 = torch.nn.utils.spectral_norm(
                    tnn.Conv2d(cout, cout, 3, 1, 1, bias=False))
                self.need_sc = stride != 1 or cin != cout
                if self.need_sc:
                    self.shortcut_conv = torch.nn.utils.spectral_norm(
                        tnn.Conv2d(cin, cout, 1, stride, bias=False))
                    self.shortcut_bn = tnn.BatchNorm2d(cout)

            def forward(self, x):
                sc = self.shortcut_bn(self.shortcut_conv(x)) if self.need_sc else x
                h = TF.leaky_relu(self.bn1(x), 0.2)
                h = self.conv1(h)
                h = TF.leaky_relu(self.bn2(h), 0.2)
                h = self.conv2(h)
                return h + sc

        class TorchCritic(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = tnn.Conv2d(1, 8, 3, 1, 1, bias=False)
                self.bn1 = tnn.BatchNorm2d(8)
                self.res_layers_0_0 = TorchBlock(8, 16, 2)
                self.linear_1 = tnn.Linear(16 * 4 * 4, 16)
                self.linear_2 = tnn.Linear(16, 8)
                self.linear_3 = tnn.Linear(8, 8)
                self.linear_4 = tnn.Linear(8, 1)

            def forward(self, x):
                h = TF.leaky_relu(self.bn1(self.conv1(x)), 0.2)
                h = self.res_layers_0_0(h)
                h = TF.avg_pool2d(h, 2)
                h = h.flatten(1)
                for lin in (self.linear_1, self.linear_2, self.linear_3):
                    h = TF.leaky_relu(lin(h), 0.2)
                return self.linear_4(h)

        torch.manual_seed(3)
        m = TorchCritic()
        # randomize BN stats so eval mode is a real test
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
        m.eval()
        x = torch.randn(2, 1, 16, 16)
        ref = m(x)

        from vaegan_tpu.config import DiscriminatorConfig
        from vaegan_tpu.models import Discriminator
        cfg = DiscriminatorConfig(
            num_stride_conv1=1, num_features_conv1=8, num_blocks=(1,),
            num_strides_res=(2,), num_features_res=(16,), pool_size=2,
            linear_widths=(16, 8, 8))
        disc = Discriminator(cfg=cfg)
        variables = interop.torch_state_dict_to_variables(
            m.state_dict(), first_linear="linear_1", pool_shape=(16, 4, 4))
        variables = jax.tree.map(jnp.asarray, variables)
        out = disc.apply(variables, t2j_nhwc(x), train=False)
        np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(),
                                   rtol=1e-4, atol=1e-4)


class TestInteropReferenceNaming:
    def test_sequential_shortcut_and_upsample_mapping(self):
        """The reference stores shortcuts as Sequential(conv, bn) -> keys
        'shortcut.0.weight' / 'shortcut.1.*', and upsample blocks hold
        ConvTranspose2d weights (I, O, KH, KW). interop must map both."""
        import torch.nn as tnn

        conv_t = tnn.ConvTranspose2d(8, 4, 4, 2, 1, bias=False)
        bn = tnn.BatchNorm2d(4)
        bn.running_mean.uniform_(-1, 1)
        sd = {
            "decoder-depth_1-upsample.shortcut.0.weight": conv_t.weight,
            "decoder-depth_1-upsample.shortcut.1.weight": bn.weight,
            "decoder-depth_1-upsample.shortcut.1.bias": bn.bias,
            "decoder-depth_1-upsample.shortcut.1.running_mean": bn.running_mean,
            "decoder-depth_1-upsample.shortcut.1.running_var": bn.running_var,
            "decoder-depth_1-upsample.shortcut.1.num_batches_tracked": torch.zeros((), dtype=torch.long),
        }
        var = interop.torch_state_dict_to_variables(sd)
        blk = var["params"]["decoder-depth_1-upsample"]
        assert blk["shortcut_conv"]["kernel"].shape == (4, 4, 8, 4)  # HWIO, I=8
        assert blk["shortcut_bn"]["scale"].shape == (4,)
        np.testing.assert_array_equal(
            var["batch_stats"]["decoder-depth_1-upsample"]["shortcut_bn"]["mean"],
            bn.running_mean.numpy())
        # the convT kernel consumed by our conv_transpose2d must reproduce torch
        x = torch.randn(1, 8, 5, 5)
        ref = TF.conv_transpose2d(x, conv_t.weight, stride=2, padding=1)
        out = conv_transpose2d(t2j_nhwc(x), jnp.asarray(blk["shortcut_conv"]["kernel"]), 2, 1)
        assert_close(out, ref)

    def test_full_vae_block_import_roundtrip(self):
        """A torch module laid out exactly like the reference's ResBlockVAE
        (bn1/conv1/bn2/conv2/shortcut Sequential) imports into our block and
        produces the same eval output."""
        import torch.nn as tnn

        class RefBlock(tnn.Module):
            def __init__(self, cin, cout):
                super().__init__()
                self.bn1 = tnn.BatchNorm2d(cin)
                self.conv1 = tnn.Conv2d(cin, cout, 3, 1, 1, bias=False)
                self.bn2 = tnn.BatchNorm2d(cout)
                self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
                self.shortcut = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 3, 1, 1, bias=False), tnn.BatchNorm2d(cout))

            def forward(self, x):
                out = TF.leaky_relu(self.bn1(x), 0.01)
                out = self.conv1(out)
                out = TF.leaky_relu(self.bn2(out), 0.01)
                out = self.conv2(out)
                return out + self.shortcut(x)

        torch.manual_seed(5)
        m = RefBlock(4, 6)
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
        m.eval()
        x = torch.randn(2, 4, 8, 8)
        ref = m(x)

        from vaegan_tpu.models.blocks import ResBlockVAE
        blk = ResBlockVAE(out_channels=6, mode="level")
        variables = jax.tree.map(jnp.asarray,
                                 interop.torch_state_dict_to_variables(m.state_dict()))
        out = blk.apply(variables, t2j_nhwc(x), train=False)
        assert_close(out, ref, rtol=1e-4, atol=1e-4)


class TestInteropUpsampleConv2:
    def test_plain_conv2_inside_upsample_block_not_transposed(self):
        """conv2 inside an upsample-named block is a PLAIN conv (README.md:170);
        interop must not channel-transpose its square kernel (silent corruption)."""
        import torch.nn as tnn
        conv2 = tnn.Conv2d(6, 6, 3, 1, 1, bias=False)          # square: shape-ambiguous
        convt = tnn.ConvTranspose2d(8, 6, 4, 2, 1, bias=False)  # the actual convT
        sd = {
            "decoder-depth_1-upsample.conv1.weight": convt.weight,
            "decoder-depth_1-upsample.conv2.weight": conv2.weight,
        }
        var = interop.torch_state_dict_to_variables(sd)
        blk = var["params"]["decoder-depth_1-upsample"]
        # conv1: IOHW (8,6,4,4) -> HWIO (4,4,8,6)
        assert blk["conv1"]["kernel"].shape == (4, 4, 8, 6)
        # conv2: OIHW (6,6,3,3) -> HWIO with the ORIGINAL in/out order
        x = torch.randn(1, 6, 5, 5)
        ref = TF.conv2d(x, conv2.weight, padding=1)
        out = conv2d(t2j_nhwc(x), jnp.asarray(blk["conv2"]["kernel"]), 1, 1)
        assert_close(out, ref)
