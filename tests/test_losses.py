"""Golden-value loss tests vs torch (reductions, KL batch-sum semantics, GP value on
canned inputs, BCE-with-logits, torch-RMSprop trajectory)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vaegan_tpu import losses  # noqa: E402
from vaegan_tpu.train.optim import torch_rmsprop  # noqa: E402


class TestReconLosses:
    def test_l1_mse_match_torch(self):
        a = torch.randn(4, 1, 8, 8)
        b = torch.randn(4, 1, 8, 8)
        ref = (torch.nn.L1Loss()(a, b) + torch.nn.MSELoss()(a, b)).item()
        got = losses.pixel_reconstruction_loss(
            jnp.asarray(a.numpy()), jnp.asarray(b.numpy()))
        assert abs(float(got) - ref) < 1e-6


class TestKL:
    def test_batch_sum_semantics(self):
        """KL must sum over batch AND dims (reference README.md:822-825)."""
        mu = torch.randn(4, 16, 3, 3)
        lv = torch.randn(4, 16, 3, 3)
        mu_f = torch.flatten(mu, start_dim=1)
        lv_f = torch.flatten(lv, start_dim=1)
        ref = (-0.5 * torch.sum(1 + lv_f - mu_f.pow(2) - lv_f.exp())).mean().item()
        got = losses.kl_divergence(jnp.asarray(mu.numpy()), jnp.asarray(lv.numpy()), "sum")
        assert abs(float(got) - ref) < abs(ref) * 1e-5 + 1e-4

    def test_mean_is_sum_over_batch(self):
        mu = jnp.ones((4, 2, 2, 2)) * 0.5
        lv = jnp.zeros((4, 2, 2, 2))
        s = losses.kl_divergence(mu, lv, "sum")
        m = losses.kl_divergence(mu, lv, "mean")
        assert abs(float(s) / 4 - float(m)) < 1e-6


class TestBCE:
    def test_matches_torch_bce_with_logits(self):
        logits = torch.randn(8, 1) * 3
        for target in (0.0, 1.0):
            t = torch.full_like(logits, target)
            ref = torch.nn.BCEWithLogitsLoss()(logits, t).item()
            got = losses.bce_with_logits(jnp.asarray(logits.numpy()), target)
            assert abs(float(got) - ref) < 1e-6


class TestGradientPenalty:
    def test_matches_torch_on_linear_critic(self):
        """With a known critic D(x) = <w, x>, grad is w for every sample and the
        penalty is (||w|| - 1)^2 — verified against the torch implementation."""
        torch.manual_seed(0)
        w = torch.randn(1, 1, 6, 6)

        real_t = torch.randn(4, 1, 6, 6)
        fake_t = torch.randn(4, 1, 6, 6)
        alpha_np = np.random.RandomState(0).random((4, 1, 1, 1)).astype(np.float32)

        # torch side (reference compute_gradient_penalty semantics, README.md:717-739)
        alpha = torch.tensor(alpha_np)
        interpolates = (alpha * real_t + (1 - alpha) * fake_t).requires_grad_(True)
        d_out = (interpolates * w).sum(dim=(1, 2, 3), keepdim=False).unsqueeze(1)
        grads = torch.autograd.grad(d_out, interpolates,
                                    torch.ones_like(d_out), create_graph=True)[0]
        ref = ((grads.view(4, -1).norm(2, dim=1) - 1) ** 2).mean().item()

        # jax side with the same alpha (patch uniform for determinism)
        wj = jnp.asarray(w.numpy().transpose(0, 2, 3, 1))

        def critic(x):
            return jnp.sum(x * wj, axis=(1, 2, 3), keepdims=False)[:, None]

        real = jnp.asarray(real_t.numpy().transpose(0, 2, 3, 1))
        fake = jnp.asarray(fake_t.numpy().transpose(0, 2, 3, 1))
        orig_uniform = jax.random.uniform
        try:
            jax.random.uniform = lambda *a, **k: jnp.asarray(alpha_np)
            gp, _ = losses.gradient_penalty(critic, real, fake, jax.random.key(0))
        finally:
            jax.random.uniform = orig_uniform
        assert abs(float(gp) - ref) < 1e-5
        # analytic check: penalty == (||w||-1)^2 regardless of alpha
        expected = (np.linalg.norm(w.numpy()) - 1.0) ** 2
        assert abs(float(gp) - expected) < 1e-5


class TestTorchRmsprop:
    def test_trajectory_matches_torch(self):
        torch.manual_seed(0)
        p_t = torch.nn.Parameter(torch.randn(7, 5))
        opt = torch.optim.RMSprop([p_t], lr=3e-4, weight_decay=1e-5)

        import optax
        tx = torch_rmsprop(3e-4, weight_decay=1e-5)
        p_j = jnp.asarray(p_t.detach().numpy().copy())
        st = tx.init(p_j)

        for i in range(5):
            g = torch.randn(7, 5)
            opt.zero_grad()
            p_t.grad = g.clone()
            opt.step()
            upd, st = tx.update(jnp.asarray(g.numpy()), st, p_j)
            p_j = optax.apply_updates(p_j, upd)
            np.testing.assert_allclose(
                np.asarray(p_j), p_t.detach().numpy(), rtol=1e-5, atol=1e-7,
                err_msg=f"diverged at step {i}")
