"""Numerical parity against torch (CPU) for the core op semantics the
reference relies on: conv/deconv padding conventions, spectral-norm
power iteration, BatchNorm running statistics, and the bilinear
grid_sample underlying the ADA geometric warp."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


class TestConvParity:
    def test_conv2d_matches_torch(self):
        from studiogan_tpu.ops.layers import Conv2d
        rng = np.random.RandomState(0)
        x = rng.randn(2, 9, 9, 3).astype(np.float32)
        m = Conv2d(5, kernel_size=3, stride=2, padding=1)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        w = np.asarray(v["params"]["kernel"])          # HWIO
        b = np.asarray(v["params"]["bias"])
        y = np.asarray(m.apply(v, jnp.asarray(x)))

        tconv = torch.nn.Conv2d(3, 5, 3, stride=2, padding=1)
        with torch.no_grad():
            tconv.weight.copy_(torch.tensor(w.transpose(3, 2, 0, 1)))
            tconv.bias.copy_(torch.tensor(b))
            ty = tconv(torch.tensor(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(y, ty.numpy().transpose(0, 2, 3, 1),
                                   atol=2e-5)

    def test_deconv_matches_torch(self):
        from studiogan_tpu.ops.layers import ConvTranspose2d
        rng = np.random.RandomState(1)
        x = rng.randn(2, 6, 6, 3).astype(np.float32)
        m = ConvTranspose2d(4, kernel_size=4, stride=2, padding=1)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        w = np.asarray(v["params"]["kernel"])          # HWIO
        b = np.asarray(v["params"]["bias"])
        y = np.asarray(m.apply(v, jnp.asarray(x)))

        tde = torch.nn.ConvTranspose2d(3, 4, 4, stride=2, padding=1)
        with torch.no_grad():
            # torch deconv weight layout: (in, out, kh, kw); lax.conv_transpose
            # uses the kernel unflipped -> torch needs it spatially flipped
            tde.weight.copy_(torch.tensor(
                w[::-1, ::-1].transpose(2, 3, 0, 1).copy()))
            tde.bias.copy_(torch.tensor(b))
            ty = tde(torch.tensor(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(y, ty.numpy().transpose(0, 2, 3, 1),
                                   atol=2e-5)


class TestSpectralNormParity:
    def test_sigma_matches_torch_power_iteration(self):
        """After k steps both implementations estimate the same sigma
        (same math; different random u0, so compare the converged value)."""
        from studiogan_tpu.ops.layers import Dense
        rng = np.random.RandomState(2)
        w = rng.randn(12, 7).astype(np.float32)  # (out, in)

        m = Dense(12, sn=True, use_bias=False,
                  kernel_init=lambda *a: jnp.asarray(w.T))
        x = jnp.ones((1, 7))
        v = m.init(jax.random.PRNGKey(0), x)
        params, sn = v["params"], v["sn"]
        for _ in range(100):
            _, upd = m.apply({"params": params, "sn": sn}, x, mutable=["sn"])
            sn = upd["sn"]
        sigma_ours = float(sn["u"] @ w @ sn["v"])

        lin = torch.nn.Linear(7, 12, bias=False)
        with torch.no_grad():
            lin.weight.copy_(torch.tensor(w))
        lin = torch.nn.utils.spectral_norm(lin, n_power_iterations=1)
        lin.train()
        for _ in range(100):
            lin(torch.ones(1, 7))
        u = lin.weight_u.detach().numpy()
        vv = lin.weight_v.detach().numpy()
        sigma_torch = float(u @ w @ vv)
        assert abs(sigma_ours - sigma_torch) / sigma_torch < 1e-3

    def test_normalized_forward_matches(self):
        """W/sigma forward equals torch's SN layer output at convergence."""
        from studiogan_tpu.ops.layers import Dense
        rng = np.random.RandomState(3)
        w = rng.randn(8, 8).astype(np.float32)
        x_np = rng.randn(4, 8).astype(np.float32)

        m = Dense(8, sn=True, use_bias=False,
                  kernel_init=lambda *a: jnp.asarray(w.T))
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
        params, sn = v["params"], v["sn"]
        for _ in range(200):
            y_ours, upd = m.apply({"params": params, "sn": sn},
                                  jnp.asarray(x_np), mutable=["sn"])
            sn = upd["sn"]

        lin = torch.nn.Linear(8, 8, bias=False)
        with torch.no_grad():
            lin.weight.copy_(torch.tensor(w))
        lin = torch.nn.utils.spectral_norm(lin, n_power_iterations=1)
        lin.train()
        for _ in range(200):
            y_torch = lin(torch.tensor(x_np))
        np.testing.assert_allclose(np.asarray(y_ours),
                                   y_torch.detach().numpy(), rtol=2e-3,
                                   atol=2e-4)


class TestBatchNormParity:
    def test_running_stats_match_torch(self):
        from studiogan_tpu.ops.layers import BatchNorm2d
        rng = np.random.RandomState(4)
        m = BatchNorm2d(6, eps=1e-4, momentum=0.1, affine=False)
        x0 = rng.randn(8, 5, 5, 6).astype(np.float32)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x0))
        state = v["batch_stats"]

        tbn = torch.nn.BatchNorm2d(6, eps=1e-4, momentum=0.1, affine=False)
        tbn.train()
        for i in range(5):
            xi = rng.randn(8, 5, 5, 6).astype(np.float32)
            y_ours, upd = m.apply({"batch_stats": state}, jnp.asarray(xi),
                                  train=True, mutable=["batch_stats"])
            state = upd["batch_stats"]
            ty = tbn(torch.tensor(xi.transpose(0, 3, 1, 2)))
            np.testing.assert_allclose(np.asarray(y_ours),
                                       ty.numpy().transpose(0, 2, 3, 1),
                                       atol=1e-4)
        np.testing.assert_allclose(np.asarray(state["mean"]),
                                   tbn.running_mean.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(state["var"]),
                                   tbn.running_var.numpy(), atol=1e-5)

        # eval mode uses the running stats identically
        xe = rng.randn(4, 5, 5, 6).astype(np.float32)
        y_eval = m.apply({"batch_stats": state}, jnp.asarray(xe), train=False)
        tbn.eval()
        te = tbn(torch.tensor(xe.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(np.asarray(y_eval),
                                   te.numpy().transpose(0, 2, 3, 1), atol=1e-4)


class TestGridSampleParity:
    def test_bilinear_zeros_matches_torch(self):
        from studiogan_tpu.aug.ada_aug import _grid_sample_bilinear
        rng = np.random.RandomState(5)
        img = rng.randn(2, 7, 9, 3).astype(np.float32)
        grid = (rng.rand(2, 5, 6, 2).astype(np.float32) * 2.4 - 1.2)
        ours = np.asarray(_grid_sample_bilinear(jnp.asarray(img),
                                                jnp.asarray(grid)))
        t = torch.nn.functional.grid_sample(
            torch.tensor(img.transpose(0, 3, 1, 2)), torch.tensor(grid),
            mode="bilinear", padding_mode="zeros", align_corners=False)
        np.testing.assert_allclose(ours, t.numpy().transpose(0, 2, 3, 1),
                                   atol=1e-5)


class TestSelfAttentionParity:
    def _torch_forward(self, x_nchw, wt, wp, wg, wo, sigma):
        """Reference SelfAttention forward (ops.py:84-103) with plain
        convs (weights injected)."""
        conv = torch.nn.functional.conv2d
        pool = torch.nn.functional.max_pool2d
        x = torch.tensor(x_nchw)
        n, ch, h, w = x.shape
        theta = conv(x, torch.tensor(wt)).view(-1, ch // 8, h * w)
        phi = pool(conv(x, torch.tensor(wp)), 2, 2).view(-1, ch // 8,
                                                         h * w // 4)
        attn = torch.softmax(torch.bmm(theta.permute(0, 2, 1), phi), dim=-1)
        g = pool(conv(x, torch.tensor(wg)), 2, 2).view(-1, ch // 2,
                                                       h * w // 4)
        attn_g = torch.bmm(g, attn.permute(0, 2, 1)).view(-1, ch // 2, h, w)
        attn_g = conv(attn_g, torch.tensor(wo))
        return (x + sigma * attn_g).numpy()

    @pytest.mark.parametrize("q_chunk", [-1, 16])
    def test_matches_reference_math(self, q_chunk):
        from studiogan_tpu.ops.layers import SelfAttention
        rng = np.random.RandomState(0)
        c = 16
        x = rng.randn(2, 8, 8, c).astype(np.float32)
        mod = SelfAttention(c, q_chunk=q_chunk)
        v = mod.init(jax.random.PRNGKey(1), jnp.asarray(x))
        v = jax.tree.map(lambda a: a, v)  # concrete copy
        # give sigma a nonzero value so the attention branch matters
        params = dict(v["params"])
        params["sigma"] = jnp.asarray([0.7])
        y = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))

        def oihw(name):
            k = np.asarray(params[name]["kernel"])     # HWIO (1,1,I,O)
            return k.transpose(3, 2, 0, 1)
        with torch.no_grad():
            ty = self._torch_forward(
                x.transpose(0, 3, 1, 2), oihw("theta"), oihw("phi"),
                oihw("g"), oihw("attn_out"), 0.7)
        np.testing.assert_allclose(y.transpose(0, 3, 1, 2), ty,
                                   rtol=2e-4, atol=2e-5)
