"""Op-level unit tests: SN, BN modes, cBN, attention, bias_act, upfirdn2d."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from studiogan_tpu.ops import (
    Dense, Conv2d, ConvTranspose2d, Embedding, BatchNorm2d,
    ConditionalBatchNorm2d, SelfAttention, bias_act, upfirdn2d, setup_filter,
    filtered_lrelu, upsample2d, downsample2d,
)


def rng():
    return jax.random.PRNGKey(0)


class TestSpectralNorm:
    def test_sn_dense_sigma_converges_to_top_singular_value(self):
        """After many power iterations, ||W_sn||_2 -> 1."""
        m = Dense(16, sn=True)
        x = jax.random.normal(rng(), (4, 8))
        variables = m.init(rng(), x)
        params, sn = variables["params"], variables["sn"]
        for _ in range(50):
            _, upd = m.apply({"params": params, "sn": sn}, x, mutable=["sn"])
            sn = upd["sn"]
        # normalized weight's top singular value
        w = params["kernel"].T  # (out, in)
        u, v = sn["u"], sn["v"]
        sigma = u @ w @ v
        top = jnp.linalg.svd(w, compute_uv=False)[0]
        assert jnp.allclose(sigma, top, rtol=1e-3)

    def test_sn_u_frozen_without_mutable(self):
        m = Dense(16, sn=True)
        x = jax.random.normal(rng(), (4, 8))
        variables = m.init(rng(), x)
        y1 = m.apply(variables, x)  # eval: no mutation allowed, must not crash
        y2 = m.apply(variables, x)
        assert jnp.allclose(y1, y2)

    def test_sn_conv_and_embedding(self):
        # N02 init: ortho init has all-ones singular values, making power
        # iteration a fixed point (u would not visibly move).
        x = jax.random.normal(rng(), (2, 8, 8, 3))
        m = Conv2d(8, kernel_size=3, sn=True,
                   kernel_init=jax.nn.initializers.normal(0.02))
        v = m.init(rng(), x)
        y, upd = m.apply(v, x, mutable=["sn"])
        assert y.shape == (2, 8, 8, 8)
        assert not jnp.allclose(upd["sn"]["u"], v["sn"]["u"])

        e = Embedding(10, 16, sn=True)
        v = e.init(rng(), jnp.array([1, 2]))
        out = e.apply(v, jnp.array([1, 2]))
        assert out.shape == (2, 16)


class TestConvShapes:
    def test_conv_stride_padding(self):
        x = jnp.ones((2, 32, 32, 3))
        y = Conv2d(4, kernel_size=4, stride=2, padding=1).init_with_output(rng(), x)[0]
        assert y.shape == (2, 16, 16, 4)  # torch Conv2d(k4,s2,p1) halves

    def test_deconv_doubles(self):
        x = jnp.ones((2, 8, 8, 3))
        y = ConvTranspose2d(4, kernel_size=4, stride=2, padding=1).init_with_output(rng(), x)[0]
        assert y.shape == (2, 16, 16, 4)  # torch ConvTranspose2d(k4,s2,p1) doubles


class TestBatchNorm:
    def test_train_normalizes_batch(self):
        x = jax.random.normal(rng(), (64, 4, 4, 8)) * 3.0 + 1.0
        m = BatchNorm2d(8, affine=False)
        v = m.init(rng(), x)
        y, upd = m.apply(v, x, train=True, mutable=["batch_stats"])
        assert abs(float(y.mean())) < 1e-3
        assert abs(float(y.std()) - 1.0) < 1e-2
        # running stats moved toward batch stats (torch momentum 0.1)
        assert jnp.allclose(upd["batch_stats"]["mean"],
                            0.1 * x.mean(axis=(0, 1, 2)), atol=1e-5)

    def test_eval_uses_running_stats(self):
        x = jax.random.normal(rng(), (16, 4, 4, 8))
        m = BatchNorm2d(8, affine=True)
        v = m.init(rng(), x)
        y = m.apply(v, x, train=False)  # zeros/ones running stats
        assert jnp.allclose(y, x / jnp.sqrt(1 + 1e-4), atol=1e-5)

    def test_standing_stats_cumulative_average(self):
        """accumulate mode = cumulative moving average over batches
        (reference misc.py:301 apply_standing_statistics)."""
        m = BatchNorm2d(8, affine=False)
        k = rng()
        x0 = jax.random.normal(k, (32, 4, 4, 8))
        v = m.init(rng(), x0)
        state = v["batch_stats"]
        means = []
        for i in range(4):
            xi = jax.random.normal(jax.random.fold_in(k, i), (32, 4, 4, 8)) + i
            means.append(xi.mean(axis=(0, 1, 2)))
            _, upd = m.apply({"batch_stats": state}, xi, train=False,
                             accumulate=True, mutable=["batch_stats"])
            state = upd["batch_stats"]
        assert jnp.allclose(state["mean"], jnp.stack(means).mean(0), atol=1e-5)
        assert state["n"] == 4.0

    def test_cbn_gain_bias_from_label(self):
        m = ConditionalBatchNorm2d(8)
        x = jax.random.normal(rng(), (4, 4, 4, 8))
        y_embed = jax.random.normal(rng(), (4, 32))
        v = m.init(rng(), x, y_embed)
        out, _ = m.apply(v, x, y_embed, mutable=["batch_stats"])
        assert out.shape == x.shape


class TestSelfAttention:
    def test_shapes_and_identity_at_init(self):
        """sigma init 0 => attention block is the identity at init
        (reference ops.py:85 sigma = zeros)."""
        x = jax.random.normal(rng(), (2, 16, 16, 32))
        m = SelfAttention(32, sn=True)
        v = m.init(rng(), x)
        y = m.apply(v, x)
        assert y.shape == x.shape
        assert jnp.allclose(y, x, atol=1e-6)


class TestBiasAct:
    def test_lrelu_gain_clamp(self):
        x = jnp.array([-2.0, -0.5, 0.5, 2.0])
        b = jnp.array([1.0])
        y = bias_act(x[:, None], b, act="lrelu", alpha=0.2, gain=2.0, clamp=3.0)
        expected = jnp.clip(
            jnp.where(x + 1 >= 0, x + 1, 0.2 * (x + 1)) * 2.0, -3.0, 3.0)
        assert jnp.allclose(y[:, 0], expected)

    def test_default_gains(self):
        x = jnp.ones((4, 4))
        assert jnp.allclose(bias_act(x, act="relu"), x * np.sqrt(2))
        assert jnp.allclose(bias_act(x, act="linear"), x)


class TestUpfirdn2d:
    def test_identity(self):
        x = jax.random.normal(rng(), (1, 8, 8, 2))
        assert jnp.allclose(upfirdn2d(x, None), x)

    def test_box_filter_average(self):
        x = jnp.ones((1, 8, 8, 1))
        f = setup_filter([1, 1])  # normalized box
        y = upfirdn2d(x, f, padding=0)
        assert y.shape == (1, 7, 7, 1)
        assert jnp.allclose(y, 1.0)

    def test_upsample_shape_and_energy(self):
        x = jnp.ones((1, 4, 4, 1))
        f = setup_filter([1, 3, 3, 1])
        y = upsample2d(x, f, up=2)
        assert y.shape == (1, 8, 8, 1)
        # interior values ~1 after gain=up^2 compensation
        assert jnp.allclose(y[:, 2:-2, 2:-2], 1.0, atol=1e-5)

    def test_downsample_shape(self):
        x = jnp.ones((1, 8, 8, 1))
        f = setup_filter([1, 3, 3, 1])
        y = downsample2d(x, f, down=2)
        assert y.shape == (1, 4, 4, 1)
        assert jnp.allclose(y[:, 1:-1, 1:-1], 1.0, atol=1e-5)

    def test_separable_matches_2d(self):
        x = jax.random.normal(rng(), (2, 16, 16, 3))
        taps = np.array([1.0, 3.0, 3.0, 1.0])
        f1 = setup_filter(taps, separable=True)
        f2 = setup_filter(np.outer(taps, taps) / taps.sum() ** 2, normalize=False)
        y1 = upfirdn2d(x, f1, up=2, down=1, padding=2)
        y2 = upfirdn2d(x, f2, up=2, down=1, padding=2)
        assert y1.shape == y2.shape
        assert jnp.allclose(y1, y2, atol=1e-4)

    def test_large_spatial_tiny_channel_autoroutes_to_matmul(self):
        """512px+ ADA-style image filtering (C=3) must take the band-
        matmul path: XLA's grouped-conv layout pads (channel, batch) to
        a (4,128) tile there — the (N, 2H+pad, 2W+pad, 3) intermediate
        inflates ~21x and OOMs HBM at 512px (round-5 chip observation).
        The two formulations must agree exactly; this also covers the
        device-scatter band build (n_out*n_in > 4M skips the dense
        numpy constant)."""
        import importlib
        mod = importlib.import_module("studiogan_tpu.ops.upfirdn2d")

        f = setup_filter([1.0, 3.0, 3.0, 1.0], separable=True)
        # heuristic trigger: C=3, spatial*up >= 256 (W kept tiny so the
        # CPU einsum stays cheap); n_out*n_in = 536*260 < 4M (dense)
        x = jax.random.normal(rng(), (2, 260, 12, 3))
        y_auto = upfirdn2d(x, f, up=(1, 2), down=1, padding=2)
        orig = mod._IMPL
        try:
            mod._IMPL = "depthwise"
            y_ref = upfirdn2d(x, f, up=(1, 2), down=1, padding=2)
        finally:
            mod._IMPL = orig
        assert y_auto.shape == y_ref.shape
        np.testing.assert_allclose(np.asarray(y_auto), np.asarray(y_ref),
                                   atol=1e-4)

        # device-scatter branch: H=2100, up=2 -> band ~ (4202, 2100) =
        # 8.8M entries > 4M
        x2 = jax.random.normal(rng(), (1, 2100, 4, 3))
        y2_auto = upfirdn2d(x2, f, up=(1, 2), down=1, padding=2)
        orig = mod._IMPL
        try:
            mod._IMPL = "depthwise"
            y2_ref = upfirdn2d(x2, f, up=(1, 2), down=1, padding=2)
        finally:
            mod._IMPL = orig
        np.testing.assert_allclose(np.asarray(y2_auto), np.asarray(y2_ref),
                                   atol=1e-4)

    def test_scipy_equivalence_1d_chain(self):
        """Cross-check against scipy.signal.upfirdn along one axis."""
        from scipy.signal import upfirdn as sp_upfirdn
        x = np.random.RandomState(0).randn(1, 1, 16, 1).astype(np.float32)
        taps = np.array([1.0, 2.0, 1.0], dtype=np.float32)
        # ours: upsample x2 along W only, no padding trim mismatch:
        y = upfirdn2d(jnp.asarray(np.broadcast_to(x, (1, 1, 16, 1))),
                      taps[None, :] / 1.0, up=(2, 1), down=(1, 1),
                      padding=(2, 2, 0, 0), flip_filter=True, gain=1.0)
        ref = sp_upfirdn(taps, x[0, 0, :, 0], up=2)
        # scipy output length = 16*2 + len(h) - 1 - 1; ours with pad 2,2:
        # in*up + px0 + px1 - (fw - 1) = 32 + 4 - 2 = 34... compare overlap
        ours = np.asarray(y[0, 0, :, 0])
        # align: scipy pads filter at start; our padding (2,2) gives 2 extra
        # leading taps vs scipy's 0 → scipy[k] == ours[k+? ]; check via
        # cross-correlation that sequences match on the valid interior.
        best = max(np.correlate(ours, ref, "full")) / (
            np.linalg.norm(ours) * np.linalg.norm(ref))
        assert best > 0.999


class TestFilteredLrelu:
    def test_matches_decomposition(self):
        x = jax.random.normal(rng(), (1, 8, 8, 4))
        b = jnp.arange(4, dtype=jnp.float32) * 0.1
        fu = setup_filter([1, 3, 3, 1])
        fd = setup_filter([1, 3, 3, 1])
        y = filtered_lrelu(x, fu, fd, b, up=2, down=2, padding=3)
        # output spatial size per reference filtered_lrelu.py:141-143
        assert y.shape == (1, 8, 8, 4)

    def test_grad_flows(self):
        x = jax.random.normal(rng(), (1, 8, 8, 2))
        f = setup_filter([1, 2, 1])
        g = jax.grad(lambda t: filtered_lrelu(t, f, f, up=2, down=2,
                                              padding=2).sum())(x)
        assert g.shape == x.shape
        assert bool(jnp.any(g != 0))


class TestBlockwiseAttention:
    def test_chunked_matches_dense_values_and_grads(self):
        """The blockwise path must be EXACTLY the dense attention (keys are
        unchunked, softmax rows are complete) — values and input grads."""
        from studiogan_tpu.ops.layers import SelfAttention

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
        dense = SelfAttention(16, q_chunk=-1)
        chunked = SelfAttention(16, q_chunk=16)
        vs = dense.init(jax.random.PRNGKey(0), x)

        def loss(mod, v, x):
            return jnp.sum(jnp.sin(mod.apply(v, x)))

        ld, gd = jax.value_and_grad(loss, argnums=2)(dense, vs, x)
        lc, gc = jax.value_and_grad(loss, argnums=2)(chunked, vs, x)
        np.testing.assert_allclose(float(ld), float(lc), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(gd), np.asarray(gc),
                                   rtol=1e-5, atol=1e-6)

    def test_auto_threshold_keeps_small_inputs_dense(self):
        from studiogan_tpu.ops.layers import SelfAttention
        x = jnp.zeros((1, 16, 16, 16))
        mod = SelfAttention(16)  # q_chunk=0 auto; 256 tokens -> dense
        vs = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(vs, x)
        assert out.shape == x.shape


class TestUpfirdnMatmulPath:
    """The MXU band-matrix formulation must match the depthwise conv
    formulation exactly (same math, different lowering)."""

    def test_matmul_equals_depthwise(self):
        import importlib
        U = importlib.import_module("studiogan_tpu.ops.upfirdn2d")
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 8, 9, 3), jnp.float32)
        filters = [U.setup_filter(np.array([1., 3, 3, 1])),
                   U.setup_filter(np.array([1., 2, 1])),
                   U.setup_filter(np.hanning(12), separable=True), None]
        cases = [dict(up=2, padding=(2, 1, 2, 1), gain=4),
                 dict(down=2, padding=1),
                 dict(up=2, down=2, padding=(1, 2, 0, 3)),
                 dict(padding=(-1, 2, 0, -1)),
                 dict(up=3, padding=2, flip_filter=True)]
        old = U._IMPL
        try:
            for f in filters:
                for kw in cases:
                    U._IMPL = "matmul"
                    a = U.upfirdn2d(x, f, **kw)
                    U._IMPL = "depthwise"
                    b = U.upfirdn2d(x, f, **kw)
                    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                               rtol=1e-5, atol=1e-6)
        finally:
            U._IMPL = old

    def test_rank1_factorization_detects_outer_products(self):
        from studiogan_tpu.ops.upfirdn2d import _factor_rank1, setup_filter
        f = setup_filter(np.array([1., 3, 3, 1]))
        fac = _factor_rank1(f)
        assert fac is not None
        fy, fx = fac
        np.testing.assert_allclose(np.outer(fy, fx), f, atol=1e-7)
        # a genuinely 2-D (radial) filter must NOT factor
        xx, yy = np.meshgrid(np.arange(-2, 3), np.arange(-2, 3))
        radial = np.exp(-(xx ** 2 + yy ** 2) / 2.0).astype(np.float32)
        assert _factor_rank1(radial) is None
