"""Native C++ runtime + Pallas kernel correctness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


class TestNativeRuntime:
    def test_assemble_basket_matches_numpy(self):
        from studiogan_tpu import runtime
        if not runtime.native_available():
            pytest.skip("no native toolchain")
        imgs = np.random.RandomState(0).randint(0, 256, (16, 8, 8, 3),
                                                dtype=np.uint8)
        idx = np.array([5, 0, 9, 3], dtype=np.int64)
        flips = np.array([0, 1, 0, 1], dtype=np.uint8)
        out = runtime.assemble_basket(imgs, idx, flips)
        ref = imgs[idx].astype(np.float32) / 127.5 - 1.0
        ref[flips.astype(bool)] = ref[flips.astype(bool)][:, :, ::-1]
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_quantize_matches(self):
        from studiogan_tpu import runtime
        from studiogan_tpu.metrics.resize import quantize_images
        if not runtime.native_available():
            pytest.skip("no native toolchain")
        x = np.random.RandomState(1).uniform(-1.2, 1.2, (4, 8, 8, 3)
                                             ).astype(np.float32)
        np.testing.assert_array_equal(runtime.quantize_images_native(x),
                                      quantize_images(x))

    def test_pipeline_uses_native_path(self):
        from studiogan_tpu.data import BasketLoader, Dataset_
        ds = Dataset_("SYNTHETIC", None, train=True, synthetic_size=64,
                      num_classes=10, img_size=16)
        loader = BasketLoader(ds, batch_size=8, basket_multiplier=2, seed=0)
        x, labels = loader._make_basket()
        assert x.shape == (2, 8, 16, 16, 3)
        assert -1.0 <= x.min() and x.max() <= 1.0


class TestPallasFilteredLrelu:
    def test_fir_matrix_equals_ref_decomposition(self):
        """The banded-matmul formulation == the ref upfirdn chain
        (the Pallas kernel runs exactly these einsums)."""
        import math
        from studiogan_tpu.ops.filtered_lrelu import filtered_lrelu
        from studiogan_tpu.ops.pallas.filtered_lrelu_kernel import _build_mats
        from studiogan_tpu.ops.upfirdn2d import _parse_padding, setup_filter

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 12, 4))
        b = jnp.arange(4.0) * 0.1
        fu = setup_filter([1, 3, 3, 1], separable=True)
        for (fd, down, pad, clamp) in [(fu, 2, 3, 5.0), (None, 1, (2, 3, 2, 3), None)]:
            ref = filtered_lrelu(x, fu, fd, b, up=2, down=down, padding=pad,
                                 clamp=clamp)
            fu_t = tuple(np.asarray(fu, np.float64).tolist())
            fd_t = tuple(np.asarray(fd, np.float64).tolist()) if fd is not None else ()
            U_h, U_w, D_h, D_w = _build_mats(fu_t, fd_t, 12, 12, 2, down,
                                             _parse_padding(pad), 4.0)
            t = x + b[None, None, None, :]
            t = jnp.einsum("oh,nhwc->nowc", jnp.asarray(U_h), t)
            t = jnp.einsum("ow,nhwc->nhoc", jnp.asarray(U_w), t)
            t = jnp.where(t >= 0, t, t * 0.2) * math.sqrt(2)
            if clamp is not None:
                t = jnp.clip(t, -clamp, clamp)
            t = jnp.einsum("oh,nhwc->nowc", jnp.asarray(D_h), t)
            t = jnp.einsum("ow,nhwc->nhoc", jnp.asarray(D_w), t)
            assert ref.shape == t.shape
            np.testing.assert_allclose(np.asarray(ref), np.asarray(t),
                                       atol=1e-4)

    @pytest.mark.skipif(jax.default_backend() != "tpu",
                        reason="compiled Pallas kernel needs TPU")
    def test_pallas_call_on_tpu(self):
        from studiogan_tpu.ops.filtered_lrelu import filtered_lrelu
        from studiogan_tpu.ops.upfirdn2d import setup_filter
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 128))
        b = jnp.zeros((128,))
        f = setup_filter([1, 3, 3, 1], separable=True)
        ref = filtered_lrelu(x, f, f, b, up=2, down=2, padding=3, clamp=256)
        pal = filtered_lrelu(x, f, f, b, up=2, down=2, padding=3, clamp=256,
                             impl="pallas")
        np.testing.assert_allclose(np.asarray(ref), np.asarray(pal),
                                   atol=0.05)


class TestPallasBiasAct:
    @pytest.mark.skipif(jax.default_backend() != "tpu",
                        reason="compiled Pallas kernel needs TPU")
    def test_matches_ref(self):
        from studiogan_tpu.ops.bias_act import bias_act
        from studiogan_tpu.ops.pallas.bias_act_kernel import bias_act_pallas
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 256))
        b = jnp.arange(256.0) * 0.01
        for act in ("lrelu", "linear", "tanh", "swish"):
            r = bias_act(x, b, act=act, clamp=3.0)
            p = bias_act_pallas(x, b, act=act, clamp=3.0)
            np.testing.assert_allclose(np.asarray(r), np.asarray(p),
                                       atol=1e-5)


class TestPallasFusedAttention:
    """Fused SAGAN pooled-key attention (ops/pallas/attention_kernel.py):
    math parity vs the einsum reference in interpret mode on CPU (the
    kernel replaces the chunked-scan path on TPU, where it was measured
    3.6x faster fwd+bwd and +17% on the whole BigGAN-128 step)."""

    def _ref(self, th, ph, g):
        a = jax.nn.softmax(jnp.einsum("nqc,nkc->nqk", th, ph), axis=-1)
        return jnp.einsum("nqk,nkc->nqc", a, g)

    def test_interpret_fwd_and_grad_parity(self):
        from jax.experimental.pallas import tpu as pltpu
        from studiogan_tpu.ops.pallas.attention_kernel import (
            fused_pooled_attention)

        rng = np.random.RandomState(0)
        n, Q, K, dk, dv, chunk = 2, 256, 64, 8, 16, 128
        th = jnp.asarray(rng.randn(n, Q, dk), jnp.float32)
        ph = jnp.asarray(rng.randn(n, K, dk), jnp.float32)
        g = jnp.asarray(rng.randn(n, K, dv), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            out = fused_pooled_attention(th, ph, g, chunk)
            np.testing.assert_allclose(np.asarray(out),
                                       np.asarray(self._ref(th, ph, g)),
                                       atol=1e-5)

            def loss_k(args):
                return jnp.sum(jnp.sin(
                    fused_pooled_attention(*args, chunk)))

            def loss_r(args):
                return jnp.sum(jnp.sin(self._ref(*args)))

            gk = jax.grad(loss_k)((th, ph, g))
            gr = jax.grad(loss_r)((th, ph, g))
            for a, b, name in zip(gk, gr, ("theta", "phi", "g")):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=5e-5, err_msg=name)

    def test_self_attention_module_impl_selection(self):
        """On CPU the module must keep the scan path ('auto' never picks
        Pallas off-TPU); forcing impl='chunked' equals dense."""
        from studiogan_tpu.ops.layers import SelfAttention

        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
        dense = SelfAttention(16, q_chunk=-1)
        chunked = SelfAttention(16, q_chunk=16, impl="chunked")
        v = dense.init(jax.random.PRNGKey(0), x)
        y_d = dense.apply(v, x)
        y_c = chunked.apply(v, x)
        np.testing.assert_allclose(np.asarray(y_d), np.asarray(y_c),
                                   atol=1e-5)

    def test_impl_einsum_bypasses_chunking(self):
        """impl='einsum' must force the dense path even when the
        chunking condition holds (advisor round-3: the knob previously
        still took the chunked-scan branch, mislabeling measurements)."""
        from studiogan_tpu.ops.layers import SelfAttention

        x = jnp.zeros((2, 8, 8, 16), jnp.float32)
        mod = SelfAttention(16, q_chunk=16, impl="einsum")
        v = mod.init(jax.random.PRNGKey(0), x)
        jaxpr = str(jax.make_jaxpr(lambda x: mod.apply(v, x))(x))
        assert "scan" not in jaxpr and "pallas_call" not in jaxpr

    def test_auto_gates_pallas_on_device_count(self, monkeypatch):
        """'auto' picks the Pallas kernel only single-device on a
        TPU-like backend: pallas_call has no GSPMD partitioning rule, so
        under a dp/tp mesh it must fall back to the chunked scan
        (advisor round-3 medium)."""
        from studiogan_tpu.ops import layers
        from studiogan_tpu.ops.layers import SelfAttention

        x = jnp.zeros((2, 8, 8, 16), jnp.float32)
        mod = SelfAttention(16, q_chunk=16, impl="auto")
        v = mod.init(jax.random.PRNGKey(0), x)
        monkeypatch.setattr(layers.jax, "default_backend", lambda: "tpu")

        # conftest forces 8 CPU devices -> auto must NOT pick pallas
        assert jax.device_count() == 8
        jaxpr = str(jax.make_jaxpr(lambda x: mod.apply(v, x))(x))
        assert "pallas_call" not in jaxpr and "scan" in jaxpr

        monkeypatch.setattr(layers.jax, "device_count", lambda: 1)
        jaxpr1 = str(jax.make_jaxpr(lambda x: mod.apply(v, x))(x))
        assert "pallas_call" in jaxpr1

    def test_forced_pallas_under_mesh_raises(self):
        """Expert-forced impl='pallas' under a multi-device mesh must
        raise a clear error at trace time — lowering it is rejected by
        the SPMD partitioner ("side-effect HLO cannot have a replicated
        sharding"), verified empirically in interpret mode."""
        import pytest
        from studiogan_tpu.ops.layers import SelfAttention

        x = jnp.zeros((8, 8, 8, 16), jnp.float32)
        forced = SelfAttention(16, q_chunk=16, impl="pallas")
        v = SelfAttention(16, q_chunk=-1).init(jax.random.PRNGKey(0), x)
        assert jax.device_count() == 8
        with pytest.raises(ValueError, match="GSPMD"):
            forced.apply(v, x)
