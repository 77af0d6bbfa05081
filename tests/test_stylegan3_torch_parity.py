"""StyleGAN3 torch VALUE parity: our Flax SynthesisInput and filtered
SG3SynthesisLayer vs the reference's own torch modules (reference
models/stylegan3.py:165-390) instantiated from the read-only mount on
CPU, with the SAME injected weights/buffers.

Mirrors what test_torch_parity.py already does for StyleGAN2.  Skips
when the reference mount is absent.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference mount not available")
torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


@pytest.fixture(scope="module")
def ref_sg3():
    """Import the reference stylegan3 torch module (CPU; the CUDA custom
    ops fall back to their ref paths)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "pkg_resources" not in sys.modules:  # removed in new setuptools
        import packaging.version
        fake = types.ModuleType("pkg_resources")
        fake.parse_version = packaging.version.parse
        sys.modules["pkg_resources"] = fake
    from models import stylegan3 as ref_stylegan3
    return ref_stylegan3


def _t2n(t):
    return np.asarray(t.detach().numpy())


class TestSynthesisInputParity:
    def test_fourier_features_match(self, ref_sg3):
        from studiogan_tpu.models.stylegan3 import SynthesisInput

        torch.manual_seed(7)
        si_t = ref_sg3.SynthesisInput(w_dim=8, channels=6, size=16,
                                      sampling_rate=16, bandwidth=2)
        w = np.random.RandomState(0).randn(3, 8).astype(np.float32)
        # exercise a non-trivial learned transform: random affine weights
        with torch.no_grad():
            si_t.affine.weight.copy_(torch.randn(4, 8) * 0.3)
            si_t.affine.bias.copy_(torch.tensor([1.0, 0.2, 0.1, -0.1]))
        ref_out = _t2n(si_t(torch.tensor(w)))          # NCHW

        ours = SynthesisInput(w_dim=8, channels=6, size=16,
                              sampling_rate=16, bandwidth=2)
        v = ours.init(jax.random.PRNGKey(0), jnp.asarray(w))
        v = {
            "params": {"affine": {"weight": jnp.asarray(_t2n(si_t.affine.weight)),
                                  "bias": jnp.asarray(_t2n(si_t.affine.bias))},
                       "weight": jnp.asarray(_t2n(si_t.weight))},
            "buffers": {"freqs": jnp.asarray(_t2n(si_t.freqs)),
                        "phases": jnp.asarray(_t2n(si_t.phases)),
                        "transform": jnp.asarray(_t2n(si_t.transform))},
        }
        out = np.asarray(ours.apply(v, jnp.asarray(w)))  # NHWC
        np.testing.assert_allclose(out, ref_out.transpose(0, 2, 3, 1),
                                   atol=2e-5, rtol=1e-4)


class TestSynthesisLayerParity:
    @pytest.mark.parametrize("is_torgb", [False, True])
    def test_filtered_synthesis_layer_matches(self, ref_sg3, is_torgb):
        """Modulated conv + filtered lrelu (up/down 2) end to end
        (reference stylegan3.py:248-347)."""
        from studiogan_tpu.models.stylegan3 import SG3SynthesisLayer

        kw = dict(w_dim=8, is_torgb=is_torgb, is_critically_sampled=False,
                  in_channels=6, out_channels=5, in_size=12, out_size=12,
                  in_sampling_rate=12, out_sampling_rate=12,
                  in_cutoff=2, out_cutoff=2,
                  in_half_width=4, out_half_width=4)
        torch.manual_seed(3)
        sl_t = ref_sg3.SynthesisLayer(use_fp16=False, **kw)
        with torch.no_grad():
            sl_t.magnitude_ema.copy_(torch.tensor(0.7))

        rng = np.random.RandomState(1)
        x = rng.randn(2, 12, 12, 6).astype(np.float32)
        w = rng.randn(2, 8).astype(np.float32)
        ref_out = _t2n(sl_t(torch.tensor(x.transpose(0, 3, 1, 2)),
                            torch.tensor(w), update_emas=False))

        ours = SG3SynthesisLayer(**kw)
        v0 = ours.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                       jnp.asarray(w))
        assert np.asarray(
            v0["stats_ema"]["magnitude_ema"]).shape == ()
        v = {
            "params": {
                "affine_fc": {
                    "weight": jnp.asarray(_t2n(sl_t.affine.weight)),
                    "bias": jnp.asarray(_t2n(sl_t.affine.bias))},
                "weight": jnp.asarray(_t2n(sl_t.weight)),
                "bias": jnp.asarray(_t2n(sl_t.bias)),
            },
            "stats_ema": {"magnitude_ema": jnp.asarray(0.7)},
        }
        out = np.asarray(ours.apply(v, jnp.asarray(x), jnp.asarray(w)))
        scale = max(np.abs(ref_out).max(), 1e-3)
        np.testing.assert_allclose(
            out, ref_out.transpose(0, 2, 3, 1), atol=3e-4 * scale, rtol=2e-3)
