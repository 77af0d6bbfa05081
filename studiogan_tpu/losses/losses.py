"""Adversarial losses, conditioning losses, and regularizers.

Capability parity with reference src/utils/losses.py (382 LoC).

TPU-native notes:
  * The reference's ``GatherLayer`` (losses.py:19-37, a hand-written
    differentiable all_gather) is unnecessary: under GSPMD a jitted loss
    over a batch-sharded array already reduces over the GLOBAL batch and
    XLA inserts the collectives — so every loss here is written
    batch-global.  When run under ``shard_map`` instead, wrap inputs
    with ``jax.lax.all_gather`` (natively differentiable).
  * Gradient-based regularizers (GP/DRA/MaxGP/R1/PL) use ``jax.grad``
    directly — JAX has true higher-order AD, so the reference's
    conv2d_gradfix machinery (style_ops/conv2d_gradfix.py) has no
    equivalent here by design.
  * Everything stateful in the reference (LeCam EMAs ops.py:106,
    path-length mean losses.py:170) is passed in / returned out.
"""

from __future__ import annotations

import math
from collections.abc import Callable

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# Adversarial losses (reference losses.py:197-239)
# ---------------------------------------------------------------------------

def d_vanilla(d_logit_real: Array, d_logit_fake: Array) -> Array:
    return jnp.mean(jax.nn.softplus(-d_logit_real)) + jnp.mean(jax.nn.softplus(d_logit_fake))


def g_vanilla(d_logit_fake: Array) -> Array:
    return jnp.mean(jax.nn.softplus(-d_logit_fake))


def d_logistic(d_logit_real: Array, d_logit_fake: Array) -> Array:
    return jnp.mean(jax.nn.softplus(-d_logit_real) + jax.nn.softplus(d_logit_fake))


def g_logistic(d_logit_fake: Array) -> Array:
    return jnp.mean(jax.nn.softplus(-d_logit_fake))


def d_ls(d_logit_real: Array, d_logit_fake: Array) -> Array:
    return jnp.mean(0.5 * (d_logit_real - 1.0) ** 2 + 0.5 * d_logit_fake ** 2)


def g_ls(d_logit_fake: Array) -> Array:
    return jnp.mean(0.5 * (d_logit_fake - 1.0) ** 2)


def d_hinge(d_logit_real: Array, d_logit_fake: Array) -> Array:
    return jnp.mean(jax.nn.relu(1.0 - d_logit_real)) + jnp.mean(jax.nn.relu(1.0 + d_logit_fake))


def g_hinge(d_logit_fake: Array) -> Array:
    return -jnp.mean(d_logit_fake)


def d_wasserstein(d_logit_real: Array, d_logit_fake: Array) -> Array:
    return jnp.mean(d_logit_fake - d_logit_real)


def g_wasserstein(d_logit_fake: Array) -> Array:
    return -jnp.mean(d_logit_fake)


G_LOSSES = {"vanilla": g_vanilla, "logistic": g_logistic, "least_square": g_ls,
            "hinge": g_hinge, "wasserstein": g_wasserstein}
D_LOSSES = {"vanilla": d_vanilla, "logistic": d_logistic, "least_square": d_ls,
            "hinge": d_hinge, "wasserstein": d_wasserstein}


def crammer_singer_loss(adv_output: Array, label: Array) -> Array:
    """Multi-hinge MH loss (reference losses.py:242-252).
    adv_output: (B, 1+num_classes); class index num_classes = "fake" bin."""
    b, k = adv_output.shape
    onehot = jax.nn.one_hot(label, k, dtype=bool)
    wrongs = jnp.where(onehot, -jnp.inf, adv_output)
    max_wrong = jnp.max(wrongs, axis=1)
    target = jnp.take_along_axis(adv_output, label[:, None], axis=1)[:, 0]
    return jnp.mean(jax.nn.relu(1.0 + max_wrong - target))


def mh_fake_label(num_classes: int, batch: int) -> Array:
    """Fake samples target the last ("fake") bin for MH (worker.py usage)."""
    return jnp.full((batch,), num_classes, dtype=jnp.int32)


# ---------------------------------------------------------------------------
# Conditioning losses (reference losses.py:40-166)
# ---------------------------------------------------------------------------

def cross_entropy_loss(cls_output: Array, label: Array) -> Array:
    """AC / TAC / ADC classifier loss (reference losses.py:40-47)."""
    logp = jax.nn.log_softmax(cls_output, axis=1)
    return -jnp.mean(jnp.take_along_axis(logp, label[:, None], axis=1))


def _cos_sim_matrix(x: Array, y: Array, eps: float = 1e-8) -> Array:
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)
    yn = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), eps)
    return xn @ yn.T


def _cos_sim(x: Array, y: Array, eps: float = 1e-8) -> Array:
    num = jnp.sum(x * y, axis=-1)
    den = jnp.maximum(jnp.linalg.norm(x, axis=-1) * jnp.linalg.norm(y, axis=-1), eps)
    return num / den


def conditional_contrastive_loss(embed: Array, proxy: Array, label: Array,
                                 temperature: float) -> Array:
    """2C loss of ContraGAN (reference losses.py:49-98).

    Batch-global under GSPMD (the reference gathers across DDP ranks)."""
    n = embed.shape[0]
    offdiag = 1.0 - jnp.eye(n)
    same = (label[:, None] == label[None, :]).astype(embed.dtype)

    sim = jnp.exp(_cos_sim_matrix(embed, embed) / temperature)
    sim_offdiag = sim * offdiag
    pos_only = sim_offdiag * same

    emb2proxy = jnp.exp(_cos_sim(embed, proxy) / temperature)
    numerator = emb2proxy + pos_only.sum(axis=1)
    denominator = emb2proxy + sim_offdiag.sum(axis=1)
    return -jnp.mean(jnp.log(numerator / denominator))


def data2data_ce_loss(embed: Array, proxy: Array, label: Array,
                      temperature: float, m_p: float) -> Array:
    """D2D-CE loss of ReACGAN (reference losses.py:101-166)."""
    n = embed.shape[0]
    offdiag_b = ~jnp.eye(n, dtype=bool)
    diff_class = (label[:, None] != label[None, :]).astype(embed.dtype)

    sim = (_cos_sim_matrix(embed, embed) + m_p - 1.0) / temperature
    # row-max over off-diagonal entries (reference removes the diag first)
    sim_max = jnp.max(jnp.where(offdiag_b, sim, -jnp.inf), axis=1, keepdims=True)
    shifted = jax.nn.relu(sim) - jax.lax.stop_gradient(sim_max)
    improved = diff_class * offdiag_b * jnp.exp(shifted)

    smp2proxy = _cos_sim(embed, proxy)
    pos_attr = jax.nn.relu((m_p - smp2proxy) / temperature)
    neg_repul = jnp.log(jnp.exp(-pos_attr) + improved.sum(axis=1))
    return jnp.mean(pos_attr + neg_repul)


def feature_matching_loss(real_embed: Array, fake_embed: Array) -> Array:
    """(reference losses.py:255-259)"""
    return jnp.mean(jnp.abs(jnp.mean(fake_embed, 0) - jnp.mean(real_embed, 0)))


def normal_nll_loss(x: Array, mu: Array, var: Array) -> Array:
    """InfoGAN continuous-code NLL (reference losses.py:369-375)."""
    logli = (-0.5 * jnp.log(var * (2 * math.pi) + 1e-6)
             - (x - mu) ** 2 / (var * 2.0 + 1e-6))
    return -jnp.mean(jnp.sum(logli, axis=1))


# ---------------------------------------------------------------------------
# Regularizers (reference losses.py:262-378 + ops.py:106)
# ---------------------------------------------------------------------------

def lecam_reg(d_logit_real: Array, d_logit_fake: Array, ema_D_real: Array,
              ema_D_fake: Array) -> Array:
    """(reference losses.py:262-265)"""
    return (jnp.mean(jax.nn.relu(d_logit_real - ema_D_fake) ** 2)
            + jnp.mean(jax.nn.relu(ema_D_real - d_logit_fake) ** 2))


def lecam_ema_update(emas: dict, key: str, cur: Array, step: Array,
                     decay: float, start_iter: int) -> dict:
    """Functional LeCamEMA (reference ops.py:106-133)."""
    d = jnp.where(step < start_iter, 0.0, decay)
    new = dict(emas)
    new[key] = emas[key] * d + cur * (1.0 - d)
    return new


def cal_grad_penalty(d_adv_fn: Callable[[Array], Array], rng: Array,
                     real_images: Array, fake_images: Array) -> Array:
    """WGAN-GP (reference losses.py:301-317).  ``d_adv_fn`` maps images ->
    adv logits with labels closed over."""
    b = real_images.shape[0]
    alpha = jax.random.uniform(rng, (b, 1, 1, 1), dtype=real_images.dtype)
    interp = alpha * real_images + (1 - alpha) * fake_images
    grads = jax.grad(lambda im: d_adv_fn(im).sum())(interp)
    norms = jnp.linalg.norm(grads.reshape(b, -1), axis=1)
    return jnp.mean((norms - 1.0) ** 2)


def cal_dra_penalty(d_adv_fn: Callable[[Array], Array], rng: Array,
                    real_images: Array) -> Array:
    """Deep regret analysis (reference losses.py:320-334)."""
    b = real_images.shape[0]
    k1, k2 = jax.random.split(rng)
    alpha = jax.random.uniform(k1, (b, 1, 1, 1), dtype=real_images.dtype)
    differences = 0.5 * real_images.std() * jax.random.uniform(
        k2, real_images.shape, dtype=real_images.dtype)
    interp = real_images + alpha * differences
    grads = jax.grad(lambda im: d_adv_fn(im).sum())(interp)
    norms = jnp.linalg.norm(grads.reshape(b, -1), axis=1)
    return jnp.mean((norms - 1.0) ** 2)


def cal_maxgrad_penalty(d_adv_fn: Callable[[Array], Array], rng: Array,
                        real_images: Array, fake_images: Array) -> Array:
    """MaxGP (reference losses.py:337-352)."""
    b = real_images.shape[0]
    alpha = jax.random.uniform(rng, (b, 1, 1, 1), dtype=real_images.dtype)
    interp = alpha * real_images + (1 - alpha) * fake_images
    grads = jax.grad(lambda im: d_adv_fn(im).sum())(interp)
    norms = jnp.linalg.norm(grads.reshape(b, -1), axis=1)
    return jnp.max(norms ** 2)


def cal_r1_reg(d_adv_fn: Callable[[Array], Array], images: Array) -> Array:
    """R1 (reference losses.py:355-361): 0.5 * E[ ||∇_x D(x)||² ]."""
    b = images.shape[0]
    grads = jax.grad(lambda im: d_adv_fn(im).sum())(images)
    return 0.5 * jnp.mean(jnp.sum(grads.reshape(b, -1) ** 2, axis=1))


def stylegan_cal_r1_reg(d_adv_fn: Callable[[Array], Array], images: Array) -> Array:
    """StyleGAN lazy R1 (reference losses.py:378-382): same value, kept
    separate to mirror the reference's dispatch."""
    grads = jax.grad(lambda im: d_adv_fn(im).sum())(images)
    return jnp.mean(jnp.sum(grads.reshape(images.shape[0], -1) ** 2, axis=1) / 2)


def cal_pl_reg(synthesis_fn: Callable[[Array], Array], rng: Array, ws: Array,
               pl_mean: Array, pl_decay: float = 0.01,
               pl_weight: float = 2.0) -> tuple[Array, Array]:
    """StyleGAN path-length regularizer (reference losses.py:168-190).

    synthesis_fn: ws -> images.  Returns (loss, new_pl_mean)."""
    def proj(w):
        img = synthesis_fn(w)
        noise = jax.random.normal(rng, img.shape, img.dtype) / math.sqrt(
            img.shape[1] * img.shape[2])
        return jnp.sum(img * noise)

    pl_grads = jax.grad(proj)(ws)               # (B, num_ws, w_dim)
    pl_lengths = jnp.sqrt(jnp.mean(jnp.sum(pl_grads ** 2, axis=2), axis=1))
    new_pl_mean = pl_mean + pl_decay * (jnp.mean(pl_lengths) - pl_mean)
    pl_penalty = (pl_lengths - jax.lax.stop_gradient(new_pl_mean)) ** 2
    return jnp.mean(pl_penalty * pl_weight), jax.lax.stop_gradient(new_pl_mean)


def adjust_k(current_k: Array, topk_gamma: float, inf_k: float) -> Array:
    """Top-k training decay (reference losses.py:364-366)."""
    return jnp.maximum(current_k * topk_gamma, inf_k)


def latent_optimise(zs: Array, fake_labels: Array, g_d_adv_fn: Callable,
                    rng: Array, lo_rate: float, lo_steps: int, lo_alpha: float,
                    lo_beta: float) -> tuple[Array, Array]:
    """LOGAN latent optimisation (reference losses.py:278-298).

    g_d_adv_fn: (zs, labels) -> adv logits of D(G(z)).  The reference's
    loop body contains an early ``return`` making it single-step; we run
    the documented ``lo_steps - 1`` iterations.

    Returns ``(zs, trsp_cost)`` where trsp_cost accumulates the per-step
    transport cost ``mean(||delta_z||_2^2)`` (reference losses.py:291-296;
    fed as ``lo_lambda * trsp_cost`` into both D and G losses,
    worker.py:323,628).  The reference computes it from the *unmasked*
    delta_z; we match."""
    def body(i, carry):
        z, key, cost = carry
        key, k1 = jax.random.split(key)
        drop_mask = (jax.random.uniform(k1, (z.shape[0], 1)) > 1 - lo_rate
                     ).astype(z.dtype)
        z_grads = jax.grad(lambda zz: g_d_adv_fn(zz, fake_labels).sum())(z)
        z_grads_norm = jnp.sum(z_grads ** 2, axis=1, keepdims=True)
        delta_z = lo_alpha * z_grads / (lo_beta + z_grads_norm)
        cost = cost + jnp.mean(jnp.sum(delta_z.astype(jnp.float32) ** 2,
                                       axis=1))
        z = jnp.clip(z + drop_mask * delta_z, -1.0, 1.0)
        return z, key, cost

    zs, _, trsp_cost = jax.lax.fori_loop(
        0, max(lo_steps - 1, 0), body, (zs, rng, jnp.asarray(0.0)))
    return zs, trsp_cost
