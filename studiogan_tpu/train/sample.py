"""Latent / label sampling (parity with reference src/utils/sample.py).

Pure functions over explicit PRNG keys — the reference's global torch
RNG becomes threaded state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array
NA = "N/A"


def sample_normal(rng: Array, batch_size: int, z_dim: int,
                  truncation_factor: float = -1.0) -> Array:
    """(reference sample.py:33-40); truncation via truncated normal."""
    if truncation_factor == -1.0:
        return jax.random.normal(rng, (batch_size, z_dim))
    if truncation_factor > 0:
        return jax.random.truncated_normal(
            rng, -truncation_factor, truncation_factor, (batch_size, z_dim))
    raise ValueError("truncation_factor must be positive.")


def sample_y(rng: Array, y_sampler, batch_size: int, num_classes: int) -> Array | None:
    """(reference sample.py:43-66)"""
    if y_sampler == "totally_random":
        return jax.random.randint(rng, (batch_size,), 0, num_classes, dtype=jnp.int32)
    # the reference misspells "ascending" ("acending", sample.py:50); accept both
    if y_sampler in ("acending_some", "ascending_some"):
        assert batch_size % 8 == 0
        num_plot = batch_size // 8
        idx = jax.random.permutation(rng, num_classes)[:num_plot]
        return jnp.repeat(idx, 8).astype(jnp.int32)
    if y_sampler in ("acending_all", "ascending_all"):
        return jnp.repeat(jnp.arange(num_classes, dtype=jnp.int32), 8)
    if isinstance(y_sampler, int):
        return jnp.full((batch_size,), y_sampler, dtype=jnp.int32)
    return None


def sample_zy(rng: Array, z_prior: str, batch_size: int, z_dim: int,
              num_classes: int, truncation_factor: float, y_sampler,
              radius) -> tuple[Array, Array | None, Array | None]:
    """(reference sample.py:69-88): returns (zs, labels, zs_eps-for-zCR)."""
    ky, kz, ke = jax.random.split(rng, 3)
    labels = sample_y(ky, y_sampler, batch_size, num_classes)
    if labels is not None:
        batch_size = labels.shape[0]
    if z_prior == "gaussian":
        zs = sample_normal(kz, batch_size, z_dim, truncation_factor)
    elif z_prior == "uniform":
        zs = jax.random.uniform(kz, (batch_size, z_dim), minval=-1.0, maxval=1.0)
    else:
        raise NotImplementedError(z_prior)

    zs_eps = None
    if isinstance(radius, float) and radius > 0.0:
        if z_prior == "gaussian":
            zs_eps = zs + radius * jax.random.normal(ke, zs.shape)
        else:
            zs_eps = zs + radius * jax.random.uniform(ke, zs.shape, minval=-1.0, maxval=1.0)
    return zs, labels, zs_eps


def sample_info_codes(rng: Array, MODEL, batch_size: int):
    """InfoGAN code sampling + z concat pieces (reference sample.py:115-120)."""
    kd, kc = jax.random.split(rng)
    info_discrete_c = info_conti_c = None
    z_extra = []
    if MODEL.info_type in ("discrete", "both"):
        info_discrete_c = jax.random.randint(
            kd, (batch_size, MODEL.info_num_discrete_c), 0, MODEL.info_dim_discrete_c)
        z_extra.append(jax.nn.one_hot(
            info_discrete_c, MODEL.info_dim_discrete_c).reshape(batch_size, -1))
    if MODEL.info_type in ("continuous", "both"):
        info_conti_c = jax.random.uniform(
            kc, (batch_size, MODEL.info_num_conti_c)) * 2.0 - 1.0
        z_extra.append(info_conti_c)
    return z_extra, info_discrete_c, info_conti_c


def langevin_sampling(zs: Array, fake_labels: Array, g_d_adv_fn,
                      rng: Array, z_dim: int, langevin_rate: float,
                      langevin_noise_std: float, langevin_decay: float,
                      langevin_decay_steps: int, langevin_steps: int) -> Array:
    """DDLS energy-based refinement (reference sample.py:195-215).

    g_d_adv_fn: (zs, labels) -> D(G(z)) adv logits (eval mode)."""
    apply_decay = langevin_decay > 0 and langevin_decay_steps > 0

    def energy(z):
        # -log N(z; 0, I) - D(G(z)); constant terms drop out of the grad
        prior_logp = -0.5 * jnp.sum(z * z, axis=1)
        return jnp.sum(-prior_logp - g_d_adv_fn(z, fake_labels))

    def body(i, carry):
        z, rate, scaler, key = carry
        key, kn = jax.random.split(key)
        z_grads = jax.grad(energy)(z)
        noise = jax.random.normal(kn, z.shape) * langevin_noise_std
        z = z - 0.5 * rate * z_grads + jnp.sqrt(rate) * noise * scaler
        if apply_decay:
            decay_now = ((i + 1) % langevin_decay_steps == 0)
            rate = jnp.where(decay_now, rate * langevin_decay, rate)
            scaler = jnp.where(decay_now, scaler * langevin_decay, scaler)
        return z, rate, scaler, key

    zs, _, _, _ = jax.lax.fori_loop(
        0, langevin_steps, body,
        (zs, jnp.asarray(langevin_rate, zs.dtype), jnp.asarray(1.0, zs.dtype), rng))
    return zs
