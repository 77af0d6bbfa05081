"""Spectral-norm monitoring (parity with reference src/utils/misc.py:285
``calculate_all_sn``): the sigma of every spectrally-normalized weight,
computed from the persisted u/v power-iteration vectors."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def calculate_all_sn(params, sn_state, prefix: str = "") -> dict[str, float]:
    """sigma[name] = u^T W v for every layer with SN state."""
    sigmas: dict[str, float] = {}

    def walk(p_tree, s_tree, path):
        if isinstance(s_tree, dict) and "u" in s_tree and "v" in s_tree:
            kernel = p_tree.get("kernel", p_tree.get("embedding",
                                                     p_tree.get("weight")))
            if kernel is None:
                return
            u, v = np.asarray(s_tree["u"]), np.asarray(s_tree["v"])
            w = np.asarray(kernel)
            if w.ndim == 4:  # HWIO conv -> (out, in*k*k)
                w = w.transpose(3, 2, 0, 1).reshape(w.shape[3], -1)
            elif w.ndim == 2 and w.shape[0] == v.shape[0]:
                w = w.T  # dense kernel (in, out) -> (out, in)
            sigmas[prefix + "/".join(path)] = float(u @ w @ v)
            return
        if isinstance(s_tree, dict):
            for k, sub in s_tree.items():
                walk(p_tree.get(k, {}), sub, path + [k])

    walk(jax.device_get(params), jax.device_get(sn_state), [])
    return sigmas
