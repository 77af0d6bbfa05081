"""Post-training analyses (parity with reference src/worker.py:988-1668:
run_k_nearest_neighbor, run_linear_interpolation, run_frequency_analysis,
run_tsne, calculate_intra_class_fid, run_semantic_factorization).

All artifact formats match the reference (PNG canvases / npy dumps under
SAVE_DIR/figures/{run_name}).  Where the reference hardwires a
torch-hub ResNet50 as the kNN feature extractor (worker.py:1073), we use
the configured eval backbone (this environment cannot download
torch-hub weights).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from studiogan_tpu.utils.misc import save_image_grid, to_uint8


def run_k_nearest_neighbor(engine, state, eval_model, dataset, save_dir: str,
                           run_name: str, num_rows: int = 8, num_cols: int = 8,
                           rng=None) -> str:
    """Per class: one fake anchor + its (num_cols-1) nearest reals by
    backbone features (reference worker.py:1054-1148)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    num_classes = engine.cfg.DATA.num_classes
    rows = []
    labels_arr = np.asarray([dataset[i][1] for i in range(len(dataset))])
    for c in range(min(num_classes, num_rows)):
        rng, k = jax.random.split(rng)
        fakes, _ = engine.generate(state, k, engine.O.batch_size, y_sampler=c,
                                   truncation_factor=engine.cfg.RUN.truncation_factor)
        anchor = np.asarray(jax.device_get(fakes[:1]))
        a_feat, _ = eval_model.get_outputs(anchor, quantize=True)

        idx_c = np.where(labels_arr == c)[0]
        feats, imgs_c = [], []
        bs = min(engine.O.batch_size, 256)
        for start in range(0, len(idx_c), bs):
            batch_idx = idx_c[start:start + bs]
            batch = np.stack([dataset[int(i)][0] for i in batch_idx])
            f, _ = eval_model.get_outputs(batch, quantize=False)
            feats.append(f)
            imgs_c.append(batch)
        feats = np.concatenate(feats)
        imgs_c = np.concatenate(imgs_c)
        d = np.linalg.norm(feats - a_feat, axis=1)
        nearest = imgs_c[np.argsort(d)[:num_cols - 1]]
        nearest = nearest.astype(np.float32) / 127.5 - 1.0
        rows.append(np.concatenate([anchor, nearest], axis=0))
    canvas = np.concatenate(rows, axis=0)
    path = os.path.join(save_dir, "figures", run_name, "knn_analysis.png")
    save_image_grid(canvas, path, nrow=num_cols)
    return path


def run_linear_interpolation(engine, state, save_dir: str, run_name: str,
                             num_rows: int = 8, num_cols: int = 8,
                             fix_z: bool = False, fix_y: bool = False,
                             rng=None) -> str:
    """z- or y-interpolation canvases (reference worker.py:1150-1203).
    fix_z: interpolate class embedding; fix_y: interpolate z."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    M, D = engine.M, engine.cfg.DATA
    k1, k2, k3 = jax.random.split(rng, 3)
    alphas = jnp.linspace(0.0, 1.0, num_cols)
    if fix_y or not fix_z:
        z0 = jax.random.normal(k1, (num_rows, M.z_dim))
        z1 = jax.random.normal(k2, (num_rows, M.z_dim))
        zs = (z0[:, None] * (1 - alphas)[None, :, None]
              + z1[:, None] * alphas[None, :, None]).reshape(-1, M.z_dim)
        labels = jnp.repeat(
            jax.random.randint(k3, (num_rows,), 0, D.num_classes), num_cols)
    else:  # fix_z: same z per row, interpolate between two class labels
        z0 = jax.random.normal(k1, (num_rows, M.z_dim))
        zs = jnp.repeat(z0, num_cols, axis=0)
        labels = jnp.tile(
            jnp.linspace(0, D.num_classes - 1, num_cols).astype(jnp.int32),
            (num_rows,))
    params = state.ema_or_g_params
    gstate = state.ema_or_g_state
    imgs, _ = engine._g_apply(params, gstate, zs, labels, train=False, rng=k3)
    name = "interpolated_images_fix_z.png" if fix_z else "interpolated_images_fix_y.png"
    path = os.path.join(save_dir, "figures", run_name, name)
    save_image_grid(np.asarray(jax.device_get(imgs)), path, nrow=num_cols)
    return path


def run_frequency_analysis(engine, state, dataset, save_dir: str,
                           run_name: str, num_images: int = 256,
                           rng=None) -> str:
    """Mean log-magnitude FFT spectra of real vs fake grayscale images
    after median-filter detrending (reference worker.py:1205-1281)."""
    from scipy import ndimage

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    n = min(num_images, len(dataset))
    reals = np.stack([dataset[i][0] for i in range(n)]).astype(np.float32)
    fakes, _ = engine.generate(state, rng, n)
    fakes = to_uint8(np.asarray(jax.device_get(fakes))).astype(np.float32)

    def spectrum(arr):
        gray = (0.2989 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2])
        h = gray.shape[1]
        acc = None
        for img in gray:
            detr = img - ndimage.median_filter(img, size=h // 8)
            f = np.fft.fftshift(np.fft.fft2(detr))
            s = 20 * np.log(np.abs(f) + 1e-8) / len(gray)
            acc = s if acc is None else acc + s
        return acc

    real_spec, fake_spec = spectrum(reals), spectrum(fakes)
    out_dir = os.path.join(save_dir, "figures", run_name)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "frequency_analysis.npz")
    np.savez(path, real_spectrum=real_spec, fake_spectrum=fake_spec)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 2, figsize=(8, 4))
        axes[0].imshow(real_spec, cmap="viridis")
        axes[0].set_title("real spectrum")
        axes[1].imshow(fake_spec, cmap="viridis")
        axes[1].set_title("fake spectrum")
        fig.savefig(os.path.join(out_dir, "frequency_analysis.png"))
        plt.close(fig)
    except Exception:
        pass
    return path


def run_tsne(engine, state, dataset, save_dir: str, run_name: str,
             num_samples: int = 512, rng=None) -> str:
    """t-SNE of discriminator penultimate features, real vs fake
    (reference worker.py:1283-1378)."""
    from sklearn.manifold import TSNE

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    # full fixed-size chunks only: a ragged tail would recompile D + G
    # for one batch (minutes on a tunneled chip)
    bs = min(engine.O.batch_size, 128, len(dataset))
    n = max(bs, min(num_samples, len(dataset)) // bs * bs)
    real_h, real_y, fake_h, fake_y = [], [], [], []
    for start in range(0, n - bs + 1, bs):
        idx = range(start, start + bs)
        imgs = np.stack([dataset[i][0] for i in idx]).astype(np.float32) / 127.5 - 1
        labels = jnp.asarray([dataset[i][1] for i in idx])
        out, _ = engine._d_apply(state.d_params, state.d_state,
                                 jnp.asarray(imgs), labels, train=False)
        real_h.append(np.asarray(out["h"]))
        real_y.append(np.asarray(labels))
        rng, k = jax.random.split(rng)
        fimgs, flabels = engine.generate(state, k, len(idx))
        fout, _ = engine._d_apply(state.d_params, state.d_state, fimgs,
                                  flabels, train=False)
        fake_h.append(np.asarray(fout["h"]))
        fake_y.append(np.asarray(flabels))
    h = np.concatenate(real_h + fake_h)
    emb = TSNE(n_components=2, init="random", perplexity=30).fit_transform(h)
    out_dir = os.path.join(save_dir, "figures", run_name)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "tsne_analysis.npz")
    np.savez(path, embedding=emb,
             is_real=np.concatenate([np.ones(len(np.concatenate(real_h))),
                                     np.zeros(len(np.concatenate(fake_h)))]),
             labels=np.concatenate(real_y + fake_y))
    return path


def calculate_intra_class_fid(engine, state, eval_model, dataset,
                              save_dir: str, rng=None,
                              num_per_class: int | None = None) -> dict:
    """Per-class FID (reference worker.py:1380-1468)."""
    from studiogan_tpu.metrics import fid as fid_mod
    from studiogan_tpu.metrics.features import _softmax  # noqa: F401

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    num_classes = engine.cfg.DATA.num_classes
    labels_arr = np.asarray([dataset[i][1] for i in range(len(dataset))])
    ifids = {}
    bs = min(engine.O.batch_size, 256)
    for c in range(num_classes):
        idx_c = np.where(labels_arr == c)[0]
        if num_per_class:
            idx_c = idx_c[:num_per_class]
        feats = []
        for start in range(0, len(idx_c), bs):
            batch = np.stack([dataset[int(i)][0]
                              for i in idx_c[start:start + bs]])
            f, _ = eval_model.get_outputs(batch, quantize=False)
            feats.append(f)
        real_feats = np.concatenate(feats)
        mu_r, sig_r = fid_mod.compute_moments(real_feats)

        # generate fixed-size batches and trim the surplus: a ragged last
        # batch would recompile G per distinct size (minutes each on a
        # tunneled chip, and per-class sizes all differ)
        fake_feats = []
        remaining = len(idx_c)
        while remaining > 0:
            rng, k = jax.random.split(rng)
            imgs, _ = engine.generate(state, k, bs, y_sampler=c)
            f, _ = eval_model.get_outputs(np.asarray(jax.device_get(imgs)),
                                          quantize=True)
            fake_feats.append(f[:remaining])
            remaining -= len(f[:remaining])
        mu_f, sig_f = fid_mod.compute_moments(np.concatenate(fake_feats))
        ifids[c] = fid_mod.frechet_inception_distance(mu_r, sig_r, mu_f, sig_f)
    if eval_model.random_weights and not os.environ.get(
            "STUDIOGAN_ALLOW_RANDOM_BACKBONE"):
        # same honest-eval guardrail as Evaluator.evaluate: random-
        # backbone FID is degenerate — refuse to return numbers
        ifids = {c: float("nan") for c in ifids}
    return ifids


def run_semantic_factorization(engine, state, save_dir: str, run_name: str,
                               num_semantic_axis: int = 4,
                               maximum_variations: float = 3.0,
                               num_cols: int = 8, num_images: int = 4,
                               rng=None) -> list[str]:
    """SeFa: closed-form latent directions = top right-singular vectors
    of the first z-consuming weight (reference worker.py:1470-1513 +
    src/utils/sefa.py)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    params = state.ema_or_g_params

    # locate the first dense weight applied to z
    if engine.is_stylegan:
        w = params["mapping"]["fc0"]["weight"]  # (out, in)
        w = np.asarray(w).T                      # (in, out)
    else:
        w = np.asarray(params["linear0"]["kernel"])  # (in, out)
    in_dim = w.shape[0]
    # eigen-decomposition of W W^T in input space
    a = w @ w.T
    eigvals, eigvecs = np.linalg.eigh(a)
    directions = eigvecs[:, ::-1][:, :num_semantic_axis].T  # (axes, in_dim)

    M = engine.M
    paths = []
    alphas = np.linspace(-maximum_variations, maximum_variations, num_cols)
    for i in range(num_images):
        rng, kz, ky, kg = jax.random.split(rng, 4)
        z = jax.random.normal(kz, (M.z_dim,))
        label = jax.random.randint(ky, (), 0, engine.cfg.DATA.num_classes)
        rows = []
        for d in directions:
            delta = np.zeros((M.z_dim,), np.float32)
            delta[:in_dim] = d[:M.z_dim] if in_dim >= M.z_dim else 0
            if in_dim <= M.z_dim:
                delta[:in_dim] = d
            zs = jnp.stack([z + a_ * jnp.asarray(delta) for a_ in alphas])
            labels = jnp.full((num_cols,), label, jnp.int32)
            imgs, _ = engine._g_apply(state.ema_or_g_params,
                                      state.ema_or_g_state, zs, labels,
                                      train=False, rng=kg)
            rows.append(np.asarray(jax.device_get(imgs)))
        canvas = np.concatenate(rows, axis=0)
        path = os.path.join(save_dir, "figures", run_name,
                            f"{i}_sefa_images.png")
        save_image_grid(canvas, path, nrow=num_cols)
        paths.append(path)
    return paths
