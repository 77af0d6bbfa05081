"""The SPMD training engine.

Replaces the reference's WORKER.train_discriminator /
train_generator hot loops (reference src/worker.py:213-681) with ONE
jitted train step:

  * the ``d_updates_per_step x acml_steps`` basket loop becomes
    ``lax.scan`` over D updates with an inner gradient-accumulation scan
    — no host round-trips between micro-batches;
  * toggle_grad semantics fall out of functional AD: each loss is
    differentiated only w.r.t. its own params;
  * DDP's implicit gradient allreduce, the 2C/D2DCE cross-replica
    gathers, LeCam's gather, sync-BN, and the ADA heuristic's
    all_reduce all come for free from GSPMD when the batch axis is
    sharded over the mesh;
  * everything the reference mutates in place (BN stats, SN u/v,
    LeCam EMAs, ADA p, top-k, EMA weights) flows through
    ``GANTrainState``.

Step-dependent scalars (ADA p adjustment, top-k decay, LeCam gating,
lazy-reg intervals) stay traced — ``jnp.where``/``lax.cond`` — so one
compiled program serves the whole run.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from studiogan_tpu import losses as L
from studiogan_tpu.aug import build_augments
from studiogan_tpu.aug.apa_aug import apply_apa_aug
from studiogan_tpu.train import optim, sample as S
from studiogan_tpu.train.ema import ema_update, stylegan_decay, vanilla_decay
from studiogan_tpu.train.state import GANTrainState, init_lecam

Array = jax.Array
NA = "N/A"


def _tree_zeros_like(t):
    return jax.tree.map(jnp.zeros_like, t)


def _tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def _tree_scale(t, s):
    return jax.tree.map(lambda x: x * s, t)


class TrainEngine:
    """Builds pure, jittable train/eval steps from a config + modules."""

    def __init__(self, cfg, G, D, unroll_scans: bool = False):
        self.cfg = cfg
        self.G, self.D = G, D
        # Unroll the du/acml micro-batch scans into straight-line HLO:
        # lets XLA schedule across micro-batches and makes
        # compiled.cost_analysis() count every micro (a while-loop body is
        # counted ONCE regardless of trip count, so MFU accounting needs
        # this).  Costs compile time; numerics identical.
        self.unroll_scans = unroll_scans
        # Rematerialize the per-micro loss computations (activation memory
        # ~= one layer instead of the whole G+D stack; the backward pass
        # re-runs the forward).  HBM-bound regime: buys 2-4x micro-batch.
        self.remat = bool(getattr(cfg.RUN, "remat", False))
        self._d_loss = (jax.checkpoint(self._d_loss_fn) if self.remat
                        else self._d_loss_fn)
        self._g_loss = (jax.checkpoint(self._g_loss_fn) if self.remat
                        else self._g_loss_fn)
        M, Ls, O, A = cfg.MODEL, cfg.LOSS, cfg.OPTIMIZATION, cfg.AUG
        self.M, self.Ls, self.O, self.A = M, Ls, O, A
        self.is_stylegan = M.backbone in ("stylegan2", "stylegan3")
        self.classifier_based = M.d_cond_mtd in cfg.MISC.classifier_based_GAN
        self.is_infogan = M.info_type in ("discrete", "continuous", "both")
        self.mh = Ls.adv_loss == "MH"
        if not self.mh:
            self.d_adv = L.D_LOSSES[Ls.adv_loss]
            self.g_adv = L.G_LOSSES[Ls.adv_loss]
        self.series_augment, self.parallel_augment = build_augments(cfg)
        self.has_series_aug = A.apply_diffaug or A.apply_ada
        self.g_tx = optim.build_g_optimizer(cfg)
        self.d_tx = optim.build_d_optimizer(cfg)
        self.info_tx = optim.build_info_optimizer(cfg) if self.is_infogan else None
        # ADA/APA controller constants (reference worker.__init__:127-135)
        self.aa_target = A.ada_target if A.apply_ada else A.apa_target
        self.aa_kimg = A.ada_kimg if A.apply_ada else A.apa_kimg
        self.aa_interval = A.ada_interval if A.apply_ada else A.apa_interval
        self.effective_batch_size = O.batch_size * O.acml_steps
        # bf16 compute policy (reference AMP, worker.py:175-176; no loss
        # scaling needed on TPU).  StyleGAN uses its own per-resolution
        # policy via num_fp16_res (models/stylegan2.py).
        self.mpc = bool(cfg.RUN.mixed_precision) and not self.is_stylegan
        # fuse D(real)/D(fake) into one batched call when D computes no
        # batch statistics (SN discriminators; stylegan's mbstd layer and
        # BN-Ds would mix real/fake stats) and ADC's label doubling
        # doesn't differ between the halves.  SN u/v then advance once per
        # micro-batch instead of twice (torch's hook fires per call).
        self._can_batch_d_calls = (M.apply_d_sn and not self.is_stylegan
                                   and M.aux_cls_type != "ADC")

    # -- module application helpers ---------------------------------------

    def _g_apply(self, params, gstate, z, y, train=True, mutable=(), rng=None,
                 update_emas=False, truncation_psi=1.0, truncation_cutoff=None):
        kwargs = {}
        rngs = None
        if self.is_stylegan:
            k1, k2 = jax.random.split(rng if rng is not None
                                      else jax.random.PRNGKey(0))
            rngs = {"noise": k1, "style_mix": k2}
            sm_p = self.cfg.STYLEGAN.style_mixing_p
            kwargs = dict(
                style_mixing_p=float(sm_p) if (train and sm_p not in (NA, None)) else 0.0,
                update_emas=update_emas,
                truncation_psi=truncation_psi,
                truncation_cutoff=truncation_cutoff)
        out = self.G.apply({"params": params, **gstate}, z, y, train=train,
                           mutable=list(mutable) if mutable else False,
                           rngs=rngs, **kwargs)
        if mutable:
            img, new = out
            return img, {**gstate, **new}
        return out, gstate

    def _d_apply(self, params, dstate, x, y, train=True, adc_fake=False,
                 mutable=()):
        out = self.D.apply({"params": params, **dstate}, x, y, train=train,
                           adc_fake=adc_fake,
                           mutable=list(mutable) if mutable else False)
        if mutable:
            d, new = out
            return d, {**dstate, **new}
        return out, dstate

    # -- fake image sampling (reference sample.generate_images) -----------

    def _sample_fakes(self, g_params, g_state, d_params, d_state, rng,
                      batch_size, update_g_state: bool):
        M, Ls = self.M, self.Ls
        k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
        zs, labels, zs_eps = S.sample_zy(
            k1, M.z_prior, batch_size, M.z_dim, self.cfg.DATA.num_classes,
            -1.0, "totally_random", Ls.radius if Ls.apply_zcr else NA)
        info_discrete_c = info_conti_c = None
        if self.is_infogan:
            z_extra, info_discrete_c, info_conti_c = S.sample_info_codes(
                k2, M, batch_size)
            zs = jnp.concatenate([zs] + z_extra, axis=1)

        trsp_cost = None
        if Ls.apply_lo:
            def g_d_adv(z, y):
                img, _ = self._g_apply(g_params, g_state, z, y, rng=k3)
                out, _ = self._d_apply(d_params, d_state, img, y)
                return out["adv_output"]
            zs, trsp_cost = L.latent_optimise(
                zs, labels, g_d_adv, k3, Ls.lo_rate,
                Ls.lo_steps4train, Ls.lo_alpha, Ls.lo_beta)

        mutable = self._g_mutable(g_state, update_g_state)
        if self.mpc:
            zs = zs.astype(jnp.bfloat16)
        # reference: stylegan w_avg EMA updates during the D-step generation
        # only (worker.py:254 stylegan_update_emas=True; :540 False)
        fakes, new_g_state = self._g_apply(
            g_params, g_state, zs, labels, mutable=mutable, rng=k4,
            update_emas=self.is_stylegan and not update_g_state)
        fakes_eps = None
        if zs_eps is not None:
            fakes_eps, _ = self._g_apply(g_params, new_g_state, zs_eps, labels,
                                         rng=k5)
        return dict(images=fakes, labels=labels, images_eps=fakes_eps,
                    trsp_cost=trsp_cost, info_discrete_c=info_discrete_c,
                    info_conti_c=info_conti_c, g_state=new_g_state)

    @staticmethod
    def _g_mutable(g_state, update_all: bool):
        if update_all:
            return tuple(g_state.keys())
        # D-step G forward: BN running stats frozen, SN u/v and the stylegan
        # w_avg EMA still advance (torch SN hooks fire regardless of
        # requires_grad; reference worker.py:226 untracks BN only)
        return tuple(k for k in ("sn", "stats_ema") if k in g_state)

    # -- conditioning losses (reference worker.__init__:141-157) ----------

    def _cond_loss(self, out):
        mtd, Ls = self.M.d_cond_mtd, self.Ls
        if mtd == "AC":
            return L.cross_entropy_loss(out["cls_output"], out["label"])
        if mtd == "2C":
            return L.conditional_contrastive_loss(
                out["embed"], out["proxy"], out["label"], Ls.temperature)
        if mtd == "D2DCE":
            return L.data2data_ce_loss(
                out["embed"], out["proxy"], out["label"], Ls.temperature, Ls.m_p)
        raise NotImplementedError(mtd)

    def _cond_loss_mi(self, out):
        mtd, Ls = self.M.d_cond_mtd, self.Ls
        if mtd == "AC":
            return L.cross_entropy_loss(out["mi_cls_output"], out["label"])
        return (L.conditional_contrastive_loss if mtd == "2C"
                else functools.partial(L.data2data_ce_loss, m_p=Ls.m_p))(
            out["mi_embed"], out["mi_proxy"], out["label"],
            temperature=Ls.temperature)

    @staticmethod
    def _l2(a, b):
        return jnp.mean((a - b) ** 2)

    def _consistency_terms(self, a_dict, b_dict):
        """adv (+cls/embed) L2 match for CR/bCR/zCR (worker.py:326-366)."""
        loss = self._l2(a_dict["adv_output"], b_dict["adv_output"])
        if self.M.d_cond_mtd == "AC":
            loss += self._l2(a_dict["cls_output"], b_dict["cls_output"])
        elif self.M.d_cond_mtd in ("2C", "D2DCE"):
            loss += self._l2(a_dict["embed"], b_dict["embed"])
        return loss

    # -- D loss (reference worker.train_discriminator:230-436) ------------

    def _d_loss_fn(self, d_params, d_state, real_images, real_labels, fakes,
                   rng, step, ada_p, lecam, r1_gate=jnp.asarray(1.0)):
        Ls, M = self.Ls, self.M
        k_apa, k_aug_r, k_aug_f, k_prl_r, k_prl_f, k_gp = jax.random.split(rng, 6)
        fake_images, fake_labels = fakes["images"], fakes["labels"]
        fake_images = jax.lax.stop_gradient(fake_images)
        if self.mpc:
            real_images = real_images.astype(jnp.bfloat16)
            fake_images = fake_images.astype(jnp.bfloat16)

        if self._blur_active:  # stylegan3-r fade-in blur (worker.py:264-272)
            real_images = self._blur_images(real_images, step)
            fake_images = self._blur_images(fake_images, step)

        if self.A.apply_apa:
            real_images = apply_apa_aug(k_apa, real_images, fake_images, ada_p)

        def series(key, x):
            return self.series_augment(key, x, ada_p) if self.has_series_aug else x

        real_aug = series(k_aug_r, real_images)
        fake_aug = series(k_aug_f, fake_images)

        mut = tuple(d_state.keys())
        if self._can_batch_d_calls:
            # SN-only D (no BN): one batched D call over [real; fake] —
            # same math as the reference's two calls (worker.py:281-282)
            # but twice the batch on the MXU. (Disabled for BN-Ds, where
            # batch statistics would mix, and for ADC's label doubling.)
            both, d_state2 = self._d_apply(
                d_params, d_state,
                jnp.concatenate([real_aug, fake_aug], axis=0),
                jnp.concatenate([real_labels, fake_labels], axis=0),
                mutable=mut)
            n = real_aug.shape[0]
            real_dict = {k: (v[:n] if isinstance(v, jnp.ndarray) else v)
                         for k, v in both.items()}
            fake_dict = {k: (v[n:] if isinstance(v, jnp.ndarray) else v)
                         for k, v in both.items()}
        else:
            real_dict, d_state1 = self._d_apply(d_params, d_state, real_aug,
                                                real_labels, mutable=mut)
            fake_dict, d_state2 = self._d_apply(d_params, d_state1, fake_aug,
                                                fake_labels, adc_fake=True,
                                                mutable=mut)

        if self.mh:
            loss = L.crammer_singer_loss(real_dict["adv_output"], real_labels)
            lossy = L.mh_fake_label(self.cfg.DATA.num_classes,
                                    fake_labels.shape[0])
            loss += L.crammer_singer_loss(fake_dict["adv_output"], lossy)
        else:
            loss = self.d_adv(real_dict["adv_output"], fake_dict["adv_output"])

        real_cond_loss = jnp.asarray(0.0)
        if self.classifier_based:
            real_cond_loss = self._cond_loss(real_dict)
            loss += Ls.cond_lambda * real_cond_loss
            if M.aux_cls_type == "TAC":
                loss += Ls.tac_dis_lambda * self._cond_loss_mi(fake_dict)
            elif M.aux_cls_type == "ADC":
                loss += Ls.cond_lambda * self._cond_loss(fake_dict)

        if Ls.apply_lo:
            loss += Ls.lo_lambda * fakes["trsp_cost"]

        if Ls.apply_cr:
            prl = self.parallel_augment(k_prl_r, real_images)
            prl_dict, _ = self._d_apply(d_params, d_state2, prl, real_labels)
            loss += Ls.cr_lambda * self._consistency_terms(real_dict, prl_dict)

        if Ls.apply_bcr:
            prl_r = self.parallel_augment(k_prl_r, real_images)
            prl_f = self.parallel_augment(k_prl_f, fake_images)
            prl_r_dict, _ = self._d_apply(d_params, d_state2, prl_r, real_labels)
            prl_f_dict, _ = self._d_apply(d_params, d_state2, prl_f, fake_labels,
                                          adc_fake=True)
            loss += (Ls.real_lambda * self._consistency_terms(real_dict, prl_r_dict)
                     + Ls.fake_lambda * self._consistency_terms(fake_dict, prl_f_dict))

        if Ls.apply_zcr:
            eps_dict, _ = self._d_apply(d_params, d_state2,
                                        jax.lax.stop_gradient(fakes["images_eps"]),
                                        fake_labels, adc_fake=True)
            loss += Ls.d_lambda * self._consistency_terms(fake_dict, eps_dict)

        def d_adv_on(images, labels):
            out, _ = self._d_apply(d_params, d_state, images, labels)
            return out["adv_output"]

        if Ls.apply_gp:
            loss += Ls.gp_lambda * L.cal_grad_penalty(
                lambda im: d_adv_on(im, real_labels), k_gp, real_images, fake_images)
        if Ls.apply_dra:
            loss += Ls.dra_lambda * L.cal_dra_penalty(
                lambda im: d_adv_on(im, real_labels), k_gp, real_images)
        if Ls.apply_maxgp:
            loss += Ls.maxgp_lambda * L.cal_maxgrad_penalty(
                lambda im: d_adv_on(im, real_labels), k_gp, real_images, fake_images)

        new_lecam = lecam
        if Ls.apply_lecam:
            real_mean = jax.lax.stop_gradient(jnp.mean(real_dict["adv_output"]))
            fake_mean = jax.lax.stop_gradient(jnp.mean(fake_dict["adv_output"]))
            new_lecam = L.lecam_ema_update(lecam, "D_real", real_mean, step,
                                           Ls.lecam_ema_decay, Ls.lecam_ema_start_iter)
            new_lecam = L.lecam_ema_update(new_lecam, "D_fake", fake_mean, step,
                                           Ls.lecam_ema_decay, Ls.lecam_ema_start_iter)
            lecam_loss = L.lecam_reg(real_dict["adv_output"], fake_dict["adv_output"],
                                     new_lecam["D_real"], new_lecam["D_fake"])
            loss += Ls.lecam_lambda * jnp.where(
                step > Ls.lecam_ema_start_iter, lecam_loss, 0.0)

        r1_penalty = jnp.asarray(0.0)
        if Ls.apply_r1_reg and not self.is_stylegan:
            r1_penalty = L.cal_r1_reg(
                lambda im: d_adv_on(series(k_aug_r, im), real_labels), real_images)
            loss += Ls.r1_lambda * r1_penalty
        elif Ls.apply_r1_reg and self.is_stylegan and Ls.r1_place == "inside_loop":
            # lazy R1 inside the loop, gated on the d_reg_interval
            # (reference worker.py:415-427)
            r1_penalty = jax.lax.cond(
                r1_gate > 0,
                lambda: L.stylegan_cal_r1_reg(
                    lambda im: d_adv_on(series(k_aug_r, im), real_labels),
                    real_images),
                lambda: jnp.asarray(0.0))
            loss += (self.cfg.STYLEGAN.d_reg_interval * Ls.r1_lambda
                     * r1_penalty)

        aux = dict(
            d_state=d_state2, lecam=new_lecam,
            real_cond_loss=real_cond_loss, r1_penalty=r1_penalty,
            sign_real=jnp.sum(jnp.sign(real_dict["adv_output"])),
            count=jnp.asarray(float(real_labels.shape[0])),
        )
        return loss, aux

    # -- G loss (reference worker.train_generator:516-625) -----------------

    def _g_adv_loss(self, adv_output, fake_labels, topk):
        Ls = self.Ls
        if self.mh:
            return Ls.mh_lambda * L.crammer_singer_loss(adv_output, fake_labels)
        if Ls.apply_topk:
            elem = {
                "vanilla": lambda x: jax.nn.softplus(-x),
                "logistic": lambda x: jax.nn.softplus(-x),
                "least_square": lambda x: 0.5 * (x - 1.0) ** 2,
                "hinge": lambda x: -x,
                "wasserstein": lambda x: -x,
            }[Ls.adv_loss]
            vals = jnp.sort(adv_output)[::-1]
            w = (jnp.arange(vals.shape[0]) < topk).astype(vals.dtype)
            return jnp.sum(elem(vals) * w) / jnp.maximum(topk, 1.0)
        return self.g_adv(adv_output)

    def _g_loss_fn(self, g_params, d_info_params, g_state, d_params, d_state,
                   real_micro, rng, step, ada_p, topk):
        Ls, M = self.Ls, self.M
        if d_info_params is not None:
            d_params = _merge_info(d_params, d_info_params)
        k_fake, k_aug, k_aug_r = jax.random.split(rng, 3)

        fakes = self._sample_fakes(g_params, g_state, d_params, d_state,
                                   k_fake, self.O.batch_size, update_g_state=True)
        fake_images, fake_labels = fakes["images"], fakes["labels"]
        if self._blur_active:  # stylegan3-r blur in the G pass (worker.py:543)
            fake_images = self._blur_images(fake_images, step)
        fake_aug = (self.series_augment(k_aug, fake_images, ada_p)
                    if self.has_series_aug else fake_images)

        mut = tuple(d_state.keys())
        fake_dict, d_state1 = self._d_apply(d_params, d_state, fake_aug,
                                            fake_labels, mutable=mut)

        loss = self._g_adv_loss(fake_dict["adv_output"], fake_labels, topk)

        if self.classifier_based:
            loss += Ls.cond_lambda * self._cond_loss(fake_dict)
            if M.aux_cls_type == "TAC":
                loss += Ls.tac_gen_lambda * (-self._cond_loss_mi(fake_dict))
            elif M.aux_cls_type == "ADC":
                adc_dict, _ = self._d_apply(d_params, d_state1, fake_aug,
                                            fake_labels, adc_fake=True)
                loss += Ls.cond_lambda * (-self._cond_loss(adc_dict))

        if Ls.apply_fm:
            real_images, real_labels = real_micro
            real_aug = (self.series_augment(k_aug_r, real_images, ada_p)
                        if self.has_series_aug else real_images)
            real_dict, _ = self._d_apply(d_params, d_state1, real_aug, real_labels)
            loss += Ls.fm_lambda * L.feature_matching_loss(
                jax.lax.stop_gradient(real_dict["h"]), fake_dict["h"])

        if Ls.apply_lo:
            loss += Ls.lo_lambda * fakes["trsp_cost"]

        if Ls.apply_zcr:
            loss += Ls.g_lambda * (-self._l2(fake_images, fakes["images_eps"]))

        if M.info_type in ("discrete", "both"):
            dim = M.info_dim_discrete_c
            logits = fake_dict["info_discrete_c_logits"]
            info_loss = 0.0
            for i in range(M.info_num_discrete_c):
                info_loss += L.cross_entropy_loss(
                    logits[:, i * dim:(i + 1) * dim], fakes["info_discrete_c"][:, i])
            loss += Ls.infoGAN_loss_discrete_lambda * info_loss
        if M.info_type in ("continuous", "both"):
            loss += Ls.infoGAN_loss_conti_lambda * L.normal_nll_loss(
                fakes["info_conti_c"], fake_dict["info_conti_mu"],
                fake_dict["info_conti_var"])

        aux = dict(g_state=fakes["g_state"], d_state=d_state1,
                   sign_fake=jnp.sum(jnp.sign(fake_dict["adv_output"])))
        return loss, aux

    # -- stylegan3-r blur schedule (reference worker.py:264-272,543-548) ----

    @property
    def _blur_active(self) -> bool:
        return (self.M.backbone == "stylegan3"
                and self.cfg.STYLEGAN.stylegan3_cfg == "stylegan3-r"
                and self.cfg.STYLEGAN.blur_init_sigma != NA)

    def _blur_schedule(self, step):
        blur_fade_kimg = self.effective_batch_size * 200 / 32
        return jnp.maximum(
            1 - (self.effective_batch_size * step.astype(jnp.float32))
            / (blur_fade_kimg * 1e3), 0.0) * self.cfg.STYLEGAN.blur_init_sigma

    def _blur_images(self, images, step):
        """Gaussian-ish exp2 blur with step-faded sigma.  The reference
        builds a dynamically-sized filter (floor(3*sigma) taps); under jit
        we use a static worst-case window masked by the traced sigma."""
        from studiogan_tpu.ops.upfirdn2d import upfirdn2d
        sigma = self._blur_schedule(step)
        max_size = int(self.cfg.STYLEGAN.blur_init_sigma * 3)
        idx = jnp.arange(-max_size, max_size + 1, dtype=jnp.float32)
        f = jnp.exp2(-jnp.square(idx / jnp.maximum(sigma, 1e-8)))
        f = jnp.where(jnp.abs(idx) <= jnp.floor(sigma * 3), f, 0.0)
        f = jnp.where(sigma > 0, f, (idx == 0).astype(jnp.float32))
        f = f / jnp.sum(f)
        return upfirdn2d(images, f, padding=(max_size, max_size,
                                             max_size, max_size))

    # -- standing statistics (reference misc.py:301-340) --------------------

    def prepare_standing_state(self, state: GANTrainState, rng: Array):
        """Re-estimate BN moments of the eval generator over
        `standing_step` random-size batches (reference
        misc.apply_standing_statistics, misc.py:301-333: reset running
        stats, then let torch BN's momentum-0.1 EMA accumulate over
        random.randint(1, max_batch)-sized forward passes).  Returns a
        g_state to pass to generate(override_g_state=...).

        Per-batch moments are recovered algebraically from one EMA update
        off a reset state (momentum m: batch = (new - (1-m)*reset)/m) and
        re-accumulated with the reference's momentum EMA, so no module
        plumbing for a 'cumulative' mode is needed.  Batch sizes come from
        ``rng`` uniformly over [1, standing_max_batch] rounded up to
        powers of two — bucketing keeps the number of distinct XLA
        compilations at log2(max_batch) instead of standing_step."""
        R, m = self.cfg.RUN, 0.1
        g_params = state.ema_or_g_params
        base_state = jax.device_get(state.ema_or_g_state)
        if "batch_stats" not in base_state:
            return state.ema_or_g_state  # no BN (stylegan): no-op

        bs_buckets = sorted({2 ** i for i in range(0, 12)
                             if 2 ** i <= R.standing_max_batch} | {1})
        reset_bs = jax.tree_util.tree_map_with_path(
            lambda p, x: jnp.ones_like(x)
            if str(getattr(p[-1], "key", "")) == "var" else jnp.zeros_like(x),
            base_state["batch_stats"])

        def is_moment(path):
            return str(getattr(path[-1], "key", "")) in ("mean", "var")

        running = reset_bs  # mean=0 / var=1, as torch reset_running_stats
        for i in range(R.standing_step):
            rng, k1, k2, k3 = jax.random.split(rng, 4)
            draw = int(jax.random.randint(k3, (), 1, R.standing_max_batch + 1))
            bs = next(b for b in bs_buckets if b >= draw)
            z = jax.random.normal(k1, (bs, self.M.z_dim + _info_extra_dim(self.M)))
            y = jax.random.randint(k2, (bs,), 0, self.cfg.DATA.num_classes)
            gstate_i = {**base_state, "batch_stats": reset_bs}
            _, new_state = self._g_apply(g_params, gstate_i, z, y, train=True,
                                         mutable=("batch_stats",), rng=rng)
            batch_moments = jax.tree_util.tree_map_with_path(
                lambda p, new, init: (new - (1 - m) * init) / m
                if is_moment(p) else new,
                new_state["batch_stats"], reset_bs)
            # torch BN momentum EMA: running = (1-m)*running + m*batch
            running = jax.tree_util.tree_map_with_path(
                lambda p, run, batch: (1 - m) * run + m * batch
                if is_moment(p) else batch,
                running, batch_moments)
        return {**base_state, "batch_stats": running}

    # -- stylegan lazy regularizer steps ------------------------------------

    def _lazy_r1_step(self, st: GANTrainState, micro_imgs, micro_labs):
        """Separate R1-only optimizer step over the same acml micros
        (reference worker.py:446-475)."""
        SG, Ls, ac = self.cfg.STYLEGAN, self.Ls, self.O.acml_steps
        rng, step_rng = jax.random.split(st.rng)

        def r1_loss(d_params, mi, ml, k):
            k_apa, k_aug, k_fake = jax.random.split(k, 3)
            imgs = mi
            if self.A.apply_apa:
                fakes = self._sample_fakes(st.g_params, st.g_state,
                                           d_params, st.d_state, k_fake,
                                           mi.shape[0], update_g_state=False)
                imgs = apply_apa_aug(k_apa, imgs, fakes["images"], st.ada_p)

            def d_adv(im):
                im = (self.series_augment(k_aug, im, st.ada_p)
                      if self.has_series_aug else im)
                out, _ = self._d_apply(d_params, st.d_state, im, ml)
                return out["adv_output"]

            pen = L.stylegan_cal_r1_reg(d_adv, imgs)
            # the reference also accumulates the ADA sign heuristic from the
            # R1 forward's adv outputs (worker.py:469-475)
            adv = jax.lax.stop_gradient(d_adv(imgs))
            aux = jnp.stack([jnp.sum(jnp.sign(adv)),
                             jnp.asarray(adv.shape[0], jnp.float32)])
            return pen * (SG.d_reg_interval * Ls.r1_lambda / ac), aux

        def body(carry, micro):
            grads_acc, sign_acc = carry
            mi, ml, k = micro
            (_, aux), grads = jax.value_and_grad(r1_loss, has_aux=True)(
                st.d_params, mi, ml, k)
            return (_tree_add(grads_acc, grads), sign_acc + aux), None

        ks = jax.random.split(step_rng, ac)
        (grads, sign_acc), _ = jax.lax.scan(
            body, (_tree_zeros_like(st.d_params), jnp.zeros(2)),
            (micro_imgs, micro_labs, ks),
            unroll=ac if self.unroll_scans else 1)
        updates, d_opt = self.d_tx.update(grads, st.d_opt, st.d_params)
        ada_stats = st.ada_stats
        if self.A.apply_ada or self.A.apply_apa:
            ada_stats = ada_stats + sign_acc
        return st.replace(d_params=optax.apply_updates(st.d_params, updates),
                          d_opt=d_opt, rng=rng, ada_stats=ada_stats)

    def _lazy_pl_step(self, st: GANTrainState) -> GANTrainState:
        """Path-length regularization: its own optimizer step at
        g_reg_interval with batch_size // 2 (reference worker.py:637-672)."""
        SG, ac = self.cfg.STYLEGAN, self.O.acml_steps
        bs = max(self.O.batch_size // 2, 1)
        rng, step_rng = jax.random.split(st.rng)

        def pl_loss(g_params, pl_mean, k):
            k_z, k_y, k_noise, k_pl = jax.random.split(k, 4)
            zs = jax.random.normal(k_z, (bs, self.M.z_dim + _info_extra_dim(self.M)))
            labels = jax.random.randint(k_y, (bs,), 0,
                                        self.cfg.DATA.num_classes)
            variables = {"params": g_params, **st.g_state}
            ws = self.G.apply(variables, zs, labels, method=self.G.run_mapping)

            def synth(w):
                return self.G.apply(variables, w, method=self.G.run_synthesis,
                                    rngs={"noise": k_noise})

            loss, new_pl_mean = L.cal_pl_reg(synth, k_pl, ws, pl_mean,
                                             pl_weight=SG.pl_weight)
            return loss * (SG.g_reg_interval / ac), new_pl_mean

        def body(carry, k):
            grads_acc, pl_mean = carry
            grads, pl_mean = jax.grad(pl_loss, has_aux=True)(
                st.g_params, pl_mean, k)
            return (_tree_add(grads_acc, grads), pl_mean), None

        ks = jax.random.split(step_rng, ac)
        (grads, pl_mean), _ = jax.lax.scan(
            body, (_tree_zeros_like(st.g_params), st.pl_mean), ks,
            unroll=ac if self.unroll_scans else 1)
        updates, g_opt = self.g_tx.update(grads, st.g_opt, st.g_params)
        return st.replace(g_params=optax.apply_updates(st.g_params, updates),
                          g_opt=g_opt, pl_mean=pl_mean, rng=rng)

    # -- full train step ----------------------------------------------------

    def init_state(self, rng: Array, ckpt_like: bool = False) -> GANTrainState:
        M, O, D = self.M, self.O, self.cfg.DATA
        k_g, k_d, k_run = jax.random.split(rng, 3)
        z = jnp.zeros((2, M.z_dim + _info_extra_dim(M)))
        y = jnp.zeros((2,), jnp.int32)
        if self.is_stylegan:
            ks = jax.random.split(k_g, 3)
            g_vars = self.G.init({"params": ks[0], "noise": ks[1],
                                  "style_mix": ks[2]}, z, y, train=True)
        else:
            g_vars = self.G.init(k_g, z, y, train=True)
        g_params = g_vars.pop("params")
        g_state = dict(g_vars)
        x = jnp.zeros((2, D.img_size, D.img_size, D.img_channels))
        d_vars = self.D.init(k_d, x, y, train=True)
        d_params = d_vars.pop("params")
        d_state = dict(d_vars)

        state = GANTrainState(
            step=jnp.asarray(0, jnp.int32),
            rng=k_run,
            g_params=g_params, g_state=g_state,
            d_params=d_params, d_state=d_state,
            g_opt=self.g_tx.init(g_params),
            d_opt=self.d_tx.init(d_params),
            g_ema_params=jax.tree.map(jnp.copy, g_params) if M.apply_g_ema else None,
            g_ema_state=jax.tree.map(jnp.copy, g_state) if M.apply_g_ema else None,
            topk=jnp.asarray(float(O.batch_size)),
            ada_p=jnp.asarray(float(self.A.ada_initial_augment_p)
                              if self.A.apply_ada and self.A.ada_initial_augment_p != NA
                              else (float(self.A.apa_initial_augment_p)
                                    if self.A.apply_apa and self.A.apa_initial_augment_p != NA
                                    else 0.0)),
            lecam=init_lecam() if self.Ls.apply_lecam else None,
            info_opt=self.info_tx.init(d_params) if self.is_infogan else None,
        )
        return state

    def train_step(self, state: GANTrainState, real_images: Array,
                   real_labels: Array):
        """One full reference 'step': d_updates x acml D passes + lazy regs
        + ADA controller + g_updates x acml G passes + EMA + counters, in
        the order given by OPTIMIZATION.d_first (worker dispatch,
        reference loader.py:392-398).

        real_images: (d_updates*acml, B, H, W, C) basket; labels likewise.
        uint8 baskets are normalized on device ((x/127.5)-1, reference
        data_util.py:92-94) — the host pipeline ships raw bytes to cut
        host->device bandwidth 4x.
        """
        O = self.O
        du, ac, B = O.d_updates_per_step, O.acml_steps, O.batch_size
        if real_images.dtype == jnp.uint8:
            real_images = real_images.astype(jnp.float32) / 127.5 - 1.0
        imgs = real_images.reshape(du, ac, B, *real_images.shape[2:])
        labs = real_labels.reshape(du, ac, B)

        if O.d_first:
            state, d_stats = self._d_phase(state, imgs, labs)
            state, g_metrics = self._g_phase(state, imgs, labs)
        else:
            state, g_metrics = self._g_phase(state, imgs, labs)
            state, d_stats = self._d_phase(state, imgs, labs)

        # ---------------- counters ----------------
        if self.Ls.apply_topk:
            state = state.replace(topk=L.adjust_k(
                state.topk, self.Ls.topk_gamma,
                float(int(self.O.batch_size * self.Ls.topk_nu))))
        state = state.replace(step=state.step + 1)

        metrics = dict(
            d_loss=d_stats["d_loss"], g_loss=g_metrics["g_loss"],
            real_cond_loss=d_stats["real_cond_loss"], r1_penalty=d_stats["r1"],
            ada_p=state.ada_p, topk=state.topk,
        )
        return state, metrics

    def _d_phase(self, state: GANTrainState, imgs: Array, labs: Array):
        O = self.O
        du, ac, B = O.d_updates_per_step, O.acml_steps, O.batch_size

        # ---------------- D updates ----------------
        def d_update(carry, xs):
            st, metrics_prev = carry
            micro_imgs, micro_labs, upd_idx = xs
            rng, step_rng = jax.random.split(st.rng)

            # lazy-reg interval indicator for this D update
            # (reference worker.py:416,446: (d_updates*step + step_index) %
            # d_reg_interval == 0)
            if self.is_stylegan and self.Ls.apply_r1_reg:
                r1_gate = ((du * st.step + upd_idx)
                           % self.cfg.STYLEGAN.d_reg_interval == 0
                           ).astype(jnp.float32)
            else:
                r1_gate = jnp.asarray(1.0)

            def acml_body(inner, micro):
                grads_acc, d_state, g_state, lecam, stats = inner
                mi, ml, k = micro
                k1, k2 = jax.random.split(k)
                fakes = self._sample_fakes(st.g_params, g_state, st.d_params,
                                           d_state, k1, B, update_g_state=False)
                (loss, aux), grads = jax.value_and_grad(
                    self._d_loss, has_aux=True)(
                        st.d_params, d_state, mi, ml, fakes, k2, st.step,
                        st.ada_p, lecam, r1_gate)
                stats = dict(
                    d_loss=loss, real_cond_loss=aux["real_cond_loss"],
                    r1=aux["r1_penalty"],
                    sign_real=stats["sign_real"] + aux["sign_real"],
                    count=stats["count"] + aux["count"])
                return (_tree_add(grads_acc, grads), aux["d_state"],
                        fakes["g_state"], aux["lecam"], stats), None

            ks = jax.random.split(step_rng, ac)
            init_stats = dict(d_loss=0.0, real_cond_loss=0.0, r1=0.0,
                              sign_real=st.ada_stats[0], count=st.ada_stats[1])
            (grads, d_state, g_state, lecam, stats), _ = jax.lax.scan(
                acml_body,
                (_tree_zeros_like(st.d_params), st.d_state, st.g_state,
                 st.lecam, init_stats),
                (micro_imgs, micro_labs, ks),
                unroll=ac if self.unroll_scans else 1)
            grads = _tree_scale(grads, 1.0 / ac)
            updates, d_opt = self.d_tx.update(grads, st.d_opt, st.d_params)
            d_params = optax.apply_updates(st.d_params, updates)
            if self.Ls.apply_wc:
                d_params = jax.tree.map(
                    lambda p: jnp.clip(p, -self.Ls.wc_bound, self.Ls.wc_bound),
                    d_params)
            st = st.replace(d_params=d_params, d_opt=d_opt, d_state=d_state,
                            g_state=g_state, lecam=lecam, rng=rng,
                            ada_stats=jnp.stack([stats["sign_real"],
                                                 stats["count"]]))

            # lazy R1 OUTSIDE the loop: its own optimizer step at
            # d_reg_interval (reference worker.py:446-475)
            if (self.Ls.apply_r1_reg and self.is_stylegan
                    and self.Ls.r1_place == "outside_loop"):
                st = jax.lax.cond(
                    r1_gate > 0,
                    lambda s: self._lazy_r1_step(s, micro_imgs, micro_labs),
                    lambda s: s, st)

            # ADA / APA p-controller: per D update on qualifying steps,
            # with the stats accumulated since the last adjustment
            # (reference worker.py:479-487 — the adjust block sits inside
            # the step_index loop)
            st = self._aa_adjust(st)
            return (st, stats), None

        (state, d_stats), _ = jax.lax.scan(
            d_update,
            (state, dict(d_loss=jnp.asarray(0.0), real_cond_loss=jnp.asarray(0.0),
                         r1=jnp.asarray(0.0), sign_real=jnp.asarray(0.0),
                         count=jnp.asarray(0.0))),
            (imgs, labs, jnp.arange(du)),
            unroll=du if self.unroll_scans else 1)

        return state, d_stats

    def _aa_adjust(self, st: GANTrainState) -> GANTrainState:
        """One ADA/APA p adjustment from the accumulated sign heuristic
        (reference worker.py:479-487): on steps hitting aa_interval, move p
        by sign(heuristic - target) * count / (aa_kimg * 1000) and reset the
        accumulator.  Called once per D update, like the reference."""
        if not ((self.A.apply_ada or self.A.apply_apa)
                and self.aa_target not in (NA, None)):
            return st
        do_adjust = (st.step % self.aa_interval) == 0
        heuristic = st.ada_stats[0] / jnp.maximum(st.ada_stats[1], 1.0)
        adjust = (jnp.sign(heuristic - self.aa_target)
                  * st.ada_stats[1] / (self.aa_kimg * 1000.0))
        new_p = jnp.clip(st.ada_p + adjust, 0.0, 1.0)
        return st.replace(
            ada_p=jnp.where(do_adjust, new_p, st.ada_p),
            ada_stats=jnp.where(do_adjust, jnp.zeros(2), st.ada_stats))

    def _g_phase(self, state: GANTrainState, imgs: Array, labs: Array):
        O, ac = self.O, self.O.acml_steps
        # ---------------- G updates ----------------
        g_metrics = dict(g_loss=jnp.asarray(0.0))
        real_micro = (imgs[0, 0], labs[0, 0])
        for g_idx in range(O.g_updates_per_step):
            rng, step_rng = jax.random.split(state.rng)
            state = state.replace(rng=rng)

            def g_acml(inner, k):
                grads_acc, info_grads_acc, g_state, d_state, gl = inner
                argnums = (0, 1) if self.is_infogan else 0
                (loss, aux), grads = jax.value_and_grad(
                    self._g_loss, argnums=argnums, has_aux=True)(
                        state.g_params,
                        state.d_params if self.is_infogan else None,
                        g_state, state.d_params, d_state, real_micro, k,
                        state.step, state.ada_p, state.topk)
                if self.is_infogan:
                    g_grads, i_grads = grads
                    info_grads_acc = _tree_add(info_grads_acc, i_grads)
                else:
                    g_grads = grads
                return (_tree_add(grads_acc, g_grads), info_grads_acc,
                        aux["g_state"], aux["d_state"], gl + loss), None

            ks = jax.random.split(step_rng, ac)
            info_zero = _tree_zeros_like(state.d_params) if self.is_infogan else None
            (g_grads, info_grads, g_state, d_state, g_loss), _ = jax.lax.scan(
                g_acml,
                (_tree_zeros_like(state.g_params), info_zero, state.g_state,
                 state.d_state, jnp.asarray(0.0)),
                ks, unroll=ac if self.unroll_scans else 1)
            g_grads = _tree_scale(g_grads, 1.0 / ac)
            updates, g_opt = self.g_tx.update(g_grads, state.g_opt, state.g_params)
            g_params = optax.apply_updates(state.g_params, updates)
            state = state.replace(g_params=g_params, g_opt=g_opt,
                                  g_state=g_state, d_state=d_state)
            if self.is_infogan:
                info_grads = _tree_scale(info_grads, 1.0 / ac)
                i_updates, info_opt = self.info_tx.update(
                    info_grads, state.info_opt, state.d_params)
                state = state.replace(
                    d_params=optax.apply_updates(state.d_params, i_updates),
                    info_opt=info_opt)
            g_metrics["g_loss"] = g_loss / ac

            # lazy path-length regularization (reference worker.py:637-672)
            if self.cfg.STYLEGAN.apply_pl_reg and self.is_stylegan:
                do_pl = ((O.g_updates_per_step * state.step + g_idx)
                         % self.cfg.STYLEGAN.g_reg_interval == 0)
                state = jax.lax.cond(do_pl, self._lazy_pl_step,
                                     lambda s: s, state)

            # EMA update per G update (reference worker.py:675-676)
            if self.M.apply_g_ema:
                if self.is_stylegan:
                    decay = stylegan_decay(state.step, self.effective_batch_size,
                                           self.cfg.STYLEGAN.g_ema_kimg,
                                           self.cfg.STYLEGAN.g_ema_rampup)
                else:
                    decay = vanilla_decay(state.step, self.M.g_ema_decay,
                                          self.M.g_ema_start)
                state = state.replace(
                    g_ema_params=ema_update(state.g_ema_params, state.g_params,
                                            decay),
                    g_ema_state=jax.tree.map(
                        lambda s: jnp.copy(s), state.g_state))
        return state, g_metrics

    def train_steps(self, state: GANTrainState, basket_imgs: Array,
                    basket_labs: Array):
        """Scan train_step over a chunk of steps: one device dispatch per
        chunk instead of per step (the reference pays a full Python
        worker-loop round trip per step, loader.py:392-398).

        basket_imgs: (n_steps, d_updates*acml, B, H, W, C).

        Returns the FULL per-step metric stack — every metric leaf has a
        leading (n_steps,) axis (the scan's stacked ys) — so chunked
        dispatch loses no loss-curve granularity vs the reference's
        per-step accumulation (reference worker.py:686)."""
        def body(st, xs):
            imgs, labs = xs
            st, metrics = self.train_step(st, imgs, labs)
            return st, metrics

        state, metrics = jax.lax.scan(body, state, (basket_imgs, basket_labs))
        return state, metrics

    # -- inference ---------------------------------------------------------

    def generate(self, state: GANTrainState, rng: Array, batch_size: int,
                 truncation_factor: float = -1.0, y_sampler="totally_random",
                 use_ema: bool = True, override_g_state=None):
        """Eval-mode image generation (reference sample.generate_images with
        is_train=False), using EMA weights when available.
        override_g_state: standing-statistics state from
        prepare_standing_state (reference GeneratorController)."""
        params = state.ema_or_g_params if use_ema else state.g_params
        gstate = override_g_state if override_g_state is not None else (
            state.ema_or_g_state if use_ema else state.g_state)
        k1, k2 = jax.random.split(rng)
        # stylegan truncation acts in W space, not on z (reference
        # sample.py:104-111)
        z_trunc = -1.0 if self.is_stylegan else truncation_factor
        zs, labels, _ = S.sample_zy(
            k1, self.M.z_prior, batch_size, self.M.z_dim,
            self.cfg.DATA.num_classes, z_trunc, y_sampler, NA)
        if self.is_infogan:
            z_extra, _, _ = S.sample_info_codes(k2, self.M, batch_size)
            zs = jnp.concatenate([zs] + z_extra, axis=1)
        if self.cfg.RUN.langevin_sampling:
            R = self.cfg.RUN
            def g_d_adv(z, y):
                img, _ = self._g_apply(params, gstate, z, y, train=False, rng=k2)
                out, _ = self._d_apply(state.d_params, state.d_state, img, y,
                                       train=False)
                return out["adv_output"]
            zs = S.langevin_sampling(zs, labels, g_d_adv, k2, self.M.z_dim,
                                     R.langevin_rate, R.langevin_noise_std,
                                     R.langevin_decay, R.langevin_decay_steps,
                                     R.langevin_steps)
        use_batch_stats = self.cfg.RUN.batch_statistics
        psi, cutoff = 1.0, None
        if self.is_stylegan and truncation_factor not in (-1.0, -1, None):
            psi, cutoff = truncation_factor, self.cfg.RUN.truncation_cutoff
        imgs, _ = self._g_apply(params, gstate, zs, labels,
                                train=use_batch_stats, rng=k2,
                                truncation_psi=psi, truncation_cutoff=cutoff)
        return imgs, labels


def _merge_info(d_params, d_info_params):
    """Graft info-head leaves from d_info_params into d_params so G-step
    grads w.r.t. the Q-heads flow through the second argument."""
    def pick(path, a, b):
        hit = any(getattr(k, "key", None) is not None
                  and str(getattr(k, "key")).startswith(("info_discrete", "info_conti"))
                  for k in path)
        return b if hit else a
    return jax.tree_util.tree_map_with_path(pick, d_params, d_info_params)


def _info_extra_dim(M) -> int:
    d = 0
    if M.info_type in ("discrete", "both"):
        d += M.info_num_discrete_c * M.info_dim_discrete_c
    if M.info_type in ("continuous", "both"):
        d += M.info_num_conti_c
    return d
