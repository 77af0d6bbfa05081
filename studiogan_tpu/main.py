"""CLI entry point (parity with reference src/main.py + the run loop of
src/loader.py:386-512).

    python -m studiogan_tpu.main -t -metrics fid is \
        -cfg src/configs/CIFAR10/BigGAN.yaml -data ./data -save ./out

One process per host; the SPMD step spans all devices (no mp.spawn —
reference main.py:175-196 collapses into setup_runtime()).
"""

from __future__ import annotations

import json
import os
import sys
from argparse import ArgumentParser
from time import time

import jax
import numpy as np

from studiogan_tpu.config import Configurations
from studiogan_tpu.utils import log as log_util, misc, sn_monitor


def build_parser() -> ArgumentParser:
    p = ArgumentParser(description="StudioGAN-TPU")
    p.add_argument("--entity", type=str, default=None)
    p.add_argument("--project", type=str, default=None)
    p.add_argument("-cfg", "--cfg_file", type=str,
                   default="./configs/CIFAR10/BigGAN.yaml")
    p.add_argument("-data", "--data_dir", type=str, default=None)
    p.add_argument("-save", "--save_dir", type=str, default="./")
    p.add_argument("-ckpt", "--ckpt_dir", type=str, default=None)
    p.add_argument("-best", "--load_best", action="store_true")
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("-DDP", "--distributed_data_parallel", action="store_true")
    p.add_argument("--backend", type=str, default="xla")
    p.add_argument("-tn", "--total_nodes", default=1, type=int)
    p.add_argument("-cn", "--current_node", default=0, type=int)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("-sync_bn", "--synchronized_bn", action="store_true")
    p.add_argument("-mpc", "--mixed_precision", action="store_true")
    p.add_argument("--truncation_factor", type=float, default=-1.0)
    p.add_argument("--truncation_cutoff", type=float, default=None)
    p.add_argument("-batch_stat", "--batch_statistics", action="store_true")
    p.add_argument("-std_stat", "--standing_statistics", action="store_true")
    p.add_argument("-std_max", "--standing_max_batch", type=int, default=-1)
    p.add_argument("-std_step", "--standing_step", type=int, default=-1)
    p.add_argument("--freezeD", type=int, default=-1)
    p.add_argument("-lgv", "--langevin_sampling", action="store_true")
    p.add_argument("-lgv_rate", "--langevin_rate", type=float, default=-1)
    p.add_argument("-lgv_std", "--langevin_noise_std", type=float, default=-1)
    p.add_argument("-lgv_decay", "--langevin_decay", type=float, default=-1)
    p.add_argument("-lgv_decay_steps", "--langevin_decay_steps", type=int, default=-1)
    p.add_argument("-lgv_steps", "--langevin_steps", type=int, default=-1)
    p.add_argument("-t", "--train", action="store_true")
    p.add_argument("-hdf5", "--load_train_hdf5", action="store_true")
    p.add_argument("-l", "--load_data_in_memory", action="store_true")
    p.add_argument("-metrics", "--eval_metrics", nargs="+", default=["fid"])
    p.add_argument("--pre_resizer", type=str, default="wo_resize")
    p.add_argument("--post_resizer", type=str, default="legacy")
    p.add_argument("--num_eval", type=int, default=1)
    p.add_argument("-sr", "--save_real_images", action="store_true")
    p.add_argument("-sf", "--save_fake_images", action="store_true")
    p.add_argument("-sf_num", "--save_fake_images_num", type=int, default=1)
    p.add_argument("-v", "--vis_fake_images", action="store_true")
    p.add_argument("-knn", "--k_nearest_neighbor", action="store_true")
    p.add_argument("-itp", "--interpolation", action="store_true")
    p.add_argument("-fa", "--frequency_analysis", action="store_true")
    p.add_argument("-tsne", "--tsne_analysis", action="store_true")
    p.add_argument("-ifid", "--intra_class_fid", action="store_true")
    p.add_argument("--GAN_train", action="store_true")
    p.add_argument("--GAN_test", action="store_true")
    p.add_argument("-resume_ct", "--resume_classifier_train", action="store_true")
    p.add_argument("-sefa", "--semantic_factorization", action="store_true")
    p.add_argument("-sefa_axis", "--num_semantic_axis", type=int, default=-1)
    p.add_argument("-sefa_max", "--maximum_variations", type=float, default=-1)
    p.add_argument("-empty_cache", "--empty_cache", action="store_true")
    p.add_argument("--print_freq", type=int, default=100)
    p.add_argument("--save_freq", type=int, default=2000)
    p.add_argument("--eval_backbone", type=str, default="InceptionV3_tf")
    p.add_argument("-ref", "--ref_dataset", type=str, default="train")
    p.add_argument("--calc_is_ref_dataset", action="store_true")
    p.add_argument("--synthetic_data", action="store_true",
                   help="use a synthetic dataset (tests/benchmarks)")
    p.add_argument("--profile", type=int, default=0,
                   help="capture a jax profiler trace for N steps "
                        "(written to SAVE_DIR/profile; the reference has no "
                        "profiler — SURVEY.md §5)")
    p.add_argument("-async_ckpt", "--async_ckpt", action="store_true",
                   help="snapshot state on device and write checkpoints on "
                        "a background thread (the synchronous device->host "
                        "fetch of an ImageNet-scale state costs ~2 min on a "
                        "tunneled chip)")
    p.add_argument("--export_pth", type=str, default=None, metavar="DIR",
                   help="write the reference PyTorch-StudioGAN "
                        "model={G|D|G_ema}-*-weights-step=N.pth triplet "
                        "from the loaded (-ckpt) or fresh state into DIR "
                        "and exit (round-trip back to reference tooling)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize G/D activations inside the train step "
                        "(jax.checkpoint): ~1 extra forward per update buys "
                        "activation memory for 2-4x bigger micro-batches")
    p.add_argument("--unroll", dest="unroll_loops", action="store_true",
                   help="unroll the d_updates/acml micro-batch scans into "
                        "straight-line HLO (XLA schedules across micros; "
                        "longer compiles)")
    p.add_argument("--model_axis", type=int, default=1,
                   help="tensor-parallel axis: devices reshape to a "
                        "('data','model') mesh with model_axis trailing "
                        "devices; large weights shard weight-stationary "
                        "over 'model' (beyond the reference's DP-only "
                        "launcher)")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO: shard optimizer moments + EMA copies over "
                        "the 'data' axis (opt+EMA memory ~1/data_size; "
                        "math identical — GSPMD inserts the "
                        "reduce-scatters/all-gathers)")
    return p


def load_configs(argv=None):
    args = build_parser().parse_args(argv)
    cfg = Configurations(args.cfg_file)
    cfg.update_cfgs(vars(args), super="RUN")
    return cfg, args


def run(argv=None):
    cfg, args = load_configs(argv)

    from studiogan_tpu.parallel import setup_runtime
    from studiogan_tpu.parallel.mesh import put_basket
    rt = setup_runtime(cfg.RUN.total_nodes, cfg.RUN.current_node,
                       model_axis=getattr(cfg.RUN, "model_axis", 1),
                       fsdp=getattr(cfg.RUN, "fsdp", False))
    # warm XLA compiles across processes (TPU executables are shared
    # repo-wide, CPU ones per-machine — see misc.machine_fingerprint)
    misc.enable_persistent_compile_cache()
    cfg.finalize(world_size=rt.num_devices)
    cfg.check_compatability()

    if cfg.MODEL.backbone in ("stylegan2", "stylegan3"):
        # the reference disables TF32 for stylegan (loader.py:82-86);
        # the TPU analog is full-precision f32 matmuls/convs
        jax.config.update("jax_default_matmul_precision", "highest")

    seed = misc.fix_seed(cfg.RUN.seed)
    cfg.RUN.seed = seed
    run_name = log_util.make_run_name(
        "StudioGAN-TPU" if not cfg.cfg_file else
        os.path.splitext(os.path.basename(cfg.cfg_file))[0],
        cfg.DATA.name)
    misc.prepare_folder(cfg.MISC.base_folders, cfg.RUN.save_dir)
    logger = log_util.make_logger(cfg.RUN.save_dir, run_name)
    stats = log_util.StatsWriter(
        cfg.RUN.save_dir, run_name,
        use_wandb=cfg.RUN.entity is not None or cfg.RUN.project is not None,
        wandb_kwargs=dict(entity=cfg.RUN.entity, project=cfg.RUN.project))
    logger.info("Run name : %s", run_name)
    logger.info("Devices  : %d x %s", rt.num_devices, jax.devices()[0].platform)

    # ---- data -------------------------------------------------------------
    from studiogan_tpu.data import BasketLoader, Dataset_
    O = cfg.OPTIMIZATION
    hdf5_path = None
    ds_kwargs = dict(
        data_name="SYNTHETIC" if args.synthetic_data else cfg.DATA.name,
        data_dir=cfg.RUN.data_dir, train=True,
        crop_long_edge=cfg.DATA.name not in cfg.MISC.no_proc_data,
        resize_size=cfg.DATA.img_size, resizer=cfg.RUN.pre_resizer,
        num_classes=cfg.DATA.num_classes, img_size=cfg.DATA.img_size,
    )
    train_ds = Dataset_(**ds_kwargs)
    if cfg.RUN.load_train_hdf5:
        from studiogan_tpu.data.hdf5 import make_hdf5
        hdf5_path = make_hdf5(train_ds, cfg.DATA.name, cfg.DATA.img_size,
                              cfg.RUN.pre_resizer,
                              os.path.join(cfg.RUN.save_dir, "hdf5"))
        train_ds = Dataset_(**{**ds_kwargs, "hdf5_path": hdf5_path,
                               "load_data_in_memory": cfg.RUN.load_data_in_memory})
    loader = BasketLoader(
        train_ds, batch_size=rt.local_batch(O.batch_size),
        basket_multiplier=O.d_updates_per_step * O.acml_steps,
        random_flip=cfg.PRE.apply_rflip, seed=seed,
        process_index=rt.process_index, process_count=rt.process_count,
        raw_uint8=True)  # normalize on device: 4x less H2D traffic

    # ---- models + engine ----------------------------------------------------
    from studiogan_tpu.models import build_discriminator, build_generator
    from studiogan_tpu.train import TrainEngine
    from studiogan_tpu.train import ckpt as ckpt_util

    G, D = build_generator(cfg), build_discriminator(cfg)
    eng = TrainEngine(cfg, G, D, unroll_scans=cfg.RUN.unroll_loops)
    state = eng.init_state(jax.random.PRNGKey(seed))
    n_gparams = sum(p.size for p in jax.tree.leaves(state.g_params))
    n_dparams = sum(p.size for p in jax.tree.leaves(state.d_params))
    logger.info("G params: %.2fM  D params: %.2fM",
                n_gparams / 1e6, n_dparams / 1e6)

    ckpt_dir = os.path.join(cfg.RUN.save_dir, "checkpoints", run_name)
    os.makedirs(ckpt_dir, exist_ok=True)
    best_fid, best_step = None, 0
    if cfg.RUN.ckpt_dir:
        import glob as _glob
        path = ckpt_util.find_ckpt(cfg.RUN.ckpt_dir, cfg.RUN.load_best)
        if path:
            state, meta = ckpt_util.load_ckpt(path, state)
            best_fid = meta.get("best_fid")
            best_step = meta.get("best_step", 0)
            logger.info("Resumed from %s at step %d", path, int(state.step))
        elif _glob.glob(os.path.join(cfg.RUN.ckpt_dir, "model=G-*.pth")):
            # a reference PyTorch-StudioGAN checkpoint directory: convert
            import jax.numpy as jnp
            from studiogan_tpu.train.convert import load_reference_checkpoint
            ref = load_reference_checkpoint(cfg.RUN.ckpt_dir, cfg,
                                            cfg.RUN.load_best)
            if "g" in ref:
                state = state.replace(g_params=ref["g"]["params"],
                                      g_state={k: v for k, v in ref["g"].items()
                                               if k != "params"})
            if "d" in ref:
                state = state.replace(d_params=ref["d"]["params"],
                                      d_state={k: v for k, v in ref["d"].items()
                                               if k != "params"})
            if "g_ema" in ref and cfg.MODEL.apply_g_ema:
                state = state.replace(
                    g_ema_params=ref["g_ema"]["params"],
                    g_ema_state={k: v for k, v in ref["g_ema"].items()
                                 if k != "params"})
            meta = ref.get("metadata", {})
            if meta.get("step"):
                state = state.replace(
                    step=jnp.asarray(int(meta["step"]), jnp.int32))
            logger.info("Converted reference checkpoint from %s (step %s); "
                        "optimizer state reinitialized%s",
                        cfg.RUN.ckpt_dir, meta.get("step"),
                        "; missing: " + str(ref.get("g_missing", []) +
                                            ref.get("d_missing", []))[:500]
                        if ref.get("g_missing") or ref.get("d_missing") else "")

    if cfg.RUN.export_pth:
        # write the reference's .pth triplet from the (possibly resumed)
        # state so reference tooling can consume models trained here
        # (reference misc.py:394 naming; train/convert.py exporter)
        from studiogan_tpu.train.convert import save_reference_checkpoint
        paths = save_reference_checkpoint(
            jax.device_get(state), cfg, cfg.RUN.export_pth,
            when="best" if cfg.RUN.load_best else "current",
            run_name=run_name, best_step=best_step, best_fid=best_fid)
        for p in paths:
            logger.info("Exported %s", p)
        return

    # with the default mesh (model_axis=1, no fsdp) every spec is P() ==
    # fully replicated; --model_axis/--fsdp turn this into the dp x tp x
    # ZeRO layout (parallel/mesh.py:Runtime.state_sharding)
    state_sh = rt.state_sharding(state)
    state = jax.device_put(state, state_sh)
    step_fn = jax.jit(eng.train_step, donate_argnums=0,
                      in_shardings=(state_sh, rt.basket, rt.basket),
                      out_shardings=(state_sh, rt.replicated))

    evaluator = None
    if cfg.RUN.eval_metrics and "none" not in cfg.RUN.eval_metrics:
        try:
            from studiogan_tpu.metrics import Evaluator
            evaluator = Evaluator(cfg, rt, eval_dataset_kwargs=ds_kwargs)
        except (NotImplementedError, FileNotFoundError) as e:
            # only the expected "backbone/weights unavailable" failures are
            # tolerated; genuine bugs in the metrics stack must propagate
            logger.warning("Evaluation disabled: %s", e)

    # ---- train loop (reference loader.py:386-432) ---------------------------
    if cfg.RUN.train:
        logger.info("Start training (total_steps=%d)", O.total_steps)
        start = time()
        it = iter(loader)
        metrics = {}
        step0 = int(state.step)
        profile_until = step0 + cfg.RUN.profile if cfg.RUN.profile else -1
        if cfg.RUN.profile:
            jax.profiler.start_trace(os.path.join(cfg.RUN.save_dir, "profile"))
        last_log_t, last_log_step = time(), step0

        # chunked dispatch: print_freq steps per device program (one
        # lax.scan over train_step + ONE host->device basket transfer),
        # amortizing dispatch/transfer latency that a per-step loop pays
        # every step (the reference pays a full worker-loop round trip per
        # step, loader.py:392-398).  save_freq % print_freq == 0 is
        # enforced by the config contract, so save boundaries align.
        chunk = 1 if cfg.RUN.profile else max(1, min(
            cfg.RUN.print_freq, O.total_steps - step0))
        steps_fn = (jax.jit(eng.train_steps, donate_argnums=0,
                            in_shardings=(state_sh, rt.basket_chunk,
                                          rt.basket_chunk),
                            out_shardings=(state_sh, rt.replicated))
                    if chunk > 1 else None)
        from studiogan_tpu.data.pipeline import DevicePrefetcher
        dev_pf = DevicePrefetcher(loader, rt, chunk)
        dev_it = iter(dev_pf)
        # tail / resume-misaligned chunks run a shorter scan: cache one
        # jit wrapper per length n (a fresh jax.jit per occurrence would
        # retrace every time — minutes on the tunneled chip — and omit
        # donation/shardings, transiently doubling state HBM)
        _tail_fns: dict = {}

        def tail_steps_fn(n):
            if n not in _tail_fns:
                _tail_fns[n] = jax.jit(
                    eng.train_steps, donate_argnums=0,
                    in_shardings=(state_sh, rt.basket_chunk,
                                  rt.basket_chunk),
                    out_shardings=(state_sh, rt.replicated))
            return _tail_fns[n]

        cur = step0
        while cur < O.total_steps:
            n = min(chunk, O.total_steps - cur)
            # a resumed/converted checkpoint's step can be ANY integer
            # (reference .pth metadata steps are arbitrary): shorten the
            # first chunk so later boundaries land on print_freq
            # multiples — otherwise cur % print_freq never hits 0 and
            # no logging/saving/eval fires for the whole run
            misalign = (-cur) % cfg.RUN.print_freq
            if chunk > 1 and 0 < misalign < n:
                n = misalign
            if n == chunk and chunk > 1:
                gi, gl = next(dev_it)  # transferred on the prefetch thread
                state, metrics = steps_fn(state, gi, gl)
            elif n > 1:  # tail chunk: shorter scan, compiled once
                baskets = [next(it) for _ in range(n)]
                gi, gl = put_basket(rt, np.stack([b[0] for b in baskets]),
                                    np.stack([b[1] for b in baskets]),
                                    chunked=True)
                state, metrics = tail_steps_fn(n)(state, gi, gl)
            else:
                gi, gl = (next(dev_it) if chunk == 1
                          else put_basket(rt, *next(it)))
                state, metrics = step_fn(state, gi, gl)
            cur += n
            if profile_until >= 0 and cur >= profile_until:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                profile_until = -1
                logger.info("Profiler trace written to %s",
                            os.path.join(cfg.RUN.save_dir, "profile"))
            if cur % cfg.RUN.print_freq == 0:
                # train_steps returns the chunk's FULL per-step metric
                # stack (leading (n,) axis) — write one stats row per
                # step, matching the reference's per-step accumulation
                # (worker.py:686); the single-step path yields scalars
                m = {k: np.atleast_1d(np.asarray(v))
                     for k, v in jax.device_get(metrics).items()}
                nrows = len(next(iter(m.values())))
                now = time()
                imgs_per_sec = ((cur - last_log_step) * O.batch_size
                                * (O.d_updates_per_step * O.acml_steps)
                                / max(now - last_log_t, 1e-9))
                last_log_t, last_log_step = now, cur
                logger.info(log_util.PROGRESS_FORMAT.format(
                    step=cur, progress=cur / O.total_steps,
                    elapsed=misc.elapsed_time(start),
                    gen_loss=float(m["g_loss"][-1]),
                    dis_loss=float(m["d_loss"][-1]))
                    + f"Imgs/sec: {imgs_per_sec:,.0f}")
                for j in range(nrows):
                    row = {k: float(v[j]) for k, v in m.items()}
                    if j == nrows - 1:
                        row["imgs_per_sec"] = imgs_per_sec
                    stats.write(cur - nrows + 1 + j, **row)
                # spectral-norm monitoring (reference worker.py:745-753 /
                # misc.py:285): sigma of every SN'd weight from the
                # persisted u/v power-iteration vectors
                sigmas = {}
                if cfg.MODEL.apply_g_sn and "sn" in state.g_state:
                    sigmas.update(sn_monitor.calculate_all_sn(
                        state.g_params, state.g_state["sn"], prefix="Gen/"))
                if cfg.MODEL.apply_d_sn and "sn" in state.d_state:
                    sigmas.update(sn_monitor.calculate_all_sn(
                        state.d_params, state.d_state["sn"], prefix="Dis/"))
                if sigmas:
                    stats.write(cur, **sigmas)
            if cur % cfg.RUN.save_freq == 0:
                if cfg.RUN.vis_fake_images:
                    fakes, flabels = eng.generate(
                        state, jax.random.PRNGKey(cur), min(64, O.batch_size))
                    fakes_np = np.asarray(jax.device_get(fakes))
                    misc.save_image_grid(
                        fakes_np,
                        os.path.join(cfg.RUN.save_dir, "figures", run_name,
                                     f"generated_canvas_{cur}.png"))
                    stats.log_image(cur, fakes_np)  # reference worker.py:798
                if evaluator is not None:
                    scores = evaluator.evaluate(eng, state, cfg.RUN.eval_metrics)
                    logger.info("Eval @%d: %s", cur, json.dumps(scores))
                    stats.write(cur, **scores)
                    if "fid" in scores and (best_fid is None or scores["fid"] < best_fid):
                        best_fid, best_step = scores["fid"], cur
                        ckpt_util.save_ckpt(ckpt_dir, state, dict(
                            seed=seed, run_name=run_name, best_fid=best_fid,
                            best_step=best_step), when="best",
                            async_save=cfg.RUN.async_ckpt)
                ckpt_util.save_ckpt(ckpt_dir, state, dict(
                    seed=seed, run_name=run_name, best_fid=best_fid,
                    best_step=best_step), when="current",
                    async_save=cfg.RUN.async_ckpt)
        logger.info("Training done: %s", misc.elapsed_time(start))
        # join in-flight async writers first: the final sync save may
        # target the same step/path as the last in-loop async save
        ckpt_util.wait_for_pending_saves()
        ckpt_util.save_ckpt(ckpt_dir, state, dict(
            seed=seed, run_name=run_name, best_fid=best_fid,
            best_step=best_step), when="current")
        dev_pf.close()
        loader.close()
        curve = stats.plot_curves(os.path.join(
            cfg.RUN.save_dir, "figures", run_name, "train_curves.png"))
        if curve:
            logger.info("Training curves: %s", curve)

    # ---- post-training actions (reference loader.py:437-512) ---------------
    std_state = None
    if cfg.RUN.standing_statistics:
        logger.info("Accumulating standing BN statistics "
                    "(max_batch=%d, steps=%d)", cfg.RUN.standing_max_batch,
                    cfg.RUN.standing_step)
        std_state = eng.prepare_standing_state(state, jax.random.PRNGKey(seed))

    analyses_requested = any([
        cfg.RUN.k_nearest_neighbor, cfg.RUN.interpolation,
        cfg.RUN.frequency_analysis, cfg.RUN.tsne_analysis,
        cfg.RUN.intra_class_fid, cfg.RUN.semantic_factorization,
        cfg.RUN.GAN_train, cfg.RUN.GAN_test])
    if analyses_requested:
        from studiogan_tpu import analysis
        fig_dir = cfg.RUN.save_dir
        if cfg.RUN.interpolation:
            for fix_z in (False, True):
                p = analysis.run_linear_interpolation(
                    eng, state, fig_dir, run_name, fix_z=fix_z)
                logger.info("Interpolation canvas: %s", p)
        if cfg.RUN.semantic_factorization:
            ps = analysis.run_semantic_factorization(
                eng, state, fig_dir, run_name,
                num_semantic_axis=max(cfg.RUN.num_semantic_axis, 1),
                maximum_variations=max(cfg.RUN.maximum_variations, 1.0))
            logger.info("SeFa canvases: %d written", len(ps))
        if cfg.RUN.frequency_analysis:
            p = analysis.run_frequency_analysis(eng, state, train_ds,
                                                fig_dir, run_name)
            logger.info("Frequency analysis: %s", p)
        if cfg.RUN.tsne_analysis:
            p = analysis.run_tsne(eng, state, train_ds, fig_dir, run_name)
            logger.info("t-SNE: %s", p)
        if evaluator is not None and cfg.RUN.k_nearest_neighbor:
            p = analysis.run_k_nearest_neighbor(
                eng, state, evaluator.eval_model, train_ds, fig_dir, run_name)
            logger.info("kNN canvas: %s", p)
        if evaluator is not None and cfg.RUN.intra_class_fid:
            ifids = analysis.calculate_intra_class_fid(
                eng, state, evaluator.eval_model, train_ds, fig_dir)
            # same honest-eval guardrail as Evaluator.evaluate: random
            # backbone weights make these numbers incomparable
            tag = ("" if not evaluator.eval_model.random_weights
                   or os.environ.get("STUDIOGAN_ALLOW_RANDOM_BACKBONE")
                   else " [RANDOM_BACKBONE — not comparable]")
            logger.info("Intra-class FID%s: %s", tag, json.dumps(
                {str(k): round(v, 3) for k, v in ifids.items()}))
        if cfg.RUN.GAN_train or cfg.RUN.GAN_test:
            from studiogan_tpu.analysis.cas import compute_cas
            setting = cfg.MISC.cas_setting.get(
                cfg.DATA.name, cfg.MISC.cas_setting["CIFAR10"])
            valid_ds = Dataset_(**{**ds_kwargs, "train": False})
            cas = compute_cas(eng, state, train_ds, valid_ds, setting,
                              GAN_train=cfg.RUN.GAN_train,
                              GAN_test=cfg.RUN.GAN_test, logger=logger,
                              ckpt_dir=ckpt_dir,
                              resume=cfg.RUN.resume_classifier_train)
            logger.info("CAS (%s): %s",
                        "GAN_train" if cfg.RUN.GAN_train else "GAN_test",
                        json.dumps(cas))

    if cfg.RUN.save_real_images:
        n = min(64, len(train_ds))
        reals = np.stack([train_ds[i][0] for i in range(n)])
        misc.save_images_png(
            reals.astype(np.float32) / 127.5 - 1.0,
            np.asarray([train_ds[i][1] for i in range(n)]),
            os.path.join(cfg.RUN.save_dir, "samples", run_name),
            is_generate=False)
    if cfg.RUN.save_fake_images:
        fakes, flabels = eng.generate(state, jax.random.PRNGKey(0),
                                      min(64, O.batch_size))
        misc.save_images_png(np.asarray(jax.device_get(fakes)),
                             np.asarray(jax.device_get(flabels)),
                             os.path.join(cfg.RUN.save_dir, "samples", run_name))
    if cfg.RUN.vis_fake_images:
        fakes, _ = eng.generate(state, jax.random.PRNGKey(0),
                                min(64, O.batch_size))
        misc.save_image_grid(np.asarray(jax.device_get(fakes)),
                             os.path.join(cfg.RUN.save_dir, "figures", run_name,
                                          "generated_canvas.png"))
    if evaluator is not None and cfg.RUN.calc_is_ref_dataset:
        score, std = evaluator.ref_dataset_is()
        logger.info("IS of %s dataset: %.4f +- %.4f",
                    cfg.RUN.ref_dataset, score, std)
    if evaluator is not None and not cfg.RUN.train and \
            "none" not in cfg.RUN.eval_metrics:
        for _ in range(cfg.RUN.num_eval):
            scores = evaluator.evaluate(eng, state, cfg.RUN.eval_metrics,
                                        override_g_state=std_state)
            logger.info("Eval: %s", json.dumps(scores))
    return state


if __name__ == "__main__":
    run()
