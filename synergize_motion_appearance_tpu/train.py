"""Training entry point (parity target: basicsr/train.py:116-227).

`python -m synergize_motion_appearance_tpu.train -opt options/train.yml`

Replaces torch.distributed.launch + DDP with: optional
jax.distributed.initialize (multi-host), a 1-D data mesh, per-host
EnlargedSampler shards, and ONE jitted train step (see training/trainer.py).
"""
from __future__ import annotations

import argparse
import os
import time
from os import path as osp


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True,
                        help="Path to option YAML file.")
    parser.add_argument("--launcher", choices=["none", "jax", "slurm"],
                        default="none",
                        help="multi-host launcher (reference train.py:32 "
                             "offers pytorch/slurm; 'jax' = generic env "
                             "rendezvous, 'slurm' = SLURM_PROCID/scontrol "
                             "derivation like dist_util.py:28-57)")
    parser.add_argument("--steps", type=int, default=None,
                        help="override total_iter (smoke runs)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from .data import (BatchLoader, EnlargedSampler, build_dataset,
                       infinite_batches)
    from .parallel import (create_mesh, init_distributed, is_master,
                           replicate, shard_batch)
    from .training import Trainer
    from .training.checkpoint import (latest_checkpoint, restore_checkpoint,
                                      save_checkpoint)
    from .utils.logger import (MessageLogger, get_env_info, get_root_logger,
                               init_tb_logger, init_wandb_logger)
    from .utils.options import dict2str, make_exp_dirs, parse

    if args.launcher == "jax":
        init_distributed()
    elif args.launcher == "slurm":
        init_distributed(launcher="slurm")

    opt = parse(args.opt, is_train=True)
    if args.steps is not None:
        opt["train"]["total_iter"] = args.steps
    make_exp_dirs(opt)
    logger = get_root_logger(
        log_file=osp.join(opt["path"]["log"], "train.log")
    )
    logger.info(get_env_info())
    logger.info(dict2str(opt))
    tb_logger = None
    if opt.get("logger", {}).get("use_tb_logger") and is_master():
        # wandb first so its tensorboard-sync hook sees the writer
        # (train.py:66-68 ordering in the reference)
        init_wandb_logger(opt)
        tb_logger = init_tb_logger(osp.join(opt["path"]["log"], "tb_logger"))

    seed = opt.get("manual_seed", 0)
    np.random.seed(seed + jax.process_index())

    # ---- data ----
    ds_opt = opt["datasets"]["train"]
    ds_opt["is_train"] = True
    dataset = build_dataset(ds_opt)
    per_host_batch = int(ds_opt.get("batch_size_per_gpu", 4)) * \
        jax.local_device_count()
    if ds_opt.get("native_cache"):
        # C++ framecache loader: mmapped decoded frames, sampling +
        # aug + normalize in worker threads off the GIL (native/)
        batches = _native_batches(ds_opt, per_host_batch, len(dataset),
                                  seed, logger)
    else:
        sampler = EnlargedSampler(
            len(dataset), jax.process_count(), jax.process_index(),
            ratio=int(ds_opt.get("dataset_enlarge_ratio", 1)),
        )
        loader = BatchLoader(
            dataset, per_host_batch, sampler,
            num_workers=int(ds_opt.get("num_worker_per_gpu", 4)),
        )
        batches = infinite_batches(loader)
    logger.info(
        f"Dataset {ds_opt.get('name')}: {len(dataset)} videos, "
        f"{per_host_batch} samples/host/step, "
        f"{jax.process_count()} hosts."
    )

    # ---- model / state ----
    trainer = Trainer(opt)
    mesh = create_mesh(("data",))
    epoch0, first_batch = next(batches)
    first_batch = shard_batch(first_batch, mesh)
    state, vgg_params = trainer.init_state(
        jax.random.PRNGKey(seed), first_batch
    )
    state = replicate(state, mesh)
    vgg_params = replicate(vgg_params, mesh)

    start_epoch, start_iter = 0, 0
    ckpt_dir = opt["path"]["training_states"]
    resume = opt["path"].get("resume_state") or latest_checkpoint(ckpt_dir)
    if resume:
        state, start_epoch = restore_checkpoint(resume, state)
        state = replicate(state, mesh)
        start_iter = int(state.step)
        logger.info(f"Resumed from {resume} @ iter {start_iter}")

    train_step = jax.jit(trainer.make_train_step(), donate_argnums=(0,))
    total_iter = int(opt["train"]["total_iter"])
    msg_logger = MessageLogger(opt, start_iter, tb_logger)
    print_freq = opt.get("logger", {}).get("print_freq", 100)
    save_freq = int(opt.get("logger", {}).get("save_checkpoint_freq", 5e3))
    rng = jax.random.PRNGKey(seed + 1000)

    val_state = _build_val_state(opt)

    logger.info(f"Start training from iter {start_iter}")
    data_t = iter_t = time.time()
    current_iter = start_iter
    epoch = epoch0
    batch = first_batch if start_iter == 0 else None
    while current_iter < total_iter:
        if batch is None:
            epoch, batch = next(batches)
            batch = shard_batch(batch, mesh)
        data_time = time.time() - data_t

        step_rng = jax.random.fold_in(rng, current_iter)
        state, logs = train_step(state, batch, step_rng, vgg_params)
        batch = None
        current_iter += 1

        if current_iter % print_freq == 0:
            logs = {k: float(v) for k, v in jax.device_get(logs).items()}
            logs.update({
                "iter": current_iter,
                "epoch": epoch,
                "lrs": [float(trainer.lr_g(current_iter))],
                "time": time.time() - iter_t,
                "data_time": data_time,
            })
            msg_logger(logs)
        iter_t = time.time()

        if current_iter % save_freq == 0 or current_iter == total_iter:
            logger.info(f"Saving checkpoint @ iter {current_iter}")
            save_checkpoint(ckpt_dir, jax.device_get(state), epoch)

        if val_state is not None and current_iter % val_state["freq"] == 0:
            _run_validation(opt, trainer, state, val_state, current_iter,
                            tb_logger, logger)
        data_t = time.time()

    logger.info("Training done.")


def _native_batches(ds_opt, per_host_batch, n_videos, seed, logger):
    """(epoch, batch) stream from the C++ framecache loader — the
    native-path equivalent of infinite_batches(BatchLoader). Builds the
    cache from the frame tree on first use. Epochs are derived from
    consumed samples with the same EnlargedSampler virtual length
    (n_videos × dataset_enlarge_ratio / world_size)."""
    import subprocess
    import sys as _sys

    import jax

    from .data.native_loader import NativeFrameCacheLoader

    cache = ds_opt["native_cache"]
    if not osp.exists(cache):
        root = osp.join(ds_opt["root_dir"], "train")
        if not osp.isdir(root):
            root = ds_opt["root_dir"]
        logger.info(f"Building framecache {cache} from {root} ...")
        tool = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                        "tools", "build_framecache.py")
        subprocess.run(
            [_sys.executable, tool, "--root", root, "--dst", cache,
             "--size", str(ds_opt.get("gt_size", 256))], check=True)
    loader = NativeFrameCacheLoader(
        cache, per_host_batch,
        num_workers=int(ds_opt.get("num_worker_per_gpu", 4)),
        seed=seed + jax.process_index(),
        hflip=bool(ds_opt.get("use_hflip", True)),
        time_flip=bool(ds_opt.get("use_time_flip", True)),
    )
    ratio = int(ds_opt.get("dataset_enlarge_ratio", 1))
    epoch_len = max(
        n_videos * ratio // (per_host_batch * jax.process_count()), 1)

    def gen():
        step = 0
        while True:
            yield step // epoch_len, loader.next()
            step += 1

    return gen()


def _build_val_state(opt):
    """Lazy bundle for in-training validation (train.py:209-211 /
    nondist_validation, appmotioncomp_model.py:463-570). Returns None
    when no val dataset or the freq is effectively off."""
    val_opt = opt.get("val") or {}
    ds_opt = (opt.get("datasets") or {}).get("val")
    freq = float(val_opt.get("val_freq", 0) or 0)
    total = float(opt.get("train", {}).get("total_iter", 0))
    if not ds_opt or freq <= 0 or freq > total:
        return None
    from .data import build_dataset

    ds_opt = dict(ds_opt)
    ds_opt["is_train"] = False
    return {
        "freq": int(freq),
        "dataset": build_dataset(ds_opt),
        "metrics": val_opt.get("metrics") or {},
        "max_items": int(val_opt.get("max_items", 32)),
        "fwd": None,
    }


def _run_validation(opt, trainer, state, val_state, current_iter,
                    tb_logger, logger):
    """EMA-params inference over the val set on rank 0 (dist validation
    gating, appmotioncomp_model.py:458-460). Per-image PSNR/SSIM/L1
    accumulate directly; directory-level metrics (fid, lpips — the native
    on-TPU battery) score the saved result/gt PNG dirs exactly like the
    reference's end-of-validation dispatch
    (appmotioncomp_model.py:490-568)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .metrics import calculate_metric
    from .parallel import is_master
    from .utils.img_util import arr2img, imwrite

    if not is_master():
        return
    if val_state["fwd"] is None:
        def fwd(g_params, m_vars, source, driving):
            dm = trainer.motion_estimator.apply(
                m_vars, driving, source, train=False)
            out = trainer.net_g.apply({"params": g_params}, source, dm,
                                      inference=True)
            return out["out"]

        val_state["fwd"] = jax.jit(fwd)

    m_vars = {"params": state.params_m, "batch_stats": state.stats_m}
    g_params = state.ema_g if state.ema_g is not None else state.params_g
    dataset = val_state["dataset"]
    metrics = val_state["metrics"]
    dir_metrics = {m: o for m, o in metrics.items()
                   if m in ("fid", "lpips", "akd", "aed", "id_similarity",
                            "pose")}
    results = {m: 0.0 for m in metrics}
    n = min(len(dataset), val_state["max_items"])
    vis_root = osp.join(opt["path"].get("visualization",
                                        opt["path"]["log"]),
                        f"val_{current_iter}")
    res_dir, gt_dir = osp.join(vis_root, "result"), osp.join(vis_root, "gt")
    for idx in range(n):
        item = dataset[idx]
        out = np.asarray(val_state["fwd"](
            g_params, m_vars,
            jnp.asarray(item["source"])[None],
            jnp.asarray(item["driving"])[None],
        ))
        result_img = arr2img(out, rgb2bgr=True)
        gt_img = arr2img(item["driving"], rgb2bgr=True)
        if dir_metrics:
            imwrite(result_img, osp.join(res_dir, f"{idx:05d}.png"))
            imwrite(gt_img, osp.join(gt_dir, f"{idx:05d}.png"))
        for mname, mopt in metrics.items():
            if mname in ("psnr", "ssim", "l1"):
                results[mname] += calculate_metric(
                    dict(img1=result_img, img2=gt_img), mopt)
    for mname, mopt in dir_metrics.items():
        mopt = dict(mopt)
        mtype = mopt.get("type", f"calculate_{mname}")
        try:
            if mname == "fid":
                data = dict(paths=[gt_dir, res_dir])
            elif mname == "lpips":
                data = dict(path1=res_dir, path2=gt_dir)
            else:  # akd/aed/id_similarity/pose: (gt, generated) dirs
                data = dict(path_gt=gt_dir, path_generated=res_dir)
            results[mname] = calculate_metric(data, dict(mopt, type=mtype))
        except RuntimeError as e:  # absent third-party weights/deps
            logger.warning(f"Validation metric {mname} skipped: {e}")
            results.pop(mname, None)
    for mname in list(results):
        if mname in ("psnr", "ssim", "l1"):
            results[mname] /= max(n, 1)
        logger.info(f"Validation @ {current_iter} # {mname}: "
                    f"{results[mname]:.4f}")
        if tb_logger is not None:
            tb_logger.add_scalar(f"metrics/{mname}", results[mname],
                                 current_iter)
    if tb_logger is not None:
        tb_logger.close()


if __name__ == "__main__":
    main()
