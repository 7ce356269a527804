"""Training runtime: one pjit-compiled step for the full G + D alternation.

Parity target: models/appmotioncomp_model.py:108-434 (AppMotionCompModel's
init_training_settings / optimize_parameters) and models/base_model.py
(EMA :51-58, optimizers, reduce_loss_dict :298-323).

TPU-native design (SURVEY.md section 7):
  * The entire optimize_parameters body — motion forward, generator
    forward, 10-term loss assembly, adaptive GAN weighting, G update, EMA,
    D update — is ONE jitted function over a `data`-sharded batch. XLA
    inserts the gradient all-reduce; loss scalars come out globally
    averaged, replacing reduce_loss_dict.
  * The adaptive discriminator weight (two autograd.grad probes wrt the
    final conv weight, appmotioncomp_model.py:222-228) becomes two
    jax.grad probes through ONLY the final conv + loss heads, using the
    saved pre-final activation — no second full forward/backward.
  * D-phase gating (iter > net_d_start_iter, :414) is a tree-select
    between updated and previous (params, opt_state, stats), keeping Adam
    step counts exactly aligned with the reference's delayed start.
  * torch's .detach() points map to stop_gradient (out['out'] into the D
    phase, commit-loss targets inside the model, probe activations).
"""
from __future__ import annotations

import functools
import os
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax
import optax

from ..losses.losses import (
    EquivarianceLoss,
    GANLoss,
    KPDistanceLoss,
    L1Loss,
    MultiScalePyramidPerceptualLoss,
)
from ..models import build_network
from ..models.vgg import VGG19Features
from ..utils.env import env_flag_default
from ..ops import grid_sample, make_coordinate_grid, sample_random_tps
from ..ops.tps import tps_warp_frame_grid

sg = jax.lax.stop_gradient


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params_g: Any
    params_m: Any
    params_d: Any
    stats_m: Any
    stats_d: Any
    ema_g: Any
    opt_g: Any
    opt_m: Any
    opt_d: Any


def multistep_lr(base_lr: float, milestones, gamma: float = 0.5):
    """MultiStepLR (models/lr_scheduler.py:6-33) as an optax schedule."""
    milestones = sorted(milestones)

    def schedule(count):
        factor = jnp.ones((), jnp.float32)
        for m in milestones:
            factor = factor * jnp.where(count >= m, gamma, 1.0)
        return base_lr * factor

    return schedule


def multistep_restart_lr(base_lr: float, milestones, gamma: float = 0.1,
                         restarts=(0,), restart_weights=(1,)):
    """MultiStepRestartLR (models/lr_scheduler.py:6-33): at each restart
    iteration the lr resets to base*weight (prior gamma steps are
    forgotten); milestones after the last restart multiply by gamma."""
    milestones = sorted(milestones)
    restarts = list(restarts)
    restart_weights = list(restart_weights)
    assert len(restarts) == len(restart_weights), \
        "restarts and their weights do not match."

    def schedule(count):
        count = jnp.asarray(count)
        w = jnp.ones((), jnp.float32)
        last = jnp.zeros((), count.dtype)
        for r, rw in zip(restarts, restart_weights):
            hit = count >= r
            w = jnp.where(hit, jnp.float32(rw), w)
            last = jnp.where(hit, jnp.asarray(r, count.dtype), last)
        factor = jnp.ones((), jnp.float32)
        for m in milestones:
            factor = factor * jnp.where(
                (jnp.asarray(m, count.dtype) > last) & (count >= m),
                jnp.float32(gamma), 1.0)
        return base_lr * w * factor

    return schedule


def cosine_annealing_restart_lr(base_lr: float, periods,
                                restart_weights=None, eta_min: float = 0.0):
    """CosineAnnealingRestartLR (models/lr_scheduler.py:57-96): cosine
    decay within each period, scaled by the period's restart weight."""
    periods = list(periods)
    restart_weights = list(restart_weights or [1.0] * len(periods))
    assert len(periods) == len(restart_weights)
    cum = [0]
    for p in periods:
        cum.append(cum[-1] + p)

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        lr = jnp.asarray(base_lr, jnp.float32)
        for i, period in enumerate(periods):
            start, end = cum[i], cum[i + 1]
            in_period = (count >= start) & (count < end)
            t = (count - start) / period
            val = eta_min + restart_weights[i] * 0.5 * (
                base_lr - eta_min
            ) * (1 + jnp.cos(jnp.pi * t))
            lr = jnp.where(in_period, val, lr)
        return lr

    return schedule


def _make_optimizer(opt_cfg: Dict[str, Any], sched_cfg: Dict[str, Any],
                    warmup_iter: int = -1):
    """Returns (gradient transform, lr schedule over the GLOBAL step).

    The lr is applied manually from the global iteration count so that all
    three schedulers step per-iteration like the reference
    (base_model.py:144-165), even though the D optimizer only starts
    applying updates after net_d_start_iter. warmup_iter > 0 scales the
    schedule linearly up from 0 (base_model.py:152-161)."""
    lr = float(opt_cfg.get("lr", 8e-5))
    betas = opt_cfg.get("betas", [0.9, 0.99])
    wd = float(opt_cfg.get("weight_decay", 0.0))
    if sched_cfg and sched_cfg.get("type") == "MultiStepLR":
        schedule = multistep_lr(lr, sched_cfg.get("milestones", []),
                                float(sched_cfg.get("gamma", 0.5)))
    elif sched_cfg and sched_cfg.get("type") == "MultiStepRestartLR":
        schedule = multistep_restart_lr(
            lr, sched_cfg.get("milestones", []),
            float(sched_cfg.get("gamma", 0.1)),
            sched_cfg.get("restarts", (0,)),
            sched_cfg.get("restart_weights", (1,)),
        )
    elif sched_cfg and sched_cfg.get("type") == "CosineAnnealingRestartLR":
        schedule = cosine_annealing_restart_lr(
            lr, sched_cfg.get("periods", []),
            sched_cfg.get("restart_weights"),
            float(sched_cfg.get("eta_min", 0.0)),
        )
    else:
        schedule = lambda step: jnp.asarray(lr, jnp.float32)
    if warmup_iter > 0:
        base_schedule = schedule
        schedule = lambda step: base_schedule(step) * jnp.minimum(
            jnp.asarray(step, jnp.float32) / warmup_iter, 1.0)
    tx = optax.scale_by_adam(b1=betas[0], b2=betas[1])
    if wd > 0:
        tx = optax.chain(tx, optax.add_decayed_weights(wd))
    return tx, schedule


def _tree_select(flag, new, old):
    """flag ? new : old over a pytree (flag is a traced scalar bool)."""
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(flag, n, o) if n.shape == o.shape else n,
        new, old,
    )


def _final_conv_leaf_path(params_g):
    """Locate the final generator conv kernel/bias (the adaptive-weight
    leaf when fix_generator=False — appmotioncomp_model.py:334)."""
    gen_names = sorted(
        (k for k in params_g if k.startswith("generator_blocks_")),
        key=lambda s: int(s.rsplit("_", 1)[1]),
    )
    last = gen_names[-1]
    leaf = params_g[last]["conv"]["Conv_0"]
    return last, leaf["kernel"], leaf["bias"]


class Trainer:
    """Builds networks/losses from a reference-style YAML option dict and
    exposes `init_state` + a jittable `train_step`."""

    def __init__(self, opt: Dict[str, Any]):
        self.opt = opt
        self.net_g = build_network(opt["network_g"])
        self.motion_estimator = build_network(opt["network_motion_estimator"])
        self.net_d = build_network(opt["network_d"])
        self.vgg = VGG19Features()

        t = opt["train"]
        self.cri_pix = L1Loss(**_strip(t.get("pixel_opt"))) if t.get(
            "pixel_opt") else None
        if t.get("perceptual_opt"):
            p = _strip(t["perceptual_opt"])
            self.cri_perceptual = MultiScalePyramidPerceptualLoss(
                vgg_apply=lambda params, x: self.vgg.apply(
                    {"params": params}, x
                ),
                scales=p.get("scales", (1, 0.5, 0.25, 0.125)),
                loss_weights=p.get("loss_weights", (1.0,) * 5),
            )
        else:
            self.cri_perceptual = None
        self.cri_gan = GANLoss(**_strip(t.get("gan_opt"))) if t.get(
            "gan_opt") else None
        self.w_motion_code = float(
            t.get("motion_codebook_code_opt", {}).get("loss_weight", 1.0)
        )
        self.cri_motion_recon = L1Loss(
            **_strip(t.get("motion_codebook_recon_opt"))
        ) if t.get("motion_codebook_recon_opt") else None
        self.w_app_code = float(
            t.get("app_codebook_code_opt", {}).get("loss_weight", 1.0)
        )
        self.w_lr_list = list(
            t.get("lr_pixel_perceptual_opt", {}).get("loss_weight", [])
        )
        self.cri_equivariance = EquivarianceLoss(
            **_strip(t.get("equivariance_opt"))
        ) if t.get("equivariance_opt") else None
        self.cri_kp_distance = KPDistanceLoss(
            **_strip(t.get("kp_distance_opt"))
        ) if t.get("kp_distance_opt") else None

        # rematerialization: recompute the generator forward and VGG
        # features in the backward pass instead of storing activations
        # (SURVEY.md: trade FLOPs for HBM). Without it the flagship 256²
        # step at batch 4/chip overflows a v5e's 16G HBM by ~0.5G.
        # remat: true  -> full checkpoint (recompute everything)
        # remat: false -> store all activations (fastest when they fit)
        # remat: selective -> keep conv/matmul outputs resident (the
        #   expensive recomputes), recompute only elementwise/norm ops
        #   between them — near remat-off speed at a fraction of the
        #   activation memory (docs/PERF.md §10)
        r = t.get("remat", True)
        self.remat = r if r == "selective" else bool(r)
        self.remat_policy = None
        if self.remat == "selective":
            # "warp_corners" keeps the packed corner gathers resident so
            # the warp backward reuses them instead of re-packing +
            # re-gathering the skip features (b8 chained step 567 vs
            # 588 ms — docs/PERF.md §14). SAMT_WARP_RESIDENT=0 reverts
            # (isolation experiments).
            names = ["conv_out", "dense_out"]
            if env_flag_default("SAMT_WARP_RESIDENT", True):
                names.append("warp_corners")
            # "wl_edge" keeps the WL region-boundary transposes resident.
            # Measured NEUTRAL at b8-selective once the name was scoped
            # to the true region boundaries (563 vs 563 chained,
            # docs/PERF.md §18) — default off; SAMT_WL_EDGE=1 re-enables
            # for experiments.
            if env_flag_default("SAMT_WL_EDGE", False):
                names.append("wl_edge")
            self.remat_policy = jax.checkpoint_policies.save_only_these_names(
                *names)
        # opt-in mixed precision: run the generator forward and the VGG
        # pyramid loss in bf16 (f32 master params/optimizer/losses; the
        # cast is inside the grad so gradients land in f32). Motion
        # estimator (batch-norm) and discriminator stay f32. Default off
        # = exact reference numerics.
        cd = t.get("compute_dtype")
        self.compute_dtype = jnp.bfloat16 if cd in ("bfloat16", "bf16") \
            else None
        self.scale_adaptive_gan_weight = float(
            t.get("scale_adaptive_gan_weight", 0.8)
        )
        self.net_d_start_iter = int(t.get("net_d_start_iter", 0))
        self.net_g_start_iter = int(t.get("net_g_start_iter", 0))
        self.ema_decay = float(t.get("ema_decay", 0))
        self.use_adaptive_weight = bool(t.get("use_adaptive_weight", True))
        self.total_iter = int(t.get("total_iter", 250000))
        sched = t.get("scheduler", {})
        warmup = int(t.get("warmup_iter", -1))
        self.tx_g, self.lr_g = _make_optimizer(t["optim_g"], sched, warmup)
        self.tx_m, self.lr_m = _make_optimizer(
            t.get("optim_motion", t["optim_g"]), sched, warmup
        )
        self.tx_d, self.lr_d = _make_optimizer(t["optim_d"], sched, warmup)

    # ------------------------------------------------------------------
    def init_state(self, rng, sample_batch) -> Tuple[TrainState, Any]:
        source = sample_batch["source"]
        gt = sample_batch["driving"]
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        # jit the init path: eager per-op dispatch is pathological on
        # remote-TPU links and slow everywhere
        vars_m = jax.jit(self.motion_estimator.init)(k1, gt, source)
        dense_motion = jax.jit(self.motion_estimator.apply)(
            vars_m, gt, source
        )
        vars_g = jax.jit(
            lambda k, s, dm, g: self.net_g.init(k, s, dm, gt=g)
        )(k2, source, dense_motion, gt)
        vars_d = jax.jit(self.net_d.init)(k3, gt)
        vgg_params = jax.jit(self.vgg.init)(k4, gt)["params"]
        # pretrained VGG19 for the perceptual pyramid (the reference
        # downloads torchvision weights at loss init, vgg_arch.py; here
        # train.vgg_weights points at a converted npz —
        # tools/convert_vgg_weights.py / docs/RELEASE_WEIGHTS.md)
        vgg_path = (self.opt.get("train", {}) or {}).get("vgg_weights")
        if vgg_path:
            from .checkpoint import load_variables

            loaded = load_variables(str(vgg_path))["params"]
            ref = jax.tree_util.tree_structure(vgg_params)
            got = jax.tree_util.tree_structure(loaded)
            if ref != got:
                raise ValueError(
                    f"train.vgg_weights={vgg_path}: param tree does not "
                    f"match VGG19Features (expected {ref}, got {got})")
            vgg_params = jax.tree_util.tree_map(
                lambda a, b: jnp.asarray(b, a.dtype), vgg_params, loaded)

        params_g = vars_g["params"]
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params_g=params_g,
            params_m=vars_m["params"],
            params_d=vars_d["params"],
            stats_m=vars_m.get("batch_stats", {}),
            stats_d=vars_d.get("batch_stats", {}),
            ema_g=jax.tree_util.tree_map(jnp.copy, params_g),
            opt_g=self.tx_g.init(params_g),
            opt_m=self.tx_m.init(vars_m["params"]),
            opt_d=self.tx_d.init(vars_d["params"]),
        )
        return state, vgg_params

    # ------------------------------------------------------------------
    def _probe_d_weight(self, params_g, pre_final, gt, fake_stats_ctx,
                        vgg_params, gt_feats=None):
        """Adaptive GAN weight via grad probes on the final conv kernel
        (appmotioncomp_model.py:222-228, 325-345). `pre_final` is the
        activation entering the final RGB conv; gradients wrt other params
        don't affect the ratio, exactly like torch's autograd.grad on the
        single leaf."""
        _, kernel, bias = _final_conv_leaf_path(params_g)
        # the probe only feeds a scale-free norm RATIO, so it runs in the
        # step's compute dtype (f32 probe VGG was ~a full extra f32
        # pyramid per step; the ratio is robust in bf16 — validated by
        # the bf16-tracks-f32 convergence test)
        cdt = self.compute_dtype
        cast = (lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(cdt) if hasattr(a, "astype") and
            jnp.issubdtype(a.dtype, jnp.floating) else a, t)) \
            if cdt is not None else (lambda t: t)
        h = cast(sg(pre_final))
        gt_c = cast(sg(gt))
        kernel = cast(kernel)
        bias_c = cast(bias)
        params_d, stats_d = fake_stats_ctx
        vgg_p = cast(vgg_params)

        kh, kw, cin, cout = kernel.shape

        def out_from(kern):
            # shift+matmul form: the raw C_out=3 conv (and its C=3
            # filter-grad) hit the pathological small-channel emitters
            # (docs/PERF.md §8) — same rewrite as layers._ShiftMatmulConv
            hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
            H, W = h.shape[1], h.shape[2]
            patches = jnp.concatenate(
                [hp[:, i:i + H, j:j + W, :]
                 for i in range(kh) for j in range(kw)], axis=-1)
            return jnp.matmul(
                patches, kern.reshape(kh * kw * cin, cout),
                precision=jax.lax.Precision.HIGHEST) + bias_c

        def recon_probe(kern):
            o = out_from(kern)
            r = 0.0
            if self.cri_perceptual is not None:
                if gt_feats is not None:
                    # share the per-step gt VGG pyramid (already cast +
                    # stop_gradient'd) instead of recomputing it here —
                    # the probe only needs grads wrt `kern`, and the
                    # target branch contributes none
                    r = r + self.cri_perceptual.from_target_feats(
                        vgg_p, o, gt_feats)
                else:
                    r = r + self.cri_perceptual(vgg_p, o, gt_c)
            if self.cri_pix is not None:
                r = r + self.cri_pix(o, gt_c)
            return r

        def gan_probe(kern):
            o = out_from(kern)
            pred = self.net_d.apply(
                {"params": cast(sg(params_d)),
                 "batch_stats": cast(sg(stats_d))},
                o, train=True, mutable=["batch_stats"],
            )[0]
            return self.cri_gan(pred, True, is_disc=False)

        g_recon = jax.grad(recon_probe)(kernel)
        g_gan = jax.grad(gan_probe)(kernel)
        norm = lambda g: jnp.sqrt(jnp.sum(g.astype(jnp.float32) ** 2))
        d_weight = norm(g_recon) / (norm(g_gan) + 1e-4)
        return sg(jnp.clip(d_weight, 0.0, 1.0))

    # ------------------------------------------------------------------
    def make_train_step(self) -> Callable:
        """Returns train_step(state, batch, rng, vgg_params) -> (state, logs).
        Jit/pjit this once; batch is sharded on the data axis."""

        def train_step(state: TrainState, batch, rng, vgg_params):
            from ..models.layers import cout_shift_convs

            with cout_shift_convs():
                return self._train_step_body(state, batch, rng, vgg_params)

        self._train_step_body = self._make_train_step_body()
        return train_step

    def _make_train_step_body(self) -> Callable:
        def train_step(state: TrainState, batch, rng, vgg_params):
            source = batch["source"]
            gt = batch["driving"]
            B, H, W, _ = gt.shape
            step = state.step
            d_on = step > self.net_d_start_iter  # (:325, :414)
            g_on = step >= self.net_g_start_iter

            rng_tps = jax.random.fold_in(rng, 0)

            cdt = self.compute_dtype

            def _cast(tree, dt):
                return jax.tree_util.tree_map(
                    lambda a: a.astype(dt)
                    if hasattr(a, "astype") and jnp.issubdtype(
                        a.dtype, jnp.floating) else a,
                    tree,
                )

            # SAMT_D_BF16=1: run the discriminator in bf16 (params +
            # images cast inside the grad; BN running stats stay f32 in
            # the state — the bf16 batch-stat updates are cast back).
            # EXPERIMENT flag for the b8 <500 ms hunt; default off =
            # exact f32 D (reference numerics).
            ddt = jnp.bfloat16 \
                if env_flag_default("SAMT_D_BF16", False) else None

            def d_apply(variables, img, **kw):
                if ddt is None:
                    return self.net_d.apply(variables, img, **kw)
                v = {"params": _cast(variables["params"], ddt),
                     "batch_stats": variables["batch_stats"]}
                pred, mut = self.net_d.apply(v, _cast(img, ddt), **kw)
                mut = {"batch_stats": _cast(mut["batch_stats"],
                                            jnp.float32)}
                return pred.astype(jnp.float32), mut

            def _g_forward(params_g, src, dm, gt_):
                if cdt is not None:
                    out = self.net_g.apply(
                        {"params": _cast(params_g, cdt)}, _cast(src, cdt),
                        _cast(dm, cdt), w=1.0, gt=_cast(gt_, cdt)
                    )
                    return _cast(out, jnp.float32)
                return self.net_g.apply(
                    {"params": params_g}, src, dm, w=1.0, gt=gt_
                )

            if self.remat == "selective":
                g_forward = jax.checkpoint(_g_forward,
                                           policy=self.remat_policy)
            elif self.remat:
                g_forward = jax.checkpoint(_g_forward)
            else:
                g_forward = _g_forward
            percep = self.cri_perceptual
            gt_feats = None
            if percep is not None:
                # target VGG pyramid features once per step, shared by the
                # main/lr/probe perceptual terms (each jax.checkpoint call
                # would otherwise recompute them in fwd AND remat passes)
                vgg_c = _cast(vgg_params, cdt) if cdt is not None \
                    else vgg_params
                gt_feats = jax.lax.stop_gradient(
                    self.cri_perceptual.target_features(
                        vgg_c, _cast(gt, cdt) if cdt is not None else gt))

                if cdt is not None:
                    def _percep(vp, a, b):
                        del b  # target enters via the precomputed feats
                        return self.cri_perceptual.from_target_feats(
                            _cast(vp, cdt), _cast(a, cdt), gt_feats
                        ).astype(jnp.float32)
                else:
                    def _percep(vp, a, b):
                        del b
                        return self.cri_perceptual.from_target_feats(
                            vp, a, gt_feats)
                if self.remat == "selective":
                    percep = jax.checkpoint(_percep,
                                            policy=self.remat_policy)
                elif self.remat:
                    percep = jax.checkpoint(_percep)
                else:
                    percep = _percep

            def g_loss_fn(params_g, params_m):
                logs = {}
                vars_m = {"params": params_m, "batch_stats": state.stats_m}
                dense_motion, mut_m = self.motion_estimator.apply(
                    vars_m, gt, source, train=True, mutable=["batch_stats"]
                )
                out = g_forward(params_g, source, dense_motion, gt)
                total = 0.0

                if self.cri_pix is not None:
                    l_g_pix = self.cri_pix(out["out"], gt)
                    total += l_g_pix
                    logs["l_g_pix"] = l_g_pix
                if percep is not None:
                    l_g_percep = percep(vgg_params, out["out"], gt)
                    total += l_g_percep
                    logs["l_g_percep"] = l_g_percep

                # GAN term (gated on d_on like :325-345)
                if self.cri_gan is not None:
                    fake_pred, mut_d_g = d_apply(
                        {"params": state.params_d,
                         "batch_stats": state.stats_d},
                        out["out"], train=True, mutable=["batch_stats"],
                    )
                    l_g_gan = self.cri_gan(fake_pred, True, is_disc=False)
                    if self.use_adaptive_weight:
                        d_weight = self._probe_d_weight(
                            params_g, out["pre_final"], gt,
                            (state.params_d, state.stats_d),
                            vgg_params, gt_feats=gt_feats,
                        )
                    else:
                        d_weight = jnp.asarray(1.0)
                    d_weight = d_weight * self.scale_adaptive_gan_weight
                    d_weight = jnp.where(d_on, d_weight, 0.0)
                    total += d_weight * l_g_gan
                    logs["d_weight"] = d_weight
                    logs["l_g_gan"] = d_weight * l_g_gan
                else:
                    mut_d_g = {"batch_stats": state.stats_d}

                # motion codebook commit losses (:347-352)
                if self.w_motion_code:
                    l_mcode = sum(out["codebook_loss_motion_list"]) * \
                        self.w_motion_code
                    total += l_mcode
                    logs["l_g_motion_codebook_code"] = l_mcode

                # motion codebook recon vs (flow - grid) (:354-365)
                if self.cri_motion_recon is not None:
                    hd, wd = out["deformation_list"][0].shape[1:3]
                    grid = make_coordinate_grid(hd, wd)[None]
                    l_mrecon = 0.0
                    for i, recon in enumerate(out["motion_recon_list"]):
                        target = sg(out["deformation_list"][i] - grid)
                        l_mrecon += self.cri_motion_recon(recon, target)
                    total += l_mrecon
                    logs["l_g_motion_codebook_recon"] = l_mrecon

                # low-res decode supervision (:367-377)
                for i, wlr in enumerate(self.w_lr_list):
                    if self.cri_pix is not None:
                        l_pix_lr = self.cri_pix(out["out_lr"][i], gt) * wlr
                        total += l_pix_lr
                        logs[f"l_g_pix_lr_{i}"] = l_pix_lr
                    if percep is not None:
                        l_percep_lr = percep(
                            vgg_params, out["out_lr"][i], gt
                        ) * wlr
                        total += l_percep_lr
                        logs[f"l_g_percep_lr_{i}"] = l_percep_lr

                # appearance codebook commit losses (:379-384)
                if self.w_app_code > 0:
                    l_acode = sum(out["codebook_loss_app_list"]) * \
                        self.w_app_code
                    total += l_acode
                    logs["l_g_app_codebook_code"] = l_acode

                # equivariance under random TPS (:387-398)
                if self.cri_equivariance is not None:
                    tp = self.cri_equivariance.transform_params
                    tps = sample_random_tps(
                        rng_tps, B, tp["sigma_affine"], tp["sigma_tps"],
                        tp["points_tps"],
                    )
                    warp_grid = tps_warp_frame_grid(tps, H, W)
                    transformed_frame = grid_sample(
                        gt, warp_grid, align_corners=False,
                        padding_mode="reflection",
                    )
                    transformed_kp, mut_m = self.motion_estimator.apply(
                        {"params": params_m,
                         "batch_stats": mut_m["batch_stats"]},
                        transformed_frame, train=True,
                        method="estimate_kp", mutable=["batch_stats"],
                    )
                    l_eq_v, l_eq_j = self.cri_equivariance(
                        dense_motion["kp_driving"], transformed_kp, tps
                    )
                    total += l_eq_v
                    logs["l_equivariance_value"] = l_eq_v
                    if l_eq_j is not None:
                        total += l_eq_j
                        logs["l_equivariance_jacobian"] = l_eq_j

                if self.cri_kp_distance is not None:
                    l_kpd = self.cri_kp_distance(
                        dense_motion["kp_driving"],
                        dense_motion["kp_source"],
                    )
                    total += l_kpd
                    logs["l_kpd"] = l_kpd

                aux = (logs, mut_m["batch_stats"],
                       mut_d_g["batch_stats"], out["out"])
                return total, aux

            (l_g_total, (logs, new_stats_m, stats_d_after_g, fake_img)
             ), grads = jax.value_and_grad(
                g_loss_fn, argnums=(0, 1), has_aux=True
            )(state.params_g, state.params_m)
            logs["l_g_total"] = l_g_total
            grads_g, grads_m = grads

            # failure guard (SURVEY.md 5.3: the reference has no failure
            # detection; a single NaN batch would poison all params): a
            # non-finite loss skips this step's updates entirely (G and D).
            finite = jnp.isfinite(l_g_total)
            g_on = g_on & finite
            d_on = d_on & finite
            logs["step_skipped_nonfinite"] = (~finite).astype(jnp.float32)

            # G/M updates (:405-408), gated on g_on; lr from the global
            # step so schedules match the reference's per-iter stepping
            def apply_lr(upds, lr):
                return jax.tree_util.tree_map(lambda u: -lr * u, upds)

            upd_g, new_opt_g = self.tx_g.update(grads_g, state.opt_g,
                                                state.params_g)
            new_params_g = optax.apply_updates(
                state.params_g, apply_lr(upd_g, self.lr_g(step))
            )
            upd_m, new_opt_m = self.tx_m.update(grads_m, state.opt_m,
                                                state.params_m)
            new_params_m = optax.apply_updates(
                state.params_m, apply_lr(upd_m, self.lr_m(step))
            )

            new_params_g = _tree_select(g_on, new_params_g, state.params_g)
            new_opt_g = _tree_select(g_on, new_opt_g, state.opt_g)
            new_params_m = _tree_select(g_on, new_params_m, state.params_m)
            new_opt_m = _tree_select(g_on, new_opt_m, state.opt_m)
            new_stats_m = _tree_select(g_on, new_stats_m, state.stats_m)

            # EMA (base_model.py:51-58), decay 0.995
            if self.ema_decay > 0:
                d = self.ema_decay
                new_ema = jax.tree_util.tree_map(
                    lambda e, p: e * d + p * (1 - d),
                    state.ema_g, new_params_g,
                )
            else:
                new_ema = state.ema_g

            # D phase (:414-432)
            def d_loss_fn(params_d):
                real_pred, s1 = d_apply(
                    {"params": params_d, "batch_stats": stats_d_after_g},
                    gt, train=True, mutable=["batch_stats"],
                )
                l_d_real = self.cri_gan(real_pred, True, is_disc=True)
                fake_pred, s2 = d_apply(
                    {"params": params_d, "batch_stats": s1["batch_stats"]},
                    sg(fake_img), train=True, mutable=["batch_stats"],
                )
                l_d_fake = self.cri_gan(fake_pred, False, is_disc=True)
                d_logs = {
                    "l_d_real": l_d_real,
                    "l_d_fake": l_d_fake,
                    "out_d_real": jnp.mean(real_pred),
                    "out_d_fake": jnp.mean(fake_pred),
                }
                return l_d_real + l_d_fake, (d_logs, s2["batch_stats"])

            if self.cri_gan is not None:
                (_, (d_logs, new_stats_d)), grads_d = jax.value_and_grad(
                    d_loss_fn, has_aux=True
                )(state.params_d)
                upd_d, new_opt_d = self.tx_d.update(grads_d, state.opt_d,
                                                    state.params_d)
                new_params_d = optax.apply_updates(
                    state.params_d, apply_lr(upd_d, self.lr_d(step))
                )
                new_params_d = _tree_select(d_on, new_params_d,
                                            state.params_d)
                new_opt_d = _tree_select(d_on, new_opt_d, state.opt_d)
                new_stats_d = _tree_select(d_on, new_stats_d, state.stats_d)
                logs.update(d_logs)
            else:
                new_params_d, new_opt_d = state.params_d, state.opt_d
                new_stats_d = state.stats_d

            new_state = state.replace(
                step=step + 1,
                params_g=new_params_g,
                params_m=new_params_m,
                params_d=new_params_d,
                stats_m=new_stats_m,
                stats_d=new_stats_d,
                ema_g=new_ema,
                opt_g=new_opt_g,
                opt_m=new_opt_m,
                opt_d=new_opt_d,
            )
            return new_state, logs

        return train_step


def _strip(cfg: Optional[Dict[str, Any]]) -> Dict[str, Any]:
    """Drop the 'type' key from a loss option dict (build by class here).
    Unlike the reference's setup_optimizers, this does NOT mutate the
    config (the reference's .pop makes configs single-use —
    SURVEY.md section 5.6 quirk, deliberately not reproduced)."""
    cfg = dict(cfg or {})
    cfg.pop("type", None)
    return cfg
