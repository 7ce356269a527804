"""Model-orchestration layer: the reference's model API surface.

Parity target: models/base_model.py:14-323 + models/appmotioncomp_model.py
:108-756 — BaseModel/AppMotionCompModel with feed_data /
optimize_parameters / test / validation / save / resume_training.

The TPU-native internals live in training/trainer.py (one jitted step) and
inference.py (batched pipelines); this class adapts them to the familiar
imperative API so code written against the reference's MODEL_REGISTRY
pattern ports directly. Loss logging is already globally averaged
(replacing reduce_loss_dict).
"""
from __future__ import annotations

import time
from os import path as osp
from typing import Any, Dict, Optional

import numpy as np

from .utils.registry import MODEL_REGISTRY


@MODEL_REGISTRY.register()
class AppMotionCompModel:
    def __init__(self, opt: Dict[str, Any]):
        import jax

        from .parallel import create_mesh, replicate, shard_batch
        from .training import Trainer

        self.opt = opt
        self.is_train = opt.get("is_train", True)
        self.trainer = Trainer(opt) if "train" in opt else None
        self.mesh = create_mesh(("data",))
        self._shard = lambda b: shard_batch(b, self.mesh)
        self._replicate = lambda t: replicate(t, self.mesh)
        self.state = None
        self.vgg_params = None
        self._train_step = None
        self._rng = jax.random.PRNGKey(opt.get("manual_seed", 0))
        self.log_dict: Dict[str, float] = {}
        self.batch: Optional[Dict[str, Any]] = None

    # ---------------- data ----------------

    def feed_data(self, data: Dict[str, np.ndarray]):
        """(appmotioncomp_model.py:110-113) — stores the sharded batch."""
        self.batch = self._shard({
            "source": np.asarray(data["source"], np.float32),
            "driving": np.asarray(data["driving"], np.float32),
        })

    # ---------------- training ----------------

    def _ensure_state(self):
        import jax

        if self.state is None:
            state, vgg = self.trainer.init_state(self._rng, self.batch)
            self.state = self._replicate(state)
            self.vgg_params = self._replicate(vgg)
        if self._train_step is None:
            import jax

            self._train_step = jax.jit(
                self.trainer.make_train_step(), donate_argnums=(0,)
            )

    def optimize_parameters(self, current_iter: int):
        """One full G+D step (appmotioncomp_model.py:294-434)."""
        import jax

        self._ensure_state()
        rng = jax.random.fold_in(self._rng, current_iter)
        self.state, logs = self._train_step(
            self.state, self.batch, rng, self.vgg_params
        )
        self.log_dict = {k: float(v) for k, v in
                        jax.device_get(logs).items()}

    def get_current_log(self) -> Dict[str, float]:
        return self.log_dict

    # ---------------- inference / eval ----------------

    def test(self, w: float = 1.0):
        """Eval forward with EMA params (appmotioncomp_model.py:437-456)."""
        import jax

        self._ensure_state()
        g_vars = {"params": self.state.ema_g}
        m_vars = {"params": self.state.params_m,
                  "batch_stats": self.state.stats_m}

        def fwd(g_vars, m_vars, source, driving):
            dm = self.trainer.motion_estimator.apply(
                m_vars, driving, source, train=False
            )
            out = self.trainer.net_g.apply(
                g_vars, source, dm, w=w, inference=True
            )
            return out["out"]

        self.output = jax.jit(fwd)(
            g_vars, m_vars, self.batch["source"], self.batch["driving"]
        )
        return self.output

    def get_current_visuals(self) -> Dict[str, np.ndarray]:
        import jax

        return {
            "result": np.asarray(jax.device_get(self.output)),
            "source": np.asarray(jax.device_get(self.batch["source"])),
            "gt": np.asarray(jax.device_get(self.batch["driving"])),
        }

    # ---------------- persistence ----------------

    def save(self, epoch: int, current_iter: int):
        from .training.checkpoint import save_checkpoint

        ckpt_dir = self.opt["path"]["training_states"]
        return save_checkpoint(ckpt_dir, self.state, epoch)

    def resume_training(self, resume_path: str):
        from .training.checkpoint import restore_checkpoint

        self._ensure_state()
        self.state, epoch = restore_checkpoint(resume_path, self.state)
        self.state = self._replicate(self.state)
        return epoch


@MODEL_REGISTRY.register()
class SRModel:
    """Generic single-network restoration model (models/sr_model.py:13-209)
    — the BasicSR base pattern the talking-head model extends. TPU-native:
    one jitted optax step over a single `network_g`, pixel (+ optional
    perceptual) loss, EMA, test(), and PSNR/SSIM/L1 validation. Kept for
    framework-surface parity so SRModel-style configs port directly."""

    def __init__(self, opt: Dict[str, Any]):
        import jax

        from .models import build_network

        self.opt = opt
        self.is_train = opt.get("is_train", True)
        self.net_g = build_network(opt["network_g"])
        self._rng = jax.random.PRNGKey(opt.get("manual_seed", 0))
        self.params = None
        self.ema_params = None
        self.opt_state = None
        self._tx = None
        self._step_fn = None
        self.log_dict: Dict[str, float] = {}
        self.batch: Optional[Dict[str, Any]] = None
        self.output = None

    def feed_data(self, data: Dict[str, np.ndarray]):
        self.batch = {"lq": np.asarray(data["lq"], np.float32)}
        if "gt" in data:
            self.batch["gt"] = np.asarray(data["gt"], np.float32)

    def _ensure_state(self):
        import jax
        import jax.numpy as jnp
        import optax

        from .losses import build_loss

        if self.params is not None:
            return
        variables = self.net_g.init(self._rng, jnp.asarray(self.batch["lq"]))
        self.params = variables["params"]
        if not self.is_train:
            return
        train_opt = self.opt["train"]
        opt_cfg = dict(train_opt.get("optim_g", {}))
        opt_cfg.pop("type", None)
        self._tx = optax.adam(
            float(opt_cfg.get("lr", 2e-4)),
            *opt_cfg.get("betas", [0.9, 0.99]),
        )
        self.opt_state = self._tx.init(self.params)
        self.ema_decay = float(train_opt.get("ema_decay", 0))
        if self.ema_decay > 0:
            # real copies: the step donates params buffers
            self.ema_params = jax.tree_util.tree_map(
                jnp.array, self.params)

        pix_loss = (build_loss(train_opt["pixel_opt"])
                    if train_opt.get("pixel_opt") else None)

        def loss_fn(params, lq, gt):
            out = self.net_g.apply({"params": params}, lq)
            if isinstance(out, tuple):
                out = out[0]  # VQAutoEncoder: (recon, codebook_loss, stats)
            if isinstance(out, dict):
                out = out.get("out", out)
            total = jnp.zeros((), jnp.float32)
            logs = {}
            if pix_loss is not None:
                l_pix = pix_loss(out, gt)
                total += l_pix
                logs["l_pix"] = l_pix
            logs["l_total"] = total
            return total, (out, logs)

        def step(params, opt_state, lq, gt):
            grads, (out, logs) = jax.grad(
                loss_fn, has_aux=True)(params, lq, gt)
            updates, opt_state = self._tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, logs

        self._step_fn = jax.jit(step, donate_argnums=(0, 1))

    def optimize_parameters(self, current_iter: int):
        import jax

        self._ensure_state()
        self.params, self.opt_state, logs = self._step_fn(
            self.params, self.opt_state,
            self.batch["lq"], self.batch["gt"],
        )
        if self.ema_decay > 0:
            d = self.ema_decay
            self.ema_params = jax.tree_util.tree_map(
                lambda e, p: e * d + p * (1 - d), self.ema_params,
                self.params)
        self.log_dict = {k: float(v) for k, v in
                         jax.device_get(logs).items()}

    def get_current_log(self) -> Dict[str, float]:
        return self.log_dict

    def test(self):
        import jax

        self._ensure_state()
        params = self.ema_params if self.ema_params is not None \
            else self.params
        out = jax.jit(
            lambda p, x: self.net_g.apply({"params": p}, x)
        )(params, self.batch["lq"])
        if isinstance(out, tuple):
            out = out[0]
        if isinstance(out, dict):
            out = out.get("out", out)
        self.output = out
        return out

    def get_current_visuals(self) -> Dict[str, np.ndarray]:
        import jax

        vis = {"result": np.asarray(jax.device_get(self.output)),
               "lq": np.asarray(self.batch["lq"])}
        if "gt" in self.batch:
            vis["gt"] = np.asarray(self.batch["gt"])
        return vis

    def nondist_validation(self, dataloader, current_iter,
                           tb_logger=None, save_img=False):
        """PSNR/SSIM/L1 accumulation over a loader of {lq, gt} batches
        (sr_model.py:128-185)."""
        from .metrics import calculate_metric
        from .utils.img_util import arr2img

        metric_opts = (self.opt.get("val") or {}).get("metrics") or {}
        results = {name: 0.0 for name in metric_opts}
        n = 0
        for data in dataloader:
            self.feed_data(data)
            self.test()
            vis = self.get_current_visuals()
            sr = arr2img(vis["result"][0])
            gt = arr2img(vis["gt"][0])
            for name, m_opt in metric_opts.items():
                results[name] += calculate_metric(
                    {"img1": sr, "img2": gt}, m_opt)
            n += 1
        return {k: v / max(n, 1) for k, v in results.items()}


def build_model(opt: Dict[str, Any]):
    """models/__init__.py:19-30 equivalent."""
    cls = MODEL_REGISTRY.get(opt["model_type"])
    return cls(opt)
