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


def build_model(opt: Dict[str, Any]):
    """models/__init__.py:19-30 equivalent."""
    cls = MODEL_REGISTRY.get(opt["model_type"])
    return cls(opt)
