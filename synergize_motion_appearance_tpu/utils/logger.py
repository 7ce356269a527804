"""Logging: root logger (rank-0 INFO), per-iter message logger with ETA,
TensorBoard init. Parity target: utils/logger.py:10-169."""
from __future__ import annotations

import datetime
import logging
import time
from typing import Any, Dict, Optional

initialized_loggers = {}


def get_root_logger(logger_name: str = "samt",
                    log_level: int = logging.INFO,
                    log_file: Optional[str] = None) -> logging.Logger:
    logger = logging.getLogger(logger_name)
    if logger_name in initialized_loggers:
        return logger
    fmt = "%(asctime)s %(levelname)s: %(message)s"
    sh = logging.StreamHandler()
    sh.setFormatter(logging.Formatter(fmt, datefmt="%Y-%m-%d %H:%M:%S"))
    logger.addHandler(sh)
    logger.propagate = False

    import jax

    if jax.process_index() != 0:
        logger.setLevel(logging.ERROR)  # non-master ranks: errors only
    else:
        logger.setLevel(log_level)
        if log_file is not None:
            fh = logging.FileHandler(log_file, "a")
            fh.setFormatter(
                logging.Formatter(fmt, datefmt="%Y-%m-%d %H:%M:%S")
            )
            logger.addHandler(fh)
    initialized_loggers[logger_name] = True
    return logger


class MessageLogger:
    """Formatted per-iter console/TB logging with ETA (logger.py:10-74)."""

    def __init__(self, opt: Dict[str, Any], start_iter: int = 1,
                 tb_logger=None):
        self.exp_name = opt.get("name", "exp")
        logger_opt = opt.get("logger", {})
        self.interval = logger_opt.get("print_freq", 100)
        self.start_iter = start_iter
        self.max_iters = opt.get("train", {}).get("total_iter", 0)
        self.use_tb_logger = logger_opt.get("use_tb_logger", False)
        self.tb_logger = tb_logger
        self.start_time = time.time()
        self.logger = get_root_logger()

    def __call__(self, log_vars: Dict[str, Any]):
        current_iter = log_vars.pop("iter")
        epoch = log_vars.pop("epoch", 0)
        lrs = log_vars.pop("lrs", [])

        message = (f"[{self.exp_name[:31]}..][epoch:{epoch:3d}, "
                   f"iter:{current_iter:8,d}, lr:(")
        message += ",".join(f"{lr:.3e}" for lr in lrs) + ")] "

        if "time" in log_vars:
            iter_time = log_vars.pop("time")
            data_time = log_vars.pop("data_time", 0.0)
            total_time = time.time() - self.start_time
            time_sec_avg = total_time / max(
                current_iter - self.start_iter + 1, 1
            )
            eta_sec = time_sec_avg * (self.max_iters - current_iter - 1)
            eta_str = str(datetime.timedelta(seconds=int(max(eta_sec, 0))))
            message += (f"[eta: {eta_str}, time (data): "
                        f"{iter_time:.3f} ({data_time:.3f})] ")

        for k, v in log_vars.items():
            v = float(v)
            message += f"{k}: {v:.4e} "
            if self.tb_logger is not None:
                key = f"losses/{k}" if k.startswith("l_") else k
                self.tb_logger.add_scalar(key, v, current_iter)
        self.logger.info(message)


def init_tb_logger(log_dir: str):
    try:
        from torch.utils.tensorboard import SummaryWriter
    except ImportError:  # pragma: no cover
        try:
            from tensorboardX import SummaryWriter
        except ImportError:
            return None
    return SummaryWriter(log_dir=log_dir)


def init_wandb_logger(opt):
    """wandb in tensorboard-sync mode (utils/logger.py:84-102): resumable
    by id, named after the experiment. No-op when wandb isn't installed
    or the config carries no `logger.wandb.project`."""
    import jax

    if jax.process_index() != 0:
        return None
    wandb_opt = (opt.get("logger") or {}).get("wandb") or {}
    project = wandb_opt.get("project")
    if not project:
        return None
    try:
        import wandb
    except ImportError:  # pragma: no cover - wandb absent in this image
        get_root_logger().warning(
            "wandb requested in config but not installed; skipping.")
        return None
    resume_id = wandb_opt.get("resume_id")
    if resume_id:
        wandb_id, resume = resume_id, "allow"
        get_root_logger().warning(f"Resume wandb logger with id={wandb_id}.")
    else:
        wandb_id, resume = wandb.util.generate_id(), "never"
    wandb.init(id=wandb_id, resume=resume, name=opt.get("name"),
               config=opt, project=project, sync_tensorboard=True)
    get_root_logger().info(
        f"Use wandb logger with id={wandb_id}; project={project}.")
    return wandb_id


def get_env_info() -> str:
    import jax

    import synergize_motion_appearance_tpu as samt

    return (f"\nsynergize_motion_appearance_tpu {samt.__version__}"
            f"\n\tjax {jax.__version__}"
            f"\n\tbackend {jax.default_backend()}"
            f"\n\tdevices {jax.device_count()} "
            f"({jax.local_device_count()} local)")
