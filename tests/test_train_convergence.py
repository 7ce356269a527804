"""Training actually works: synthetic-overfit convergence and N-chip vs
1-chip equivalence (VERDICT round-1 items — the reference only ever
demonstrates these implicitly by producing checkpoints; recipe constants
at options/train.yml:112-139, step semantics appmotioncomp_model.py:294-434).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synergize_motion_appearance_tpu.training import Trainer
from synergize_motion_appearance_tpu.parallel import (
    create_mesh, replicate, shard_batch,
)

from test_train_step import IMG, make_batch, tiny_opt

pytestmark = pytest.mark.slow


def _smooth_batch(batch_size, seed=0):
    """Low-frequency source/driving pair (driving = shifted source):
    learnable structure, unlike iid noise."""
    rng = np.random.RandomState(seed)
    small = rng.rand(batch_size, IMG // 8, IMG // 8, 3).astype(np.float32)
    big = np.repeat(np.repeat(small, 8, axis=1), 8, axis=2) * 2 - 1
    src = big * 0.8
    drv = np.roll(src, IMG // 8, axis=2)
    return {"source": jnp.asarray(src), "driving": jnp.asarray(drv)}


def test_synthetic_overfit_converges():
    """~220 steps on one fixed tiny batch: generator total and pixel
    losses must drop substantially, D losses stay finite after D starts,
    EMA must track the live params."""
    opt = tiny_opt()
    opt["train"]["net_d_start_iter"] = 60
    opt["train"]["total_iter"] = 250
    trainer = Trainer(opt)
    batch = _smooth_batch(2)
    state, vgg_params = trainer.init_state(jax.random.PRNGKey(0), batch)
    step_fn = jax.jit(trainer.make_train_step(), donate_argnums=(0,))

    steps = 220
    hist = {"l_g_total": [], "l_g_pix": [], "l_d_real": [],
            "l_d_fake": []}
    key = jax.random.PRNGKey(42)
    for i in range(steps):
        key, sub = jax.random.split(key)
        state, logs = step_fn(state, batch, sub, vgg_params)
        for k in hist:
            if k in logs:
                hist[k].append(float(logs[k]))

    for k, vals in hist.items():
        assert all(np.isfinite(v) for v in vals), f"non-finite {k}"

    # convergence: compare first-10 vs last-10 means
    def drop(k):
        v = hist[k]
        return np.mean(v[:10]), np.mean(v[-10:])

    pix0, pix1 = drop("l_g_pix")
    tot0, tot1 = drop("l_g_total")
    assert pix1 < 0.55 * pix0, f"l_g_pix did not converge: {pix0}->{pix1}"
    assert tot1 < 0.8 * tot0, f"l_g_total did not converge: {tot0}->{tot1}"

    # D phase engaged at iter 60+ (reference gates at 5001,
    # appmotioncomp_model.py:414) and stayed finite/bounded
    assert len(hist["l_d_real"]) > 0
    assert np.mean(np.abs(hist["l_d_real"][-10:])) < 10.0
    assert np.mean(np.abs(hist["l_d_fake"][-10:])) < 10.0

    # EMA tracks: after many steps ema_g must be far from init and close
    # to the live params relative to the distance travelled
    p = np.concatenate([np.asarray(l).ravel() for l in
                        jax.tree_util.tree_leaves(state.params_g)[:8]])
    e = np.concatenate([np.asarray(l).ravel() for l in
                        jax.tree_util.tree_leaves(state.ema_g)[:8]])
    assert np.abs(p - e).max() < 0.05  # decay 0.995 over 220 steps


def test_bf16_train_tracks_f32_over_100_steps():
    """Mixed-precision (compute_dtype=bfloat16) training must track the
    f32 loss trajectory over >=100 steps — the validation gate for making
    bf16 the recipe default (train.yml:109)."""
    steps = 110
    trajs = {}
    for mode in ("f32", "bf16"):
        opt = tiny_opt()
        opt["train"]["net_d_start_iter"] = 40
        if mode == "bf16":
            opt["train"]["compute_dtype"] = "bfloat16"
        trainer = Trainer(opt)
        batch = _smooth_batch(2)
        state, vgg_params = trainer.init_state(jax.random.PRNGKey(0),
                                               batch)
        step_fn = jax.jit(trainer.make_train_step(), donate_argnums=(0,))
        key = jax.random.PRNGKey(11)
        pix = []
        for i in range(steps):
            key, sub = jax.random.split(key)
            state, logs = step_fn(state, batch, sub, vgg_params)
            pix.append(float(logs["l_g_pix"]))
            assert np.isfinite(pix[-1]), (mode, i)
        trajs[mode] = pix

    f32_end = np.mean(trajs["f32"][-10:])
    bf16_end = np.mean(trajs["bf16"][-10:])
    f32_start = np.mean(trajs["f32"][:10])
    bf16_start = np.mean(trajs["bf16"][:10])
    # both converge substantially
    assert f32_end < 0.7 * f32_start, (f32_start, f32_end)
    assert bf16_end < 0.7 * bf16_start, (bf16_start, bf16_end)
    # bf16 end-of-run loss within 15% of the f32 trajectory
    assert abs(bf16_end - f32_end) < 0.15 * f32_end, (bf16_end, f32_end)


def test_8dev_step_equals_1dev_step():
    """An 8-device data-sharded step must produce the same updated params
    as a single-device step on the identical global batch (gradient mean
    == mean of shard gradients; XLA psum does the reduction).

    Tolerances are set by the ONE legitimate non-determinism boundary
    (measured): the VQ nearest-codebook argmin sees distances reduced in
    a different order under SPMD partitioning, so near-tie tokens can
    flip entries — a discrete jump in the codebook-recon loss whose
    gradient moves a handful of params by ~an Adam step quantum
    (lr=8e-5). Everything OUTSIDE the VQ path must agree to float
    reduction noise (<=1e-5 at step 1)."""
    assert jax.device_count() >= 8, "conftest must fake 8 devices"
    opt = tiny_opt()
    opt["train"]["net_d_start_iter"] = 1  # exercise the D phase too
    batch = make_batch(8)

    # single device
    t1 = Trainer(opt)
    s1, vgg1 = t1.init_state(jax.random.PRNGKey(0), batch)
    step1 = jax.jit(t1.make_train_step())

    # 8-device mesh, same init (init is deterministic from the same key)
    t8 = Trainer(opt)
    s8, vgg8 = t8.init_state(jax.random.PRNGKey(0), batch)
    mesh = create_mesh(("data",))
    s8 = replicate(s8, mesh)
    vgg8 = replicate(vgg8, mesh)
    batch8 = shard_batch(batch, mesh)
    step8 = jax.jit(t8.make_train_step())

    # argmin-insensitive logs: everything except the quantized-decode
    # recon (and the total that contains it)
    TIE_SENSITIVE = ("l_g_motion_codebook_recon", "l_g_total",
                     "l_g_motion_codebook_code", "l_g_app_codebook_code")

    key = jax.random.PRNGKey(7)
    for i in range(3):
        key, sub = jax.random.split(key)
        s1, logs1 = step1(s1, batch, sub, vgg1)
        s8, logs8 = step8(s8, batch8, sub, vgg8)
        if i == 0:
            for k in logs1:
                if k in TIE_SENSITIVE:
                    continue
                a, b = float(logs1[k]), float(logs8[k])
                assert abs(a - b) <= 1e-5 * max(1.0, abs(b)), (k, a, b)

    # after 3 steps: every log within amplified-but-bounded drift.
    # VQ-tie-sensitive series get 4x headroom: a near-tie argmin flip at
    # step 1 feeds back through the codebook EMA/commit path and its
    # log drift after 3 steps is a multiple of the one-step quantum
    # (observed 5.3e-3 on l_g_motion_codebook_code in an otherwise
    # healthy run); a real sync bug shows up orders of magnitude larger
    for k in logs1:
        a, b = float(logs1[k]), float(logs8[k])
        tol = 2e-2 if k in TIE_SENSITIVE else 5e-3
        assert abs(a - b) <= tol * max(1.0, abs(b)), (k, a, b)

    # params agree to a few Adam quanta (measured worst 4.4e-4 after 3
    # steps; a real sync bug — e.g. per-shard BN or missing grad psum —
    # shows up orders of magnitude larger)
    for name in ("params_g", "params_d", "params_m", "ema_g"):
        la = jax.tree_util.tree_leaves(getattr(s1, name))
        lb = jax.tree_util.tree_leaves(getattr(s8, name))
        assert len(la) == len(lb)
        worst = max(float(np.abs(np.asarray(x) - np.asarray(y)).max())
                    for x, y in zip(la, lb))
        assert worst < 1.5e-3, f"{name} diverged: max abs diff {worst}"
