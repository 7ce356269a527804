"""Per-op conv3x3_wl_ad VJP check at every WL-region shape of the tiny
former (and the flagship decoder shapes), f32, CPU interpret mode.

For each (B, H, W, Cin, Cout): compare y/dx/dw/db of conv3x3_wl_ad
against jax.vjp of the same conv via lax.conv_general_dilated in NHWC.
Prints max abs/rel error per quantity; exits 1 if any exceeds 1e-4.
"""
import os
import sys

os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
if "--8dev" in sys.argv:
    jax.config.update("jax_num_cpu_devices", 8)
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from synergize_motion_appearance_tpu.ops.pallas_conv_wl import (  # noqa
    conv3x3_wl_ad, pick_block_rows)
from synergize_motion_appearance_tpu.models.layers import to_wl, from_wl  # noqa

# tiny former decoder/WL-region shapes (img 64, nf=8, ch_mult 1,2,2,4,
# fuse convs included) + flagship WL shapes
SHAPES = [
    # (B, H, W, Cin, Cout)
    (1, 16, 16, 32, 32),
    (1, 16, 16, 32, 16),
    (1, 32, 32, 16, 16),
    (1, 32, 32, 16, 8),
    (1, 64, 64, 8, 8),
    (1, 64, 64, 16, 8),    # fuse concat -> conv
    (2, 8, 16, 8, 12),     # the unit test's shape (control)
    (1, 128, 128, 64, 64),  # flagship-ish (kept small-B for CPU time)
]


def main():
    bad = 0
    for B, H, W, Ci, Co in SHAPES:
        rng = np.random.RandomState(hash((B, H, W, Ci, Co)) % 2**31)
        x = jnp.asarray(rng.randn(B, H, W, Ci).astype(np.float32))
        w = jnp.asarray(0.2 * rng.randn(3, 3, Ci, Co).astype(np.float32))
        b = jnp.asarray(0.1 * rng.randn(Co).astype(np.float32))
        dy = jnp.asarray(rng.randn(B, H, W, Co).astype(np.float32))

        br = pick_block_rows(H, W, Ci, Co, 4)
        if br is None:
            print(f"shape {(B,H,W,Ci,Co)}: no block_rows fits, skip")
            continue

        def f_ref(x, w, b):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST) + b

        def f_wl(x, w, b):
            return from_wl(conv3x3_wl_ad(br, True, to_wl(x), w, b))

        y_ref, vjp_ref = jax.vjp(f_ref, x, w, b)
        y_wl, vjp_wl = jax.vjp(f_wl, x, w, b)
        errs = {"y": (y_wl, y_ref)}
        for g_wl, g_ref, name in zip(vjp_wl(dy), vjp_ref(dy),
                                     ("dx", "dw", "db")):
            errs[name] = (g_wl, g_ref)
        msg = [f"shape B{B} H{H} W{W} {Ci}->{Co} br={br} "
               f"nblk={H//br}"]
        for name, (got, ref) in errs.items():
            a = np.abs(np.asarray(got) - np.asarray(ref))
            d = np.maximum(np.abs(np.asarray(ref)), 1e-6)
            amax, rmax = a.max(), (a / d).max()
            flag = " <-- BAD" if amax > 1e-4 and rmax > 1e-4 else ""
            if flag:
                bad += 1
            msg.append(f"{name}: abs={amax:.2e} rel={rmax:.2e}{flag}")
        print("  ".join(msg), flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
