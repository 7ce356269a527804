"""Frame-parallel inference over the 8-device virtual mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synergize_motion_appearance_tpu.inference import ReenactmentPipeline
from synergize_motion_appearance_tpu.models import build_network
from synergize_motion_appearance_tpu.parallel import create_mesh
from synergize_motion_appearance_tpu.utils.options import load_yaml

pytestmark = pytest.mark.slow  # heavy tier


def test_frame_parallel_animate():
    assert jax.device_count() >= 8
    cfg = load_yaml("options/tiny.yml")
    net_g = build_network(cfg["network_g"])
    me = build_network(cfg["network_motion_estimator"])

    rng = np.random.RandomState(0)
    src = (rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
    drv = (rng.rand(10, 64, 64, 3).astype(np.float32) * 2 - 1)
    s = jnp.asarray(src)
    d0 = jnp.asarray(drv[:1])
    m_vars = me.init(jax.random.PRNGKey(0), d0, s)
    dm = me.apply(m_vars, d0, s)
    g_vars = net_g.init(jax.random.PRNGKey(1), s, dm, inference=True)

    ref = ReenactmentPipeline(net_g, me, g_vars, m_vars, relative=True,
                              adapt_scale=True, frame_batch=8,
                              compute_dtype=None).animate(src, drv)

    mesh = create_mesh(("data",))
    out = ReenactmentPipeline(net_g, me, g_vars, m_vars, relative=True,
                              adapt_scale=True, frame_batch=8,
                              compute_dtype=None, mesh=mesh
                              ).animate(src, drv)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
