"""Aux subsystems: NaN probes, profiling cost analysis, plotting grid."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nf_tpu.core import Chain, Ctx
from nf_tpu.bijectors import Logit, Tanh
from nf_tpu.utils.debug import CheckedBijector, check_chain
from nf_tpu.utils.plotting import make_grid
from nf_tpu.utils.profiling import cost_analysis, roofline_estimate


def test_checked_bijector_passes_clean(rng):
    bij = CheckedBijector(Tanh())
    var = bij.init(rng)
    x = jax.random.normal(rng, (4, 3))
    y, ld, _ = jax.jit(lambda v, x: bij.forward(v, x, Ctx()))(var, x)
    assert np.isfinite(np.asarray(y)).all()


def test_checked_bijector_raises_on_nan(rng):
    class Bad(Tanh):
        def forward(self, var, x, ctx):
            y, ld, st = super().forward(var, x, ctx)
            return y / 0.0, ld, st

    bij = CheckedBijector(Bad(), tag="bad")
    var = bij.init(rng)
    x = jax.random.normal(rng, (4, 3))
    with pytest.raises(Exception):
        jax.block_until_ready(
            jax.jit(lambda v, x: bij.forward(v, x, Ctx()))(var, x))


def test_check_chain_wraps_layers(rng):
    chain = check_chain(Chain([Tanh(), Logit(eps=1e-6)]))
    assert all(isinstance(l, CheckedBijector) for l in chain.layers)


def test_cost_analysis_reports_flops():
    f = lambda a, b: a @ b
    a = jnp.ones((128, 128))
    ca = cost_analysis(f, a, a)
    assert float(ca.get("flops", 0)) > 1e5  # 2*128^3 ~ 4.2e6


def test_roofline_estimate_fields():
    f = lambda a, b: a @ b
    a = jnp.ones((64, 64))
    r = roofline_estimate(f, a, a, measured_seconds=1e-3)
    for k in ("flops", "arithmetic_intensity", "pct_of_peak_flops"):
        assert k in r


def test_make_grid_shape():
    imgs = np.random.rand(10, 8, 8, 3).astype(np.float32)
    grid = make_grid(imgs, nrow=4)
    assert grid.shape == (3 * 9 + 1, 4 * 9 + 1, 3)
