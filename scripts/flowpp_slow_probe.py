"""Decompose the flow++ image-stack execution slowness (~4 s/step at
batch 16 on 16x16 — COMPILE_PROFILE.json shows it is runtime, not XLA
compile).  Times the full forward and each sublayer kind in isolation.

Usage: python scripts/flowpp_slow_probe.py [batch] [img]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    IMG = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    from nf_tpu.bijectors.flowpp_coupling import MixLogAttnCoupling
    from nf_tpu.bijectors.vardequant import VariationalDequant
    from nf_tpu.core.bijector import Ctx
    from nf_tpu.nets.gated import GatedAttn, GatedConv2d
    from nf_tpu.nets.conditioners import ConvNet

    key = jax.random.PRNGKey(0)
    ctx = Ctx(rng=jax.random.PRNGKey(1), train=True)

    # --- single coupling, checkerboard @ IMGxIMG
    cp = MixLogAttnCoupling((IMG, IMG, 1), masking="checkerboard",
                            base_filters=32, n_mixtures=4)
    v = cp.init(key)
    x = jax.random.uniform(key, (B, IMG, IMG, 1))
    f = jax.jit(lambda v, x: cp.forward(v, x, ctx)[:2])
    print(f"coupling fwd (ckbd {IMG}): {timeit(f, v, x)*1e3:.2f} ms")

    g = jax.jit(lambda v, x: jax.grad(
        lambda v: cp.forward(v, x, ctx)[1].sum())(v))
    print(f"coupling grad (ckbd {IMG}): {timeit(g, v, x)*1e3:.2f} ms")

    # --- gated attn alone @ mid_shape (IMG/2, IMG/2, 32)
    ms = (IMG // 2, IMG // 2, 32)
    at = GatedAttn(ms, 32)
    va = at.init(key)
    h = jax.random.normal(key, (B,) + ms)
    fa = jax.jit(lambda v, x: at.apply(v, x, ctx)[0])
    print(f"gated attn (L={ms[0]*ms[1]}): {timeit(fa, va, h)*1e3:.2f} ms")

    os.environ["NF_TPU_NO_PALLAS"] = "1"
    at2 = GatedAttn(ms, 32)
    fa2 = jax.jit(lambda v, x: at2.apply(v, x, ctx)[0])
    print(f"gated attn jnp path:      {timeit(fa2, va, h)*1e3:.2f} ms")
    del os.environ["NF_TPU_NO_PALLAS"]

    # --- gated conv alone
    gc = GatedConv2d(32)
    vg = gc.init(key)
    fg = jax.jit(lambda v, x: gc.apply(v, x, ctx)[0])
    print(f"gated conv:               {timeit(fg, vg, h)*1e3:.2f} ms")

    # --- conv conditioner (vardequant's nets)
    cn = ConvNet(1, 2, 32)
    vc = cn.init(key)
    xc = jax.random.normal(key, (B, IMG, IMG, 1))
    fc = jax.jit(lambda v, x: cn.apply(v, x, ctx)[0])
    print(f"ConvNet(1->2):            {timeit(fc, vc, xc)*1e3:.2f} ms")

    # --- vardequant head
    vd = VariationalDequant((IMG, IMG, 1), base_filters=32)
    vv = vd.init(key)
    fv = jax.jit(lambda v, x: vd.forward(v, x, ctx)[:2])
    print(f"vardequant head:          {timeit(fv, vv, x)*1e3:.2f} ms")

    # --- full model forward + train step
    from nf_tpu.config import Config, NetworkConfig
    from nf_tpu.models import build_model
    from nf_tpu.train import Trainer
    cfg = Config()
    cfg.network = NetworkConfig(name="flow++", layers=4, mixtures=4,
                                var_dequant=True, scan=False)
    model = build_model("flow++", (IMG, IMG, 1), datatype="image",
                        cfg=cfg.network)
    tr = Trainer(model, cfg.optimizer, seed=0)
    xb = np.asarray(jax.random.uniform(key, (B, IMG, IMG, 1),
                                       minval=0.05, maxval=0.95))
    ts = tr.init_state(key, xb)
    fm = jax.jit(lambda v, x: model.forward(
        v, x, Ctx(rng=jax.random.PRNGKey(3), train=True))[:2])
    print(f"full fwd (L4 unrolled):   {timeit(fm, ts.var, xb)*1e3:.2f} ms")

    def step(b):
        nonlocal ts
        ts, loss = tr.train_step(ts, b)
        return loss
    print(f"full train step:          {timeit(step, xb, n=5)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
