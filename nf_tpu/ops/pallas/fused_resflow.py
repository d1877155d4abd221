"""Whole-stack fused fixed-point solve for the ResFlow serving inverse.

The eval-mode inverse of the 1D Residual Flow stack
(n x [ActNorm -> InvertibleResBlock(g = SN-Dense/LipSwish MLP)],
reference recipe /root/reference/flows/resflow.py:9-38,
/root/reference/flows/iresblock.py:236-255) runs n sequential
``lax.while_loop`` fixed-point solves, each iteration a 3-matmul MLP on a
(B, 2) tensor.  Measured at batch 8192 on a v5e the solve is 20.9 ms of
the 29.9 ms inverse (RESFLOW_FIXPOINT_PROBE.json) — dominated by per-op
overhead on skinny tensors, not FLOPs (~60 GFLOP worst case).

TPU-native answer: ONE Pallas kernel.  All n blocks' effective weights
(spectral-norm scaling resolved host-side by ``pack_resflow``) live in
VMEM; the kernel walks the blocks in reverse with a ``fori_loop``, runs
each block's tolerance-controlled fixed point as an in-kernel
``while_loop``, and applies the interleaved ActNorm inverses.  Activations
run TRANSPOSED — (D, batch-tile) with batch in the 128-wide lane dim, like
ops/pallas/fused_stack.py — so the MLP matmuls are (F, D) @ (D, bb) MXU
ops with full lane occupancy.

Scope: the SOLVE only.  The per-block log-det series estimator keeps its
XLA path: the serving inverse recovers x with this kernel, then replays
ONE chain forward at x — forward from the solved x reproduces every
block's solved input exactly (x_j + g(x_j) = z_j by construction), so the
replayed logdet matches the chain inverse's to fixed-point tolerance and
reuses the exact same estimator/rng semantics.

Convergence semantics: the chain path's while_loop stops on the max
residual over the WHOLE batch; this kernel stops per batch-tile.  Both
guarantee max|x - prev| < ftol at exit (per tile, which implies it for
the batch); individual iterates can differ below that tolerance.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


@dataclass(frozen=True)
class ResFlowSpec:
    n_repeats: int     # number of [ActNorm, InvertibleResBlock] pairs
    dim: int           # data dimensionality D
    filters: int       # g-MLP hidden width F
    n_iters: int       # fixed-point iteration cap
    ftol: float        # fixed-point tolerance
    kind: str = "resflow"


def extract_resflow_spec(chain, dims) -> Optional[ResFlowSpec]:
    """Structural match: 1D data, alternating ActNorm / InvertibleResBlock
    with the standard 3-layer SN-Dense + LipSwish g (iresblock.py
    InvertibleResLinear shape)."""
    from ...bijectors.iresblock import InvertibleResBlock
    from ...bijectors.norm import ActNorm
    from ...nets.core import Sequential
    from ...nets.spectral import LipSwish, SpectralNormDense

    if len(dims) != 1:
        return None
    layers = getattr(chain, "layers", None)
    if not layers or len(layers) < 4 or len(layers) % 2 != 0:
        return None
    D = dims[0]
    filters = None
    n_iters = None
    ftol = None
    for i, layer in enumerate(layers):
        if i % 2 == 0:
            if not isinstance(layer, ActNorm) or layer.num_channels != D:
                return None
        else:
            if not isinstance(layer, InvertibleResBlock):
                return None
            g = layer.g_net
            if not isinstance(g, Sequential) or len(g.layers) != 5:
                return None
            d0, a0, d1, a1, d2 = g.layers
            if not (isinstance(d0, SpectralNormDense)
                    and isinstance(d1, SpectralNormDense)
                    and isinstance(d2, SpectralNormDense)
                    and isinstance(a0, LipSwish) and isinstance(a1, LipSwish)):
                return None
            if d0.in_features != D or d2.out_features != D:
                return None
            if d0.out_features != d1.in_features \
                    or d1.out_features != d2.in_features \
                    or d0.out_features != d1.out_features:
                return None
            f = d0.out_features
            if filters is None:
                filters = f
            elif filters != f:
                return None
            if n_iters is None:
                n_iters, ftol = layer.n_iters, layer.ftol
            elif (n_iters, ftol) != (layer.n_iters, layer.ftol):
                return None
    if filters is None:
        return None
    return ResFlowSpec(n_repeats=len(layers) // 2, dim=D, filters=filters,
                       n_iters=int(n_iters), ftol=float(ftol))


def pack_resflow(chain, spec: ResFlowSpec, var):
    """Resolve eval-mode effective weights and stack them across blocks.

    Spectral-norm scaling (w_bar * min(1, coeff/(sigma+eps)) with sigma
    from the stored u/v probes, nets/spectral.py:_normalized train=False)
    is folded here; the kernel sees plain dense weights.  Weights are
    pre-transposed to the kernel's (out, in) layout.  Biases and ActNorm
    affines are stored as (n, ., 1) columns for direct broadcast against
    (., bb) tiles; LipSwish betas go to SMEM as (n,) scalars.
    """
    n, D, F = spec.n_repeats, spec.dim, spec.filters
    an_s, an_b = [], []
    w1t, b1, w2t, b2, w3t, b3 = [], [], [], [], [], []
    beta1, beta2 = [], []
    for i in range(2 * n):
        sub = {"params": var["params"][i], "state": var["state"][i]}
        if i % 2 == 0:  # ActNorm
            an_s.append(sub["params"]["log_scale"])
            an_b.append(sub["params"]["bias"])
            continue
        g = chain.layers[i].g_net
        gp, gs = sub["params"]["g"], sub["state"]["g"]
        d0, _, d1, _, d2 = g.layers
        outs = []
        for li, layer in ((0, d0), (2, d1), (4, d2)):
            p = {"params": gp[li], "state": gs[li]}
            w, _, _ = layer._normalized(p["params"]["w_bar"],
                                        p["state"]["u"], p["state"]["v"],
                                        train=False)
            outs.append((w.T, p["params"]["b"]))
        (w1, bb1), (w2, bb2), (w3, bb3) = outs
        w1t.append(w1)
        b1.append(bb1)
        w2t.append(w2)
        b2.append(bb2)
        w3t.append(w3)
        b3.append(bb3)
        beta1.append(gp[1]["beta"][0])
        beta2.append(gp[3]["beta"][0])
    packed = {
        "an_s": jnp.stack(an_s)[:, :, None],       # (n, D, 1)
        "an_b": jnp.stack(an_b)[:, :, None],       # (n, D, 1)
        "w1t": jnp.stack(w1t),                     # (n, F, D)
        "b1": jnp.stack(b1)[:, :, None],           # (n, F, 1)
        "w2t": jnp.stack(w2t),                     # (n, F, F)
        "b2": jnp.stack(b2)[:, :, None],           # (n, F, 1)
        "w3t": jnp.stack(w3t),                     # (n, D, F)
        "b3": jnp.stack(b3)[:, :, None],           # (n, D, 1)
        "beta": jnp.stack([jnp.stack(beta1), jnp.stack(beta2)], 1),  # (n, 2)
    }
    return packed


_KEYS = ("an_s", "an_b", "w1t", "b1", "w2t", "b2", "w3t", "b3", "beta")


def make_solve_kernel(spec: ResFlowSpec):
    n, D, F = spec.n_repeats, spec.dim, spec.filters
    n_iters, ftol = spec.n_iters, spec.ftol

    def kernel(z_ref, an_s, an_b, w1t, b1, w2t, b2, w3t, b3, beta, x_ref):
        def g_apply(j, xx):
            h = jnp.dot(w1t[j], xx, preferred_element_type=jnp.float32) \
                + b1[j]
            bta = beta[j, 0]
            h = h * jax.nn.sigmoid(bta * h) / 1.1
            h = jnp.dot(w2t[j], h, preferred_element_type=jnp.float32) \
                + b2[j]
            btb = beta[j, 1]
            h = h * jax.nn.sigmoid(btb * h) / 1.1
            return jnp.dot(w3t[j], h, preferred_element_type=jnp.float32) \
                + b3[j]

        def block(jj, x):
            j = n - 1 - jj
            # InvertibleResBlock inverse: solve xx = x - g(xx)
            zb = x
            x0 = zb - g_apply(j, zb)

            def cond(carry):
                xx, prev, it = carry
                return jnp.logical_and(
                    it < n_iters,
                    jnp.max(jnp.abs(xx - prev)) >= ftol)

            def body(carry):
                xx, _, it = carry
                return zb - g_apply(j, xx), xx, it + 1

            xx, _, _ = jax.lax.while_loop(
                cond, body, (x0, zb, jnp.asarray(1, jnp.int32)))
            # ActNorm inverse: x = y * exp(log_scale) + bias
            return xx * jnp.exp(an_s[j]) + an_b[j]

        x_ref[:] = jax.lax.fori_loop(0, n, block, z_ref[:])

    return kernel


def _block_b(B: int) -> int:
    for bb in (8192, 4096, 2048, 1024, 512, 256, 128):
        if B % bb == 0:
            return bb
    return B


def call_solve(kernel, spec: ResFlowSpec, packed, z, interpret=False):
    """Run the fused solve: z (B, D) -> x (B, D)."""
    B, D = z.shape
    bb = _block_b(B)
    grid = ((B + bb - 1) // bb,)

    def full(a, smem=False):
        nd = a.ndim
        return pl.BlockSpec(a.shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.SMEM if smem else pltpu.VMEM)

    w_args = [packed[k] for k in _KEYS]
    w_specs = [full(a, smem=(k == "beta")) for k, a in zip(_KEYS, w_args)]
    zspec = pl.BlockSpec((D, bb), lambda i: (0, i), memory_space=pltpu.VMEM)
    zt = z.astype(jnp.float32).T
    x = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[zspec] + w_specs,
        out_specs=zspec,
        out_shape=jax.ShapeDtypeStruct((D, B), jnp.float32),
        interpret=interpret,
    )(zt, *w_args)
    return x.T


def fused_resflow_inverse_solve(chain, spec: ResFlowSpec, var, z,
                                interpret=False):
    """Convenience wrapper: pack + solve (tests / one-shot use)."""
    packed = pack_resflow(chain, spec, var)
    kernel = make_solve_kernel(spec)
    return call_solve(kernel, spec, packed, z, interpret)
