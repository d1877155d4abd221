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
    estimator: str = "unbias"  # per-block log-det estimator (uniform)
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
                n_iters, ftol, estimator = (layer.n_iters, layer.ftol,
                                            layer.estimator)
            elif (n_iters, ftol, estimator) != (layer.n_iters, layer.ftol,
                                                layer.estimator):
                return None
    if filters is None:
        return None
    return ResFlowSpec(n_repeats=len(layers) // 2, dim=D, filters=filters,
                       n_iters=int(n_iters), ftol=float(ftol),
                       estimator=str(estimator))


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
    # transposed weights for the in-kernel J^T series (logdet estimator):
    # J = w3t D2 w2t D1 w1t, so J^T w = w1 (D1 (w2 (D2 (w3 w)))) with
    # w1 = w1t^T (D, F), w2 = w2t^T (F, F), w3 = w3t^T (F, D)
    packed["w1"] = jnp.swapaxes(packed["w1t"], 1, 2)   # (n, D, F)
    packed["w2"] = jnp.swapaxes(packed["w2t"], 1, 2)   # (n, F, F)
    packed["w3"] = jnp.swapaxes(packed["w3t"], 1, 2)   # (n, F, D)
    # inverse-direction ActNorm logdet constant: each ActNorm.inverse
    # contributes +sum(log_scale) (bijectors/norm.py:73-76, n_pixels=1)
    packed["an_const"] = jnp.sum(packed["an_s"])
    return packed


_KEYS = ("an_s", "an_b", "w1t", "b1", "w2t", "b2", "w3t", "b3", "beta")
_KEYS_LD = _KEYS + ("w1", "w2", "w3")


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


# ------------------------------------------------- solve + in-kernel logdet
# Serving-mode 'unbias' estimator constants (bijectors/iresblock.py:65:
# logdet_unbias(..., n_samples=4, n_exact=8); ops/estimators.py p=0.5).
_LD_SAMPLES = 4
_LD_NEXACT = 8
_LD_P = 0.5


def draw_unbias_probes(B: int, D: int):
    """Reproduce the EXACT random draws of the chain inverse's per-block
    estimator call, ``logdet_unbias(g_fn, x, PRNGKey(0), n_samples=4,
    n_exact=8)`` (bijectors/iresblock.py:_eval_key — serving mode has
    ctx.rng=None, so every block uses PRNGKey(0) and hence the SAME probe
    set; ops/estimators.py:_roulette_series for the split structure).

    Returns (V (D, S, B) f32, thr (1, S, B) f32, cap (1,) i32): the
    Hutchinson probes transposed to kernel layout, the per-probe
    Russian-roulette series lengths broadcast to lane layout, and the max
    length (the kernel's dynamic trip count — terms past each probe's own
    length are masked exactly like the XLA path's fixed-cap loop).
    """
    from ...ops.estimators import geometric

    keys = jax.random.split(jax.random.PRNGKey(0), _LD_SAMPLES)
    vs, nts = [], []
    for i in range(_LD_SAMPLES):
        kn, kv = jax.random.split(keys[i])
        nts.append(_LD_NEXACT + geometric(kn, _LD_P))
        vs.append(jax.random.normal(kv, (B, D), jnp.float32))
    n_terms = jnp.stack(nts)                          # (S,) int32
    V = jnp.stack(vs, axis=0).transpose(2, 0, 1)      # (D, S, B)
    thr = jnp.broadcast_to(
        n_terms.astype(jnp.float32)[None, :, None],
        (1, _LD_SAMPLES, B))
    cap = jnp.max(n_terms).reshape(1)
    return V, thr, cap


def make_solve_logdet_kernel(spec: ResFlowSpec, bb: int):
    """Fused inverse: fixed-point solve AND the per-block 'unbias' log-det
    series in ONE kernel.  The estimator's randomness (probes + RR series
    lengths) is drawn on the XLA side with the chain path's exact key
    structure and passed in, so estimator VALUES match the chain inverse
    to float tolerance — no in-kernel RNG, no stream change.  The series
    runs ``max(n_terms)`` iterations (data-dependent, typically ~10) where
    the XLA path always runs the static 40-term cap; J^T products are
    hand-derived from the g-MLP's saved pre-activations (3 matmuls each,
    probes batched along lanes)."""
    n, D, F = spec.n_repeats, spec.dim, spec.filters
    n_iters, ftol = spec.n_iters, spec.ftol
    S = _LD_SAMPLES

    def kernel(z_ref, an_s, an_b, w1t, b1, w2t, b2, w3t, b3, beta,
               w1, w2, w3, V, thr, cap, x_ref, ld_ref):
        Vc = jnp.concatenate([V[:, p, :] for p in range(S)], axis=1)
        thrc = jnp.concatenate([thr[:, p, :] for p in range(S)], axis=1)
        capv = cap[0]

        def g_apply(j, xx):
            h = jnp.dot(w1t[j], xx, preferred_element_type=jnp.float32) \
                + b1[j]
            h = h * jax.nn.sigmoid(beta[j, 0] * h) / 1.1
            h = jnp.dot(w2t[j], h, preferred_element_type=jnp.float32) \
                + b2[j]
            h = h * jax.nn.sigmoid(beta[j, 1] * h) / 1.1
            return jnp.dot(w3t[j], h, preferred_element_type=jnp.float32) \
                + b3[j]

        def block(jj, carry):
            x, acc = carry
            j = n - 1 - jj
            zb = x
            x0 = zb - g_apply(j, zb)

            def cond(c):
                xx, prev, it = c
                return jnp.logical_and(
                    it < n_iters,
                    jnp.max(jnp.abs(xx - prev)) >= ftol)

            def body(c):
                xx, _, it = c
                return zb - g_apply(j, xx), xx, it + 1

            xx, _, _ = jax.lax.while_loop(
                cond, body, (x0, zb, jnp.asarray(1, jnp.int32)))

            # pre-activations + LipSwish' masks at the solved x
            # (phi(a) = a*sig(b a)/1.1; phi'(a) = (s + b a s (1-s))/1.1)
            a1 = jnp.dot(w1t[j], xx, preferred_element_type=jnp.float32) \
                + b1[j]
            s1 = jax.nn.sigmoid(beta[j, 0] * a1)
            d1 = (s1 + beta[j, 0] * a1 * s1 * (1.0 - s1)) / 1.1
            h1 = a1 * s1 / 1.1
            a2 = jnp.dot(w2t[j], h1, preferred_element_type=jnp.float32) \
                + b2[j]
            s2 = jax.nn.sigmoid(beta[j, 1] * a2)
            d2 = (s2 + beta[j, 1] * a2 * s2 * (1.0 - s2)) / 1.1
            d1c = jnp.concatenate([d1] * S, axis=1)   # (F, S*bb)
            d2c = jnp.concatenate([d2] * S, axis=1)

            # RR series: sum_k sign_k/(k * geom_cdf_k) v^T J^k v, live-masked
            def scond(c):
                _, _, k = c
                return k <= capv

            def sbody(c):
                w, s, k = c
                t = jnp.dot(w3[j], w, preferred_element_type=jnp.float32)
                t = t * d2c
                t = jnp.dot(w2[j], t, preferred_element_type=jnp.float32)
                t = t * d1c
                wn = jnp.dot(w1[j], t, preferred_element_type=jnp.float32)
                kf = k.astype(jnp.float32)
                # geom_cdf = p^max(0, k - n_exact - 1) with p = 0.5
                m = jnp.maximum(0.0, kf - (_LD_NEXACT + 1.0))
                sign = jnp.where(k % 2 == 1, 1.0, -1.0)
                coef = sign * jnp.exp(0.6931471805599453 * m) / kf
                dots = jnp.sum(wn * Vc, axis=0, keepdims=True)  # (1, S*bb)
                live = (kf <= thrc).astype(jnp.float32)
                return (wn, s + live * coef * dots, k + 1)

            _, s, _ = jax.lax.while_loop(
                scond, sbody,
                (Vc, jnp.zeros_like(thrc), jnp.asarray(1, jnp.int32)))
            ser = s[:, 0:bb]
            for p in range(1, S):
                ser = ser + s[:, p * bb:(p + 1) * bb]
            acc = acc + ser / float(S)

            return (xx * jnp.exp(an_s[j]) + an_b[j], acc)

        x, acc = jax.lax.fori_loop(
            0, n, block,
            (z_ref[:], jnp.zeros((1, bb), jnp.float32)))
        x_ref[:] = x
        ld_ref[:] = acc

    return kernel


def call_solve_logdet(spec: ResFlowSpec, packed, z, interpret=False):
    """Fused inverse with in-kernel logdet: z (B, D) -> (x (B, D),
    inv_logdet (B,)).  inv_logdet = sum_j sum(log_scale_j) - sum_j series_j,
    matching the chain inverse's accounting (ActNorm.inverse +
    InvertibleResBlock.inverse logdets)."""
    B, D = z.shape
    bb = _block_b(B)
    grid = ((B + bb - 1) // bb,)
    kernel = make_solve_logdet_kernel(spec, bb)
    V, thr, cap = draw_unbias_probes(B, D)

    def full(a, smem=False):
        nd = a.ndim
        return pl.BlockSpec(a.shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.SMEM if smem else pltpu.VMEM)

    w_args = [packed[k] for k in _KEYS_LD]
    w_specs = [full(a, smem=(k == "beta"))
               for k, a in zip(_KEYS_LD, w_args)]
    zspec = pl.BlockSpec((D, bb), lambda i: (0, i), memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((D, _LD_SAMPLES, bb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((1, _LD_SAMPLES, bb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM)
    ldspec = pl.BlockSpec((1, bb), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    zt = z.astype(jnp.float32).T
    x, ser = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[zspec] + w_specs + [vspec, tspec, cspec],
        out_specs=[zspec, ldspec],
        out_shape=[jax.ShapeDtypeStruct((D, B), jnp.float32),
                   jax.ShapeDtypeStruct((1, B), jnp.float32)],
        interpret=interpret,
    )(zt, *w_args, V, thr, cap)
    return x.T, packed["an_const"] - ser[0]


def fused_resflow_inverse(chain, spec: ResFlowSpec, var, z, interpret=False):
    """Convenience wrapper: pack + fused solve-with-logdet (tests)."""
    packed = pack_resflow(chain, spec, var)
    return call_solve_logdet(spec, packed, z, interpret)


def make_fwd_logdet_kernel(spec: ResFlowSpec, bb: int):
    """Fused FORWARD: the whole [ActNorm -> x + g(x)] stack plus every
    block's 'unbias' log-det series in one kernel — the forward has no
    fixed-point solve, so this is the direct-direction twin of
    make_solve_logdet_kernel (same probe/series semantics)."""
    n, D, F = spec.n_repeats, spec.dim, spec.filters
    S = _LD_SAMPLES

    def kernel(x_in_ref, an_s, an_b, w1t, b1, w2t, b2, w3t, b3, beta,
               w1, w2, w3, V, thr, cap, z_ref, ld_ref):
        Vc = jnp.concatenate([V[:, p, :] for p in range(S)], axis=1)
        thrc = jnp.concatenate([thr[:, p, :] for p in range(S)], axis=1)
        capv = cap[0]

        def block(j, carry):
            y, acc = carry
            # ActNorm forward: x = (y - bias) * exp(-log_scale)
            x = (y - an_b[j]) * jnp.exp(-an_s[j])

            a1 = jnp.dot(w1t[j], x, preferred_element_type=jnp.float32) \
                + b1[j]
            s1 = jax.nn.sigmoid(beta[j, 0] * a1)
            d1 = (s1 + beta[j, 0] * a1 * s1 * (1.0 - s1)) / 1.1
            h1 = a1 * s1 / 1.1
            a2 = jnp.dot(w2t[j], h1, preferred_element_type=jnp.float32) \
                + b2[j]
            s2 = jax.nn.sigmoid(beta[j, 1] * a2)
            d2 = (s2 + beta[j, 1] * a2 * s2 * (1.0 - s2)) / 1.1
            h2 = a2 * s2 / 1.1
            g = jnp.dot(w3t[j], h2, preferred_element_type=jnp.float32) \
                + b3[j]
            d1c = jnp.concatenate([d1] * S, axis=1)
            d2c = jnp.concatenate([d2] * S, axis=1)

            def scond(c):
                _, _, k = c
                return k <= capv

            def sbody(c):
                w, s, k = c
                t = jnp.dot(w3[j], w, preferred_element_type=jnp.float32)
                t = t * d2c
                t = jnp.dot(w2[j], t, preferred_element_type=jnp.float32)
                t = t * d1c
                wn = jnp.dot(w1[j], t, preferred_element_type=jnp.float32)
                kf = k.astype(jnp.float32)
                m = jnp.maximum(0.0, kf - (_LD_NEXACT + 1.0))
                sign = jnp.where(k % 2 == 1, 1.0, -1.0)
                coef = sign * jnp.exp(0.6931471805599453 * m) / kf
                dots = jnp.sum(wn * Vc, axis=0, keepdims=True)
                live = (kf <= thrc).astype(jnp.float32)
                return (wn, s + live * coef * dots, k + 1)

            _, s, _ = jax.lax.while_loop(
                scond, sbody,
                (Vc, jnp.zeros_like(thrc), jnp.asarray(1, jnp.int32)))
            ser = s[:, 0:bb]
            for p in range(1, S):
                ser = ser + s[:, p * bb:(p + 1) * bb]
            return (x + g, acc + ser / float(S))

        z, acc = jax.lax.fori_loop(
            0, n, block,
            (x_in_ref[:], jnp.zeros((1, bb), jnp.float32)))
        z_ref[:] = z
        ld_ref[:] = acc

    return kernel


def call_fwd_logdet(spec: ResFlowSpec, packed, x, interpret=False):
    """Fused forward with in-kernel logdet: x (B, D) -> (z (B, D),
    fwd_logdet (B,)).  fwd_logdet = -sum_j sum(log_scale_j) + sum_j
    series_j (ActNorm.forward contributes -sum(log_scale))."""
    B, D = x.shape
    bb = _block_b(B)
    grid = ((B + bb - 1) // bb,)
    kernel = make_fwd_logdet_kernel(spec, bb)
    V, thr, cap = draw_unbias_probes(B, D)

    def full(a, smem=False):
        nd = a.ndim
        return pl.BlockSpec(a.shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.SMEM if smem else pltpu.VMEM)

    w_args = [packed[k] for k in _KEYS_LD]
    w_specs = [full(a, smem=(k == "beta"))
               for k, a in zip(_KEYS_LD, w_args)]
    zspec = pl.BlockSpec((D, bb), lambda i: (0, i), memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((D, _LD_SAMPLES, bb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((1, _LD_SAMPLES, bb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM)
    ldspec = pl.BlockSpec((1, bb), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    xt = x.astype(jnp.float32).T
    z, ser = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[zspec] + w_specs + [vspec, tspec, cspec],
        out_specs=[zspec, ldspec],
        out_shape=[jax.ShapeDtypeStruct((D, B), jnp.float32),
                   jax.ShapeDtypeStruct((1, B), jnp.float32)],
        interpret=interpret,
    )(xt, *w_args, V, thr, cap)
    return z.T, ser[0] - packed["an_const"]


def fused_resflow_forward(chain, spec: ResFlowSpec, var, x, interpret=False):
    """Convenience wrapper: pack + fused forward-with-logdet (tests)."""
    packed = pack_resflow(chain, spec, var)
    return call_fwd_logdet(spec, packed, x, interpret)
