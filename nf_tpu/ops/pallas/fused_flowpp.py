"""Whole-stack fused eval kernel for the Flow++ 2D density stack.

Extends the fused serving tier (ops/pallas/fused_stack.py — RealNVP/Glow)
to the flow++ density pattern (VERDICT r3 next-step #6):

    n x [ ActNorm(D) -> MixLogAttnCoupling(MLP-attn conditioner, K mix) ]

(reference recipe: /root/reference/flows/flowpp.py:64-78, coupling
/root/reference/flows/coupling.py:125-210).  At 1D data the conditioner's
GatedAttn runs on a single token, where attention is the identity on its
value (softmax of one score is 1), so the eval-mode conditioner collapses
to a pure MLP chain:

    Dense(1->F) -> GatedLinear(F) -> LayerNorm -> [attn == out-proj gate]
    -> LayerNorm -> Dense(F -> 2 + 3K)

The kernel runs the whole 32-repeat stack as ONE Pallas program in the
transposed (channels, batch) layout of fused_stack.py: all packed weights
VMEM-resident, matmuls on the MXU, the logistic-mixture CDF math and the
fixed-trip bracket-safeguarded Newton inverse (the same rtsafe scheme as
bijectors/mixlogcdf.py, same constants) on the VPU — only x enters and
(y, logdet) leave HBM.  Eval mode only; training stays on XLA.

Restricted to D == 2 (the zoo's density config): per-coupling halves are
single channels, so mixture parameter rows slice directly off the head.
"""
from __future__ import annotations

import os
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

# Newton-solve constants: MUST match bijectors/mixlogcdf.py so the fused
# path is bit-comparable to the Chain reference path
SPAN = 1.0e3
N_ITERS = 24
XTOL = 1.0e-5
TINY = 1.0e-38
LN_EPS = 1.0e-5


@dataclass(frozen=True)
class FlowppSpec:
    kind: str            # 'flowpp' (dispatch tag for EvalProgram)
    n_repeats: int       # couplings (even; parity alternates)
    dim: int             # == 2
    filters: int         # conditioner width F
    n_mixtures: int      # K


# --------------------------------------------------------------------------
# structural detection
# --------------------------------------------------------------------------
def extract_flowpp_spec(chain, dims) -> Optional[FlowppSpec]:
    from ...bijectors.flowpp_coupling import MixLogAttnCoupling
    from ...bijectors.norm import ActNorm
    from ...nets.core import Sequential
    from ...nets.gated import GatedAttn, GatedLinear, LayerNormNet
    from ...nets.layers import Dense

    if not _HAS_PALLAS or os.environ.get("NF_TPU_NO_PALLAS") == "1":
        return None
    if len(dims) != 1 or dims[0] != 2:
        return None
    layers = list(chain.layers)
    if len(layers) < 4 or len(layers) % 2 != 0:
        return None
    n = len(layers) // 2
    if n % 2 != 0:
        return None

    F = None
    K = None
    for i in range(n):
        norm, coup = layers[2 * i], layers[2 * i + 1]
        if not isinstance(norm, ActNorm) or norm.num_channels != 2:
            return None
        if not isinstance(coup, MixLogAttnCoupling) or len(coup.dims) != 1:
            return None
        if coup.odd != (i % 2 != 0) or coup.out_chs != 1:
            return None
        net = coup.net
        if not isinstance(net, Sequential) or len(net.layers) != 6:
            return None
        l0, gl, ln1, at, ln2, lh = net.layers
        if not (isinstance(l0, Dense) and not l0.weight_norm
                and isinstance(gl, GatedLinear)
                and isinstance(ln1, LayerNormNet) and ln1.shape == (l0.out_features,)
                and isinstance(at, GatedAttn) and at.in_shape == (l0.out_features,)
                and at.channels == at.filters == l0.out_features
                and isinstance(ln2, LayerNormNet) and ln2.shape == (l0.out_features,)
                and isinstance(lh, Dense) and not lh.weight_norm):
            return None
        f = l0.out_features
        k = coup.n_mixtures
        if l0.in_features != 1 or gl.features != f \
                or lh.in_features != f or lh.out_features != 2 + 3 * k:
            return None
        if F is None:
            F, K = f, k
        elif (F, K) != (f, k):
            return None

    m = n // 2
    # VMEM budget: W1 (F,2F) + Wq (F,F) + Wout (2F,F) + Wh (2+3K,F) per
    # layer, two parities
    weight_bytes = 2 * m * (2 * F * F + F * F + 2 * F * F
                            + (2 + 3 * K) * F + 16 * F) * 4
    if F > 128 or K > 32 or weight_bytes > 8 * 2 ** 20:
        return None
    return FlowppSpec(kind="flowpp", n_repeats=n, dim=2, filters=F,
                      n_mixtures=K)


# --------------------------------------------------------------------------
# host-side packing (pure jnp, vectorized over the repeat axis)
# --------------------------------------------------------------------------
def _stack_trees(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def pack_flowpp(chain, spec: FlowppSpec, var):
    """Returns (packed, const_logdet).  packed[parity] holds (m = n/2):
      pre  (m, 2, 2)   actnorm forward (bias, exp(-log_scale)) columns
      prei (m, 2, 2)   actnorm inverse (bias, exp(log_scale)) columns
      W0   (m, F, 1)   in-proj weight (transposed)
      W1   (m, F, 2F)  gated-linear op (transposed)
      Wq   (m, F, F)   attention Q projection (transposed)
      Wo   (m, 2F, F)  attention out projection (transposed)
      Wh   (m, 2+3K, F) head (transposed)
      bh   (m, 2+3K, 1) head bias column
      VEC  (m, F, 10)  columns: b0 b1 g1 be1 bq g2 be2 — see _COLS
      bo   (m, 2F, 1)  out-proj bias column
      gb   (m, 2)      (a_log_scale, a_bias)
    const_logdet: forward-direction actnorm constant."""
    params = var["params"]
    n = spec.n_repeats
    const_ld = jnp.zeros((), jnp.float32)
    packed = []
    for parity in range(2):
        idxs = list(range(parity, n, 2))
        b = {}
        np_ = _stack_trees([params[2 * i] for i in idxs])
        scale = jnp.exp(-np_["log_scale"])                  # (m, 2)
        b["pre"] = jnp.stack([np_["bias"], scale], axis=2)
        b["prei"] = jnp.stack([np_["bias"], 1.0 / scale], axis=2)
        const_ld = const_ld - jnp.sum(np_["log_scale"])

        cp = _stack_trees([params[2 * i + 1] for i in idxs])
        net = cp["net"]                                     # list of 6
        d0, gl, ln1, at, ln2, lh = net
        b["W0"] = jnp.swapaxes(d0["w"], 1, 2)               # (m, F, 1)
        b["W1"] = jnp.swapaxes(gl["op"]["w"], 1, 2)         # (m, F, 2F)
        F = spec.filters
        wq = at["w_qkv"][:, :, 2 * F: 3 * F]                # (m, F(C), F)
        b["Wq"] = jnp.swapaxes(wq, 1, 2)                    # (m, F, F)
        bq_eff = (jnp.einsum("mcf,mc->mf", wq, at["pos_emb"])
                  + at["b_qkv"][:, 2 * F: 3 * F])           # (m, F)
        b["Wo"] = jnp.swapaxes(at["w_out"], 1, 2)           # (m, 2F, F)
        b["bo"] = at["b_out"][..., None]                    # (m, 2F, 1)
        b["Wh"] = jnp.swapaxes(lh["w"], 1, 2)               # (m, 2+3K, F)
        b["bh"] = lh["b"][..., None]                        # (m, 2+3K, 1)
        vec = [d0["b"], gl["op"]["b"], ln1["gamma"], ln1["beta"],
               bq_eff, ln2["gamma"], ln2["beta"]]
        b["VEC"] = jnp.stack(vec, axis=2)                   # (m, F, 7)
        b["gb"] = jnp.concatenate([cp["a_log_scale"], cp["a_bias"]],
                                  axis=1)                   # (m, 2)
        packed.append(b)
    return packed, const_ld


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------
def _elu(x):
    # jax.nn.elu lowers to expm1, which Mosaic does not implement; the
    # exp-1 form differs only below f32 noise on these activation scales
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _layernorm_rows(h, g, bcol):
    mu = jnp.mean(h, axis=0, keepdims=True)
    var = jnp.mean((h - mu) ** 2, axis=0, keepdims=True)
    return (h - mu) * jax.lax.rsqrt(var + LN_EPS) * g + bcol


def _conditioner_t(z1, j, W0, W1, Wq, Wo, Wh, BH, BO, VEC):
    """z1 (1, bb) -> raw (2+3K, bb), eval mode, transposed layout."""
    f32 = jnp.float32
    V = VEC[j]

    def vec(k):
        return V[:, k:k + 1]

    h = W0[j] * z1 + vec(0)                # outer-product in-proj (F, bb)
    # GatedLinear: u = W1 @ [elu(h); elu(-h)] + b1; h += elu(u)*sig(elu(-u))
    e = jnp.concatenate([_elu(h), _elu(-h)], axis=0)
    u = jnp.dot(W1[j], e, preferred_element_type=f32) + vec(1)
    h = h + _elu(u) * jax.nn.sigmoid(_elu(-u))
    h = _layernorm_rows(h, vec(2), vec(3))
    # GatedAttn at L=1: A == Q-projection of (h + pos) (identity attention);
    # y = Wout @ A + bout; h += y[:F] * sigmoid(y[F:])
    A = jnp.dot(Wq[j], h, preferred_element_type=f32) + vec(4)
    y = jnp.dot(Wo[j], A, preferred_element_type=f32) + BO[j]
    Fh = h.shape[0]
    h = h + y[:Fh, :] * jax.nn.sigmoid(y[Fh:, :])
    h = _layernorm_rows(h, vec(5), vec(6))
    return jnp.dot(Wh[j], h, preferred_element_type=f32) + BH[j]


def _mix_parts(x, logpi, mu, s):
    """x (1,bb); logpi/mu/s (K,bb) -> u, v, logpdf (1,bb), log-space."""
    z = (x - mu) * jnp.exp(-s)

    def lse(t):
        m_ = jnp.max(t, axis=0, keepdims=True)
        return m_ + jnp.log(jnp.sum(jnp.exp(t - m_), axis=0, keepdims=True))

    u = lse(logpi + jax.nn.log_sigmoid(z))
    v = lse(logpi + jax.nn.log_sigmoid(-z))
    logpdf = lse(logpi + (z - s - 2.0 * jax.nn.softplus(z)))
    return u, v, logpdf


def _head_params(raw, K, g_scale, g_bias):
    a = jnp.tanh(raw[0:1, :]) * g_scale + g_bias
    b_ = raw[1:2, :]
    logpi = raw[2:2 + K, :]
    m_ = jnp.max(logpi, axis=0, keepdims=True)
    logpi = logpi - (m_ + jnp.log(jnp.sum(jnp.exp(logpi - m_), axis=0,
                                          keepdims=True)))
    mu = raw[2 + K:2 + 2 * K, :]
    s = raw[2 + 2 * K:2 + 3 * K, :]
    return a, b_, logpi, mu, s


def _make_kernels_flowpp(spec: FlowppSpec):
    m = spec.n_repeats // 2
    K = spec.n_mixtures

    def split(x, odd):
        z0, z1 = x[0:1, :], x[1:2, :]
        return (z1, z0) if odd else (z0, z1)

    def merge(z0, z1, odd):
        if odd:
            z0, z1 = z1, z0
        return jnp.concatenate([z0, z1], axis=0)

    def layer_fwd(x, ld, refs, j, odd):
        PRE, W0, W1, Wq, Wo, Wh, BH, BO, VEC, GB = refs
        pre = PRE[j]
        x = (x - pre[:, 0:1]) * pre[:, 1:2]
        z0, z1 = split(x, odd)
        raw = _conditioner_t(z1, j, W0, W1, Wq, Wo, Wh, BH, BO, VEC)
        a, b_, logpi, mu, s = _head_params(raw, K, GB[j, 0], GB[j, 1])
        u, v, logpdf = _mix_parts(z0, logpi, mu, s)
        z0 = (u - v) * jnp.exp(a) + b_
        ld = ld + (logpdf - u - v) + a
        return merge(z0, z1, odd), ld

    def layer_inv(y, ld, refs, j, odd):
        PREI, W0, W1, Wq, Wo, Wh, BH, BO, VEC, GB = refs
        y0, y1 = split(y, odd)
        raw = _conditioner_t(y1, j, W0, W1, Wq, Wo, Wh, BH, BO, VEC)
        a, b_, logpi, mu, s = _head_params(raw, K, GB[j, 0], GB[j, 1])
        t = (y0 - b_) * jnp.exp(-a)
        ld = ld - a

        # bracket-safeguarded Newton in logit space — the exact scheme of
        # bijectors/mixlogcdf.py::mix_log_cdf_logit_inverse
        def body(_, carry):
            x, lo, hi, dxold = carry
            u, v, logpdf = _mix_parts(x, logpi, mu, s)
            f = (u - v) - t
            lo = jnp.where(f < 0, x, lo)
            hi = jnp.where(f >= 0, x, hi)
            df = jnp.maximum(jnp.exp(logpdf - u - v), TINY)
            dx = f / df
            xn = x - dx
            use_bis = ((xn <= lo) | (xn >= hi)
                       | (jnp.abs(2.0 * f) > jnp.abs(dxold * df))
                       | ~jnp.isfinite(xn))
            done = (jnp.abs(dx) <= XTOL) | ((hi - lo) <= XTOL)
            dx = jnp.where(use_bis, (hi - lo) * 0.5, dx)
            xn = jnp.where(use_bis, (lo + hi) * 0.5, xn)
            xn = jnp.where(done, x, xn)
            dx = jnp.where(done, 0.0, dx)
            return xn, lo, hi, dx

        z = jnp.zeros_like(t)
        lo = jnp.full_like(t, -SPAN)
        hi = jnp.full_like(t, SPAN)
        z, _, _, _ = jax.lax.fori_loop(
            0, N_ITERS, body, (z, lo, hi, jnp.full_like(t, 2.0 * SPAN)))
        u, v, logpdf = _mix_parts(z, logpi, mu, s)
        ld = ld - (logpdf - u - v)
        y = merge(z, y1, odd)
        prei = PREI[j]
        return y * prei[:, 1:2] + prei[:, 0:1], ld

    def fwd_kernel(*args):
        (x_ref, *w, y_ref, ld_ref) = args
        refs_e, refs_o = tuple(w[:10]), tuple(w[10:])
        x = x_ref[:]
        ld = jnp.zeros((1, x.shape[1]), jnp.float32)

        def body(j, carry):
            x, ld = carry
            x, ld = layer_fwd(x, ld, refs_e, j, odd=False)
            x, ld = layer_fwd(x, ld, refs_o, j, odd=True)
            return x, ld

        x, ld = jax.lax.fori_loop(0, m, body, (x, ld))
        y_ref[:] = x
        ld_ref[:] = ld

    def inv_kernel(*args):
        (y_ref, *w, x_ref, ld_ref) = args
        refs_e, refs_o = tuple(w[:10]), tuple(w[10:])
        y = y_ref[:]
        ld = jnp.zeros((1, y.shape[1]), jnp.float32)

        def body(i, carry):
            y, ld = carry
            j = m - 1 - i
            y, ld = layer_inv(y, ld, refs_o, j, odd=True)
            y, ld = layer_inv(y, ld, refs_e, j, odd=False)
            return y, ld

        y, ld = jax.lax.fori_loop(0, m, body, (y, ld))
        x_ref[:] = y
        ld_ref[:] = ld

    return fwd_kernel, inv_kernel


_KEYS = ("pre", "W0", "W1", "Wq", "Wo", "Wh", "bh", "bo", "VEC", "gb")


def make_inv_packed(packed, spec=None):
    out = []
    for p in packed:
        q = dict(p)
        q["pre"] = p["prei"]
        out.append(q)
    return out


def _block_b(B: int) -> int:
    opt = os.environ.get("NF_TPU_FUSED_BB")
    if opt:
        return int(opt)
    for bb in (4096, 2048, 1024, 512, 256, 128):
        if B % bb == 0:
            return bb
    return B


def call_flowpp(kernel, spec: FlowppSpec, packed, x, interpret):
    B, D = x.shape
    bb = _block_b(B)
    grid = ((B + bb - 1) // bb,)
    w_args = [packed[0][k] for k in _KEYS] + [packed[1][k] for k in _KEYS]

    def full(a, smem=False):
        nd = a.ndim
        return pl.BlockSpec(a.shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.SMEM if smem else pltpu.VMEM)

    w_specs = [full(a, smem=(k == "gb"))
               for k, a in zip(_KEYS + _KEYS, w_args)]
    xspec = pl.BlockSpec((D, bb), lambda i: (0, i), memory_space=pltpu.VMEM)
    ldspec = pl.BlockSpec((1, bb), lambda i: (0, i), memory_space=pltpu.VMEM)
    xt = x.astype(jnp.float32).T
    y, ld = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[xspec] + w_specs,
        out_specs=[xspec, ldspec],
        out_shape=[jax.ShapeDtypeStruct((D, B), jnp.float32),
                   jax.ShapeDtypeStruct((1, B), jnp.float32)],
        interpret=interpret,
    )(xt, *w_args)
    return y.T, ld[0]


# --------------------------------------------------------------------------
# public entry points (tests / standalone use)
# --------------------------------------------------------------------------
def fused_flowpp_forward(chain, spec, var, x, interpret=False):
    packed, const_ld = pack_flowpp(chain, spec, var)
    fwd_k, _ = _make_kernels_flowpp(spec)
    y, ld = call_flowpp(fwd_k, spec, packed, x, interpret)
    return y, ld + const_ld


def fused_flowpp_inverse(chain, spec, var, y, interpret=False):
    packed, const_ld = pack_flowpp(chain, spec, var)
    _, inv_k = _make_kernels_flowpp(spec)
    x, ld = call_flowpp(inv_k, spec, make_inv_packed(packed), y, interpret)
    return x, ld - const_ld
