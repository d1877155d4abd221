"""Whole-stack fused eval kernel for 1D density flows (RealNVP / Glow).

The eval-mode (inference / sampling / density-evaluation) forward and
inverse of the density zoo's repeated structure

    n x [ channel-affine norm -> (PLU 1x1 mix)? -> affine coupling(MLP) ]

is a chain of ~300 tiny XLA kernels on (B, D<=3) tensors: at batch 8192 the
whole 32-repeat RealNVP stack is ~3 GFLOP but spends ~1.7 ms in per-kernel
launch overhead (~5 us/kernel) on a v5e.  Every weight of the stack fits in
a few MB, so the TPU-native answer is ONE Pallas kernel: all stacked layer
parameters live in VMEM, a fori_loop walks the repeats on-chip, the MLP
conditioner matmuls hit the MXU, and only x enters / (y, logdet) leave HBM.

Layout: everything runs TRANSPOSED — activations are (channels, batch)
tiles so the batch axis sits in the 128-wide lane dimension (a (bb, D=2)
tile would waste 126/128 lanes), channel splits/merges are cheap sublane
row slices, and the conditioner matmuls are (F, F) @ (F, bb) MXU ops with
full lane occupancy.  The (B, D) <-> (D, B) transposes happen once outside
the kernel.

Applicability is detected structurally (`extract_stack_spec`): eval-mode
only (batch-norm uses running stats; nothing here differentiates — the
training path stays on XLA), 1D data, alternating-parity couplings with the
standard MLP conditioner (reference recipe: flows/realnvp.py:51-53,
flows/glow.py:55-58, conditioner flows/modules.py:391-413).  Weight-norm
re-materialization, batch-norm eval affines, and every constant log-det
(norm layers, PLU log|s| — flows/modules.py:300-306,468) are folded
host-side by `pack_stack`; only the coupling's data-dependent sum(s) is
accumulated in-kernel.

The Chain path remains the reference; the kernel is validated against it
(tests/test_pallas.py) and dispatched at lowering time via
lax.platform_dependent from FlowModel.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

# number of (F,)-vectors packed per coupling into the VEC array:
# b0 | rb0: A1 B1 b1 A2 B2 b2 | rb1: A1 B1 b1 A2 B2 b2 | head: Ah Bh
_N_VEC = 15


# --------------------------------------------------------------------------
# structural detection
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class StackSpec:
    n_repeats: int          # total repeats (even)
    dim: int                # data dimensionality D
    filters: int            # MLP width F
    has_mix: bool           # PLU 1x1 between norm and coupling
    norm_kind: str          # 'batchnorm' | 'actnorm'
    # per-parity split sizes: (len(z0), len(z1)) for even / odd couplings
    halves: Tuple[Tuple[int, int], Tuple[int, int]]


def _is_relu(layer) -> bool:
    fn = getattr(layer, "fn", None)
    return fn is jax.nn.relu


def _mlp_ok(net, filters_out: int) -> Optional[int]:
    """Validate the standard MLP shape; returns width F or None."""
    from ...nets.conditioners import ResBlockLinear
    from ...nets.core import Sequential
    from ...nets.layers import BatchNormNet, Dense

    if not isinstance(net, Sequential) or len(net.layers) != 6:
        return None
    l0, r0, r1, bn, act, lh = net.layers
    if not (isinstance(l0, Dense) and isinstance(lh, Dense)
            and isinstance(bn, BatchNormNet) and _is_relu(act)):
        return None
    F = l0.out_features
    for rb in (r0, r1):
        if not isinstance(rb, ResBlockLinear) or rb.bridge is not None:
            return None
        sub = rb.net.layers
        if len(sub) != 6:
            return None
        if not (isinstance(sub[0], BatchNormNet) and _is_relu(sub[1])
                and isinstance(sub[2], Dense) and isinstance(sub[3], BatchNormNet)
                and _is_relu(sub[4]) and isinstance(sub[5], Dense)):
            return None
        if sub[2].in_features != F or sub[2].out_features != F \
                or sub[5].in_features != F or sub[5].out_features != F:
            return None
    if lh.in_features != F or lh.out_features != 2 * filters_out:
        return None
    return F


def extract_stack_spec(chain, dims) -> Optional[StackSpec]:
    """Match chain.layers against the fusable repeated structure."""
    from ...bijectors.conv1x1 import InvertibleConv1x1
    from ...bijectors.coupling import AffineCoupling
    from ...bijectors.norm import ActNorm, BatchNorm

    if not _HAS_PALLAS or os.environ.get("NF_TPU_NO_PALLAS") == "1":
        return None
    if len(dims) != 1:
        return None
    D = dims[0]
    layers = list(chain.layers)
    if not layers:
        return None

    has_mix = isinstance(layers[1] if len(layers) > 1 else None,
                         InvertibleConv1x1)
    per = 3 if has_mix else 2
    if len(layers) % per != 0:
        return None
    n = len(layers) // per
    if n < 2 or n % 2 != 0:
        return None

    norm_kind = None
    F = None
    halves = [None, None]
    for i in range(n):
        grp = layers[per * i: per * (i + 1)]
        norm = grp[0]
        coup = grp[-1]
        if isinstance(norm, BatchNorm) and not norm.affine:
            kind = "batchnorm"
        elif isinstance(norm, ActNorm):
            kind = "actnorm"
        else:
            return None
        if norm_kind is None:
            norm_kind = kind
        elif norm_kind != kind:
            return None
        if has_mix and not isinstance(grp[1], InvertibleConv1x1):
            return None
        if not isinstance(coup, AffineCoupling) or coup.odd != (i % 2 != 0):
            return None
        out_chs, in_chs = coup.half_dims()
        f = _mlp_ok(coup.net, out_chs)
        if f is None:
            return None
        if F is None:
            F = f
        elif F != f:
            return None
        halves[i % 2] = (out_chs, in_chs)

    # VMEM budget: stacked weights must fit comfortably
    n_half = n // 2
    weight_bytes = 2 * n_half * (4 * F * F + _N_VEC * F) * 4
    if F > 256 or weight_bytes > 8 * 2 ** 20:
        return None
    return StackSpec(n_repeats=n, dim=D, filters=F, has_mix=has_mix,
                     norm_kind=norm_kind, halves=(halves[0], halves[1]))


# --------------------------------------------------------------------------
# host-side packing (pure jnp; traced into the same jit as the kernel call)
# --------------------------------------------------------------------------
def _dense_weight(layer, p):
    from ...nets.layers import _WN_EPS

    if layer.weight_norm:
        vnorm = jnp.linalg.norm(p["v"], axis=1)
        return p["v"] * (p["g"] / (vnorm + _WN_EPS))[:, None]
    return p["w"]


def _bn_eval_affine(bn, p, s):
    """BatchNormNet eval as y = x*A + B."""
    A = p["gamma"] * jax.lax.rsqrt(s["running_var"] + bn.eps)
    B = p["beta"] - s["running_mean"] * A
    return A, B


def _stack_trees(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _dense_weight_batched(layer, sp):
    """Stacked effective dense weights, transposed: (m, out, in)."""
    from ...nets.layers import _WN_EPS

    if layer.weight_norm:
        vnorm = jnp.linalg.norm(sp["v"], axis=2)           # (m, in)
        W = sp["v"] * (sp["g"] / (vnorm + _WN_EPS))[..., None]
    else:
        W = sp["w"]
    return jnp.swapaxes(W, 1, 2)                           # (m, out, in)


def _bn_eval_affine_batched(bn, sp, ss):
    A = sp["gamma"] * jax.lax.rsqrt(ss["running_var"] + bn.eps)
    B = sp["beta"] - ss["running_mean"] * A
    return A, B


def pack_stack(chain, spec: StackSpec, var):
    """Stack per-parity weights (transposed layout); fold all constant
    logdets into a scalar.

    Vectorized: per-layer leaves are tree-stacked first and all math runs
    batched over the repeat axis — the naive per-layer formulation emits
    ~30 tiny device ops per repeat, which on a remote-attached TPU costs
    more than the fused kernel itself.

    Returns (packed, const_logdet): packed[parity] holds
      pre  (m, D, 2)      forward (shift, scale) of the norm layer, columns
      prei (m, D, 2)      inverse (shift, 1/scale), columns
      mix  (m, D, D)      W, applied as W @ x_T       [has_mix only]
      mixi (m, D, D)      W^-1, applied as W^-1 @ y_T [has_mix only]
      W0   (m, F, in)     in-proj, applied as W0 @ z1_T
      VEC  (m, F, _N_VEC) BN eval affines + dense biases, column-oriented
                          so VEC[j][:, k:k+1] is already a (F, 1) column
                          (a (1, F) row would need a sublane<->lane
                          relayout per use — hundreds per pass)
      WR   (m, 4, F, F)   resblock matmuls, transposed
      Wh   (m, 2out, F)   head matmul, transposed
      bh   (m, 2out, 1)   head bias, column
      gb   (m, 2)         coupling (s_log_scale, s_bias)
    and const_logdet is the forward-direction constant contribution.
    """
    per = 3 if spec.has_mix else 2
    n = spec.n_repeats
    D = spec.dim
    params = var["params"]
    states = var["state"]
    const_ld = jnp.zeros((), jnp.float32)
    packed = []

    for parity in range(2):
        idxs = list(range(parity, n, 2))
        b = {}

        # ---- norm layer: channel affine + constant logdet
        np_ = _stack_trees([params[per * i] for i in idxs])
        ns_ = _stack_trees([states[per * i] for i in idxs])
        if spec.norm_kind == "batchnorm":
            rv = ns_["running_var"]                        # (m, D)
            scale = jax.lax.rsqrt(rv)
            shift = ns_["running_mean"]
            const_ld = const_ld - 0.5 * jnp.sum(jnp.log(rv))
        else:  # actnorm
            scale = jnp.exp(-np_["log_scale"])
            shift = np_["bias"]
            const_ld = const_ld - jnp.sum(np_["log_scale"])
        b["pre"] = jnp.stack([shift, scale], axis=2)       # (m, D, 2)
        b["prei"] = jnp.stack([shift, 1.0 / scale], axis=2)

        # ---- PLU 1x1 mix
        if spec.has_mix:
            cp = _stack_trees([params[per * i + 1] for i in idxs])
            cs = _stack_trees([states[per * i + 1] for i in idxs])
            eye = jnp.eye(D, dtype=jnp.float32)
            L = jnp.tril(cp["L"], k=-1) + eye
            diag = eye * (cs["sign_s"] * jnp.exp(cp["log_s"]))[:, None, :]
            U = jnp.triu(cp["U"], k=1) + diag
            W = cs["P"] @ L @ U                            # (m, D, D)
            # bijector computes y = x @ W.T; transposed: y_T = W @ x_T
            b["mix"] = W
            b["mixi"] = jnp.linalg.inv(W)
            const_ld = const_ld + jnp.sum(cp["log_s"])

        # ---- coupling conditioner (standard MLP, eval mode)
        coup = chain.layers[per * idxs[0] + per - 1]
        cps = _stack_trees([params[per * i + per - 1] for i in idxs])
        css = _stack_trees([states[per * i + per - 1] for i in idxs])
        net_p, net_s = cps["net"], css["net"]
        l0, r0, r1, bn, _, lh = coup.net.layers

        vec = [net_p[0]["b"]]                              # each (m, F)
        WR = []
        for rb, rp, rs in ((r0, net_p[1], net_s[1]), (r1, net_p[2], net_s[2])):
            sub = rb.net.layers
            sp, ss = rp["net"], rs["net"]
            A1, B1 = _bn_eval_affine_batched(sub[0], sp[0], ss[0])
            A2, B2 = _bn_eval_affine_batched(sub[3], sp[3], ss[3])
            vec += [A1, B1, sp[2]["b"], A2, B2, sp[5]["b"]]
            WR += [_dense_weight_batched(sub[2], sp[2]),
                   _dense_weight_batched(sub[5], sp[5])]
        Ah, Bh = _bn_eval_affine_batched(bn, net_p[3], net_s[3])
        vec += [Ah, Bh]
        b["W0"] = _dense_weight_batched(l0, net_p[0])      # (m, F, in)
        b["VEC"] = jnp.stack(vec, axis=2)                  # (m, F, _N_VEC)
        b["WR"] = jnp.stack(WR, axis=1)                    # (m, 4, F, F)
        b["Wh"] = _dense_weight_batched(lh, net_p[5])      # (m, 2out, F)
        b["bh"] = cps["net"][5]["b"][..., None]            # (m, 2out, 1)
        b["gb"] = jnp.concatenate([cps["s_log_scale"], cps["s_bias"]],
                                  axis=1)                  # (m, 2)
        packed.append(b)
    return packed, const_ld


# --------------------------------------------------------------------------
# kernel (transposed layout: activations (channels, batch))
# --------------------------------------------------------------------------
def _row_sets(D):
    even = list(range(0, D, 2))
    odd = list(range(1, D, 2))
    return even, odd


def _take_rows(x, rows):
    return jnp.concatenate([x[r:r + 1, :] for r in rows], axis=0)


def _merge_rows(z0, z1, rows0, rows1, D):
    parts = [None] * D
    for k, r in enumerate(rows0):
        parts[r] = z0[k:k + 1, :]
    for k, r in enumerate(rows1):
        parts[r] = z1[k:k + 1, :]
    return jnp.concatenate(parts, axis=0)


def _mlp_t(z1, j, W0, VEC, WR, Wh, bh):
    """The standard MLP conditioner, eval mode, transposed layout:
    z1 (in, bb) -> raw (2*out, bb)."""
    f32 = jnp.float32
    V = VEC[j]                             # (F, _N_VEC)

    def vec(k):
        return V[:, k:k + 1]               # (F, 1) column, no relayout

    in_chs = z1.shape[0]
    if in_chs == 1:
        # K=1 matmul is an outer product: broadcast on the VPU instead
        h = W0[j] * z1 + vec(0)            # (F,1)*(1,bb) -> (F,bb)
    else:
        h = jnp.dot(W0[j], z1, preferred_element_type=f32) + vec(0)
    for r in range(2):
        o = 1 + 6 * r
        u = jax.nn.relu(h * vec(o) + vec(o + 1))
        u = jnp.dot(WR[j, 2 * r], u, preferred_element_type=f32) + vec(o + 2)
        u = jax.nn.relu(u * vec(o + 3) + vec(o + 4))
        u = jnp.dot(WR[j, 2 * r + 1], u, preferred_element_type=f32) + vec(o + 5)
        h = h + u
    h = jax.nn.relu(h * vec(13) + vec(14))
    return jnp.dot(Wh[j], h, preferred_element_type=f32) + bh[j]


def _make_kernels(spec: StackSpec):
    D = spec.dim
    m = spec.n_repeats // 2
    rows_even, rows_odd = _row_sets(D)
    out_even = spec.halves[0][0]
    out_odd = spec.halves[1][0]

    def layer_fwd(x, ld, refs, j, odd: bool):
        PRE, MIX, W0, VEC, WR, Wh, BH, GB = refs
        pre = PRE[j]                       # (D, 2) columns
        x = (x - pre[:, 0:1]) * pre[:, 1:2]
        if MIX is not None:
            x = jnp.dot(MIX[j], x, preferred_element_type=jnp.float32)
        r0, r1 = (rows_odd, rows_even) if odd else (rows_even, rows_odd)
        z0 = _take_rows(x, r0)
        z1 = _take_rows(x, r1)
        raw = _mlp_t(z1, j, W0, VEC, WR, Wh, BH)
        oc = out_odd if odd else out_even
        t, raw_s = raw[:oc, :], raw[oc:, :]
        s = jnp.tanh(raw_s) * GB[j, 0] + GB[j, 1]
        z0 = z0 * jnp.exp(s) + t
        ld = ld + jnp.sum(s, axis=0, keepdims=True)
        return _merge_rows(z0, z1, r0, r1, D), ld

    def layer_inv(y, ld, refs, j, odd: bool):
        PREI, MIXI, W0, VEC, WR, Wh, BH, GB = refs
        r0, r1 = (rows_odd, rows_even) if odd else (rows_even, rows_odd)
        y0 = _take_rows(y, r0)
        y1 = _take_rows(y, r1)
        raw = _mlp_t(y1, j, W0, VEC, WR, Wh, BH)
        oc = out_odd if odd else out_even
        t, raw_s = raw[:oc, :], raw[oc:, :]
        s = jnp.tanh(raw_s) * GB[j, 0] + GB[j, 1]
        y0 = (y0 - t) * jnp.exp(-s)
        ld = ld - jnp.sum(s, axis=0, keepdims=True)
        y = _merge_rows(y0, y1, r0, r1, D)
        if MIXI is not None:
            y = jnp.dot(MIXI[j], y, preferred_element_type=jnp.float32)
        prei = PREI[j]
        return y * prei[:, 1:2] + prei[:, 0:1], ld

    def fwd_kernel(*args):
        if spec.has_mix:
            (x_ref, pre_e, mix_e, W0_e, VEC_e, WR_e, Wh_e, BH_e, GB_e,
             pre_o, mix_o, W0_o, VEC_o, WR_o, Wh_o, BH_o, GB_o,
             y_ref, ld_ref) = args
        else:
            (x_ref, pre_e, W0_e, VEC_e, WR_e, Wh_e, BH_e, GB_e,
             pre_o, W0_o, VEC_o, WR_o, Wh_o, BH_o, GB_o,
             y_ref, ld_ref) = args
            mix_e = mix_o = None
        refs_e = (pre_e, mix_e, W0_e, VEC_e, WR_e, Wh_e, BH_e, GB_e)
        refs_o = (pre_o, mix_o, W0_o, VEC_o, WR_o, Wh_o, BH_o, GB_o)
        x = x_ref[:]                       # (D, bb)
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
        if spec.has_mix:
            (y_ref, prei_e, mixi_e, W0_e, VEC_e, WR_e, Wh_e, BH_e, GB_e,
             prei_o, mixi_o, W0_o, VEC_o, WR_o, Wh_o, BH_o, GB_o,
             x_ref, ld_ref) = args
        else:
            (y_ref, prei_e, W0_e, VEC_e, WR_e, Wh_e, BH_e, GB_e,
             prei_o, W0_o, VEC_o, WR_o, Wh_o, BH_o, GB_o,
             x_ref, ld_ref) = args
            mixi_e = mixi_o = None
        refs_e = (prei_e, mixi_e, W0_e, VEC_e, WR_e, Wh_e, BH_e, GB_e)
        refs_o = (prei_o, mixi_o, W0_o, VEC_o, WR_o, Wh_o, BH_o, GB_o)
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


def _block_b(B: int) -> int:
    import os as _os
    opt = _os.environ.get('NF_TPU_FUSED_BB')
    if opt:
        return int(opt)
    for bb in (4096, 2048, 1024, 512, 256, 128):
        if B % bb == 0:
            return bb
    return B


def _call(kernel, spec: StackSpec, packed, x, interpret):
    B, D = x.shape
    bb = _block_b(B)
    grid = ((B + bb - 1) // bb,)

    if spec.has_mix:
        keys = ("pre", "mix", "W0", "VEC", "WR", "Wh", "bh", "gb")
    else:
        keys = ("pre", "W0", "VEC", "WR", "Wh", "bh", "gb")
    w_args = [packed[0][k] for k in keys] + [packed[1][k] for k in keys]

    def full(a, smem=False):
        nd = a.ndim
        return pl.BlockSpec(a.shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.SMEM if smem else pltpu.VMEM)

    # per-layer scalars (coupling gain/bias) go to SMEM: dynamic scalar
    # reads from VMEM arrays are slow paths
    w_specs = [full(a, smem=(k == "gb"))
               for k, a in zip(keys + keys, w_args)]
    xspec = pl.BlockSpec((D, bb), lambda i: (0, i), memory_space=pltpu.VMEM)
    ldspec = pl.BlockSpec((1, bb), lambda i: (0, i), memory_space=pltpu.VMEM)
    xt = x.astype(jnp.float32).T           # (D, B): batch in lanes
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
# public entry points
# --------------------------------------------------------------------------
def fused_stack_forward(chain, spec: StackSpec, var, x, interpret=False):
    """Eval-mode forward of the whole stack: (y, logdet (B,))."""
    packed, const_ld = pack_stack(chain, spec, var)
    fwd_kernel, _ = _make_kernels(spec)
    y, ld = _call(fwd_kernel, spec, packed, x, interpret)
    return y, ld + const_ld


def fused_stack_inverse(chain, spec: StackSpec, var, y, interpret=False):
    """Eval-mode inverse of the whole stack: (x, logdet (B,))."""
    packed, const_ld = pack_stack(chain, spec, var)
    _, inv_kernel = _make_kernels(spec)
    inv_packed = []
    for p in packed:
        q = dict(p)
        q["pre"] = p["prei"]
        if spec.has_mix:
            q["mix"] = p["mixi"]
        inv_packed.append(q)
    x, ld = _call(inv_kernel, spec, inv_packed, y, interpret)
    return x, ld - const_ld
