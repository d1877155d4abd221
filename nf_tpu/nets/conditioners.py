"""Conditioner networks used inside coupling layers.

Behavior parity: MLP / ConvNet / ResBlockLinear / ResBlock2d at
/root/reference/flows/modules.py:342-438 — residual blocks of
BN -> ReLU -> (weight-normed) dense/conv x2 with a bridge projection when
widths differ, an input projection, and a BN -> ReLU -> projection head.
"""
from __future__ import annotations

import jax

from .core import Net, Sequential, relu
from .layers import BatchNormNet, Conv2d, Dense


class ResBlockLinear(Net):
    def __init__(self, in_features: int, out_features: int, weight_norm: bool = True,
                 compute_dtype=None):
        self.net = Sequential([
            BatchNormNet(in_features),
            relu(),
            Dense(in_features, out_features, weight_norm, compute_dtype),
            BatchNormNet(out_features),
            relu(),
            Dense(out_features, out_features, weight_norm, compute_dtype),
        ])
        self.bridge = (Dense(in_features, out_features, weight_norm, compute_dtype)
                       if in_features != out_features else None)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        v = {"net": self.net.init(k1)}
        if self.bridge is not None:
            v["bridge"] = self.bridge.init(k2)
        return {"params": {k: x["params"] for k, x in v.items()},
                "state": {k: x["state"] for k, x in v.items()}}

    def apply(self, var, x, ctx):
        sub = {"params": var["params"]["net"], "state": var["state"]["net"]}
        y, net_state = self.net.apply(sub, x, ctx.child(0))
        state = dict(var["state"])
        state["net"] = net_state
        if self.bridge is not None:
            bsub = {"params": var["params"]["bridge"], "state": var["state"]["bridge"]}
            x, bstate = self.bridge.apply(bsub, x, ctx.child(1))
            state["bridge"] = bstate
        return x + y, state


class ResBlock2d(ResBlockLinear):
    def __init__(self, in_channels: int, out_channels: int, weight_norm: bool = True,
                 compute_dtype=None):
        self.net = Sequential([
            BatchNormNet(in_channels),
            relu(),
            Conv2d(in_channels, out_channels, 3, weight_norm, compute_dtype),
            BatchNormNet(out_channels),
            relu(),
            Conv2d(out_channels, out_channels, 3, weight_norm, compute_dtype),
        ])
        self.bridge = (Conv2d(in_channels, out_channels, 3, weight_norm, compute_dtype)
                       if in_channels != out_channels else None)


def MLP(in_features: int, out_features: int, base_filters: int = 32,
        n_blocks: int = 2, weight_norm: bool = True, compute_dtype=None) -> Net:
    """Dense conditioner: in-proj, n residual blocks, BN-ReLU-out-proj.

    ``compute_dtype`` (e.g. "bfloat16") runs the net's matmuls and
    activations in that dtype; master params, batch-norm statistics and
    the caller-facing output stay f32.
    """
    return Sequential(
        [Dense(in_features, base_filters, weight_norm, compute_dtype)]
        + [ResBlockLinear(base_filters, base_filters, weight_norm, compute_dtype)
           for _ in range(n_blocks)]
        + [BatchNormNet(base_filters), relu(),
           Dense(base_filters, out_features, weight_norm, compute_dtype)]
    )


def ConvNet(in_channels: int, out_channels: int, base_filters: int = 32,
            n_blocks: int = 2, weight_norm: bool = True, compute_dtype=None) -> Net:
    """Conv conditioner: 3x3 in-proj, n residual blocks, BN-ReLU-1x1 head.

    ``compute_dtype`` as in :func:`MLP` — bf16 convs halve activation HBM
    traffic and run single-pass on the MXU (the image-tier train lever,
    BENCH_DETAIL rooflines).
    """
    return Sequential(
        [Conv2d(in_channels, base_filters, 3, weight_norm, compute_dtype)]
        + [ResBlock2d(base_filters, base_filters, weight_norm, compute_dtype)
           for _ in range(n_blocks)]
        + [BatchNormNet(base_filters), relu(),
           Conv2d(base_filters, out_channels, 1, weight_norm, compute_dtype)]
    )
