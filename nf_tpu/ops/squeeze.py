"""Volume-preserving split/merge and space-to-depth reorderings (NHWC).

Behavior parity: /root/reference/flows/squeeze.py:5-111, re-laid-out for TPU.
The reference is NCHW; this framework is NHWC end to end, which keeps the
channel axis in the XLA minor-most (lane) dimension so channel splits/concats
are cheap relayouts and convs hit the MXU without transposes.

Checkerboard semantics: a 2x2 spatial block has positions
    a=(0,0)  b=(0,1)
    c=(1,0)  d=(1,1)
``checker_split`` performs space-to-depth then groups z0=[a,d] (the "even"
checker cells) and z1=[b,c] (the "odd" cells), matching the reference's
abcd -> (ad),(bc) grouping (flows/squeeze.py:32-44).
"""
from __future__ import annotations

import jax.numpy as jnp


def _space_to_depth(z):
    """(B, H, W, C) -> (B, H/2, W/2, 4C) with channel blocks [a, b, c, d]."""
    B, H, W, C = z.shape
    z = z.reshape(B, H // 2, 2, W // 2, 2, C)
    z = z.transpose(0, 1, 3, 2, 4, 5)  # (B, sH, sW, 2, 2, C)
    return z.reshape(B, H // 2, W // 2, 4 * C)


def _depth_to_space(z):
    """Inverse of ``_space_to_depth``."""
    B, sH, sW, C4 = z.shape
    C = C4 // 4
    z = z.reshape(B, sH, sW, 2, 2, C)
    z = z.transpose(0, 1, 3, 2, 4, 5)  # (B, sH, 2, sW, 2, C)
    return z.reshape(B, sH * 2, sW * 2, C)


def channel_split(z, odd: bool = False):
    C = z.shape[-1]
    z0, z1 = z[..., : C // 2], z[..., C // 2 :]
    return (z1, z0) if odd else (z0, z1)


def channel_merge(z0, z1, odd: bool = False):
    if odd:
        z0, z1 = z1, z0
    return jnp.concatenate([z0, z1], axis=-1)


def checker_split(z, odd: bool = False):
    """(B,H,W,C) -> two (B,H/2,W/2,2C) maps grouping (a,d) and (b,c) cells."""
    B, H, W, C = z.shape
    s = _space_to_depth(z)
    za, zb, zc, zd = (s[..., i * C : (i + 1) * C] for i in range(4))
    z0 = jnp.concatenate([za, zd], axis=-1)
    z1 = jnp.concatenate([zb, zc], axis=-1)
    return (z1, z0) if odd else (z0, z1)


def checker_merge(z0, z1, odd: bool = False):
    if odd:
        z0, z1 = z1, z0
    C = z0.shape[-1] // 2
    za, zd = z0[..., :C], z0[..., C:]
    zb, zc = z1[..., :C], z1[..., C:]
    s = jnp.concatenate([za, zb, zc, zd], axis=-1)
    return _depth_to_space(s)


def squeeze1d(z, odd: bool = False):
    """(B, D) -> two (B, D/2) halves of alternating entries."""
    B, D = z.shape
    z = z.reshape(B, D // 2, 2)
    z0, z1 = z[:, :, 0], z[:, :, 1]
    return (z1, z0) if odd else (z0, z1)


def unsqueeze1d(z0, z1, odd: bool = False):
    if odd:
        z0, z1 = z1, z0
    z = jnp.stack([z0, z1], axis=-1)
    return z.reshape(z.shape[0], -1)


def squeeze2d(z, odd: bool = False):
    """Space-to-depth then split 4C channels into two 2C halves [a,b],[c,d]."""
    s = _space_to_depth(z)
    C2 = s.shape[-1] // 2
    z0, z1 = s[..., :C2], s[..., C2:]
    return (z1, z0) if odd else (z0, z1)


def unsqueeze2d(z0, z1, odd: bool = False):
    if odd:
        z0, z1 = z1, z0
    s = jnp.concatenate([z0, z1], axis=-1)
    return _depth_to_space(s)
