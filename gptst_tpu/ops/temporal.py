"""Temporal convolution blocks (flax.linen modules).

Channels-last (B, T, N, C) layout: the time axis is convolved with
kernels of shape (kt, 1), which XLA lowers to MXU matmuls after an
implicit im2col. Equivalent to the reference's Conv2d over a
(B, C, T, N) layout (`model/STGCN/stgcn.py:25-53`).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def align_channels(x: jnp.ndarray, c_out: int,
                   proj: nn.Dense | None = None) -> jnp.ndarray:
    """Match channel width for residuals (`stgcn.py:10-23`):
    1x1 projection when shrinking, zero-pad when growing."""
    c_in = x.shape[-1]
    if c_in > c_out:
        assert proj is not None
        return proj(x)
    if c_in < c_out:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, c_out - c_in)]
        return jnp.pad(x, pad)
    return x


class TemporalConv(nn.Module):
    """STGCN temporal conv layer with GLU / sigmoid / relu activation.

    Reference (`stgcn.py:25-53`): SAME-padded (kt, 1) conv + aligned
    residual. GLU: (P + x_in) * sigmoid(Q) where conv produces [P; Q].
    """

    kt: int
    c_out: int
    act: str = "relu"  # "GLU" | "sigmoid" | "relu"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, T, N, C)
        c_in = x.shape[-1]
        proj = nn.Dense(self.c_out, use_bias=True) if c_in > self.c_out else None
        x_in = align_channels(x, self.c_out, proj)
        width = self.c_out * 2 if self.act == "GLU" else self.c_out
        # SAME padding via explicit symmetric pad (matches torch
        # padding=int((kt-1)/2) for odd kt).
        p = (self.kt - 1) // 2
        x_conv = nn.Conv(
            features=width, kernel_size=(self.kt, 1),
            padding=((p, self.kt - 1 - p), (0, 0)),
        )(x)
        if self.act == "GLU":
            p_part = x_conv[..., : self.c_out]
            q_part = x_conv[..., self.c_out:]
            return (p_part + x_in) * jax.nn.sigmoid(q_part)
        if self.act == "sigmoid":
            return jax.nn.sigmoid(x_conv + x_in)
        return jax.nn.relu(x_conv + x_in)


class DilatedInception(nn.Module):
    """MTGNN dilated inception layer (`model/MTGNN/MTGNN.py:130-146`).

    Parallel causal convs with kernel sizes {2, 3, 6, 7} at a given
    dilation; outputs truncated to the shortest and concatenated.
    """

    c_out: int
    dilation: int = 1
    kernel_set: tuple[int, ...] = (2, 3, 6, 7)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, T, N, C)
        per = self.c_out // len(self.kernel_set)
        outs = []
        for k in self.kernel_set:
            y = nn.Conv(
                features=per, kernel_size=(k, 1),
                kernel_dilation=(self.dilation, 1), padding="VALID",
            )(x)
            outs.append(y)
        t_min = min(o.shape[1] for o in outs)
        outs = [o[:, -t_min:] for o in outs]
        return jnp.concatenate(outs, axis=-1)


class GatedDilatedConv(nn.Module):
    """WaveNet-style gated dilated temporal conv (GWN,
    `model/GWN/GWN.py:242-265`): tanh(filter) * sigmoid(gate)."""

    c_out: int
    kernel: int = 2
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, T, N, C)
        f = nn.Conv(self.c_out, kernel_size=(self.kernel, 1),
                    kernel_dilation=(self.dilation, 1), padding="VALID")(x)
        g = nn.Conv(self.c_out, kernel_size=(self.kernel, 1),
                    kernel_dilation=(self.dilation, 1), padding="VALID")(x)
        return jnp.tanh(f) * jax.nn.sigmoid(g)
