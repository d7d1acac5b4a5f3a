"""Policy network registry — flax equivalents of the reference's
baselines/common/models.py (mlp, cnn = nature_cnn :16-27, cnn_small,
conv_only, lstm/cnn_lstm variants).

Networks map uint8/float observations to a latent vector; the policy head
(toybox_tpu.rl.policies.PolicyWithValue) adds action logits + value. All
convs run in NHWC (XLA's preferred TPU layout) and compute in float32 by
default (bfloat16 via the ``dtype`` arg for MXU throughput).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_REGISTRY = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def get_network_builder(name: str) -> Callable:
    """reference models.py get_network_builder."""
    if callable(name):
        return name
    try:
        builder = _REGISTRY[name]
    except KeyError:
        raise ValueError(f"unknown network {name!r}; have {sorted(_REGISTRY)}")

    def build(**kwargs):
        # allow --dtype=bfloat16 from the CLI extras (strings -> dtypes)
        if isinstance(kwargs.get("dtype"), str):
            kwargs["dtype"] = jnp.dtype(kwargs["dtype"])
        return builder(**kwargs)

    return build


def _norm_obs(x, dtype):
    x = jnp.asarray(x)
    if x.dtype == jnp.uint8:
        x = x.astype(dtype) / 255.0
    else:
        x = x.astype(dtype)
    return x


class NatureCNN(nn.Module):
    """The Mnih et al. DQN/A3C trunk (reference models.py:16-27)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _norm_obs(x, self.dtype)
        x = nn.Conv(32, (8, 8), strides=(4, 4), padding="VALID",
                    dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(64, (4, 4), strides=(2, 2), padding="VALID",
                    dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), strides=(1, 1), padding="VALID",
                    dtype=self.dtype)(x)
        x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(512, dtype=self.dtype)(x)
        return nn.relu(x).astype(jnp.float32)


class Im2ColCNN(nn.Module):
    """NatureCNN with conv1 re-expressed as a LAYOUT-ONLY im2col (stride-4
    8x8 windows = concatenation of adjacent 4-blocks, zero FLOPs) feeding
    one big MXU matmul with a 256-deep contraction — a measured layout
    attack on the f32 conv roofline (round-5 VERDICT item 2). Same math
    as nn.Conv up to contraction order; params are NOT interchangeable
    with 'cnn' checkpoints."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _norm_obs(x, self.dtype)
        n, h, w, c = x.shape          # 84, 84: 21 blocks of 4 each way
        a = x.reshape(n, h // 4, 4, w // 4, 4, c)
        # 8-wide stride-4 windows = pairs of adjacent 4-blocks
        b = jnp.concatenate([a[:, :-1], a[:, 1:]], axis=2)   # [n,20,8,21,4,c]
        p = jnp.concatenate([b[:, :, :, :-1], b[:, :, :, 1:]], axis=4)
        p = p.transpose(0, 1, 3, 2, 4, 5).reshape(n, 20, 20, 8 * 8 * c)
        w1 = self.param("conv1_kernel", nn.initializers.lecun_normal(),
                        (8 * 8 * c, 32), self.dtype)
        b1 = self.param("conv1_bias", nn.initializers.zeros, (32,),
                        self.dtype)
        x = nn.relu(p @ w1 + b1)
        x = nn.relu(nn.Conv(64, (4, 4), strides=(2, 2), padding="VALID",
                            dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(64, (3, 3), strides=(1, 1), padding="VALID",
                            dtype=self.dtype)(x))
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(512, dtype=self.dtype)(x)
        return nn.relu(x).astype(jnp.float32)


class CoutPadCNN(nn.Module):
    """NatureCNN with every conv's OUTPUT channels zero-padded to 128
    lanes at apply time (kernels padded with zeros, outputs sliced back)
    — bitwise-identical results, 2-4x the nominal FLOPs, full MXU output
    lanes. A diagnostic layout attack: if wall-time is unchanged the
    convs are lane-bound, if it scales with FLOPs they are flop-bound."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _norm_obs(x, self.dtype)

        def padded_conv(x, ch, k, s, name):
            cin = x.shape[-1]
            kern = self.param(f"{name}_kernel",
                              nn.initializers.lecun_normal(),
                              (k, k, cin, ch), self.dtype)
            bias = self.param(f"{name}_bias", nn.initializers.zeros,
                              (ch,), self.dtype)
            kern = jnp.pad(kern, ((0, 0), (0, 0), (0, 0), (0, 128 - ch)))
            y = jax.lax.conv_general_dilated(
                x, kern, (s, s), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=self.dtype)
            return y[..., :ch] + bias

        x = nn.relu(padded_conv(x, 32, 8, 4, "c1"))
        x = nn.relu(padded_conv(x, 64, 4, 2, "c2"))
        x = nn.relu(padded_conv(x, 64, 3, 1, "c3"))
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(512, dtype=self.dtype)(x)
        return nn.relu(x).astype(jnp.float32)


class SmallCNN(nn.Module):
    """reference models.py cnn_small."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _norm_obs(x, self.dtype)
        x = nn.relu(nn.Conv(8, (8, 8), strides=(4, 4), padding="VALID",
                            dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(16, (4, 4), strides=(2, 2), padding="VALID",
                            dtype=self.dtype)(x))
        x = x.reshape((x.shape[0], -1))
        return nn.relu(nn.Dense(128, dtype=self.dtype)(x)).astype(jnp.float32)


class ConvOnly(nn.Module):
    """reference models.py conv_only (deepq's conv trunk)."""
    convs: Sequence = ((32, 8, 4), (64, 4, 2), (64, 3, 1))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _norm_obs(x, self.dtype)
        for ch, k, s in self.convs:
            x = nn.relu(nn.Conv(ch, (k, k), strides=(s, s), padding="VALID",
                                dtype=self.dtype)(x))
        return x.reshape((x.shape[0], -1)).astype(jnp.float32)


class MLP(nn.Module):
    """reference models.py mlp."""
    num_layers: int = 2
    num_hidden: int = 64
    activation: Callable = nn.tanh
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _norm_obs(x, self.dtype)
        x = x.reshape((x.shape[0], -1))
        for _ in range(self.num_layers):
            x = self.activation(nn.Dense(self.num_hidden, dtype=self.dtype)(x))
        return x.astype(jnp.float32)


class CNNLSTMCarry:
    """Marker: recurrent trunks return (latent, new_carry)."""


class LSTMTrunk(nn.Module):
    """reference models.py lstm / cnn_lstm / cnn_lnlstm: trunk + LSTMCell
    whose carry is threaded by the caller (we keep the recurrent state in
    the rollout scan carry, not hidden module state). layer_norm adds the
    lnlstm variant's normalization on the latent input."""
    base: nn.Module
    nlstm: int = 128
    layer_norm: bool = False

    @nn.compact
    def __call__(self, x, carry, done):
        latent = self.base(x)
        if self.layer_norm:
            latent = nn.LayerNorm()(latent)
        cell = nn.OptimizedLSTMCell(self.nlstm)
        # reset carry where episodes ended
        mask = (1.0 - done.astype(jnp.float32))[:, None]
        carry = tuple(c * mask for c in carry)
        carry, out = cell(carry, latent)
        return out, carry

    @staticmethod
    def initial_carry(batch, nlstm=128):
        return (jnp.zeros((batch, nlstm), jnp.float32),
                jnp.zeros((batch, nlstm), jnp.float32))


@register("cnn")
def cnn(**kwargs):
    return NatureCNN(**kwargs)


@register("nature_cnn")
def nature_cnn(**kwargs):
    return NatureCNN(**kwargs)


@register("cnn_small")
def cnn_small(**kwargs):
    return SmallCNN(**kwargs)


@register("cnn_im2col")
def cnn_im2col(**kwargs):
    return Im2ColCNN(**kwargs)


@register("cnn_coutpad")
def cnn_coutpad(**kwargs):
    return CoutPadCNN(**kwargs)


@register("conv_only")
def conv_only(**kwargs):
    return ConvOnly(**kwargs)


@register("mlp")
def mlp(**kwargs):
    return MLP(**kwargs)


@register("cnn_lstm")
def cnn_lstm(nlstm=128, **kwargs):
    return LSTMTrunk(base=NatureCNN(**kwargs), nlstm=nlstm)


@register("cnn_lnlstm")
def cnn_lnlstm(nlstm=128, **kwargs):
    return LSTMTrunk(base=NatureCNN(**kwargs), nlstm=nlstm, layer_norm=True)


@register("lstm")
def lstm(nlstm=128, **kwargs):
    return LSTMTrunk(base=MLP(**kwargs), nlstm=nlstm)
