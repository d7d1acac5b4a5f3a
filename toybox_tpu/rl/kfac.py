"""K-FAC — Kronecker-factored approximate curvature optimizer.

The reference's acktr/kfac.py (926 LoC of TF graph surgery) reimplemented
the JAX way: layers that participate in K-FAC expose their inputs via
``sow`` and their pre-activation gradients via ``perturb`` (flax's
zero-parameter gradient taps), so one ``jax.grad`` call yields everything
the Kronecker factors need — no graph walking.

Per layer with weight W [in, out] (bias folded via input augmentation):
  A = E[a_bar a_bar^T]   (input second moment,  a_bar = [a, 1])
  S = E[g g^T]           (pre-activation gradient second moment)
  precond grad = A^{-1} dW S^{-1}   (with Tikhonov damping)
Conv layers reduce to the same form over extracted patches (KFC).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

F32 = jnp.float32


class KfacDense(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        self.sow("kfac", "a", x)
        y = nn.Dense(self.features, name="inner")(x)
        y = self.perturb("g", y)
        return y


class KfacConv(nn.Module):
    features: int
    kernel: int
    stride: int

    @nn.compact
    def __call__(self, x):
        self.sow("kfac", "a", x)
        y = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="VALID",
                    name="inner")(x)
        y = self.perturb("g", y)
        return y


def _factors_dense(a, g):
    """a [N, in], g [N, out] -> (A [in+1, in+1], S [out, out], N)."""
    n = a.shape[0]
    a_bar = jnp.concatenate([a, jnp.ones((n, 1), a.dtype)], axis=1)
    A = (a_bar.T @ a_bar) / n
    S = (g.T @ g) / n
    return A, S, n


def _factors_conv(a, g, kernel, stride):
    """a [N, H, W, Cin], g [N, Ho, Wo, Cout] -> Kronecker factors over
    patches (the KFC approximation)."""
    n = a.shape[0]
    patches = jax.lax.conv_general_dilated_patches(
        a.astype(F32), filter_shape=(kernel, kernel),
        window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # patches: [N, Ho, Wo, k*k*Cin] with channel-major ordering matching
    # the HWIO kernel reshape below
    t = patches.shape[1] * patches.shape[2]
    p = patches.reshape(-1, patches.shape[-1])      # [N*T, kkCin]
    gg = g.reshape(-1, g.shape[-1])                 # [N*T, Cout]
    p_bar = jnp.concatenate([p, jnp.ones((p.shape[0], 1), p.dtype)],
                            axis=1)
    A = (p_bar.T @ p_bar) / p.shape[0]
    # spatial positions are averaged into the grad factor (KFC: scale by T)
    S = (gg.T @ gg) / p.shape[0] * t
    return A, S, n


def _damped_inv(M, damping):
    d = M.shape[0]
    return jnp.linalg.inv(M + damping * jnp.eye(d, dtype=M.dtype))


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set(tree, path, value):
    """Functional deep-set on nested dicts."""
    if len(path) == 1:
        return {**tree, path[0]: value}
    return {**tree, path[0]: _set(tree[path[0]], path[1:], value)}


def kfac_factors(intermediates, perturb_grads, layer_meta):
    """Per-layer Kronecker factors {name: (A, S)} from one backward pass.

    - intermediates: the 'kfac' collection from apply(..., mutable=['kfac'])
    - perturb_grads: grads['perturbations'] (pre-activation grads)
    - layer_meta: {layer_name: ("dense",) | ("conv", kernel, stride)};
      layer_name is the '/'-joined module path of the Kfac* module.
    """
    out = {}
    for name, meta in layer_meta.items():
        path = tuple(name.split("/"))
        a = _get(intermediates["kfac"], path)["a"][0]
        g = _get(perturb_grads, path)["g"]
        if meta[0] == "dense":
            A, S, _ = _factors_dense(a, g)
        else:
            A, S, _ = _factors_conv(a, g, meta[1], meta[2])
        out[name] = (A, S)
    return out


def kfac_invert(factors, damping=0.01):
    """Damped inverses {name: (Ainv, Sinv)} with the trace-balanced pi
    split of the damping (Martens & Grosse; the reference kfac.py's
    fac/pi scaling). The O(n^3) step — the reference runs its inverse ops
    every few iterations, not every update, and so should callers."""
    out = {}
    for name, (A, S) in factors.items():
        pi = jnp.sqrt((jnp.trace(A) / A.shape[0])
                      / jnp.maximum(jnp.trace(S) / S.shape[0], 1e-8))
        out[name] = (_damped_inv(A, damping * pi),
                     _damped_inv(S, damping / jnp.maximum(pi, 1e-8)))
    return out


def kfac_apply(grads, inverses, layer_meta):
    """grads with every Kfac* layer's kernel/bias gradient replaced by
    Ainv @ G @ Sinv. Non-KFAC parameters keep their raw gradients."""
    g_params = grads["params"]
    for name, meta in layer_meta.items():
        path = tuple(name.split("/"))
        layer_g = _get(g_params, path)["inner"]
        dW, db = layer_g["kernel"], layer_g["bias"]
        Ainv, Sinv = inverses[name]
        if meta[0] == "dense":
            G = jnp.concatenate([dW, db[None, :]], axis=0)
            P = Ainv @ G @ Sinv
            pW, pb = P[:-1], P[-1]
        else:
            kshape = dW.shape                       # [k, k, cin, cout]
            G = jnp.concatenate([dW.reshape(-1, kshape[-1]), db[None, :]],
                                axis=0)
            P = Ainv @ G @ Sinv
            pW, pb = P[:-1].reshape(kshape), P[-1]
        g_params = _set(g_params, path + ("inner",),
                        {"kernel": pW, "bias": pb})
    return {**grads, "params": g_params}


def kfac_inverse_shapes(params, layer_meta):
    """Zero-initialized {name: (Ainv, Sinv)} matching kfac_invert's output
    shapes — the state placeholder before the first refresh."""
    out = {}
    for name, meta in layer_meta.items():
        path = tuple(name.split("/"))
        layer_p = _get(params["params"], path)["inner"]
        kshape = layer_p["kernel"].shape
        if meta[0] == "dense":
            din, dout = kshape[0] + 1, kshape[1]
        else:
            din = kshape[0] * kshape[1] * kshape[2] + 1
            dout = kshape[3]
        out[name] = (jnp.zeros((din, din), F32), jnp.zeros((dout, dout), F32))
    return out


def kfac_precondition(grads, intermediates, perturb_grads, layer_meta,
                      damping=0.01):
    """factors -> invert -> apply in one call (inverts every call; for
    the cheap periodic-inversion path carry kfac_invert's output in the
    training state and call kfac_apply)."""
    factors = kfac_factors(intermediates, perturb_grads, layer_meta)
    return kfac_apply(grads, kfac_invert(factors, damping), layer_meta)
