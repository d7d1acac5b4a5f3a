"""Action distributions — functional equivalents of the reference's
baselines/common/distributions.py Pd/PdType hierarchy (Categorical,
MultiCategorical, DiagGaussian, Bernoulli; make_pdtype from a gym space).

Each distribution is a lightweight struct over its flat parameters with
pure methods, so it composes with jit/vmap/scan.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CategoricalPd:
    logits: Any  # [..., n]

    def sample(self, key):
        return jax.random.categorical(key, self.logits, axis=-1)

    def mode(self):
        return jnp.argmax(self.logits, axis=-1)

    def neglogp(self, actions):
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        onehot = jax.nn.one_hot(actions, self.logits.shape[-1],
                                dtype=logp.dtype)
        return -jnp.sum(onehot * logp, axis=-1)

    def entropy(self):
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        p = jnp.exp(logp)
        return -jnp.sum(p * logp, axis=-1)

    def kl(self, other: "CategoricalPd"):
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        logq = jax.nn.log_softmax(other.logits, axis=-1)
        p = jnp.exp(logp)
        return jnp.sum(p * (logp - logq), axis=-1)


@dataclasses.dataclass(frozen=True)
class MultiCategoricalPd:
    logits: Any       # [..., sum(ncats)]
    ncats: tuple

    def _split(self):
        out, ofs = [], 0
        for n in self.ncats:
            out.append(CategoricalPd(self.logits[..., ofs:ofs + n]))
            ofs += n
        return out

    def sample(self, key):
        keys = jax.random.split(key, len(self.ncats))
        return jnp.stack([pd.sample(k) for pd, k in
                          zip(self._split(), keys)], axis=-1)

    def mode(self):
        return jnp.stack([pd.mode() for pd in self._split()], axis=-1)

    def neglogp(self, actions):
        return sum(pd.neglogp(actions[..., i])
                   for i, pd in enumerate(self._split()))

    def entropy(self):
        return sum(pd.entropy() for pd in self._split())


@dataclasses.dataclass(frozen=True)
class DiagGaussianPd:
    mean: Any
    logstd: Any

    def sample(self, key):
        return (self.mean
                + jnp.exp(self.logstd) * jax.random.normal(
                    key, self.mean.shape, self.mean.dtype))

    def mode(self):
        return self.mean

    def neglogp(self, x):
        return (0.5 * jnp.sum(((x - self.mean) / jnp.exp(self.logstd)) ** 2,
                              axis=-1)
                + 0.5 * jnp.log(2.0 * jnp.pi) * x.shape[-1]
                + jnp.sum(self.logstd, axis=-1))

    def entropy(self):
        return jnp.sum(self.logstd + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e),
                       axis=-1)

    def kl(self, other: "DiagGaussianPd"):
        return jnp.sum(
            other.logstd - self.logstd
            + (jnp.exp(2 * self.logstd) + (self.mean - other.mean) ** 2)
            / (2.0 * jnp.exp(2 * other.logstd)) - 0.5, axis=-1)


@dataclasses.dataclass(frozen=True)
class BernoulliPd:
    logits: Any

    def _ps(self):
        return jax.nn.sigmoid(self.logits)

    def sample(self, key):
        return (jax.random.uniform(key, self.logits.shape)
                < self._ps()).astype(jnp.int32)

    def mode(self):
        return (self._ps() > 0.5).astype(jnp.int32)

    def neglogp(self, x):
        x = x.astype(self.logits.dtype)
        return jnp.sum(
            jnp.maximum(self.logits, 0) - self.logits * x
            + jnp.log1p(jnp.exp(-jnp.abs(self.logits))), axis=-1)

    def entropy(self):
        p = self._ps()
        eps = 1e-8
        return -jnp.sum(p * jnp.log(p + eps)
                        + (1 - p) * jnp.log(1 - p + eps), axis=-1)


def make_pdtype(space):
    """(n_params, builder) from a gym(nasium) space or an int action count
    (reference distributions.py make_pdtype)."""
    if isinstance(space, int):
        return space, lambda flat: CategoricalPd(flat)
    clsname = type(space).__name__
    if clsname == "Discrete":
        n = int(space.n)
        return n, lambda flat: CategoricalPd(flat)
    if clsname == "MultiDiscrete":
        ncats = tuple(int(x) for x in space.nvec)
        return sum(ncats), lambda flat: MultiCategoricalPd(flat, ncats)
    if clsname == "Box":
        import numpy as np
        size = int(np.prod(space.shape))
        def build(flat):
            mean, logstd = jnp.split(flat, 2, axis=-1)
            return DiagGaussianPd(mean, logstd)
        return 2 * size, build
    if clsname == "MultiBinary":
        n = int(space.n)
        return n, lambda flat: BernoulliPd(flat)
    raise NotImplementedError(f"no pdtype for space {space}")
