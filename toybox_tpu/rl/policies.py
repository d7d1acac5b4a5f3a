"""PolicyWithValue — flax head over a trunk network (reference
baselines/common/policies.py:13-115 + build_policy:117-).

The module produces (pd, value); ``step``/``value`` become pure functions
of (params, obs, key) suitable for jit/scan, replacing TF session calls.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from toybox_tpu.rl.distributions import make_pdtype
from toybox_tpu.rl.models import get_network_builder


class PolicyWithValue(nn.Module):
    trunk: nn.Module
    n_pdparams: int
    pd_builder: Callable = None
    estimate_q: bool = False
    n_value: int = 1

    @nn.compact
    def __call__(self, obs):
        latent = self.trunk(obs)
        logits = nn.Dense(self.n_pdparams,
                          kernel_init=nn.initializers.orthogonal(0.01),
                          bias_init=nn.initializers.zeros)(latent)
        if self.estimate_q:
            value = nn.Dense(self.n_pdparams)(latent)
        else:
            value = nn.Dense(self.n_value,
                             kernel_init=nn.initializers.orthogonal(1.0),
                             bias_init=nn.initializers.zeros)(latent)
            value = value[..., 0] if self.n_value == 1 else value
        return logits, value


def build_policy(obs_shape, action_space, network="cnn", **network_kwargs):
    """Returns (module, init_fn, step_fn, value_fn).

    - init_fn(key) -> params
    - step_fn(params, obs, key) -> (actions, values, neglogps, logits)
    - value_fn(params, obs) -> values
    """
    n_pdparams, pd_builder = make_pdtype(action_space)
    trunk = get_network_builder(network)(**network_kwargs)
    module = PolicyWithValue(trunk=trunk, n_pdparams=n_pdparams,
                             pd_builder=pd_builder)

    def init_fn(key):
        dummy = jnp.zeros((1,) + tuple(obs_shape), jnp.uint8)
        return module.init(key, dummy)

    def apply_fn(params, obs):
        return module.apply(params, obs)

    def step_fn(params, obs, key):
        logits, value = module.apply(params, obs)
        pd = pd_builder(logits)
        actions = pd.sample(key)
        neglogp = pd.neglogp(actions)
        return actions, value, neglogp, logits

    def value_fn(params, obs):
        _, value = module.apply(params, obs)
        return value

    return module, init_fn, step_fn, value_fn


def pd_from_logits(action_space, logits):
    _, pd_builder = make_pdtype(action_space)
    return pd_builder(logits)


RECURRENT_NETWORKS = ("lstm", "cnn_lstm", "cnn_lnlstm")


def build_recurrent_eval_policy(obs_shape, action_space, network,
                                nlstm=128, alg="ppo", **network_kwargs):
    """(init_fn, step_fn, carry_init) for recurrent checkpoints
    (ppo_recurrent / recurrent a2c / recurrent acer): step_fn threads the
    LSTM carry + episode-boundary flags, the way the reference --play
    loop threads model.initial_state (run.py:211-246). ACER checkpoints
    carry a Q head instead of pi+V, so their params only fit the Q-head
    module (same split as build_eval_policy)."""
    from toybox_tpu.rl.distributions import CategoricalPd
    from toybox_tpu.rl.models import LSTMTrunk

    trunk = get_network_builder(network)(nlstm=nlstm, **network_kwargs)
    if alg == "acer":
        from toybox_tpu.rl.acer import RecurrentQPolicy
        module = RecurrentQPolicy(trunk=trunk, n_actions=action_space)
    else:
        from toybox_tpu.rl.ppo_recurrent import RecurrentPolicyWithValue
        module = RecurrentPolicyWithValue(trunk=trunk,
                                          n_actions=action_space)

    def carry_init(n):
        return LSTMTrunk.initial_carry(n, nlstm)

    def init_fn(key):
        dummy = jnp.zeros((1,) + tuple(obs_shape), jnp.uint8)
        return module.init(key, dummy, carry_init(1),
                           jnp.zeros(1, bool))

    def step_fn(params, obs, key, carry, prev_done):
        logits, value, new_carry = module.apply(params, obs, carry,
                                                prev_done)
        pd = CategoricalPd(logits)
        actions = pd.sample(key)
        if value.ndim == 2:  # acer Q head [N, nact] -> V = E_pi[Q]
            # Same state-value the training-side Retrace target uses
            # (sum(softmax(logits) * q)); max(Q) would bias logged values
            # upward relative to what training optimized.
            value = jnp.sum(jax.nn.softmax(logits, -1) * value, axis=-1)
        return actions, value, pd.neglogp(actions), new_carry

    return init_fn, step_fn, carry_init


def build_eval_policy(alg, obs_shape, action_space, network,
                      **network_kwargs):
    """(init_fn, step_fn) able to LOAD a given algorithm's checkpoint for
    evaluation (regress gate, --play). Most algorithms share the
    PolicyWithValue pi+V template; ACER checkpoints carry a Q head
    (estimate_q=True -> Dense(nact) value head), so their params only fit
    the Q-head module."""
    if alg in ("deepq", "dqn"):
        from toybox_tpu.rl.dqn import QNetwork

        trunk = get_network_builder(network)(**network_kwargs)
        qnet = QNetwork(trunk=trunk, n_actions=action_space,
                        dueling=network_kwargs.pop("dueling", True))

        def init_fn(key):
            dummy = jnp.zeros((1,) + tuple(obs_shape), jnp.uint8)
            return qnet.init(key, dummy)

        def step_fn(params, obs, key, eps=0.01):
            q = qnet.apply(params, obs)
            greedy = jnp.argmax(q, axis=-1)
            ekey, akey = jax.random.split(key)
            rand = jax.random.randint(akey, greedy.shape, 0, action_space)
            explore = jax.random.uniform(ekey, greedy.shape) < eps
            actions = jnp.where(explore, rand, greedy)
            return actions, jnp.max(q, axis=-1), jnp.zeros(greedy.shape,
                                                           jnp.float32), q

        return init_fn, step_fn

    if alg == "acktr":
        # ACKTR checkpoints are KfacCNNPolicy variable dicts (a 'params'
        # collection of Kfac*-wrapped layers plus a 'perturbations'
        # collection of zero-parameter gradient taps).
        from toybox_tpu.rl.acktr import KfacCNNPolicy

        net = KfacCNNPolicy(n_actions=action_space)
        _, pd_builder = make_pdtype(action_space)

        def init_fn(key):
            dummy = jnp.zeros((1,) + tuple(obs_shape), jnp.uint8)
            return net.init(key, dummy)

        def step_fn(params, obs, key):
            logits, value = net.apply(params, obs)
            pd = pd_builder(logits)
            actions = pd.sample(key)
            return actions, value, pd.neglogp(actions), logits

        return init_fn, step_fn

    if alg == "acer":
        n_pdparams, pd_builder = make_pdtype(action_space)
        trunk = get_network_builder(network)(**network_kwargs)
        module = PolicyWithValue(trunk=trunk, n_pdparams=n_pdparams,
                                 estimate_q=True)

        def init_fn(key):
            dummy = jnp.zeros((1,) + tuple(obs_shape), jnp.uint8)
            return module.init(key, dummy)

        def step_fn(params, obs, key):
            logits, q = module.apply(params, obs)
            pd = pd_builder(logits)
            actions = pd.sample(key)
            value = jnp.sum(jax.nn.softmax(logits, -1) * q, axis=-1)
            return actions, value, pd.neglogp(actions), logits

        return init_fn, step_fn

    _, init_fn, step_fn, _ = build_policy(obs_shape, action_space, network,
                                          **network_kwargs)
    return init_fn, step_fn
