"""GAIL — generative adversarial imitation learning.

Semantics from the reference's baselines/gail: a discriminator D(s, a)
trained to separate expert from policy transitions; the policy maximizes
the surrogate reward -log(1 - D) (equivalently here: the discriminator's
logit on policy data). The reference trains the generator with TRPO; this
implementation uses the PPO machinery for the generator update (clipped
surrogate on the adversarial reward) — same objective, simpler trust
region; set ``use_trpo_notes`` in defaults docs.
"""

from __future__ import annotations

import time
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

from toybox_tpu.rl.policies import build_policy, pd_from_logits

F32 = jnp.float32


class Discriminator(nn.Module):
    hidden: int = 100

    @nn.compact
    def __call__(self, obs, action_onehot):
        x = jnp.concatenate(
            [obs.reshape((obs.shape[0], -1)).astype(F32),
             action_onehot.astype(F32)], axis=-1)
        x = nn.tanh(nn.Dense(self.hidden)(x))
        x = nn.tanh(nn.Dense(self.hidden)(x))
        return nn.Dense(1)(x)[..., 0]     # logit; sigmoid > .5 == "expert"


@struct.dataclass
class GAILState:
    pi_params: Any
    disc_params: Any
    pi_opt: Any
    disc_opt: Any
    env_state: Any
    key: jnp.ndarray
    update: jnp.ndarray


def make_gail(env_fns, expert_obs, expert_actions, *, network="mlp",
              nsteps=32, pi_lr=3e-3, disc_lr=1e-3, disc_steps=2,
              gamma=0.99, lam=0.95, cliprange=0.2, ent_coef=0.001,
              noptepochs=2, network_kwargs=None):
    num_envs = env_fns.num_envs
    nact = env_fns.num_actions
    nbatch = num_envs * nsteps

    module, p_init, p_step, p_value = build_policy(
        env_fns.obs_shape, nact, network, **(network_kwargs or {}))
    disc = Discriminator()
    pi_tx = optax.adam(pi_lr)
    disc_tx = optax.adam(disc_lr)

    expert_onehot = jax.nn.one_hot(expert_actions, nact, dtype=F32)

    def init_fn(seed=0):
        key = jax.random.PRNGKey(seed)
        key, k1, k2, ekey = jax.random.split(key, 4)
        pi_params = p_init(k1)
        dummy_o = jnp.zeros((1,) + tuple(env_fns.obs_shape), F32)
        disc_params = disc.init(k2, dummy_o, jnp.zeros((1, nact), F32))
        seeds = (jax.random.randint(ekey, (num_envs,), 0, 2**31 - 1)
                 .astype(jnp.uint32))
        env_state, _ = env_fns.reset(seeds)
        st = GAILState(pi_params=pi_params, disc_params=disc_params,
                       pi_opt=pi_tx.init(pi_params),
                       disc_opt=disc_tx.init(disc_params),
                       env_state=env_state, key=key,
                       update=jnp.asarray(0, jnp.int32))
        return jax.tree_util.tree_map(jnp.array, st)

    def train_step(state: GAILState):
        # --- rollout ------------------------------------------------------
        def body(carry, _):
            env_state, key = carry
            obs = env_state.frames
            key, akey = jax.random.split(key)
            actions, values, neglogps, _ = p_step(state.pi_params, obs,
                                                  akey)
            env_state, _, _, dones, _ = env_fns.step(env_state, actions)
            return (env_state, key), (obs, actions, values, neglogps,
                                      dones)

        (env_state, key), (obs, actions, values, neglogps, dones) = \
            jax.lax.scan(body, (state.env_state, state.key), None,
                         length=nsteps)

        def fl(x):
            return x.reshape((nbatch,) + x.shape[2:])

        fobs, facts = fl(obs), fl(actions)
        pol_onehot = jax.nn.one_hot(facts, nact, dtype=F32)

        # --- discriminator update ----------------------------------------
        def disc_loss_fn(params, ekey):
            idx = jax.random.randint(ekey, (nbatch,), 0,
                                     expert_obs.shape[0])
            e_logit = disc.apply(params, expert_obs[idx],
                                 expert_onehot[idx])
            p_logit = disc.apply(params, fobs, pol_onehot)
            # expert -> 1, policy -> 0
            loss = (optax.sigmoid_binary_cross_entropy(
                        e_logit, jnp.ones_like(e_logit)).mean()
                    + optax.sigmoid_binary_cross_entropy(
                        p_logit, jnp.zeros_like(p_logit)).mean())
            acc = 0.5 * (jnp.mean(e_logit > 0) + jnp.mean(p_logit < 0))
            return loss, acc

        disc_params, disc_opt = state.disc_params, state.disc_opt
        dacc = jnp.asarray(0.0)
        for _ in range(disc_steps):
            key, dkey = jax.random.split(key)
            (dloss, dacc), dgrads = jax.value_and_grad(
                disc_loss_fn, has_aux=True)(disc_params, dkey)
            dupd, disc_opt = disc_tx.update(dgrads, disc_opt, disc_params)
            disc_params = optax.apply_updates(disc_params, dupd)

        # --- adversarial reward + GAE ------------------------------------
        logits_flat = disc.apply(disc_params, fobs, pol_onehot)
        # -log(1 - D): high when the policy fools the discriminator
        adv_reward = jax.nn.softplus(logits_flat)
        rewards = adv_reward.reshape(nsteps, num_envs)
        last_value = p_value(state.pi_params, env_state.frames)

        def gae_body(carry, t):
            v, r, d = t
            next_adv, next_v = carry
            nonterm = 1.0 - d.astype(F32)
            delta = r + gamma * next_v * nonterm - v
            adv = delta + gamma * lam * nonterm * next_adv
            return (adv, v), adv

        (_, _), advs = jax.lax.scan(gae_body,
                                    (jnp.zeros_like(last_value), last_value),
                                    (values, rewards, dones), reverse=True)
        returns = advs + values
        fadv = fl(advs)
        fadv = (fadv - fadv.mean()) / (fadv.std() + 1e-8)
        fnlp, fret, fval = fl(neglogps), fl(returns), fl(values)

        # --- PPO-style generator update ----------------------------------
        def pi_loss_fn(params):
            logits, vpred = module.apply(params, fobs)
            pd = pd_from_logits(nact, logits)
            nlp = pd.neglogp(facts)
            ratio = jnp.exp(fnlp - nlp)
            pg = jnp.mean(jnp.maximum(
                -fadv * ratio,
                -fadv * jnp.clip(ratio, 1 - cliprange, 1 + cliprange)))
            vf = 0.5 * jnp.mean(jnp.square(vpred - fret))
            ent = jnp.mean(pd.entropy())
            return pg + 0.5 * vf - ent_coef * ent, (pg, ent)

        pi_params, pi_opt = state.pi_params, state.pi_opt
        for _ in range(noptepochs):
            (ploss, (pg, ent)), pgrads = jax.value_and_grad(
                pi_loss_fn, has_aux=True)(pi_params)
            pupd, pi_opt = pi_tx.update(pgrads, pi_opt, pi_params)
            pi_params = optax.apply_updates(pi_params, pupd)

        metrics = dict(disc_loss=dloss, disc_acc=dacc, pg_loss=pg,
                       entropy=ent, adv_reward=jnp.mean(adv_reward))
        return GAILState(pi_params=pi_params, disc_params=disc_params,
                         pi_opt=pi_opt, disc_opt=disc_opt,
                         env_state=env_state, key=key,
                         update=state.update + 1), metrics

    return init_fn, train_step
