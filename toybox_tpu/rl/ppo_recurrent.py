"""Recurrent-policy PPO (lstm / cnn_lstm / cnn_lnlstm networks).

The reference's ppo2 supports recurrent policies by threading TF RNN
states through the runner and training on env-contiguous minibatches with
done masks (ppo2/ppo2.py `states`/`masks`). Same scheme here, jit-native:
the LSTM carry rides the rollout scan; training minibatches are blocks of
ENVS (sequences stay contiguous) and the network is re-run over the time
axis from the rollout's initial carry with the recorded done flags
resetting state at episode boundaries.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

from toybox_tpu.rl.distributions import CategoricalPd
from toybox_tpu.rl.models import LSTMTrunk, get_network_builder

F32 = jnp.float32


class RecurrentPolicyWithValue(nn.Module):
    trunk: LSTMTrunk
    n_actions: int

    @nn.compact
    def __call__(self, obs, carry, done):
        latent, new_carry = self.trunk(obs, carry, done)
        logits = nn.Dense(self.n_actions,
                          kernel_init=nn.initializers.orthogonal(0.01),
                          bias_init=nn.initializers.zeros)(latent)
        value = nn.Dense(1, kernel_init=nn.initializers.orthogonal(1.0),
                         bias_init=nn.initializers.zeros)(latent)[..., 0]
        return logits, value, new_carry


@struct.dataclass
class RecurrentPPOState:
    params: Any
    opt_state: Any
    env_state: Any
    carry: Any              # live LSTM carry (tuple of [N, nlstm])
    prev_done: jnp.ndarray  # bool[N] — episode boundary for the next obs
    key: jnp.ndarray
    update: jnp.ndarray


def make_recurrent_ppo(env_fns, *, network="cnn_lstm", nlstm=128,
                       lr=2.5e-4, cliprange=0.1, nsteps=128,
                       nminibatches=4, noptepochs=4, gamma=0.99, lam=0.95,
                       ent_coef=0.01, vf_coef=0.5, max_grad_norm=0.5,
                       total_updates=1, network_kwargs=None):
    num_envs = env_fns.num_envs
    assert num_envs % nminibatches == 0, \
        "recurrent minibatches are blocks of envs"
    mb_envs = num_envs // nminibatches

    trunk = get_network_builder(network)(nlstm=nlstm,
                                         **(network_kwargs or {}))
    assert isinstance(trunk, LSTMTrunk), f"{network} is not recurrent"
    module = RecurrentPolicyWithValue(trunk=trunk,
                                      n_actions=env_fns.num_actions)

    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.scale_by_adam(eps=1e-5),
        optax.scale(-1.0),
    )

    def init_fn(seed=0):
        key = jax.random.PRNGKey(seed)
        key, pkey, ekey = jax.random.split(key, 3)
        seeds = (jax.random.randint(ekey, (num_envs,), 0, 2**31 - 1)
                 .astype(jnp.uint32))
        env_state, obs = env_fns.reset(seeds)
        carry = LSTMTrunk.initial_carry(num_envs, nlstm)
        params = module.init(pkey, obs, carry, jnp.zeros(num_envs, bool))
        state = RecurrentPPOState(
            params=params, opt_state=tx.init(params), env_state=env_state,
            carry=carry, prev_done=jnp.zeros(num_envs, bool), key=key,
            update=jnp.asarray(0, jnp.int32))
        return jax.tree_util.tree_map(jnp.array, state)

    def train_step(state: RecurrentPPOState):
        frac = jnp.maximum(
            1.0 - state.update.astype(F32) / max(total_updates, 1), 0.01)
        lrnow = lr * frac
        cliprnow = cliprange * frac

        carry0 = state.carry
        done0 = state.prev_done

        # --- rollout with carry threading ---------------------------------
        def body(c, _):
            env_state, carry, prev_done, key = c
            obs = env_state.frames
            key, akey = jax.random.split(key)
            logits, values, new_carry = module.apply(state.params, obs,
                                                     carry, prev_done)
            pd = CategoricalPd(logits)
            actions = pd.sample(akey)
            neglogps = pd.neglogp(actions)
            env_state, _, rewards, dones, info = env_fns.step(
                env_state, actions.astype(jnp.int32))
            out = (obs, actions, values, neglogps, rewards, dones,
                   prev_done, info["episode_return"])
            return (env_state, new_carry, dones, key), out

        (env_state, carry, prev_done, key), traj = jax.lax.scan(
            body, (state.env_state, carry0, done0, state.key), None,
            length=nsteps)
        (obs, actions, values, neglogps, rewards, dones, prev_dones,
         ep_ret) = traj

        _, last_value, _ = module.apply(state.params, env_state.frames,
                                        carry, prev_done)

        def gae_body(c, t):
            v, r, d = t
            next_adv, next_v = c
            nonterm = 1.0 - d.astype(F32)
            delta = r + gamma * next_v * nonterm - v
            adv = delta + gamma * lam * nonterm * next_adv
            return (adv, v), adv

        (_, _), advs = jax.lax.scan(gae_body,
                                    (jnp.zeros_like(last_value), last_value),
                                    (values, rewards, dones), reverse=True)
        returns = advs + values

        def _loss(params, env_idx):
            """Re-run the policy over time for a block of envs."""
            o = obs[:, env_idx]
            a = actions[:, env_idx]
            nlp_old = neglogps[:, env_idx]
            val_old = values[:, env_idx]
            ret = returns[:, env_idx]
            adv = advs[:, env_idx]
            pd0 = jax.tree_util.tree_map(lambda c: c[env_idx], carry0)
            pdone = prev_dones[:, env_idx]

            def scan_net(c, t):
                ob, dn = t
                logits, value, c = module.apply(params, ob, c, dn)
                return c, (logits, value)

            _, (logits, vpred) = jax.lax.scan(scan_net, pd0, (o, pdone))
            pd = CategoricalPd(logits)
            nlp = pd.neglogp(a)
            entropy = jnp.mean(pd.entropy())

            vpredclipped = val_old + jnp.clip(vpred - val_old, -cliprnow,
                                              cliprnow)
            vf_loss = 0.5 * jnp.mean(jnp.maximum(
                jnp.square(vpred - ret), jnp.square(vpredclipped - ret)))
            ratio = jnp.exp(nlp_old - nlp)
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)
            pg_loss = jnp.mean(jnp.maximum(
                -adv * ratio,
                -adv * jnp.clip(ratio, 1.0 - cliprnow, 1.0 + cliprnow)))
            loss = pg_loss - entropy * ent_coef + vf_loss * vf_coef
            return loss, dict(policy_loss=pg_loss, value_loss=vf_loss,
                              policy_entropy=entropy)

        def epoch_body(c, ekey):
            params, opt_state = c
            perm = jax.random.permutation(ekey, num_envs)

            def mb_body(c, i):
                params, opt_state = c
                idx = jax.lax.dynamic_slice_in_dim(perm, i * mb_envs,
                                                   mb_envs)
                (loss, metrics), grads = jax.value_and_grad(
                    _loss, has_aux=True)(params, idx)
                updates, opt_state = tx.update(grads, opt_state, params)
                updates = jax.tree_util.tree_map(lambda u: u * lrnow,
                                                 updates)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), metrics

            (params, opt_state), metrics = jax.lax.scan(
                mb_body, (params, opt_state), jnp.arange(nminibatches))
            return (params, opt_state), metrics

        key, *ekeys = jax.random.split(key, noptepochs + 1)
        (params, opt_state), metrics = jax.lax.scan(
            epoch_body, (state.params, state.opt_state), jnp.stack(ekeys))

        metrics = jax.tree_util.tree_map(jnp.mean, metrics)
        done_eps = ~jnp.isnan(ep_ret)
        n_eps = jnp.sum(done_eps.astype(F32))
        metrics["eprewmean"] = jnp.where(
            n_eps > 0, jnp.nansum(jnp.where(done_eps, ep_ret, 0.0)) / n_eps,
            jnp.nan)
        metrics["mean_reward"] = jnp.mean(rewards)

        return RecurrentPPOState(
            params=params, opt_state=opt_state, env_state=env_state,
            carry=carry, prev_done=prev_done, key=key,
            update=state.update + 1), metrics

    return init_fn, train_step, module


def learn(*, env=None, game="breakout", num_envs=8, total_timesteps=10_000,
          seed=0, network="cnn_lstm", nlstm=128, nsteps=128, nminibatches=4,
          noptepochs=4, lr=2.5e-4, cliprange=0.1, gamma=0.99, lam=0.95,
          ent_coef=0.01, vf_coef=0.5, max_grad_norm=0.5, log_interval=1,
          save_path=None, load_path=None, logger=None, network_kwargs=None,
          **_ignored):
    import time

    from toybox_tpu.envs.pipeline import make_rl_env
    from toybox_tpu.rl.ppo import load_params, save_params

    env_fns = env if env is not None else make_rl_env(game, num_envs)
    nbatch = env_fns.num_envs * nsteps
    fpstep = getattr(env_fns, "frames_per_step", 1)  # actual frameskip
    total_updates = max(int(total_timesteps) // (nbatch * fpstep), 1)

    init_fn, train_step, _ = make_recurrent_ppo(
        env_fns, network=network, nlstm=nlstm, lr=lr, cliprange=cliprange,
        nsteps=nsteps, nminibatches=nminibatches, noptepochs=noptepochs,
        gamma=gamma, lam=lam, ent_coef=ent_coef, vf_coef=vf_coef,
        max_grad_norm=max_grad_norm, total_updates=total_updates,
        network_kwargs=network_kwargs)

    state = init_fn(seed)
    if load_path is not None:
        state = state.replace(params=load_params(load_path, state.params))

    step_jit = jax.jit(train_step, donate_argnums=(0,))
    t0 = time.perf_counter()
    for update in range(1, total_updates + 1):
        state, metrics = step_jit(state)
        if logger is not None and update % log_interval == 0:
            m = jax.device_get(metrics)
            logger.logkv("nupdates", update)
            logger.logkv("fps", int(update * nbatch * fpstep
                                    / (time.perf_counter() - t0)))
            for k, v in m.items():
                logger.logkv(k, float(v))
            logger.dumpkvs()
    jax.block_until_ready(state.params)
    if save_path is not None:
        save_params(save_path, state.params)
    return state
