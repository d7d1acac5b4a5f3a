"""ACER — actor-critic with experience replay.

Semantics from the reference's baselines/acer (acer.py + buffer.py +
policies.py): Q-head policy network (estimate_q), trajectory replay,
Retrace(1) off-policy Q targets, truncated importance sampling with bias
correction (c=10), entropy bonus, and the trust-region update that
projects the policy-head gradient against an average (Polyak) policy
network (delta=1, alpha=0.99). On-policy step + replay_ratio replayed
updates per cycle.

The trust-region projection is implemented exactly as gradient surgery on
the logits: g' = g - max(0, (k.g - delta)/||k||^2) k with k the gradient
of KL(avg || pi), then backpropagated through the trunk via the
sum(stop_grad(g') * logits) trick.
"""

from __future__ import annotations

import time
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

from toybox_tpu.envs.pipeline import make_rl_env
from toybox_tpu.rl.models import get_network_builder
from toybox_tpu.rl.policies import PolicyWithValue
from toybox_tpu.rl.distributions import CategoricalPd
from toybox_tpu.rl.ppo import load_params, save_params

F32 = jnp.float32
I32 = jnp.int32


@struct.dataclass
class TrajReplay:
    """Ring buffer of fixed-length trajectories (reference acer/buffer.py)."""
    obs: jnp.ndarray       # u8/f32 [cap, nsteps+1, N, ...]
    actions: jnp.ndarray   # i32[cap, nsteps, N]
    rewards: jnp.ndarray   # f32[cap, nsteps, N]
    mus: jnp.ndarray       # f32[cap, nsteps, N, nact] behavior probs
    dones: jnp.ndarray     # bool[cap, nsteps, N]
    cursor: jnp.ndarray
    size: jnp.ndarray


@struct.dataclass
class ACERState:
    params: Any
    avg_params: Any        # Polyak average policy (trust region anchor)
    opt_state: Any
    env_state: Any
    replay: TrajReplay
    key: jnp.ndarray
    update: jnp.ndarray


def _acer_losses(pi, logits, q, pi_avg, actions, rewards, mus, dones, *,
                 gamma, c, delta, ent_coef, q_coef, trust_region):
    """Retrace(1) targets + truncated-IS policy gain + trust-region
    logit surgery, given network outputs [T+1, N, nact] — shared by the
    feedforward and recurrent ACER variants (network-agnostic part of
    reference acer.py's train graph)."""
    T, num_envs = actions.shape
    nact = pi.shape[-1]

    pi_t, q_t, logits_t = pi[:-1], q[:-1], logits[:-1]
    v = jnp.sum(pi_t * q_t, axis=-1)                   # [T, N]
    v_last = jnp.sum(pi[-1] * q[-1], axis=-1)
    onehot = jax.nn.one_hot(actions, nact, dtype=F32)
    q_a = jnp.sum(q_t * onehot, axis=-1)
    pi_a = jnp.sum(pi_t * onehot, axis=-1)
    mu_a = jnp.sum(mus * onehot, axis=-1) + 1e-8
    rho = pi_t / (mus + 1e-8)                          # [T, N, nact]
    rho_a = pi_a / mu_a

    # Retrace backward recursion
    def retrace(carry, t):
        qret_next = carry
        r, d, qa, vv, ra = t
        qret = r + gamma * qret_next * (1.0 - d.astype(F32))
        out = qret
        qret_next = (jnp.minimum(1.0, ra) * (qret - qa) + vv)
        return qret_next, out

    _, qret = jax.lax.scan(
        retrace, v_last,
        (rewards, dones, q_a, v, rho_a), reverse=True)

    adv = qret - v
    logp_a = jnp.log(pi_a + 1e-8)
    gain_f = logp_a * jax.lax.stop_gradient(
        adv * jnp.minimum(c, rho_a))
    # bias correction over all actions
    adv_bc = q_t - v[..., None]
    gain_bc = jnp.sum(
        jnp.log(pi_t + 1e-8) * jax.lax.stop_gradient(
            adv_bc * jnp.maximum(0.0, 1.0 - c / (rho + 1e-8)) * pi_t),
        axis=-1)
    entropy = -jnp.sum(pi_t * jnp.log(pi_t + 1e-8), axis=-1)

    def policy_head_loss(lg):
        p = jax.nn.softmax(lg, axis=-1)
        p_a = jnp.sum(p * onehot, axis=-1)
        lf = jnp.log(p_a + 1e-8) * jax.lax.stop_gradient(
            adv * jnp.minimum(c, rho_a))
        lbc = jnp.sum(
            jnp.log(p + 1e-8) * jax.lax.stop_gradient(
                adv_bc * jnp.maximum(0.0, 1.0 - c / (rho + 1e-8))
                * pi_t), axis=-1)
        ent = -jnp.sum(p * jnp.log(p + 1e-8), axis=-1)
        return -jnp.mean(lf + lbc + ent_coef * ent)

    if trust_region:
        # gradient surgery on the logits vs the average policy
        g = jax.grad(policy_head_loss)(logits_t)       # dloss/dlogits
        # k = -grad of KL(avg||pi) wrt logits = avg - pi... using
        # softmax identity: dKL/dlogits = pi - pi_avg
        k = pi_t - pi_avg[:-1]
        kg = jnp.sum(k * g, axis=-1, keepdims=True)
        k2 = jnp.sum(k * k, axis=-1, keepdims=True)
        adj = jnp.maximum(0.0, (kg - delta) / (k2 + 1e-8))
        g_proj = g - adj * k
        pg_loss = jnp.sum(jax.lax.stop_gradient(g_proj) * logits_t) \
            / (T * num_envs)
    else:
        pg_loss = -jnp.mean(gain_f + gain_bc + ent_coef * entropy)

    q_loss = 0.5 * jnp.mean(
        jnp.square(jax.lax.stop_gradient(qret) - q_a))
    loss = pg_loss + q_coef * q_loss
    return loss, dict(pg_loss=pg_loss, q_loss=q_loss,
                      entropy=jnp.mean(entropy),
                      mean_rho=jnp.mean(rho_a))


def make_acer(env_fns, *, network="cnn_small", nsteps=20, lr=7e-4,
              gamma=0.99, q_coef=0.5, ent_coef=0.01, max_grad_norm=10.0,
              c=10.0, trust_region=True, delta=1.0, alpha=0.99,
              replay_ratio=4, buffer_traj=50, rprop_alpha=0.99,
              rprop_epsilon=1e-5, network_kwargs=None):
    num_envs = env_fns.num_envs
    nact = env_fns.num_actions
    obs_shape = tuple(env_fns.obs_shape)
    obs_dtype = jnp.uint8 if len(obs_shape) == 3 else F32

    trunk = get_network_builder(network)(**(network_kwargs or {}))
    module = PolicyWithValue(trunk=trunk, n_pdparams=nact, estimate_q=True)
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.scale_by_rms(decay=rprop_alpha, eps=rprop_epsilon),
        optax.scale(-lr),
    )

    def init_fn(seed=0):
        key = jax.random.PRNGKey(seed)
        key, pkey, ekey = jax.random.split(key, 3)
        params = module.init(pkey, jnp.zeros((1,) + obs_shape, obs_dtype))
        seeds = (jax.random.randint(ekey, (num_envs,), 0, 2**31 - 1)
                 .astype(jnp.uint32))
        env_state, _ = env_fns.reset(seeds)
        replay = TrajReplay(
            obs=jnp.zeros((buffer_traj, nsteps + 1, num_envs) + obs_shape,
                          obs_dtype),
            actions=jnp.zeros((buffer_traj, nsteps, num_envs), I32),
            rewards=jnp.zeros((buffer_traj, nsteps, num_envs), F32),
            mus=jnp.zeros((buffer_traj, nsteps, num_envs, nact), F32),
            dones=jnp.zeros((buffer_traj, nsteps, num_envs), jnp.bool_),
            cursor=jnp.asarray(0, I32),
            size=jnp.asarray(0, I32))
        st = ACERState(params=params,
                       avg_params=jax.tree_util.tree_map(jnp.array, params),
                       opt_state=tx.init(params), env_state=env_state,
                       replay=replay, key=key,
                       update=jnp.asarray(0, jnp.int32))
        return jax.tree_util.tree_map(jnp.array, st)

    def _apply(params, obs):
        """obs [T*N, ...] -> (pi probs, q)."""
        logits, q = module.apply(params, obs)
        return jax.nn.softmax(logits, axis=-1), logits, q

    def _traj_loss(params, avg_params, obs_seq, actions, rewards, mus,
                   dones):
        """obs_seq [T+1, N, ...]; others [T, N(, nact)]."""
        T = actions.shape[0]
        flat_obs = obs_seq.reshape((-1,) + obs_seq.shape[2:])
        pi, logits, q = _apply(params, flat_obs)
        pi = pi.reshape(T + 1, num_envs, nact)
        q = q.reshape(T + 1, num_envs, nact)
        logits = logits.reshape(T + 1, num_envs, nact)
        pi_avg, _, _ = _apply(avg_params, flat_obs)
        pi_avg = pi_avg.reshape(T + 1, num_envs, nact)
        return _acer_losses(pi, logits, q, pi_avg, actions, rewards, mus,
                            dones, gamma=gamma, c=c, delta=delta,
                            ent_coef=ent_coef, q_coef=q_coef,
                            trust_region=trust_region)

    def cycle(state: ACERState):
        # --- on-policy rollout -------------------------------------------
        def body(carry, _):
            env_state, key = carry
            obs = env_state.frames
            key, akey = jax.random.split(key)
            pi, _, _ = _apply(state.params, obs)
            actions = jax.random.categorical(akey, jnp.log(pi + 1e-8))
            env_state, _, rewards, dones, info = env_fns.step(
                env_state, actions.astype(I32))
            return (env_state, key), (obs, actions.astype(I32), rewards,
                                      pi, dones, info["episode_return"])

        (env_state, key), (obs, actions, rewards, mus, dones, ep_ret) = \
            jax.lax.scan(body, (state.env_state, state.key), None,
                         length=nsteps)
        obs_seq = jnp.concatenate(
            [obs, env_state.frames[None].astype(obs.dtype)], axis=0)

        # --- store trajectory --------------------------------------------
        rb = state.replay
        cap = rb.obs.shape[0]
        cur = rb.cursor
        rb = rb.replace(
            obs=rb.obs.at[cur].set(obs_seq),
            actions=rb.actions.at[cur].set(actions),
            rewards=rb.rewards.at[cur].set(rewards),
            mus=rb.mus.at[cur].set(mus),
            dones=rb.dones.at[cur].set(dones),
            cursor=(cur + 1) % cap,
            size=jnp.minimum(rb.size + 1, cap))

        # --- on-policy update + replayed updates --------------------------
        def sgd(params, opt_state, batch):
            (loss, metrics), grads = jax.value_and_grad(
                _traj_loss, has_aux=True)(params, state.avg_params, *batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        params, opt_state, metrics = sgd(
            state.params, state.opt_state,
            (obs_seq, actions, rewards, mus, dones))

        def replay_body(carry, rkey):
            params, opt_state = carry
            idx = jax.random.randint(rkey, (), 0, jnp.maximum(rb.size, 1))
            batch = (rb.obs[idx], rb.actions[idx], rb.rewards[idx],
                     rb.mus[idx], rb.dones[idx])
            params, opt_state, _ = sgd(params, opt_state, batch)
            return (params, opt_state), None

        key, *rkeys = jax.random.split(key, replay_ratio + 1)
        do_replay = rb.size > 1
        (params2, opt_state2), _ = jax.lax.scan(
            replay_body, (params, opt_state), jnp.stack(rkeys))
        params = jax.tree_util.tree_map(
            lambda a, b: jnp.where(do_replay, a, b), params2, params)
        opt_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(do_replay, a, b), opt_state2, opt_state)

        avg_params = jax.tree_util.tree_map(
            lambda a, p: alpha * a + (1 - alpha) * p, state.avg_params,
            params)

        done_eps = ~jnp.isnan(ep_ret)
        n_eps = jnp.sum(done_eps.astype(F32))
        metrics["eprewmean"] = jnp.where(
            n_eps > 0, jnp.nansum(jnp.where(done_eps, ep_ret, 0.0)) / n_eps,
            jnp.nan)
        metrics["mean_reward"] = jnp.mean(rewards)
        return ACERState(params=params, avg_params=avg_params,
                         opt_state=opt_state, env_state=env_state,
                         replay=rb, key=key,
                         update=state.update + 1), metrics

    return init_fn, cycle


class RecurrentQPolicy(nn.Module):
    """Recurrent ACER policy: lstm trunk + pi logits + Q head (the
    reference acer/policies.py lstm variant with estimate_q)."""
    trunk: Any
    n_actions: int

    @nn.compact
    def __call__(self, obs, carry, done):
        latent, new_carry = self.trunk(obs, carry, done)
        logits = nn.Dense(self.n_actions,
                          kernel_init=nn.initializers.orthogonal(0.01),
                          bias_init=nn.initializers.zeros)(latent)
        q = nn.Dense(self.n_actions,
                     kernel_init=nn.initializers.orthogonal(1.0),
                     bias_init=nn.initializers.zeros)(latent)
        return logits, q, new_carry


@struct.dataclass
class RecurrentTrajReplay:
    """TrajReplay + per-step episode-start masks. The reference replays
    recurrent trajectories from the ZERO lstm state with masks resetting
    at episode boundaries (acer.py:258 passes model.initial_state for
    both on-policy and replayed batches) — same scheme here."""
    obs: jnp.ndarray       # [cap, nsteps+1, N, ...]
    actions: jnp.ndarray   # i32[cap, nsteps, N]
    rewards: jnp.ndarray   # f32[cap, nsteps, N]
    mus: jnp.ndarray       # f32[cap, nsteps, N, nact]
    dones: jnp.ndarray     # bool[cap, nsteps, N]
    masks: jnp.ndarray     # bool[cap, nsteps+1, N] episode-start flags
    cursor: jnp.ndarray
    size: jnp.ndarray


@struct.dataclass
class RecurrentACERState:
    params: Any
    avg_params: Any
    opt_state: Any
    env_state: Any
    replay: RecurrentTrajReplay
    carry: Any              # live LSTM carry
    prev_done: jnp.ndarray  # bool[N]
    key: jnp.ndarray
    update: jnp.ndarray


def make_recurrent_acer(env_fns, *, network="cnn_lstm", nlstm=128,
                        nsteps=20, lr=7e-4, gamma=0.99, q_coef=0.5,
                        ent_coef=0.01, max_grad_norm=10.0, c=10.0,
                        trust_region=True, delta=1.0, alpha=0.99,
                        replay_ratio=4, buffer_traj=50, rprop_alpha=0.99,
                        rprop_epsilon=1e-5, network_kwargs=None):
    """ACER with lstm/cnn_lstm/cnn_lnlstm policies."""
    from toybox_tpu.rl.models import LSTMTrunk

    num_envs = env_fns.num_envs
    nact = env_fns.num_actions
    obs_shape = tuple(env_fns.obs_shape)
    obs_dtype = jnp.uint8 if len(obs_shape) == 3 else F32

    trunk = get_network_builder(network)(nlstm=nlstm,
                                         **(network_kwargs or {}))
    assert isinstance(trunk, LSTMTrunk), f"{network} is not recurrent"
    module = RecurrentQPolicy(trunk=trunk, n_actions=nact)
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.scale_by_rms(decay=rprop_alpha, eps=rprop_epsilon),
        optax.scale(-lr),
    )

    def init_fn(seed=0):
        key = jax.random.PRNGKey(seed)
        key, pkey, ekey = jax.random.split(key, 3)
        seeds = (jax.random.randint(ekey, (num_envs,), 0, 2**31 - 1)
                 .astype(jnp.uint32))
        env_state, obs = env_fns.reset(seeds)
        carry = LSTMTrunk.initial_carry(num_envs, nlstm)
        params = module.init(pkey, obs, carry, jnp.zeros(num_envs, bool))
        replay = RecurrentTrajReplay(
            obs=jnp.zeros((buffer_traj, nsteps + 1, num_envs) + obs_shape,
                          obs_dtype),
            actions=jnp.zeros((buffer_traj, nsteps, num_envs), I32),
            rewards=jnp.zeros((buffer_traj, nsteps, num_envs), F32),
            mus=jnp.zeros((buffer_traj, nsteps, num_envs, nact), F32),
            dones=jnp.zeros((buffer_traj, nsteps, num_envs), jnp.bool_),
            masks=jnp.zeros((buffer_traj, nsteps + 1, num_envs),
                            jnp.bool_),
            cursor=jnp.asarray(0, I32),
            size=jnp.asarray(0, I32))
        st = RecurrentACERState(
            params=params,
            avg_params=jax.tree_util.tree_map(jnp.array, params),
            opt_state=tx.init(params), env_state=env_state,
            replay=replay, carry=carry,
            prev_done=jnp.zeros(num_envs, bool), key=key,
            update=jnp.asarray(0, jnp.int32))
        return jax.tree_util.tree_map(jnp.array, st)

    def _apply_seq(params, obs_seq, masks_seq):
        """Run the net over time from the zero carry with episode-start
        masks; obs_seq [T+1, N, ...] -> (pi, logits, q) [T+1, N, nact]."""
        carry0 = LSTMTrunk.initial_carry(num_envs, nlstm)

        def scan_net(cr, t):
            ob, m = t
            logits, q, cr = module.apply(params, ob, cr, m)
            return cr, (logits, q)

        _, (logits, q) = jax.lax.scan(scan_net, carry0,
                                      (obs_seq, masks_seq))
        return jax.nn.softmax(logits, axis=-1), logits, q

    def _traj_loss(params, avg_params, obs_seq, actions, rewards, mus,
                   dones, masks_seq):
        pi, logits, q = _apply_seq(params, obs_seq, masks_seq)
        pi_avg, _, _ = _apply_seq(avg_params, obs_seq, masks_seq)
        return _acer_losses(pi, logits, q, pi_avg, actions, rewards, mus,
                            dones, gamma=gamma, c=c, delta=delta,
                            ent_coef=ent_coef, q_coef=q_coef,
                            trust_region=trust_region)

    def cycle(state: RecurrentACERState):
        # --- on-policy rollout with live carry ---------------------------
        def body(cr, _):
            env_state, carry, prev_done, key = cr
            obs = env_state.frames
            key, akey = jax.random.split(key)
            logits, _, new_carry = module.apply(state.params, obs, carry,
                                                prev_done)
            pi = jax.nn.softmax(logits, axis=-1)
            actions = jax.random.categorical(akey, jnp.log(pi + 1e-8))
            env_state, _, rewards, dones, info = env_fns.step(
                env_state, actions.astype(I32))
            out = (obs, actions.astype(I32), rewards, pi, dones,
                   prev_done, info["episode_return"])
            return (env_state, new_carry, dones, key), out

        (env_state, carry, prev_done, key), traj = jax.lax.scan(
            body, (state.env_state, state.carry, state.prev_done,
                   state.key), None, length=nsteps)
        obs, actions, rewards, mus, dones, prev_dones, ep_ret = traj
        obs_seq = jnp.concatenate(
            [obs, env_state.frames[None].astype(obs.dtype)], axis=0)
        # mask for the bootstrap obs = done after the last step
        masks_seq = jnp.concatenate([prev_dones, dones[-1:]], axis=0)

        # --- store trajectory --------------------------------------------
        rb = state.replay
        cap = rb.obs.shape[0]
        cur = rb.cursor
        rb = rb.replace(
            obs=rb.obs.at[cur].set(obs_seq),
            actions=rb.actions.at[cur].set(actions),
            rewards=rb.rewards.at[cur].set(rewards),
            mus=rb.mus.at[cur].set(mus),
            dones=rb.dones.at[cur].set(dones),
            masks=rb.masks.at[cur].set(masks_seq),
            cursor=(cur + 1) % cap,
            size=jnp.minimum(rb.size + 1, cap))

        # --- on-policy update + replayed updates --------------------------
        def sgd(params, opt_state, batch):
            (loss, metrics), grads = jax.value_and_grad(
                _traj_loss, has_aux=True)(params, state.avg_params, *batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        params, opt_state, metrics = sgd(
            state.params, state.opt_state,
            (obs_seq, actions, rewards, mus, dones, masks_seq))

        def replay_body(cr, rkey):
            params, opt_state = cr
            idx = jax.random.randint(rkey, (), 0, jnp.maximum(rb.size, 1))
            batch = (rb.obs[idx], rb.actions[idx], rb.rewards[idx],
                     rb.mus[idx], rb.dones[idx], rb.masks[idx])
            params, opt_state, _ = sgd(params, opt_state, batch)
            return (params, opt_state), None

        key, *rkeys = jax.random.split(key, replay_ratio + 1)
        do_replay = rb.size > 1
        (params2, opt_state2), _ = jax.lax.scan(
            replay_body, (params, opt_state), jnp.stack(rkeys))
        params = jax.tree_util.tree_map(
            lambda a, b: jnp.where(do_replay, a, b), params2, params)
        opt_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(do_replay, a, b), opt_state2, opt_state)

        avg_params = jax.tree_util.tree_map(
            lambda a, p: alpha * a + (1 - alpha) * p, state.avg_params,
            params)

        done_eps = ~jnp.isnan(ep_ret)
        n_eps = jnp.sum(done_eps.astype(F32))
        metrics["eprewmean"] = jnp.where(
            n_eps > 0, jnp.nansum(jnp.where(done_eps, ep_ret, 0.0)) / n_eps,
            jnp.nan)
        metrics["mean_reward"] = jnp.mean(rewards)
        return RecurrentACERState(
            params=params, avg_params=avg_params, opt_state=opt_state,
            env_state=env_state, replay=rb, carry=carry,
            prev_done=prev_done, key=key,
            update=state.update + 1), metrics

    return init_fn, cycle


def learn(*, env=None, game="breakout", num_envs=16, total_timesteps=100_000,
          seed=0, network="cnn_small", nsteps=20, lr=7e-4, gamma=0.99,
          q_coef=0.5, ent_coef=0.01, c=10.0, trust_region=True, delta=1.0,
          alpha=0.99, replay_ratio=4, buffer_traj=50, log_interval=20,
          save_path=None, load_path=None, logger=None, network_kwargs=None,
          cycles_per_jit=1, nlstm=128, **_ignored):
    from toybox_tpu.rl.policies import RECURRENT_NETWORKS

    env_fns = env if env is not None else make_rl_env(game, num_envs)
    recurrent = network in RECURRENT_NETWORKS
    maker = make_recurrent_acer if recurrent else make_acer
    extra_kw = {"nlstm": nlstm} if recurrent else {}
    init_fn, cycle = maker(
        env_fns, network=network, nsteps=nsteps, lr=lr, gamma=gamma,
        q_coef=q_coef, ent_coef=ent_coef, c=c, trust_region=trust_region,
        delta=delta, alpha=alpha, replay_ratio=replay_ratio,
        buffer_traj=buffer_traj, network_kwargs=network_kwargs,
        **extra_kw)
    state = init_fn(seed)
    if load_path is not None:
        state = state.replace(params=load_params(load_path, state.params))

    # like a2c's updates_per_jit: ACER's natural regime is many small
    # cycles; scan a block per dispatch so the remote-dispatch floor is
    # paid once per block instead of once per cycle
    upj = max(int(cycles_per_jit), 1)

    def cycle_block(state):
        def body(st, _):
            return cycle(st)

        state, ms = jax.lax.scan(body, state, None, length=upj)
        metrics = jax.tree_util.tree_map(lambda x: x[-1], ms)
        metrics["eprewmean"] = jnp.nanmean(ms["eprewmean"])
        return state, metrics

    cycle_jit = jax.jit(cycle_block, donate_argnums=(0,))
    fpstep = getattr(env_fns, "frames_per_step", 1)
    frames = env_fns.num_envs * nsteps * fpstep * upj
    ncycles = max(int(total_timesteps) // frames, 1)
    t0 = time.perf_counter()
    for i in range(1, ncycles + 1):
        state, metrics = cycle_jit(state)
        if logger is not None and i % max(log_interval // upj, 1) == 0:
            m = jax.device_get(metrics)
            logger.logkv("nupdates", i * upj)
            logger.logkv("fps", int(i * frames / (time.perf_counter() - t0)))
            for k, v in m.items():
                logger.logkv(k, float(v))
            logger.dumpkvs()
    jax.block_until_ready(state.params)
    if save_path is not None:
        save_params(save_path, state.params)
    return state
