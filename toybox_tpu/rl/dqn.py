"""DQN — deep Q-learning with device-resident replay.

Semantics from the reference deepq (baselines/deepq/deepq.py:92-332 learn
loop; build_graph.py:146-449 double-Q + dueling + the act-with-param-noise
graph; replay_buffer.py ring + prioritized). Atari defaults from
deepq/defaults.py:1-17 (conv_only, prioritized, dueling, buffer 10k,
lr 1e-4, train_freq 4, target sync 1k, exploration 10% of training to
eps .01). param_noise=True switches exploration to parameter-space noise:
actions are greedy w.r.t. a perturbed copy of the network, re-perturbed
each cycle, with the noise stddev adapted toward the epsilon-matched KL
threshold -log(1 - eps + eps/|A|) (build_graph.py:263-279).

TPU-native design: the replay buffer is a fixed-capacity ring of device
arrays; prioritized sampling uses a Gumbel-top-k draw over log-priorities
(equivalent to proportional sampling WITH replacement) instead of the
reference's segment trees — O(n) vectorized work on the VPU beats a
pointer-chasing tree on this hardware. One jitted "cycle" = train_freq env
steps + one sgd step + masked target sync.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

from toybox_tpu.envs.pipeline import make_rl_env
from toybox_tpu.rl.models import get_network_builder
from toybox_tpu.rl.ppo import load_params, save_params
from toybox_tpu.utils.checkpoint import Checkpointer

F32 = jnp.float32
I32 = jnp.int32


class QNetwork(nn.Module):
    trunk: nn.Module
    n_actions: int
    dueling: bool = True
    hiddens: int = 256

    @nn.compact
    def __call__(self, obs):
        latent = self.trunk(obs)
        a = nn.relu(nn.Dense(self.hiddens)(latent))
        action_scores = nn.Dense(self.n_actions)(a)
        if not self.dueling:
            return action_scores
        v = nn.relu(nn.Dense(self.hiddens)(latent))
        state_score = nn.Dense(1)(v)
        return state_score + (action_scores
                              - action_scores.mean(axis=-1, keepdims=True))


@struct.dataclass
class Replay:
    obs: jnp.ndarray        # u8[cap, ...]
    next_obs: jnp.ndarray   # u8[cap, ...]
    actions: jnp.ndarray    # i32[cap]
    rewards: jnp.ndarray    # f32[cap]
    dones: jnp.ndarray      # bool[cap]
    priorities: jnp.ndarray  # f32[cap]
    cursor: jnp.ndarray     # i32
    size: jnp.ndarray       # i32


def make_replay(capacity, obs_shape, obs_dtype=jnp.uint8):
    return Replay(
        obs=jnp.zeros((capacity,) + obs_shape, obs_dtype),
        next_obs=jnp.zeros((capacity,) + obs_shape, obs_dtype),
        actions=jnp.zeros(capacity, I32),
        rewards=jnp.zeros(capacity, F32),
        dones=jnp.zeros(capacity, jnp.bool_),
        priorities=jnp.zeros(capacity, F32),
        cursor=jnp.asarray(0, I32),
        size=jnp.asarray(0, I32),
    )


def replay_add(rb: Replay, obs, next_obs, actions, rewards, dones):
    """Insert a batch of transitions at the ring cursor."""
    n = obs.shape[0]
    cap = rb.obs.shape[0]
    idx = (rb.cursor + jnp.arange(n)) % cap
    max_p = jnp.maximum(jnp.max(rb.priorities), 1.0)
    return rb.replace(
        obs=rb.obs.at[idx].set(obs.astype(rb.obs.dtype)),
        next_obs=rb.next_obs.at[idx].set(next_obs.astype(rb.obs.dtype)),
        actions=rb.actions.at[idx].set(actions.astype(I32)),
        rewards=rb.rewards.at[idx].set(rewards.astype(F32)),
        dones=rb.dones.at[idx].set(dones),
        priorities=rb.priorities.at[idx].set(max_p),
        cursor=(rb.cursor + n) % cap,
        size=jnp.minimum(rb.size + n, cap),
    )


def replay_sample(rb: Replay, key, batch_size, alpha, beta):
    """Proportional prioritized sampling via Gumbel-max over
    log(p^alpha) — masked to the valid region."""
    cap = rb.obs.shape[0]
    valid = jnp.arange(cap) < rb.size
    logits = alpha * jnp.log(jnp.maximum(rb.priorities, 1e-8))
    logits = jnp.where(valid, logits, -jnp.inf)
    g = jax.random.gumbel(key, (batch_size, cap))
    idx = jnp.argmax(logits[None, :] + g, axis=-1)

    # importance weights (prioritized_replay_buffer.py semantics)
    p = jnp.exp(logits - jax.nn.logsumexp(logits))
    pi = p[idx]
    n = jnp.maximum(rb.size.astype(F32), 1.0)
    w = (n * jnp.maximum(pi, 1e-12)) ** (-beta)
    w = w / jnp.max(w)
    batch = (rb.obs[idx], rb.actions[idx], rb.rewards[idx],
             rb.next_obs[idx], rb.dones[idx])
    return batch, idx, w


@struct.dataclass
class DQNState:
    params: Any
    target_params: Any
    opt_state: Any
    env_state: Any
    replay: Replay
    key: jnp.ndarray
    t: jnp.ndarray          # env frames so far (for epsilon)
    pn_scale: jnp.ndarray   # f32 adaptive param-noise stddev


def _perturb(params, key, scale):
    """params + N(0, scale) on every weight (reference
    build_graph.py:176-207 perturbable-vars loop)."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    noisy = [p + scale * jax.random.normal(k, p.shape, p.dtype)
             for p, k in zip(leaves, keys)]
    return jax.tree_util.tree_unflatten(treedef, noisy)


def make_dqn(env_fns, *, network="conv_only", lr=1e-4, gamma=0.99,
             buffer_size=10000, batch_size=32, train_freq=4,
             learning_starts=1000, target_network_update_freq=1000,
             exploration_fraction=0.1, exploration_final_eps=0.01,
             total_timesteps=100_000, prioritized_replay=True,
             prioritized_replay_alpha=0.6, prioritized_replay_beta0=0.4,
             dueling=True, double_q=True, grad_norm_clipping=10.0,
             param_noise=False, param_noise_scale0=0.01,
             network_kwargs=None):
    num_envs = env_fns.num_envs
    obs_shape = tuple(env_fns.obs_shape)
    trunk = get_network_builder(network)(**(network_kwargs or {}))
    qnet = QNetwork(trunk=trunk, n_actions=env_fns.num_actions,
                    dueling=dueling)

    tx = optax.chain(optax.clip_by_global_norm(grad_norm_clipping),
                     optax.adam(lr, eps=1e-4))

    expl_steps = max(int(exploration_fraction * total_timesteps), 1)
    alpha = prioritized_replay_alpha if prioritized_replay else 0.0

    def init_fn(seed=0):
        key = jax.random.PRNGKey(seed)
        key, pkey, ekey = jax.random.split(key, 3)
        dummy = jnp.zeros((1,) + obs_shape, jnp.uint8)
        params = qnet.init(pkey, dummy)
        seeds = (jax.random.randint(ekey, (num_envs,), 0, 2**31 - 1)
                 .astype(jnp.uint32))
        env_state, _ = env_fns.reset(seeds)
        obs_dtype = env_state.frames.dtype
        st = DQNState(params=params,
                      target_params=jax.tree_util.tree_map(jnp.array, params),
                      opt_state=tx.init(params), env_state=env_state,
                      replay=make_replay(buffer_size, obs_shape, obs_dtype),
                      key=key, t=jnp.asarray(0, I32),
                      pn_scale=jnp.asarray(param_noise_scale0, F32))
        return jax.tree_util.tree_map(jnp.array, st)

    def _epsilon(t):
        frac = jnp.minimum(t.astype(F32) / expl_steps, 1.0)
        return 1.0 + frac * (exploration_final_eps - 1.0)

    def _beta(t):
        frac = jnp.minimum(t.astype(F32) / max(total_timesteps, 1), 1.0)
        return prioritized_replay_beta0 + frac * (1.0
                                                  - prioritized_replay_beta0)

    def cycle(state: DQNState):
        """train_freq env steps (epsilon-greedy, or greedy w.r.t. a
        parameter-noise-perturbed network) + one sgd step + masked
        target sync."""
        eps = _epsilon(state.t)

        key0 = state.key
        if param_noise:
            # fresh perturbation each cycle (reference re-perturbs on
            # every episode reset / scale update, build_graph.py:256-262)
            key0, pkey = jax.random.split(key0)
            act_params = _perturb(state.params, pkey, state.pn_scale)
        else:
            act_params = state.params

        def env_body(carry, _):
            env_state, replay, key = carry
            obs = env_state.frames
            key, akey, rkey = jax.random.split(key, 3)
            q = qnet.apply(act_params, obs)
            greedy = jnp.argmax(q, axis=-1)
            if param_noise:
                # exploration comes from the weight noise itself
                actions = greedy.astype(I32)
            else:
                rand = jax.random.randint(rkey, (num_envs,), 0,
                                          env_fns.num_actions)
                explore = jax.random.uniform(akey, (num_envs,)) < eps
                actions = jnp.where(explore, rand, greedy).astype(I32)
            env_state, next_obs, rewards, dones, _ = env_fns.step(env_state,
                                                                  actions)
            replay = replay_add(replay, obs, env_state.frames, actions,
                                rewards, dones)
            return (env_state, replay, key), None

        (env_state, replay, key), _ = jax.lax.scan(
            env_body, (state.env_state, state.replay, key0), None,
            length=train_freq)

        t = state.t + train_freq * num_envs

        # one sgd step once the buffer has warmed up
        key, skey = jax.random.split(key)
        (bobs, bact, brew, bnext, bdone), idx, w = replay_sample(
            replay, skey, batch_size, alpha, _beta(t))

        def loss_fn(params):
            q = qnet.apply(params, bobs)
            q_sel = jnp.take_along_axis(q, bact[:, None], axis=-1)[:, 0]
            q_next_t = qnet.apply(state.target_params, bnext)
            if double_q:
                q_next_o = qnet.apply(params, bnext)
                best = jnp.argmax(q_next_o, axis=-1)
            else:
                best = jnp.argmax(q_next_t, axis=-1)
            q_next = jnp.take_along_axis(q_next_t, best[:, None],
                                         axis=-1)[:, 0]
            target = brew + gamma * (1.0 - bdone.astype(F32)) * \
                jax.lax.stop_gradient(q_next)
            td = q_sel - target
            # huber loss (build_graph.py uses huber with delta 1)
            loss = jnp.where(jnp.abs(td) < 1.0, 0.5 * td * td,
                             jnp.abs(td) - 0.5)
            return jnp.mean(w * loss), td

        (loss, td), grads = jax.value_and_grad(loss_fn,
                                               has_aux=True)(state.params)
        warm = t >= learning_starts
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(
            lambda u: jnp.where(warm, u, jnp.zeros_like(u)), updates)
        params = optax.apply_updates(state.params, updates)
        opt_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(warm, a, b), opt_state, state.opt_state)

        # new priorities for sampled transitions
        if prioritized_replay:
            new_p = jnp.abs(td) + 1e-6
            replay = replay.replace(
                priorities=jnp.where(
                    warm, replay.priorities.at[idx].set(new_p),
                    replay.priorities))

        # target sync on schedule
        sync = (t // target_network_update_freq) \
            != (state.t // target_network_update_freq)
        target_params = jax.tree_util.tree_map(
            lambda p, tp: jnp.where(sync, p, tp), params,
            state.target_params)

        # adaptive param-noise scale (reference build_graph.py:263-279 +
        # deepq.py:201-207): perturb an adaptive copy, measure the mean
        # KL between softmax(q) and softmax(q_perturbed) on the sampled
        # batch, and walk the scale toward the epsilon-matched threshold
        # -log(1 - eps + eps/|A|).
        pn_scale = state.pn_scale
        if param_noise:
            key, adkey = jax.random.split(key)
            ad_params = _perturb(params, adkey, pn_scale)
            logp = jax.nn.log_softmax(qnet.apply(params, bobs))
            logq = jax.nn.log_softmax(qnet.apply(ad_params, bobs))
            kl = jnp.mean(jnp.sum(jnp.exp(logp) * (logp - logq), axis=-1))
            threshold = -jnp.log(1.0 - eps + eps / env_fns.num_actions)
            pn_scale = jnp.where(kl > threshold, pn_scale / 1.01,
                                 pn_scale * 1.01)

        metrics = dict(loss=loss, epsilon=eps,
                       mean_q=jnp.mean(jnp.abs(td)))
        if param_noise:
            metrics["param_noise_scale"] = pn_scale
        return DQNState(params=params, target_params=target_params,
                        opt_state=opt_state, env_state=env_state,
                        replay=replay, key=key, t=t,
                        pn_scale=pn_scale), metrics

    return init_fn, cycle, qnet


def learn(*, env=None, game="breakout", num_envs=4, total_timesteps=100_000,
          seed=0, network="conv_only", lr=1e-4, buffer_size=10000,
          exploration_fraction=0.1, exploration_final_eps=0.01,
          train_freq=4, batch_size=32, learning_starts=1000,
          target_network_update_freq=1000, gamma=0.99,
          prioritized_replay=True, dueling=True, double_q=True,
          param_noise=False, log_interval=500, save_path=None,
          load_path=None, logger=None, network_kwargs=None,
          checkpoint_path=None, checkpoint_freq=50, **_ignored):
    env_fns = env if env is not None else make_rl_env(game, num_envs)

    init_fn, cycle, _ = make_dqn(
        env_fns, network=network, lr=lr, gamma=gamma,
        buffer_size=buffer_size, batch_size=batch_size,
        train_freq=train_freq, learning_starts=learning_starts,
        target_network_update_freq=target_network_update_freq,
        exploration_fraction=exploration_fraction,
        exploration_final_eps=exploration_final_eps,
        total_timesteps=total_timesteps,
        prioritized_replay=prioritized_replay, dueling=dueling,
        double_q=double_q, param_noise=param_noise,
        network_kwargs=network_kwargs)

    state = init_fn(seed)
    if load_path is not None:
        state = state.replace(params=load_params(load_path, state.params))

    # batch many cycles into one jitted scan: a per-cycle host loop is
    # dispatch-latency-bound (each cycle is tiny device work)
    jit_cycles = max(int(_ignored.get("jit_cycles", 16)), 1)

    # restore-latest (reference deepq/deepq.py:268-276); state.t counts
    # env steps, so the resume point in cycles falls out of it
    ckpt = Checkpointer(checkpoint_path, checkpoint_freq)
    state = ckpt.restore(state)
    start_cycle = int(state.t) // (train_freq * env_fns.num_envs
                                   * jit_cycles)

    @partial(jax.jit, donate_argnums=(0,))
    def run_cycles(state):
        def body(st, _):
            st, metrics = cycle(st)
            return st, metrics
        state, metrics = jax.lax.scan(body, state, None, length=jit_cycles)
        return state, jax.tree_util.tree_map(lambda m: m[-1], metrics)

    # engine frames per env.step — follow the env's actual frameskip
    fpstep = getattr(env_fns, "frames_per_step", 1)
    frames_per_cycle = train_freq * env_fns.num_envs * fpstep * jit_cycles
    ncycles = max(int(total_timesteps) // frames_per_cycle, 1)
    t0 = time.perf_counter()
    for i in range(start_cycle + 1, ncycles + 1):
        state, metrics = run_cycles(state)
        if logger is not None and i % log_interval == 0:
            m = jax.device_get(metrics)
            logger.logkv("steps", i * frames_per_cycle)
            logger.logkv("fps", int((i - start_cycle) * frames_per_cycle /
                                    (time.perf_counter() - t0)))
            for k, v in m.items():
                logger.logkv(k, float(v))
            logger.dumpkvs()
        ckpt.maybe_save(state, i)
    jax.block_until_ready(state.params)
    if save_path is not None:
        save_params(save_path, state.params)
    return state


# ---------------------------------------------------------------------------
# Multi-chip dry run (driver contract: __graft_entry__.dryrun_multichip)
# ---------------------------------------------------------------------------

def dryrun(n_devices: int, game: str = "breakout") -> None:
    """Jit one full DQN cycle over an n-device mesh and run it on tiny
    shapes. Structurally distinct from PPO's dp: the replay ring is
    DISTRIBUTED — sharded on its capacity axis so each device holds a
    slice of the transition store; inserts land on the writer's shard
    and the prioritized Gumbel-max sample reduces across all shards
    (XLA inserts the collectives)."""
    import numpy as _np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = jax.devices()[:n_devices]
    mesh = Mesh(_np.array(devices), ("env",))
    num_envs = 2 * n_devices
    capacity = 16 * n_devices

    env_fns = make_rl_env(game, num_envs, frame_size=84)
    init_fn, cycle, _ = make_dqn(
        env_fns, network="cnn_small", buffer_size=capacity, batch_size=8,
        train_freq=2, learning_starts=0, total_timesteps=64,
        prioritized_replay=True, dueling=True, double_q=True)
    state = init_fn(0)

    shard = NamedSharding(mesh, P("env"))
    repl = NamedSharding(mesh, P())

    def put(tree, leading):
        """Shard leaves whose leading axis == `leading`; replicate rest."""
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, shard if (x.ndim >= 1 and x.shape[0] == leading)
                else repl), tree)

    state = state.replace(
        env_state=put(state.env_state, num_envs),
        replay=put(state.replay, capacity),
        params=jax.device_put(state.params, repl),
        target_params=jax.device_put(state.target_params, repl),
        opt_state=jax.device_put(state.opt_state, repl),
        key=jax.device_put(state.key, repl),
        t=jax.device_put(state.t, repl),
        pn_scale=jax.device_put(state.pn_scale, repl),
    )
    with mesh:
        state, metrics = jax.jit(cycle, donate_argnums=(0,))(state)
    jax.block_until_ready(metrics)
