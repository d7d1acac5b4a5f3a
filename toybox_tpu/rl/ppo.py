"""PPO — fused actor-learner in a single jitted program.

Semantics match the reference's ppo2 (baselines/ppo2/ppo2.py): clipped
surrogate + clipped value loss + entropy bonus (:40-50), GAE(lambda)
backward scan (:127-136), minibatched epochs with lr/cliprange annealed by
``frac`` (:239-295), and the atari defaults (ppo2/defaults.py:13-20:
nsteps=128, nminibatches=4, lam=.95, gamma=.99, 4 epochs, ent .01,
lr 2.5e-4*f, clip 0.1*f).

TPU-native shape: envs live on device; one jit covers the nsteps rollout
(lax.scan over env steps + policy), GAE, and all minibatch epochs. Instead
of MpiAdamOptimizer's comm.Allreduce (mpi_adam_optimizer.py:10-30), the
batch axis is sharded over the mesh with jax.sharding and XLA inserts the
gradient all-reduce over ICI automatically.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization, struct

from toybox_tpu.envs.pipeline import make_rl_env
from toybox_tpu.rl.policies import build_policy, pd_from_logits
from toybox_tpu.utils.checkpoint import Checkpointer

F32 = jnp.float32


@struct.dataclass
class PPOState:
    params: Any
    opt_state: Any
    env_state: Any
    key: jnp.ndarray
    update: jnp.ndarray  # i32


def make_ppo(env_fns, *, network="cnn", lr=2.5e-4, cliprange=0.1,
             nsteps=128, nminibatches=4, noptepochs=4, gamma=0.99,
             lam=0.95, ent_coef=0.01, vf_coef=0.5, max_grad_norm=0.5,
             total_updates=1, network_kwargs=None, microbatches=1):
    """Build (init_fn, train_step_fn, act_fn) over a batched env.

    ``microbatches`` splits each minibatch's gradient into that many
    sequentially-accumulated micro-batches before the single Adam step —
    the HBM lever for large env counts (activation memory scales 1/K;
    the gradient of a mean over equal chunks is the mean of chunk
    gradients, and advantages are normalized over the FULL minibatch
    first, so the update stays the reference semantics,
    ppo2.py:250-258)."""
    num_envs = env_fns.num_envs
    obs_shape = env_fns.obs_shape
    nbatch = num_envs * nsteps
    assert nbatch % nminibatches == 0
    mbsize = nbatch // nminibatches
    assert mbsize % microbatches == 0
    ubsize = mbsize // microbatches

    module, p_init, p_step, p_value = build_policy(
        obs_shape, env_fns.num_actions, network, **(network_kwargs or {}))

    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.scale_by_adam(eps=1e-5),
        optax.scale_by_schedule(lambda _: 1.0),
        optax.scale(-1.0),
    )

    def init_fn(seed=0):
        key = jax.random.PRNGKey(seed)
        key, pkey, ekey = jax.random.split(key, 3)
        params = p_init(pkey)
        opt_state = tx.init(params)
        seeds = (jax.random.randint(ekey, (num_envs,), 0, 2**31 - 1)
                 .astype(jnp.uint32))
        env_state, _ = env_fns.reset(seeds)
        state = PPOState(params=params, opt_state=opt_state,
                         env_state=env_state, key=key,
                         update=jnp.asarray(0, jnp.int32))
        # JAX dedupes identical constants (e.g. zeros) into one buffer; a
        # donated state must not contain aliased leaves, so force-copy.
        return jax.tree_util.tree_map(jnp.array, state)

    def _rollout(params, env_state, key):
        obs0 = env_state.frames if hasattr(env_state, "frames") else None

        def body(carry, _):
            env_state, key = carry
            obs = env_state.frames
            key, akey = jax.random.split(key)
            actions, values, neglogps, _ = p_step(params, obs, akey)
            env_state, _, rewards, dones, info = env_fns.step(env_state,
                                                              actions)
            out = (obs, actions, values, neglogps, rewards, dones,
                   info["episode_return"], info["episode_length"])
            return (env_state, key), out

        (env_state, key), traj = jax.lax.scan(
            body, (env_state, key), None, length=nsteps)
        del obs0
        return env_state, key, traj

    def _gae(values, rewards, dones, last_value):
        """Backward scan (ppo2.py:127-136)."""
        def body(next_adv_and_v, t):
            v, r, d = t
            next_adv, next_value = next_adv_and_v
            nonterm = 1.0 - d.astype(F32)
            delta = r + gamma * next_value * nonterm - v
            adv = delta + gamma * lam * nonterm * next_adv
            return (adv, v), adv

        (_, _), advs = jax.lax.scan(
            body, (jnp.zeros_like(last_value), last_value),
            (values, rewards, dones), reverse=True)
        return advs

    def _loss(params, mb, clipr, normalize_adv=True):
        obs, actions, old_values, old_neglogps, returns, advs = mb
        logits, vpred = module.apply(params, obs)
        pd = pd_from_logits(env_fns.num_actions, logits)
        neglogp = pd.neglogp(actions)
        entropy = jnp.mean(pd.entropy())

        # value clipping (ppo2.py:40-46)
        vpredclipped = old_values + jnp.clip(vpred - old_values,
                                             -clipr, clipr)
        vf_loss = 0.5 * jnp.mean(jnp.maximum(
            jnp.square(vpred - returns),
            jnp.square(vpredclipped - returns)))

        ratio = jnp.exp(old_neglogps - neglogp)
        if normalize_adv:  # microbatch path pre-normalizes over the full mb
            advs = (advs - advs.mean()) / (advs.std() + 1e-8)
        pg_loss = jnp.mean(jnp.maximum(
            -advs * ratio,
            -advs * jnp.clip(ratio, 1.0 - clipr, 1.0 + clipr)))

        approxkl = 0.5 * jnp.mean(jnp.square(neglogp - old_neglogps))
        clipfrac = jnp.mean(
            (jnp.abs(ratio - 1.0) > clipr).astype(F32))
        loss = pg_loss - entropy * ent_coef + vf_loss * vf_coef
        return loss, dict(policy_loss=pg_loss, value_loss=vf_loss,
                          policy_entropy=entropy, approxkl=approxkl,
                          clipfrac=clipfrac)

    def train_step(state: PPOState):
        """One full PPO update: nsteps rollout + noptepochs x minibatches."""
        # annealing fraction; clamped so stepping past total_updates keeps a
        # small positive lr/cliprange (reference stops its loop instead)
        frac = jnp.maximum(
            1.0 - state.update.astype(F32) / max(total_updates, 1), 0.01)
        lrnow = lr * frac
        cliprnow = cliprange * frac

        env_state, key, traj = _rollout(state.params, state.env_state,
                                        state.key)
        (obs, actions, values, neglogps, rewards, dones, ep_ret,
         ep_len) = traj
        last_value = p_value(state.params, env_state.frames)
        advs = _gae(values, rewards, dones, last_value)
        returns = advs + values

        # flatten time x env (flat index i = t * num_envs + e)
        def fl(x):
            return x.reshape((nbatch,) + x.shape[2:])

        batch = tuple(map(fl, (actions, values, neglogps, returns, advs)))

        # The epoch shuffle (ppo2.py:250-258: permute indices once per
        # epoch, gather each minibatch) moves the whole obs batch through
        # HBM every epoch. Gathering u8 [nbatch, 84, 84, 4] rows pays a
        # 1.6x tile-padding tax (trailing 4-dim; perf rules #1/#2), so the
        # obs gather runs on a BIT-EXACT flat u32 view [nsteps, nenv,
        # 7056] — no padding, 4x fewer elements — and the minibatch is
        # bitcast back after the gather (measured on-chip: whole-shuffle
        # cost 310 ms -> ~3 ms per update at 1024 envs). The view keeps
        # the scan-major [nsteps, nenv] layout (reshape + bitcast are
        # free) so the obs batch is never COPIED into a flattened buffer
        # — at 2048 envs that copy alone was 7.4 GB of the round-4 OOM.
        obs_tail_shape = obs.shape[2:]
        obs_u32 = (obs.dtype == jnp.uint8
                   and (obs.size // nbatch) % 4 == 0)
        if obs_u32:
            obs_src = jax.lax.bitcast_convert_type(
                obs.reshape(nsteps, num_envs, -1, 4), jnp.uint32)
        else:
            obs_src = obs.reshape(nsteps, num_envs, -1)

        def gather_rows(idx):
            """idx [k] flat indices -> [k, ...] obs rows (one gather)."""
            rows = obs_src[idx // num_envs, idx % num_envs]
            if obs_u32:
                rows = jax.lax.bitcast_convert_type(rows, jnp.uint8)
            return rows.reshape((idx.shape[0],) + obs_tail_shape)

        def epoch_body(carry, ekey):
            params, opt_state = carry
            perm = jax.random.permutation(ekey, nbatch)

            def mb_body(carry, i):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, i * mbsize, mbsize)
                if microbatches == 1:
                    mb = (gather_rows(idx),) + tuple(x[idx] for x in batch)
                    (loss, metrics), grads = jax.value_and_grad(
                        _loss, has_aux=True)(params, mb, cliprnow)
                else:
                    # normalize advantages over the FULL minibatch, then
                    # accumulate equal-chunk gradients (mean of chunk
                    # means == minibatch mean); each micro-batch gathers
                    # only its own obs rows, so activation AND gathered-
                    # obs memory scale 1/microbatches
                    mb_advs = batch[-1][idx]
                    mb_advs = (mb_advs - mb_advs.mean()) \
                        / (mb_advs.std() + 1e-8)

                    def ub_body(acc, j):
                        g_acc, m_acc = acc
                        uidx = jax.lax.dynamic_slice_in_dim(
                            idx, j * ubsize, ubsize)
                        uadv = jax.lax.dynamic_slice_in_dim(
                            mb_advs, j * ubsize, ubsize)
                        ub = ((gather_rows(uidx),)
                              + tuple(x[uidx] for x in batch[:-1])
                              + (uadv,))
                        (_, m), g = jax.value_and_grad(
                            _loss, has_aux=True)(params, ub, cliprnow,
                                                 normalize_adv=False)
                        return (jax.tree_util.tree_map(jnp.add, g_acc, g),
                                jax.tree_util.tree_map(jnp.add, m_acc, m)),\
                            None

                    g0 = jax.tree_util.tree_map(jnp.zeros_like, params)
                    m0 = dict(policy_loss=0.0, value_loss=0.0,
                              policy_entropy=0.0, approxkl=0.0,
                              clipfrac=0.0)
                    m0 = jax.tree_util.tree_map(jnp.float32, m0)
                    (grads, metrics), _ = jax.lax.scan(
                        ub_body, (g0, m0), jnp.arange(microbatches))
                    inv = 1.0 / microbatches
                    grads = jax.tree_util.tree_map(
                        lambda x: x * inv, grads)
                    metrics = jax.tree_util.tree_map(
                        lambda x: x * inv, metrics)
                updates, opt_state = tx.update(grads, opt_state, params)
                updates = jax.tree_util.tree_map(
                    lambda u: u * lrnow, updates)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), metrics

            (params, opt_state), metrics = jax.lax.scan(
                mb_body, (params, opt_state), jnp.arange(nminibatches))
            return (params, opt_state), metrics

        key, *ekeys = jax.random.split(key, noptepochs + 1)
        (params, opt_state), metrics = jax.lax.scan(
            epoch_body, (state.params, state.opt_state),
            jnp.stack(ekeys))

        metrics = jax.tree_util.tree_map(jnp.mean, metrics)
        done_eps = ~jnp.isnan(ep_ret)
        n_eps = jnp.sum(done_eps.astype(F32))
        metrics["eprewmean"] = jnp.where(
            n_eps > 0, jnp.nansum(jnp.where(done_eps, ep_ret, 0.0)) / n_eps,
            jnp.nan)
        metrics["eplenmean"] = jnp.where(
            n_eps > 0,
            jnp.sum(jnp.where(done_eps, ep_len, 0).astype(F32)) / n_eps,
            jnp.nan)
        metrics["episodes"] = n_eps
        metrics["mean_reward"] = jnp.mean(rewards)

        return PPOState(params=params, opt_state=opt_state,
                        env_state=env_state, key=key,
                        update=state.update + 1), metrics

    def act_fn(params, obs, key):
        return p_step(params, obs, key)

    return init_fn, train_step, act_fn


# ---------------------------------------------------------------------------
# learn() — host training loop (reference ppo2.learn surface)
# ---------------------------------------------------------------------------

def learn(*, env=None, game="breakout", num_envs=8, total_timesteps=10_000,
          seed=0, network="cnn", nsteps=128, nminibatches=4, noptepochs=4,
          lr=2.5e-4, cliprange=0.1, gamma=0.99, lam=0.95, ent_coef=0.01,
          vf_coef=0.5, max_grad_norm=0.5, log_interval=1, save_path=None,
          load_path=None, logger=None, mesh=None, network_kwargs=None,
          checkpoint_path=None, checkpoint_freq=50, microbatches=1,
          **extra):
    if network in ("lstm", "cnn_lstm", "cnn_lnlstm"):
        from toybox_tpu.rl.ppo_recurrent import learn as rlearn
        return rlearn(env=env, game=game, num_envs=num_envs,
                      total_timesteps=total_timesteps, seed=seed,
                      network=network, nsteps=nsteps,
                      nminibatches=nminibatches, noptepochs=noptepochs,
                      lr=lr, cliprange=cliprange, gamma=gamma, lam=lam,
                      ent_coef=ent_coef, vf_coef=vf_coef,
                      max_grad_norm=max_grad_norm,
                      log_interval=log_interval, save_path=save_path,
                      load_path=load_path, logger=logger,
                      network_kwargs=network_kwargs, **extra)
    env_fns = env if env is not None else make_rl_env(game, num_envs)
    nbatch = env_fns.num_envs * nsteps
    # engine frames per env.step (the frameskip); timestep accounting follows
    # the env's actual skip rather than assuming the atari default of 4
    fpstep = getattr(env_fns, "frames_per_step", 1)
    total_updates = max(int(total_timesteps) // (nbatch * fpstep), 1)

    init_fn, train_step, _ = make_ppo(
        env_fns, network=network, lr=lr, cliprange=cliprange, nsteps=nsteps,
        nminibatches=nminibatches, noptepochs=noptepochs, gamma=gamma,
        lam=lam, ent_coef=ent_coef, vf_coef=vf_coef,
        max_grad_norm=max_grad_norm, total_updates=total_updates,
        network_kwargs=network_kwargs, microbatches=microbatches)

    state = init_fn(seed)
    if load_path is not None:
        state = state.replace(params=load_params(load_path, state.params))

    ckpt = Checkpointer(checkpoint_path, checkpoint_freq)
    state = ckpt.restore(state)   # resume from the latest ckpt_<n> if any
    start_update = int(state.update)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        env_sharding = NamedSharding(mesh, P("env"))
        repl = NamedSharding(mesh, P())
        state = state.replace(
            env_state=jax.device_put(state.env_state, env_sharding),
            params=jax.device_put(state.params, repl),
            opt_state=jax.device_put(state.opt_state, repl),
        )

    step_jit = jax.jit(train_step, donate_argnums=(0,))
    t0 = time.perf_counter()
    for update in range(start_update + 1, total_updates + 1):
        state, metrics = step_jit(state)
        if logger is not None and update % log_interval == 0:
            metrics = jax.device_get(metrics)
            elapsed = time.perf_counter() - t0
            logger.logkv("misc/serial_timesteps", update * nsteps)
            logger.logkv("misc/nupdates", update)
            logger.logkv("misc/total_timesteps", update * nbatch * fpstep)
            logger.logkv("fps", int((update - start_update) * nbatch
                                    * fpstep / elapsed))
            for k, v in metrics.items():
                logger.logkv(k if "/" in k else f"loss/{k}"
                             if "loss" in k or k in ("approxkl", "clipfrac")
                             else k, float(v))
            logger.dumpkvs()
        ckpt.maybe_save(state, update)
    jax.block_until_ready(state.params)

    if save_path is not None:
        save_params(save_path, state.params)
    return state


def save_params(path, params):
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path, template):
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


# ---------------------------------------------------------------------------
# Multi-chip dry run (driver contract: __graft_entry__.dryrun_multichip)
# ---------------------------------------------------------------------------

def dryrun(n_devices: int, game: str = "breakout") -> None:
    """Jit the FULL train step over an n-device mesh with dp sharding on
    the env/batch axis and run one step on tiny shapes."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = jax.devices()[:n_devices]
    mesh = Mesh(np.array(devices), ("env",))
    num_envs = 2 * n_devices

    env_fns = make_rl_env(game, num_envs, frame_size=84)
    init_fn, train_step, _ = make_ppo(env_fns, nsteps=4, nminibatches=2,
                                      noptepochs=1, network="cnn_small")
    state = init_fn(0)
    env_sharding = NamedSharding(mesh, P("env"))
    repl = NamedSharding(mesh, P())
    state = state.replace(
        env_state=jax.device_put(state.env_state, env_sharding),
        params=jax.device_put(state.params, repl),
        opt_state=jax.device_put(state.opt_state, repl),
        key=jax.device_put(state.key, repl),
        update=jax.device_put(state.update, repl),
    )
    with mesh:
        state, metrics = jax.jit(train_step, donate_argnums=(0,))(state)
    jax.block_until_ready(metrics)
