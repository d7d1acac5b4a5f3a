"""PPO1 (pposgd) — the original PPO recipe as one jitted update.

Semantics match the reference's ppo1/pposgd_simple.py:100-220, which
differs from ppo2 in ways that matter for reproduction:

- an explicit OLD-POLICY network: ``oldpi`` is snapshotted from ``pi``
  before each optimization phase and the ratio / KL are recomputed
  against it per minibatch (assign_old_eq_new);
- NO value clipping — plain MSE value loss folded into one total loss
  with the entropy penalty (total = pol_surr + pol_entpen + vf_loss);
- advantages standardized over the WHOLE actor batch before
  minibatching (ppo2 standardizes per minibatch);
- the clip parameter and Adam stepsize are both scaled by a ``lrmult``
  schedule ('constant' or 'linear' over total timesteps);
- an observation running-mean/std filter (mlp_policy's ob_rms, clipped
  to +-5 sigma) updated once per iteration with the fresh batch.

An optional adaptive-KL penalty (the PPO paper's KLPEN variant) is also
provided: set ``kl_targ`` to add beta*KL(old,new) to the loss with beta
doubled/halved when the measured KL leaves [targ/1.5, 1.5*targ].

TPU shape: same fused actor-learner as rl/ppo.py — rollout scan, GAE,
and all optimization epochs inside a single jit; the old-policy snapshot
is just another pytree leaf in the carried state.
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from toybox_tpu.envs.pipeline import make_rl_env
from toybox_tpu.rl.policies import build_policy, pd_from_logits
from toybox_tpu.rl.ppo import load_params, save_params

F32 = jnp.float32
I32 = jnp.int32


@struct.dataclass
class ObFilter:
    """Running mean/std of observations (mlp_policy ob_rms)."""
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray

    @classmethod
    def create(cls, shape):
        return cls(mean=jnp.zeros(shape, F32), var=jnp.ones(shape, F32),
                   count=jnp.asarray(1e-4, F32))

    def update(self, batch):
        """Welford-style parallel merge with the batch moments."""
        bmean = jnp.mean(batch, axis=0)
        bvar = jnp.var(batch, axis=0)
        bcount = jnp.asarray(batch.shape[0], F32)
        delta = bmean - self.mean
        tot = self.count + bcount
        mean = self.mean + delta * bcount / tot
        m_a = self.var * self.count
        m_b = bvar * bcount
        m2 = m_a + m_b + jnp.square(delta) * self.count * bcount / tot
        return ObFilter(mean=mean, var=m2 / tot, count=tot)

    def normalize(self, obs):
        std = jnp.sqrt(self.var + 1e-8)
        return jnp.clip((obs.astype(F32) - self.mean) / std, -5.0, 5.0)


@struct.dataclass
class PPO1State:
    params: Any
    old_params: Any
    opt_state: Any
    env_state: Any
    ob_rms: ObFilter
    kl_beta: jnp.ndarray   # f32 (adaptive-KL penalty coefficient)
    key: jnp.ndarray
    update: jnp.ndarray    # i32


def make_ppo1(env_fns, *, network="cnn", timesteps_per_actorbatch=256,
              clip_param=0.2, entcoeff=0.01, optim_epochs=4,
              optim_stepsize=1e-3, optim_batchsize=64, gamma=0.99,
              lam=0.95, schedule="linear", adam_epsilon=1e-5,
              total_updates=1, kl_targ=None, normalize_observations=None,
              network_kwargs=None):
    """Build (init_fn, train_step_fn). ``timesteps_per_actorbatch`` is the
    per-env rollout horizon (the reference runs one env; we run a batch)."""
    num_envs = env_fns.num_envs
    nsteps = timesteps_per_actorbatch
    nbatch = num_envs * nsteps
    optim_batchsize = min(optim_batchsize, nbatch)
    n_minibatches = nbatch // optim_batchsize
    if normalize_observations is None:
        normalize_observations = network == "mlp"

    module, p_init, _, _ = build_policy(
        env_fns.obs_shape, env_fns.num_actions, network,
        **(network_kwargs or {}))

    tx = optax.chain(
        optax.scale_by_adam(eps=adam_epsilon),
        optax.scale(-1.0),
    )

    def _apply(params, ob_rms, obs):
        if normalize_observations:
            obs = ob_rms.normalize(obs)
        return module.apply(params, obs)

    def init_fn(seed=0):
        key = jax.random.PRNGKey(seed)
        key, pkey, ekey = jax.random.split(key, 3)
        params = p_init(pkey)
        seeds = (jax.random.randint(ekey, (num_envs,), 0, 2**31 - 1)
                 .astype(jnp.uint32))
        env_state, _ = env_fns.reset(seeds)
        state = PPO1State(
            params=params, old_params=params, opt_state=tx.init(params),
            env_state=env_state,
            ob_rms=ObFilter.create(tuple(env_fns.obs_shape)),
            kl_beta=jnp.asarray(1.0, F32),
            key=key, update=jnp.asarray(0, I32))
        return jax.tree_util.tree_map(jnp.array, state)

    def _lrmult(update):
        if schedule == "constant":
            return jnp.asarray(1.0, F32)
        if schedule == "linear":
            return jnp.maximum(
                1.0 - update.astype(F32) / max(total_updates, 1), 0.0)
        raise NotImplementedError(schedule)

    def _loss(params, old_params, ob_rms, mb, clipr, beta):
        obs, actions, advs, vtargs = mb
        logits, vpred = _apply(params, ob_rms, obs)
        old_logits, _ = _apply(old_params, ob_rms, obs)
        pd = pd_from_logits(env_fns.num_actions, logits)
        old_pd = pd_from_logits(env_fns.num_actions, old_logits)

        kl = jnp.mean(old_pd.kl(pd))
        ent = jnp.mean(pd.entropy())
        pol_entpen = -entcoeff * ent

        ratio = jnp.exp(old_pd.neglogp(actions) - pd.neglogp(actions))
        surr1 = ratio * advs
        surr2 = jnp.clip(ratio, 1.0 - clipr, 1.0 + clipr) * advs
        pol_surr = -jnp.mean(jnp.minimum(surr1, surr2))
        vf_loss = jnp.mean(jnp.square(vpred - vtargs))
        total = pol_surr + pol_entpen + vf_loss
        if kl_targ is not None:
            total = total + beta * kl
        return total, dict(pol_surr=pol_surr, pol_entpen=pol_entpen,
                           vf_loss=vf_loss, kl=kl, ent=ent)

    def train_step(state: PPO1State):
        lrmult = _lrmult(state.update)
        clipr = clip_param * lrmult
        lr = optim_stepsize * lrmult

        # --- rollout (pi, not oldpi: pposgd rolls out the current policy)
        def body(carry, _):
            env_state, key = carry
            obs = env_state.frames
            key, akey = jax.random.split(key)
            logits, values = _apply(state.params, state.ob_rms, obs)
            pd = pd_from_logits(env_fns.num_actions, logits)
            actions = pd.sample(akey)
            env_state, _, rewards, dones, info = env_fns.step(env_state,
                                                              actions)
            out = (obs, actions, values, rewards, dones,
                   info["episode_return"], info["episode_length"])
            return (env_state, key), out

        (env_state, key), traj = jax.lax.scan(
            body, (state.env_state, state.key), None, length=nsteps)
        obs, actions, values, rewards, dones, ep_ret, ep_len = traj
        _, last_value = _apply(state.params, state.ob_rms,
                               env_state.frames)

        # --- GAE / vtarg (add_vtarg_and_adv)
        def gae_body(carry, t):
            v, r, d = t
            next_adv, next_value = carry
            nonterm = 1.0 - d.astype(F32)
            delta = r + gamma * next_value * nonterm - v
            adv = delta + gamma * lam * nonterm * next_adv
            return (adv, v), adv

        _, advs = jax.lax.scan(gae_body,
                               (jnp.zeros_like(last_value), last_value),
                               (values, rewards, dones), reverse=True)
        vtargs = advs + values  # tdlamret

        def fl(x):
            return x.reshape((nbatch,) + x.shape[2:])

        obs_f, actions_f, advs_f, vtargs_f = map(
            fl, (obs, actions, advs, vtargs))
        # standardized over the WHOLE batch (pposgd_simple.py:170)
        advs_f = (advs_f - advs_f.mean()) / (advs_f.std() + 1e-8)

        # ob_rms update with this iteration's observations
        ob_rms = (state.ob_rms.update(obs_f.astype(F32))
                  if normalize_observations else state.ob_rms)

        # assign_old_eq_new, then optimize pi
        old_params = state.params

        def epoch_body(carry, ekey):
            params, opt_state = carry
            perm = jax.random.permutation(ekey, nbatch)

            def mb_body(carry, i):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice_in_dim(
                    perm, i * optim_batchsize, optim_batchsize)
                mb = (obs_f[idx], actions_f[idx], advs_f[idx],
                      vtargs_f[idx])
                (_, metrics), grads = jax.value_and_grad(
                    _loss, has_aux=True)(params, old_params, ob_rms, mb,
                                         clipr, state.kl_beta)
                updates, opt_state = tx.update(grads, opt_state, params)
                updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), metrics

            (params, opt_state), metrics = jax.lax.scan(
                mb_body, (params, opt_state), jnp.arange(n_minibatches))
            return (params, opt_state), metrics

        key, *ekeys = jax.random.split(key, optim_epochs + 1)
        (params, opt_state), metrics = jax.lax.scan(
            epoch_body, (state.params, state.opt_state), jnp.stack(ekeys))
        metrics = jax.tree_util.tree_map(jnp.mean, metrics)

        # adaptive-KL beta update (PPO paper KLPEN; no-op when kl_targ off)
        if kl_targ is not None:
            kl = metrics["kl"]
            beta = jnp.where(kl > 1.5 * kl_targ, state.kl_beta * 2.0,
                             jnp.where(kl < kl_targ / 1.5,
                                       state.kl_beta * 0.5, state.kl_beta))
        else:
            beta = state.kl_beta

        done_eps = ~jnp.isnan(ep_ret)
        n_eps = jnp.sum(done_eps.astype(F32))
        metrics["eprewmean"] = jnp.where(
            n_eps > 0,
            jnp.nansum(jnp.where(done_eps, ep_ret, 0.0)) / n_eps, jnp.nan)
        metrics["eplenmean"] = jnp.where(
            n_eps > 0,
            jnp.sum(jnp.where(done_eps, ep_len, 0).astype(F32)) / n_eps,
            jnp.nan)
        metrics["episodes"] = n_eps
        metrics["mean_reward"] = jnp.mean(rewards)

        return PPO1State(params=params, old_params=old_params,
                         opt_state=opt_state, env_state=env_state,
                         ob_rms=ob_rms, kl_beta=beta, key=key,
                         update=state.update + 1), metrics

    return init_fn, train_step


def learn(*, env=None, game="breakout", num_envs=8, total_timesteps=10_000,
          seed=0, network="cnn", timesteps_per_actorbatch=256,
          clip_param=0.2, entcoeff=0.01, optim_epochs=4, optim_stepsize=1e-3,
          optim_batchsize=64, gamma=0.99, lam=0.95, schedule="linear",
          kl_targ=None, log_interval=1, save_path=None, load_path=None,
          logger=None, network_kwargs=None, **extra):
    # accept the run.py ppo-style aliases so `--alg=ppo1` extras work
    timesteps_per_actorbatch = extra.pop("nsteps", timesteps_per_actorbatch)
    clip_param = extra.pop("cliprange", clip_param)
    entcoeff = extra.pop("ent_coef", entcoeff)
    optim_epochs = extra.pop("noptepochs", optim_epochs)
    optim_stepsize = extra.pop("lr", optim_stepsize)

    env_fns = env if env is not None else make_rl_env(game, num_envs)
    nbatch = env_fns.num_envs * timesteps_per_actorbatch
    fpstep = getattr(env_fns, "frames_per_step", 1)  # actual frameskip
    total_updates = max(int(total_timesteps) // (nbatch * fpstep), 1)

    init_fn, train_step = make_ppo1(
        env_fns, network=network,
        timesteps_per_actorbatch=timesteps_per_actorbatch,
        clip_param=clip_param, entcoeff=entcoeff, optim_epochs=optim_epochs,
        optim_stepsize=optim_stepsize, optim_batchsize=optim_batchsize,
        gamma=gamma, lam=lam, schedule=schedule, kl_targ=kl_targ,
        total_updates=total_updates, network_kwargs=network_kwargs)

    state = init_fn(seed)
    if load_path is not None:
        state = state.replace(params=load_params(load_path, state.params),
                              old_params=load_params(load_path,
                                                     state.params))

    step_jit = jax.jit(train_step, donate_argnums=(0,))
    t0 = time.perf_counter()
    for update in range(1, total_updates + 1):
        state, metrics = step_jit(state)
        if logger is not None and update % log_interval == 0:
            m = jax.device_get(metrics)
            logger.logkv("nupdates", update)
            logger.logkv("total_timesteps", update * nbatch * fpstep)
            logger.logkv("fps", int(update * nbatch * fpstep /
                                    (time.perf_counter() - t0)))
            for k, v in m.items():
                logger.logkv(f"loss_{k}" if k in ("pol_surr", "pol_entpen",
                                                  "vf_loss", "kl", "ent")
                             else k, float(v))
            logger.dumpkvs()
    jax.block_until_ready(state.params)
    if save_path is not None:
        save_params(save_path, state.params)
    return state
