"""TRPO — trust-region policy optimization via conjugate gradient.

Semantics from the reference's trpo_mpi (baselines/trpo_mpi/trpo_mpi.py):
GAE advantages, surrogate gain, Fisher-vector products with CG (10 iters,
cg_damping 0.1), KL-constrained step with backtracking line search
(max_kl 0.001), and a separately-optimized value function (vf_iters x
Adam). The reference's MPI gradient averaging is unnecessary: the batch
axis shards over the mesh and XLA all-reduces under jit.

Atari defaults use the cnn_small network (reference run.py alg defaults).
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.flatten_util import ravel_pytree

from toybox_tpu.envs.pipeline import make_rl_env
from toybox_tpu.rl.policies import build_policy, pd_from_logits
from toybox_tpu.rl.ppo import load_params, save_params

F32 = jnp.float32


def trust_region_update(pi_mod, num_actions, pi_params, fobs, facts, fadv,
                        fnlp_old, *, max_kl=0.001, cg_iters=10,
                        cg_damping=0.1, ent_coef=0.0, line_search_steps=10):
    """One KL-constrained natural-gradient policy step (the core of
    trpo_mpi.py): surrogate gain, Fisher-vector products via the Hessian
    of the mean KL, conjugate gradient, and backtracking line search.

    Reused by both TRPO (environment reward) and GAIL (discriminator
    reward, reference gail/trpo_mpi.py); returns (new_params, metrics).
    """

    def _pd(params, obs):
        logits, _ = pi_mod.apply(params, obs)
        return pd_from_logits(num_actions, logits), logits

    _, old_logits = _pd(pi_params, fobs)
    old_logits = jax.lax.stop_gradient(old_logits)

    flat0, unravel = ravel_pytree(pi_params)

    def surrogate(flat):
        pd, _ = _pd(unravel(flat), fobs)
        ratio = jnp.exp(fnlp_old - pd.neglogp(facts))
        return jnp.mean(ratio * fadv) + ent_coef * jnp.mean(pd.entropy())

    def mean_kl(flat):
        pd, _ = _pd(unravel(flat), fobs)
        old = pd_from_logits(num_actions, old_logits)
        return jnp.mean(old.kl(pd))

    g = jax.grad(surrogate)(flat0)

    # Fisher-vector product: Hessian of mean KL at flat0, via
    # grad-of-(grad . v) (the reference's fvp construction)
    kl_grad_fn = jax.grad(mean_kl)

    def fvp(v):
        gdot = lambda f: jnp.vdot(kl_grad_fn(f), v)
        return jax.grad(gdot)(flat0) + cg_damping * v

    def cg(b):
        x = jnp.zeros_like(b)
        r = b
        p = b
        rdr = jnp.vdot(r, r)

        def cg_iter(carry, _):
            x, r, p, rdr = carry
            Ap = fvp(p)
            alpha = rdr / (jnp.vdot(p, Ap) + 1e-10)
            x = x + alpha * p
            r = r - alpha * Ap
            new_rdr = jnp.vdot(r, r)
            p = r + (new_rdr / (rdr + 1e-10)) * p
            return (x, r, p, new_rdr), None

        (x, _, _, _), _ = jax.lax.scan(cg_iter, (x, r, p, rdr), None,
                                       length=cg_iters)
        return x

    stepdir = cg(g)
    shs = 0.5 * jnp.vdot(stepdir, fvp(stepdir))
    lm = jnp.sqrt(jnp.maximum(shs / max_kl, 1e-10))
    fullstep = stepdir / lm
    expected_improve = jnp.vdot(g, fullstep)
    gain0 = surrogate(flat0)

    def ls_body(carry, i):
        best_flat, accepted = carry
        stepfrac = 0.5 ** i.astype(F32)
        cand = flat0 + stepfrac * fullstep
        gain = surrogate(cand)
        kl = mean_kl(cand)
        ok = ((gain - gain0 > 0.1 * stepfrac * expected_improve)
              & (kl <= max_kl * 1.5) & ~accepted)
        best_flat = jnp.where(ok, cand, best_flat)
        return (best_flat, accepted | ok), ok

    (new_flat, accepted), _ = jax.lax.scan(
        ls_body, (flat0, jnp.asarray(False)),
        jnp.arange(line_search_steps))
    metrics = dict(surrogate_gain=surrogate(new_flat) - gain0,
                   kl=mean_kl(new_flat), accepted=accepted.astype(F32))
    return unravel(new_flat), metrics


@struct.dataclass
class TRPOState:
    pi_params: Any
    vf_params: Any
    vf_opt_state: Any
    env_state: Any
    key: jnp.ndarray
    update: jnp.ndarray


def make_trpo(env_fns, *, network="cnn_small", nsteps=512, gamma=0.99,
              lam=0.98, max_kl=0.001, cg_iters=10, cg_damping=0.1,
              vf_stepsize=3e-4, vf_iters=3, ent_coef=0.0,
              line_search_steps=10, network_kwargs=None):
    num_envs = env_fns.num_envs
    nbatch = num_envs * nsteps

    pi_mod, pi_init, pi_step, _ = build_policy(
        env_fns.obs_shape, env_fns.num_actions, network,
        **(network_kwargs or {}))
    vf_mod, vf_init, _, vf_value = build_policy(
        env_fns.obs_shape, env_fns.num_actions, network,
        **(network_kwargs or {}))

    vf_tx = optax.adam(vf_stepsize)

    def init_fn(seed=0):
        key = jax.random.PRNGKey(seed)
        key, k1, k2, ekey = jax.random.split(key, 4)
        pi_params = pi_init(k1)
        vf_params = vf_init(k2)
        seeds = (jax.random.randint(ekey, (num_envs,), 0, 2**31 - 1)
                 .astype(jnp.uint32))
        env_state, _ = env_fns.reset(seeds)
        st = TRPOState(pi_params=pi_params, vf_params=vf_params,
                       vf_opt_state=vf_tx.init(vf_params),
                       env_state=env_state, key=key,
                       update=jnp.asarray(0, jnp.int32))
        return jax.tree_util.tree_map(jnp.array, st)

    def _pd(params, obs):
        logits, _ = pi_mod.apply(params, obs)
        return pd_from_logits(env_fns.num_actions, logits), logits

    # The step is split into TWO jit programs (rollout+GAE, then the
    # CG/line-search update): the fused graph's double-grad
    # Fisher-vector products on top of the env pipeline make one huge
    # XLA program that is needlessly hard on the compiler; the split
    # rollout is the same shape as every other algorithm's.
    def rollout_step(state: TRPOState):
        def body(carry, _):
            env_state, key = carry
            obs = env_state.frames
            key, akey = jax.random.split(key)
            actions, _, neglogps, _ = pi_step(state.pi_params, obs, akey)
            values = vf_value(state.vf_params, obs)
            env_state, _, rewards, dones, info = env_fns.step(env_state,
                                                              actions)
            return (env_state, key), (obs, actions, values, neglogps,
                                      rewards, dones,
                                      info["episode_return"])

        (env_state, key), traj = jax.lax.scan(
            body, (state.env_state, state.key), None, length=nsteps)
        obs, actions, values, old_neglogps, rewards, dones, ep_ret = traj
        last_v = vf_value(state.vf_params, env_state.frames)

        def gae_body(carry, t):
            v, r, d = t
            next_adv, next_v = carry
            nonterm = 1.0 - d.astype(F32)
            delta = r + gamma * next_v * nonterm - v
            adv = delta + gamma * lam * nonterm * next_adv
            return (adv, v), adv

        (_, _), advs = jax.lax.scan(gae_body, (jnp.zeros_like(last_v),
                                               last_v),
                                    (values, rewards, dones), reverse=True)
        returns = advs + values

        def fl(x):
            return x.reshape((nbatch,) + x.shape[2:])

        fobs, facts = fl(obs), fl(actions)
        fadv = fl(advs)
        fadv = (fadv - fadv.mean()) / (fadv.std() + 1e-8)
        fnlp_old = fl(old_neglogps)
        fret = fl(returns)

        done_eps = ~jnp.isnan(ep_ret)
        n_eps = jnp.sum(done_eps.astype(F32))
        eprewmean = jnp.where(
            n_eps > 0,
            jnp.nansum(jnp.where(done_eps, ep_ret, 0.0)) / n_eps, jnp.nan)
        batch = dict(fobs=fobs, facts=facts, fadv=fadv,
                     fnlp_old=fnlp_old, fret=fret)
        roll_metrics = dict(eprewmean=eprewmean,
                            mean_reward=jnp.mean(rewards))
        state = TRPOState(pi_params=state.pi_params,
                          vf_params=state.vf_params,
                          vf_opt_state=state.vf_opt_state,
                          env_state=env_state, key=key,
                          update=state.update)
        return state, batch, roll_metrics

    def update_step(state: TRPOState, batch):
        fobs, facts = batch["fobs"], batch["facts"]
        fadv, fnlp_old, fret = (batch["fadv"], batch["fnlp_old"],
                                batch["fret"])

        pi_params, tr_metrics = trust_region_update(
            pi_mod, env_fns.num_actions, state.pi_params,
            fobs, facts, fadv, fnlp_old,
            max_kl=max_kl, cg_iters=cg_iters, cg_damping=cg_damping,
            ent_coef=ent_coef, line_search_steps=line_search_steps)
        accepted = tr_metrics["accepted"]

        # --- value function fit ------------------------------------------
        def vf_loss_fn(params):
            v = vf_value(params, fobs)
            return jnp.mean(jnp.square(v - fret))

        def vf_iter(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(vf_loss_fn)(params)
            updates, opt_state = vf_tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (vf_params, vf_opt_state), vf_losses = jax.lax.scan(
            vf_iter, (state.vf_params, state.vf_opt_state), None,
            length=vf_iters)

        new_pd, _ = _pd(pi_params, fobs)
        metrics = {
            "surrogate_gain": tr_metrics["surrogate_gain"],
            "kl": tr_metrics["kl"],
            "accepted": accepted,
            "vf_loss": vf_losses[-1],
            "entropy": jnp.mean(new_pd.entropy()),
        }
        return TRPOState(pi_params=pi_params, vf_params=vf_params,
                         vf_opt_state=vf_opt_state,
                         env_state=state.env_state,
                         key=state.key, update=state.update + 1), metrics

    def train_step(state: TRPOState):
        state, batch, roll_metrics = rollout_step(state)
        state, metrics = update_step(state, batch)
        return state, {**metrics, **roll_metrics}

    return init_fn, train_step, rollout_step, update_step


def learn(*, env=None, game="breakout", num_envs=8, total_timesteps=100_000,
          seed=0, network="cnn_small", nsteps=512, gamma=0.99, lam=0.98,
          max_kl=0.001, cg_iters=10, cg_damping=0.1, vf_stepsize=3e-4,
          vf_iters=3, ent_coef=0.0, log_interval=1, save_path=None,
          load_path=None, logger=None, network_kwargs=None, **_ignored):
    env_fns = env if env is not None else make_rl_env(game, num_envs)
    nbatch = env_fns.num_envs * nsteps
    fpstep = getattr(env_fns, "frames_per_step", 1)  # actual frameskip
    total_updates = max(int(total_timesteps) // (nbatch * fpstep), 1)

    init_fn, _, rollout_step, update_step = make_trpo(
        env_fns, network=network, nsteps=nsteps, gamma=gamma, lam=lam,
        max_kl=max_kl, cg_iters=cg_iters, cg_damping=cg_damping,
        vf_stepsize=vf_stepsize, vf_iters=vf_iters, ent_coef=ent_coef,
        network_kwargs=network_kwargs)

    state = init_fn(seed)
    if load_path is not None:
        state = state.replace(
            pi_params=load_params(load_path, state.pi_params))

    rollout_jit = jax.jit(rollout_step, donate_argnums=(0,))
    update_jit = jax.jit(update_step, donate_argnums=(0, 1))
    t0 = time.perf_counter()
    for update in range(1, total_updates + 1):
        state, batch, roll_metrics = rollout_jit(state)
        state, metrics = update_jit(state, batch)
        metrics = {**metrics, **roll_metrics}
        if logger is not None and update % log_interval == 0:
            m = jax.device_get(metrics)
            logger.logkv("nupdates", update)
            logger.logkv("fps", int(update * nbatch * fpstep /
                                    (time.perf_counter() - t0)))
            for k, v in m.items():
                logger.logkv(k, float(v))
            logger.dumpkvs()
    jax.block_until_ready(state.pi_params)
    if save_path is not None:
        save_params(save_path, state.pi_params)
    return state
