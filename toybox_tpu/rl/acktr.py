"""ACKTR — actor-critic with Kronecker-factored trust region.

Semantics from the reference's acktr (baselines/acktr/acktr_disc.py +
kfac.py): A2C-style n-step advantage updates whose gradients are
preconditioned by K-FAC (layer-wise Kronecker-factored natural gradient)
with a KL-based effective-step clip (trust region). Defaults: lr 0.25,
nsteps 20, max KL (kfac_clip) 0.001, damping 0.01, vf in the same loss
(vf_coef 0.5, fisher from the joint objective).

The jax implementation taps layer inputs with ``sow`` and pre-activation
gradients with ``perturb`` (see toybox_tpu.rl.kfac), so one backward pass
yields both the gradient and the Kronecker statistics.
"""

from __future__ import annotations

import time
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

from toybox_tpu.envs.pipeline import make_rl_env
from toybox_tpu.rl.distributions import CategoricalPd
from toybox_tpu.rl.kfac import (KfacConv, KfacDense, kfac_apply,
                                kfac_factors, kfac_invert,
                                kfac_inverse_shapes)
from toybox_tpu.rl.ppo import load_params, save_params

F32 = jnp.float32


class KfacCNNPolicy(nn.Module):
    """acktr's policy net built from KFAC-instrumented layers."""
    n_actions: int
    convs: Sequence = ((32, 8, 4), (64, 4, 2), (64, 3, 1))
    hidden: int = 512

    @nn.compact
    def __call__(self, x):
        x = jnp.asarray(x)
        if x.dtype == jnp.uint8:
            x = x.astype(F32) / 255.0
        else:
            x = x.astype(F32)
        if x.ndim == 2:   # vector obs -> dense trunk
            x = nn.relu(KfacDense(self.hidden, name="fc0")(x))
        else:
            for i, (ch, k, s) in enumerate(self.convs):
                x = nn.relu(KfacConv(ch, k, s, name=f"conv{i}")(x))
            x = x.reshape((x.shape[0], -1))
            x = nn.relu(KfacDense(self.hidden, name="fc0")(x))
        logits = KfacDense(self.n_actions, name="pi")(x)
        value = KfacDense(1, name="vf")(x)[..., 0]
        return logits, value

    def layer_meta(self, image_obs: bool):
        meta = {}
        if image_obs:
            for i, (ch, k, s) in enumerate(self.convs):
                meta[f"conv{i}"] = ("conv", k, s)
        meta["fc0"] = ("dense",)
        meta["pi"] = ("dense",)
        meta["vf"] = ("dense",)
        return meta


@struct.dataclass
class ACKTRState:
    params: Any          # includes 'params' and 'perturbations' collections
    opt_state: Any
    kfac_stats: Any      # EMA Kronecker factors {layer: (A, S)}
    kfac_inv: Any        # cached {layer: (Ainv, Sinv)} preconditioners
    env_state: Any
    key: jnp.ndarray
    update: jnp.ndarray


def make_acktr(env_fns, *, nsteps=20, lr=0.25, gamma=0.99, ent_coef=0.01,
               vf_coef=0.5, kfac_clip=0.001, damping=0.01,
               max_grad_norm=0.5, hidden=512, total_updates=1,
               invert_every=1, stats_decay=0.99):
    num_envs = env_fns.num_envs
    nact = env_fns.num_actions
    obs_shape = tuple(env_fns.obs_shape)
    image_obs = len(obs_shape) == 3
    net = KfacCNNPolicy(n_actions=nact, hidden=hidden)
    meta = net.layer_meta(image_obs)

    tx = optax.chain(optax.clip_by_global_norm(max_grad_norm),
                     optax.sgd(1.0, momentum=0.9))

    def init_fn(seed=0):
        key = jax.random.PRNGKey(seed)
        key, pkey, ekey = jax.random.split(key, 3)
        obs_dtype = jnp.uint8 if image_obs else F32
        variables = net.init(pkey, jnp.zeros((1,) + obs_shape, obs_dtype))
        seeds = (jax.random.randint(ekey, (num_envs,), 0, 2**31 - 1)
                 .astype(jnp.uint32))
        env_state, _ = env_fns.reset(seeds)
        st = ACKTRState(params=variables, opt_state=tx.init(variables),
                        kfac_stats=kfac_inverse_shapes(variables, meta),
                        kfac_inv=kfac_inverse_shapes(variables, meta),
                        env_state=env_state, key=key,
                        update=jnp.asarray(0, jnp.int32))
        return jax.tree_util.tree_map(jnp.array, st)

    def _apply(variables, obs):
        logits, value = net.apply(variables, obs)
        return logits, value

    def train_step(state: ACKTRState):
        frac = jnp.maximum(
            1.0 - state.update.astype(F32) / max(total_updates, 1), 0.05)
        lrnow = lr * frac

        def body(carry, _):
            env_state, key = carry
            obs = env_state.frames
            key, akey = jax.random.split(key)
            logits, values = _apply(state.params, obs)
            actions = CategoricalPd(logits).sample(akey)
            env_state, _, rewards, dones, info = env_fns.step(
                env_state, actions.astype(jnp.int32))
            return (env_state, key), (obs, actions, values, rewards, dones,
                                      info["episode_return"])

        (env_state, key), (obs, actions, values, rewards, dones, ep_ret) = \
            jax.lax.scan(body, (state.env_state, state.key), None,
                         length=nsteps)
        _, last_value = _apply(state.params, env_state.frames)

        def disc(next_ret, t):
            r, d = t
            ret = r + gamma * next_ret * (1.0 - d.astype(F32))
            return ret, ret

        _, returns = jax.lax.scan(disc, last_value, (rewards, dones),
                                  reverse=True)

        def fl(x):
            return x.reshape((nsteps * num_envs,) + x.shape[2:])

        fobs, facts, fret = fl(obs), fl(actions), fl(returns)

        def loss_and_inter(variables):
            (logits, vpred), inter = net.apply(variables, fobs,
                                               mutable=["kfac"])
            pd = CategoricalPd(logits)
            neglogp = pd.neglogp(facts)
            adv = fret - vpred
            pg_loss = jnp.mean(jax.lax.stop_gradient(adv) * neglogp)
            vf_loss = 0.5 * jnp.mean(jnp.square(vpred - fret))
            entropy = jnp.mean(pd.entropy())
            loss = pg_loss - ent_coef * entropy + vf_coef * vf_loss
            return loss, (inter, pg_loss, vf_loss, entropy)

        (loss, (inter, pg_loss, vf_loss, entropy)), raw_grads = \
            jax.value_and_grad(loss_and_inter, has_aux=True)(state.params)

        # K-FAC preconditioning: per-batch factors ride the same backward
        # pass (cheap MXU matmuls) and accumulate into bias-corrected EMA
        # stats — a 640-sample batch alone is rank-deficient for the
        # 3137-dim fc0 factor; the EMA gives it an effective sample count
        # of 1/(1-decay) batches (the reference kfac.py's running stats).
        # The O(n^3) inverses refresh every `invert_every` updates and are
        # carried in state (the reference's periodic async inverse ops).
        factors = kfac_factors(inter, raw_grads["perturbations"], meta)
        kfac_stats = jax.tree_util.tree_map(
            lambda ema, f: stats_decay * ema + (1.0 - stats_decay) * f,
            state.kfac_stats, factors)
        corr = 1.0 - stats_decay ** (state.update.astype(F32) + 1.0)
        stats_hat = jax.tree_util.tree_map(lambda s: s / corr, kfac_stats)
        kfac_inv = jax.lax.cond(
            state.update % invert_every == 0,
            lambda s: kfac_invert(s, damping),
            lambda _: state.kfac_inv,
            stats_hat)
        grads = kfac_apply(raw_grads, kfac_inv, meta)
        # zero the perturbation "grads" (they are taps, not parameters)
        grads = {**grads, "perturbations": jax.tree_util.tree_map(
            jnp.zeros_like, grads["perturbations"])}

        # trust region: for a natural-gradient step v = F^-1 g the Fisher
        # norm is v^T F v = v . g — scale the step u = coeff * v so that
        # u^T F u <= kfac_clip, i.e. coeff = min(lr, sqrt(kfac_clip/vFv))
        # (the reference kfac.py's clip_kl scaling, acktr_disc.py wiring)
        vfv = sum(jnp.sum(p * r) for p, r in zip(
            jax.tree_util.tree_leaves(grads["params"]),
            jax.tree_util.tree_leaves(raw_grads["params"])))
        vfv = jnp.maximum(vfv, 1e-12)
        coeff = jnp.minimum(lrnow, jnp.sqrt(kfac_clip / vfv))

        # optax.sgd(1.0) emits ready-to-apply (negated) momentum updates;
        # scale them by the trust-region-clipped step size
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(lambda u: coeff * u, updates)
        params = optax.apply_updates(state.params, updates)

        done_eps = ~jnp.isnan(ep_ret)
        n_eps = jnp.sum(done_eps.astype(F32))
        metrics = dict(policy_loss=pg_loss, value_loss=vf_loss,
                       policy_entropy=entropy,
                       step_coeff=coeff,
                       mean_reward=jnp.mean(rewards),
                       eprewmean=jnp.where(
                           n_eps > 0,
                           jnp.nansum(jnp.where(done_eps, ep_ret, 0.0))
                           / n_eps, jnp.nan))
        return ACKTRState(params=params, opt_state=opt_state,
                          kfac_stats=kfac_stats, kfac_inv=kfac_inv,
                          env_state=env_state, key=key,
                          update=state.update + 1), metrics

    return init_fn, train_step, net


def learn(*, env=None, game="breakout", num_envs=16, total_timesteps=100_000,
          seed=0, nsteps=20, lr=0.25, gamma=0.99, ent_coef=0.01,
          vf_coef=0.5, kfac_clip=0.001, log_interval=20, save_path=None,
          load_path=None, logger=None, updates_per_jit=1, invert_every=1,
          stats_decay=0.99, checkpoint_path=None, checkpoint_freq=500,
          **_ignored):
    from toybox_tpu.utils.checkpoint import Checkpointer

    env_fns = env if env is not None else make_rl_env(game, num_envs)
    nbatch = env_fns.num_envs * nsteps
    fpstep = getattr(env_fns, "frames_per_step", 1)  # actual frameskip
    total_updates = max(int(total_timesteps) // (nbatch * fpstep), 1)
    init_fn, train_step, _ = make_acktr(
        env_fns, nsteps=nsteps, lr=lr, gamma=gamma, ent_coef=ent_coef,
        vf_coef=vf_coef, kfac_clip=kfac_clip, total_updates=total_updates,
        invert_every=invert_every, stats_decay=stats_decay)
    state = init_fn(seed)
    if load_path is not None:
        state = state.replace(params=load_params(load_path, state.params))
    ckpt = Checkpointer(checkpoint_path, checkpoint_freq)
    state = ckpt.restore(state)
    start_update = int(state.update)

    # ACKTR is an A2C-regime algorithm (many small-batch updates); a
    # per-update host loop over a remote device pays the dispatch-latency
    # floor per update, so scan a block of updates per dispatch.
    upj = max(int(updates_per_jit), 1)

    def step_block(state):
        state, ms = jax.lax.scan(lambda st, _: train_step(st), state, None,
                                 length=upj)
        metrics = jax.tree_util.tree_map(lambda x: x[-1], ms)
        metrics["eprewmean"] = jnp.nanmean(ms["eprewmean"])
        return state, metrics

    step_jit = jax.jit(step_block, donate_argnums=(0,))
    t0 = time.perf_counter()
    for block_end in range(start_update + upj, total_updates + 1, upj):
        state, metrics = step_jit(state)
        if logger is not None and (block_end // upj) % max(
                log_interval // upj, 1) == 0:
            m = jax.device_get(metrics)
            logger.logkv("nupdates", block_end)
            logger.logkv("total_timesteps", block_end * nbatch * fpstep)
            logger.logkv("fps",
                         int((block_end - start_update) * nbatch * fpstep /
                             (time.perf_counter() - t0)))
            for k, v in m.items():
                logger.logkv(k, float(v))
            logger.dumpkvs()
        ckpt.maybe_save(state, block_end)
    jax.block_until_ready(state.params)
    if save_path is not None:
        save_params(save_path, state.params)
    return state


# ---------------------------------------------------------------------------
# Multi-chip dry run (driver contract: __graft_entry__.dryrun_multichip)
# ---------------------------------------------------------------------------

def dryrun(n_devices: int, game: str = "breakout") -> None:
    """Jit the full ACKTR train step over an n-device mesh and run one
    step on tiny shapes. Structurally distinct from PPO's dp: the
    Kronecker statistics (per-layer activation/grad second moments) are
    batch reductions over the sharded rollout, so the K-FAC factors are
    all-reduced across devices before the EMA + O(n^3) inversion (which
    runs replicated), not just the gradients."""
    import numpy as _np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = jax.devices()[:n_devices]
    mesh = Mesh(_np.array(devices), ("env",))
    num_envs = 2 * n_devices

    # frame_size 36 keeps the fc0 Kronecker factor tiny (the 84x84 trunk
    # gives a 3137-dim factor whose test-time inverse would dominate a
    # CPU dryrun); the conv stack still composes exactly as at 84.
    env_fns = make_rl_env(game, num_envs, frame_size=36)
    init_fn, train_step, _ = make_acktr(env_fns, nsteps=4, hidden=32,
                                        invert_every=1, total_updates=1)
    state = init_fn(0)

    shard = NamedSharding(mesh, P("env"))
    repl = NamedSharding(mesh, P())
    env_state = jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, shard if (x.ndim >= 1 and x.shape[0] == num_envs) else repl),
        state.env_state)
    state = state.replace(
        env_state=env_state,
        params=jax.device_put(state.params, repl),
        opt_state=jax.device_put(state.opt_state, repl),
        kfac_stats=jax.device_put(state.kfac_stats, repl),
        kfac_inv=jax.device_put(state.kfac_inv, repl),
        key=jax.device_put(state.key, repl),
        update=jax.device_put(state.update, repl),
    )
    with mesh:
        state, metrics = jax.jit(train_step, donate_argnums=(0,))(state)
    jax.block_until_ready(metrics)
