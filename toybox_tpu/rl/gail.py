"""GAIL — generative adversarial imitation learning.

Semantics from the reference's baselines/gail: a discriminator D(s, a)
(gail/adversary.py TransitionClassifier) is trained to separate expert
from policy transitions, and the policy maximizes the surrogate reward
-log(1 - D). The full reference pipeline ships here:

- ``generate_expert_dataset`` — roll out a trained (e.g. the committed
  regress-gate PPO) model and record (obs, action) transitions, the
  run_mujoco --task=sample_trajectory / dataset/mujoco_dset.py analog,
  with npz save/load;
- ``behavior_clone`` — supervised warm-start of the policy on the expert
  data (gail/behavior_clone.py);
- ``make_gail_trpo`` — the reference generator: TRPO trust-region steps
  (shared with rl/trpo.py) on the discriminator reward
  (gail/trpo_mpi.py);
- ``make_gail`` — a PPO-generator variant (clipped surrogate on the
  adversarial reward) for cheaper updates.
"""

from __future__ import annotations

import time
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from toybox_tpu.rl.policies import build_policy, pd_from_logits

F32 = jnp.float32


def logit_bernoulli_entropy(logits):
    """Entropy of Bernoulli(sigmoid(logits)) from the logits —
    (1-sigmoid(l))*l - log sigmoid(l), the adversary regularizer of
    reference gail/adversary.py:16-18 (after openai/imitation)."""
    return (1.0 - jax.nn.sigmoid(logits)) * logits + jax.nn.softplus(-logits)


class Discriminator(nn.Module):
    hidden: int = 100

    @nn.compact
    def __call__(self, obs, action_onehot):
        o = obs.reshape((obs.shape[0], -1))
        # Observation normalization (the reference's TransitionClassifier
        # standardizes obs with a RunningMeanStd before the tanh MLP,
        # gail/adversary.py). Raw 0-255 Atari frames saturate every tanh:
        # the disc collapses to a constant function whose expert/policy
        # gradients cancel exactly, and it never trains. Frame obs are
        # uint8, so the fixed [0,1] rescale is the whole normalization.
        if o.dtype == jnp.uint8:
            x = o.astype(F32) / 255.0
        else:
            x = o.astype(F32)
        x = jnp.concatenate([x, action_onehot.astype(F32)], axis=-1)
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
    # Expert data rides in the state so it reaches the jitted step as a
    # donated ARGUMENT: a closed-over device array would be baked into
    # the HLO as a constant, and at Atari scale (16k x 84x84x4 uint8 ≈
    # 0.4 GB) that blows up program serialization (the remote compile
    # service rejects the request outright).
    expert_obs: jnp.ndarray
    expert_onehot: jnp.ndarray


def make_gail(env_fns, expert_obs, expert_actions, *, network="mlp",
              nsteps=32, pi_lr=3e-3, disc_lr=1e-3, disc_steps=2,
              disc_entcoeff=1e-3, gamma=0.99, lam=0.95, cliprange=0.2,
              ent_coef=0.001, noptepochs=2, network_kwargs=None):
    num_envs = env_fns.num_envs
    nact = env_fns.num_actions
    nbatch = num_envs * nsteps

    module, p_init, p_step, p_value = build_policy(
        env_fns.obs_shape, nact, network, **(network_kwargs or {}))
    disc = Discriminator()
    pi_tx = optax.adam(pi_lr)
    disc_tx = optax.adam(disc_lr)

    expert_onehot = jax.nn.one_hot(jnp.asarray(expert_actions), nact,
                                   dtype=F32)
    expert_obs = jnp.asarray(expert_obs)

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
                       update=jnp.asarray(0, jnp.int32),
                       expert_obs=expert_obs,
                       expert_onehot=expert_onehot)
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
                                     state.expert_obs.shape[0])
            e_logit = disc.apply(params, state.expert_obs[idx],
                                 state.expert_onehot[idx])
            p_logit = disc.apply(params, fobs, pol_onehot)
            # expert -> 1, policy -> 0; entropy bonus keeps the adversary
            # from saturating (adversary.py entcoeff)
            ent = jnp.mean(logit_bernoulli_entropy(
                jnp.concatenate([p_logit, e_logit])))
            loss = (optax.sigmoid_binary_cross_entropy(
                        e_logit, jnp.ones_like(e_logit)).mean()
                    + optax.sigmoid_binary_cross_entropy(
                        p_logit, jnp.zeros_like(p_logit)).mean()
                    - disc_entcoeff * ent)
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
                         update=state.update + 1,
                         expert_obs=state.expert_obs,
                         expert_onehot=state.expert_onehot), metrics

    return init_fn, train_step


# ---------------------------------------------------------------------------
# Expert-trajectory pipeline (reference gail/dataset/mujoco_dset.py +
# run_mujoco --task=sample_trajectory)
# ---------------------------------------------------------------------------

def generate_expert_dataset(env_fns, *, load_path=None, params=None,
                            n_transitions=4096, network="cnn", seed=0,
                            stochastic=True, stride=1,
                            network_kwargs=None):
    """Roll out a trained policy on a batched env and record (obs, action)
    transitions. Pass either ``params`` or ``load_path`` (a file written by
    rl.ppo.save_params, e.g. the committed regress-gate models).

    ``stride=k`` records every k-th transition, covering a k× longer
    horizon for the same dataset size — important when expert episodes
    are far longer than n_transitions/num_envs (a from-reset-only
    dataset lets a GAIL adversary separate late-game policy states on
    sight and the imitation reward vanishes)."""
    from toybox_tpu.rl.ppo import load_params

    module, p_init, p_step, _ = build_policy(
        env_fns.obs_shape, env_fns.num_actions, network,
        **(network_kwargs or {}))
    if params is None:
        assert load_path is not None, "need params or load_path"
        params = load_params(load_path, p_init(jax.random.PRNGKey(0)))

    num_envs = env_fns.num_envs
    nsteps = -(-n_transitions // num_envs)  # ceil

    def act_and_step(env_state, key):
        obs = env_state.frames
        key, akey = jax.random.split(key)
        if stochastic:
            actions, _, _, _ = p_step(params, obs, akey)
        else:
            logits, _ = module.apply(params, obs)
            actions = jnp.argmax(logits, axis=-1)
        env_state, _, _, _, _ = env_fns.step(env_state, actions)
        return env_state, key, obs, actions

    def rollout(env_state, key):
        def body(carry, _):
            env_state, key = carry
            # record the first transition of each stride window...
            env_state, key, obs, actions = act_and_step(env_state, key)

            def skip(carry, _):
                env_state, key = carry
                env_state, key, _, _ = act_and_step(env_state, key)
                return (env_state, key), None

            # ...then advance stride-1 unrecorded steps (memory stays
            # O(n_transitions) regardless of the horizon covered)
            (env_state, key), _ = jax.lax.scan(skip, (env_state, key),
                                               None, length=stride - 1)
            return (env_state, key), (obs, actions)

        (_, _), (obs, actions) = jax.lax.scan(body, (env_state, key),
                                              None, length=nsteps)
        return obs, actions

    key = jax.random.PRNGKey(seed)
    key, ekey = jax.random.split(key)
    seeds = (jax.random.randint(ekey, (num_envs,), 0, 2**31 - 1)
             .astype(jnp.uint32))
    env_state, _ = env_fns.reset(seeds)
    obs, actions = jax.jit(rollout)(env_state, key)
    obs = np.asarray(obs).reshape((-1,) + tuple(env_fns.obs_shape))
    actions = np.asarray(actions).reshape(-1)
    return obs[:n_transitions], actions[:n_transitions]


def save_expert_dataset(path, obs, actions):
    """npz format matching the reference's expert-data files (obs/acs)."""
    np.savez_compressed(path, obs=np.asarray(obs), acs=np.asarray(actions))


def load_expert_dataset(path):
    d = np.load(path)
    return d["obs"], d["acs"]


# ---------------------------------------------------------------------------
# Behavior cloning (reference gail/behavior_clone.py)
# ---------------------------------------------------------------------------

def behavior_clone(env_fns, expert_obs, expert_actions, *, network="mlp",
                   epochs=50, batch_size=128, lr=3e-4, seed=0,
                   network_kwargs=None):
    """Supervised pretraining: minimize neglogp of expert actions.
    Returns policy params usable to warm-start make_gail*/ppo."""
    module, p_init, _, _ = build_policy(
        env_fns.obs_shape, env_fns.num_actions, network,
        **(network_kwargs or {}))
    nact = env_fns.num_actions
    expert_obs = jnp.asarray(expert_obs)
    expert_actions = jnp.asarray(expert_actions)
    n = expert_obs.shape[0]
    bs = min(batch_size, n)
    tx = optax.adam(lr)

    steps_per_epoch = -(-n // bs)  # ceil: one full shuffled pass

    def loss_fn(params, o, a):
        logits, _ = module.apply(params, o)
        pd = pd_from_logits(nact, logits)
        return jnp.mean(pd.neglogp(a))

    # expert data enters as jit ARGUMENTS — a closed-over device array
    # becomes an HLO constant, and Atari-scale datasets make the program
    # too large to compile (remote services reject the upload).
    @jax.jit
    def train(params, opt_state, key, eobs, eacts):
        def epoch(carry, ekey):
            params, opt_state = carry
            perm = jax.random.permutation(ekey, n)
            # wrap the tail so every minibatch is full-size (static shape)
            idx = jnp.concatenate(
                [perm, perm[:steps_per_epoch * bs - n]]).reshape(
                    steps_per_epoch, bs)

            def minibatch(carry, ids):
                params, opt_state = carry
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, eobs[ids], eacts[ids])
                upd, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, upd)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                minibatch, (params, opt_state), idx)
            return (params, opt_state), jnp.mean(losses)

        keys = jax.random.split(key, epochs)
        (params, opt_state), losses = jax.lax.scan(
            epoch, (params, opt_state), keys)
        return params, opt_state, losses

    key = jax.random.PRNGKey(seed)
    key, pkey = jax.random.split(key)
    params = p_init(pkey)
    params, _, losses = train(params, tx.init(params), key,
                              expert_obs, expert_actions)
    return params, float(losses[-1])


# ---------------------------------------------------------------------------
# TRPO-generator GAIL (the reference gail/trpo_mpi.py shape)
# ---------------------------------------------------------------------------

@struct.dataclass
class GAILTRPOState:
    pi_params: Any
    vf_params: Any
    vf_opt: Any
    disc_params: Any
    disc_opt: Any
    env_state: Any
    key: jnp.ndarray
    update: jnp.ndarray
    # expert data as donated jit arguments, not HLO constants (see
    # GAILState)
    expert_obs: jnp.ndarray
    expert_onehot: jnp.ndarray


def make_gail_trpo(env_fns, expert_obs, expert_actions, *, network="mlp",
                   nsteps=32, gamma=0.99, lam=0.97, max_kl=0.01,
                   cg_iters=10, cg_damping=0.1, vf_stepsize=3e-4,
                   vf_iters=3, ent_coef=0.0, disc_lr=3e-4, disc_steps=1,
                   disc_entcoeff=1e-3, reward_scale=1.0,
                   pretrain_params=None, network_kwargs=None):
    """GAIL with the reference's TRPO generator: discriminator reward
    -log(1 - D(s, a)) drives KL-constrained natural-gradient steps
    (trust_region_update shared with rl/trpo.py). ``reward_scale=0``
    ablates the adversarial reward (for tests that must fail without it).
    ``pretrain_params`` warm-starts the policy (behavior_clone output).

    The adversary is deliberately the slow player, as in the reference
    (gail/trpo_mpi.py:245-326 runs g_step generator iterations per single
    d_step at d_stepsize 3e-4): returns a separate ``disc_step`` program
    so learn() can train the discriminator every ``g_step``-th update —
    a disc trained every step races to accuracy ~1 and the softplus
    reward (and its gradient) vanishes."""
    from toybox_tpu.rl.trpo import trust_region_update

    num_envs = env_fns.num_envs
    nact = env_fns.num_actions
    nbatch = num_envs * nsteps

    pi_mod, pi_init, pi_step, _ = build_policy(
        env_fns.obs_shape, nact, network, **(network_kwargs or {}))
    vf_mod, vf_init, _, vf_value = build_policy(
        env_fns.obs_shape, nact, network, **(network_kwargs or {}))
    disc = Discriminator()
    vf_tx = optax.adam(vf_stepsize)
    disc_tx = optax.adam(disc_lr)

    expert_obs = jnp.asarray(expert_obs)
    expert_onehot = jax.nn.one_hot(jnp.asarray(expert_actions), nact,
                                   dtype=F32)

    def init_fn(seed=0):
        key = jax.random.PRNGKey(seed)
        key, k1, k2, k3, ekey = jax.random.split(key, 5)
        pi_params = pretrain_params if pretrain_params is not None \
            else pi_init(k1)
        vf_params = vf_init(k2)
        dummy_o = jnp.zeros((1,) + tuple(env_fns.obs_shape), F32)
        disc_params = disc.init(k3, dummy_o, jnp.zeros((1, nact), F32))
        seeds = (jax.random.randint(ekey, (num_envs,), 0, 2**31 - 1)
                 .astype(jnp.uint32))
        env_state, _ = env_fns.reset(seeds)
        st = GAILTRPOState(pi_params=pi_params, vf_params=vf_params,
                           vf_opt=vf_tx.init(vf_params),
                           disc_params=disc_params,
                           disc_opt=disc_tx.init(disc_params),
                           env_state=env_state, key=key,
                           update=jnp.asarray(0, jnp.int32),
                           expert_obs=expert_obs,
                           expert_onehot=expert_onehot)
        return jax.tree_util.tree_map(jnp.array, st)

    # Split into TWO jit programs (rollout+discriminator+GAE, then the
    # CG/line-search update), mirroring rl/trpo.py: the fused graph's
    # double-grad Fisher-vector products stacked on the env pipeline AND
    # the discriminator make one huge XLA program that is needlessly
    # hard on the compiler (the fused TRPO variant took the remote
    # compile service down in round 2).
    def rollout_step(state: GAILTRPOState):
        # --- rollout (true env rewards discarded; D provides them) -------
        def body(carry, _):
            env_state, key = carry
            obs = env_state.frames
            key, akey = jax.random.split(key)
            actions, _, neglogps, _ = pi_step(state.pi_params, obs, akey)
            values = vf_value(state.vf_params, obs)
            env_state, _, true_r, dones, _ = env_fns.step(env_state,
                                                          actions)
            return (env_state, key), (obs, actions, values, neglogps,
                                      dones, true_r)

        (env_state, key), traj = jax.lax.scan(
            body, (state.env_state, state.key), None, length=nsteps)
        obs, actions, values, neglogps, dones, true_r = traj

        def fl(x):
            return x.reshape((nbatch,) + x.shape[2:])

        fobs, facts = fl(obs), fl(actions)
        pol_onehot = jax.nn.one_hot(facts, nact, dtype=F32)

        # --- adversarial reward + GAE (CURRENT discriminator — the
        # reference computes the g-step rewards before the d-step) --------
        logit_flat = disc.apply(state.disc_params, fobs, pol_onehot)
        adv_reward = reward_scale * jax.nn.softplus(logit_flat)
        rewards = adv_reward.reshape(nsteps, num_envs)
        last_value = vf_value(state.vf_params, env_state.frames)

        def gae_body(carry, t):
            v, r, d = t
            next_adv, next_v = carry
            nonterm = 1.0 - d.astype(F32)
            delta = r + gamma * next_v * nonterm - v
            adv = delta + gamma * lam * nonterm * next_adv
            return (adv, v), adv

        (_, _), advs = jax.lax.scan(
            gae_body, (jnp.zeros_like(last_value), last_value),
            (values, rewards, dones), reverse=True)
        returns = advs + values
        fadv = fl(advs)
        fadv = (fadv - fadv.mean()) / (fadv.std() + 1e-8)
        fret, fnlp = fl(returns), fl(neglogps)

        batch = dict(fobs=fobs, facts=facts, fadv=fadv, fnlp=fnlp,
                     fret=fret)
        roll_metrics = dict(adv_reward=jnp.mean(adv_reward),
                            true_reward=jnp.mean(true_r))
        state = state.replace(env_state=env_state, key=key)
        return state, batch, roll_metrics

    def update_step(state: GAILTRPOState, batch):
        fobs, facts = batch["fobs"], batch["facts"]
        fadv, fnlp, fret = batch["fadv"], batch["fnlp"], batch["fret"]

        # --- TRPO generator step ------------------------------------------
        pi_params, tr_metrics = trust_region_update(
            pi_mod, nact, state.pi_params, fobs, facts, fadv, fnlp,
            max_kl=max_kl, cg_iters=cg_iters, cg_damping=cg_damping,
            ent_coef=ent_coef)

        # --- value-function fit -------------------------------------------
        def vf_loss_fn(params):
            v = vf_value(params, fobs)
            return jnp.mean(jnp.square(v - fret))

        def vf_iter(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(vf_loss_fn)(params)
            upd, opt_state = vf_tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, upd)
            return (params, opt_state), loss

        (vf_params, vf_opt), vf_losses = jax.lax.scan(
            vf_iter, (state.vf_params, state.vf_opt), None,
            length=vf_iters)

        metrics = dict(vf_loss=vf_losses[-1], **tr_metrics)
        return state.replace(pi_params=pi_params, vf_params=vf_params,
                             vf_opt=vf_opt,
                             update=state.update + 1), metrics

    def disc_step(state: GAILTRPOState, batch):
        """One adversary update on the last rollout's transitions
        (gail/trpo_mpi.py:311-326 trains the TransitionClassifier after
        the g_step generator iterations, on policy-vs-expert minibatches)."""
        fobs, facts = batch["fobs"], batch["facts"]
        pol_onehot = jax.nn.one_hot(facts, nact, dtype=F32)

        def disc_loss_fn(params, ekey):
            idx = jax.random.randint(ekey, (nbatch,), 0,
                                     state.expert_obs.shape[0])
            e_logit = disc.apply(params, state.expert_obs[idx],
                                 state.expert_onehot[idx])
            p_logit = disc.apply(params, fobs, pol_onehot)
            # entropy bonus keeps the adversary from saturating
            # (adversary.py:43-46, entcoeff default 1e-3)
            ent = jnp.mean(logit_bernoulli_entropy(
                jnp.concatenate([p_logit, e_logit])))
            loss = (optax.sigmoid_binary_cross_entropy(
                        e_logit, jnp.ones_like(e_logit)).mean()
                    + optax.sigmoid_binary_cross_entropy(
                        p_logit, jnp.zeros_like(p_logit)).mean()
                    - disc_entcoeff * ent)
            acc = 0.5 * (jnp.mean(e_logit > 0) + jnp.mean(p_logit < 0))
            return loss, acc

        key = state.key
        disc_params, disc_opt = state.disc_params, state.disc_opt
        dloss = dacc = jnp.asarray(0.0)
        for _ in range(disc_steps):
            key, dkey = jax.random.split(key)
            (dloss, dacc), dgrads = jax.value_and_grad(
                disc_loss_fn, has_aux=True)(disc_params, dkey)
            dupd, disc_opt = disc_tx.update(dgrads, disc_opt, disc_params)
            disc_params = optax.apply_updates(disc_params, dupd)

        metrics = dict(disc_loss=dloss, disc_acc=dacc)
        return state.replace(disc_params=disc_params, disc_opt=disc_opt,
                             key=key), metrics

    def train_step(state: GAILTRPOState):
        state, batch, roll_metrics = rollout_step(state)
        state, metrics = update_step(state, batch)
        state, disc_metrics = disc_step(state, batch)
        return state, {**metrics, **roll_metrics, **disc_metrics}

    return init_fn, train_step, rollout_step, update_step, disc_step


def learn(*, env=None, game="breakout", num_envs=8, expert_path=None,
          expert_model=None, n_expert_transitions=4096, expert_stride=1,
          total_updates=None, total_timesteps=None, seed=0,
          network="cnn_small", nsteps=32, bc_epochs=0, generator="trpo",
          g_step=3, log_interval=10, logger=None, save_path=None,
          load_path=None, network_kwargs=None, **extra):
    """Full reference pipeline: load/extract expert data, optional BC
    warm start, adversarial imitation. ``load_path`` doubles as the
    expert model when ``expert_model`` is not given (run.py CLI path:
    --alg=gail --load_path=models/Breakout.regress.model)."""
    from toybox_tpu.envs.pipeline import make_rl_env

    env_fns = env if env is not None else make_rl_env(game, num_envs)
    if expert_model is None and expert_path is None:
        expert_model = load_path
    if total_updates is None:
        if total_timesteps is not None:
            # --num_timesteps=0 means "no adversarial updates": pure
            # behavior cloning (the gail/behavior_clone.py surface),
            # saving the BC policy as-is.
            fpstep = getattr(env_fns, "frames_per_step", 1)
            total_updates = (
                0 if int(total_timesteps) == 0 else max(
                    int(total_timesteps)
                    // (env_fns.num_envs * nsteps * fpstep), 1))
        else:
            total_updates = 100
    if expert_path is not None:
        expert_obs, expert_actions = load_expert_dataset(expert_path)
    else:
        assert expert_model is not None, "need expert_path or expert_model"
        expert_obs, expert_actions = generate_expert_dataset(
            env_fns, load_path=expert_model,
            n_transitions=n_expert_transitions, network="cnn", seed=seed,
            stride=expert_stride)

    pretrain = None
    if bc_epochs:
        pretrain, bc_loss = behavior_clone(
            env_fns, expert_obs, expert_actions, network=network,
            epochs=bc_epochs, seed=seed, network_kwargs=network_kwargs)
        if logger is not None:
            logger.logkv("bc_final_loss", bc_loss)

    kwargs = dict(network=network, nsteps=nsteps,
                  network_kwargs=network_kwargs)
    if generator == "trpo":
        # forward maker knobs given on the CLI (--disc_lr=, --max_kl=, …)
        maker_keys = ("gamma", "lam", "max_kl", "cg_iters", "cg_damping",
                      "vf_stepsize", "vf_iters", "ent_coef", "disc_lr",
                      "disc_steps", "disc_entcoeff", "reward_scale")
        kwargs.update({k: extra.pop(k) for k in maker_keys if k in extra})
        init_fn, _, rollout_step, update_step, disc_step = make_gail_trpo(
            env_fns, expert_obs, expert_actions, pretrain_params=pretrain,
            **kwargs)
        state = init_fn(seed)
        rollout_jit = jax.jit(rollout_step, donate_argnums=(0,))
        update_jit = jax.jit(update_step, donate_argnums=(0,))
        disc_jit = jax.jit(disc_step, donate_argnums=(0,))
        disc_metrics = {}

        def step_jit(state, i):
            nonlocal disc_metrics
            state, batch, roll_metrics = rollout_jit(state)
            state, metrics = update_jit(state, batch)
            # reference pacing: one adversary d_step per g_step
            # generator iterations (gail/trpo_mpi.py:245-326)
            if i % g_step == 0:
                state, disc_metrics = disc_jit(state, batch)
            return state, {**metrics, **roll_metrics, **disc_metrics}
    else:
        init_fn, step = make_gail(env_fns, expert_obs, expert_actions,
                                  **kwargs)
        state = init_fn(seed)
        if pretrain is not None:
            state = state.replace(pi_params=pretrain)
        _sj = jax.jit(step, donate_argnums=(0,))

        def step_jit(state, i):
            return _sj(state)
    t0 = time.perf_counter()
    for i in range(1, total_updates + 1):
        state, metrics = step_jit(state, i)
        if logger is not None and i % log_interval == 0:
            fpstep = getattr(env_fns, "frames_per_step", 1)
            logger.logkv("nupdates", i)
            logger.logkv("fps", int(i * env_fns.num_envs * nsteps * fpstep
                                    / (time.perf_counter() - t0)))
            for k, v in jax.device_get(metrics).items():
                logger.logkv(k, float(v))
            logger.dumpkvs()
    jax.block_until_ready(state.pi_params)
    if save_path is not None:
        from toybox_tpu.rl.ppo import save_params

        save_params(save_path, state.pi_params)
    return state
