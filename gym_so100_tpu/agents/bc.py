"""Behavior cloning from teleop demonstrations.

Replaces /root/reference/scripts/train_bc.py's imitation-library BC
(train_bc.py:159-279): loads the same pickled demo format the reference
recorder writes (a list of episode dicts with "observations", "actions",
"rewards", "infos"; record_teleop.py:158-494), trains a Flax policy with the
same [256, 256] architecture by maximum likelihood, and supports
shape-matched weight transfer into the SAC actor for fine-tuning
(train_bc.py:282-353)."""

from __future__ import annotations

import pickle

import numpy as np

import jax
import jax.numpy as jnp
import optax

from .sac import SAC, Actor, SACState


def load_demo_transitions(paths, obs_key=None):
    """Flatten demo pickles into (obs, act) arrays.

    Observations may be dicts (pixels/state) or flat arrays; `obs_key`
    selects a dict entry; by default flat arrays are used as-is and dict
    obs use 'agent_pos' ++ state features when present."""
    obs_l, act_l = [], []
    for p in paths:
        with open(p, "rb") as f:
            episodes = pickle.load(f)
        for ep in episodes:
            obs = ep["observations"]
            acts = np.asarray(ep["actions"], np.float32)
            n = len(acts)
            for i in range(n):
                o = obs[i]
                if isinstance(o, dict):
                    o = o[obs_key] if obs_key else np.concatenate(
                        [np.ravel(o[k]) for k in sorted(o) if k != "pixels"]
                    )
                obs_l.append(np.asarray(o, np.float32).ravel())
                act_l.append(acts[i])
    return np.stack(obs_l), np.stack(act_l)


def train_bc(obs, act, epochs=50, batch_size=256, lr=3e-4, seed=0,
             features=(256, 256), progress=None):
    """Gaussian MLE behavior cloning; returns (actor, params)."""
    obs = jnp.asarray(obs)
    act = jnp.asarray(act)
    actor = Actor(act.shape[-1], features)
    key = jax.random.PRNGKey(seed)
    params = actor.init(key, obs[:1])
    tx = optax.adam(lr)
    opt = tx.init(params)

    def loss_fn(p, o, a):
        mean, log_std = actor.apply(p, o)
        # invert tanh squashing on the targets (clip to the open interval)
        pre = jnp.arctanh(jnp.clip(a, -0.999, 0.999))
        nll = 0.5 * ((pre - mean) / jnp.exp(log_std)) ** 2 + log_std
        return nll.mean()

    @jax.jit
    def step(p, opt, o, a):
        l, g = jax.value_and_grad(loss_fn)(p, o, a)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(p, up), opt, l

    n = obs.shape[0]
    rng = np.random.RandomState(seed)
    for e in range(epochs):
        order = rng.permutation(n)
        losses = []
        for i in range(0, n - batch_size + 1, batch_size):
            idx = order[i : i + batch_size]
            params, opt, l = step(params, opt, obs[idx], act[idx])
            losses.append(float(l))
        if progress:
            progress({"epoch": e, "bc_loss": float(np.mean(losses))})
    return actor, params


def transfer_to_sac(sac: SAC, st: SACState, bc_params) -> SACState:
    """Load BC policy weights into the SAC actor (the architectures match,
    so this is a straight parameter replacement — the reference does a
    shape-matched state-dict copy, train_bc.py:282-353)."""
    import dataclasses

    return dataclasses.replace(st, actor_params=bc_params)
