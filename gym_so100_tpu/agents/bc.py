"""Behavior cloning from teleop demonstrations.

Replaces /root/reference/scripts/train_bc.py's imitation-library BC
(train_bc.py:159-279): loads the same pickled demo format the reference
recorder writes (a list of episode dicts with "observations", "actions",
"rewards", "infos"; record_teleop.py:158-494), trains a Flax policy with the
same [256, 256] architecture by maximum likelihood, and supports
shape-matched weight transfer into the SAC actor for fine-tuning
(train_bc.py:282-353).

Both obs types are supported, mirroring the reference's
MultiInputActorCriticPolicy: flat state vectors, and the pixels dict
{"pixels": (H, W, 3), "agent_pos": (6,)} through the same NatureCNN
encoder the pixels SAC actor uses (agents/sac.py Encoder) — so BC-learned
weights transfer into the pixels SAC actor parameter-for-parameter.
"""

from __future__ import annotations

import pickle

import numpy as np

import jax
import jax.numpy as jnp
import optax

from .sac import SAC, Actor, SACState


def load_demo_transitions(paths, obs_key=None, pixels=False):
    """Flatten demo pickles into (obs, act) arrays.

    Observations may be dicts (pixels/state) or flat arrays; `obs_key`
    selects a dict entry.  By default flat arrays are used as-is and dict
    obs use the non-pixel features concatenated.  With pixels=True, dict
    observations keep their frames: returns
    ({"pixels": (N, H, W, 3) uint8, "agent_pos": (N, D) f32}, act)."""
    obs_l, act_l, pix_l = [], [], []
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
                    if pixels:
                        pix_l.append(np.asarray(o["pixels"], np.uint8))
                        o = o.get("agent_pos", o.get("qpos"))
                    elif obs_key:
                        o = o[obs_key]
                    else:
                        o = np.concatenate(
                            [np.ravel(o[k]) for k in sorted(o) if k != "pixels"]
                        )
                elif pixels:
                    raise ValueError("pixels=True needs dict observations")
                obs_l.append(np.asarray(o, np.float32).ravel())
                act_l.append(acts[i])
    if pixels:
        return (
            {"pixels": np.stack(pix_l), "agent_pos": np.stack(obs_l)},
            np.stack(act_l),
        )
    return np.stack(obs_l), np.stack(act_l)


def _take(obs, idx):
    if isinstance(obs, dict):
        return {k: v[idx] for k, v in obs.items()}
    return obs[idx]


def train_bc(obs, act, epochs=50, batch_size=256, lr=3e-4, seed=0,
             features=(256, 256), progress=None):
    """Gaussian MLE behavior cloning; returns (actor, params).

    `obs` is a flat (N, D) array, or the pixels dict from
    load_demo_transitions(pixels=True) — then the actor is the pixels
    Actor (NatureCNN encoder ++ agent_pos), matching the reference's
    MultiInputActorCriticPolicy BC (train_bc.py:159-279)."""
    pixels = isinstance(obs, dict)
    if pixels:
        obs = {
            "pixels": np.asarray(obs["pixels"], np.uint8),
            "agent_pos": jnp.asarray(obs["agent_pos"], jnp.float32),
        }
        n = obs["agent_pos"].shape[0]
    else:
        obs = jnp.asarray(obs)
        n = obs.shape[0]
    act = jnp.asarray(act)
    actor = Actor(act.shape[-1], features, pixels=pixels)
    key = jax.random.PRNGKey(seed)

    def prep(o):
        """uint8 frames -> [0, 1] floats at batch time (keeps the demo set
        in memory as uint8, like the pixel replay buffer)."""
        if not pixels:
            return o
        return {
            "pixels": jnp.asarray(o["pixels"], jnp.float32) / 255.0,
            "agent_pos": o["agent_pos"],
        }

    params = actor.init(key, prep(_take(obs, slice(0, 1))))
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
        l, g = jax.value_and_grad(loss_fn)(p, prep(o), a)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(p, up), opt, l

    rng = np.random.RandomState(seed)
    bs = min(batch_size, n)
    for e in range(epochs):
        order = rng.permutation(n)
        losses = []
        for i in range(0, n - bs + 1, bs):
            idx = order[i : i + bs]
            params, opt, l = step(params, opt, _take(obs, idx), act[idx])
            losses.append(float(l))
        if progress:
            progress({"epoch": e, "bc_loss": float(np.mean(losses))})
    return actor, params


def transfer_to_sac(sac: SAC, st: SACState, bc_params) -> SACState:
    """Load BC policy weights into the SAC actor (the architectures match —
    for both obs types, including the pixels CNN encoder — so this is a
    straight parameter replacement; the reference does a shape-matched
    state-dict copy, train_bc.py:282-353)."""
    import dataclasses

    ref = jax.tree_util.tree_structure(st.actor_params)
    new = jax.tree_util.tree_structure(bc_params)
    if ref != new:
        raise ValueError(
            "BC policy and SAC actor architectures differ "
            f"(did you train BC with the same pixels= setting?): {ref} vs {new}"
        )
    return dataclasses.replace(st, actor_params=bc_params)
