"""SAC learner: Flax networks + Optax updates, fully on-device.

TPU-native replacement for the reference's stable-baselines3 SAC training
stack (/root/reference/scripts/train_sac.py:313-337): same algorithmic
surface — twin Q critics, squashed-Gaussian actor, automatic entropy tuning
with target_entropy (-2.0 in the reference), Polyak target updates, obs
normalization (the reference wraps envs in VecNormalize(norm_obs=True,
clip_obs=10), train_sac.py:294-310) — but the replay buffer, env batch and
gradient steps all live on the same chip/mesh, replacing SubprocVecEnv
worker pipes with vmapped envs feeding a jitted update.

Everything is a pure function over a SACState pytree, so the whole
train-step (env rollout + buffer write + gradient update) jits, vmaps and
pjit-shards; checkpointing is one pytree save.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

import flax.linen as nn
import optax


def _pytree(cls, static=()):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(
        cls,
        data_fields=[f for f in fields if f not in static],
        meta_fields=list(static),
    )
    return cls


class MLP(nn.Module):
    """Policy/critic torso: the reference uses net_arch [256, 256]
    (train_bc.py:159-279 and SB3 SAC defaults)."""

    features: tuple
    out: int

    @nn.compact
    def __call__(self, x):
        for f in self.features:
            x = nn.relu(nn.Dense(f)(x))
        return nn.Dense(self.out)(x)


class NatureCNN(nn.Module):
    """SB3 NatureCNN-style image encoder (the feature extractor behind the
    reference's MultiInputPolicy on so100_pixels_agent_pos obs,
    train_sac.py:313-316), sized for small training resolutions."""

    out: int = 256

    @nn.compact
    def __call__(self, img):  # (..., H, W, 3) float in [0, 1]
        x = nn.relu(nn.Conv(32, (8, 8), strides=(4, 4))(img))
        x = nn.relu(nn.Conv(64, (4, 4), strides=(2, 2))(x))
        x = nn.relu(nn.Conv(64, (3, 3), strides=(1, 1))(x))
        x = x.reshape(*x.shape[:-3], -1)
        return nn.relu(nn.Dense(self.out)(x))


class Encoder(nn.Module):
    """Obs front-end: identity for flat state obs; CNN ++ agent_pos for the
    pixels dict (MultiInputPolicy-equivalent)."""

    pixels: bool = False

    @nn.compact
    def __call__(self, obs):
        if not self.pixels:
            return obs
        z = NatureCNN()(obs["pixels"])
        return jnp.concatenate([z, obs["agent_pos"]], axis=-1)


class Actor(nn.Module):
    act_dim: int
    features: tuple = (256, 256)
    log_std_min: float = -20.0
    log_std_max: float = 2.0
    pixels: bool = False

    @nn.compact
    def __call__(self, obs):
        x = Encoder(self.pixels)(obs)
        h = MLP(self.features, 2 * self.act_dim)(x)
        mean, log_std = jnp.split(h, 2, axis=-1)
        log_std = jnp.clip(log_std, self.log_std_min, self.log_std_max)
        return mean, log_std


class Critic(nn.Module):
    features: tuple = (256, 256)
    pixels: bool = False

    @nn.compact
    def __call__(self, obs, act):
        enc = Encoder(self.pixels)(obs)
        x = jnp.concatenate([enc, act], axis=-1)
        q1 = MLP(self.features, 1)(x)
        q2 = MLP(self.features, 1)(x)
        return q1[..., 0], q2[..., 0]


def sample_action(actor_params, actor, obs, key):
    mean, log_std = actor.apply(actor_params, obs)
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    pre = mean + std * eps
    act = jnp.tanh(pre)
    # tanh-squashed Gaussian log prob
    logp = (
        -0.5 * (eps**2 + 2 * log_std + jnp.log(2 * jnp.pi))
        - jnp.log(jnp.maximum(1 - act**2, 1e-6))
    ).sum(-1)
    return act, logp


def det_action(actor_params, actor, obs):
    mean, _ = actor.apply(actor_params, obs)
    return jnp.tanh(mean)


@dataclass(frozen=True)
class Normalizer:
    """Running obs mean/var (VecNormalize equivalent, clip 10)."""

    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray

    @staticmethod
    def create(dim, dtype=jnp.float32):
        return Normalizer(
            mean=jnp.zeros(dim, dtype), var=jnp.ones(dim, dtype),
            count=jnp.asarray(1e-4, dtype),
        )

    def update(self, batch):
        bmean = batch.mean(0)
        bvar = batch.var(0)
        bcount = batch.shape[0]
        delta = bmean - self.mean
        tot = self.count + bcount
        mean = self.mean + delta * bcount / tot
        m_a = self.var * self.count
        m_b = bvar * bcount
        M2 = m_a + m_b + delta**2 * self.count * bcount / tot
        return Normalizer(mean=mean, var=M2 / tot, count=tot)

    def norm(self, obs, clip=10.0):
        return jnp.clip(
            (obs - self.mean) / jnp.sqrt(self.var + 1e-8), -clip, clip
        )


_pytree(Normalizer)


@dataclass(frozen=True)
class ReplayBuffer:
    """Fixed-capacity ring buffer of transitions as device arrays.

    `obs`/`next_obs` are pytrees: a flat (cap, obs_dim) array for state obs,
    or {"pixels": (cap, H, W, 3) uint8, "agent_pos": (cap, 6) f32} for the
    pixel obs type (images stored uint8 — 50k transitions of 64x48 pixels is
    ~0.5 GB HBM, vs 7.5 GB as f32)."""

    obs: Any
    act: jnp.ndarray
    rew: jnp.ndarray
    next_obs: Any
    done: jnp.ndarray          # terminal (not truncation)
    ptr: jnp.ndarray           # () int32
    size: jnp.ndarray          # () int32

    @staticmethod
    def create(capacity, obs_spec, act_dim, dtype=jnp.float32):
        """obs_spec: int (flat dim) or dict name -> (shape, dtype)."""
        z = jnp.zeros
        if isinstance(obs_spec, int):
            mk = lambda: z((capacity, obs_spec), dtype)
        else:
            mk = lambda: {
                k: z((capacity, *sh), dt) for k, (sh, dt) in obs_spec.items()
            }
        return ReplayBuffer(
            obs=mk(),
            act=z((capacity, act_dim), dtype),
            rew=z((capacity,), dtype),
            next_obs=mk(),
            done=z((capacity,), jnp.bool_),
            ptr=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
        )

    def add_batch(self, obs, act, rew, next_obs, done):
        """Insert a batch of B transitions at the ring pointer."""
        cap = self.act.shape[0]
        B = act.shape[0]
        idx = (self.ptr + jnp.arange(B)) % cap

        def put(buf, val):
            return buf.at[idx].set(jnp.asarray(val, buf.dtype))

        tput = lambda buf, val: jax.tree_util.tree_map(put, buf, val)
        return ReplayBuffer(
            obs=tput(self.obs, obs),
            act=put(self.act, act),
            rew=put(self.rew, rew),
            next_obs=tput(self.next_obs, next_obs),
            done=put(self.done, done),
            ptr=(self.ptr + B) % cap,
            size=jnp.minimum(self.size + B, cap),
        )

    def sample(self, key, batch_size):
        idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(self.size, 1))
        take = lambda tree: jax.tree_util.tree_map(lambda a: a[idx], tree)
        return dict(
            obs=take(self.obs), act=self.act[idx], rew=self.rew[idx],
            next_obs=take(self.next_obs), done=self.done[idx],
        )


_pytree(ReplayBuffer)


@dataclass(frozen=True)
class SACConfig:
    obs_dim: int = 15                # agent_pos dim when pixels is set
    act_dim: int = 6
    lr: float = 1e-4                 # train_sac.py:318
    buffer_size: int = 50_000        # train_sac.py:319
    batch_size: int = 256            # train_sac.py:321
    gamma: float = 0.99
    tau: float = 0.005
    target_entropy: float = -2.0     # train_sac.py:331
    features: tuple = (256, 256)
    # (H, W) for the pixels_agent_pos obs type (MultiInputPolicy-equivalent
    # CNN + state encoder); empty tuple = flat state obs
    pixels: tuple = ()


@dataclass(frozen=True)
class SACState:
    actor_params: Any
    critic_params: Any
    target_critic_params: Any
    log_alpha: jnp.ndarray
    actor_opt: Any
    critic_opt: Any
    alpha_opt: Any
    buffer: ReplayBuffer
    normalizer: Normalizer
    key: jnp.ndarray
    step: jnp.ndarray
    # dynamic hyperparameters — the reference's StageBasedTraining mutates
    # model.target_entropy / model.learning_rate between stages
    # (train_sac.py:429-482); here they live in the state pytree so stage
    # switches don't retrace the jitted train step
    target_entropy: jnp.ndarray = None
    lr_scale: jnp.ndarray = None


_pytree(SACState)


class SAC:
    """Functional SAC bound to a config; state lives in SACState."""

    def __init__(self, cfg: SACConfig):
        self.cfg = cfg
        pix = bool(cfg.pixels)
        self.actor = Actor(cfg.act_dim, cfg.features, pixels=pix)
        self.critic = Critic(cfg.features, pixels=pix)
        # base lr baked in; the runtime-varying stage multiplier (SACState.
        # lr_scale) is applied to the update pytree, keeping opt-state shapes
        # independent of the schedule
        self.actor_tx = optax.adam(cfg.lr)
        self.critic_tx = optax.adam(cfg.lr)
        self.alpha_tx = optax.adam(cfg.lr)

    def obs_spec(self):
        """Replay-buffer obs spec (see ReplayBuffer.create)."""
        cfg = self.cfg
        if not cfg.pixels:
            return cfg.obs_dim
        h, w = cfg.pixels
        return {
            "pixels": ((h, w, 3), jnp.uint8),
            "agent_pos": ((cfg.obs_dim,), jnp.float32),
        }

    def _zero_obs(self, n=1):
        cfg = self.cfg
        if not cfg.pixels:
            return jnp.zeros((n, cfg.obs_dim))
        h, w = cfg.pixels
        return {
            "pixels": jnp.zeros((n, h, w, 3), jnp.float32),
            "agent_pos": jnp.zeros((n, cfg.obs_dim)),
        }

    def init(self, key) -> SACState:
        cfg = self.cfg
        k1, k2, k3 = jax.random.split(key, 3)
        obs0 = self._zero_obs()
        act0 = jnp.zeros((1, cfg.act_dim))
        actor_params = self.actor.init(k1, obs0)
        critic_params = self.critic.init(k2, obs0, act0)
        return SACState(
            actor_params=actor_params,
            critic_params=critic_params,
            target_critic_params=critic_params,
            log_alpha=jnp.zeros(()),
            actor_opt=self.actor_tx.init(actor_params),
            critic_opt=self.critic_tx.init(critic_params),
            alpha_opt=self.alpha_tx.init(jnp.zeros(())),
            buffer=ReplayBuffer.create(
                cfg.buffer_size, self.obs_spec(), cfg.act_dim
            ),
            normalizer=Normalizer.create(cfg.obs_dim),
            key=k3,
            step=jnp.zeros((), jnp.int32),
            target_entropy=jnp.asarray(cfg.target_entropy, jnp.float32),
            lr_scale=jnp.ones((), jnp.float32),
        )

    def _norm_obs(self, normalizer, obs):
        """Normalize: running mean/var on the state part (VecNormalize
        equivalent); pixels scaled to [0, 1]."""
        if not self.cfg.pixels:
            return normalizer.norm(obs)
        return {
            "pixels": obs["pixels"].astype(jnp.float32) / 255.0,
            "agent_pos": normalizer.norm(
                obs["agent_pos"].astype(jnp.float32)
            ),
        }

    # -- acting --------------------------------------------------------------

    def act(self, st: SACState, obs, key, deterministic=False):
        nobs = self._norm_obs(st.normalizer, obs)
        if deterministic:
            return det_action(st.actor_params, self.actor, nobs)
        return sample_action(st.actor_params, self.actor, nobs, key)[0]

    # -- learning ------------------------------------------------------------

    def update(self, st: SACState, batch) -> tuple[SACState, dict]:
        cfg = self.cfg
        key, k1, k2 = jax.random.split(st.key, 3)
        nobs = self._norm_obs(st.normalizer, batch["obs"])
        nnext = self._norm_obs(st.normalizer, batch["next_obs"])
        alpha = jnp.exp(st.log_alpha)

        # critic target
        next_act, next_logp = sample_action(
            st.actor_params, self.actor, nnext, k1
        )
        tq1, tq2 = self.critic.apply(st.target_critic_params, nnext, next_act)
        tq = jnp.minimum(tq1, tq2) - alpha * next_logp
        target = batch["rew"] + cfg.gamma * (~batch["done"]) * tq
        target = jax.lax.stop_gradient(target)

        def critic_loss(p):
            q1, q2 = self.critic.apply(p, nobs, batch["act"])
            return ((q1 - target) ** 2 + (q2 - target) ** 2).mean()

        lr_scale = jnp.ones(()) if st.lr_scale is None else st.lr_scale
        scale_up = lambda up: jax.tree_util.tree_map(lambda u: u * lr_scale, up)

        closs, cgrad = jax.value_and_grad(critic_loss)(st.critic_params)
        cup, copt = self.critic_tx.update(cgrad, st.critic_opt)
        critic_params = optax.apply_updates(st.critic_params, scale_up(cup))

        def actor_loss(p):
            a, logp = sample_action(p, self.actor, nobs, k2)
            q1, q2 = self.critic.apply(critic_params, nobs, a)
            return (alpha * logp - jnp.minimum(q1, q2)).mean(), logp

        (aloss, logp), agrad = jax.value_and_grad(actor_loss, has_aux=True)(
            st.actor_params
        )
        aup, aopt = self.actor_tx.update(agrad, st.actor_opt)
        actor_params = optax.apply_updates(st.actor_params, scale_up(aup))

        target_entropy = (
            jnp.asarray(cfg.target_entropy)
            if st.target_entropy is None else st.target_entropy
        )

        def alpha_loss(la):
            return -(
                jnp.exp(la) * jax.lax.stop_gradient(logp + target_entropy)
            ).mean()

        lloss, lgrad = jax.value_and_grad(alpha_loss)(st.log_alpha)
        lup, lopt = self.alpha_tx.update(lgrad, st.alpha_opt)
        log_alpha = optax.apply_updates(st.log_alpha, scale_up(lup))

        target_params = jax.tree_util.tree_map(
            lambda t, p: (1 - cfg.tau) * t + cfg.tau * p,
            st.target_critic_params, critic_params,
        )

        st2 = dataclasses.replace(
            st,
            actor_params=actor_params,
            critic_params=critic_params,
            target_critic_params=target_params,
            log_alpha=log_alpha,
            actor_opt=aopt,
            critic_opt=copt,
            alpha_opt=lopt,
            key=key,
            step=st.step + 1,
        )
        metrics = dict(
            critic_loss=closs, actor_loss=aloss, alpha=jnp.exp(log_alpha),
            entropy=-logp.mean(),
        )
        return st2, metrics

    def train_step(self, st: SACState, obs, act, rew, next_obs, done):
        """Ingest a batch of env transitions and do one gradient update."""
        buffer = st.buffer.add_batch(obs, act, rew, next_obs, done)
        normalizer = st.normalizer.update(
            obs["agent_pos"] if self.cfg.pixels else obs
        )
        st = dataclasses.replace(st, buffer=buffer, normalizer=normalizer)
        key, sub = jax.random.split(st.key)
        batch = st.buffer.sample(sub, self.cfg.batch_size)
        st = dataclasses.replace(st, key=key)
        return self.update(st, batch)
