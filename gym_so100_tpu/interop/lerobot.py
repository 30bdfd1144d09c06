"""LeRobot dataset/policy interop.

Mirrors the reference's LeRobot bridges — demo pickle -> LeRobotDataset
(upload_lerobot_demos.py:12-222) and pretrained-policy rollout
(evaluate_lerobot_policy.py:11-153) — with the same feature schema and the
gym<->LeRobot unit conversions from constants.py:60-96.  The `lerobot`
package is an optional dependency (not installed in this image); every entry
point degrades with a clear error when it is missing."""

from __future__ import annotations

import numpy as np

from ..envs import constants as C

FEATURES = {
    # schema of upload_lerobot_demos.py:34-102
    "observation.images.top": {"dtype": "video", "shape": (3, 480, 640),
                               "names": ["channel", "height", "width"]},
    "observation.state": {"dtype": "float32", "shape": (6,), "names": None},
    "action": {"dtype": "float32", "shape": (6,), "names": None},
    "next.reward": {"dtype": "float32", "shape": (1,), "names": None},
    "next.success": {"dtype": "bool", "shape": (1,), "names": None},
    "seed": {"dtype": "int64", "shape": (1,), "names": None},
}


def _require_lerobot():
    try:
        import lerobot  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "LeRobot interop needs the 'lerobot' package (pip install lerobot)"
        ) from e


def demos_to_lerobot_dataset(demo_paths, repo_id, fps=50, push=False,
                             task_text="Put the red cube into the bin"):
    """Convert reference-format demo pickles to a LeRobotDataset
    (upload_lerobot_demos.py:104-222)."""
    _require_lerobot()
    import pickle

    from lerobot.common.datasets.lerobot_dataset import LeRobotDataset

    ds = LeRobotDataset.create(
        repo_id=repo_id, fps=fps, features=FEATURES, use_videos=True
    )
    for path in demo_paths:
        with open(path, "rb") as f:
            episodes = pickle.load(f)
        for ep_i, ep in enumerate(episodes):
            acts = np.asarray(ep["actions"], np.float32)
            rews = np.asarray(ep["rewards"], np.float32)
            for t in range(len(acts)):
                obs = ep["observations"][t]
                state = obs["agent_pos"] if isinstance(obs, dict) else obs[-6:]
                frame = {
                    "observation.state": np.asarray(
                        C.normalize_gym_so100_to_lerobot(state), np.float32
                    ),
                    "action": np.asarray(
                        C.normalize_gym_so100_to_lerobot(
                            C.unnormalize_so100(acts[t])
                        ),
                        np.float32,
                    ),
                    "next.reward": np.asarray([rews[t]], np.float32),
                    "next.success": np.asarray([rews[t] >= 4.0]),
                    "seed": np.asarray([ep_i], np.int64),
                }
                if isinstance(obs, dict) and "pixels" in obs:
                    frame["observation.images.top"] = np.transpose(
                        obs["pixels"], (2, 0, 1)
                    )
                ds.add_frame(frame, task=task_text)
            ds.save_episode()
    if push:
        ds.push_to_hub()
    return ds


POLICY_CLASSES = {
    # evaluate_lerobot_policy.py:11-28
    "act": "lerobot.common.policies.act.modeling_act.ACTPolicy",
    "diffusion": "lerobot.common.policies.diffusion.modeling_diffusion.DiffusionPolicy",
    "pi0fast": "lerobot.common.policies.pi0fast.modeling_pi0fast.PI0FASTPolicy",
    "smolvla": "lerobot.common.policies.smolvla.modeling_smolvla.SmolVLAPolicy",
}


def load_pretrained_policy(kind, path_or_repo):
    _require_lerobot()
    import importlib

    module, cls = POLICY_CLASSES[kind].rsplit(".", 1)
    policy_cls = getattr(importlib.import_module(module), cls)
    return policy_cls.from_pretrained(path_or_repo)


def rollout_policy(policy, env, episodes=1, lerobot_units=True, task_text=None,
                   video_path=None):
    """Roll a LeRobot policy in a gym_so100_tpu env
    (evaluate_lerobot_policy.py:77-153)."""
    _require_lerobot()
    import torch

    frames, returns, successes = [], [], []
    for ep in range(episodes):
        obs, info = env.reset(seed=ep)
        total = 0.0
        done = False
        while not done:
            state = obs["agent_pos"] if isinstance(obs, dict) else obs[-6:]
            if lerobot_units:
                state = np.asarray(C.normalize_gym_so100_to_lerobot(state))
            batch = {
                "observation.state": torch.as_tensor(state, dtype=torch.float32)[None],
            }
            if isinstance(obs, dict) and "pixels" in obs:
                img = torch.as_tensor(obs["pixels"]).permute(2, 0, 1)[None] / 255.0
                batch["observation.images.top"] = img.float()
            if task_text is not None:
                batch["task"] = [task_text]
            with torch.no_grad():
                action = policy.select_action(batch)[0].cpu().numpy()
            if lerobot_units:
                action = np.asarray(C.normalize_lerobot_to_gym_so100(action))
            obs, reward, term, trunc, info = env.step(np.asarray(action, np.float32))
            total += float(reward)
            done = term or trunc
            if video_path and ep == 0:
                frames.append(np.asarray(env.render()))
        returns.append(total)
        successes.append(bool(info.get("is_success", False)))
    if video_path and frames:
        import imageio

        imageio.mimsave(video_path, np.stack(frames), fps=50)
    return {"returns": returns, "successes": successes}
