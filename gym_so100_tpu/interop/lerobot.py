"""LeRobot dataset/policy interop.

Mirrors the reference's LeRobot bridges — demo pickle -> LeRobotDataset
(upload_lerobot_demos.py:12-222) and pretrained-policy rollout
(evaluate_lerobot_policy.py:11-153) — with the same feature schema and the
gym<->LeRobot unit conversions from constants.py:60-96.  The `lerobot`
package is an optional dependency (not installed in this image); every entry
point degrades with a clear error when it is missing.

API-version pin: the reference imports the FLATTENED namespaces
`lerobot.datasets.lerobot_dataset` (upload_lerobot_demos.py:8) and
`lerobot.policies.<kind>.modeling_<kind>` (evaluate_lerobot_policy.py:11-14),
i.e. lerobot >= 0.2.0 (the 2025 restructure that dropped the
`lerobot.common.` prefix).  The surface used, verified against the
reference call sites:
  * LeRobotDataset.create(repo_id=, fps=, root=, features=,
    image_writer_processes=, image_writer_threads=)   (upload:95-102)
  * dataset.add_frame(frame_dict, task=str)           (upload:203)
  * dataset.image_writer.wait_until_done()            (upload:209, optional)
  * dataset.save_episode()                            (upload:212)
  * dataset.clear_episode_buffer()                    (upload:213; removed in
    newer lerobot where save_episode clears — called only if present)
  * dataset.push_to_hub()                             (upload:217)
  * <Policy>.from_pretrained(path), .select_action(batch)  (evaluate:22-28,83)
This module imports the flattened paths first and falls back to the legacy
`lerobot.common.` prefix so pre-0.2 installs keep working.  The real
package cannot be installed in this build image (no network egress);
tests/test_lerobot_interop.py executes these bodies under a fake-module
harness that mounts BOTH namespace layouts, and
test_real_lerobot_if_installed runs against the real package whenever it
is importable."""

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

    try:
        # lerobot >= 0.2 flattened layout (what the reference imports,
        # upload_lerobot_demos.py:8)
        from lerobot.datasets.lerobot_dataset import LeRobotDataset
    except ImportError:
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
            # reference flow (upload_lerobot_demos.py:209-213): drain the
            # async image writer, save, then clear the episode buffer on
            # lerobot versions that still have it (newer save_episode clears)
            writer = getattr(ds, "image_writer", None)
            if writer is not None and hasattr(writer, "wait_until_done"):
                writer.wait_until_done()
            ds.save_episode()
            if hasattr(ds, "clear_episode_buffer"):
                ds.clear_episode_buffer()
    if push:
        ds.push_to_hub()
    return ds


POLICY_CLASSES = {
    # evaluate_lerobot_policy.py:11-14 (flattened lerobot >= 0.2 paths)
    "act": "lerobot.policies.act.modeling_act.ACTPolicy",
    "diffusion": "lerobot.policies.diffusion.modeling_diffusion.DiffusionPolicy",
    "pi0fast": "lerobot.policies.pi0fast.modeling_pi0fast.PI0FASTPolicy",
    "smolvla": "lerobot.policies.smolvla.modeling_smolvla.SmolVLAPolicy",
}


def load_pretrained_policy(kind, path_or_repo):
    _require_lerobot()
    import importlib

    module, cls = POLICY_CLASSES[kind].rsplit(".", 1)
    try:
        policy_cls = getattr(importlib.import_module(module), cls)
    except ImportError:
        # legacy pre-0.2 layout
        legacy = module.replace("lerobot.", "lerobot.common.", 1)
        policy_cls = getattr(importlib.import_module(legacy), cls)
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
