"""Execute the LeRobot interop function bodies against a fake `lerobot`.

The real `lerobot` package is not installed in this image, so these tests
install a minimal fake module tree (dataset + policy surface) and drive
`demos_to_lerobot_dataset` and `rollout_policy` end-to-end: frame assembly,
unit conversions, episode boundaries, batch dict construction, and the
action unit round-trip — the behaviors the reference scripts exercise
(upload_lerobot_demos.py:104-222, evaluate_lerobot_policy.py:77-153).
"""

import pickle
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow


class _FakeImageWriter:
    def __init__(self):
        self.waits = 0

    def wait_until_done(self):
        self.waits += 1


class FakeLeRobotDataset:
    created = None

    def __init__(self, repo_id, fps, features, use_videos):
        self.repo_id = repo_id
        self.fps = fps
        self.features = features
        self.use_videos = use_videos
        self.frames = []
        self.episode_lengths = []
        self._ep_frames = 0
        self.pushed = False
        self.image_writer = _FakeImageWriter()
        self.buffer_clears = 0

    @classmethod
    def create(cls, repo_id, fps, features, use_videos):
        ds = cls(repo_id, fps, features, use_videos)
        cls.created = ds
        return ds

    def add_frame(self, frame, task):
        self.frames.append((dict(frame), task))
        self._ep_frames += 1

    def save_episode(self):
        self.episode_lengths.append(self._ep_frames)
        self._ep_frames = 0

    def clear_episode_buffer(self):
        self.buffer_clears += 1

    def push_to_hub(self):
        self.pushed = True


@pytest.fixture(params=["flat", "legacy"])
def fake_lerobot(request, monkeypatch):
    """Mount the fake under BOTH lerobot namespace layouts.

    "flat" is what the reference imports (lerobot >= 0.2,
    upload_lerobot_demos.py:8: lerobot.datasets.lerobot_dataset); "legacy"
    is the pre-0.2 lerobot.common. prefix that the interop falls back to.
    """
    root = types.ModuleType("lerobot")
    if request.param == "flat":
        datasets = types.ModuleType("lerobot.datasets")
        ldm = types.ModuleType("lerobot.datasets.lerobot_dataset")
        names = (
            ("lerobot", root),
            ("lerobot.datasets", datasets),
            ("lerobot.datasets.lerobot_dataset", ldm),
        )
        root.datasets = datasets
        datasets.lerobot_dataset = ldm
    else:
        common = types.ModuleType("lerobot.common")
        datasets = types.ModuleType("lerobot.common.datasets")
        ldm = types.ModuleType("lerobot.common.datasets.lerobot_dataset")
        names = (
            ("lerobot", root),
            ("lerobot.common", common),
            ("lerobot.common.datasets", datasets),
            ("lerobot.common.datasets.lerobot_dataset", ldm),
        )
        root.common = common
        common.datasets = datasets
        datasets.lerobot_dataset = ldm
    ldm.LeRobotDataset = FakeLeRobotDataset
    for name, mod in names:
        monkeypatch.setitem(sys.modules, name, mod)
    # make sure the OTHER layout isn't importable from a previous test
    other = (
        "lerobot.common.datasets.lerobot_dataset"
        if request.param == "flat" else "lerobot.datasets.lerobot_dataset"
    )
    monkeypatch.delitem(sys.modules, other, raising=False)
    FakeLeRobotDataset.created = None
    return root


def test_demos_to_lerobot_dataset(fake_lerobot, tmp_path):
    """Frame assembly: unit conversion, pixels transpose, success flag,
    episode boundaries."""
    from gym_so100_tpu.envs import constants as C
    from gym_so100_tpu.interop.lerobot import demos_to_lerobot_dataset

    rng = np.random.RandomState(0)
    H, W = 4, 5

    def episode(T, last_reward):
        rews = np.full(T, 1.0, np.float32)
        rews[-1] = last_reward
        return {
            "observations": [
                {
                    "agent_pos": rng.uniform(-1, 1, 6).astype(np.float32),
                    "pixels": rng.randint(0, 255, (H, W, 3), np.uint8),
                }
                for _ in range(T)
            ],
            "actions": rng.uniform(-1, 1, (T, 6)).astype(np.float32),
            "rewards": rews,
            "infos": [{} for _ in range(T)],
        }

    demo = [episode(3, 4.0), episode(2, 1.0)]
    path = tmp_path / "demo.pkl"
    with open(path, "wb") as f:
        pickle.dump(demo, f)

    ds = demos_to_lerobot_dataset([str(path)], "user/test", fps=50, push=True)
    assert ds is FakeLeRobotDataset.created
    assert ds.pushed
    assert ds.episode_lengths == [3, 2]            # episode boundaries
    assert len(ds.frames) == 5
    # reference per-episode flow (upload_lerobot_demos.py:209-213): writer
    # drained and buffer cleared once per saved episode
    assert ds.image_writer.waits == 2
    assert ds.buffer_clears == 2

    frame0, task0 = ds.frames[0]
    assert task0 == "Put the red cube into the bin"
    # state: gym agent_pos -> LeRobot +-100 units
    want_state = np.asarray(
        C.normalize_gym_so100_to_lerobot(demo[0]["observations"][0]["agent_pos"])
    )
    np.testing.assert_allclose(
        frame0["observation.state"], want_state, rtol=1e-6
    )
    # action: [-1,1] -> radians -> LeRobot units (the round trip the
    # reference uploader applies, upload_lerobot_demos.py:150-170)
    want_act = np.asarray(
        C.normalize_gym_so100_to_lerobot(
            C.unnormalize_so100(demo[0]["actions"][0])
        )
    )
    np.testing.assert_allclose(frame0["action"], want_act, rtol=1e-6)
    # pixels HWC -> CHW
    assert frame0["observation.images.top"].shape == (3, H, W)
    np.testing.assert_array_equal(
        frame0["observation.images.top"][0],
        demo[0]["observations"][0]["pixels"][..., 0],
    )
    # success flag from reward >= 4 on the terminal frame of episode 1 only
    assert ds.frames[2][0]["next.success"][0]
    assert not ds.frames[4][0]["next.success"][0]


class RecordingPolicy:
    """Fake LeRobot policy: records batches, returns a fixed action in
    LeRobot units."""

    def __init__(self, action_lerobot):
        self.batches = []
        self._act = action_lerobot

    def select_action(self, batch):
        import torch

        self.batches.append(batch)
        return torch.as_tensor(self._act, dtype=torch.float32)[None]


def test_rollout_policy(fake_lerobot):
    """rollout_policy drives a real env: batch dict construction, unit
    round-trip on state and action, termination handling."""
    import gymnasium as gym

    import gym_so100_tpu  # noqa: F401 (registration)
    from gym_so100_tpu.envs import constants as C
    from gym_so100_tpu.interop.lerobot import rollout_policy

    env = gym.make(
        "gym_so100_tpu/SO100TouchCube-v0",
        obs_type="so100_state",
        max_episode_steps=3,
    )
    # policy commands mid-range joints in LeRobot units (zeros)
    policy = RecordingPolicy(np.zeros(6, np.float32))
    out = rollout_policy(policy, env, episodes=2, lerobot_units=True)
    env.close()

    assert len(out["returns"]) == 2
    assert len(out["successes"]) == 2
    assert len(policy.batches) == 6               # 2 episodes x 3 steps
    b0 = policy.batches[0]
    assert set(b0) == {"observation.state"}
    assert tuple(b0["observation.state"].shape) == (1, 6)
    # the state fed to the policy is the obs tail (qpos) in +-100 units
    env2 = gym.make(
        "gym_so100_tpu/SO100TouchCube-v0", obs_type="so100_state",
        max_episode_steps=3,
    )
    obs0, _ = env2.reset(seed=0)
    env2.close()
    want = np.asarray(C.normalize_gym_so100_to_lerobot(obs0[-6:]))
    np.testing.assert_allclose(
        np.asarray(b0["observation.state"][0]), want, rtol=1e-5, atol=1e-5
    )


def _real_lerobot_available():
    import importlib.util

    return importlib.util.find_spec("lerobot") is not None


@pytest.mark.skipif(
    not _real_lerobot_available(),
    reason="real lerobot not installed in this image (no network egress); "
    "the API pin is recorded in interop/lerobot.py and exercised by the "
    "fake-module harness above",
)
def test_real_lerobot_dataset_roundtrip(tmp_path):
    """When the real package IS present, run the converter against it."""
    import pickle

    from gym_so100_tpu.interop.lerobot import demos_to_lerobot_dataset

    rng = np.random.RandomState(0)
    T = 2
    demo = [{
        "observations": [
            {"agent_pos": rng.uniform(-1, 1, 6).astype(np.float32)}
            for _ in range(T)
        ],
        "actions": rng.uniform(-1, 1, (T, 6)).astype(np.float32),
        "rewards": np.asarray([1.0, 4.0], np.float32),
        "infos": [{} for _ in range(T)],
    }]
    path = tmp_path / "demo.pkl"
    with open(path, "wb") as f:
        pickle.dump(demo, f)
    ds = demos_to_lerobot_dataset([str(path)], "test/roundtrip", fps=50)
    assert ds.meta.total_frames == T or len(ds) == T
