"""Learning actually happens: assertions over the committed SAC curve.

The reference package exists to make RL training work end-to-end
(train_sac.py); smoke tests only prove plumbing.  artifacts/
sac_touchcube_curve.jsonl is a committed on-chip training log
(scripts/train_sac.py --task so100_touch_cube --num-envs 128 --utd 8
--total-steps 1500000, seed 0; see artifacts/README.md) — these tests pin
that the reward actually rises through training, deterministic because the
artifact is static.
"""

import json
import os

import numpy as np

ART = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "sac_touchcube_curve.jsonl",
)


def _curve():
    rows = []
    with open(ART) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            if "env_steps" in row and "mean_reward" in row:
                rows.append((row["env_steps"], row["mean_reward"]))
    return rows


def test_sac_touchcube_reward_rises():
    rows = _curve()
    assert len(rows) >= 20, "curve artifact too short"
    rews = np.asarray([r for _, r in rows])
    n = len(rews)
    early = rews[: max(2, n // 5)].mean()
    late = rews[-max(2, n // 5):].mean()
    # TouchCube shaping floor is -0.2/step (single_arm.py:205-215); random
    # policies hover near 0.0 mean; the trained policy's late window must
    # clearly exceed the early window and sit well above the floor
    assert late > early + 0.15, (early, late)
    assert late > 0.15, late


def test_sac_touchcube_reached_scale():
    rows = _curve()
    assert rows[-1][0] >= 1_000_000, rows[-1]


def test_sac_pixels_reward_rises():
    """Committed on-chip PIXEL-observation SAC curve (the reference's
    default obs family trained through the on-device rasterizer at 64x48,
    artifacts/README.md): late-window mean reward must clearly exceed the
    early window and the random floor (measured -0.02 -> ~0.12 over 1M
    env steps)."""
    path = os.path.join(os.path.dirname(ART), "sac_pixels_curve.jsonl")
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                row = json.loads(line)
                if "mean_reward" in row:
                    rows.append(row["mean_reward"])
    rews = np.asarray(rows)
    n = len(rews)
    assert n >= 20
    early = rews[: max(2, n // 5)].mean()
    late = rews[-max(2, n // 5):].mean()
    assert late > early + 0.08, (early, late)
    assert late > 0.08, late


HER_ART = os.path.join(os.path.dirname(ART), "her_nearcube_curve.jsonl")


def test_her_nearcube_success_rising():
    """Committed 12M-step on-chip HER curve (see artifacts/README.md),
    trained with goal_min_dist=0.02 so NO success is a zero-skill freebie
    (every goal requires transporting the cube).  The per-step success
    rate must clearly rise: last-quarter mean >= 1.5x the first quarter
    and >= 3e-4 absolute, twice the ~1.5e-4 random floor (measured:
    1.75x / 3.7e-4, with the final windows reaching ~1.1e-3)."""
    rows = []
    with open(HER_ART) as f:
        for line in f:
            line = line.strip()
            if line:
                row = json.loads(line)
                if "success_rate" in row:
                    rows.append(row["success_rate"])
    sr = np.asarray(rows)
    assert len(sr) >= 100
    q = len(sr) // 4
    first, last = sr[:q].mean(), sr[-q:].mean()
    assert last >= 1.5 * max(first, 1e-5), (first, last)
    assert last >= 3e-4, last


def test_her_eval_policy_beats_random():
    """Committed deterministic-policy evaluation (artifacts/her_eval.json,
    devtools/probe_her_eval_r5.py): under the identical transport-required
    goal distribution, the trained policy's episode success rate must beat
    the random-action control by >= 1.5x with a meaningful sample
    (measured 2.2x at 12M steps: 7.7% vs 3.5% over ~1000 episodes each)."""
    with open(os.path.join(os.path.dirname(ART), "her_eval.json")) as f:
        ev = json.load(f)
    final = ev["at_12M_steps"]
    assert final["policy_episodes"] >= 500
    assert final["random_episodes"] >= 500
    assert final["policy_ep_success_rate"] >= 1.5 * final[
        "random_ep_success_rate"
    ], final
    assert final["policy_ep_success_rate"] >= 0.05, final
