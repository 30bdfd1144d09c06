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


HER_ART = os.path.join(os.path.dirname(ART), "her_nearcube_curve.jsonl")


def test_her_nearcube_success_present_and_rising():
    """Committed on-chip HER curve (see artifacts/README.md): success on
    near-cube curriculum goals is sustained above zero in most windows,
    and the last-quarter mean success_rate is at least the first
    quarter's (measured ~1.45x; random baseline 2.7e-4/step)."""
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
    assert (sr > 0).mean() > 0.5, (sr > 0).mean()
    q = len(sr) // 4
    assert sr[-q:].mean() >= sr[:q].mean(), (sr[:q].mean(), sr[-q:].mean())
