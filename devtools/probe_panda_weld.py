"""Oracle check for tests/test_panda.py::test_panda_mocap_weld_ik — run the
SAME rollout (home keyframe, mocap pinned at the initial EE site, 250 steps)
in dm_control MuJoCo on the same XML and report EE drift, so the JAX drift
number has a reference point.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from dm_control import mujoco as dmj

XML = "/root/repo/gym_so100_tpu/assets/pandas_transfer_cube_ee.xml"


def main():
    phys = dmj.Physics.from_xml_path(XML)
    model, data = phys.model, phys.data
    # home keyframe
    kid = 0
    print("nkey:", model.nkey)
    phys.reset(0)
    ee = model.name2id("ee_site", "site")
    phys.forward()
    p0 = np.array(data.site_xpos[ee])
    data.mocap_pos[0] = p0
    print("ee0", p0, "qpos0", np.array(data.qpos[:8]))
    for i in range(250):
        phys.step()
        if i % 50 == 0:
            drift = np.linalg.norm(np.array(data.site_xpos[ee]) - p0)
            print(f"step {i:4d} drift {drift:.4f}")
    drift = np.linalg.norm(np.array(data.site_xpos[ee]) - p0)
    print("final drift", drift)


if __name__ == "__main__":
    main()
