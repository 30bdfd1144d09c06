import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.ops import forward as fwd
from gym_so100_tpu.ops import smooth, smooth_lanes
from gym_so100_tpu.ops.collision import narrowphase

XML = "gym_so100_tpu/assets/so100_transfer_cube.xml"
B = 4

m, _ = build_model(XML, max_contacts=24)
rng = np.random.RandomState(0)
qpos = np.tile(np.asarray(m.qpos0)[None], (B, 1))
qpos[:, :6] += rng.uniform(-0.1, 0.1, (B, 6))
qpos[:, 6:8] += rng.uniform(-0.05, 0.05, (B, 2))
s1 = fwd.make_state(m)
s = jax.tree_util.tree_map(
    lambda a: jnp.broadcast_to(a[None], (B, *a.shape)).astype(jnp.float64), s1
)
s = s.replace(qpos=jnp.asarray(qpos),
              ctrl=jnp.asarray(rng.uniform(-0.5, 0.5, (B, m.nu))))
s = jax.jit(lambda s: fwd.n_steps_batched(m, s, 50)[0])(s)

# stage-by-stage comparison
sl = smooth_lanes.forward_smooth_lanes(m, s)
dv = jax.vmap(lambda s1: smooth.forward_smooth(m, s1))(s)
for k in ("geom_xpos", "geom_xmat", "cdof", "qM", "qacc_smooth"):
    a = np.asarray(sl[k])
    b = np.asarray(getattr(dv, k))
    print(f"smooth {k:12s} maxdiff {np.abs(a - b).max():.3e}")
print("subtree_com0  maxdiff",
      np.abs(np.asarray(sl["subtree_com0"]) - np.asarray(dv.subtree_com[:, 0])).max())

con_b = narrowphase.collide_batched(m, dv)
con_v = jax.vmap(lambda d1: narrowphase.collide(m, d1))(dv)
for k in ("dist", "pos", "frame", "geom1", "geom2", "active"):
    a = np.asarray(getattr(con_b, k))
    b = np.asarray(getattr(con_v, k))
    if a.dtype == bool or a.dtype.kind == "i":
        print(f"collide {k:8s} equal={np.array_equal(a, b)}")
    else:
        print(f"collide {k:8s} maxdiff {np.abs(a - b).max():.3e}")

# full substep
s_l, d_l = fwd.step_batched(m, s)
s_v, d_v2 = jax.vmap(lambda s1: fwd.step(m, s1))(s)
print("qacc maxdiff", np.abs(np.asarray(d_l.qacc) - np.asarray(d_v2.qacc)).max())
print("niter lanes", np.asarray(d_l.solver_niter), "vmap", np.asarray(d_v2.solver_niter))
print("qpos maxdiff", np.abs(np.asarray(s_l.qpos) - np.asarray(s_v.qpos)).max())
per_env = np.abs(np.asarray(d_l.qacc) - np.asarray(d_v2.qacc)).max(axis=1)
print("per-env qacc diff", per_env)
