import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.ops import forward as fwd
from gym_so100_tpu.ops import smooth
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

dv = jax.vmap(lambda s1: smooth.forward_smooth(m, s1))(s)
con_b = narrowphase.collide_batched(m, dv)
con_v = jax.vmap(lambda d1: narrowphase.collide(m, d1))(dv)

pb = np.asarray(con_b.pos)
pv = np.asarray(con_v.pos)
db = np.asarray(con_b.dist)
dvst = np.asarray(con_v.dist)
g1b, g2b = np.asarray(con_b.geom1), np.asarray(con_b.geom2)
g1v, g2v = np.asarray(con_v.geom1), np.asarray(con_v.geom2)
act = np.asarray(con_b.active)

env = 0
diff = np.abs(pb[env] - pv[env]).max(axis=1)
for k in range(pb.shape[1]):
    if diff[k] > 1e-12:
        print(f"slot {k}: act={act[env,k]} "
              f"b(g{g1b[env,k]},g{g2b[env,k]} d={db[env,k]:+.6e} "
              f"p={pb[env,k]}) v(g{g1v[env,k]},g{g2v[env,k]} "
              f"d={dvst[env,k]:+.6e} p={pv[env,k]})")
# are the ACTIVE (dist,pos) multisets equal?
for e in range(B):
    tb = sorted(
        (round(db[e, k], 12), *np.round(pb[e, k], 9), g1b[e, k], g2b[e, k])
        for k in range(pb.shape[1]) if act[e, k]
    )
    tv = sorted(
        (round(dvst[e, k], 12), *np.round(pv[e, k], 9), g1v[e, k], g2v[e, k])
        for k in range(pv.shape[1]) if np.asarray(con_v.active)[e, k]
    )
    same = tb == tv
    print(f"env {e}: active multiset equal = {same}")
    if not same:
        for a, b in zip(tb, tv):
            if a != b:
                print("  b:", a)
                print("  v:", b)
