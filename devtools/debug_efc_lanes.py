import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from gym_so100_tpu.models.builder import build_model
from gym_so100_tpu.ops import constraint as cm
from gym_so100_tpu.ops import constraint_lanes as cl
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

d = jax.vmap(lambda s1: smooth.forward_smooth(m, s1))(s)
con = narrowphase.collide_batched(m, d)
d = d.replace(contact=con)
ref = jax.vmap(lambda d1, s1, c1: cm.make_efc(m, d1, s1, c1))(d, s, con)
got = cl.make_efc_batched(m, d, s, con)

print("active contacts:", int(np.asarray(ref.con_active).sum()))
start = ref.neq + ref.nf + ref.nl
for name in ("J", "aref", "D", "R", "pos", "floss",
             "con_mu", "con_uscale", "con_Dn"):
    a = np.asarray(getattr(ref, name))
    b = np.asarray(getattr(got, name))
    dd = np.abs(a - b)
    print(f"{name:12s} maxdiff {dd.max():.3e}", end="")
    if name in ("J", "aref", "D", "R", "pos") and dd.ndim >= 2:
        sc = dd[:, :start].max() if start else 0.0
        cc = dd[:, start:].max()
        print(f"  scalar-rows {sc:.3e}  contact-rows {cc:.3e}", end="")
        if dd.max() > 1e-12:
            idx = np.unravel_index(np.argmax(dd), dd.shape)
            print(f"  argmax {idx} ref={a[idx]:.6e} got={b[idx]:.6e}", end="")
    print()
for name in ("is_floss", "is_limit", "con_active"):
    a = np.asarray(getattr(ref, name))
    b = np.asarray(getattr(got, name))
    print(f"{name:12s} equal={np.array_equal(a, b)}")
