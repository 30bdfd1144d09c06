"""Dev probe: GJK/EPA convex-convex vs known geometry + MuJoCo oracle."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
from gym_so100_tpu.ops.collision.gjk import convex_convex

I3 = jnp.eye(3)
def box(s): 
    return jnp.asarray([[sx*s[0], sy*s[1], sz*s[2]] for sx in (-1,1) for sy in (-1,1) for sz in (-1,1)])

# 1. two unit boxes, penetrating by 0.2 along x
v = box([0.5,0.5,0.5])
out = convex_convex(jnp.zeros(3), I3, v, jnp.asarray([0.8,0.0,0.0]), I3, v)
print("boxes pen x: active", bool(out["active"]), "depth", float(out["depth"]), "(expect -0.2) normal", np.asarray(out["normal"]), "(expect +x)")

# 2. separated
out = convex_convex(jnp.zeros(3), I3, v, jnp.asarray([1.5,0.0,0.0]), I3, v)
print("separated: active", bool(out["active"]), "depth", float(out["depth"]), "(expect +0.5)")

# 3. tetra vs box penetrating in z
tet = jnp.asarray([[0.,0,0],[0.2,0,0],[0,0.2,0],[0,0,0.2]])
out = convex_convex(jnp.asarray([0.0,0,0.45]), I3, tet, jnp.zeros(3), I3, v)
print("tetra on box: active", bool(out["active"]), "depth", float(out["depth"]), "(expect -0.05) normal", np.asarray(out["normal"]), "(expect -z)")

# 4. deep central overlap
out = convex_convex(jnp.zeros(3), I3, v, jnp.asarray([0.1,0.05,0.0]), I3, v)
print("deep: active", bool(out["active"]), "depth", float(out["depth"]), "(expect -0.9) normal", np.asarray(out["normal"]))

# 5. rotated box corner into face
from scipy.spatial.transform import Rotation as R
Rz = jnp.asarray(R.from_euler('xy',[35,20],degrees=True).as_matrix())
v2 = box([0.1,0.1,0.1])
out = convex_convex(jnp.asarray([0.0,0,0.60]), Rz, v2, jnp.zeros(3), I3, v)
print("corner: active", bool(out["active"]), "depth", float(out["depth"]), "normal", np.asarray(out["normal"]))
# exact: corner lowest point
low = float(jnp.min((Rz @ v2.T).T[:,2] + 0.60)); print("  exact depth:", low - 0.5)
