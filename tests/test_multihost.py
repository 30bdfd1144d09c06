"""Multi-HOST distributed path: 2 jax.distributed processes, one global mesh.

Exercises parallel/dist.py:19-48 for real (init_distributed has a coordinator
handshake that single-process tests never reach): two OS processes, each with
4 virtual CPU devices, form one 8-device "env" mesh; each runs a sharded
batched physics step and a sharded SAC update (gradient psum across the
process boundary via gloo CPU collectives).  The reference has no multi-node
story at all (SURVEY §2.4) — this is the TPU build's DCN analog, testable
without hardware.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]; tmp = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, %(repo)r)
    import jax
    import jax.numpy as jnp
    # jax may be pre-imported with the axon TPU platform at interpreter
    # startup (see tests/conftest.py) — the env var above is then too late;
    # force the CPU backend through the live config instead.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from gym_so100_tpu.parallel import dist

    ok = dist.init_distributed(
        coordinator="127.0.0.1:" + port, num_processes=2, process_id=pid
    )
    assert ok, "init_distributed must run the jax.distributed path"
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8, jax.devices()
    mesh = dist.env_mesh()

    # --- sharded batched physics step on a tiny two-box scene -------------
    from gym_so100_tpu.models.builder import build_model
    from gym_so100_tpu.ops import forward as fwd

    xml = os.path.join(tmp, "twobox.xml")
    if pid == 0:
        open(xml, "w").write('''%(twobox)s''')
    import time
    while not os.path.exists(xml):
        time.sleep(0.05)
    m, _ = build_model(xml, max_contacts=8)
    m = m.astype(jnp.float32)
    B = 16
    s = fwd.make_state(m, qpos=[0, 0, 0.0199, 1, 0, 0, 0], dtype=jnp.float32)
    sb = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), s
    )
    sb = dist.shard_env(sb, mesh)  # env axis split across BOTH processes
    out = jax.jit(lambda s: fwd.n_steps_batched(m, s, 2)[0])(sb)
    qz = float(jnp.mean(out.qpos[:, 2]))  # cross-process fetch
    assert 0.015 < qz < 0.025, qz  # cube still resting on the table

    # --- sharded SAC update: replicated params, sharded batch, psum grads -
    from gym_so100_tpu.agents.sac import SAC, SACConfig

    sac = SAC(SACConfig(obs_dim=15, buffer_size=32, batch_size=16))
    st = sac.init(jax.random.PRNGKey(0))
    st = dist.replicate(st, mesh)
    k = jax.random.PRNGKey(1)
    batch = {
        "obs": jax.random.normal(k, (16, 15), jnp.float32),
        "act": jnp.tanh(jax.random.normal(k, (16, 6), jnp.float32)),
        "rew": jnp.zeros((16,), jnp.float32),
        "next_obs": jax.random.normal(k, (16, 15), jnp.float32),
        "done": jnp.zeros((16,), bool),
    }
    batch = dist.shard_env(batch, mesh)
    st2, metrics = jax.jit(sac.update)(st, batch)
    loss = float(metrics["critic_loss"])
    assert loss == loss and abs(loss) < 1e6  # finite
    print("MULTIHOST_OK", pid, round(loss, 6), flush=True)
    """
)

TWOBOX = """
<mujoco>
  <option cone="elliptic" impratio="10"/>
  <worldbody>
    <body name="tbl"><geom name="g1" type="box" size="0.6 0.4 0.015" pos="0 0 -0.015"
        friction="1 0.005 0.0001" solimp="0.9 0.95 0.001" solref="0.02 1"/></body>
    <body name="cube" pos="0 0 0.1"><freejoint name="cubejoint"/>
      <inertial pos="0 0 0" mass="0.05" diaginertia="1.3e-5 1.3e-5 1.3e-5"/>
      <geom name="g2" type="box" size="0.02 0.02 0.02" condim="4"
        solimp="2 1 0.01" solref="0.01 1" friction="1 0.005 0.0001"/></body>
  </worldbody>
</mujoco>
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": REPO, "twobox": TWOBOX})
    port = str(_free_port())
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), port, str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"MULTIHOST_OK {pid}" in out, out[-2000:]
    # both processes computed the SAME global loss (grads were psummed)
    l0 = outs[0].split("MULTIHOST_OK 0")[1].split()[0]
    l1 = outs[1].split("MULTIHOST_OK 1")[1].split()[0]
    assert l0 == l1, (l0, l1)
