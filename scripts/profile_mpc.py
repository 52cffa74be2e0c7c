"""Profile the contact-MPC sweep on the attached TPU and print the device
self-time breakdown by framework op (the measurement driver behind the
round-3 5x: it exposed the Riccati Cholesky/LU custom-calls at 51% and the
dstep forward scatters at 29%).

Run from the repo root: python scripts/profile_mpc.py
"""

import os
import sys
import glob
import json
import collections

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_moby")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from moby_tpu.core import scene as sc
from moby_tpu.math import quaternion as quat
from moby_tpu.mpc import contact_mpc


def ball_push_scene():
    b = sc.SceneBuilder()
    b.set_gravity([0, 0, -9.81])
    b.add_body("ball", mass=1.0, inertia=sc.sphere_inertia(1.0, 0.5),
               pos=np.array([0.0, 0.0, 0.5]))
    b.add_body("ground", enabled=False)
    b.add_geom("ball", sc.SPHERE, [0.5])
    pq = np.asarray(quat.from_rpy(jnp.array([1.5707963267949, 0, 0])))
    b.add_geom("ground", sc.PLANE, [0.0], quat=pq)
    b.set_contact_params(
        "ground", "ball",
        sc.ContactParams(epsilon=0.0, mu_coulomb=0.5, nk=4),
    )
    return b.compile()


def main():
    scene, st = ball_push_scene()
    H = 50
    B = int(os.environ.get("MOBY_BENCH_MPC_B", "256"))
    prob = contact_mpc.MPCProblem(scene=scene, template=st, dt=0.02,
                                  horizon=H)
    target = jnp.array([0.5, 0.0], st.pos.dtype)

    def cost(x, u):
        return 1e-4 * jnp.sum(u[:6] ** 2)

    def cost_final(x):
        return 50.0 * jnp.sum((x[0:2] - target) ** 2)

    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), st
    )

    @jax.jit
    def sweep(states):
        return contact_mpc.solve_batch(
            prob, states, cost, cost_final, n_iters=4
        ).cost

    out = sweep(batched)
    jax.block_until_ready(out)

    logdir = "/tmp/mpc_trace"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    out = sweep(batched)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    from xprof.convert import raw_to_tool_data as rtd

    xp = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.xplane.pb"))[-1]
    data, _ = rtd.xspace_to_tool_data([xp], "hlo_stats", {})
    d = json.loads(data if isinstance(data, str) else data.decode())
    rows = d["rows"]

    def v(r, i):
        return r["c"][i].get("v")

    tot = sum(float(v(r, 9) or 0) for r in rows)
    fw = collections.Counter()
    for r in rows:
        stime = float(v(r, 9) or 0)
        fw[(v(r, 5) or "").split("/")[-1][:60]] += stime
    print(f"one sweep (B={B}, H={H}, 4 iters): "
          f"total device self time {tot/1e3:.1f} ms")
    for k, t in fw.most_common(20):
        print(f"  {t/1e3:8.2f} ms  {100*t/tot:5.1f}%  {k}")


if __name__ == "__main__":
    main()
