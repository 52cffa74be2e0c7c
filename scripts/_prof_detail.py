"""Dev: detailed HLO attribution of the ball-push MPC sweep (scope-level)."""
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

from profile_mpc import ball_push_scene
from moby_tpu.mpc import contact_mpc


def main():
    scene, st = ball_push_scene()
    H, B = 50, int(os.environ.get("MOBY_BENCH_MPC_B", "1024"))
    prob = contact_mpc.MPCProblem(scene=scene, template=st, dt=0.02, horizon=H)
    target = jnp.array([0.5, 0.0], st.pos.dtype)

    def cost(x, u):
        return 1e-4 * jnp.sum(u[:6] ** 2)

    def cost_final(x):
        return 50.0 * jnp.sum((x[0:2] - target) ** 2)

    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), st)

    @jax.jit
    def sweep(states):
        return contact_mpc.solve_batch(
            prob, states, cost, cost_final, n_iters=4,
            record_replay=True).cost

    out = sweep(batched)
    jax.block_until_ready(out)
    logdir = "/tmp/mpc_trace2"
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
    print(f"total {tot/1e3:.1f} ms over {len(rows)} rows")
    # dump the 25 most expensive rows in full to see scope structure
    rows.sort(key=lambda r: -float(v(r, 9) or 0))
    for r in rows[:25]:
        stime = float(v(r, 9) or 0)
        print(f"{stime/1e3:8.3f} ms | cat={v(r,4)} | fw={v(r,5)} | hlo={str(v(r,2))[:80]}")
    # scope attribution: first two components of the framework path
    sc = collections.Counter()
    for r in rows:
        stime = float(v(r, 9) or 0)
        parts = (v(r, 5) or "?").split("/")
        sc["/".join(parts[:3])] += stime
    print("\nby scope (first 3 components):")
    for k, t in sc.most_common(30):
        print(f"  {t/1e3:8.2f} ms  {100*t/tot:5.1f}%  {k}")


if __name__ == "__main__":
    main()
