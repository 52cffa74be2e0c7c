"""Dev: scope-level HLO attribution of the ur10 contact-MPC sweep."""
import os
import sys
import glob
import json
import collections

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_moby")
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from bench_ur10_modes import build
from moby_tpu.mpc import contact_mpc


def main():
    B = int(os.environ.get("MOBY_BENCH_UR10_B", "256"))
    prob, batched, cost, cost_final, us0 = build(B)

    @jax.jit
    def sweep(states):
        return contact_mpc.solve_batch(
            prob, states, cost, cost_final, us0=us0, n_iters=4,
            record_replay=True).cost

    out = sweep(batched)
    jax.block_until_ready(out)
    logdir = "/tmp/ur10_trace"
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
    cat = collections.Counter()
    for r in rows:
        t = float(v(r, 9) or 0)
        fw = v(r, 5) or "?"
        if "jvp" in fw:
            cat["linearize (transpose/jvp)"] += t
        elif "/while/body/while/body/" in fw:
            cat["inner-loop (LCP/rollout whiles)"] += t
        elif "bij,b" in fw or "bji,b" in fw or "bi,bi" in fw:
            cat["riccati einsums"] += t
        else:
            cat["other"] += t
    for k, t in cat.most_common():
        print(f"  {t/1e3:8.2f} ms {100*t/tot:5.1f}%  {k}")
    rows.sort(key=lambda r: -float(v(r, 9) or 0))
    for r in rows[:20]:
        t = float(v(r, 9) or 0)
        print(f"{t/1e3:8.3f} ms | fw={str(v(r,5))[:110]} | "
              f"hlo={str(v(r,2))[:40]}")


if __name__ == "__main__":
    main()
