"""Benchmark: batched contact-sim rollout throughput on the attached device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: scenario-steps/s of the flagship contact scene (3-sphere stack +
plane, QP-as-LCP impact resolution every step) with B scenarios batched via
vmap. The operational north star (BASELINE.md) is 10k+ contact-MPC solves/s;
we report contact-dynamics steps/s (each step = full collision + impact LCP
solve pipeline) against that 10k/s target.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_scene
    from moby_tpu.sim import stepper

    scene, st = _build_scene()

    B = int(__import__("os").environ.get("MOBY_BENCH_B", "512"))
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), st
    )
    # perturb initial heights so scenarios differ (no trivial dedup)
    key = jax.random.PRNGKey(0)
    dz = jax.random.uniform(key, (B, scene.nb), dtype=batched.pos.dtype) * 0.01
    batched = batched.replace(pos=batched.pos.at[:, :, 2].add(dz))

    @jax.jit
    def rollout_chunk(states):
        def f(s, _):
            return jax.vmap(lambda x: stepper.step(scene, x, 0.001))(s), None

        out, _ = jax.lax.scan(f, states, None, length=10)
        return out

    # warmup/compile
    out = rollout_chunk(batched)
    jax.block_until_ready(out)

    t0 = time.time()
    n_chunks = 5
    for _ in range(n_chunks):
        out = rollout_chunk(out)
    jax.block_until_ready(out)
    dt = time.time() - t0

    total_steps = B * 10 * n_chunks
    steps_per_s = total_steps / dt
    print(
        json.dumps(
            {
                "metric": "contact_sim_scenario_steps_per_s",
                "value": round(steps_per_s, 1),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_s / 10000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
