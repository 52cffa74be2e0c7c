"""On-device correctness smoke: run contact scenes on the REAL TPU backend
(f32, Pallas/GJ solver route live, interpret=False) and compare trajectories
against the CPU f64 oracle.

Closes the loop that bench.py's throughput numbers describe a *correct*
simulation: the regression suite pins CPU f64 (tests/conftest.py), so
nothing else asserts trajectory sanity on the actual TPU backend.

Run from the repo root on a machine with the TPU attached:

    python scripts/tpu_smoke.py [stack] [table] [ur10]   (default: all)

Cases + pass criteria (asserted):

1. **stack** — friction+restitution sphere stack, 200 steps of dt=1e-3
   (through the first restitution impacts of the mu=0.5 / eps=0.3 stack):
   * max trajectory drift < 5e-2 m — f32 contact solves and CA sub-stepping
     legitimately branch differently, so in-plane slide positions diverge
     linearly after impacts;
   * final HEIGHT drift (the physically pinned coordinate) < 5e-3 m;
   * identical final stack order.
   Measured 2026-08-21 (v5e): max drift 1.14e-2 m (7.7e-4 by step 10,
   growing ~linearly), final height drift 6.9e-4 m, order match.
2. **table** — fixed-articulated-table (scenes/fixed-articulated-table.xml):
   the no-slip articulated path (fused-GJ CRB inverse route on f32), 1.0 s
   at dt=1e-3. Asserts max |q_art| drift < 2e-2 rad over the horizon and
   < 5e-3 at 0.2 s.
3. **ur10** — the SDF arm sagging under gravity against its joint limits
   (the articulated+limit path the ur10 MPC bench rides), 1.0 s at dt=2e-3.
   Asserts max |q_art| drift < 5e-2 rad and no limit violation beyond 1e-2.

Measured drifts from the most recent on-device run are recorded in
benchmarks/README.md (on-device correctness section).
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_moby")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build(dtype):
    import jax.numpy as jnp
    from moby_tpu.core import scene as sc
    from moby_tpu.math import quaternion as quat

    b = sc.SceneBuilder(dtype=dtype)
    b.set_gravity([0, 0, -9.81])
    inertia = sc.sphere_inertia(1.0, 1.0)
    b.add_body("sph1", mass=1.0, inertia=inertia, pos=np.array([0, 0, 1.0]))
    b.add_body("sph2", mass=1.0, inertia=inertia,
               pos=np.array([0.05, 0, 3.0]))
    b.add_body("sph3", mass=1.0, inertia=inertia,
               pos=np.array([0, 0.05, 5.0]))
    b.add_body("ground", enabled=False)
    for n in ("sph1", "sph2", "sph3"):
        b.add_geom(n, sc.SPHERE, [1.0])
    pq = np.asarray(quat.from_rpy(jnp.array([1.5707963267949, 0, 0])))
    b.add_geom("ground", sc.PLANE, [0.0], quat=pq)
    cp = sc.ContactParams(epsilon=0.3, mu_coulomb=0.5, nk=4)
    b.set_contact_params("ground", "sph1", cp)
    b.set_contact_params("sph1", "sph2", cp)
    b.set_contact_params("sph2", "sph3", cp)
    return b.compile()


def rollout(scene, st, n_steps, dt):
    import jax
    from moby_tpu.sim import stepper

    step_j = jax.jit(lambda s: stepper.step(scene, s, dt))
    traj = []
    for _ in range(n_steps):
        st = step_j(st)
        traj.append(np.asarray(st.pos, np.float64))
    return np.stack(traj)


def rollout_q(scene, st, n_steps, dt):
    """Articulated rollout: per-step q_art trajectory."""
    import jax
    from moby_tpu.sim import stepper

    step_j = jax.jit(lambda s: stepper.step(scene, s, dt))
    traj = []
    for _ in range(n_steps):
        st = step_j(st)
        traj.append(np.asarray(st.q_art, np.float64))
    return np.stack(traj)


def _with_cpu_f64(fn):
    import jax

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        jax.config.update("jax_enable_x64", True)
        return fn()


def case_stack():
    n_steps, dt = 200, 1e-3
    scene32, st32 = build(np.float32)
    traj32 = rollout(scene32, st32, n_steps, dt)

    def oracle():
        scene64, st64 = build(np.float64)
        return rollout(scene64, st64, n_steps, dt)

    traj64 = _with_cpu_f64(oracle)
    drift = np.abs(traj32 - traj64)
    per_step_max = drift.reshape(n_steps, -1).max(axis=1)
    z_drift = np.abs(traj32[-1][:, 2] - traj64[-1][:, 2]).max()
    print(f"[stack] max drift over {n_steps} steps (dt={dt}): "
          f"{drift.max():.3e} m")
    print(f"[stack] final-step max drift: {per_step_max[-1]:.3e} m")
    print(f"[stack] final height drift: {z_drift:.3e} m")
    order32 = np.argsort(traj32[-1][:, 2])
    order64 = np.argsort(traj64[-1][:, 2])
    print(f"[stack] final stack order match: "
          f"{bool((order32 == order64).all())}")
    assert drift.max() < 5e-2, f"TPU f32 drift {drift.max():.3e} m"
    assert z_drift < 5e-3, f"TPU f32 height drift {z_drift:.3e} m"
    assert (order32 == order64).all()


def _table_scene(dtype):
    from moby_tpu.io import mobyxml

    repo = os.path.join(os.path.dirname(__file__), "..")
    scene, st, _ = mobyxml.load(
        os.path.join(repo, "scenes", "fixed-articulated-table.xml"),
        dtype=dtype,
    )
    return scene, st


def case_table():
    """No-slip articulated path (fused-GJ CRB inverse on f32): the
    fixed-articulated-table golden scene, 1 s."""
    n_steps, dt = 1000, 1e-3
    scene32, st32 = _table_scene(np.float32)
    q32 = rollout_q(scene32, st32, n_steps, dt)
    q64 = _with_cpu_f64(
        lambda: rollout_q(*_table_scene(np.float64), n_steps, dt)
    )
    drift = np.abs(q32 - q64).max(axis=1)
    print(f"[table] q drift: {drift[199]:.3e} @0.2s  "
          f"{drift[-1]:.3e} @1.0s  max {drift.max():.3e} rad")
    assert drift[199] < 5e-3, f"q drift @0.2s {drift[199]:.3e}"
    assert drift.max() < 2e-2, f"q drift {drift.max():.3e}"


def _ur10_scene(dtype):
    from moby_tpu.core import scene as sc
    from moby_tpu.io import sdfio
    import xml.etree.ElementTree as ET

    sdf_path = "/root/reference/example/ur10/ur10/ur10.sdf"
    root = ET.parse(sdf_path).getroot()
    model = root if root.tag == "model" else root.find("model")
    b = sc.SceneBuilder(dtype=dtype)
    b.set_gravity([0, 0, -9.81])
    sdfio.add_model(b, model, os.path.dirname(sdf_path))
    return b.compile()


def case_ur10():
    """Articulated + joint-limit path (what the ur10 MPC bench rides):
    gravity sag against the limits, 1 s."""
    n_steps, dt = 500, 2e-3
    scene32, st32 = _ur10_scene(np.float32)
    q32 = rollout_q(scene32, st32, n_steps, dt)
    q64 = _with_cpu_f64(
        lambda: rollout_q(*_ur10_scene(np.float64), n_steps, dt)
    )
    drift = np.abs(q32 - q64).max(axis=1)
    print(f"[ur10] q drift: {drift[249]:.3e} @0.5s  "
          f"{drift[-1]:.3e} @1.0s  max {drift.max():.3e} rad")
    lo = np.asarray(scene32.lim_value)[~np.asarray(scene32.lim_upper)]
    hi = np.asarray(scene32.lim_value)[np.asarray(scene32.lim_upper)]
    qlim = q32[-1][np.asarray(scene32.lim_q_idx)]
    viol = max(
        float((qlim[np.asarray(scene32.lim_upper)] - hi).max()),
        float((lo - qlim[~np.asarray(scene32.lim_upper)]).max()),
    )
    print(f"[ur10] worst limit violation (f32): {viol:.3e} rad")
    assert drift.max() < 5e-2, f"q drift {drift.max():.3e}"
    assert viol < 1e-2, f"limit violation {viol:.3e}"


def main():
    import jax

    dev = jax.devices()[0]
    print(f"device: {dev} (platform {dev.platform})")
    if dev.platform == "cpu":
        print("WARNING: no accelerator attached; smoke degenerates to "
              "f32-vs-f64 on CPU")

    cases = sys.argv[1:] or ["stack", "table", "ur10"]
    for c in cases:
        {"stack": case_stack, "table": case_table, "ur10": case_ur10}[c]()
    print("SMOKE PASS")


if __name__ == "__main__":
    main()
