"""On-device correctness smoke: run the friction+restitution sphere stack
on the REAL TPU backend (f32, Pallas/GJ solver route live, interpret=False)
and compare the trajectory against the CPU f64 oracle.

Closes the loop that bench.py's throughput numbers describe a *correct*
simulation: the regression suite pins CPU f64 (tests/conftest.py), so
nothing else asserts trajectory sanity on the actual TPU backend.

Run from the repo root on a machine with the TPU attached:

    python scripts/tpu_smoke.py

Pass criteria (asserted): over 200 steps of dt=1e-3 (0.2 s, through the
first restitution impacts of the mu=0.5 / eps=0.3 stack):
  * max trajectory drift (all coordinates) < 5e-2 m — f32 contact solves and
    CA sub-stepping legitimately branch differently, so in-plane slide
    positions diverge linearly after impacts;
  * final HEIGHT drift (the physically pinned coordinate) < 5e-3 m;
  * identical final stack order.
Measured on 2026-08-21 (v5e): max trajectory drift 1.14e-2 m (7.7e-4 by
step 10, growing ~linearly), final height drift 6.9e-4 m, order match.
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


def main():
    import jax

    n_steps, dt = 200, 1e-3

    dev = jax.devices()[0]
    print(f"device: {dev} (platform {dev.platform})")
    if dev.platform == "cpu":
        print("WARNING: no accelerator attached; smoke degenerates to "
              "f32-vs-f64 on CPU")

    # f32 on the attached accelerator
    scene32, st32 = build(np.float32)
    traj32 = rollout(scene32, st32, n_steps, dt)

    # f64 oracle on CPU
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        import jax.numpy as jnp  # noqa: F401

        jax.config.update("jax_enable_x64", True)
        scene64, st64 = build(np.float64)
        traj64 = rollout(scene64, st64, n_steps, dt)

    drift = np.abs(traj32 - traj64)
    per_step_max = drift.reshape(n_steps, -1).max(axis=1)
    z_drift = np.abs(traj32[-1][:, 2] - traj64[-1][:, 2]).max()
    print(f"max drift over {n_steps} steps (dt={dt}): {drift.max():.3e} m")
    print(f"final-step max drift: {per_step_max[-1]:.3e} m")
    print(f"final height drift: {z_drift:.3e} m")
    order32 = np.argsort(traj32[-1][:, 2])
    order64 = np.argsort(traj64[-1][:, 2])
    print(f"final stack order match: {bool((order32 == order64).all())}")

    assert drift.max() < 5e-2, f"TPU f32 drift {drift.max():.3e} m"
    assert z_drift < 5e-3, f"TPU f32 height drift {z_drift:.3e} m"
    assert (order32 == order64).all()
    print("SMOKE PASS")


if __name__ == "__main__":
    main()
