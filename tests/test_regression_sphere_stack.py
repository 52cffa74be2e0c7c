"""Trajectory regression vs the reference's golden data (regress/sphere-stack.dat).

The reference oracle: `moby-regress` emits per-step Euler coordinates
(x y z qx qy qz qw per body) and `moby-compare-trajs` checks L-inf error
against tolerance (reference programs/regress.cpp, compare-trajs.cpp).
BASELINE.md requires < 1e-4 at matched step size.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moby_tpu.core import scene as sc
from moby_tpu.sim import stepper
from moby_tpu.math import quaternion as quat

GOLDEN = "/root/reference/regress/sphere-stack.dat"


def build_sphere_stack():
    b = sc.SceneBuilder()
    b.set_gravity([0, 0, -9.81])
    r = 1.0
    inertia = sc.sphere_inertia(1.0, r)
    b.add_body("sph1", mass=1.0, inertia=inertia, pos=np.array([0, 0, 1.0]))
    b.add_body("sph2", mass=1.0, inertia=inertia, pos=np.array([0, 0, 3.0]))
    b.add_body("sph3", mass=1.0, inertia=inertia, pos=np.array([0, 0, 5.0]))
    b.add_body("ground", enabled=False)
    b.add_geom("sph1", sc.SPHERE, [r])
    b.add_geom("sph2", sc.SPHERE, [r])
    b.add_geom("sph3", sc.SPHERE, [r])
    pq = np.asarray(quat.from_rpy(jnp.array([1.5707963267949, 0, 0])))
    b.add_geom("ground", sc.PLANE, [0.0], quat=pq)
    cp = sc.ContactParams(epsilon=0.0, mu_coulomb=0.0, mu_viscous=0.0, nk=16)
    b.set_contact_params("ground", "sph1", cp)
    b.set_contact_params("sph1", "sph2", cp)
    b.set_contact_params("sph2", "sph3", cp)
    return b.compile()


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="golden data not present")
def test_sphere_stack_matches_golden():
    scene, st = build_sphere_stack()
    golden = np.loadtxt(GOLDEN, max_rows=301)
    dt = 0.001
    step_j = jax.jit(lambda s: stepper.step(scene, s, dt))
    max_err = 0.0
    for i in range(300):
        st = step_j(st)
        ref = golden[i + 1][1:22]
        ours = np.concatenate(
            [
                np.concatenate([np.asarray(st.pos[b]), np.asarray(st.quat[b])])
                for b in range(3)
            ]
        )
        max_err = max(max_err, float(np.max(np.abs(ours - ref))))
    assert max_err < 1e-4, f"L-inf {max_err}"
    # actually holds far tighter (~1e-7: only the stabilization epsilon push)
    assert max_err < 1e-6
