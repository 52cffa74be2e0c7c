"""Heightmap terrain contacts: sphere and box on sloped/curved grids."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moby_tpu.core import scene as sc
from moby_tpu.sim import stepper


def build(heights, width, depth, body="sphere", pos=(0, 0, 2.0), mu=0.0):
    b = sc.SceneBuilder()
    b.set_gravity([0, -9.81, 0])  # heightmap local frame is y-up (unrotated)
    if body == "sphere":
        b.add_body("ball", mass=1.0, inertia=sc.sphere_inertia(1.0, 0.5),
                   pos=np.array([pos[0], pos[2], pos[1]]))
        b.add_geom("ball", sc.SPHERE, [0.5])
    else:
        b.add_body("ball", mass=1.0, inertia=sc.box_inertia(1.0, 0.5, 0.5, 0.5),
                   pos=np.array([pos[0], pos[2], pos[1]]))
        b.add_geom("ball", sc.BOX, [0.5, 0.5, 0.5])
    b.add_body("terrain", enabled=False)
    b.add_geom("terrain", sc.HEIGHTMAP, [width, depth], heights=heights)
    b.set_contact_params(
        "terrain", "ball", sc.ContactParams(epsilon=0.0, mu_coulomb=mu, nk=4)
    )
    return b.compile()


class TestHeightmap:
    def test_sphere_rests_on_flat_grid(self):
        h = np.zeros((8, 8))
        scene, st = build(h, 10.0, 10.0, body="sphere")
        step_j = jax.jit(lambda s: stepper.step(scene, s, 0.005))
        for _ in range(150):
            st = step_j(st)
        assert abs(float(st.pos[0, 1]) - 0.5) < 1e-3
        assert abs(float(st.vel[0, 1])) < 1e-6

    def test_sphere_rests_on_raised_grid(self):
        h = np.full((8, 8), 0.7)
        scene, st = build(h, 10.0, 10.0, body="sphere")
        step_j = jax.jit(lambda s: stepper.step(scene, s, 0.005))
        for _ in range(150):
            st = step_j(st)
        assert abs(float(st.pos[0, 1]) - 1.2) < 1e-3

    def test_box_rests_on_flat_grid(self):
        h = np.zeros((6, 6))
        scene, st = build(h, 10.0, 10.0, body="box", pos=(0, 0, 0.55))
        step_j = jax.jit(lambda s: stepper.step(scene, s, 0.005))
        for _ in range(120):
            st = step_j(st)
        assert abs(float(st.pos[0, 1]) - 0.5) < 2e-3

    def test_sphere_rolls_downhill(self):
        # slope in +x: heights fall with x (rows) -> ball accelerates +x
        x = np.linspace(0, 1, 10)
        h = np.tile((1.0 - x)[:, None], (1, 10)) * 2.0
        scene, st = build(h, 10.0, 10.0, body="sphere", pos=(0, 0, 2.0))
        step_j = jax.jit(lambda s: stepper.step(scene, s, 0.005))
        for _ in range(200):
            st = step_j(st)
        assert float(st.vel[0, 0]) > 0.3, "did not slide downhill"
