"""Programmatic scene construction: a double pendulum (the reference's
example/sims-in-code/doublependulum.cpp equivalent)."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from moby_tpu.core import scene as sc
    from moby_tpu.dynamics import model as mdl
    from moby_tpu.sim import stepper

    def link(name, parent_r, l=1.0, m=1.0):
        j = mdl.JointDef(
            jtype=mdl.REVOLUTE, Xt_E=np.eye(3), Xt_r=parent_r,
            axis=np.array([0.0, 0, 1]),
        )
        return mdl.LinkDef(
            name=name, mass=m, com=np.array([0.0, -l / 2, 0.0]),
            inertia_com=np.diag([m * l**2 / 12, 1e-12, m * l**2 / 12]),
            joint=j,
        )

    model = mdl.ArticulatedModel(
        [link("l1", np.zeros(3)), link("l2", np.array([0.0, -1.0, 0.0]))],
        floating=False,
    )
    model.set_parents([-1, 0])

    b = sc.SceneBuilder()
    b.set_gravity([0, -9.81, 0])
    b.add_articulated("dp", model, q0=np.array([1.2, 0.0]))
    scene, st = b.compile()

    step = jax.jit(lambda s: stepper.step(scene, s, 0.001))
    for i in range(2000):
        st = step(st)
        if i % 400 == 0:
            print(f"t={float(st.time):.2f} q={np.asarray(st.q_art)}")


if __name__ == "__main__":
    main()
