"""Contact-MPC example: push a block across a plane to a target
(the reference's example/sims-in-code/block.cpp + controller, solved with the
contact-implicit iLQR instead of a hand-written controller)."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from moby_tpu.core import scene as sc
    from moby_tpu.math import quaternion as quat
    from moby_tpu.mpc import contact_mpc

    b = sc.SceneBuilder()
    b.set_gravity([0, 0, -9.81])
    b.add_body("block", mass=1.0, inertia=sc.box_inertia(1.0, 0.2, 0.2, 0.2),
               pos=np.array([0.0, 0.0, 0.2]))
    b.add_geom("block", sc.BOX, [0.2, 0.2, 0.2])
    b.add_body("ground", enabled=False)
    pq = np.asarray(quat.from_rpy(jnp.array([1.5707963267949, 0, 0])))
    b.add_geom("ground", sc.PLANE, [0.0], quat=pq)
    b.set_contact_params("ground", "block",
                         sc.ContactParams(mu_coulomb=0.3, nk=4))
    scene, st = b.compile()

    prob = contact_mpc.MPCProblem(scene=scene, template=st, dt=0.02, horizon=30)
    target = jnp.array([0.6, 0.3])

    def cost(x, u):
        return 1e-4 * jnp.sum(u[:6] ** 2)

    def cost_final(x):
        return 100.0 * jnp.sum((x[0:2] - target) ** 2)

    res = contact_mpc.solve(prob, st, cost, cost_final, n_iters=12)
    print("final block xy:", np.asarray(res.xs[-1][0:2]), "target:", np.asarray(target))
    print("cost:", float(res.cost))


if __name__ == "__main__":
    main()
