"""Multi-host mesh layout + solver-axis LCP sharding (SURVEY §2.6 / §5:
the distributed components that exist only in this framework)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from moby_tpu.core import scene as sc
from moby_tpu.parallel import distributed as dist
from moby_tpu.parallel import mesh as pmesh
from moby_tpu.sim import stepper
from moby_tpu.solvers import lcp as lcp_mod


needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _stack_scene():
    b = sc.SceneBuilder()
    b.set_gravity([0, 0, -9.81])
    b.add_body("ball", mass=1.0, inertia=sc.sphere_inertia(1.0, 0.5),
               pos=np.array([0.0, 0.0, 0.6]))
    b.add_body("ground", enabled=False)
    b.add_geom("ball", sc.SPHERE, [0.5])
    q = np.asarray(
        __import__("moby_tpu.math.quaternion", fromlist=["x"]).from_rpy(
            jnp.array([1.5707963267949, 0.0, 0.0])
        )
    )
    b.add_geom("ground", sc.PLANE, [0.0], quat=q)
    b.set_contact_params(
        "ground", "ball", sc.ContactParams(epsilon=0.3, mu_coulomb=0.5, nk=4)
    )
    return b.compile()


@needs_8
def test_host_scenario_mesh_rollout_matches_single_device():
    scene, st = _stack_scene()
    B = 16
    batched = pmesh.broadcast_state(st, B)
    dz = jnp.linspace(0.0, 0.05, B)
    batched = batched.replace(pos=batched.pos.at[:, 0, 2].add(dz))

    mesh = dist.host_scenario_mesh(n_hosts=2)  # 2 "hosts" x 4 chips
    assert mesh.shape == {"host": 2, "scenario": 4}

    sharded_in = dist.shard_batch_2d(mesh, batched)
    out_sharded = dist.sharded_rollout_2d(scene, mesh, sharded_in, 0.01, 25)

    @jax.jit
    def local(states):
        def f(s, _):
            return jax.vmap(lambda x: stepper.step(scene, x, 0.01))(s), None

        out, _ = jax.lax.scan(f, states, None, length=25)
        return out

    out_local = local(batched)
    np.testing.assert_allclose(
        np.asarray(out_sharded.pos), np.asarray(out_local.pos),
        rtol=0, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(out_sharded.vel), np.asarray(out_local.vel),
        rtol=0, atol=1e-12,
    )


def _random_monotone_lcp(key, n, dtype=jnp.float64):
    kA, kq = jax.random.split(key)
    A = jax.random.normal(kA, (n, n), dtype)
    M = A @ A.T + jnp.eye(n, dtype=dtype) * 0.5
    q = jax.random.normal(kq, (n,), dtype)
    return M, q


def test_apgd_matches_pivoting_single_device():
    key = jax.random.PRNGKey(0)
    M, q = _random_monotone_lcp(key, 24)
    mask = jnp.ones(24, bool)
    z_ref, ok = lcp_mod.solve_lcp(M, q, mask)
    assert bool(ok)
    z = dist.lcp_apgd(M, q, mask, iters=800)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=2e-6)


def test_apgd_respects_mask():
    key = jax.random.PRNGKey(1)
    M, q = _random_monotone_lcp(key, 16)
    mask = jnp.arange(16) < 11
    z = dist.lcp_apgd(M, q, mask, iters=800)
    assert np.all(np.asarray(z[11:]) == 0.0)
    z_ref, ok = lcp_mod.solve_lcp(M, q, mask)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=2e-6)


@needs_8
def test_apgd_sharded_matches_dense():
    key = jax.random.PRNGKey(2)
    n = 64  # 8 shards x 8 rows
    M, q = _random_monotone_lcp(key, n)
    mask = jnp.ones(n, bool)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("solver",))
    z_sh = dist.lcp_apgd_sharded(M, q, mask, mesh, iters=1200)
    z_ref, ok = lcp_mod.solve_lcp(M, q, mask)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(z_sh), np.asarray(z_ref), atol=5e-6)

    # complementarity residual
    w = np.asarray(M @ z_sh + q)
    assert (np.asarray(z_sh) >= -1e-9).all()
    assert (w >= -1e-6).all()
    assert abs(np.asarray(z_sh) @ w) < 1e-5
