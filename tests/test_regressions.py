"""Golden-trajectory regressions vs the reference's regress/*.dat artifacts.

Each test steps a scene at the golden's timestep and checks the L-inf error
of the emitted Euler coordinates (the `moby-regress` + `moby-compare-trajs`
oracle, reference programs/regress.cpp, compare-trajs.cpp). Short horizons
here keep CI fast; scripts/run_all_regressions.sh runs the full horizons.

Initial-condition notes (the goldens predate the current example scenes):
* sitting-box: golden starts at y=0.50001 (scenes/sitting-box.xml);
* fixed-articulated-table: golden used infinite friction (the lost
  contact_simple variant) -> scenes/fixed-articulated-table.xml uses mu=inf;
* rimless-wheel: recovered alpha=0.05 gravity, spin inertia 2, pivot start
  (see plugins/rimless_wheel.py);
* contact-constrained-pendulum: golden is one legacy-ordering step ahead;
  the plugin starts from the equivalent projected initial velocity.
"""

import os

import numpy as np
import jax
import pytest

GOLDEN_DIR = "/root/reference/regress"
needs_golden = pytest.mark.skipif(
    not os.path.isdir(GOLDEN_DIR), reason="reference golden data not present"
)


def run_and_compare(scene, st, dt, golden_file, n_steps, extract, tol):
    from moby_tpu.sim import stepper

    golden = np.loadtxt(
        os.path.join(GOLDEN_DIR, golden_file), max_rows=n_steps + 1
    )
    step_j = jax.jit(lambda s: stepper.step(scene, s, dt))
    max_err = 0.0
    for i in range(n_steps):
        st = step_j(st)
        ref = golden[i + 1][1:]
        ours = extract(st)
        max_err = max(max_err, float(np.max(np.abs(ours - ref[: len(ours)]))))
    assert max_err < tol, f"L-inf {max_err:.3e} over {n_steps} steps"
    return max_err


def free_body_coords(order):
    def f(st):
        return np.concatenate(
            [
                np.concatenate([np.asarray(st.pos[b]), np.asarray(st.quat[b])])
                for b in order
            ]
        )

    return f


@needs_golden
class TestGoldenRegressions:
    def test_sphere_stack(self):
        from tests.test_regression_sphere_stack import build_sphere_stack

        scene, st = build_sphere_stack()
        run_and_compare(
            scene, st, 0.001, "sphere-stack.dat", 150,
            free_body_coords([0, 1, 2]), 1e-4,
        )

    def test_sitting_box(self):
        from moby_tpu.io import mobyxml

        scene, st, opts = mobyxml.load("scenes/sitting-box.xml")
        run_and_compare(
            scene, st, 0.001, "sitting-box.dat", 120,
            free_body_coords([0]), 1.1e-5,
        )

    def test_fixed_articulated_table(self):
        from moby_tpu.io import mobyxml

        scene, st, opts = mobyxml.load("scenes/fixed-articulated-table.xml")

        def extract(s):
            return np.asarray(s.q_art[:7])

        run_and_compare(
            scene, st, 0.001, "fixed-articulated-table.dat", 60, extract, 1e-4
        )

    def test_rimless_wheel(self):
        from moby_tpu.plugins import rimless_wheel

        scene, st, opts = rimless_wheel.build(0.28920687, start="pivot")
        run_and_compare(
            scene, st, 0.001, "rimless-wheel.dat", 150,
            free_body_coords([1]), 1e-4,
        )

    def test_contact_constrained_pendulum(self):
        from moby_tpu.plugins import cc_pendulum

        scene, st, opts = cc_pendulum.build()
        # body order: l1 enabled (world disabled); golden = l1 coords
        order = [i for i in range(scene.nb) if scene.body_names[i] == "l1"]
        run_and_compare(
            scene, st, 0.001, "contact-constrained-pendulum.dat", 150,
            free_body_coords(order), 3e-4,
        )
