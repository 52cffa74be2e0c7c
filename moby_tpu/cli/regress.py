"""`moby-regress` equivalent: run a scene, dump per-step Euler coordinates.

Output format mirrors programs/regress.cpp: one line per step
`t q0 q1 ...` with bodies sorted alphabetically by id (disabled bodies have
no generalized coordinates and are omitted), first line at t=0, last line is
the wall-clock seconds of the run.

Usage: python -m moby_tpu.cli.regress [-s=H] [-mt=T] [-mi=N] [--cpu] scene.xml out.dat
"""

from __future__ import annotations

import sys
import time


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    step_size = None
    max_time = float("inf")
    max_iter = float("inf")
    use_cpu = False
    pos_args = []
    plugin = None
    for a in argv:
        if a.startswith("-s="):
            step_size = float(a[3:])
        elif a.startswith("-mt="):
            max_time = float(a[4:])
        elif a.startswith("-mi="):
            max_iter = int(a[4:])
        elif a.startswith("-p="):
            plugin = a[3:]
        elif a == "--cpu":
            use_cpu = True
        elif a.startswith("-"):
            pass  # ignore unsupported flags (logging, ...)
        else:
            pos_args.append(a)
    if len(pos_args) < 1:
        print(__doc__)
        return 1
    xml_path = pos_args[0]
    out_path = pos_args[1] if len(pos_args) > 1 else "regress.out"

    if use_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax
    import numpy as np

    from ..io import mobyxml
    from ..sim import stepper

    # plugin scenes (the reference loads these via dlopen; here they are
    # Python modules under moby_tpu.plugins with a build() entry)
    _PLUGINS = {
        "librimless-wheel-init.so": "rimless_wheel",
        "rimless_wheel": "rimless_wheel",
        "libcontact-constrained-pendulum-init.so": "cc_pendulum",
        "cc_pendulum": "cc_pendulum",
    }
    if plugin is not None:
        import importlib

        mod = importlib.import_module(
            f"moby_tpu.plugins.{_PLUGINS.get(plugin, plugin)}"
        )
        scene, st, opts = mod.build()
    else:
        scene, st, opts = mobyxml.load(xml_path)
    dt = step_size if step_size is not None else opts.step_size

    # bodies sorted alphabetically by id; only enabled bodies have
    # generalized coordinates (programs/regress.cpp:80-92). Articulated
    # bodies emit Euler coordinates: joint coords then (floating) base pose.
    entries = [
        ("free", i, scene.body_names[i])
        for i in range(scene.nb)
        if bool(scene.enabled[i])
    ]
    for ent in scene.arts:
        entries.append(("art", ent, ent.name))
    entries.sort(key=lambda e: e[2])

    from ..dynamics import model as amdl

    def art_coords(ent, s):
        m = ent.model
        q = np.asarray(s.q_art[ent.q_off : ent.q_off + m.nq])
        vals = []
        base = None
        for i in range(m.nl):
            t = m.jtype[i]
            o = m.q_off[i]
            if t == amdl.FLOATING:
                base = q[o : o + 7]
            elif amdl.NQ[t]:
                vals.extend(q[o : o + amdl.NQ[t]].tolist())
        if base is not None:
            vals.extend(base.tolist())
        return vals

    step_j = jax.jit(lambda s: stepper.step(scene, s, dt))

    t_start = time.time()
    with open(out_path, "w") as f:

        def writeline(s):
            vals = [float(s.time)]
            for kind, ref, _name in entries:
                if kind == "free":
                    vals.extend(np.asarray(s.pos[ref]).tolist())
                    vals.extend(np.asarray(s.quat[ref]).tolist())
                else:
                    vals.extend(art_coords(ref, s))
            f.write(" ".join(f"{v:g}" for v in vals) + "\n")

        it = 0
        writeline(st)
        while it < max_iter and float(st.time) <= max_time:
            st = step_j(st)
            it += 1
            if float(st.time) > max_time or it >= max_iter:
                break
            writeline(st)
        f.write(f"{time.time() - t_start:g}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
