"""Mesh utility apps: convexify / center / adjust-center.

Mirrors the reference binaries (programs/convexify.cpp, center.cpp,
adjust-center.cpp): Wavefront OBJ in/out, convex hull via the native
quickhull (the reference shells out to qhull through CompGeom), centering at
the center of mass, and manual center adjustment. Output naming follows the
reference: `centered.<file>` / `adjusted.<file>`.

Entry points:
    python -m moby_tpu.cli.convexify <in.obj> <out.obj>
    python -m moby_tpu.cli.center <f1.obj> [f2.obj ...]
    python -m moby_tpu.cli.adjust_center <f.obj> +x +y +z
"""

from __future__ import annotations

import os
import sys

import numpy as np

from .. import native


def read_obj(path):
    """Minimal OBJ reader: v + f records (polygons fan-triangulated)."""
    verts, faces = [], []
    with open(path) as fh:
        for line in fh:
            t = line.split()
            if not t:
                continue
            if t[0] == "v":
                verts.append([float(x) for x in t[1:4]])
            elif t[0] == "f":
                idx = [int(w.split("/")[0]) for w in t[1:]]
                idx = [i - 1 if i > 0 else len(verts) + i for i in idx]
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return np.asarray(verts, float), np.asarray(faces, np.int32).reshape(-1, 3)


def write_obj(path, verts, faces):
    with open(path, "w") as fh:
        fh.write("# written by moby_tpu meshutil\n")
        for v in verts:
            fh.write(f"v {v[0]:.17g} {v[1]:.17g} {v[2]:.17g}\n")
        for f in faces:
            fh.write(f"f {f[0] + 1} {f[1] + 1} {f[2] + 1}\n")


def convexify_main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 2:
        print("syntax: convexify <input> <output>", file=sys.stderr)
        return 1
    verts, _ = read_obj(argv[0])
    try:
        hv, hf = native.convex_hull(verts)
    except (RuntimeError, ValueError) as e:
        print(f"convexify: {e}", file=sys.stderr)
        return 1
    write_obj(argv[1], hv, hf)
    return 0


def center_main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("syntax: center <file1.obj> ... <fileN.obj>", file=sys.stderr)
        return 1
    meshes = [read_obj(p) for p in argv]
    # center of mass over the union of all triangles (center.cpp:26)
    all_v = np.concatenate([v for v, _ in meshes])
    off = 0
    all_f = []
    for v, f in meshes:
        all_f.append(f + off)
        off += len(v)
    com, _ = native.mesh_com(all_v, np.concatenate(all_f))
    print(f"center of mass: {com[0]:.17g} {com[1]:.17g} {com[2]:.17g}")
    for path, (v, f) in zip(argv, meshes):
        out = os.path.join(
            os.path.dirname(path), "centered." + os.path.basename(path)
        )
        print(f"writing centered file {out}")
        write_obj(out, v - com, f)
    return 0


def adjust_center_main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 4:
        print("syntax: adjust-center <file1.obj> +x +y +z", file=sys.stderr)
        return 1
    v, f = read_obj(argv[0])
    adj = np.array([float(argv[1]), float(argv[2]), float(argv[3])])
    out = os.path.join(
        os.path.dirname(argv[0]), "adjusted." + os.path.basename(argv[0])
    )
    print(f"writing adjusted file {out}")
    write_obj(out, v + adj, f)
    return 0


def write_wrl(path, verts, faces):
    """VRML 2.0 IndexedFaceSet (reference programs/objwrl.cpp)."""
    with open(path, "w") as fh:
        fh.write("#VRML V2.0 utf8\n")
        fh.write("Shape {\n  geometry IndexedFaceSet {\n")
        fh.write("    coord Coordinate { point [\n")
        for v in verts:
            fh.write(f"      {v[0]:.17g} {v[1]:.17g} {v[2]:.17g}\n")
        fh.write("    ] }\n    coordIndex [\n")
        for f in faces:
            fh.write(f"      {f[0]} {f[1]} {f[2]} -1,\n")
        fh.write("    ] } }\n")


def objwrl_main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 2:
        print("syntax: objwrl <input.obj> <output.wrl>", file=sys.stderr)
        return 1
    v, f = read_obj(argv[0])
    write_wrl(argv[1], v, f)
    return 0
