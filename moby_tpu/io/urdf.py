"""URDF robot reader -> ArticulatedModel (+ collision geometry defs).

Mirrors the reference's `URDFReader` scope (src/URDFReader.cpp): revolute /
continuous / prismatic / fixed joints (floating/planar joints unsupported
there, :325-355); joint limits; inertial origins; sphere/box/cylinder
collision geometries. A massless root link named like "world" becomes a fixed
attachment (fixed-base robot).
"""

from __future__ import annotations

import math
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ..core import scene as sc
from ..dynamics import model as amdl


@dataclass
class UrdfGeom:
    link: str                 # model link name
    gtype: int
    params: np.ndarray
    pos: np.ndarray
    quat: np.ndarray


def _floats(s, n=3):
    v = np.array([float(x) for x in s.split()])
    return v


def _rpy_R(rpy):
    r, p, y = rpy
    cr, sr = math.cos(r), math.sin(r)
    cp, sp = math.cos(p), math.sin(p)
    cy, sy = math.cos(y), math.sin(y)
    return np.array(
        [
            [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
            [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
            [-sp, cp * sr, cp * cr],
        ]
    )


def _origin(el):
    pos = np.zeros(3)
    R = np.eye(3)
    if el is not None:
        if el.get("xyz"):
            pos = _floats(el.get("xyz"))
        if el.get("rpy"):
            R = _rpy_R(_floats(el.get("rpy")))
    return pos, R


def load(path: str, name: Optional[str] = None):
    """Parse a URDF file.

    Returns (ArticulatedModel, link_names, geoms: list[UrdfGeom]).
    Fixed-base only (matching the reference's URDFReader, which builds
    RCArticulatedBody robots; floating handled at the Moby-XML level).
    """
    root = ET.parse(path).getroot()

    links_xml = {l.get("name"): l for l in root.findall("link")}
    joints_xml = root.findall("joint")

    # identify the root link (no parent joint)
    children = {j.find("child").get("link") for j in joints_xml}
    roots = [n for n in links_xml if n not in children]
    if len(roots) != 1:
        raise ValueError(f"URDF must have exactly one root link, got {roots}")
    root_link = roots[0]

    # build tree in topological order
    kids: dict[str, list] = {}
    for j in joints_xml:
        kids.setdefault(j.find("parent").get("link"), []).append(j)

    link_defs: List[amdl.LinkDef] = []
    parents: List[int] = []
    names: List[str] = []
    geoms: List[UrdfGeom] = []
    name_to_idx = {}

    def link_inertial(lx):
        inertial = lx.find("inertial")
        if inertial is None:
            return 0.0, np.zeros(3), np.zeros((3, 3))
        mass = float(inertial.find("mass").get("value"))
        com, Rc = _origin(inertial.find("origin"))
        it = inertial.find("inertia")
        I = np.array(
            [
                [float(it.get("ixx", 0)), float(it.get("ixy", 0)), float(it.get("ixz", 0))],
                [float(it.get("ixy", 0)), float(it.get("iyy", 0)), float(it.get("iyz", 0))],
                [float(it.get("ixz", 0)), float(it.get("iyz", 0)), float(it.get("izz", 0))],
            ]
        )
        return mass, com, Rc @ I @ Rc.T

    def add_collisions(lx, model_link_name):
        for col in lx.findall("collision"):
            gpos, gR = _origin(col.find("origin"))
            gq = _R_to_quat(gR)
            geo = col.find("geometry")
            if geo is None:
                continue
            if geo.find("sphere") is not None:
                r = float(geo.find("sphere").get("radius"))
                geoms.append(UrdfGeom(model_link_name, sc.SPHERE, np.array([r]), gpos, gq))
            elif geo.find("box") is not None:
                size = _floats(geo.find("box").get("size"))
                geoms.append(
                    UrdfGeom(model_link_name, sc.BOX, size / 2, gpos, gq)
                )
            elif geo.find("cylinder") is not None:
                c = geo.find("cylinder")
                r = float(c.get("radius"))
                h = float(c.get("length"))
                # URDF cylinder axis = z; our cylinder axis = y (Moby)
                Rx = _rpy_R(np.array([math.pi / 2, 0, 0]))
                geoms.append(
                    UrdfGeom(
                        model_link_name,
                        sc.CYLINDER,
                        np.array([r, h]),
                        gpos,
                        _R_to_quat(gR @ Rx),
                    )
                )
            # meshes skipped (handled by convex decomposition tooling later)

    def recurse(parent_name, parent_idx):
        for j in kids.get(parent_name, []):
            child_name = j.find("child").get("link")
            lx = links_xml[child_name]
            jpos, jR = _origin(j.find("origin"))
            jtype_s = j.get("type")
            axis_el = j.find("axis")
            axis = _floats(axis_el.get("xyz")) if axis_el is not None else np.array([1.0, 0, 0])
            lim = j.find("limit")
            lo = hi = None
            if lim is not None and jtype_s in ("revolute", "prismatic"):
                if lim.get("lower") is not None:
                    lo = np.array([float(lim.get("lower"))])
                if lim.get("upper") is not None:
                    hi = np.array([float(lim.get("upper"))])
            if jtype_s in ("revolute", "continuous"):
                jt = amdl.REVOLUTE
            elif jtype_s == "prismatic":
                jt = amdl.PRISMATIC
            elif jtype_s == "fixed":
                jt = amdl.FIXED
            else:
                raise ValueError(f"unsupported URDF joint type {jtype_s}")

            mass, com, I = link_inertial(lx)
            jd = amdl.JointDef(
                jtype=jt,
                # URDF origin: child/joint frame pose in parent frame;
                # Transform(E, r): E = parent->child rotation = jR^T
                Xt_E=jR.T,
                Xt_r=jpos,
                axis=axis / max(np.linalg.norm(axis), 1e-15),
                lo=lo,
                hi=hi,
                name=j.get("name"),
            )
            link_defs.append(
                amdl.LinkDef(
                    name=child_name, mass=mass, com=com, inertia_com=I, joint=jd
                )
            )
            parents.append(parent_idx)
            names.append(child_name)
            idx = len(link_defs) - 1
            name_to_idx[child_name] = idx
            add_collisions(lx, child_name)
            recurse(child_name, idx)

    # the root link: if massless ("world"-style), it is the fixed attachment
    root_mass, root_com, root_I = link_inertial(links_xml[root_link])
    if root_mass > 0:
        # real base link attached via a fixed joint at the origin
        jd = amdl.JointDef(
            jtype=amdl.FIXED, Xt_E=np.eye(3), Xt_r=np.zeros(3), name="__base__"
        )
        link_defs.append(
            amdl.LinkDef(
                name=root_link, mass=root_mass, com=root_com,
                inertia_com=root_I, joint=jd,
            )
        )
        parents.append(-1)
        names.append(root_link)
        name_to_idx[root_link] = 0
        add_collisions(links_xml[root_link], root_link)
        recurse(root_link, 0)
    else:
        # massless "world" root: children attach directly to the world frame
        recurse(root_link, -1)

    model = amdl.ArticulatedModel(link_defs, floating=False)
    model.set_parents(parents)
    return model, names, geoms


def _R_to_quat(R):
    t = np.trace(R)
    if t > 0:
        w = math.sqrt(1 + t) / 2
        x = (R[2, 1] - R[1, 2]) / (4 * w)
        y = (R[0, 2] - R[2, 0]) / (4 * w)
        z = (R[1, 0] - R[0, 1]) / (4 * w)
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = math.sqrt(max(1e-15, 1 + R[i, i] - R[j, j] - R[k, k]))
        q = np.zeros(4)
        q[i] = s / 2
        q[j] = (R[j, i] + R[i, j]) / (2 * s)
        q[k] = (R[k, i] + R[i, k]) / (2 * s)
        w = (R[k, j] - R[j, k]) / (2 * s)
        x, y, z = q[0], q[1], q[2]
    q = np.array([x, y, z, w])
    return q / np.linalg.norm(q)
