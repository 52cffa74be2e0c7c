"""Scene compilation: a Moby-style scene -> static fixed-shape arrays.

TPU-first design: where the reference keeps a pointer graph of bodies,
geometries and per-pair `ContactParameters` resolved at runtime
(`src/ConstraintSimulator.cpp:82-155`), we compile the whole scene host-side
into a `Scene` pytree of fixed-shape arrays:

* bodies -> struct-of-arrays (mass, inertia, enabled),
* collision geometries -> typed parameter table with local poses folded in,
* candidate pairs -> a static pair table grouped by narrow-phase kind
  (the reference's double-dispatch table, `include/Moby/CCD.inl:3-81`,
  becomes per-kind vectorized kernels),
* contact slots -> a fixed-K layout with per-slot static contact parameters
  (epsilon, mu, NK, compliance) resolved from ContactParameters at build time,
* friction-cone rows -> a static (contact, cos θ, sin θ, mu) table mirroring
  `setup_QP`'s NK/2 half-plane rows (src/ImpactConstraintHandlerQP.cpp:456-479).

One simulation step is then a pure jittable function of (State, Scene); a
batch of scenarios is `vmap` over State (Scene shared) or over both.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np
import jax.numpy as jnp
from flax import struct

from .. import config as cfg

# geometry type codes
SPHERE = 0
PLANE = 1
BOX = 2
CYLINDER = 3
CONE = 4
TORUS = 5
HEIGHTMAP = 6
POLYHEDRON = 7

# narrow-phase kind codes (mirrors CCD::find_contacts dispatch,
# include/Moby/CCD.inl:3-81)
K_SPHERE_SPHERE = 0   # A=sphere, B=sphere, 1 slot
K_SPHERE_PLANE = 1    # A=sphere, B=plane, 1 slot
K_BOX_SPHERE = 2      # A=box, B=sphere, 1 slot
K_PLANE_GENERIC = 3   # A=plane, B=vertex-carrying solid, nverts slots
K_CYLINDER_PLANE = 4  # A=cylinder, B=plane, 4 slots
K_TORUS_PLANE = 5     # A=torus, B=plane, 4 slots

_KIND_NAMES = {
    K_SPHERE_SPHERE: "sphere_sphere",
    K_SPHERE_PLANE: "sphere_plane",
    K_BOX_SPHERE: "box_sphere",
    K_PLANE_GENERIC: "plane_generic",
    K_CYLINDER_PLANE: "cylinder_plane",
    K_TORUS_PLANE: "torus_plane",
}


def _kind_nslots(kind: int, nverts_b: int) -> int:
    if kind in (K_SPHERE_SPHERE, K_SPHERE_PLANE, K_BOX_SPHERE):
        return 1
    if kind == K_PLANE_GENERIC:
        return nverts_b
    if kind in (K_CYLINDER_PLANE, K_TORUS_PLANE):
        return 4
    raise ValueError(f"unknown kind {kind}")


@struct.dataclass
class Scene:
    """Static compiled scene. All arrays fixed-shape; `vmap`-compatible."""

    # ---- bodies (nb,)
    mass: jnp.ndarray            # (nb,)
    inv_mass: jnp.ndarray        # (nb,) 0 for disabled/infinite
    inertia: jnp.ndarray         # (nb, 3, 3) body-frame rotational inertia
    inv_inertia: jnp.ndarray     # (nb, 3, 3) 0 for disabled
    enabled: jnp.ndarray         # (nb,) bool
    rmax: jnp.ndarray            # (nb,) farthest-geometry-point distance (CA bound)

    # ---- geometries (ng,)
    geom_body: jnp.ndarray       # (ng,) int32
    geom_pos: jnp.ndarray        # (ng, 3) local position in body frame
    geom_quat: jnp.ndarray       # (ng, 4) local orientation (xyzw)
    geom_params: jnp.ndarray     # (ng, 4)

    # ---- candidate pairs (np_,)
    pair_g1: jnp.ndarray         # (np_,) int32 geometry A
    pair_g2: jnp.ndarray         # (np_,) int32 geometry B
    pair_kind: jnp.ndarray       # (np_,) int32
    pair_slot0: jnp.ndarray      # (np_,) int32 first contact slot of this pair
    pair_nslots: jnp.ndarray     # (np_,) int32

    # ---- contact slots (K,)
    slot_pair: jnp.ndarray       # (K,) int32 owning pair
    slot_b1: jnp.ndarray         # (K,) int32 body of geom1 (Moby's contact_geom1)
    slot_b2: jnp.ndarray         # (K,) int32 body of geom2
    slot_eps: jnp.ndarray        # (K,) restitution
    slot_mu_c: jnp.ndarray       # (K,) Coulomb friction
    slot_mu_v: jnp.ndarray       # (K,) viscous friction
    slot_compliance: jnp.ndarray  # (K,)

    # ---- friction-cone rows (NF,)
    fr_con: jnp.ndarray          # (NF,) int32 contact slot of this row
    fr_cos: jnp.ndarray          # (NF,)
    fr_sin: jnp.ndarray          # (NF,)

    # ---- vertex table for plane_generic contacts / CA bounds
    # per-geometry local-frame vertices, zero-padded
    geom_verts: jnp.ndarray      # (ng, VMAX, 3)
    geom_nverts: jnp.ndarray     # (ng,) int32

    # ---- forces / solver config (dynamic so they can be vmapped/differentiated)
    gravity: jnp.ndarray         # (3,)
    contact_dist_thresh: jnp.ndarray  # () default 1e-6 (ConstraintSimulator.cpp:56)
    min_step_size: jnp.ndarray   # () default NEAR_ZERO (TimeSteppingSimulator.cpp:47)
    dissipation_lambda: jnp.ndarray  # (nb,) per-body velocity decay (1.0 = off)

    # ---- static metadata
    nb: int = struct.field(pytree_node=False, default=0)
    ng: int = struct.field(pytree_node=False, default=0)
    n_pairs: int = struct.field(pytree_node=False, default=0)
    n_contacts: int = struct.field(pytree_node=False, default=0)   # K
    n_friction_rows: int = struct.field(pytree_node=False, default=0)
    n_limits: int = struct.field(pytree_node=False, default=0)
    vmax: int = struct.field(pytree_node=False, default=0)
    # host-side numpy dispatch tables: kind -> pair indices
    kind_groups: Any = struct.field(pytree_node=False, default=None)
    body_names: Any = struct.field(pytree_node=False, default=None)

    @property
    def n_vars(self) -> int:
        """QP variable count [cn cs ct ncs nct l] (UnilateralConstraintProblemData
        index layout, include/Moby/UnilateralConstraintProblemData.h:187-205)."""
        return 5 * self.n_contacts + self.n_limits

    @property
    def n_ineq(self) -> int:
        return self.n_contacts + self.n_friction_rows + self.n_limits

    @property
    def n_lcp(self) -> int:
        return self.n_vars + self.n_ineq


@struct.dataclass
class State:
    """Dynamic simulation state (one scenario). Batched via leading vmap axis."""

    pos: jnp.ndarray    # (nb, 3) COM position, world
    quat: jnp.ndarray   # (nb, 4) orientation xyzw
    vel: jnp.ndarray    # (nb, 3) COM linear velocity, world
    omega: jnp.ndarray  # (nb, 3) angular velocity, world
    time: jnp.ndarray   # ()
    # impact-solver warm start (reference `_zlast`, ImpactConstraintHandlerQP.cpp:160)
    zlast: jnp.ndarray        # (n_lcp,)
    zlast_active: jnp.ndarray  # (K,) bool: contact-active mask of the stored solve
    # worst observed penetration per pair (reference CCD::_min_dist_observed)
    min_dist_obs: jnp.ndarray  # (np_,)


@dataclass
class BodyDef:
    name: str
    mass: float = 0.0
    inertia: np.ndarray = None          # (3,3) about COM in body frame
    pos: np.ndarray = None
    quat: np.ndarray = None             # xyzw
    lin_vel: np.ndarray = None
    ang_vel: np.ndarray = None
    enabled: bool = True
    dissipation: float = 1.0


@dataclass
class GeomDef:
    body: str
    gtype: int
    params: np.ndarray                  # up to 4 floats
    pos: np.ndarray = None              # local pose in body frame
    quat: np.ndarray = None
    verts: np.ndarray = None            # (V,3) local vertices (box/polyhedron)


@dataclass
class ContactParams:
    """Per body-pair contact parameters (reference ContactParameters.cpp:23-26
    defaults: epsilon=0, mu=0, NK=4)."""

    epsilon: float = 0.0
    mu_coulomb: float = 0.0
    mu_viscous: float = 0.0
    nk: int = 4
    compliance: float = 0.0


def box_vertices(hx, hy, hz) -> np.ndarray:
    return np.array(
        [
            [sx * hx, sy * hy, sz * hz]
            for sx in (-1, 1)
            for sy in (-1, 1)
            for sz in (-1, 1)
        ]
    )


def sphere_inertia(mass, r):
    i = 2.0 / 5.0 * mass * r * r
    return np.eye(3) * i


def box_inertia(mass, hx, hy, hz):
    lx, ly, lz = 2 * hx, 2 * hy, 2 * hz
    return np.diag(
        [
            mass / 12.0 * (ly * ly + lz * lz),
            mass / 12.0 * (lx * lx + lz * lz),
            mass / 12.0 * (lx * lx + ly * ly),
        ]
    )


def cylinder_inertia(mass, r, h):
    # axis along local Y (Moby convention: cylinder axis = Y)
    ix = mass * (3 * r * r + h * h) / 12.0
    return np.diag([ix, 0.5 * mass * r * r, ix])


class SceneBuilder:
    """Host-side scene assembly. Mirrors what XMLReader + Simulator setup do
    in the reference (src/XMLReader.cpp:151-204, src/Simulator.cpp)."""

    def __init__(self, dtype=None):
        self.dtype = dtype or cfg.default_dtype()
        self.bodies: list[BodyDef] = []
        self.geoms: list[GeomDef] = []
        self.contact_params: dict[tuple[str, str], ContactParams] = {}
        self.gravity = np.zeros(3)
        self.contact_dist_thresh = 1e-6
        self.min_step_size = cfg.NEAR_ZERO_F64
        self.disabled_pairs: set[tuple[str, str]] = set()

    def add_body(self, name, **kw) -> BodyDef:
        b = BodyDef(name=name, **kw)
        if b.inertia is None:
            b.inertia = np.eye(3)
        if b.pos is None:
            b.pos = np.zeros(3)
        if b.quat is None:
            b.quat = np.array([0.0, 0.0, 0.0, 1.0])
        if b.lin_vel is None:
            b.lin_vel = np.zeros(3)
        if b.ang_vel is None:
            b.ang_vel = np.zeros(3)
        self.bodies.append(b)
        return b

    def add_geom(self, body, gtype, params, pos=None, quat=None, verts=None):
        g = GeomDef(
            body=body,
            gtype=gtype,
            params=np.asarray(params, dtype=np.float64),
            pos=np.zeros(3) if pos is None else np.asarray(pos, np.float64),
            quat=np.array([0, 0, 0, 1.0]) if quat is None else np.asarray(quat, np.float64),
            verts=verts,
        )
        if g.gtype == BOX and g.verts is None:
            g.verts = box_vertices(*g.params[:3])
        self.geoms.append(g)
        return g

    def set_contact_params(self, name1, name2, cp: ContactParams):
        self.contact_params[tuple(sorted((name1, name2)))] = cp

    def set_gravity(self, g):
        self.gravity = np.asarray(g, np.float64)

    def _lookup_cp(self, n1, n2) -> ContactParams:
        return self.contact_params.get(tuple(sorted((n1, n2))), ContactParams())

    def _pair_kind(self, ta, tb):
        """Return (kind, flip) mirroring CCD::find_contacts dispatch
        (include/Moby/CCD.inl:3-81); flip=True when (A,B) must be swapped."""
        if ta == SPHERE and tb == SPHERE:
            return K_SPHERE_SPHERE, False
        if ta == SPHERE and tb == PLANE:
            return K_SPHERE_PLANE, False
        if ta == PLANE and tb == SPHERE:
            return K_SPHERE_PLANE, True
        if ta == SPHERE and tb == BOX:
            return K_BOX_SPHERE, True
        if ta == BOX and tb == SPHERE:
            return K_BOX_SPHERE, False
        if ta == BOX and tb == PLANE:
            return K_PLANE_GENERIC, True   # plane becomes A
        if ta == PLANE and tb == BOX:
            return K_PLANE_GENERIC, False
        if ta == CYLINDER and tb == PLANE:
            return K_CYLINDER_PLANE, False
        if ta == PLANE and tb == CYLINDER:
            return K_CYLINDER_PLANE, True
        if ta == TORUS and tb == PLANE:
            return K_TORUS_PLANE, False
        if ta == PLANE and tb == TORUS:
            return K_TORUS_PLANE, True
        if ta == POLYHEDRON and tb == PLANE:
            return K_PLANE_GENERIC, True
        if ta == PLANE and tb == POLYHEDRON:
            return K_PLANE_GENERIC, False
        return None, False

    def compile(self):
        dt = self.dtype
        nb = len(self.bodies)
        ng = len(self.geoms)
        name_to_idx = {b.name: i for i, b in enumerate(self.bodies)}

        mass = np.array([b.mass for b in self.bodies], dt)
        inertia = np.stack([b.inertia for b in self.bodies]).astype(dt)
        enabled = np.array([b.enabled for b in self.bodies], bool)
        inv_mass = np.where(
            enabled & (mass > 0), 1.0 / np.maximum(mass, 1e-300), 0.0
        ).astype(dt)
        inv_inertia = np.zeros_like(inertia)
        for i, b in enumerate(self.bodies):
            if enabled[i] and b.mass > 0:
                inv_inertia[i] = np.linalg.inv(b.inertia)

        geom_body = np.array([name_to_idx[g.body] for g in self.geoms], np.int32)
        geom_pos = np.stack([g.pos for g in self.geoms]).astype(dt) if ng else np.zeros((0, 3), dt)
        geom_quat = np.stack([g.quat for g in self.geoms]).astype(dt) if ng else np.zeros((0, 4), dt)
        geom_params = np.zeros((ng, 4), dt)
        for i, g in enumerate(self.geoms):
            geom_params[i, : len(g.params)] = g.params

        # vertex table
        vmax = max([1] + [len(g.verts) for g in self.geoms if g.verts is not None])
        geom_verts = np.zeros((ng, vmax, 3), dt)
        geom_nverts = np.zeros(ng, np.int32)
        for i, g in enumerate(self.geoms):
            if g.verts is not None:
                geom_verts[i, : len(g.verts)] = g.verts
                geom_nverts[i] = len(g.verts)

        # rmax per body: farthest point of any attached geometry from the COM
        # (reference: CCD.cpp:739 via Primitive::get_farthest_point_distance)
        rmax = np.zeros(nb, dt)
        for i, g in enumerate(self.geoms):
            b = geom_body[i]
            off = np.linalg.norm(g.pos)
            t = g.gtype
            if t == SPHERE:
                r = off + g.params[0]
            elif t == BOX:
                r = off + float(np.linalg.norm(g.params[:3]))
            elif t == CYLINDER:
                r = off + float(math.hypot(g.params[0], g.params[1] / 2))
            elif t == TORUS:
                r = off + float(g.params[0] + g.params[1])
            elif t == POLYHEDRON:
                r = off + float(np.max(np.linalg.norm(g.verts, axis=1))) if g.verts is not None else off
            else:  # plane, heightmap: unbounded but on disabled bodies in practice
                r = off
            rmax[b] = max(rmax[b], r)

        # ---- candidate pairs: all geometry pairs across distinct bodies with
        # at least one enabled body (reference CollisionDetection.cpp:48-54)
        pair_rows = []
        for i in range(ng):
            for j in range(i + 1, ng):
                bi, bj = geom_body[i], geom_body[j]
                if bi == bj:
                    continue
                if not (enabled[bi] or enabled[bj]):
                    continue
                ni, nj = self.bodies[bi].name, self.bodies[bj].name
                if tuple(sorted((ni, nj))) in self.disabled_pairs:
                    continue
                ta, tb = self.geoms[i].gtype, self.geoms[j].gtype
                kind, flip = self._pair_kind(ta, tb)
                if kind is None:
                    continue
                ga, gb = (j, i) if flip else (i, j)
                pair_rows.append((ga, gb, kind))

        n_pairs = len(pair_rows)
        pair_g1 = np.array([p[0] for p in pair_rows], np.int32)
        pair_g2 = np.array([p[1] for p in pair_rows], np.int32)
        pair_kind = np.array([p[2] for p in pair_rows], np.int32)

        # ---- contact slots
        slot_pair, slot_b1, slot_b2 = [], [], []
        slot_eps, slot_mu_c, slot_mu_v, slot_comp, slot_nk = [], [], [], [], []
        pair_slot0 = np.zeros(n_pairs, np.int32)
        pair_nslots = np.zeros(n_pairs, np.int32)
        for p, (ga, gb, kind) in enumerate(pair_rows):
            # plane_generic gets a uniform vmax slots per pair so each kind
            # group is rectangular (inactive beyond the true vertex count)
            ns = _kind_nslots(kind, vmax)
            pair_slot0[p] = len(slot_pair)
            pair_nslots[p] = ns
            b1 = int(geom_body[ga])
            b2 = int(geom_body[gb])
            cp = self._lookup_cp(self.bodies[b1].name, self.bodies[b2].name)
            for _ in range(ns):
                slot_pair.append(p)
                slot_b1.append(b1)
                slot_b2.append(b2)
                slot_eps.append(cp.epsilon)
                slot_mu_c.append(cp.mu_coulomb)
                slot_mu_v.append(cp.mu_viscous)
                slot_comp.append(cp.compliance)
                slot_nk.append(max(4, cp.nk))

        K = len(slot_pair)

        # ---- friction rows (setup_QP: NK/2 rows per contact,
        # θ_j = j/(NK/2-1)·π/2, src/ImpactConstraintHandlerQP.cpp:461-479)
        fr_con, fr_cos, fr_sin = [], [], []
        for i in range(K):
            half = slot_nk[i] // 2
            for j in range(half):
                theta = (j / (half - 1)) * (math.pi / 2) if half > 1 else 0.0
                fr_con.append(i)
                fr_cos.append(math.cos(theta))
                fr_sin.append(math.sin(theta))
        NF = len(fr_con)

        # host-side dispatch tables: for each narrow-phase kind, the pair
        # indices and their flattened contact-slot indices (static shapes)
        kind_groups = {}
        for p, (_, _, kind) in enumerate(pair_rows):
            kind_groups.setdefault(int(kind), []).append(p)
        kind_groups = {
            k: {
                "pairs": np.array(v, np.int32),
                "slots": np.concatenate(
                    [pair_slot0[p] + np.arange(pair_nslots[p], dtype=np.int32) for p in v]
                )
                if v
                else np.zeros(0, np.int32),
                "nslots": int(pair_nslots[v[0]]) if v else 0,
            }
            for k, v in kind_groups.items()
        }

        scene = Scene(
            mass=jnp.array(mass),
            inv_mass=jnp.array(inv_mass),
            inertia=jnp.array(inertia),
            inv_inertia=jnp.array(inv_inertia),
            enabled=jnp.array(enabled),
            rmax=jnp.array(rmax),
            geom_body=jnp.array(geom_body),
            geom_pos=jnp.array(geom_pos),
            geom_quat=jnp.array(geom_quat),
            geom_params=jnp.array(geom_params),
            pair_g1=jnp.array(pair_g1),
            pair_g2=jnp.array(pair_g2),
            pair_kind=jnp.array(pair_kind),
            pair_slot0=jnp.array(pair_slot0),
            pair_nslots=jnp.array(pair_nslots),
            slot_pair=jnp.array(np.array(slot_pair, np.int32)),
            slot_b1=jnp.array(np.array(slot_b1, np.int32)),
            slot_b2=jnp.array(np.array(slot_b2, np.int32)),
            slot_eps=jnp.array(np.array(slot_eps, dt)),
            slot_mu_c=jnp.array(np.array(slot_mu_c, dt)),
            slot_mu_v=jnp.array(np.array(slot_mu_v, dt)),
            slot_compliance=jnp.array(np.array(slot_comp, dt)),
            fr_con=jnp.array(np.array(fr_con, np.int32)),
            fr_cos=jnp.array(np.array(fr_cos, dt)),
            fr_sin=jnp.array(np.array(fr_sin, dt)),
            geom_verts=jnp.array(geom_verts),
            geom_nverts=jnp.array(geom_nverts),
            gravity=jnp.array(self.gravity.astype(dt)),
            contact_dist_thresh=jnp.array(self.contact_dist_thresh, dt),
            min_step_size=jnp.array(self.min_step_size, dt),
            dissipation_lambda=jnp.array(
                np.array([b.dissipation for b in self.bodies], dt)
            ),
            nb=nb,
            ng=ng,
            n_pairs=n_pairs,
            n_contacts=K,
            n_friction_rows=NF,
            n_limits=0,
            vmax=vmax,
            kind_groups=kind_groups,
            body_names=tuple(b.name for b in self.bodies),
        )

        state = State(
            pos=jnp.array(np.stack([b.pos for b in self.bodies]).astype(dt)),
            quat=jnp.array(np.stack([b.quat for b in self.bodies]).astype(dt)),
            vel=jnp.array(np.stack([b.lin_vel for b in self.bodies]).astype(dt)),
            omega=jnp.array(np.stack([b.ang_vel for b in self.bodies]).astype(dt)),
            time=jnp.array(0.0, dt),
            zlast=jnp.zeros(scene.n_lcp, dt),
            zlast_active=jnp.zeros(K, bool),
            min_dist_obs=jnp.zeros(n_pairs, dt),
        )
        return scene, state
