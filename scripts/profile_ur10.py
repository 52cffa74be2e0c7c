"""Profile the ur10 contact-MPC sweep on the attached TPU and print the
device self-time breakdown by framework op (sibling of profile_mpc.py for
the articulated BASELINE workload).

Run from the repo root: python scripts/profile_ur10.py
"""

import os, sys, glob, json, collections
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_moby")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

import numpy as np, jax.numpy as jnp
import xml.etree.ElementTree as ET
from moby_tpu.core import scene as sc
from moby_tpu.io import sdfio
from moby_tpu.math import quaternion as quat
from moby_tpu.mpc import contact_mpc
from moby_tpu.sim import kinematics
from moby_tpu.dynamics import aba as art_dyn

sdf_path = "/root/reference/example/ur10/ur10/ur10.sdf"
root = ET.parse(sdf_path).getroot()
model = root if root.tag == "model" else root.find("model")
b = sc.SceneBuilder()
b.set_gravity([0, 0, -9.81])
mname, _, _ = sdfio.add_model(b, model, os.path.dirname(os.path.abspath(sdf_path)))
geom_mode = os.environ.get("MOBY_BENCH_UR10_GEOM", "proxy")
wrist = f"{mname}/wrist_3_link"
if geom_mode == "proxy":
    b.geoms = [g for g in b.geoms if g.gtype != sc.POLYHEDRON]
    b.add_geom(wrist, sc.BOX, [0.03, 0.03, 0.03])
else:  # real: wrist hull only (others never approach the floor)
    b.geoms = [g for g in b.geoms
               if g.gtype != sc.POLYHEDRON or g.body == wrist]
b.add_body("ground", enabled=False)
pq = np.asarray(quat.from_rpy(jnp.array([1.5707963267949, 0, 0])))
b.add_geom("ground", sc.PLANE, [0.0], pos=np.array([0, 0, -0.05]), quat=pq)
b.set_contact_params("ground", mname, sc.ContactParams(epsilon=0.0, mu_coulomb=0.5, nk=4))
scene, st = b.compile()
print("K", scene.n_contacts, "NL", scene.n_limits, "n_lcp", scene.n_lcp, "ngc", scene.ngc)

ee_slot = scene.nb + [l.name for l in scene.arts[0].model.links].index("wrist_3_link")
nq = scene.nq_art
o_q = 13 * int(np.asarray(scene.enabled).sum())
def ee_pos_of(q_art):
    s = st.replace(q_art=q_art)
    pt = kinematics.compute(scene, s)
    return pt.pos[ee_slot]
p0 = np.asarray(jax.jit(ee_pos_of)(st.q_art))
target = jnp.asarray(np.array([p0[0]-0.10, p0[1]+0.10, -0.03]), st.pos.dtype)
def cost(x, u):
    qd = x[o_q+nq:o_q+2*nq]
    return 1e-6*jnp.sum(u**2) + 0.01*jnp.sum(qd**2)
def cost_final(x):
    ee = ee_pos_of(x[o_q:o_q+nq]); qd = x[o_q+nq:o_q+2*nq]
    return 500.0*jnp.sum((ee-target)**2) + jnp.sum(qd**2)
H, B = 50, 256
prob = contact_mpc.MPCProblem(scene=scene, template=st, dt=0.01, horizon=H)
tau_hold = art_dyn.rnea(scene.arts[0].model, st.q_art, jnp.zeros(nq), jnp.zeros(nq), scene.gravity)
nu = contact_mpc.n_controls(scene)
us0 = jnp.zeros((H, nu), st.pos.dtype).at[:, nu-nq:].set(tau_hold[None, :])
batched = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (B,)+x.shape), st)

@jax.jit
def sweep(states):
    return contact_mpc.solve_batch(prob, states, cost, cost_final, us0=us0, n_iters=4).cost

out = sweep(batched); jax.block_until_ready(out)
logdir = "/tmp/ur10_trace"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
out = sweep(batched); jax.block_until_ready(out)
jax.profiler.stop_trace()

from xprof.convert import raw_to_tool_data as rtd
xp = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.xplane.pb"))[-1]
data, _ = rtd.xspace_to_tool_data([xp], "hlo_stats", {})
d = json.loads(data if isinstance(data, str) else data.decode())
rows = d["rows"]
def v(r, i): return r["c"][i].get("v")
tot = sum(float(v(r,9) or 0) for r in rows)
fw = collections.Counter()
for r in rows:
    stime = float(v(r, 9) or 0)
    fw[(v(r,5) or "").split("/")[-1][:60]] += stime
print(f"ur10 sweep (B={B}): total device self time {tot/1e3:.1f} ms")
for k, t in fw.most_common(15):
    print(f"  {t/1e3:8.2f} ms  {100*t/tot:5.1f}%  {k}")
