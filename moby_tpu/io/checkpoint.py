"""Checkpoint/resume of simulation state.

The reference pickles its entire object graph to XML every N iterations
(`-w=<ival>` + `XMLWriter::serialize_to_xml`, programs/driver.cpp:221-231)
and any pickle reloads through the XMLReader. Here the scene is static (the
XML/SDF/URDF source is its serialization), so checkpoints capture the dynamic
`State` pytree + metadata. Orbax is used when available (sharded/async-
friendly for multi-host runs); a .npz fallback keeps zero-dependency
restores possible.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax

from ..core import scene as sc

_FIELDS = (
    "pos", "quat", "vel", "omega", "q_art", "qd_art", "time",
    "zlast", "zlast_active", "min_dist_obs",
)


def save(path: str, state: sc.State, meta: dict | None = None) -> None:
    """Write a checkpoint (single file, .npz). Batched states save as-is."""
    arrs = {f: np.asarray(getattr(state, f)) for f in _FIELDS}
    arrs["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **arrs)


def load(path: str, template: sc.State) -> tuple[sc.State, dict]:
    """Restore a checkpoint into the template's structure/dtypes."""
    import jax.numpy as jnp

    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode()) if "__meta__" in z else {}
        kwargs = {}
        for f in _FIELDS:
            ref = getattr(template, f)
            kwargs[f] = jnp.asarray(z[f]).astype(ref.dtype)
        return template.replace(**kwargs), meta


def save_orbax(path: str, state: sc.State) -> None:
    """Orbax checkpoint (sharded arrays preserved; for multi-host runs)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state)
    ckptr.wait_until_finished()


def load_orbax(path: str, template: sc.State) -> sc.State:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
