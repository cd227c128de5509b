"""Checkpoint / resume.

The reference has no checkpointing, but needs none: the simulation is
stateless in time — every frame is computed directly from (h0, omega,
absolute t) (``src/render.rs:1107-1111``, SURVEY.md §5). We preserve that
design, so a checkpoint IS the full simulation state: the two arrays, the
config used to build them, and the clock. Restart anywhere, bit-identical.

Format: a single .npz (portable, no orbax dependency for 3 arrays) with a
JSON-encoded config blob. Fields can additionally be dumped as .npy for
golden comparisons.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from gfx_ocean_tpu.config import CompatFlags, OceanConfig
from gfx_ocean_tpu.models.ocean import OceanState

FORMAT_VERSION = 1


def _config_to_json(config: OceanConfig) -> str:
    d = dataclasses.asdict(config)
    return json.dumps(d, sort_keys=True)


def _config_from_json(blob: str) -> OceanConfig:
    d = json.loads(blob)
    compat = CompatFlags(**d.pop("compat"))
    if d.get("cascade_domains") is not None:
        d["cascade_domains"] = tuple(d["cascade_domains"])
    return OceanConfig(compat=compat, **d)


def save_checkpoint(path: str, state: OceanState, t: float,
                    config: OceanConfig) -> str:
    """Write a checkpoint; returns the actual path written.

    ``np.savez`` silently appends ``.npz`` when the suffix is missing; we
    normalize up front so the path we report (and the one ``--resume``
    later receives) is the file that exists.
    """
    if not path.endswith(".npz"):
        path = path + ".npz"
    np.savez(
        path,
        format_version=FORMAT_VERSION,
        h0=np.asarray(state.h0),
        omega=np.asarray(state.omega),
        t=np.float64(t),
        config=_config_to_json(config),
    )
    return path


def load_checkpoint(path: str) -> Tuple[OceanState, float, OceanConfig]:
    with np.load(path, allow_pickle=False) as z:
        version = int(z["format_version"])
        if version > FORMAT_VERSION:
            raise ValueError(f"{path}: checkpoint format {version} is newer than "
                             f"supported {FORMAT_VERSION}")
        state = OceanState(h0=jnp.asarray(z["h0"]), omega=jnp.asarray(z["omega"]))
        t = float(z["t"])
        config = _config_from_json(str(z["config"]))
    return state, t, config


def save_fields(path: str, displacement, normals=None, foam=None,
                t: Optional[float] = None) -> str:
    """Dump per-frame fields as .npz for golden comparisons / offline viz.

    Returns the actual path written: np.savez silently appends ``.npz``
    when the suffix is missing (the same hazard ``save_checkpoint``
    normalizes), so callers must use the return value, not their input.
    """
    if not path.endswith(".npz"):
        path = path + ".npz"
    arrays = {"displacement": np.asarray(displacement)}
    if normals is not None:
        arrays["normals"] = np.asarray(normals)
    if foam is not None:
        arrays["foam"] = np.asarray(foam)
    if t is not None:
        arrays["t"] = np.float64(t)
    np.savez(path, **arrays)
    return path
