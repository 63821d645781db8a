"""Quadruped locomotion over procedural height-field terrain.

Builds the scene programmatically from the packaged quadruped model (the
dm_control-mjcf editing role, SURVEY.md D11): the flat floor is replaced by
an hfield whose elevation grid is generated from the config seed, and the
trunk/feet collide with the terrain triangles (engine/collision.py hfield
narrowphase). The task reuses the flat-ground velocity-tracking reward.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from ambersim_tpu import ROOT
from ambersim_tpu.rl.quadruped.locomotion import QuadrupedLocomotionConfig, QuadrupedLocomotionEnv


@struct.dataclass
class QuadrupedTerrainConfig(QuadrupedLocomotionConfig):
    # terrain grid (elevations are normalized [0, 1]; world height = z_scale)
    terrain_seed: int = struct.field(pytree_node=False, default=0)
    terrain_nrow: int = struct.field(pytree_node=False, default=24)
    terrain_ncol: int = struct.field(pytree_node=False, default=24)
    terrain_extent: float = struct.field(pytree_node=False, default=6.0)  # radius (m)
    terrain_height: float = struct.field(pytree_node=False, default=0.05)  # z scale (m)
    # rough terrain is harder: slightly laxer fall threshold
    min_height: float = 0.10


def _terrain_grid(cfg: QuadrupedTerrainConfig) -> np.ndarray:
    """Smooth random terrain: sum of a few low-frequency sinusoids, flattened
    near the spawn point so the stand pose starts feasible."""
    rng = np.random.default_rng(cfg.terrain_seed)
    gy, gx = np.meshgrid(
        np.linspace(-1, 1, cfg.terrain_nrow), np.linspace(-1, 1, cfg.terrain_ncol), indexing="ij"
    )
    z = np.zeros_like(gx)
    for _ in range(4):
        fx, fy = rng.uniform(1.0, 3.0, 2)
        px, py = rng.uniform(0, 2 * np.pi, 2)
        z += rng.uniform(0.3, 1.0) * np.sin(fx * np.pi * gx + px) * np.sin(fy * np.pi * gy + py)
    z -= z.min()
    z /= max(z.max(), 1e-9)
    spawn_flat = np.exp(-((gx / 0.25) ** 2 + (gy / 0.25) ** 2))  # bowl-free spawn
    return z * (1.0 - spawn_flat)


def _build_terrain_model(cfg: QuadrupedTerrainConfig):
    from ambersim_tpu.engine.setconst import set_constants
    from ambersim_tpu.mjcf.compiler import compile_spec
    from ambersim_tpu.mjcf.parser import ElemSpec, parse_mjcf

    spec = parse_mjcf(cfg.model_path)
    world = spec.bodies[0]
    world.geoms = [g for g in world.geoms if g.attrib.get("name") != "floor"]
    spec.hfields["terrain"] = dict(
        name="terrain",
        nrow=str(cfg.terrain_nrow),
        ncol=str(cfg.terrain_ncol),
        size=f"{cfg.terrain_extent} {cfg.terrain_extent} {cfg.terrain_height} 0.1",
    )
    world.geoms.append(
        ElemSpec(
            "geom",
            {
                "name": "terrain",
                "type": "hfield",
                "hfield": "terrain",
                "contype": "1",
                "conaffinity": "1",
                "friction": "0.8 0.02 0.01",
            },
        )
    )
    model = set_constants(compile_spec(spec))
    grid = _terrain_grid(cfg).astype(np.float32)
    return model.replace(hfield_data=grid[None])


class QuadrupedTerrainEnv(QuadrupedLocomotionEnv):
    """Velocity-tracking locomotion over smooth random terrain."""

    def __init__(self, config: QuadrupedTerrainConfig | None = None):
        cfg = config or QuadrupedTerrainConfig()
        self.config = cfg
        model = _build_terrain_model(cfg)
        # skip the flat-env __init__ (it loads the flat scene); init MjxEnv
        from ambersim_tpu.rl.base import MjxEnv

        MjxEnv.__init__(self, model, cfg.physics_steps_per_control_step)
        self._default_pose = np.asarray(model.qpos0)[7:]

    def _done(self, data):
        c = self.config
        from ambersim_tpu.core import math as am

        up = am.rotate(jnp.array([0.0, 0.0, 1.0]), data.qpos[3:7])
        # height measured against the nominal terrain band (z scale is small)
        fallen = (data.qpos[2] < c.min_height) | (up[2] < 1.0 - c.max_tilt)
        return fallen.astype(jnp.float32)
