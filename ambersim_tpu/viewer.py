"""Host-side visualization: batched TPU state streaming + viewer bridges.

Per the north star, "rendering/visualization stays host-side but state
streaming is batched from TPU HBM" (BASELINE.json): `StateStreamer` pulls
decimated batches of qpos/qvel with a single device->host transfer per fetch
(per-array transfers over a tunneled TPU cost seconds — see README).

Rendering itself is delegated to MuJoCo's viewer/renderer when a GL stack is
available (the same split the reference uses: its viewer is MuJoCo's C/OpenGL
viewer — reference examples/interactive_simulation.py:57-71,
examples/rl/pendulum/ex_swingup.py:73-92). In headless environments the
streaming API still works; render entry points raise a clear error.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ambersim_tpu.core.types import Data, Model


class StateStreamer:
    """Stream (decimated) batched state from device to host efficiently.

    Packs the requested env rows of qpos/qvel into one flat device array
    inside jit and fetches it with a single transfer."""

    def __init__(self, model: Model, env_indices: Optional[Sequence[int]] = None):
        self.model = model
        self.env_indices = None if env_indices is None else jnp.asarray(np.asarray(env_indices))
        nq, nv = model.nq, model.nv

        @jax.jit
        def pack(batch: Data):
            qpos, qvel = batch.qpos, batch.qvel
            if qpos.ndim > 1 and self.env_indices is not None:
                qpos = qpos[self.env_indices]
                qvel = qvel[self.env_indices]
            return jnp.concatenate(
                [qpos.reshape(-1, nq), qvel.reshape(-1, nv)], axis=-1
            ).reshape(-1)

        self._pack = pack
        self._nq, self._nv = nq, nv

    def fetch(self, batch: Data) -> tuple:
        """One transfer; returns (qpos (E, nq), qvel (E, nv)) numpy arrays."""
        flat = np.asarray(self._pack(batch))
        per = self._nq + self._nv
        rows = flat.reshape(-1, per)
        return rows[:, : self._nq], rows[:, self._nq :]


def _require_mujoco_gl():
    try:
        import mujoco  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("viewer requires the mujoco package for rendering") from e
    if os.environ.get("MUJOCO_GL", "") == "disable":
        raise RuntimeError("MUJOCO_GL=disable: rendering unavailable")


def launch_passive(model_path: str, streamer: StateStreamer, batch: Data, env_index: int = 0):
    """Open MuJoCo's passive viewer on env `env_index` of a batched Data,
    streaming state from device. Returns a context manager mirroring
    mujoco.viewer.launch_passive. Requires a display/GL stack."""
    _require_mujoco_gl()
    import mujoco
    import mujoco.viewer

    mj_model = mujoco.MjModel.from_xml_path(model_path)
    mj_data = mujoco.MjData(mj_model)
    qpos, qvel = streamer.fetch(batch)
    mj_data.qpos[:] = qpos[env_index]
    mj_data.qvel[:] = qvel[env_index]
    mujoco.mj_forward(mj_model, mj_data)
    return mujoco.viewer.launch_passive(mj_model, mj_data)


def render_trajectory(
    model_path: str,
    qpos_traj: np.ndarray,
    width: int = 320,
    height: int = 240,
    camera: Optional[str] = None,
) -> Iterator[np.ndarray]:
    """Render a (T, nq) qpos trajectory to RGB frames with MuJoCo's offscreen
    renderer (requires EGL/OSMesa; raises a clear error headless)."""
    _require_mujoco_gl()
    import mujoco

    mj_model = mujoco.MjModel.from_xml_path(model_path)
    try:
        renderer = mujoco.Renderer(mj_model, height, width)
    except Exception as e:  # pragma: no cover
        raise RuntimeError(
            "offscreen rendering unavailable (no EGL/OSMesa GL stack); "
            "use StateStreamer to export states and render elsewhere"
        ) from e
    mj_data = mujoco.MjData(mj_model)
    for qpos in np.asarray(qpos_traj):
        mj_data.qpos[:] = qpos
        mujoco.mj_forward(mj_model, mj_data)
        renderer.update_scene(mj_data, camera=camera) if camera else renderer.update_scene(mj_data)
        yield renderer.render()
