"""Multi-chip scaling: shard the pixel dimension over a device mesh.

The reference is single-device (SURVEY.md §2.4); the renderer's natural
multi-chip axis is *pixels* — each chip owns a horizontal slab of the image
and the scene tables are replicated (path tracing is embarrassingly
parallel over pixels; the only cross-chip traffic is assembling the final
frame, which stays sharded here, plus a psum for the rays-traced metric).

Implementation: ``shard_map`` over a 1-D ``Mesh(('rows',))``; every chip
runs :func:`webgpu_raytracing_tpu.renderer.render_tile` on its slab with
its global row offset derived from ``jax.lax.axis_index`` — per-pixel RNG
streams stay globally indexed, so the sharded image is bit-identical to the
single-chip image.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RenderSettings
from ..models.scene import SceneTables
from ..renderer import FrameBuffers, FrameInputs, render_tile


def make_mesh(n_devices: Optional[int] = None, axis: str = "rows") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_buffers(buffers: FrameBuffers, mesh: Mesh) -> FrameBuffers:
    """Place frame buffers row-sharded on the mesh."""
    row_sharding = NamedSharding(mesh, P("rows"))
    return jax.tree.map(
        lambda x: jax.device_put(x, row_sharding), buffers
    )


def replicate(tree, mesh: Mesh):
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)


def sharded_render_frame(mesh: Mesh, settings: RenderSettings):
    """Build the jitted multi-chip frame function for ``settings``.

    Returns ``fn(buffers, tables, env, view, seed, counter, jitter) ->
    (buffers, rays)`` where buffers are row-sharded and everything else is
    replicated. ``rays`` is psum'd across chips (the one collective)."""
    n = mesh.devices.size
    if settings.height % n != 0:
        raise ValueError(
            f"height {settings.height} must divide evenly over {n} devices"
        )
    rows_per_device = settings.height // n

    def per_device(buffers, tables, env_data, inputs):
        row0 = jax.lax.axis_index("rows").astype(jnp.int32) * rows_per_device
        out, rays = render_tile(
            buffers, tables, env_data, inputs, row0, settings,
            rows_per_device,
        )
        return out, jax.lax.psum(rays, "rows")

    import dataclasses as _dc

    buf_spec = FrameBuffers(
        **{f.name: P("rows") for f in _dc.fields(FrameBuffers)}
    )
    inputs_spec = FrameInputs(
        **{f.name: P() for f in _dc.fields(FrameInputs)}
    )

    shmapped = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(
            buf_spec,
            jax.tree.map(lambda _: P(), _tables_struct()),
            P(),
            inputs_spec,
        ),
        out_specs=(buf_spec, P()),
        check_vma=False,
    )
    return jax.jit(shmapped, donate_argnums=(0,))


def _tables_struct():
    """A SceneTables-shaped pytree of placeholders for spec mapping."""
    import dataclasses

    fields = dataclasses.fields(SceneTables)
    return SceneTables(**{f.name: 0 for f in fields})


def render_sharded(
    scene_tables: SceneTables,
    env_data,
    settings: RenderSettings,
    n_frames: int,
    mesh: Optional[Mesh] = None,
    seed0: int = 1,
) -> Tuple[FrameBuffers, float]:
    """Convenience driver: run ``n_frames`` progressive frames sharded over
    the mesh; returns (final buffers, total rays traced)."""
    mesh = mesh or make_mesh()
    fn = sharded_render_frame(mesh, settings)
    buffers = shard_buffers(
        FrameBuffers.create(settings.width, settings.height), mesh
    )
    tables = replicate(scene_tables, mesh)
    env = replicate(jnp.asarray(env_data), mesh)
    total_rays = 0.0
    for k in range(n_frames):
        inputs = FrameInputs.simple(
            jnp.eye(4, dtype=jnp.float32),
            (seed0 + k * 2654435761) % (2**32),
            k,
        )
        inputs = replicate(inputs, mesh)
        buffers, rays = fn(buffers, tables, env, inputs)
        total_rays += float(rays)
    return buffers, total_rays
