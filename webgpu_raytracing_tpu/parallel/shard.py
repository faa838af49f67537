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


def _buffer_specs() -> "FrameBuffers":
    """PartitionSpecs per buffer: current-frame state row-sharded,
    prev-frame snapshots replicated (reprojection + the quad predictor
    read arbitrary prev pixels — see FrameBuffers docstring)."""
    import dataclasses as _dc

    return FrameBuffers(
        **{
            f.name: P() if f.name.startswith("prev_") else P("rows")
            for f in _dc.fields(FrameBuffers)
        }
    )


def shard_buffers(buffers: FrameBuffers, mesh: Mesh) -> FrameBuffers:
    """Place frame buffers on the mesh: slabs sharded, prev replicated."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        buffers,
        _buffer_specs(),
    )


def rotate_prev_sharded(buffers: FrameBuffers, mesh: Mesh) -> FrameBuffers:
    """The updatePrev rotation (render.ts:1694-1699) under sharding: the
    row-sharded current buffers are all-gathered into the replicated prev
    slots — the one collective of the temporal path, paid only at the
    reprojection-rate cadence."""
    rep = NamedSharding(mesh, P())
    import dataclasses as _dc

    return _dc.replace(
        buffers,
        prev_image=jax.device_put(buffers.image, rep),
        prev_geo_position=jax.device_put(buffers.geo_position, rep),
        prev_geo_face=jax.device_put(buffers.geo_face, rep),
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
    if settings.geo_height != settings.render_height:
        raise ValueError(
            "geometry_buffer_scale != 1 is single-chip only (the G-buffer "
            "slab partition would be uneven across devices)"
        )
    if settings.render_height % n != 0:
        raise ValueError(
            f"render height {settings.render_height} must divide evenly "
            f"over {n} devices"
        )
    rows_per_device = settings.render_height // n

    def per_device(buffers, tables, env_data, inputs):
        row0 = jax.lax.axis_index("rows").astype(jnp.int32) * rows_per_device
        out, rays = render_tile(
            buffers, tables, env_data, inputs, row0, settings,
            rows_per_device,
        )
        return out, jax.lax.psum(rays, "rows")

    import dataclasses as _dc

    buf_spec = _buffer_specs()
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
    inputs_fn=None,
) -> Tuple[FrameBuffers, float]:
    """Convenience driver: run ``n_frames`` progressive frames sharded over
    the mesh; returns (final buffers, total rays traced).

    ``inputs_fn(k) -> FrameInputs`` overrides the default static-camera
    inputs (for jitter/frustum-driven reprojection runs). The updatePrev
    rotation follows the reference schedule (render.ts:1652-1657): every
    frame at reprojection_rate 0, else every rate-th frame."""
    mesh = mesh or make_mesh()
    fn = sharded_render_frame(mesh, settings)
    buffers = shard_buffers(
        FrameBuffers.create(
            settings.render_width, settings.render_height
        ),
        mesh,
    )
    tables = replicate(scene_tables, mesh)
    env = replicate(jnp.asarray(env_data), mesh)
    total_rays = 0.0
    frame_counter = 0
    for k in range(n_frames):
        if inputs_fn is not None:
            inputs = inputs_fn(k)
        else:
            inputs = FrameInputs.simple(
                jnp.eye(4, dtype=jnp.float32),
                (seed0 + k * 2654435761) % (2**32),
                k,
            )
        rate = settings.reprojection_rate
        update_prev = rate == 0 or frame_counter % rate == 0
        if rate:
            frame_counter = (frame_counter + 1) % rate
        inputs = replicate(inputs, mesh)
        buffers, rays = fn(buffers, tables, env, inputs)
        total_rays += float(rays)
        # prev state feeds the quad predictor too, not just reprojection
        if update_prev and (settings.reproject or settings.use_hit_predictor):
            buffers = rotate_prev_sharded(buffers, mesh)
    return buffers, total_rays
