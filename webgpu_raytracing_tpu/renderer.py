"""Render orchestration: progressive accumulation + per-frame step.

The reference's per-frame flow (render.ts:1651-1710) writes seed / counter
/ jitter uniforms, dispatches the megakernel over 16×16 workgroups, blits
with tonemapping, and rotates prev-frame buffers. Here:

* the accumulation image is an explicit ``(H, W, 4)`` array — rgb sum in
  ``[..., :3]`` and accumulated sample count in ``[..., 3]``, exactly the
  reference image-buffer layout (render.ts:124-140, 1506-1507) — threaded
  through a donated, jitted ``render_frame``;
* "clear on counter == 0" (render.ts:1454-1459) becomes a traced select;
* config changes retrace (static ``RenderSettings``), camera motion only
  feeds a new view matrix — mirroring the reference's
  recompile-vs-uniform-write split (§5 of SURVEY.md);
* the G-buffer (position / faceIdx / objectIdx per pixel,
  render.ts:142-158, 1470-1475) is produced for the temporal layer;
* the pixel dimension is the scaling axis: :func:`render_tile` renders any
  horizontal slab given its global row offset, so multi-chip sharding
  (``parallel/``) is the same code over a row-sharded mesh.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .camera import Camera
from .config import F32_MAX, BlitView, RenderSettings
from .models.scene import Scene, SceneTables
from .ops import rng
from .ops.integrator import face_point_offset, path_trace, trace_direct
from .ops.raygen import camera_rays
from .ops.tonemap import apply as tonemap_apply
from .ops.tonemap import gamma as tonemap_gamma


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FrameBuffers:
    """Persistent HBM-resident frame state (the reference's storage
    buffers, render.ts:122-159)."""

    image: jax.Array  # (H, W, 4) f32: rgb sum, sample count
    geo_position: jax.Array  # (H, W, 3) f32
    geo_face: jax.Array  # (H, W) i32
    geo_object: jax.Array  # (H, W) i32

    @staticmethod
    def create(width: int, height: int) -> "FrameBuffers":
        return FrameBuffers(
            image=jnp.zeros((height, width, 4), jnp.float32),
            geo_position=jnp.zeros((height, width, 3), jnp.float32),
            geo_face=jnp.zeros((height, width), jnp.int32),
            geo_object=jnp.zeros((height, width), jnp.int32),
        )


def _face_to_object(tables: SceneTables, face: jnp.ndarray) -> jnp.ndarray:
    """Map a global face index to its model (object) index via the model
    table — the reference stores objectIdx from traversal directly."""
    offsets = tables.model_face_offset  # (M,)
    f = jnp.maximum(face, 0)[..., None]
    return (
        jnp.sum((f >= offsets[None, :]).astype(jnp.int32), axis=-1) - 1
    ).astype(jnp.int32)


def render_tile(
    buffers: FrameBuffers,  # slab buffers: (h_tile, W, …)
    tables: SceneTables,
    env_data,
    view: jax.Array,  # (4, 4) f32
    seed: jax.Array,  # () uint32
    counter: jax.Array,  # () int32
    jitter: jax.Array,  # (2,) f32
    row0: jax.Array,  # () i32 global row offset of this slab
    settings: RenderSettings,
    tile_height: int,
) -> Tuple[FrameBuffers, jax.Array]:
    """One progressive frame over a horizontal slab of the image
    (megakernel main, render.ts:1434-1509). Returns (buffers, rays_traced).

    ``row0`` keeps pixel indices global so per-pixel RNG streams
    (``seed + idx``, render.ts:1453) are identical however the image is
    sharded across chips.
    """
    h, w = tile_height, settings.width
    r = h * w

    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.int32) + row0,
        jnp.arange(w, dtype=jnp.int32),
        indexing="ij",
    )
    idx = (xs + ys * w).reshape(r)  # imageIdx (render.ts:1258-1260)
    base_pos = (
        jnp.stack([xs, ys], axis=-1).reshape(r, 2).astype(jnp.float32)
        + jitter[None, :]
    )

    state = rng.seed_state(jnp.broadcast_to(seed, (r,)), idx)

    # clear on counter == 0 (render.ts:1454-1459)
    clear = (counter == 0) & (not settings.reproject)
    image = jnp.where(clear, jnp.zeros_like(buffers.image), buffers.image)

    color = jnp.zeros((r, 3), jnp.float32)
    samples = 0
    rays = jnp.zeros((), jnp.float32)

    integrator = trace_direct if settings.bounces_depth <= 1 else path_trace

    # primary sample (render.ts:1464-1468)
    o, d, state = camera_rays(base_pos, view, state, settings)
    t_max = jnp.full((r,), F32_MAX, jnp.float32)
    res = integrator(o, d, t_max, state, tables, env_data, settings)
    state = res.state
    color = color + res.color
    rays = rays + res.rays
    samples += 1

    # G-buffer write from the primary hit (render.ts:1470-1475)
    fh = res.first_hit
    face = jnp.maximum(fh.face, 0)
    tri = jnp.take(tables.tri, face, axis=0)
    shade = jnp.take(tables.shade_normal, face, axis=0)
    point = face_point_offset(tri, shade, fh.u, fh.v)
    geo_position = point.reshape(h, w, 3)
    geo_face = fh.face.reshape(h, w)
    geo_object = _face_to_object(tables, fh.face).reshape(h, w)

    # extra stratified-jittered samples (render.ts:1477-1495)
    for _ in range(settings.sample_count):
        t2, state = rng.random_2(state)
        pos = base_pos + rng.sample_insquare(t2) * 0.5
        o, d, state = camera_rays(pos, view, state, settings)
        res = integrator(o, d, t_max, state, tables, env_data, settings)
        state = res.state
        color = color + res.color
        rays = rays + res.rays
        samples += 1

    new_image = image + jnp.concatenate(
        [color, jnp.full((r, 1), float(samples), jnp.float32)], axis=-1
    ).reshape(h, w, 4)

    out = FrameBuffers(
        image=new_image,
        geo_position=geo_position,
        geo_face=geo_face,
        geo_object=geo_object,
    )
    return out, rays


@functools.partial(
    jax.jit,
    static_argnames=("settings",),
    donate_argnames=("buffers",),
)
def render_frame(
    buffers: FrameBuffers,
    tables: SceneTables,
    env_data,
    view: jax.Array,
    seed: jax.Array,
    counter: jax.Array,
    jitter: jax.Array,
    settings: RenderSettings,
) -> Tuple[FrameBuffers, jax.Array]:
    """Single-chip frame: the whole image is one tile."""
    return render_tile(
        buffers,
        tables,
        env_data,
        view,
        seed,
        counter,
        jitter,
        jnp.int32(0),
        settings,
        settings.height,
    )


@functools.partial(jax.jit, static_argnames=("settings",))
def blit(image: jax.Array, settings: RenderSettings) -> jax.Array:
    """Accumulation buffer → display color (blit fragment shader,
    render.ts:184-244): rgb / samples × exposure, gamma(1/γ), tonemap."""
    if settings.blit_view in (BlitView.NORMALS,):
        color = image[..., :3]
    else:
        denom = jnp.maximum(image[..., 3:4], 1e-20)
        color = image[..., :3] / denom
        if settings.blit_view == BlitView.IMAGE:
            color = color * settings.exposure
    color = tonemap_gamma(color, 1.0 / settings.gamma)
    color = tonemap_apply(color, settings.tonemapping)
    return jnp.clip(color, 0.0, 1.0)


class Renderer:
    """Host-side progressive renderer (the reference's store + renderFrame
    loop in one object). Owns the accumulation state and the
    reset-on-change policy (store.ts:192-344)."""

    def __init__(
        self,
        scene: Scene,
        settings: RenderSettings,
        env_data=None,
        camera: Optional[Camera] = None,
        base_seed: Optional[int] = None,
    ):
        self.scene = scene
        self.settings = settings
        self.tables = scene.tables()
        if env_data is None:
            env_data = jnp.zeros((1, 1, 3), jnp.float32)
        self.env_data = jnp.asarray(env_data)
        self.camera = camera or Camera()
        self.counter = 0
        self.buffers = FrameBuffers.create(settings.width, settings.height)
        self._rng = np.random.default_rng(base_seed)
        self.last_rays = 0.0  # rays traced in the last frame (metrics)

    # --- reset policy (resetCounter, store.ts:240-242) ---
    def reset(self) -> None:
        self.counter = 0

    def update_settings(self, **kw) -> None:
        """Setting changes retrace + reset accumulation, like the
        reference's reactive pipeline rebuild (gpu.ts:512-525)."""
        self.settings = self.settings.replace(**kw)
        if "width" in kw or "height" in kw:
            self.buffers = FrameBuffers.create(
                self.settings.width, self.settings.height
            )
        self.reset()

    def move_camera(self, d) -> None:
        if self.camera.move(np.asarray(d, dtype=np.float32)):
            self.reset()

    def rotate_camera(self, d) -> None:
        if self.camera.rotate(np.asarray(d, dtype=np.float32)):
            self.reset()

    def step(self, seed: Optional[int] = None) -> None:
        """renderFrame (render.ts:1651-1710), sans temporal layer."""
        if seed is None:
            seed = int(self._rng.integers(0, 2**32, dtype=np.uint64))
        jitter = (
            (self._rng.random(2).astype(np.float32) - 0.5)
            * self.settings.jitter_strength
        )
        self.buffers, rays = render_frame(
            self.buffers,
            self.tables,
            self.env_data,
            jnp.asarray(self.camera.view_matrix()),
            jnp.uint32(seed),
            jnp.int32(self.counter),
            jnp.asarray(jitter),
            self.settings,
        )
        self.last_rays = float(rays)
        self.counter += 1

    def render(self, spp: int) -> np.ndarray:
        """Accumulate until >= spp samples/pixel; return display image."""
        per_frame = 1 + self.settings.sample_count
        while self.counter * per_frame < spp:
            self.step()
        return self.image()

    def image(self) -> np.ndarray:
        """Display image, top row first. The reference's fullscreen blit
        maps buffer row 0 to the *bottom* of the canvas (uv (0,0) at clip
        (-1,-1), render.ts:163-183, 235-239), so the buffer is flipped
        here to match the on-screen orientation."""
        return np.asarray(blit(self.buffers.image, self.settings))[::-1]

    # --- checkpoint / resume of the progressive accumulation state ---
    def save_checkpoint(self, path: str) -> None:
        np.savez(
            path,
            image=np.asarray(self.buffers.image),
            geo_position=np.asarray(self.buffers.geo_position),
            geo_face=np.asarray(self.buffers.geo_face),
            geo_object=np.asarray(self.buffers.geo_object),
            counter=self.counter,
            cam_position=self.camera.position,
            cam_orientation=self.camera.orientation,
        )

    def load_checkpoint(self, path: str) -> None:
        z = np.load(path)
        self.buffers = FrameBuffers(
            image=jnp.asarray(z["image"]),
            geo_position=jnp.asarray(z["geo_position"]),
            geo_face=jnp.asarray(z["geo_face"]),
            geo_object=jnp.asarray(z["geo_object"]),
        )
        self.counter = int(z["counter"])
        self.camera.position = z["cam_position"]
        self.camera.orientation = z["cam_orientation"]
