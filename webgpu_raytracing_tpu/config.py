"""Render configuration.

The reference keeps all of this in a SolidJS reactive store
(``store.ts:46-102``) and delivers values to the GPU through two channels:

* baked into WGSL source as compile-time constants — changing one recompiles
  the pipeline (``gpu.ts:512-525``), and
* uniform buffers for cheap per-frame values (view matrices, seed, counter,
  jitter — ``render.ts:57-85``).

The TPU-native equivalent of that split is *static vs traced* ``jit``
arguments: :class:`RenderSettings` is a frozen, hashable dataclass passed as
a static argument (a change triggers an XLA retrace — the analog of a WGSL
pipeline recompile), while per-frame state (view matrix, RNG seed, counter,
jitter, accumulation buffers) flows through as traced arrays
(:mod:`webgpu_raytracing_tpu.renderer`).
"""

from __future__ import annotations

import dataclasses
import enum
import math


class ShadingType(enum.IntEnum):
    """store.ts:7-10."""

    FLAT = 0
    PHONG = 1


class ProjectionType(enum.IntEnum):
    """store.ts:12-17."""

    FISHEYE = 0
    PANINI = 1
    PERSPECTIVE = 2
    ORTHOGRAPHIC = 3


class FovOrientation(enum.IntEnum):
    """store.ts:19-23."""

    HORIZONTAL = 0
    VERTICAL = 1
    DIAGONAL = 2


class LensShape(enum.IntEnum):
    """store.ts:25-28."""

    CIRCLE = 0
    SQUARE = 1


class Tonemapping(enum.IntEnum):
    """store.ts:30-36."""

    REINHARD = 0
    FILMIC = 1
    ACES = 2
    LOTTES = 3
    NONE = 4


class BlitView(enum.Enum):
    """store.ts:38-44."""

    IMAGE = "image"
    PREV_IMAGE = "prevImage"
    DEPTH = "depth"
    PREV_DEPTH = "prevDepth"
    DEPTH_DELTA = "depthDelta"
    NORMALS = "normals"


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static (retrace-on-change) render settings.

    Field defaults mirror the reference store defaults (store.ts:46-102).
    Anything here is baked into the compiled kernel, exactly like the
    reference bakes these into WGSL source (e.g. ``maxBounces``
    render.ts:1166, projection switch render.ts:705-722).
    """

    # image
    width: int = 640
    height: int = 480

    # sampling (store.ts:54-58). Each frame traces 1 + sample_count camera
    # samples per pixel (render.ts:1464-1495).
    sample_count: int = 1
    bounces_depth: int = 4
    samples_per_point: int = 1
    # store.ts:57 ships this but no WGSL ever reads it — kept for store
    # parity, unused here too
    samples_per_bounce: int = 1

    # camera model (store.ts:59-71). Baked constants in the reference
    # megakernel (render.ts:642-651).
    fov: float = math.pi * 2 / 3
    fov_orientation: FovOrientation = FovOrientation.HORIZONTAL
    focus_distance: float = 4.0
    circle_of_confusion: float = 0.0
    panini_distance: float = 1.0
    vertical_compression: float = 0.0
    projection_type: ProjectionType = ProjectionType.PANINI
    lens_shape: LensShape = LensShape.CIRCLE

    # shading / display
    shading_type: ShadingType = ShadingType.PHONG
    tonemapping: Tonemapping = Tonemapping.NONE
    exposure: float = 2.0
    gamma: float = 1.0
    ambience: float = 0.1
    blit_view: BlitView = BlitView.IMAGE

    # temporal reprojection (store.ts:73-77)
    reprojection_rate: int = 0
    jitter_strength: float = 0.0
    bilateral_filter: bool = False

    # debug (store.ts:87-90)
    debug_bvh: bool = False
    debug_reprojection: bool = False

    # --- extensions beyond the reference ---
    # Quad hit-distance predictor (pixelHitDist, render.ts:1121-1141).
    # Always on in the reference; exposed as a flag for ablation.
    use_hit_predictor: bool = True
    # Traversal backend: "auto" = Pallas tile kernel on TPU / XLA
    # clustered elsewhere; "pallas" (ops/cluster_pallas.py, the TPU
    # production path); "clustered" = XLA dense cluster tracing
    # (ops/cluster_trace.py); "threaded" = stackless skip-link walk
    # (ops/traverse.py, gather-bound oracle); "pallas_interpret" = the
    # REAL kernel under the Pallas interpreter on any backend (slow;
    # lets tests drive the production kernel end-to-end without a TPU).
    traversal: str = "auto"
    # Ray-tile size for clustered tracing (coherent pixel groups).
    trace_tile: int = 256
    # Ray tiles folded into one Pallas grid step (single-level kernel):
    # amortizes the fixed per-step cost (~6 us/step measured: prologue +
    # block DMA turnaround) over several tiles; results are bit-identical
    # for any value. Default 4 halves-to-quarters that cost for a modest
    # compile-size increase.
    tiles_per_step: int = 4
    # Sort bounce/shadow rays by nearest hit cluster before tracing
    # (ops/ray_sort.py): collapses tile cluster-unions ~4x on incoherent
    # segments and compacts dead lanes to the back (the wavefront-
    # compaction analog, BASELINE config #5). Camera rays are never
    # sorted (already coherent).
    sort_bounce_rays: bool = True
    # Next-event estimation. The reference ships the NEE chain
    # (``pointColor``/``sampleLights`` render.ts:1143-1157, 849-869) but
    # never calls it from the megakernel main; default off for parity.
    next_event_estimation: bool = False
    # Environment source: "equirect" (reference scene.ts:348-368),
    # "cubemap" (new capability, BASELINE config #2), or "procedural"
    # (fallback when no environment asset is present).
    environment: str = "procedural"
    # Luminance importance sampling of the equirect environment with MIS
    # (new capability, BASELINE config #3). Requires environment="equirect"
    # and env_data passed as an EnvDistribution.
    env_importance_sampling: bool = False

    @property
    def reproject(self) -> bool:
        """const _reproject (render.ts:1406)."""
        return self.reprojection_rate > 0

    def replace(self, **kw) -> "RenderSettings":
        return dataclasses.replace(self, **kw)


# WGSL shader constants (shaders/constants.ts:1-15).
PHI = 1.61803398874989484820459
SRT = 1.41421356237309504880169
PI = 3.14159265358979323846264
E = 2.71828182845904523536028
TWO_PI = 6.28318530717958647692528
INV_PI = 0.31830988618379067153776
EPSILON = 0.001
F32_MIN = 2.0**-126
F32_MAX = 3.4028234663852886e38
MIN_DIST = 0.0
MAX_DIST = F32_MAX
