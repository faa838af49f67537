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
    # Render-resolution scale (store.ts:76, UI.tsx:184): the reference
    # scales the canvas backing store (render.ts:109-113) so the whole
    # pipeline renders at width*scale x height*scale and the fullscreen
    # blit stretches to the display size; here the accumulation/G-buffers
    # are allocated at the scaled size and blit() bilinear-upscales.
    resolution_scale: float = 1.0
    # G-buffer allocation multiplier (store.ts:77, render.ts:141-144).
    # In the reference this scales only the geometry BUFFER SIZE while
    # the kernel indexes it with the full-resolution imageIdx: > 1 pads
    # the allocation with rows that are never read; < 1 under-allocates,
    # and WebGPU robust buffer access turns the out-of-range accesses
    # into dropped writes / zero reads. Mirrored here: the G-buffer gets
    # round(scale x render_height) rows; rows beyond it behave as
    # "no data" (face -1 / position 0) for the predictor and
    # reprojection, exactly the robust-access result.
    geometry_buffer_scale: float = 1.0
    # BVH build knobs (store.ts:82-85, defaults 16/2). STORE PARITY
    # ONLY: the reference code consuming them is commented out
    # (bv.ts:121-129) — its build always splits to <= 2-face leaves
    # regardless, and so does models/bvh.py. Carried so a store.ts user
    # finds every field; changing them changes nothing, exactly like
    # the reference.
    bvh_max_depth: int = 16
    bvh_leaf_soft_max_size: int = 2

    @property
    def render_width(self) -> int:
        return max(1, round(self.width * self.resolution_scale))

    @property
    def render_height(self) -> int:
        return max(1, round(self.height * self.resolution_scale))

    @property
    def geo_height(self) -> int:
        """Allocated G-buffer rows (render.ts:144; capped at the render
        height — extra allocation is never read, matching the
        reference's unused padding)."""
        return max(
            1,
            min(
                round(self.render_height * self.geometry_buffer_scale),
                self.render_height,
            ),
        )

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
    # Always on in the reference (a SIMT optimization: quad-shared prev
    # hits bound the primary ray's t_max); image-neutral by construction
    # (it only prunes beyond the known closest hit). On TPU the prev-quad
    # re-test pass costs more than the t_max prune saves — frame A/B at
    # 1080p: off 926 ms vs on 967 ms (tools/frame_profile.py, r3) — so
    # the default is OFF; the feature stays for reference-semantics runs.
    use_hit_predictor: bool = False
    # Traversal backend: "auto" = Pallas tile kernel on TPU / XLA
    # clustered elsewhere; "pallas" (ops/cluster_pallas.py, the TPU
    # production path); "clustered" = XLA dense cluster tracing
    # (ops/cluster_trace.py); "threaded" = stackless skip-link walk
    # (ops/traverse.py, gather-bound oracle); "pallas_interpret" = the
    # REAL kernel under the Pallas interpreter on any backend (slow;
    # lets tests drive the production kernel end-to-end without a TPU).
    traversal: str = "auto"
    # Ray-tile size for clustered tracing (coherent pixel groups).
    # r3 on-chip sweep (tools/sweep_r3.py, 1080p frames): 128 edges 256
    # by ~2-4% at every tiles_per_step; round-epilogue work scales with
    # tile x rounds and the CPU round-sim predicted exactly this.
    trace_tile: int = 128
    # Ray tiles folded into one Pallas grid step (single-level kernel):
    # amortizes the fixed per-step cost (~6 us/step measured: prologue +
    # block DMA turnaround) over several tiles; results are bit-identical
    # for any value. r3 sweep: tps8 best at tile=128 (within ~1% of tps4).
    tiles_per_step: int = 8
    # Exact top-2 re-adjudication of the Pallas kernel's winners
    # (ops/cluster_pallas.py adjudicate_candidates): the kernel carries
    # its two nearest margin-accepted candidates + nearest robust
    # candidate out, and an exact f32 Möller–Trumbore re-test picks the
    # true winner. OFF by default since round 3: pairs-mode rounds cost
    # ~2x (a 4th |a|@|b| matmul pass + margin gates + two extra
    # min-reduces per round; on-chip frame ablation 4.09 vs 6.00
    # Mrays/s), and the parity failure it was built to fix (r2 RMSE
    # 0.051 at 4 spp) turned out to be the SOURCE-FACE-DUPLICATE
    # impostor, now excluded in-kernel (ClusterTables.partner_code):
    # with the exclusion, the plain bf16x3 kernel is bit-identical to
    # the exact-f32 WGSL simulator on the whole 48x48@4spp golden
    # (test_reference_parity.py::test_golden_vs_real_kernel), residual
    # bf16 knife-edge flips being ~1e-5/ray events. Keep available for
    # exactness-critical callers.
    exact_pairs: bool = False
    # bf16 passes per in-kernel Möller–Trumbore matmul (ops/
    # cluster_pallas._mm): 2 = FOLDED hi/lo (pre-split bf16 B table,
    # ClusterTables.mat_b2 — two MXU issues compute the same three
    # hi/lo cross terms as 3-pass, ~2^-16 relative, the cross pair
    # accumulated in one f32 dot); 3 = classic hi/lo split; 6 = full
    # 3×3-way split (~2^-24). Round cost is MXU-issue-latency-bound at
    # these shapes, so folding is a direct serial cut: on-chip sorted
    # bounce trace 280.8 -> 237.2 ms (-15.5%), primary -6.5%
    # (tools/gang_bench.py, r3). Precision headroom is measured, not
    # assumed: 6-pass changes NOT ONE pixel vs 3-pass at 48²·4spp (the
    # residual TPU-vs-CPU divergence is XLA:TPU frame-math lowering,
    # not kernel matmul precision), and interpret-mode decisions of 2-
    # vs 3-pass agree everywhere tested.
    mm_passes: int = 2
    # Extend exact top-2 adjudication to BOUNCE segments too (only
    # meaningful with exact_pairs=True; primary-only is the cheaper
    # middle setting measured at 5.36 Mrays/s vs 4.09 for all-segments).
    exact_pairs_bounce: bool = False
    # Approximate-reciprocal round picks in the Pallas kernel (the per-
    # round (T, S) division is a VPU hot spot). Winner t/u/v stay exact;
    # with exact_pairs near-tie ordering flips are re-adjudicated
    # exactly — but the approximate t also feeds the tile t-prune BOUND
    # and the candidate ranking, and measured full-frame parity loss is
    # severe (48x48@4spp RMSE 1.56 vs 0.005). The r3 sweep gain was
    # +0.4% (noise) — stays off.
    approx_div: bool = False
    # Miss-tail gang rounds (ops/cluster_pallas.py): the heaviest
    # 1/trace_gang_frac of ray tiles by shortlist-union size run
    # gang-of-K cluster rounds (one K-wide matmul + one epilogue per
    # round) — the p99 ≈ 200-round miss-heavy tiles carry ~half of all
    # kernel rounds and their prune bound rarely fires, so ganging cuts
    # their serial round count ~K× at near-constant total work. 0
    # disables (single-cluster rounds everywhere). r3 on-chip
    # (tools/gang_bench.py): gang=4 cuts the sorted bounce trace 19%
    # (355 -> 289 ms at 2.07M rays) and the primary trace 12%. With the
    # folded 2-pass matmul the ganged round is relatively cheaper and
    # the retune moved the optimum: gang=8 205 -> 149 ms on the same
    # bounce sets (-27% vs gang=4, 13.9 Mrays/s microbench); widening
    # the ganged fraction to 1/4 is within noise (148.6).
    trace_gang: int = 8
    # 0 = gang every tile. r4 frame A/B: with lockstep ON, gang-all
    # (union-sorted, gang capped to 2 inside the lockstep VMEM budget)
    # is the best measured arm — 882.6 ms vs 912.9 default / 919.0
    # heavy-only lockstep (tools/frame_profile.py lock_gangall) — so
    # frac=0 + lockstep are the r4 defaults. Without lockstep, gang-all
    # LOSES (1004-1060 ms): keep frac=8 if lockstep_tiles is disabled.
    trace_gang_frac: int = 0
    # Software-pipelined kernel rounds (ops/cluster_pallas.py): the
    # round loop issues round k+1's cluster matmul (MXU) before applying
    # round k's epilogue (VPU), hoping Mosaic overlaps the two units.
    # Bit-identical (the speculative pick uses a one-epilogue-stale
    # t-prune bound — conservative, so extras lose the min merge;
    # tests/test_cluster.py). Default OFF: the on-chip frame A/B
    # measured it 10% SLOWER (988.5 vs 894.6 ms at 1080p defaults,
    # tools/frame_profile.py default/nopipe r4) — Mosaic does not
    # overlap across while_loop iterations, so the speculative last
    # matmul per tile and the stale-bound extra gang picks are pure
    # cost. Kept as an option with the measurement, so it isn't
    # re-invented.
    pipeline_rounds: bool = False
    # Lockstep tile batching (ops/cluster_pallas._kernel_lockstep): the
    # tiles_per_step tiles of one grid step run ONE fused round loop —
    # each round drains every pending tile's nearest shortlist cluster,
    # issues tiles_per_step data-independent matmuls (ILP across tiles,
    # where consecutive serial rounds are latency-chained through the
    # epilogue), and applies one wide epilogue. Bit-identical per tile
    # (own shortlist order, own prune bound, finished tiles reverted);
    # serial rounds per grid step drop from sum to max. The r4 frame
    # profile (ROADMAP) put kernel rounds at ~80% of a sorted trace leg
    # with rounds serial-latency-bound — this is the round-count lever.
    # r4 default ON, paired with trace_gang_frac=0 (the measured-best
    # frame arm, see trace_gang_frac above). Bit-identical per tile
    # (tests/test_cluster.py test_pallas_lockstep_bit_identical).
    lockstep_tiles: bool = True
    # Big-frame slab decomposition (renderer.render_frame_slabs): render
    # the frame as this many horizontal slabs, one jitted render_tile
    # call each, so wavefront temporaries scale with the slab. A 4K
    # frame in one jit needs ~45 GB HBM (measured OOM on the 1M-tri
    # stress scene); 8 slabs fit. Bit-identical to the single-tile frame
    # (global row0 pixel indexing — the multi-chip slab contract).
    # Requires geometry_buffer_scale == 1 when > 1.
    frame_slabs: int = 1
    # Schedule-fed round loop (ops/cluster_pallas._kernel_sched),
    # closest-hit non-pairs legs only: the per-tile near-ordered cluster
    # schedule is sorted in XLA (one (n_tiles, Cp) row-sort of the same
    # packed keys the kernel otherwise drains round-by-round) and read
    # as SMEM scalars; rounds run in blocks of this many clusters (one
    # wide matmul + one epilogue + one bound refresh per block). Kills
    # the in-kernel drain and the per-round vector→scalar extraction,
    # which the r4 WRT_ABLATE attribution put at roughly half the
    # serial round cost (mmonly 191 vs full 236 ms at fixed rounds,
    # with gates 46 ms and div/mul/select/pack ≈ 0 — ROADMAP r4).
    # 0 disables (the drain-based kernels above).
    trace_sched: int = 0
    # Capped-rounds + recompaction multipass (ops/ray_sort.py
    # sorted_trace_multipass): sorted closest-hit legs run at most this
    # many lockstep rounds per tile, then surviving rays regroup by
    # their next NEEDED cluster (exact per-ray skip mask from the
    # kernel's exported stop key) and trace again; the last of
    # multipass_passes passes is uncapped. Attacks the tile-consensus
    # waste (work/ray 12.0 vs per-ray need ~1.3 at T=128) that no
    # round-scheduling scheme could shift — the exact CPU study
    # (tools/multipass_sim.py) halves epilogue work at cap=4 with
    # serial-round parity. Bit-identical to single-pass (tests).
    # 0 disables. Requires lockstep_tiles + trace_gang_frac=0 (the
    # production defaults); other configs fall back to single-pass.
    multipass_cap: int = 0
    multipass_passes: int = 2
    # Binned per-ray scheduling for sorted closest-hit legs
    # (ops/ray_sort.binned_trace + cluster_pallas.trace_binned_pass):
    # pass 1 executes exactly the distinct NEAREST-cluster ids of each
    # 128-ray block of the cid1-major-sorted stream (~1.02
    # cluster-units/block vs the drain kernels' ~12 — the r5 ceiling
    # ledger's 9x tile-consensus waste), with no tile-near pass and no
    # drain machinery; survivors (per-ray exact test: second-nearest
    # entry could beat the carried best) run the compacted drain pass
    # with the multipass t_start skip mask. Bit-identical to the
    # single-pass sorted trace at gang<=1 (tests). Closest-hit bounce
    # segments only; pairs/exact segments keep the drain path.
    binned_sort: bool = False
    # Binned scheduling for sorted ANY-HIT (shadow) legs
    # (ops/ray_sort.binned_trace_any), independent of binned_sort.
    # Default OFF: an early r5 session measured it -31%/-22% on
    # env/light legs, but that was the compile-inflation artifact
    # (arms timed right after long remote compiles run slow on this
    # tunnel — ROADMAP r5); the cache-warm 12-rep A/B in one process
    # has the drain legs WINNING: env 116 vs 145 ms, light 106 vs 118
    # at 2.07M rays. Blocked-set-identical to the drain leg (tests);
    # kept as the measured record and for scenes where pass-1
    # resolution dominates.
    binned_any_sort: bool = False
    # Dead-lane slicing of sorted bounce legs (ops/ray_sort.sorted_trace
    # live_slice): rays with no entered cluster — RR kills, prior
    # misses, lines that exit the scene — key to the back of the ray
    # sort, where the kernel proves them misses at full fixed cost.
    # Later segments are mostly such lanes (measured on the default
    # frame: 62% live at bounce segment 1, 31% at segment 2) yet each
    # leg paid full-width tile-nears + per-tile kernel setup. The trace
    # runs on a static live prefix (3/4 at seg 1, 1/2 at seg 2+, a
    # lax.cond full-width fallback guards overflow — exact either way);
    # the keyless tail IS its own answer (t_max, miss).
    live_slice: bool = True
    # Env-NEE depth limit (config #3, ops/integrator.py): 0 = every path
    # vertex next-event-samples the environment (the full-MIS default);
    # K > 0 = only the first K vertices do, deeper vertices keep BSDF
    # sampling with MIS weight 1 (unbiased — each vertex's strategy mix
    # is independent). Each env-NEE vertex costs one UNBOUNDED any-hit
    # leg (the environment has no shadow distance), the measured 2.8x
    # config-#3 frame cost (ROADMAP r4); the variance reduction it buys
    # concentrates at the first vertices where throughput is largest.
    env_nee_depth: int = 0
    # Sort bounce/shadow rays by nearest hit cluster before tracing
    # (ops/ray_sort.py): collapses tile cluster-unions ~4x on incoherent
    # segments and compacts dead lanes to the back (the wavefront-
    # compaction analog, BASELINE config #5). Camera rays are never
    # sorted (already coherent).
    sort_bounce_rays: bool = True
    # Chain the sort across the whole path segment (ops/integrator.py):
    # instead of sort -> trace -> unsort around each traversal, the FULL
    # per-lane wavefront state (ray, RNG, throughput, color, env carry)
    # is permuted once per segment and every downstream op — traversal,
    # adjudication, shading, NEE shadow rays — runs in sorted order;
    # original order is restored by ONE final scatter per trace. Per-lane
    # HBM row ops are the sort leg's dominant cost, so this removes one
    # (R, L) scatter per bounce segment (and the shadow legs' separate
    # key/sort/gather/scatter when NEE or env-IS are on) at the price of
    # a slightly wider per-segment gather — bit-identical results (per-
    # ray math is lane-order-independent; tests/test_cluster.py).
    # Default OFF since r3: the on-chip frame A/B measured it 4-6%
    # SLOWER at every pairs setting (5.41 vs 5.71 Mrays/s at the r3
    # defaults) — the row-op arithmetic that motivated it undercounted
    # the cost of the wider per-segment gather. Kept as an option (it
    # wins when NEE/env-IS add shadow legs per segment).
    chained_sort: bool = False
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
