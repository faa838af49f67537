"""Pallas TPU kernel for clustered tracing.

The XLA-level clustered tracer (ops/cluster_trace.py) pays per round for a
cluster-matrix gather from HBM, a materialized (R, 4S) matmul output, and
a dispatch. This kernel removes all three: the whole cluster table lives
in VMEM (bundled scene: ~10 MB), each grid step owns one ray tile, and the
near-ordered cluster rounds run as an in-kernel ``while`` — each round is
one ``(T, 16) @ (16, 4S)`` MXU matmul plus a VPU epilogue, entirely
on-chip. Each tile runs exactly its own number of rounds (no cross-tile
max), the per-tile cluster shortlist (box tests) is also computed
in-kernel in ray chunks, and the only HBM traffic is streaming ray blocks
in and per-ray hit records out.

Layout notes:
* the ray matrix is padded to 16 columns [o | w=o×d | d | 1 | inv_d | t_max
  | pad] so one streamed block carries everything;
* mat_b is (C, 16, 4S) f32 — dynamic indexing on the *leading* dim of a
  VMEM ref is the supported Mosaic pattern;
* boxes are stored transposed (8, C) so slab tests broadcast along lanes;
* per-tile state vectors are (1, C)/(1, T) rows updated with masked
  ``where`` (no dynamic-lane scatters);
* the matmul is a hand-rolled 3-pass bf16 hi/lo split (≈ f32 accuracy;
  Mosaic lacks Precision.HIGH and HIGHEST's 6 passes cost 2.5×; plain
  1-pass bf16 flips ~17% of face decisions and is unusable). Sentinel
  columns (t_max = 3.4e38) are masked before the cast — bf16(3.4e38)=inf.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import EPSILON, F32_MAX, MIN_DIST
from .cluster_trace import ClusterTables
from .intersect import safe_inv_dir
from .traverse import Hit

_EPS2 = EPSILON * EPSILON
_INF = float(F32_MAX)
_NEAR_CHUNK = 128  # rays per in-kernel box-test chunk (bounds VMEM temps)



def _round_pick(
    out, best_key, best_code, cid, *, n_s, iota_s, sl_mask, approx_div
):
    """Shared per-round epilogue of both kernels: validity gates, the
    (approx-)reciprocal t, and the packed (t | slot) min-pick that
    updates the per-ray best key/code. Keeping this in one place keeps
    the single- and two-level kernels' epilogues provably identical.

    Note the packed compare narrows acceptance by one truncation bucket
    at the t_max boundary: a hit whose t falls in the same 2^-sl_bits
    bucket as t_max (init best) reports as a miss — for shadow rays an
    occluder within ~2^-16 relative of the light's own distance, for
    predictor-bounded rays far inside the 1.05x margin. Both are
    knife-edge cases the exact compare resolved arbitrarily anyway."""
    det = out[:, 0 * n_s : 1 * n_s]
    t_num = out[:, 1 * n_s : 2 * n_s]
    u_num = out[:, 2 * n_s : 3 * n_s]
    v_num = out[:, 3 * n_s : 4 * n_s]

    valid = (
        (det >= _EPS2)
        & (u_num >= 0.0)
        & (u_num <= det)
        & (v_num >= 0.0)
        & (u_num + v_num <= det)
    )
    # the (T, S) division is a per-round VPU cost; with approx_div the
    # pick runs on a fast approximate reciprocal (~2^-12 relative) —
    # output t/u/v stay exact (re-derived per winner in rederive_uv),
    # only near-tie (<~2.4e-4 relative) winner decisions can flip
    det_safe = jnp.where(valid, det, 1.0)
    if approx_div:
        inv_det = pl.reciprocal(det_safe, approx=True)
    else:
        inv_det = 1.0 / det_safe
    t = t_num * inv_det

    # pack (t, slot) into one sortable key; a single min-reduce yields
    # the round winner's t and slot (vs best, carried in the same
    # packed form — no elementwise t<best prefilter needed)
    t_masked = jnp.where(valid & (t > MIN_DIST), t, _INF)
    tkey = (
        jax.lax.bitcast_convert_type(t_masked, jnp.int32) & ~sl_mask
    ) | iota_s
    cand = jnp.min(tkey, axis=1)  # (T,)

    improved = cand < best_key[0]
    best_key = jnp.where(improved, cand, best_key[0])[None, :]
    # defer u/v/face: rounds only carry the winner's (cid, slot);
    # the wrapper re-derives u/v once per ray
    best_code = jnp.where(
        improved, cid * n_s + (cand & sl_mask), best_code[0]
    )[None, :]
    return best_key, best_code


def _kernel(
    a_ref,  # (G, T, 16) ray blocks: [o, w, d, 1, inv_d, t_max, pad, pad]
    near_ref,  # (G, 1, C) tile nears (XLA) — or (1, 8, C) transposed
    #           cluster boxes when in_near=True (nears computed in-kernel)
    matb_ref,  # (C, 16, 4S) cluster matrices (VMEM, or HBM when hbm=True)
    out_t_ref,  # (G, 1, T)
    out_code_ref,  # (G, 1, T) int32: winning cid * S + slot (-1 = miss)
    *scratch,  # hbm=True: (b_scratch VMEM (2, 16, 4S), dma_sems (2,))
    n_s: int,
    cid_bits: int,
    any_hit: bool = False,
    hbm: bool = False,
    in_near: bool = False,
    approx_div: bool = False,
):
    # Each grid step owns `G` ray tiles, processed back-to-back by the same
    # per-tile round loop — G > 1 amortizes the fixed per-grid-step cost
    # (prologue + block DMA turnaround, ~6 µs) over G tiles.
    for g in range(a_ref.shape[0]):
        _kernel_one_tile(
            a_ref, near_ref, matb_ref, out_t_ref, out_code_ref, scratch,
            g=g, n_s=n_s, cid_bits=cid_bits, any_hit=any_hit, hbm=hbm,
            in_near=in_near, approx_div=approx_div,
        )


def _kernel_one_tile(
    a_ref, near_ref, matb_ref, out_t_ref, out_code_ref, scratch,
    *,
    g: int,
    n_s: int,
    cid_bits: int,
    any_hit: bool,
    hbm: bool,
    in_near: bool,
    approx_div: bool,
):
    a = a_ref[g]  # (T, 16)
    t_dim = a.shape[0]
    # bf16 hi/lo split for 3-pass f32-accurate matmuls (Mosaic has no
    # Precision.HIGH; HIGHEST is 6 passes — the dropped lo*lo term is
    # ~2^-32 relative, far below intersection decision noise).
    # Columns >= 10 carry inv_d/t_max (t_max can be 3.4e38 → inf in bf16;
    # inf × 0-rows of B = NaN), so they are zeroed for the matmul operand.
    col = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    a_mm = jnp.where(col < 10, a, 0.0)
    a_hi = a_mm.astype(jnp.bfloat16)
    a_lo = (a_mm - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    t_max = a[:, 13]  # (T,)
    if in_near:
        # the per-tile near vector computed HERE from VMEM-resident boxes
        # (replaces the XLA tile-nears pass and its HBM round-trip; the
        # same per-axis slab accumulation as cluster_trace._boxes_near)
        bx = near_ref[0]  # (8, C): rows 0:3 bmin.xyz, 3:6 bmax.xyz
        c_dim = bx.shape[1]
        o_col = a[:, 0:3]
        inv_d = a[:, 10:13]
        near = jnp.full((t_dim, c_dim), -_INF, jnp.float32)
        far = jnp.full((t_dim, c_dim), _INF, jnp.float32)
        for ax in range(3):
            t0 = (bx[ax : ax + 1, :] - o_col[:, ax : ax + 1]) * inv_d[
                :, ax : ax + 1
            ]
            t1 = (bx[3 + ax : 4 + ax, :] - o_col[:, ax : ax + 1]) * inv_d[
                :, ax : ax + 1
            ]
            near = jnp.maximum(near, jnp.minimum(t0, t1))
            far = jnp.minimum(far, jnp.maximum(t0, t1))
        hit = (near < far) & (near < t_max[:, None]) & (far > MIN_DIST)
        nears = jnp.where(hit, jnp.maximum(near, 0.0), _INF)
        near0 = jnp.min(nears, axis=0, keepdims=True)  # (1, C)
    else:
        near0 = near_ref[g]  # (1, C)
        c_dim = near0.shape[1]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, c_dim), 1)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (t_dim, n_s), 1)

    # The per-round pick is the serial-latency hot spot: rounds are chained
    # through it, and each cross-lane reduction costs ~0.1-0.2 µs. So
    # (near, cid) is packed into ONE sortable int32 key — the bitcast of a
    # non-negative f32 is order-preserving, and the low `cid_bits` mantissa
    # bits are stolen for the cluster id (near keeps >= 9 mantissa bits of
    # ordering precision; ordering is a heuristic, exactness never depends
    # on it). One jnp.min per round replaces pick+mark+cond reductions,
    # and the NEXT round's pick is carried through the loop state so the
    # cond is a scalar compare.
    mask = (1 << cid_bits) - 1
    keys0 = (
        jax.lax.bitcast_convert_type(near0, jnp.int32) & ~mask
    ) | iota_c  # (1, C)
    k0 = jnp.min(keys0)
    # miss/pad sentinel (near == F32_MAX), truncated like every key
    # (host-computed: Mosaic has no scalar bitcast)
    import numpy as _np

    done_th = int(_np.float32(_INF).view(_np.int32)) & ~mask

    # The per-ray best is ALSO a packed int32 key: bitcast(t) with the low
    # `sl_bits` mantissa bits stolen for the winning face slot. One min
    # per round then yields winner-t AND slot together, replacing the
    # equality-probe + where + second reduction of an argmin (and the
    # elementwise t<best prefilter) — the round epilogue is the serial
    # hot spot. Cost: t is truncated DOWN by <= 2^-16 relative (far below
    # f32 intersection noise; u/v/t are re-derived exactly from the face),
    # and acceptance narrows by one truncation bucket at the t_max
    # boundary (see _round_pick's docstring).
    sl_bits = max(1, (n_s - 1).bit_length())
    sl_mask = (1 << sl_bits) - 1

    # Tile t-pruning bound: rounds run in near order, and a triangle inside
    # a cluster box can't hit closer than the box entry distance, so the
    # tile stops as soon as the nearest unprocessed cluster's entry can't
    # beat any ray's current best (closest) / reach any pending ray's t_max
    # (any-hit: a ray is done at its FIRST valid hit). Comparison happens
    # in int-key space — bitcast of a non-negative f32 is order-preserving.
    # The key's stolen mantissa LSBs truncate the cluster's near DOWN, and
    # the bound is rounded UP (`| sl_mask` restores the best key's
    # truncated LSBs to an upper bound of the true t first), so the prune
    # is strictly conservative (never skips a cluster that could still
    # win); `done_th` caps the bound so miss/pad keys always fail.
    if any_hit:
        def _bound(best_key, best_code):
            pending = jnp.where(best_code < 0, t_max[None, :], 0.0)
            b = jnp.max(jax.lax.bitcast_convert_type(pending, jnp.int32))
            return jnp.minimum((b + mask) & ~mask, done_th)
    else:
        def _bound(best_key, best_code):
            b = jnp.max(best_key) | sl_mask
            return jnp.minimum((b + mask) & ~mask, done_th)

    if hbm:
        b_scratch, dma_sem = scratch  # (2, 16, 4S) VMEM, DMA sems (2,)

        def _dma(slot, cid):
            return pltpu.make_async_copy(
                matb_ref.at[cid], b_scratch.at[slot], dma_sem.at[slot]
            )

    def cond(state):
        if hbm:
            return state[6]  # cur_valid: a fetched block awaits processing
        keys, k_cur, best_key, best_code, bound = state
        return (k_cur & ~mask) < bound

    def body(state):
        if hbm:
            keys, k_cur, best_key, best_code, bound, slot, _valid = state
            cid = k_cur & mask
            # the block for `cid` was prefetched into `slot` last round;
            # pick + prefetch the NEXT block while this round's matmul
            # runs (double buffering). The prune bound is the PREVIOUS
            # round's (this round's update lands below) — conservative:
            # at most one extra block is fetched and processed.
            _dma(slot, cid).wait()
            keys = jnp.where(keys == k_cur, jnp.int32(0x7FFFFFFF), keys)
            k_nxt = jnp.min(keys)
            nxt_valid = (k_nxt & ~mask) < bound

            @pl.when(nxt_valid)
            def _():
                _dma(1 - slot, k_nxt & mask).start()

            b = b_scratch[slot]
        else:
            keys, k_cur, best_key, best_code, bound = state
            cid = k_cur & mask
            b = matb_ref[cid]  # (16, 4S)
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = (
            jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
            + jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
            + jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
        )
        best_key, best_code = _round_pick(
            out, best_key, best_code, cid,
            n_s=n_s, iota_s=iota_s, sl_mask=sl_mask, approx_div=approx_div,
        )
        bound = _bound(best_key, best_code)
        if hbm:
            return keys, k_nxt, best_key, best_code, bound, 1 - slot, nxt_valid
        keys = jnp.where(keys == k_cur, jnp.int32(0x7FFFFFFF), keys)
        return keys, jnp.min(keys), best_key, best_code, bound

    best_key0 = (
        jax.lax.bitcast_convert_type(t_max[None, :], jnp.int32) & ~sl_mask
    )
    code0 = jnp.full((1, t_dim), -1, jnp.int32)
    bound0 = _bound(best_key0, code0)
    base_init = (keys0, k0, best_key0, code0, bound0)
    if hbm:
        # warm-up: prefetch the first block (when any work exists)
        valid0 = (k0 & ~mask) < bound0

        @pl.when(valid0)
        def _():
            _dma(0, k0 & mask).start()

        out = jax.lax.while_loop(cond, body, base_init + (0, valid0))
        best_key, best_code = out[2], out[3]
    else:
        _, _, best_key, best_code, _ = jax.lax.while_loop(
            cond, body, base_init
        )
    # unpack: winners get t truncated to the key granularity; untouched
    # lanes report their exact t_max (miss sentinel semantics preserved)
    out_t_ref[g] = jnp.where(
        best_code >= 0,
        jax.lax.bitcast_convert_type(best_key & ~sl_mask, jnp.float32),
        t_max[None, :],
    )
    out_code_ref[g] = best_code


def _kernel_two_level(
    a_ref,  # (1, T, 16) ray block: [o, w, d, 1, inv_d, t_max, pad, pad]
    snear_ref,  # (1, 1, C2p) per-SUPER tile entry distances (XLA-computed)
    cbox_ref,  # (C2, 8, G) child boxes, transposed per super (VMEM)
    matb_ref,  # (C, 16, 4S) cluster matrices (HBM; C = C2*G with pads)
    out_t_ref,  # (1, 1, T)
    out_code_ref,  # (1, 1, T) int32: winning cid * S + slot (-1 = miss)
    b_scratch,  # (2, 16, 4S) VMEM
    dma_sem,  # DMA sems (2,)
    *,
    n_s: int,
    g: int,
    sid_bits: int,
    j_bits: int,
    any_hit: bool = False,
    approx_div: bool = False,
):
    """Two-level variant of :func:`_kernel` for large scenes: an outer
    near-ordered loop over supercluster boxes (tested at the XLA level)
    gates an inner loop that slab-tests the super's G child boxes
    *in-kernel* and streams only the children actually hit — so the
    per-tile box work is O(C2 + supers_hit x G) instead of O(C), the
    scaling wall of BASELINE config #5. Key packing, bit-exact epilogue,
    and the conservative int-key t-prune bound are identical to
    :func:`_kernel`."""
    a = a_ref[0]  # (T, 16)
    t_dim = a.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    a_mm = jnp.where(col < 10, a, 0.0)
    a_hi = a_mm.astype(jnp.bfloat16)
    a_lo = (a_mm - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    o_col = a[:, 0:3]  # (T, 3)
    inv_d = a[:, 10:13]
    t_max = a[:, 13]  # (T,)

    snear0 = snear_ref[0]  # (1, C2p)
    c2p = snear0.shape[1]
    iota_c2 = jax.lax.broadcasted_iota(jnp.int32, (1, c2p), 1)
    iota_g = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (t_dim, n_s), 1)

    smask = (1 << sid_bits) - 1
    jmask = (1 << j_bits) - 1
    # best is a packed (t, slot) int32 key — see _kernel_one_tile
    sl_bits = max(1, (n_s - 1).bit_length())
    sl_mask = (1 << sl_bits) - 1
    import numpy as _np

    inf_bits = int(_np.float32(_INF).view(_np.int32))
    done_s = inf_bits & ~smask
    done_j = inf_bits & ~jmask

    skeys0 = (
        jax.lax.bitcast_convert_type(snear0, jnp.int32) & ~smask
    ) | iota_c2
    sk0 = jnp.min(skeys0)

    if any_hit:
        def _bound_raw(best_key, best_code):
            pending = jnp.where(best_code < 0, t_max[None, :], 0.0)
            return jnp.max(jax.lax.bitcast_convert_type(pending, jnp.int32))
    else:
        def _bound_raw(best_key, best_code):
            # `| sl_mask` restores the truncated LSBs to an upper bound
            # of the true best t (conservative prune)
            return jnp.max(best_key) | sl_mask

    def _bound_s(b):
        return jnp.minimum((b + smask) & ~smask, done_s)

    def _bound_j(b):
        return jnp.minimum((b + jmask) & ~jmask, done_j)

    def _dma(slot, cid):
        return pltpu.make_async_copy(
            matb_ref.at[cid], b_scratch.at[slot], dma_sem.at[slot]
        )

    def inner_cond(state):
        return state[6]  # cur_valid

    def inner_body(state):
        ckeys, ck_cur, best_key, best_code, bound, slot, _valid, sid = state
        j = ck_cur & jmask
        cid = sid * g + j
        _dma(slot, cid).wait()
        ckeys = jnp.where(ckeys == ck_cur, jnp.int32(0x7FFFFFFF), ckeys)
        ck_nxt = jnp.min(ckeys)
        nxt_valid = (ck_nxt & ~jmask) < _bound_j(bound)

        @pl.when(nxt_valid)
        def _():
            _dma(1 - slot, sid * g + (ck_nxt & jmask)).start()

        b = b_scratch[slot]
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = (
            jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
            + jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
            + jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
        )
        best_key, best_code = _round_pick(
            out, best_key, best_code, cid,
            n_s=n_s, iota_s=iota_s, sl_mask=sl_mask, approx_div=approx_div,
        )
        bound = _bound_raw(best_key, best_code)
        return (
            ckeys, ck_nxt, best_key, best_code, bound, 1 - slot, nxt_valid,
            sid,
        )

    def outer_cond(state):
        skeys, sk_cur, best_key, best_code, bound = state
        return (sk_cur & ~smask) < _bound_s(bound)

    def outer_body(state):
        skeys, sk_cur, best_key, best_code, bound = state
        sid = sk_cur & smask
        cb = cbox_ref[sid]  # (8, G)
        near = jnp.full((t_dim, g), -_INF, jnp.float32)
        far = jnp.full((t_dim, g), _INF, jnp.float32)
        for ax in range(3):
            t0 = (cb[ax : ax + 1, :] - o_col[:, ax : ax + 1]) * inv_d[
                :, ax : ax + 1
            ]
            t1 = (cb[3 + ax : 4 + ax, :] - o_col[:, ax : ax + 1]) * inv_d[
                :, ax : ax + 1
            ]
            near = jnp.maximum(near, jnp.minimum(t0, t1))
            far = jnp.minimum(far, jnp.maximum(t0, t1))
        hit = (near < far) & (near < t_max[:, None]) & (far > MIN_DIST)
        nears = jnp.where(hit, jnp.maximum(near, 0.0), _INF)
        cnear = jnp.min(nears, axis=0, keepdims=True)  # (1, G)
        ckeys = (
            jax.lax.bitcast_convert_type(cnear, jnp.int32) & ~jmask
        ) | iota_g
        ck0 = jnp.min(ckeys)
        cvalid0 = (ck0 & ~jmask) < _bound_j(bound)

        @pl.when(cvalid0)
        def _():
            _dma(0, sid * g + (ck0 & jmask)).start()

        inner = jax.lax.while_loop(
            inner_cond,
            inner_body,
            (ckeys, ck0, best_key, best_code, bound, 0, cvalid0, sid),
        )
        best_key, best_code, bound = inner[2], inner[3], inner[4]
        skeys = jnp.where(skeys == sk_cur, jnp.int32(0x7FFFFFFF), skeys)
        return skeys, jnp.min(skeys), best_key, best_code, bound

    best_key0 = (
        jax.lax.bitcast_convert_type(t_max[None, :], jnp.int32) & ~sl_mask
    )
    code0 = jnp.full((1, t_dim), -1, jnp.int32)
    bound0 = _bound_raw(best_key0, code0)
    out = jax.lax.while_loop(
        outer_cond, outer_body, (skeys0, sk0, best_key0, code0, bound0)
    )
    out_t_ref[0] = jnp.where(
        out[3] >= 0,
        jax.lax.bitcast_convert_type(out[2] & ~sl_mask, jnp.float32),
        t_max[None, :],
    )
    out_code_ref[0] = out[3]


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile", "interpret", "any_hit", "derive_uv", "kernel_near",
        "tiles_per_step", "approx_div",
    ),
)
def trace_closest_clustered_pallas(
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_max: jnp.ndarray,
    tables,
    active: jnp.ndarray | None = None,
    tile: int = 512,
    interpret: bool = False,
    any_hit: bool = False,
    derive_uv: bool = True,
    kernel_near: bool = False,
    tiles_per_step: int = 1,
    approx_div: bool = False,
) -> Hit:
    """Drop-in closest-hit using the Pallas tile kernel. With ``any_hit``
    the per-tile rounds stop as soon as every live ray has found *some*
    valid hit (shadow-ray semantics — the reference's
    rayIntersectBVHAnyHit, render.ts:468-480); the returned t is then any
    valid hit, not necessarily the closest. ``tiles_per_step`` > 1 folds
    several ray tiles into one grid step (single-level kernel only) to
    amortize the fixed per-step cost; results are bit-identical."""
    ct: ClusterTables = tables.clusters
    r0 = o.shape[0]
    if active is None:
        active = jnp.ones((r0,), bool)
    two_level_early = ct.super_box is not None
    step = tile * (1 if two_level_early else max(1, tiles_per_step))
    if r0 % step:
        pad = step - r0 % step
        o = jnp.concatenate([o, jnp.ones((pad, 3), o.dtype)], axis=0)
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)], axis=0)
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), t_max.dtype)])
        active = jnp.concatenate([active, jnp.zeros((pad,), bool)])
    r = o.shape[0]
    n_tiles = r // tile
    t_max = jnp.where(active, t_max, 0.0)

    c = ct.n_clusters
    s = ct.face_id.shape[1]
    two_level = ct.super_box is not None
    # lane-dim padding for the near vector (supers when two-level)
    n_boxes = ct.super_box.shape[0] if two_level else c
    cp = max(128, -(-n_boxes // 128) * 128)
    matb = ct.mat_b
    if matb.shape[1] != 16:
        matb = jnp.pad(matb, ((0, 0), (0, 16 - matb.shape[1]), (0, 0)))
    # tables above the VMEM budget stay in HBM with per-round DMA
    hbm = two_level or (c * 16 * 4 * s * 4) > 12 * 1024 * 1024

    w = jnp.cross(o, d)
    ones = jnp.ones((r, 1), jnp.float32)
    inv_d = safe_inv_dir(d)
    zeros = jnp.zeros((r, 2), jnp.float32)
    a_mat = jnp.concatenate(
        [o, w, d, ones, inv_d, t_max[:, None], zeros], axis=-1
    ).reshape(n_tiles, tile, 16)

    from .cluster_trace import _boxes_near

    near_boxes = ct.super_box if two_level else ct.box
    # kernel_near=True computes tile nears IN-kernel from resident boxes
    # (single-level VMEM path only). Measured SLOWER on real frames than
    # the XLA tile-nears pass despite the op-count estimate — kept as an
    # option for re-measurement, default off.
    in_near = kernel_near and not two_level and not hbm

    if in_near:
        bx = jnp.full((8, cp), F32_MAX, jnp.float32)
        # pad columns stay inverted-empty (min=+MAX > max=-MAX ⇒ miss)
        bx = bx.at[3:6, :].set(-F32_MAX)
        bx = bx.at[0:3, :c].set(ct.box[:, 0:3].T)
        bx = bx.at[3:6, :c].set(ct.box[:, 3:6].T)
        near_tc = bx[None]  # (1, 8, cp), one block shared by every tile
    else:

        def tile_nears(args):
            ot, it, tt = args
            near = jnp.min(_boxes_near(ot, it, near_boxes, tt), axis=0)
            return jnp.pad(near, (0, cp - n_boxes), constant_values=F32_MAX)

        near_tc = jax.lax.map(
            tile_nears,
            (
                o.reshape(n_tiles, tile, 3),
                inv_d.reshape(n_tiles, tile, 3),
                t_max.reshape(n_tiles, tile),
            ),
            # big vector batches — O(1) sequential map steps. _boxes_near
            # materializes two (B, tile, C, 3) f32 temporaries, so a
            # budget of E = B·tile·C elements costs ~24·E bytes.
            batch_size=max(1, min(n_tiles, 16_777_216 // (tile * cp))),
        ).reshape(n_tiles, 1, cp)

    g_step = 1 if two_level else max(1, min(tiles_per_step, n_tiles))
    grid = (n_tiles // g_step,)
    # enough mantissa-LSB bits to carry any (padded) box id in the key
    cid_bits = max(1, (cp - 1).bit_length())
    out_shape = (
        jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.int32),
    )
    row_spec = pl.BlockSpec(
        (g_step, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    a_spec = pl.BlockSpec(
        (g_step, tile, 16), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    near_spec = pl.BlockSpec(
        (g_step, 1, cp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    if two_level:
        g = ct.child_box_t.shape[2]
        c2 = ct.super_box.shape[0]
        kernel = functools.partial(
            _kernel_two_level,
            n_s=s,
            g=g,
            sid_bits=cid_bits,
            j_bits=max(1, (g - 1).bit_length()),
            any_hit=any_hit,
            approx_div=approx_div,
        )
        best_t, best_code = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                a_spec,
                near_spec,
                pl.BlockSpec(
                    (c2, 8, g), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(row_spec, row_spec),
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((2, 16, 4 * s), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(a_mat, near_tc.reshape(n_tiles, 1, cp), ct.child_box_t, matb)
    else:
        kernel = functools.partial(
            _kernel, n_s=s, cid_bits=cid_bits, any_hit=any_hit, hbm=hbm,
            in_near=in_near, approx_div=approx_div,
        )
        if in_near:
            near_spec = pl.BlockSpec(
                (1, 8, cp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            )
        if hbm:
            matb_spec = pl.BlockSpec(memory_space=pl.ANY)
            scratch_shapes = [
                pltpu.VMEM((2, 16, 4 * s), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        else:
            matb_spec = pl.BlockSpec(
                (c, 16, 4 * s), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            )
            scratch_shapes = []
        best_t, best_code = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[a_spec, near_spec, matb_spec],
            out_specs=(row_spec, row_spec),
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(a_mat, near_tc, matb)

    best_t = best_t.reshape(r)[:r0]
    code = best_code.reshape(r)[:r0]
    hit_mask = code >= 0
    face = jnp.where(
        hit_mask,
        jnp.take(ct.face_id.reshape(-1), jnp.maximum(code, 0)),
        -1,
    ).astype(jnp.int32)

    if any_hit or not derive_uv:
        # shadow-ray callers only consume the hit flag, and sorted-trace
        # callers re-derive u/v in original ray order (fewer unsort
        # scatters) — skip the barycentric re-derivation here
        zeros_uv = jnp.zeros_like(best_t)
        return Hit(t=best_t, u=zeros_uv, v=zeros_uv, face=face)

    return rederive_uv(o[:r0], d[:r0], best_t, face, tables)


def rederive_uv(
    o: jnp.ndarray,
    d: jnp.ndarray,
    t: jnp.ndarray,
    face: jnp.ndarray,
    tables,
) -> Hit:
    """Barycentrics AND exact t for the winning triangle — UNMASKED
    classic Möller–Trumbore algebra (not ray_triangle, whose validity
    gates could zero u/v when the exact test disagrees with the kernel's
    bf16x3 decision on a grazing ray; the kernel's verdict stands).
    Recomputing t here makes the reported hit distance exact f32
    regardless of the kernel's in-round representation (packed-key slot
    truncation, optional approx reciprocal); misses keep the incoming
    t (the t_max sentinel)."""
    hit_mask = face >= 0
    tri = jnp.take(tables.tri, jnp.maximum(face, 0), axis=0)
    p0, e1, e2 = tri[:, 0:3], tri[:, 3:6], tri[:, 6:9]
    hvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * hvec, axis=-1)
    svec = o - p0
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
    u = jnp.sum(svec * hvec, axis=-1) * inv_det
    qvec = jnp.cross(svec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t_exact = jnp.sum(e2 * qvec, axis=-1) * inv_det
    return Hit(
        t=jnp.where(hit_mask, t_exact, t),
        u=jnp.where(hit_mask, u, 0.0),
        v=jnp.where(hit_mask, v, 0.0),
        face=face,
    )
