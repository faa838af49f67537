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
import os

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

# Measurement-only ablations (WRT_ABLATE=noprune,nodiv,nogates,mmonly):
# semantics-BREAKING kernel variants for on-chip cost attribution —
# `noprune` fixes the round count at the full shortlist (so piece
# deltas aren't confounded by prune dynamics), the others stub epilogue
# pieces. Never set outside tools/; results are wrong by design.
_ABLATE = frozenset(filter(None, os.environ.get("WRT_ABLATE", "").split(",")))

# Relative validity margin for the pairs (exact-adjudication) path, scaled
# by the per-candidate magnitude bound |a|@|b|: the 3-pass bf16 hi/lo dot
# differs from the exact f32 dot by at most ~2^-15 x sum|a_i b_i| (per-term
# hi+lo representation error 2^-16, dropped lo*lo 2^-16 of the term, f32
# accumulation 2^-20) — 2^-14 is that bound with 2x safety, covering the
# 1-pass bf16 underestimate of the magnitude itself.
_MARGIN = 2.0**-14


def _split3(x):
    """Exact 3-way bf16 split of an f32 tensor: x ≈ x0 + x1 + x2 with
    the residual after x2 below 2^-24 relative (24 mantissa bits in 3
    bf16 chunks; splits are exact by Sterbenz subtraction)."""
    x0 = x.astype(jnp.bfloat16)
    r = x - x0.astype(jnp.float32)
    x1 = r.astype(jnp.bfloat16)
    x2 = (r - x1.astype(jnp.float32)).astype(jnp.bfloat16)
    return x0, x1, x2


def _split2(x):
    x0 = x.astype(jnp.bfloat16)
    x1 = (x - x0.astype(jnp.float32)).astype(jnp.bfloat16)
    return x0, x1


def _mm(a_sp, b, passes):
    """f32-accurate matmul from bf16 passes (Mosaic has no f32 MXU mode;
    DEFAULT 1-pass flips ~17% of intersection decisions).

    passes=2 (folded hi/lo): B arrives PRE-SPLIT as (32, 4S) bf16 rows
    [b_lo; b_hi] (ClusterTables.mat_b2) and a_sp is (a_hi, [a_hi|a_lo]),
    so hi·hi + (hi·lo + lo·hi) is TWO MXU issues —
    ``d(a_hi, b_hi) + d([a_hi|a_lo], [b_lo; b_hi])`` — with the same
    dropped lo·lo term as 3-pass (~2^-16 relative; the cross terms
    accumulate in ONE f32 dot instead of two, ≤1 ulp difference). The
    round cost is MXU-issue-latency-bound at these shapes (mm_passes=6
    costs +9% of the whole frame ⇒ ~0.2 µs per pass), so folding is a
    direct serial-latency cut, and the per-round in-kernel B split
    vanishes with it.

    passes=3 (hi/lo split): drops the lo·lo cross term — ~2^-16
    relative error. passes=6 (3×3-way split, the shape XLA's HIGHEST
    uses): keeps every cross term ≥ 2^-24. Hardware-measured at
    48²·4spp: 3- and 6-pass produce IDENTICAL frames (with source-face
    exclusion in place, no intersection decision in the bundled scene
    sits inside the 2^-16 band); 6 exists for adversarial geometry.
    a_sp is the precomputed split of A (hoisted out of the round loop);
    for passes>=3, B splits here, per round."""
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    if passes == 2:
        a_hi, a_cat = a_sp
        k = b.shape[0] // 2
        return d(a_hi, b[k:]) + d(a_cat, b)
    if passes == 6:
        a0, a1, a2 = a_sp
        b0, b1, b2 = _split3(b)
        # sum small terms first: final rounding then costs ~1 ulp
        return (
            (d(a0, b2) + d(a1, b1) + d(a2, b0))
            + (d(a0, b1) + d(a1, b0))
            + d(a0, b0)
        )
    a_hi, a_lo = a_sp
    b_hi, b_lo = _split2(b)
    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _a_split(a_mm, passes):
    """Per-tile A-side split for :func:`_mm` (hoisted out of rounds)."""
    if passes == 6:
        return _split3(a_mm)
    a_hi, a_lo = _split2(a_mm)
    if passes == 2:
        return a_hi, jnp.concatenate([a_hi, a_lo], axis=1)
    return a_hi, a_lo


def _b_hi(b, passes):
    """The bf16 |B| operand for the pairs-mode magnitude pass."""
    if passes == 2:
        return b[b.shape[0] // 2 :]
    return b.astype(jnp.bfloat16)


def _round_pick(
    outs, mags, cids, best, *, n_s, iota_gs, sl_mask, p_bits, approx_div,
    excl_f=None,
):
    """Shared per-round epilogue of both kernels: validity gates, the
    (approx-)reciprocal t, and the packed (t | slot) min-pick that
    updates the per-ray best state. Keeping this in one place keeps
    the single- and two-level kernels' epilogues provably identical.

    ``outs``/``mags``/``cids`` are parallel lists, one entry per ganged
    cluster this round (length 1 = the classic one-cluster round; the
    gang path batches K clusters into one matmul + ONE epilogue to cut
    the serial round count of miss-heavy tiles — see the gang notes in
    :func:`trace_closest_clustered_pallas`). ``iota_gs`` is the
    (T, K·S) slot iota where block k's slots live at ``k << p_bits``;
    ``sl_mask`` covers all K·S slot codes.

    ``best`` is ``(key, code)`` — classic single-winner mode — or
    ``(key1, code1, key2, code2, key3, code3)``: the two smallest
    margin-accepted packed keys seen so far PLUS the smallest
    ROBUSTLY-bf16-valid key (every gate passed with negative margin,
    including provably-positive t), all carried out of the kernel for exact
    f32 re-adjudication (:func:`adjudicate_candidates`). In pairs mode
    each ``mags[k]`` is a 4th matmul pass |a|@|b|, a per-candidate
    magnitude bound that widens the barycentric validity gates by the
    bf16x3 worst-case error, so a true winner the bf16 arithmetic would
    knife-edge-reject is still carried out as a candidate (false
    accepts are rejected exactly outside).

    Why the third (strict) slot: a ray grazing a silhouette EDGE puts
    both adjacent faces into margin limbo at nearly equal t — they fill
    the top-2, and when the ray actually slips past the edge the true
    (farther) winner would be lost, reading as a miss. That geometry is
    common (measured 30/2304 pixels at 48²·4 spp with top-2 only). The
    farther winner is robustly bf16-valid in all but knife-edge cases,
    so the nearest ROBUST candidate catches it. The robust t-gate also
    excludes the near-zero self-intersection impostors every bounce ray
    sees at its own source face (bf16 sign-ambiguous t) — without it
    they crowd all carried slots. Residual failures need multiple
    independent knife-edge events on one ray.

    Note the packed compare narrows acceptance by one truncation bucket
    at the t_max boundary: a hit whose t falls in the same 2^-sl_bits
    bucket as t_max (init best) reports as a miss — for shadow rays an
    occluder within ~2^-16 relative of the light's own distance, for
    predictor-bounded rays far inside the 1.05x margin. Both are
    knife-edge cases the exact compare resolved arbitrarily anyway."""
    pairs = len(best) != 2
    ts = []
    robusts = []
    iota_si = (
        None
        if excl_f is None
        else jax.lax.broadcasted_iota(
            jnp.int32, (outs[0].shape[0], n_s), 1
        )
    )
    for out, out_mag, cid_k in zip(outs, mags, cids):
        det = out[:, 0 * n_s : 1 * n_s]
        t_num = out[:, 1 * n_s : 2 * n_s]
        u_num = out[:, 2 * n_s : 3 * n_s]
        v_num = out[:, 3 * n_s : 4 * n_s]

        not_self = None
        if excl_f is not None:
            # the ray's own source-face two-sided duplicate: exact t is
            # ≈ -1e-5 from the offset origin (strictly rejected by the
            # exact t > MIN_DIST gate) but the bf16x3 t̂ sign is
            # ambiguous — replicate the exact rejection by slot identity.
            # excl_f carries float(code+1); 0 = no exclusion (never
            # matches: rel < 0). Codes < 2^24 are exact in f32; the
            # compare runs in int domain (Mosaic has no float iota).
            rel = excl_f.astype(jnp.int32) - 1 - cid_k * n_s
            not_self = iota_si != rel
        if out_mag is None:
            if "mmonly" in _ABLATE:  # measurement stub: matmul + 1 reduce
                fold = jnp.min(out, axis=1)
                nb = jnp.minimum(
                    best[0],
                    jax.lax.bitcast_convert_type(fold, jnp.int32)[None, :],
                )
                return nb, best[1]
            # u <= det is implied: v >= 0 and u+v <= det give
            # u <= u+v <= det (and a NaN in any term fails some compare
            # anyway), so the reference's u > 1 reject needs no own gate
            if "nogates" in _ABLATE:  # measurement stub
                valid = det >= _EPS2
            else:
                valid = (
                    (det >= _EPS2)
                    & (u_num >= 0.0)
                    & (v_num >= 0.0)
                    & (u_num + v_num <= det)
                )
            if not_self is not None:
                valid = valid & not_self
        else:
            # margined gates (pairs mode). The det >= EPS^2 cull is NOT
            # margined: near-parallel candidates have numerically wild t
            # that would poison the t-prune bound; the cull is a
            # deliberate epsilon threshold whose knife edge the
            # reference also decides arbitrarily.
            m_d = out_mag[:, 0 * n_s : 1 * n_s] * _MARGIN
            m_t = out_mag[:, 1 * n_s : 2 * n_s] * _MARGIN
            m_u = out_mag[:, 2 * n_s : 3 * n_s] * _MARGIN
            m_v = out_mag[:, 3 * n_s : 4 * n_s] * _MARGIN
            valid = (
                (det >= _EPS2)
                & (u_num >= -m_u)
                & (u_num <= det + m_u)
                & (v_num >= -m_v)
                & (u_num + v_num <= det + m_u + m_v)
            )
            if not_self is not None:
                valid = valid & not_self
            # ROBUST candidates pass every gate with the margin flipped
            # NEGATIVE — bf16 can prove them exact-valid. Crucially this
            # includes t_num >= +m_t (provably in FRONT of the origin):
            # a bounce ray's own source face evaluates at exact
            # t ≈ -1e-5 with a bf16 t̂ of ambiguous sign, passes the
            # plain gates, and its near-zero key would otherwise crowd
            # every carried slot (measured: the dominant residual miss
            # class, plain hits at t≈0.2-5 reading as misses).
            rb = (
                (det >= _EPS2 + m_d)
                & (u_num >= m_u)
                & (u_num <= det - m_u)
                & (v_num >= m_v)
                & (u_num + v_num <= det - m_u - m_v)
                & (t_num >= m_t)
            )
            robusts.append(rb if not_self is None else rb & not_self)
        # the (T, S) division is a per-round VPU cost; with approx_div
        # the pick runs on a fast approximate reciprocal (~2^-12
        # relative) — NOTE measured full-frame parity loss is severe
        # (the approximate t feeds the candidate ranking AND the tile
        # t-prune bound); keep off unless re-validated.
        det_safe = jnp.where(valid, det, 1.0)
        if "nodiv" in _ABLATE:  # measurement stub: skip the reciprocal
            inv_det = det_safe
        elif approx_div:
            inv_det = pl.reciprocal(det_safe, approx=True)
        else:
            inv_det = 1.0 / det_safe
        t = t_num * inv_det
        # invalid sentinel = IEEE inf, NOT F32_MAX: the t_max init key is
        # bitcast(t_max) truncated, and an F32_MAX sentinel's truncated
        # key EQUALS it for t_max = F32_MAX rays — the tie then leaks a
        # bogus slot-0 candidate into the pairs-mode second slot on every
        # miss ray (firing the ambiguity flag tile-wide). inf keys sort
        # strictly above every real t_max key, so sentinels can never
        # occupy a carried slot.
        ts.append(jnp.where(valid & (t > MIN_DIST), t, jnp.inf))

    # pack (t, slot) into one sortable key; a single min-reduce yields
    # the round winner's t and slot (vs best, carried in the same
    # packed form — no elementwise t<best prefilter needed)
    t_masked = ts[0] if len(ts) == 1 else jnp.concatenate(ts, axis=1)
    tkey = (
        jax.lax.bitcast_convert_type(t_masked, jnp.int32) & ~sl_mask
    ) | iota_gs
    cand = jnp.min(tkey, axis=1)  # (T,)

    def _cid1(c):
        """cid entries are scalars (one cluster per gang block — the
        serial kernels) or (rows, 1) columns (per-ROW cluster ids — the
        lockstep kernel, where each tile's row block multiplied its own
        cluster). Normalize to something that broadcasts against the
        (rows,)-shaped slot vector."""
        return c[:, 0] if getattr(c, "ndim", 0) == 2 else c

    def _code_of(c):
        """Packed slot code → global face code cid·S + slot. The gang
        index rides the bits above p_bits; its cid is recovered with a
        short select chain (K is 1-8, a handful of vector selects)."""
        slot_g = c & sl_mask
        slot = slot_g & ((1 << p_bits) - 1)
        if len(cids) == 1:
            return _cid1(cids[0]) * n_s + slot
        k_idx = slot_g >> p_bits
        cid_sel = _cid1(cids[0])
        for k in range(1, len(cids)):
            cid_sel = jnp.where(k_idx == k, _cid1(cids[k]), cid_sel)
        return cid_sel * n_s + slot

    ccode1 = _code_of(cand)

    if len(best) == 2:
        best_key, best_code = best
        improved = cand < best_key[0]
        best_key = jnp.where(improved, cand, best_key[0])[None, :]
        # defer u/v/face: rounds only carry the winner's (cid, slot);
        # the wrapper re-derives u/v once per ray
        best_code = jnp.where(improved, ccode1, best_code[0])[None, :]
        return best_key, best_code

    # pairs mode: merge this round's two smallest keys into the running
    # two smallest. Invalid lanes carry bitcast(F32_MAX)-based sentinel
    # keys, which never beat the t_max-key inits (strict compares).
    # Gang duplicates (an exhausted shortlist repeats cluster 0) emit
    # identical keys, and the equality mask below removes ALL copies of
    # the winner — a duplicate can never occupy both top-2 slots.
    bk1, bc1, bk2, bc2, bk3, bc3 = best
    cand2 = jnp.min(
        jnp.where(tkey == cand[:, None], jnp.int32(0x7FFFFFFF), tkey),
        axis=1,
    )
    ccode2 = _code_of(cand2)
    take = cand < bk1[0]
    nb1 = jnp.where(take, cand, bk1[0])
    nc1 = jnp.where(take, ccode1, bc1[0])
    loser = jnp.where(take, bk1[0], cand)  # max(bk1, cand)
    lcode = jnp.where(take, bc1[0], ccode1)
    # second-smallest of {bk1, bk2, cand, cand2} = min(loser, bk2, cand2)
    m23 = jnp.minimum(bk2[0], cand2)
    c23 = jnp.where(bk2[0] <= cand2, bc2[0], ccode2)
    nb2 = jnp.minimum(loser, m23)
    nc2 = jnp.where(loser <= m23, lcode, c23)
    # third slot: nearest ROBUSTLY-valid candidate this round (see the
    # docstring). robust ⊆ margin-valid, so tkey already carries the
    # right t values — just re-mask to the robust set.
    s_mask = (
        robusts[0]
        if len(robusts) == 1
        else jnp.concatenate(robusts, axis=1)
    )
    skey = jnp.where(s_mask, tkey, jnp.int32(0x7FFFFFFF))
    cand3 = jnp.min(skey, axis=1)
    take3 = cand3 < bk3[0]
    nb3 = jnp.where(take3, cand3, bk3[0])
    nc3 = jnp.where(take3, _code_of(cand3), bc3[0])
    return (
        nb1[None, :], nc1[None, :], nb2[None, :], nc2[None, :],
        nb3[None, :], nc3[None, :],
    )


def _amb_flag(best, sl_mask):
    """Per-ray "needs exact adjudication" flag (pairs mode — (1, T) i32).

    The exact re-adjudication can only change the kernel's verdict when
    (a) the winner is not ROBUSTLY valid (``code3 != code1`` — covers
    margin-limbo wins, limbo-over-miss, and no-winner-but-limbo), or
    (b) the second candidate's packed key sits within the bf16x3 error
    band of the winner's, so the exact ordering could flip. Everywhere
    else the winner is provably the exact winner and the cheap
    single-gather :func:`rederive_uv` suffices — which is what
    :func:`adjudicate_compact` exploits (the flagged set is knife-edge
    rare). NT = 2 error bands (2^9 int-key steps ≈ the 2^-14 relative
    ``_MARGIN`` each) + both keys' slot-bit truncation."""
    nt = 2 * (1 << 9) + 2 * (sl_mask + 1)
    k1 = best[0] & ~sl_mask
    k2 = best[2] & ~sl_mask
    near_tie = (best[3] >= 0) & (k2 - k1 < nt)
    return ((best[5] != best[1]) | near_tie).astype(jnp.int32)


def _kernel(
    a_ref,  # (G, T, 16) ray blocks: [o, w, d, 1, inv_d, t_max, pad, pad]
    near_ref,  # (G, 1, C) tile nears (XLA) — or (1, 8, C) transposed
    #           cluster boxes when in_near=True (nears computed in-kernel)
    matb_ref,  # (C, 16, 4S) cluster matrices (VMEM, or HBM when hbm=True)
    out_t_ref,  # (G, 1, T)
    out_code_ref,  # (G, 1, T) int32: winning cid * S + slot (-1 = miss)
    *rest,  # pairs: out_code{2,3}_ref + out_amb_ref (G, 1, T);
    #         hbm: b_scratch, dma_sems
    n_s: int,
    cid_bits: int,
    any_hit: bool = False,
    hbm: bool = False,
    in_near: bool = False,
    approx_div: bool = False,
    pairs: bool = False,
    gang: int = 1,
    excl: bool = False,
    mm_passes: int = 3,
    pipelined: bool = False,
):
    if pairs:
        out_code2_ref, out_code3_ref, out_amb_ref, *scratch = rest
    else:
        out_code2_ref, out_code3_ref, out_amb_ref, scratch = (
            None, None, None, list(rest),
        )
    # Each grid step owns `G` ray tiles, processed back-to-back by the same
    # per-tile round loop — G > 1 amortizes the fixed per-grid-step cost
    # (prologue + block DMA turnaround, ~6 µs) over G tiles.
    for g in range(a_ref.shape[0]):
        _kernel_one_tile(
            a_ref, near_ref, matb_ref, out_t_ref, out_code_ref,
            out_code2_ref, out_code3_ref, out_amb_ref, scratch,
            g=g, n_s=n_s, cid_bits=cid_bits, any_hit=any_hit, hbm=hbm,
            in_near=in_near, approx_div=approx_div, pairs=pairs,
            gang=gang, excl=excl, mm_passes=mm_passes, pipelined=pipelined,
        )


def _kernel_one_tile(
    a_ref, near_ref, matb_ref, out_t_ref, out_code_ref, out_code2_ref,
    out_code3_ref, out_amb_ref, scratch,
    *,
    g: int,
    n_s: int,
    cid_bits: int,
    any_hit: bool,
    hbm: bool,
    in_near: bool,
    approx_div: bool,
    pairs: bool,
    gang: int = 1,
    excl: bool = False,
    mm_passes: int = 3,
    pipelined: bool = False,
):
    a = a_ref[g]  # (T, 16)
    # column 14 carries float(source-face duplicate code + 1) — see
    # _round_pick's exclusion note (0 = none; primary rays, pads)
    excl_f = a[:, 14:15] if excl else None
    t_dim = a.shape[0]
    # bf16-split matmuls (see _mm; Mosaic has no f32 MXU mode). The
    # 3-pass hi/lo default drops the lo·lo cross term (~2^-16 relative —
    # NOT 2^-32 as an earlier comment claimed; empirically still below
    # every intersection decision margin in the bundled scene once
    # source-face duplicates are excluded — mm_passes=6 changes nothing).
    # Columns >= 10 carry inv_d/t_max (t_max can be 3.4e38 → inf in bf16;
    # inf × 0-rows of B = NaN), so they are zeroed for the matmul operand.
    col = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    a_mm = jnp.where(col < 10, a, 0.0)
    a_sp = _a_split(a_mm, mm_passes)
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
    # gang > 1 batches K clusters per round (one matmul, one epilogue):
    # the slot code grows by the gang-index bits above `p_bits`, so t's
    # truncation coarsens from 2^-16 to 2^-(16-log2 K) relative — still
    # far below f32 intersection noise, and exact under pairs mode.
    p_bits = max(1, (n_s - 1).bit_length())
    sl_bits = p_bits + (gang - 1).bit_length()
    sl_mask = (1 << sl_bits) - 1
    iota_gs = (
        iota_s
        if gang == 1
        else jnp.concatenate(
            [iota_s + (k << p_bits) for k in range(gang)], axis=1
        )
    )

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
    # In pairs mode the best keys come from bf16x3 t estimates that can
    # UNDERESTIMATE the exact winner by ~2^-15 relative; a cluster whose
    # (exact) entry distance falls in that band would be pruned although
    # it could hold the true winner. Bitcast keys are log-spaced (1 int
    # step ≈ 2^-23 relative), so adding 2^9 steps inflates the bound by
    # ~2^-14 relative — the same safety the margined gates use. Costs at
    # most a couple of extra rounds per tile.
    # approx_div: the approximate-reciprocal t (~2^-12 relative) can
    # UNDERESTIMATE the carried best, and a bound anchored on it prunes
    # clusters that still hold the true winner — the r3 approx_div
    # parity catastrophe (48²·4spp RMSE 1.56) was this SYSTEMATIC class,
    # not the knife-edge ranking flips. 2^12 int-key steps ≈ 2^-11
    # relative restores a conservative bound (costs ≤ a couple of extra
    # rounds); ranking flips remain as rare knife-edge noise.
    binfl = (1 << 9) if pairs else 0
    if approx_div:
        binfl = max(binfl, 1 << 12)

    if "noprune" in _ABLATE:
        # measurement stub: fixed bound = process the WHOLE shortlist
        # (rounds = union size, stable across epilogue ablations)
        def _bound(best):
            return jnp.int32(done_th)

    elif any_hit:
        def _bound(best):
            pending = jnp.where(best[1] < 0, t_max[None, :], 0.0)
            b = jnp.max(jax.lax.bitcast_convert_type(pending, jnp.int32))
            return jnp.minimum((b + mask) & ~mask, done_th)
    else:
        def _bound(best):
            # pairs: the bound anchors on the ROBUST slot — a proven
            # hit the search may legitimately stop beyond. Anchoring on
            # the margined best would let a margin-limbo impostor (e.g.
            # a bounce ray's own source face at bf16 t̂ ≈ +1e-5, exact
            # t < 0) stop the tile before the true winner's cluster is
            # ever tested.
            b = (jnp.max(best[4 if len(best) == 6 else 0]) | sl_mask)
            return jnp.minimum((b + binfl + mask) & ~mask, done_th)

    if hbm:
        b_scratch, dma_sem = scratch  # (2, 16, 4S) VMEM, DMA sems (2,)

        def _dma(slot, cid):
            return pltpu.make_async_copy(
                matb_ref.at[cid], b_scratch.at[slot], dma_sem.at[slot]
            )

    if pipelined and not hbm:
        # Software-pipelined rounds: the loop body issues the NEXT
        # round's matmul (MXU) before applying the PENDING round's
        # epilogue (VPU). The two are data-independent within one
        # iteration — the matmul picks its clusters with the bound that
        # is one epilogue stale — so Mosaic can overlap the units
        # instead of serializing matmul → epilogue → matmul. Exactness:
        # the t-prune bound is an optimization, never semantics — a
        # cluster the fresher bound would have pruned only produces
        # candidates that LOSE the packed-key min merge, and the merge
        # is associative/commutative, so the output is bit-identical
        # (tests/test_cluster.py). Cost: one speculative matmul per
        # tile (the last, unused) and one per zero-round tile.
        c_last = matb_ref.shape[0] - 1  # pad-id clamp for spec. picks

        def _drain(keys, k_cur, bound):
            """Consume up to `gang` shortlist keys gated by `bound`;
            returns (cids, keys, k_after, k_sel) with cids clamped to
            real matb rows (a speculative first pick can be a pad)."""
            cid = jnp.minimum(k_cur & mask, c_last)
            cids = [cid]
            k_sel = k_cur
            keys = jnp.where(keys == k_cur, jnp.int32(0x7FFFFFFF), keys)
            k_cur = jnp.min(keys)
            for _ in range(1, gang):
                take_k = (k_cur & ~mask) < bound
                cids.append(
                    jnp.where(take_k, jnp.minimum(k_cur & mask, c_last), cid)
                )
                keys = jnp.where(
                    take_k & (keys == k_cur), jnp.int32(0x7FFFFFFF), keys
                )
                k_cur = jnp.min(keys)
            return cids, keys, k_cur, k_sel

        def _mm_gang(cids):
            if gang == 1:
                b = matb_ref[cids[0]]
            else:
                b = jnp.concatenate([matb_ref[c] for c in cids], axis=-1)
            out = _mm(a_sp, b, mm_passes)
            mag = (
                jnp.dot(
                    jnp.abs(a_sp[0]), jnp.abs(_b_hi(b, mm_passes)),
                    preferred_element_type=jnp.float32,
                )
                if pairs
                else None
            )
            return out, mag

        def _apply(out_prev, mag_prev, cids_prev, best):
            outs = [
                out_prev[:, k * 4 * n_s : (k + 1) * 4 * n_s]
                for k in range(gang)
            ]
            mags = [
                mag_prev[:, k * 4 * n_s : (k + 1) * 4 * n_s]
                if pairs
                else None
                for k in range(gang)
            ]
            return _round_pick(
                outs, mags, list(cids_prev), best,
                n_s=n_s, iota_gs=iota_gs, sl_mask=sl_mask, p_bits=p_bits,
                approx_div=approx_div, excl_f=excl_f,
            )

        def cond_p(state):
            return state[-1]

        def body_p(state):
            if pairs:
                (keys, k_cur, best, bound, out_prev, mag_prev,
                 cids_prev, _pending) = state
            else:
                (keys, k_cur, best, bound, out_prev,
                 cids_prev, _pending) = state
                mag_prev = None
            cids_n, keys, k_after, k_sel = _drain(keys, k_cur, bound)
            out_n, mag_n = _mm_gang(cids_n)
            best = _apply(out_prev, mag_prev, cids_prev, best)
            bound = _bound(best)
            pending_n = (k_sel & ~mask) < bound
            if pairs:
                return (keys, k_after, best, bound, out_n, mag_n,
                        tuple(cids_n), pending_n)
            return (keys, k_after, best, bound, out_n,
                    tuple(cids_n), pending_n)

        best_key0 = (
            jax.lax.bitcast_convert_type(t_max[None, :], jnp.int32)
            & ~sl_mask
        )
        code0 = jnp.full((1, t_dim), -1, jnp.int32)
        best0 = (
            (best_key0, code0, best_key0, code0, best_key0, code0)
            if pairs
            else (best_key0, code0)
        )
        bound0 = _bound(best0)
        cids0, keys1, k_after0, k_sel0 = _drain(keys0, k0, bound0)
        out0, mag0 = _mm_gang(cids0)
        pending0 = (k_sel0 & ~mask) < bound0
        if pairs:
            init = (keys1, k_after0, best0, bound0, out0, mag0,
                    tuple(cids0), pending0)
        else:
            init = (keys1, k_after0, best0, bound0, out0,
                    tuple(cids0), pending0)
        fin = jax.lax.while_loop(cond_p, body_p, init)
        best = fin[2]
        out_t_ref[g] = jnp.where(
            best[1] >= 0,
            jax.lax.bitcast_convert_type(best[0] & ~sl_mask, jnp.float32),
            t_max[None, :],
        )
        out_code_ref[g] = best[1]
        if pairs:
            out_code2_ref[g] = best[3]
            out_code3_ref[g] = best[5]
            out_amb_ref[g] = _amb_flag(best, sl_mask)
        return

    def cond(state):
        if hbm:
            return state[5]  # cur_valid: a fetched block awaits processing
        keys, k_cur, best, bound = state
        return (k_cur & ~mask) < bound

    def body(state):
        if hbm:
            keys, k_cur, best, bound, slot, _valid = state
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
            keys, k_cur, best, bound = state
            cid = k_cur & mask
            # gang > 1: drain up to K shortlist entries this round (the
            # first is guaranteed in-bound by the loop cond; later picks
            # beyond the bound — which only ever shrinks, so they can
            # never become useful — duplicate pick 0, whose identical
            # keys the epilogue's equality masking disarms)
            cids = [cid]
            keys = jnp.where(keys == k_cur, jnp.int32(0x7FFFFFFF), keys)
            k_cur = jnp.min(keys)
            for _ in range(1, gang):
                take_k = (k_cur & ~mask) < bound
                cids.append(jnp.where(take_k, k_cur & mask, cid))
                keys = jnp.where(
                    take_k & (keys == k_cur), jnp.int32(0x7FFFFFFF), keys
                )
                k_cur = jnp.min(keys)
            if gang == 1:
                b = matb_ref[cid]  # (16, 4S)
            else:
                b = jnp.concatenate(
                    [matb_ref[c] for c in cids], axis=-1
                )  # (16, 4S·K)
        out = _mm(a_sp, b, mm_passes)
        out_mag = (
            jnp.dot(
                jnp.abs(a_sp[0]), jnp.abs(_b_hi(b, mm_passes)),
                preferred_element_type=jnp.float32,
            )
            if pairs
            else None
        )
        if hbm:
            n_gang, cids = 1, [cid]
        else:
            n_gang = gang
        outs = [out[:, k * 4 * n_s : (k + 1) * 4 * n_s] for k in range(n_gang)]
        mags = [
            out_mag[:, k * 4 * n_s : (k + 1) * 4 * n_s]
            if pairs
            else None
            for k in range(n_gang)
        ]
        best = _round_pick(
            outs, mags, cids, best,
            n_s=n_s, iota_gs=iota_gs, sl_mask=sl_mask, p_bits=p_bits,
            approx_div=approx_div, excl_f=excl_f,
        )
        bound = _bound(best)
        if hbm:
            return keys, k_nxt, best, bound, 1 - slot, nxt_valid
        return keys, k_cur, best, bound

    best_key0 = (
        jax.lax.bitcast_convert_type(t_max[None, :], jnp.int32) & ~sl_mask
    )
    code0 = jnp.full((1, t_dim), -1, jnp.int32)
    best0 = (
        (best_key0, code0, best_key0, code0, best_key0, code0)
        if pairs
        else (best_key0, code0)
    )
    bound0 = _bound(best0)
    base_init = (keys0, k0, best0, bound0)
    if hbm:
        # warm-up: prefetch the first block (when any work exists)
        valid0 = (k0 & ~mask) < bound0

        @pl.when(valid0)
        def _():
            _dma(0, k0 & mask).start()

        out = jax.lax.while_loop(cond, body, base_init + (0, valid0))
        best = out[2]
    else:
        _, _, best, _ = jax.lax.while_loop(cond, body, base_init)
    best_key, best_code = best[0], best[1]
    # unpack: winners get t truncated to the key granularity; untouched
    # lanes report their exact t_max (miss sentinel semantics preserved)
    out_t_ref[g] = jnp.where(
        best_code >= 0,
        jax.lax.bitcast_convert_type(best_key & ~sl_mask, jnp.float32),
        t_max[None, :],
    )
    out_code_ref[g] = best_code
    if pairs:
        out_code2_ref[g] = best[3]
        out_code3_ref[g] = best[5]
        out_amb_ref[g] = _amb_flag(best, sl_mask)


def _kernel_sched(
    a_ref,  # (G, T, 16) ray blocks: [o, w, d, 1, inv_d, t_max, excl, pad]
    sched_ref,  # (G, 1, Cp) i32 SMEM: per-tile (near | cid) keys, ASCENDING
    matb_ref,  # (C, rows_b, 4S) cluster matrices (VMEM)
    out_t_ref,  # (G, 1, T)
    out_code_ref,  # (G, 1, T) i32: winning cid * S + slot (-1 = miss)
    *,
    n_s: int,
    cid_bits: int,
    approx_div: bool = False,
    excl: bool = False,
    mm_passes: int = 3,
    jblk: int = 4,
):
    """Schedule-fed round loop (closest-hit, no pairs): the per-tile
    near-ordered cluster order is SORTED IN XLA (one row-sort of the
    packed (near | cid) keys the serial kernel builds in-kernel) and
    delivered as SMEM scalars, so the kernel's shortlist DRAIN — the
    per-round masked min-reduce over (1, Cp) plus a vector→scalar
    extraction, measured at roughly half the per-round cost of the
    serial loop (WRT_ABLATE attribution, ROADMAP r4) — disappears
    entirely: each round reads its cluster ids with scalar SMEM loads.

    Rounds run in blocks of ``jblk`` (one wide gang-style matmul + ONE
    epilogue/pick per block), with the prune bound refreshed once per
    block. Past-the-bound block entries are processed SPECULATIVELY
    (the merge is an idempotent packed-key min and the gates + the
    ``cand < best`` compare reject anything that could not win, exactly
    the serial gang path's argument), so per-tile results are identical
    to the serial kernel up to the packed key's slot-bit truncation
    granularity (jblk tag bits, same class as ``gang``)."""
    import numpy as _np

    for g in range(a_ref.shape[0]):
        a = a_ref[g]  # (T, 16)
        excl_f = a[:, 14:15] if excl else None
        t_dim = a.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
        a_sp = _a_split(jnp.where(col < 10, a, 0.0), mm_passes)
        t_max = a[:, 13]
        cp = sched_ref.shape[2]
        mask = (1 << cid_bits) - 1
        done_th = int(_np.float32(_INF).view(_np.int32)) & ~mask
        c_last = matb_ref.shape[0] - 1
        p_bits = max(1, (n_s - 1).bit_length())
        sl_bits = p_bits + (jblk - 1).bit_length()
        sl_mask = (1 << sl_bits) - 1
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (t_dim, n_s), 1)
        iota_gs = (
            iota_s
            if jblk == 1
            else jnp.concatenate(
                [iota_s + (k << p_bits) for k in range(jblk)], axis=1
            )
        )
        binfl = (1 << 12) if approx_div else 0

        def _bound(best):
            b = jnp.max(best[0]) | sl_mask
            return jnp.minimum((b + binfl + mask) & ~mask, done_th)

        def cond(state):
            j, k_cur, best, bound = state
            return ((k_cur & ~mask) < bound) & (j < cp)

        def body(state):
            j, k_cur, best, bound = state
            # this block's jblk cluster ids: scalar SMEM reads (clamped
            # at the tail; clamp duplicates are idempotent in the merge)
            cids = []
            k = k_cur
            for jj in range(jblk):
                cids.append(jnp.minimum(k & mask, c_last))
                jn = jnp.minimum(j + jj + 1, cp - 1)
                k = sched_ref[g, 0, jn]
            if jblk == 1:
                b = matb_ref[cids[0]]
            else:
                b = jnp.concatenate(
                    [matb_ref[c] for c in cids], axis=-1
                )
            out = _mm(a_sp, b, mm_passes)
            outs = [
                out[:, kk * 4 * n_s : (kk + 1) * 4 * n_s]
                for kk in range(jblk)
            ]
            best = _round_pick(
                outs, [None] * jblk, cids, best,
                n_s=n_s, iota_gs=iota_gs, sl_mask=sl_mask, p_bits=p_bits,
                approx_div=approx_div, excl_f=excl_f,
            )
            return j + jblk, k, best, _bound(best)

        best_key0 = (
            jax.lax.bitcast_convert_type(t_max[None, :], jnp.int32)
            & ~sl_mask
        )
        code0 = jnp.full((1, t_dim), -1, jnp.int32)
        best0 = (best_key0, code0)
        k0 = sched_ref[g, 0, 0]
        _, _, best, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), k0, best0, _bound(best0))
        )
        best_key, best_code = best
        out_t_ref[g] = jnp.where(
            best_code >= 0,
            jax.lax.bitcast_convert_type(best_key & ~sl_mask, jnp.float32),
            t_max[None, :],
        )
        out_code_ref[g] = best_code


def _kernel_binned(
    a_ref,  # (P, T, 16) consecutive cid1-major-sorted ray blocks
    sched_ref,  # (P, 1, 2) i32 SMEM: per-block [s0, s1] cluster ids
    matb_ref,  # (C, rows_b, 4S) cluster matrices (VMEM)
    out_t_ref,  # (P, 1, T)
    out_code_ref,  # (P, 1, T) i32: winning cid * S + slot (-1 = miss)
    *,
    n_s: int,
    approx_div: bool = False,
    excl: bool = False,
    mm_passes: int = 3,
):
    """Binned pass kernel — the round-5 work-volume attack (ROADMAP
    "kernel ceiling ledger"). The drain kernels spend by TILE CONSENSUS:
    ~12 cluster-units per 128-ray tile against a measured per-ray need
    of 1.34, and every scheduling scheme lands on the same
    MXU-depth-limited ~0.45-0.76 us/unit wall (the bilinear form
    contracts over K=16 of the 128-deep MXU; r4/r5 measurements). This
    kernel instead executes exactly the DISTINCT nearest-cluster ids
    inside each block of the cid1-major-sorted ray stream — ~1.02
    units/block (segment boundaries are rare at 263 segments over ~16k
    blocks) — with no shortlist drain, no while loop, and no per-round
    scalar extraction. Rays whose nearest cluster did not make the
    block's 2 schedule slots, and rays whose second-nearest cluster
    could still beat their pass-1 best, are SURVIVORS handled by the
    caller (ops/ray_sort.binned_trace: survivor-compacted drain pass
    with the multipass t_start skip mask — the proven-exact fallback).

    Exactness of extra/missing processing: the matmul evaluates faces
    regardless of boxes, any valid hit it finds is a true hit, and the
    packed-key min merge is idempotent — so processing extra clusters
    is always safe, and unprocessed clusters are exactly what the
    survivor condition accounts for. Schedule entries are -1 to skip
    (dead/pad blocks, single-segment blocks); outputs default to miss.

    The carried best rides the OUTPUT refs between the two rounds
    (pl.when bodies cannot return state): ``out_t`` stores exactly
    ``key & ~sl_mask`` bitcast to f32 and ``out_code``'s low slot bits
    equal the key's stolen LSBs (n_s is a power of two), so the packed
    key reconstructs losslessly."""
    assert n_s & (n_s - 1) == 0, "slot-bit key roundtrip needs 2^k slots"
    p_bits = max(1, (n_s - 1).bit_length())
    sl_mask = (1 << p_bits) - 1
    for p in range(a_ref.shape[0]):
        a = a_ref[p]  # (T, 16)
        excl_f = a[:, 14:15] if excl else None
        t_dim = a.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
        a_sp = _a_split(jnp.where(col < 10, a, 0.0), mm_passes)
        t_max = a[:, 13]
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (t_dim, n_s), 1)

        out_t_ref[p] = t_max[None, :]
        out_code_ref[p] = jnp.full((1, t_dim), -1, jnp.int32)

        def _round(s, p=p, a_sp=a_sp, t_max=t_max, excl_f=excl_f,
                   iota_s=iota_s, t_dim=t_dim):
            # carried best from the output refs (lossless roundtrip)
            t_cur = out_t_ref[p]
            code_cur = out_code_ref[p]
            key_cur = (
                jax.lax.bitcast_convert_type(t_cur, jnp.int32) & ~sl_mask
            ) | jnp.where(code_cur >= 0, code_cur & sl_mask, 0)
            b = matb_ref[s]
            out = _mm(a_sp, b, mm_passes)
            best = _round_pick(
                [out], [None], [s], (key_cur, code_cur),
                n_s=n_s, iota_gs=iota_s, sl_mask=sl_mask, p_bits=p_bits,
                approx_div=approx_div, excl_f=excl_f,
            )
            out_t_ref[p] = jnp.where(
                best[1] >= 0,
                jax.lax.bitcast_convert_type(
                    best[0] & ~sl_mask, jnp.float32
                ),
                t_max[None, :],
            )
            out_code_ref[p] = best[1]

        s0 = sched_ref[p, 0, 0]
        s1 = sched_ref[p, 0, 1]

        @pl.when(s0 >= 0)
        def _():
            _round(s0)

        @pl.when(s1 >= 0)
        def _():
            _round(s1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "interpret", "blocks_per_step", "mm_passes", "approx_div", "tile",
    ),
)
def trace_binned_pass(
    o: jnp.ndarray,  # (R, 3) — ALREADY cid1-major sorted, R % (tile*P)=0
    d: jnp.ndarray,
    t_max: jnp.ndarray,  # (R,) 0 for dead/pad lanes
    tables,
    sched: jnp.ndarray,  # (R // tile, 2) i32 block schedules (-1 skip)
    excl_code: jnp.ndarray | None = None,
    *,
    interpret: bool = False,
    blocks_per_step: int = 8,
    mm_passes: int = 3,
    approx_div: bool = False,
    tile: int = 128,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch for :func:`_kernel_binned` (see its docstring): one
    binned pass over a pre-sorted, pre-padded ray stream. Returns
    ``(t, face)`` in the GIVEN (sorted) order; t is packed-key
    truncated exactly like the drain kernels'. Single-level VMEM
    tables only (the bundled-scene case the binned path targets)."""
    ct: ClusterTables = tables.clusters
    r = o.shape[0]
    n_blocks = r // tile
    assert r % (tile * blocks_per_step) == 0
    assert sched.shape == (n_blocks, 2)
    s = ct.face_id.shape[1]
    if mm_passes == 2 and ct.mat_b2 is None:
        mm_passes = 3
    if mm_passes == 2:
        matb = ct.mat_b2
    else:
        matb = ct.mat_b
        if matb.shape[1] != 16:
            matb = jnp.pad(matb, ((0, 0), (0, 16 - matb.shape[1]), (0, 0)))
    b_rows = matb.shape[1]

    w = jnp.cross(o, d)
    ones = jnp.ones((r, 1), jnp.float32)
    inv_d = safe_inv_dir(d)
    use_excl = excl_code is not None
    if use_excl:
        ex = (excl_code.astype(jnp.int32) + 1).astype(jnp.float32)
        pad_cols = jnp.stack([ex, jnp.zeros((r,), jnp.float32)], axis=-1)
    else:
        pad_cols = jnp.zeros((r, 2), jnp.float32)
    a_mat = jnp.concatenate(
        [o, w, d, ones, inv_d, t_max[:, None], pad_cols], axis=-1
    ).reshape(n_blocks, tile, 16)

    p_fold = blocks_per_step
    kernel = functools.partial(
        _kernel_binned, n_s=s, approx_div=approx_div, excl=use_excl,
        mm_passes=mm_passes,
    )
    rs = pl.BlockSpec(
        (p_fold, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks // p_fold,),
        in_specs=[
            pl.BlockSpec(
                (p_fold, tile, 16), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (p_fold, 1, 2), lambda i: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (matb.shape[0], b_rows, 4 * s),
                lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(rs, rs),
        out_shape=(
            jax.ShapeDtypeStruct((n_blocks, 1, tile), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 1, tile), jnp.int32),
        ),
        interpret=interpret,
    )(a_mat, sched.reshape(n_blocks, 1, 2), matb)
    best_t = outs[0].reshape(r)
    code = outs[1].reshape(r)
    face = jnp.where(
        code >= 0,
        jnp.take(ct.face_id.reshape(-1), jnp.maximum(code, 0)),
        -1,
    ).astype(jnp.int32)
    return best_t, face


def _kernel_lockstep(
    a_ref,  # (L, T, 16) ray blocks: [o, w, d, 1, inv_d, t_max, excl, pad]
    near_ref,  # (L, 1, Cp) per-tile cluster entry distances (XLA)
    matb_ref,  # (C, rows_b, 4S) cluster matrices (VMEM)
    out_t_ref,  # (L, 1, T)
    out_code_ref,  # (L, 1, T) int32: winning cid * S + slot (-1 = miss)
    *rest,  # cap > 0: out_stop_ref (L, 1, T) int32 — the exit key
    n_s: int,
    cid_bits: int,
    any_hit: bool = False,
    approx_div: bool = False,
    excl: bool = False,
    mm_passes: int = 3,
    gang: int = 1,
    cap: int = 0,
):
    """Lockstep tile batching: the L tiles of one grid step run ONE fused
    round loop instead of L serial round loops (``_kernel``'s per-tile
    for-loop). Each round drains every still-pending tile's nearest
    shortlist cluster (``gang`` of them for gang > 1), issues L
    data-INDEPENDENT (T, 16) @ (16, 4S·gang) matmuls — consecutive
    serial rounds are chained matmul → epilogue → matmul, but the L
    matmuls of a lockstep round have no cross-tile dependence, so the
    compiler can overlap them — and applies ONE (L·T)-row epilogue
    (:func:`_round_pick` with per-row cluster-id columns).

    Per-tile semantics are bit-identical to the serial kernel: every
    tile drains its own shortlist in its own near order under its own
    prune bound, and rows of finished tiles are REVERTED after the merge
    (their speculative clamped-cluster candidates never land). The grid
    step's serial round count drops from sum(rounds_l) to max(rounds_l);
    with tiles pre-sorted by shortlist-union size (the gang partition's
    existing reorder) co-stepped tiles have similar round counts, so the
    lockstep waste (done tiles idling to the group max) is small. The r4
    frame profile showed kernel rounds = ~80% of a sorted trace leg and
    round cost is serial-latency-bound, so cutting rounds ~L× is the
    direct lever (ROADMAP round-4 profile table).

    ``cap`` > 0 bounds the fused loop at ``cap`` rounds (multipass
    recompaction pass 1 — ops/ray_sort.py ``sorted_trace_multipass``)
    and emits ``out_stop_ref``: each tile's minimum REMAINING shortlist
    key at exit, upper-bit-truncated (an int32 f32-bitcast). Keys are
    consumed in increasing order, so every key strictly below it was
    processed — the caller derives the per-ray survivor flag
    (``bitcast(best_t) > stop``) and the next pass's exact skip mask
    from it. A naturally-drained tile's stop is >= its prune bound >=
    every ray's best, so it reports no survivors.
    """
    L, t_dim = a_ref.shape[0], a_ref.shape[1]
    assert t_dim & (t_dim - 1) == 0, "lockstep needs power-of-two tiles"
    t_shift = t_dim.bit_length() - 1
    rows = L * t_dim
    mask = (1 << cid_bits) - 1
    import numpy as _np

    done_th = int(_np.float32(_INF).view(_np.int32)) & ~mask
    c_last = matb_ref.shape[0] - 1

    a_all = a_ref[...].reshape(rows, 16)
    excl_f = a_all[:, 14:15] if excl else None
    t_max = a_all[:, 13]  # (rows,)
    # per-tile A splits, hoisted: the matmuls stay per-tile so a round
    # never materializes the (rows, 4S·gang·L) cross product (VMEM)
    a_sps = []
    for l in range(L):
        a_l = a_ref[l]
        col_l = jax.lax.broadcasted_iota(jnp.int32, a_l.shape, 1)
        a_sps.append(_a_split(jnp.where(col_l < 10, a_l, 0.0), mm_passes))

    p_bits = max(1, (n_s - 1).bit_length())
    sl_bits = p_bits + (gang - 1).bit_length()
    sl_mask = (1 << sl_bits) - 1
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (rows, n_s), 1)
    iota_gs = (
        iota_s
        if gang == 1
        else jnp.concatenate(
            [iota_s + (k << p_bits) for k in range(gang)], axis=1
        )
    )
    # row → tile index, as a (1, rows) lane row (for best-state masks)
    # and a (rows, 1) column (for per-row cid operands)
    tile_row = jax.lax.broadcasted_iota(jnp.int32, (1, rows), 1) >> t_shift
    tile_col = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) >> t_shift
    )

    def _sel_row(vals):
        """(1, rows) i32 row holding vals[l] on tile l's lane span
        (i32 only: Mosaic rejects i1 splat/select chains with a
        'target bitwidth for truncation' error)."""
        acc = jnp.broadcast_to(vals[0], (1, rows))
        for l in range(1, L):
            acc = jnp.where(tile_row == l, vals[l], acc)
        return acc

    def _sel_col(vals):
        acc = jnp.broadcast_to(vals[0], (rows, 1))
        for l in range(1, L):
            acc = jnp.where(tile_col == l, vals[l], acc)
        return acc

    if any_hit:

        def _bound_l(best_key, best_code, l):
            seg = slice(l * t_dim, (l + 1) * t_dim)
            pending = jnp.where(
                best_code[:, seg] < 0, t_max[seg][None, :], 0.0
            )
            b = jnp.max(jax.lax.bitcast_convert_type(pending, jnp.int32))
            return jnp.minimum((b + mask) & ~mask, done_th)

    else:
        # approx_div bound inflation — see the serial kernel's binfl note
        binfl = (1 << 12) if approx_div else 0

        def _bound_l(best_key, best_code, l):
            seg = slice(l * t_dim, (l + 1) * t_dim)
            b = jnp.max(best_key[:, seg]) | sl_mask
            return jnp.minimum((b + binfl + mask) & ~mask, done_th)

    near0 = near_ref[...].reshape(L, -1)  # (L, Cp)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, near0.shape, 1)
    keys_all = (
        jax.lax.bitcast_convert_type(near0, jnp.int32) & ~mask
    ) | iota_c
    keys0 = tuple(keys_all[l : l + 1] for l in range(L))  # (1, Cp) each
    k0 = tuple(jnp.min(kl) for kl in keys0)

    best_key0 = (
        jax.lax.bitcast_convert_type(t_max[None, :], jnp.int32) & ~sl_mask
    )
    code0 = jnp.full((1, rows), -1, jnp.int32)
    bounds0 = tuple(_bound_l(best_key0, code0, l) for l in range(L))

    out_stop_ref = rest[0] if cap > 0 else None

    def cond(state):
        _, k_t, _, _, bnd_t = state[:5]
        alive = (k_t[0] & ~mask) < bnd_t[0]
        for l in range(1, L):
            alive = alive | ((k_t[l] & ~mask) < bnd_t[l])
        if cap > 0:
            alive = alive & (state[5] < cap)
        return alive

    def body(state):
        keys_t, k_t, best_key, best_code, bnd_t = state[:5]
        keys_n, k_n, acts, outs_l, cid_sets = [], [], [], [], []
        for l in range(L):
            kl, kc, bl = keys_t[l], k_t[l], bnd_t[l]
            act = (kc & ~mask) < bl
            acts.append(act)
            # drain up to `gang` shortlist keys, exactly like the serial
            # kernel's gang path, but gated by `act` (a finished tile
            # must not consume; its rows are reverted after the merge)
            cid0 = jnp.minimum(kc & mask, c_last)
            cids = [cid0]
            kl = jnp.where(act & (kl == kc), jnp.int32(0x7FFFFFFF), kl)
            cur = jnp.min(kl)
            for _ in range(1, gang):
                take_k = act & ((cur & ~mask) < bl)
                cids.append(
                    jnp.where(
                        take_k, jnp.minimum(cur & mask, c_last), cid0
                    )
                )
                kl = jnp.where(
                    take_k & (kl == cur), jnp.int32(0x7FFFFFFF), kl
                )
                cur = jnp.min(kl)
            keys_n.append(kl)
            k_n.append(cur)
            cid_sets.append(cids)
            if gang == 1:
                b = matb_ref[cid0]
            else:
                b = jnp.concatenate(
                    [matb_ref[c] for c in cids], axis=-1
                )
            outs_l.append(_mm(a_sps[l], b, mm_passes))
        out_cat = jnp.concatenate(outs_l, axis=0)  # (rows, 4S·gang)
        outs = [
            out_cat[:, k * 4 * n_s : (k + 1) * 4 * n_s]
            for k in range(gang)
        ]
        cid_cols = [
            _sel_col([cid_sets[l][k] for l in range(L)])
            for k in range(gang)
        ]
        nk, nc = _round_pick(
            outs, [None] * gang, cid_cols, (best_key, best_code),
            n_s=n_s, iota_gs=iota_gs, sl_mask=sl_mask, p_bits=p_bits,
            approx_div=approx_div, excl_f=excl_f,
        )
        # revert rows of finished tiles (their clamped speculative
        # cluster could hold never-shortlisted candidates)
        act_row = _sel_row([a.astype(jnp.int32) for a in acts]) == 1
        nk = jnp.where(act_row, nk, best_key)
        nc = jnp.where(act_row, nc, best_code)
        bounds_n = tuple(_bound_l(nk, nc, l) for l in range(L))
        out = (tuple(keys_n), tuple(k_n), nk, nc, bounds_n)
        if cap > 0:
            out = out + (state[5] + 1,)
        return out

    init = (keys0, k0, best_key0, code0, bounds0)
    if cap > 0:
        init = init + (jnp.int32(0),)
    fin = jax.lax.while_loop(cond, body, init)
    k_fin, best_key, best_code = fin[1], fin[2], fin[3]
    for l in range(L):
        seg = slice(l * t_dim, (l + 1) * t_dim)
        seg_c = best_code[:, seg]
        out_t_ref[l] = jnp.where(
            seg_c >= 0,
            jax.lax.bitcast_convert_type(
                best_key[:, seg] & ~sl_mask, jnp.float32
            ),
            t_max[seg][None, :],
        )
        out_code_ref[l] = seg_c
        if cap > 0:
            # the tile's min remaining key, cid bits cleared: every key
            # strictly below it was consumed this pass. A remaining key
            # at/above the miss sentinel's truncation (done_th) is no
            # genuine cluster — shortlist entries are strictly < t_max
            # while the sentinel is exactly F32_MAX — so the tile is
            # drained: report int-max, which no ray's best exceeds.
            # (A genuine near within one cid-truncation bucket of
            # F32_MAX would be misread as the sentinel — the same
            # last-bucket-at-t_max knife edge the packed acceptance
            # already concedes, and unreachable at scene scale.)
            sb = k_fin[l] & ~mask
            sb = jnp.where(sb >= done_th, jnp.int32(0x7FFFFFFF), sb)
            out_stop_ref[l] = jnp.broadcast_to(sb, (1, t_dim))


def _kernel_two_level(
    a_ref,  # (1, T, 16) ray block: [o, w, d, 1, inv_d, t_max, pad, pad]
    snear_ref,  # (1, 1, C2p) per-SUPER tile entry distances (XLA-computed)
    cbox_ref,  # (C2, 8, G) child boxes, transposed per super (VMEM)
    matb_ref,  # (C, 16, 4S) cluster matrices (HBM; C = C2*G with pads)
    out_t_ref,  # (1, 1, T)
    out_code_ref,  # (1, 1, T) int32: winning cid * S + slot (-1 = miss)
    *rest,  # pairs: out_code{2,3}_ref + out_amb_ref (1, 1, T);
    #         then b_scratch, dma_sem
    n_s: int,
    g: int,
    sid_bits: int,
    j_bits: int,
    any_hit: bool = False,
    approx_div: bool = False,
    pairs: bool = False,
    excl: bool = False,
    mm_passes: int = 3,
):
    """Two-level variant of :func:`_kernel` for large scenes: an outer
    near-ordered loop over supercluster boxes (tested at the XLA level)
    gates an inner loop that slab-tests the super's G child boxes
    *in-kernel* and streams only the children actually hit — so the
    per-tile box work is O(C2 + supers_hit x G) instead of O(C), the
    scaling wall of BASELINE config #5. Key packing, bit-exact epilogue,
    and the conservative int-key t-prune bound are identical to
    :func:`_kernel`."""
    if pairs:
        out_code2_ref, out_code3_ref, out_amb_ref, b_scratch, dma_sem = rest
    else:
        out_code2_ref, out_code3_ref, out_amb_ref = None, None, None
        b_scratch, dma_sem = rest
    a = a_ref[0]  # (T, 16)
    t_dim = a.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    a_mm = jnp.where(col < 10, a, 0.0)
    a_sp = _a_split(a_mm, mm_passes)
    o_col = a[:, 0:3]  # (T, 3)
    inv_d = a[:, 10:13]
    t_max = a[:, 13]  # (T,)
    excl_f = a[:, 14:15] if excl else None  # see _kernel_one_tile

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

    # bf16-underestimate inflation of the prune bound in pairs mode —
    # see _kernel_one_tile's binfl comment
    binfl = (1 << 9) if pairs else 0

    if any_hit:
        def _bound_raw(best):
            pending = jnp.where(best[1] < 0, t_max[None, :], 0.0)
            return jnp.max(jax.lax.bitcast_convert_type(pending, jnp.int32))
    else:
        def _bound_raw(best):
            # `| sl_mask` restores the truncated LSBs to an upper bound
            # of the true best t (conservative prune); pairs mode
            # anchors on the ROBUST slot — see _kernel_one_tile._bound
            return (
                jnp.max(best[4 if len(best) == 6 else 0]) | sl_mask
            ) + binfl

    def _bound_s(b):
        return jnp.minimum((b + smask) & ~smask, done_s)

    def _bound_j(b):
        return jnp.minimum((b + jmask) & ~jmask, done_j)

    def _dma(slot, cid):
        return pltpu.make_async_copy(
            matb_ref.at[cid], b_scratch.at[slot], dma_sem.at[slot]
        )

    def inner_cond(state):
        return state[5]  # cur_valid

    def inner_body(state):
        ckeys, ck_cur, best, bound, slot, _valid, sid = state
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
        out = _mm(a_sp, b, mm_passes)
        out_mag = (
            jnp.dot(
                jnp.abs(a_sp[0]), jnp.abs(_b_hi(b, mm_passes)),
                preferred_element_type=jnp.float32,
            )
            if pairs
            else None
        )
        best = _round_pick(
            [out], [out_mag if pairs else None], [cid], best,
            n_s=n_s, iota_gs=iota_s, sl_mask=sl_mask,
            p_bits=sl_bits, approx_div=approx_div, excl_f=excl_f,
        )
        bound = _bound_raw(best)
        return (ckeys, ck_nxt, best, bound, 1 - slot, nxt_valid, sid)

    def outer_cond(state):
        skeys, sk_cur, best, bound = state
        return (sk_cur & ~smask) < _bound_s(bound)

    def outer_body(state):
        skeys, sk_cur, best, bound = state
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
            (ckeys, ck0, best, bound, 0, cvalid0, sid),
        )
        best, bound = inner[2], inner[3]
        skeys = jnp.where(skeys == sk_cur, jnp.int32(0x7FFFFFFF), skeys)
        return skeys, jnp.min(skeys), best, bound

    best_key0 = (
        jax.lax.bitcast_convert_type(t_max[None, :], jnp.int32) & ~sl_mask
    )
    code0 = jnp.full((1, t_dim), -1, jnp.int32)
    best0 = (
        (best_key0, code0, best_key0, code0, best_key0, code0)
        if pairs
        else (best_key0, code0)
    )
    bound0 = _bound_raw(best0)
    out = jax.lax.while_loop(
        outer_cond, outer_body, (skeys0, sk0, best0, bound0)
    )
    best = out[2]
    out_t_ref[0] = jnp.where(
        best[1] >= 0,
        jax.lax.bitcast_convert_type(best[0] & ~sl_mask, jnp.float32),
        t_max[None, :],
    )
    out_code_ref[0] = best[1]
    if pairs:
        out_code2_ref[0] = best[3]
        out_code3_ref[0] = best[5]
        out_amb_ref[0] = _amb_flag(best, sl_mask)


def is_two_level(ct) -> bool:
    """Whether the trace dispatch picks the two-level supercluster
    kernel: the (C2, 8, G) child-box table must fit the VMEM pin budget
    (past it, the single-level HBM-streaming path takes over —
    ct.box always carries all C cluster boxes, pads inverted-empty)."""
    return (
        ct.super_box is not None
        and int(ct.child_box_t.size) * 4 <= 8 * 1024 * 1024
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile", "interpret", "any_hit", "derive_uv", "kernel_near",
        "tiles_per_step", "approx_div", "exact_pairs", "raw_pair",
        "gang", "gang_frac", "mm_passes", "pipeline_rounds", "lockstep",
        "sched_rounds", "cap", "return_stop",
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
    exact_pairs: bool = True,
    raw_pair: bool = False,
    gang: int = 0,
    gang_frac: int = 8,
    excl_code: jnp.ndarray | None = None,
    mm_passes: int = 3,
    pipeline_rounds: bool = True,
    lockstep: bool = False,
    sched_rounds: int = 0,
    cap: int = 0,
    t_start: jnp.ndarray | None = None,
    return_stop: bool = False,
) -> Hit:
    """Drop-in closest-hit using the Pallas tile kernel. With ``any_hit``
    the per-tile rounds stop as soon as every live ray has found *some*
    valid hit (shadow-ray semantics — the reference's
    rayIntersectBVHAnyHit, render.ts:468-480); the returned t is then any
    valid hit, not necessarily the closest. ``tiles_per_step`` > 1 folds
    several ray tiles into one grid step (single-level kernel only) to
    amortize the fixed per-step cost; results are bit-identical.

    ``exact_pairs`` (closest-hit only) carries the kernel's TOP-2
    candidates out and re-adjudicates them with exact f32
    Möller–Trumbore (:func:`adjudicate_pair`), with margin-widened
    in-kernel validity gates so bf16-knife-edge true winners are never
    dropped — the production TPU path then matches the exact-arithmetic
    path everywhere except double-knife-edge cases (two wrong candidates
    ahead of the true winner). ``raw_pair`` returns the raw
    ``(t, face1, face2)`` triple (sorted-trace callers adjudicate in
    original ray order after unsorting).

    Multipass recompaction hooks (ops/ray_sort.py
    ``sorted_trace_multipass``): ``cap`` bounds the lockstep round loop
    (capped-pass semantics — requires the lockstep gang-all single-level
    VMEM path; other configurations run uncapped, reporting an
    everything-processed stop key). ``t_start`` (R,) f32 masks clusters
    whose per-ray entry value is below it out of the tile shortlists
    (provably processed by an earlier pass). ``return_stop`` returns
    ``(result, stop)`` where stop is the per-ray int32 exit key
    (f32-bitcast, cid bits cleared): a ray is a pass survivor iff
    ``bitcast(hit.t) > stop``."""
    ct: ClusterTables = tables.clusters
    r0 = o.shape[0]
    if active is None:
        active = jnp.ones((r0,), bool)
    two_level = is_two_level(ct)
    step = tile * (1 if two_level else max(1, tiles_per_step))
    if t_start is not None:
        # the skip mask's "processed" bound was built from single-level
        # cluster-box nears; a two-level pass would compare it against
        # SUPER-box entries — a different quantity
        assert not two_level, "t_start skip mask needs single-level"
    if r0 % step:
        pad = step - r0 % step
        o = jnp.concatenate([o, jnp.ones((pad, 3), o.dtype)], axis=0)
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)], axis=0)
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), t_max.dtype)])
        active = jnp.concatenate([active, jnp.zeros((pad,), bool)])
        if t_start is not None:
            t_start = jnp.concatenate(
                [t_start, jnp.zeros((pad,), t_start.dtype)]
            )
    r = o.shape[0]
    n_tiles = r // tile
    t_max = jnp.where(active, t_max, 0.0)

    c = ct.n_clusters
    s = ct.face_id.shape[1]
    # lane-dim padding for the near vector (supers when two-level)
    n_boxes = ct.super_box.shape[0] if two_level else c
    cp = max(128, -(-n_boxes // 128) * 128)
    # mm_passes=2: the folded matmul rides the PRE-SPLIT bf16 table
    # (ClusterTables.mat_b2, same bytes as the f32 one) — see _mm
    if mm_passes == 2 and ct.mat_b2 is None:
        mm_passes = 3  # tables built before the split existed
    if mm_passes == 2:
        matb = ct.mat_b2
    else:
        matb = ct.mat_b
        if matb.shape[1] != 16:
            matb = jnp.pad(matb, ((0, 0), (0, 16 - matb.shape[1]), (0, 0)))
    b_rows, b_bytes = matb.shape[1], matb.dtype.itemsize
    # tables above the VMEM budget stay in HBM with per-round DMA
    hbm = two_level or (c * b_rows * 4 * s * b_bytes) > 12 * 1024 * 1024

    w = jnp.cross(o, d)
    ones = jnp.ones((r, 1), jnp.float32)
    inv_d = safe_inv_dir(d)
    # column 14 carries the source-face-duplicate exclusion code as
    # float(code + 1) (exact for codes < 2^24; 0 = none — primary rays,
    # pad rows). See _round_pick's exclusion note.
    use_excl = excl_code is not None
    if use_excl:
        ex = (excl_code.astype(jnp.int32) + 1).astype(jnp.float32)
        if r > r0:
            ex = jnp.concatenate([ex, jnp.zeros((r - r0,), jnp.float32)])
        pad_cols = jnp.stack(
            [ex, jnp.zeros((r,), jnp.float32)], axis=-1
        )
    else:
        pad_cols = jnp.zeros((r, 2), jnp.float32)
    a_mat = jnp.concatenate(
        [o, w, d, ones, inv_d, t_max[:, None], pad_cols], axis=-1
    ).reshape(n_tiles, tile, 16)

    from .cluster_trace import tile_nears_fused

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
        # fused per-axis slab accumulation (ops/cluster_trace.py
        # tile_nears_fused): bit-identical to the _boxes_near map, ~10%
        # cheaper on chip (no (…, C, 3) stacked temporaries)
        near_tc = tile_nears_fused(
            o, inv_d, t_max, near_boxes, tile, pad_to=cp,
            t_start=t_start,
        ).reshape(n_tiles, 1, cp)

    pairs = exact_pairs and not any_hit
    g_step = 1 if two_level else max(1, min(tiles_per_step, n_tiles))
    grid = (n_tiles // g_step,)
    # enough mantissa-LSB bits to carry any (padded) box id in the key
    cid_bits = max(1, (cp - 1).bit_length())
    out_shape = (
        jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.int32),
    ) + (
        (jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.int32),) * 3
        if pairs
        else ()
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
            pairs=pairs,
            excl=use_excl,
            mm_passes=mm_passes,
        )
        outs = pl.pallas_call(
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
            out_specs=(row_spec, row_spec)
            + ((row_spec,) * 3 if pairs else ()),
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((2, b_rows, 4 * s), matb.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(a_mat, near_tc.reshape(n_tiles, 1, cp), ct.child_box_t, matb)
    else:
        if hbm:
            matb_spec = pl.BlockSpec(memory_space=pl.ANY)
            scratch_shapes = [
                pltpu.VMEM((2, b_rows, 4 * s), matb.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        else:
            matb_spec = pl.BlockSpec(
                (c, b_rows, 4 * s),
                lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            scratch_shapes = []

        def run_single(a_in, near_in, gs, gang_n, lock=False, cap_n=0):
            n_t = a_in.shape[0]
            if lock:
                kernel = functools.partial(
                    _kernel_lockstep, n_s=s, cid_bits=cid_bits,
                    any_hit=any_hit, approx_div=approx_div,
                    excl=use_excl, mm_passes=mm_passes, gang=gang_n,
                    cap=cap_n,
                )
            else:
                kernel = functools.partial(
                    _kernel, n_s=s, cid_bits=cid_bits, any_hit=any_hit,
                    hbm=hbm, in_near=in_near, approx_div=approx_div,
                    pairs=pairs, gang=gang_n, excl=use_excl,
                    mm_passes=mm_passes,
                    pipelined=pipeline_rounds and not hbm,
                )
            rs = pl.BlockSpec(
                (gs, 1, tile), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
            asp = pl.BlockSpec(
                (gs, tile, 16), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
            if in_near:
                nsp = pl.BlockSpec(
                    (1, 8, cp), lambda i: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            else:
                nsp = pl.BlockSpec(
                    (gs, 1, cp), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            n_extra = 3 if pairs else (1 if cap_n > 0 else 0)
            osh = (
                jax.ShapeDtypeStruct((n_t, 1, tile), jnp.float32),
                jax.ShapeDtypeStruct((n_t, 1, tile), jnp.int32),
            ) + (jax.ShapeDtypeStruct((n_t, 1, tile), jnp.int32),) * n_extra
            return pl.pallas_call(
                kernel,
                grid=(n_t // gs,),
                in_specs=[asp, nsp, matb_spec],
                out_specs=(rs, rs) + (rs,) * n_extra,
                out_shape=osh,
                scratch_shapes=scratch_shapes,
                interpret=interpret,
            )(a_in, near_in, matb)

        # Miss-tail gang partition: per-tile shortlist unions are wildly
        # skewed (p50 = 1 round, p99 ≈ 200 — tiles holding true-miss
        # rays, whose prune bound never drops, carry ~half of ALL
        # rounds). Sorting tiles by union size and running the heaviest
        # 1/gang_frac through a gang-of-K round loop cuts their serial
        # round count ~K× at near-constant total epilogue work (their
        # prune rarely fires, so the ganged clusters were going to be
        # processed anyway). Light tiles keep the one-cluster rounds
        # where the prune's early exit does the winning.
        # gang_frac == 0: gang EVERY tile (one launch, no union-count
        # sort / reorder legs). Light tiles pay up to K× extra epilogue
        # work past their prune point, but their serial rounds drop ~K×
        # too — measured per frame (tools/frame_profile.py gangall arms).
        # Lockstep tile batching (see _kernel_lockstep): the L tiles of a
        # grid step share one fused round loop, cutting the step's serial
        # round count from sum(rounds_l) to max(rounds_l). Per-round
        # epilogue VMEM scales with tile·L·4S·gang f32, so the in-lockstep
        # gang is capped to keep the round block ≤ ~4 MB; heavy tiles
        # still gang (lockstep × gang compose), light tiles run gang=1.
        lock = (
            lockstep and not hbm and not in_near and not pairs
            and g_step > 1 and tile & (tile - 1) == 0
        )
        if lock:
            gang_l = max(
                1,
                min(gang, (4 * 1024 * 1024) // (g_step * tile * 4 * s * 4)),
            )
        # capped multipass pass 1: only on the lockstep gang-all single
        # launch (the production default); any other configuration runs
        # uncapped and reports the everything-processed stop sentinel
        use_cap = (
            cap > 0 and lock and gang >= 2 and gang_frac == 0
            and not any_hit and sched_rounds == 0
        )
        if (
            sched_rounds > 0 and not pairs and not any_hit and not hbm
            and not in_near
        ):
            # schedule-fed kernel (:func:`_kernel_sched`): the per-tile
            # cluster order is sorted HERE — one (n_tiles, Cp) row-sort
            # of the same packed (near | cid) keys the serial kernel
            # builds in-kernel — and handed over as SMEM scalars, so the
            # kernel round loop has no shortlist drain and no per-round
            # vector→scalar extraction. No heavy/light partition: the
            # jblk-wide blocks amortize the per-round machinery on every
            # tile (speculative tail entries are idempotent).
            cmask = (1 << cid_bits) - 1
            iota_c2 = jax.lax.broadcasted_iota(
                jnp.int32, (n_tiles, cp), 1
            )
            skeys = (
                jax.lax.bitcast_convert_type(
                    near_tc.reshape(n_tiles, cp), jnp.int32
                )
                & ~cmask
            ) | iota_c2
            sched = jax.lax.sort(skeys, dimension=1, is_stable=False)
            kernel = functools.partial(
                _kernel_sched, n_s=s, cid_bits=cid_bits,
                approx_div=approx_div, excl=use_excl,
                mm_passes=mm_passes, jblk=sched_rounds,
            )
            rs = pl.BlockSpec(
                (g_step, 1, tile), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
            asp = pl.BlockSpec(
                (g_step, tile, 16), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
            ssp = pl.BlockSpec(
                (g_step, 1, cp), lambda i: (i, 0, 0),
                memory_space=pltpu.SMEM,
            )
            outs = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[asp, ssp, matb_spec],
                out_specs=(rs, rs),
                out_shape=(
                    jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.float32),
                    jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.int32),
                ),
                interpret=interpret,
            )(a_mat, sched.reshape(n_tiles, 1, cp), matb)
            n_heavy = -1
        elif (
            gang >= 2 and gang_frac == 0 and not hbm and not in_near
            and not any_hit
        ):
            if lock:
                # one launch, every tile ganged INSIDE the lockstep — but
                # still union-sorted: lockstep groups pay max(rounds_l),
                # so homogeneous groups matter (CPU sim: sorted grouping
                # 1262 vs ray-order 4377 serial rounds at L=8,
                # tools/lockstep_sim.py)
                counts = jnp.sum(near_tc[:, 0, :] < _INF, axis=1)
                order = jnp.argsort(-counts)
                inv_order = jnp.argsort(order)
                outs = run_single(
                    jnp.take(a_mat, order, axis=0),
                    jnp.take(near_tc, order, axis=0),
                    g_step, gang_l, lock=True,
                    cap_n=cap if use_cap else 0,
                )
                outs = tuple(
                    jnp.take(o_, inv_order, axis=0) for o_ in outs
                )
            else:
                outs = run_single(a_mat, near_tc, g_step, gang)
            n_heavy = -1
        else:
            n_heavy = 0
            if gang >= 2 and not hbm and not in_near and not any_hit:
                n_heavy = (n_tiles // max(2, gang_frac) // g_step) * g_step
        if n_heavy >= 1 and n_tiles - n_heavy >= g_step:
            counts = jnp.sum(near_tc[:, 0, :] < _INF, axis=1)
            order = jnp.argsort(-counts)  # heavy tiles first (stable)
            inv_order = jnp.argsort(order)
            a_p = jnp.take(a_mat, order, axis=0)
            near_p = jnp.take(near_tc, order, axis=0)
            if lock:
                outs_h = run_single(
                    a_p[:n_heavy], near_p[:n_heavy], g_step, gang_l,
                    lock=True,
                )
            else:
                outs_h = run_single(
                    a_p[:n_heavy], near_p[:n_heavy], 1, gang
                )
            outs_n = run_single(
                a_p[n_heavy:], near_p[n_heavy:], g_step, 1, lock=lock
            )
            outs = tuple(
                jnp.take(
                    jnp.concatenate([oh, on], axis=0), inv_order, axis=0
                )
                for oh, on in zip(outs_h, outs_n)
            )
        elif n_heavy == 0:
            outs = run_single(a_mat, near_tc, g_step, 1, lock=lock)
    best_t, best_code = outs[0], outs[1]

    def code_to_face(code):
        return jnp.where(
            code >= 0,
            jnp.take(ct.face_id.reshape(-1), jnp.maximum(code, 0)),
            -1,
        ).astype(jnp.int32)

    stop = None
    if return_stop:
        assert not pairs, "return_stop is a non-pairs hook"
        if not two_level and use_cap:
            stop = outs[2].reshape(r)[:r0]
        else:
            # uncapped fallback: everything processed, no survivors
            # (0x7FFFFFFF > bitcast of any finite non-negative f32)
            stop = jnp.full((r0,), jnp.int32(0x7FFFFFFF))

    best_t = best_t.reshape(r)[:r0]
    code = best_code.reshape(r)[:r0]
    face = code_to_face(code)

    if pairs:
        face2 = code_to_face(outs[2].reshape(r)[:r0])
        face3 = code_to_face(outs[3].reshape(r)[:r0])
        amb = outs[4].reshape(r)[:r0]
        if raw_pair:
            # sorted-trace callers unsort, then adjudicate in original
            # ray order (fewer unsort scatters)
            return best_t, face, face2, face3, amb
        return adjudicate_compact(
            o[:r0], d[:r0], t_max[:r0], best_t,
            (face, face2, face3), amb, tables,
        )

    if any_hit or not derive_uv:
        # shadow-ray callers only consume the hit flag, and sorted-trace
        # callers re-derive u/v in original ray order (fewer unsort
        # scatters) — skip the barycentric re-derivation here
        zeros_uv = jnp.zeros_like(best_t)
        hit = Hit(t=best_t, u=zeros_uv, v=zeros_uv, face=face)
        return (hit, stop) if return_stop else hit

    res = rederive_uv(o[:r0], d[:r0], best_t, face, tables)
    return (res, stop) if return_stop else res


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
    from .strictf import scross, sdot3

    hit_mask = face >= 0
    tri = jnp.take(tables.tri, jnp.maximum(face, 0), axis=0)
    p0, e1, e2 = tri[:, 0:3], tri[:, 3:6], tri[:, 6:9]
    hvec = scross(d, e2)
    det = sdot3(e1, hvec)
    svec = o - p0
    # true division, contraction-proof products — WGSL rounding
    # (render.ts:406-408; ops/strictf.py)
    det_safe = jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
    # correctly-rounded divides (detmath): a plain fused f32 divide on
    # XLA:TPU is 1-2 ulp off XLA:CPU's, and u/v feed Phong normals →
    # bounce directions → chaotic cross-platform divergence
    from .detmath import det_div

    u = det_div(sdot3(svec, hvec), det_safe)
    qvec = scross(svec, e1)
    v = det_div(sdot3(d, qvec), det_safe)
    t_exact = det_div(sdot3(e2, qvec), det_safe)
    return Hit(
        t=jnp.where(hit_mask, t_exact, t),
        u=jnp.where(hit_mask, u, 0.0),
        v=jnp.where(hit_mask, v, 0.0),
        face=face,
    )


def adjudicate_candidates(
    o: jnp.ndarray,  # (R, 3)
    d: jnp.ndarray,  # (R, 3)
    t_fallback: jnp.ndarray,  # (R,) the segment's t_max (miss sentinel)
    faces,  # tuple of (R,) i32 candidate faces, nearest-ish first (-1 = none)
    tables,
) -> Hit:
    """Exact f32 re-adjudication of the kernel's carried candidates.

    Each candidate face is re-evaluated with the exact classic
    Möller–Trumbore test under the reference's validity semantics
    (backface/parallel cull ``det < EPSILON²``, barycentrics tested
    against det before the division, strict t interval — render.ts:
    346-410 and ops/intersect.py, contraction-proof per strictf.py),
    and the valid candidate with the smallest exact t wins. This erases
    the kernel's bf16x3/packed-key knife-edge decisions: a
    margin-accepted false hit is rejected here, a near-tie ordering
    flip is re-ordered here, and a margin-carried true winner survives.
    With the kernel's carried set (top-2 margin-ranked + nearest
    strictly-bf16-valid), a miss now requires THREE independent
    knife-edge events on one ray.
    """
    from .strictf import scross, sdot3

    def eval_face(face):
        present = face >= 0
        tri = jnp.take(tables.tri, jnp.maximum(face, 0), axis=0)
        p0, e1, e2 = tri[:, 0:3], tri[:, 3:6], tri[:, 6:9]
        h = scross(d, e2)
        det = sdot3(e1, h)
        s = o - p0
        u_num = sdot3(s, h)
        q = scross(s, e1)
        v_num = sdot3(d, q)
        t_num = sdot3(e2, q)
        culled = det < _EPS2
        bary_ok = (
            (u_num >= 0.0)
            & (u_num <= det)
            & (v_num >= 0.0)
            & (u_num + v_num <= det)
        )
        # true division — WGSL rounding (render.ts:406-408)
        det_safe = jnp.where(culled, 1.0, det)
        t = t_num / det_safe
        valid = (
            present
            & ~culled
            & bary_ok
            & (t > MIN_DIST)
            & (t < t_fallback)
        )
        return valid, t, u_num / det_safe, v_num / det_safe

    hit, bt, bu, bv, bf = (
        jnp.zeros(o.shape[:1], bool),
        t_fallback,
        jnp.zeros(o.shape[:1], jnp.float32),
        jnp.zeros(o.shape[:1], jnp.float32),
        jnp.full(o.shape[:1], -1, jnp.int32),
    )
    for face in faces:
        v, t, u, w = eval_face(face)
        # strict < keeps the earlier candidate on exact ties, matching
        # the reference's first-processed-wins interval semantics
        take = v & (~hit | (t < bt))
        bt = jnp.where(take, t, bt)
        bu = jnp.where(take, u, bu)
        bv = jnp.where(take, w, bv)
        bf = jnp.where(take, face, bf)
        hit = hit | v
    return Hit(
        t=jnp.where(hit, bt, t_fallback),
        u=jnp.where(hit, bu, 0.0),
        v=jnp.where(hit, bv, 0.0),
        face=bf.astype(jnp.int32),
    )


def adjudicate_pair(o, d, t_fallback, face1, face2, tables) -> Hit:
    """Two-candidate convenience wrapper over
    :func:`adjudicate_candidates` (unit tests / external callers)."""
    return adjudicate_candidates(o, d, t_fallback, (face1, face2), tables)


def adjudicate_compact(
    o: jnp.ndarray,  # (R, 3)
    d: jnp.ndarray,  # (R, 3)
    t_fallback: jnp.ndarray,  # (R,) the segment's t_max (miss sentinel)
    t1: jnp.ndarray,  # (R,) kernel best t (only its miss sentinel is used)
    faces,  # (face1, face2, face3) carried candidates
    amb: jnp.ndarray,  # (R,) i32 kernel ambiguity flag (_amb_flag)
    tables,
    cap_frac: int = 64,
) -> Hit:
    """:func:`adjudicate_candidates` restricted to the rays that need it.

    The kernel's ``amb`` flag marks the only rays whose exact verdict can
    differ from the carried winner (non-robust winner, or a near-tie
    within the bf16x3 error band — see :func:`_amb_flag`); measured
    full-frame flag rates are well under 1%. Unambiguous rays take the
    single-gather :func:`rederive_uv` (exact t/u/v of the proven winner),
    and the flagged rays are COMPACTED into a fixed R/cap_frac batch for
    the full 3-candidate exact test — replacing three dense per-lane
    (R, 9) row gathers with one dense + two tiny ones. If the flag count
    ever exceeds the capacity, a ``lax.cond`` falls back to the dense
    path, so the result equals :func:`adjudicate_candidates` on the
    carried set EXACTLY in every case."""
    r = o.shape[0]
    f1, f2, f3 = faces
    cap = -(-r // cap_frac)
    cap = max(128, -(-cap // 128) * 128)
    if cap >= r:  # tiny batches: dense wins
        return adjudicate_candidates(o, d, t_fallback, faces, tables)

    base = rederive_uv(o, d, jnp.where(f1 >= 0, t1, t_fallback), f1, tables)

    flag = amb != 0
    # fill slot = r (out of range): gathers clip to a real row (result
    # unused), the merge scatter drops them
    (idx,) = jnp.nonzero(flag, size=cap, fill_value=r)

    def takec(x):
        return jnp.take(x, idx, axis=0, mode="clip")

    sub = adjudicate_candidates(
        takec(o), takec(d), takec(t_fallback),
        (takec(f1), takec(f2), takec(f3)), tables,
    )

    def put(b, s):
        return b.at[idx].set(s, mode="drop")

    merged = Hit(
        t=put(base.t, sub.t),
        u=put(base.u, sub.u),
        v=put(base.v, sub.v),
        face=put(base.face, sub.face),
    )
    n_amb = jnp.sum(flag.astype(jnp.int32))
    return jax.lax.cond(
        n_amb <= cap,
        lambda: merged,
        lambda: adjudicate_candidates(o, d, t_fallback, faces, tables),
    )
