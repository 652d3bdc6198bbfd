"""Pallas TPU kernel for the front-to-back tile blend (inference path).

The XLA blend (`blend.py`) vmaps a while_loop over tiles, which runs all
tiles in lockstep until the *slowest* tile finishes.  This kernel maps the
tile dimension onto the Pallas grid instead, so each 16x16 tile:

* streams its pre-gathered, depth-ordered feature block ([Kt, 11] in VMEM,
  contiguous — no random access in the hot loop);
* iterates chunks of 128 gaussians with a per-tile ``lax.while_loop`` that
  exits as soon as its own list is exhausted or every pixel is saturated
  (T < T_threshold);
* computes the [256, 128] alpha matrix on the VPU, the exclusive
  transmittance via a 7-step Hillis-Steele prefix product (no lax.cumprod
  dependency in Mosaic), and accumulates color with a [256,128]x[128,3]
  MXU matmul.  Argmax-style selections use mask-sum picks instead of
  gathers (vector-unit friendly).

Outputs and semantics are identical to ``blend.blend_tiles``; equivalence is
pinned by ``tests/test_pallas_blend.py``.  Inference only — gradients go
through the XLA scan path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TILE
from .blend import ALPHA_EPS, ALPHA_MAX, TileOutputs

CHUNK = 128
NPIX = TILE * TILE


def _prefix_prod(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix product along axis 1 (Hillis-Steele doubling)."""
    n = x.shape[1]
    d = 1
    while d < n:
        shifted = jnp.concatenate(
            [jnp.ones_like(x[:, :d]), x[:, :-d]], axis=1)
        x = x * shifted
        d *= 2
    return x


def _pick(values: jnp.ndarray, col: jnp.ndarray, sel: jnp.ndarray) -> jnp.ndarray:
    """values [256, C] (or [C] broadcast), sel [256] column index ->
    per-row picked value, via a one-hot mask sum (no gather)."""
    onehot = col == sel[:, None]
    if values.ndim == 1:
        values = values[None, :]
    return jnp.sum(jnp.where(onehot, values, 0.0), axis=1)


def _kernel(count_ref, origin_ref, feat_ref, gidx_ref,
            color_ref, depth_ref, didx_ref, cidx_ref, dw_ref, cw_ref, T_ref,
            entry_ref,
            *, n_chunks_static: int, opaque_threshold: float,
            t_threshold: float):
    t = pl.program_id(0)
    # integer iota (Mosaic rejects float iota), then cast
    ri = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 1), 0)[:, 0]
    px = jnp.mod(ri, TILE).astype(jnp.float32) + origin_ref[t, 0]
    py = (ri // TILE).astype(jnp.float32) + origin_ref[t, 1]
    col = jax.lax.broadcasted_iota(jnp.int32, (NPIX, CHUNK), 1)

    n_chunks = (count_ref[t] + CHUNK - 1) // CHUNK

    # State lives in the output refs.  Chunks advance inside a
    # ``lax.while_loop`` with REF-based dynamic slices on the sublane dim
    # (supported by Mosaic; value-space dynamic_slice and lane-dim dynamic
    # indexing are not — gidx is therefore passed [n_chunks, CHUNK]).  A
    # static unrolled loop + pl.when compiles the same math, but the remote
    # Mosaic compile time explodes with unroll depth (a Kt=1024 kernel did
    # not converge in 25 min; the while form compiles like the 1-chunk one).
    # Output layouts put the 256-pixel axis last (the TPU lane dimension):
    # trailing dims of size 1/3 would be lane-padded to 128 and blow VMEM.
    color_ref[0, :, :] = jnp.zeros((3, NPIX), jnp.float32)
    depth_ref[0, 0, :] = jnp.zeros((NPIX,), jnp.float32)
    didx_ref[0, 0, :] = jnp.full((NPIX,), -1, jnp.int32)
    cidx_ref[0, 0, :] = jnp.full((NPIX,), -1, jnp.int32)
    dw_ref[0, 0, :] = jnp.zeros((NPIX,), jnp.float32)
    cw_ref[0, 0, :] = jnp.zeros((NPIX,), jnp.float32)
    T_ref[0, 0, :] = jnp.ones((NPIX,), jnp.float32)
    # per-chunk entry transmittance (the custom-VJP backward's residual);
    # rows of unprocessed chunks stay 0, processed rows are > t_threshold
    entry_ref[0, :, :] = jnp.zeros((n_chunks_static, NPIX), jnp.float32)

    def cond(c):
        return (c < n_chunks) & (jnp.max(T_ref[0, 0, :]) > t_threshold)

    def step(c):
            entry_ref[0, pl.ds(c, 1), :] = T_ref[0, 0, :][None]
            feat = feat_ref[0, pl.ds(c * CHUNK, CHUNK), :]     # [C, 11]
            gidx = gidx_ref[0, pl.ds(c, 1), :][0]              # [C]
            gidx_f = gidx.astype(jnp.float32)

            mean_x = feat[:, 0]
            mean_y = feat[:, 1]
            con_a = feat[:, 2]
            con_b = feat[:, 3]
            con_c = feat[:, 4]
            z = feat[:, 5]
            rgb = feat[:, 6:9]
            opa = feat[:, 9]
            elig = feat[:, 10] > 0.5

            dx = px[:, None] - mean_x[None, :]                 # [256, C]
            dy = py[:, None] - mean_y[None, :]
            power = (-0.5 * (con_a[None, :] * dx * dx
                             + con_c[None, :] * dy * dy)
                     - con_b[None, :] * dx * dy)
            alpha = opa[None, :] * jnp.exp(jnp.minimum(power, 0.0))
            alpha = jnp.where(power > 0, 0.0, alpha)
            alpha = jnp.minimum(alpha, ALPHA_MAX)
            alpha = jnp.where(alpha < ALPHA_EPS, 0.0, alpha)

            T = T_ref[0, 0, :]
            cum = _prefix_prod(1.0 - alpha)                    # inclusive
            cum_shift = jnp.concatenate(
                [jnp.ones((NPIX, 1), jnp.float32),
                 jax.lax.slice_in_dim(cum, 0, CHUNK - 1, axis=1)], axis=1)
            T_in = T[:, None] * cum_shift
            w = alpha * T_in

            contrib = jnp.dot(w, rgb, preferred_element_type=jnp.float32)
            color_ref[0, :, :] = (color_ref[0, :, :]
                                  + jnp.swapaxes(contrib, 0, 1))

            opaque = elig[None, :] & (alpha >= opaque_threshold)
            has_hit = jnp.any(opaque, axis=1)
            # "first True" via min-index reduction: Mosaic argmax breaks
            # ties differently from XLA (last vs first max)
            col_f = col.astype(jnp.float32)
            first = jnp.min(jnp.where(opaque, col_f, 1e9), axis=1).astype(jnp.int32)
            didx = didx_ref[0, 0, :]
            new_hit = has_hit & (didx < 0)
            depth_ref[0, 0, :] = jnp.where(
                new_hit, _pick(z, col, first), depth_ref[0, 0, :])
            didx_ref[0, 0, :] = jnp.where(
                new_hit, _pick(gidx_f, col, first).astype(jnp.int32), didx)
            dw_ref[0, 0, :] = jnp.where(
                new_hit, _pick(w, col, first), dw_ref[0, 0, :])

            best_w = jnp.max(w, axis=1)
            best = jnp.min(jnp.where(w == best_w[:, None], col_f, 1e9),
                           axis=1).astype(jnp.int32)
            better = best_w > cw_ref[0, 0, :]
            cw_ref[0, 0, :] = jnp.where(better, best_w, cw_ref[0, 0, :])
            cidx_ref[0, 0, :] = jnp.where(
                better, _pick(gidx_f, col, best).astype(jnp.int32),
                cidx_ref[0, 0, :])

            # static slice: jnp's [:, -1] getitem lowers via
            # dynamic_slice, which Mosaic doesn't implement
            last = jax.lax.slice_in_dim(cum, CHUNK - 1, CHUNK, axis=1)
            T_ref[0, 0, :] = T * last[:, 0]
            return c + 1

    jax.lax.while_loop(cond, step, jnp.int32(0))


def _prefix_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along axis 1 (Hillis-Steele doubling)."""
    n = x.shape[1]
    d = 1
    while d < n:
        shifted = jnp.concatenate(
            [jnp.zeros_like(x[:, :d]), x[:, :-d]], axis=1)
        x = x + shifted
        d *= 2
    return x


def _bwd_kernel(done_ref, origin_ref, feat_ref, gidx_ref, entry_ref,
                gc_ref, gd_ref, tg_ref, didx_ref,
                gfeat_ref, s_ref,
                *, n_chunks_static: int, opaque_threshold: float):
    """Back-to-front gradient walk for one tile (the reference CUDA
    backward's structure, SLAM/render.py:110-133 bwd; math documented in
    blend.py's fused-VJP section).  Chunks run inside a reversed
    ``lax.while_loop`` starting at the forward's early-exit point (``done``
    chunks) — unprocessed chunks keep zero gradients, matching the
    forward's early exit exactly.  (A static reversed unroll compiles the
    same math, but remote Mosaic compile time explodes with unroll depth —
    see the forward kernel's note.)"""
    t = pl.program_id(0)
    ri = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 1), 0)[:, 0]
    px = jnp.mod(ri, TILE).astype(jnp.float32) + origin_ref[t, 0]
    py = (ri // TILE).astype(jnp.float32) + origin_ref[t, 1]
    done = done_ref[t]

    # gradient block stored as [n_chunks, 11, CHUNK]: per-gaussian grads
    # are pixel-axis reductions that Mosaic only supports via explicit
    # contraction, so each chunk produces an [11, C] block; indexing the
    # chunk axis (sublane-safe) keeps the store dynamic-friendly (a
    # dynamic store on the LANE axis of an [11, Kt] layout is rejected).
    # The caller transposes/reshapes back to [Kt, 11] outside the kernel.
    gfeat_ref[0, :, :, :] = jnp.zeros(
        (n_chunks_static, 11, CHUNK), jnp.float32)
    s_ref[0, :] = jnp.zeros((NPIX,), jnp.float32)

    gc = gc_ref[0, :, :]        # [NPIX, 3]
    gd = gd_ref[0, 0, :]        # [NPIX]
    tg = tg_ref[0, 0, :]        # [NPIX]  (T_final * g_T)
    didx = didx_ref[0, 0, :]    # [NPIX] int32

    def cond(c):
        return c >= 0

    def step(c):
            feat = feat_ref[0, pl.ds(c * CHUNK, CHUNK), :]     # [C, 11]
            gidx = gidx_ref[0, pl.ds(c, 1), :][0]              # [C]

            mean_x = feat[:, 0]
            mean_y = feat[:, 1]
            con_a = feat[:, 2]
            con_b = feat[:, 3]
            con_c = feat[:, 4]
            rgb = feat[:, 6:9]
            opa = feat[:, 9]
            elig = feat[:, 10] > 0.5

            dx = px[:, None] - mean_x[None, :]                 # [256, C]
            dy = py[:, None] - mean_y[None, :]
            power = (-0.5 * (con_a[None, :] * dx * dx
                             + con_c[None, :] * dy * dy)
                     - con_b[None, :] * dx * dy)
            e = jnp.exp(jnp.minimum(power, 0.0))
            raw = opa[None, :] * e
            alpha = jnp.minimum(raw, ALPHA_MAX)
            gate = (power <= 0) & (raw >= ALPHA_EPS) & (raw < ALPHA_MAX)
            alpha = jnp.where((power > 0) | (raw < ALPHA_EPS), 0.0, alpha)
            opaque = elig[None, :] & (alpha >= opaque_threshold)

            one_minus = 1.0 - alpha
            cum = _prefix_prod(one_minus)
            excl = jnp.concatenate(
                [jnp.ones((NPIX, 1), jnp.float32),
                 jax.lax.slice_in_dim(cum, 0, CHUNK - 1, axis=1)], axis=1)
            T_in = entry_ref[0, c, :][:, None] * excl
            w = alpha * T_in

            # rgbdot[px, i] = rgb_i . g_C(px)   (MXU)
            rgbdot = jax.lax.dot_general(
                gc, rgb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)            # [256, C]
            wg = w * rgbdot
            incl = _prefix_sum(wg)
            tot = jax.lax.slice_in_dim(incl, CHUNK - 1, CHUNK, axis=1)
            s_in = tot - incl                                  # suffix-excl
            s_total = s_in + s_ref[0, :][:, None]

            galpha = T_in * rgbdot - (s_total + tg[:, None]) / one_minus
            galpha = jnp.where(gate, galpha, 0.0)

            # Every per-gaussian gradient is a PIXEL-axis (axis 0 =
            # sublane) reduction, which Mosaic cannot emit (implicit-dim
            # multi_reduction over dim 0 is unimplemented, keepdims lowers
            # to the same op).  Reformulate: concatenate the 7 elementwise
            # term matrices along lanes and contract the pixel axis with
            # ONE [1, 256] x [256, 7C] MXU matmul.
            #
            # `(didx >= 0)[:, None]` would also trip Mosaic (i1 vectors
            # can't grow a minor dim); zero the f32 payload instead, which
            # additionally neutralizes didx == -1 rows matching the -1
            # gidx sentinels.
            gpow = galpha * alpha
            hit = opaque & (gidx[None, :] == didx[:, None])
            gd_valid = jnp.where(didx >= 0, gd, 0.0)
            ones_row = jnp.ones((1, NPIX), jnp.float32)

            def pixsum(term):
                # pixel-axis contraction on the MXU ([1, 256] x [256, C])
                return jax.lax.dot_general(
                    ones_row, term, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)        # [1, C]

            gmean_x = pixsum(gpow * (con_a[None, :] * dx + con_b[None, :] * dy))
            gmean_y = pixsum(gpow * (con_c[None, :] * dy + con_b[None, :] * dx))
            gca = pixsum(gpow * (-0.5 * dx * dx))
            gcb = pixsum(gpow * (-dx * dy))
            gcc = pixsum(gpow * (-0.5 * dy * dy))
            gz = pixsum(jnp.where(hit, gd_valid[:, None], 0.0))
            gopa = pixsum(galpha * e)
            # grgb_t[:, i] = sum_px g_C(px, :) w[px, i]   (MXU)  -> [3, C]
            grgb_t = jax.lax.dot_general(
                gc, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            gchunk_t = jnp.concatenate([
                gmean_x, gmean_y, gca, gcb, gcc, gz, grgb_t, gopa,
                jnp.zeros((1, CHUNK), jnp.float32),
            ], axis=0)                                         # [11, C]
            gfeat_ref[0, pl.ds(c, 1), :, :] = gchunk_t[None]
            s_ref[0, :] = s_ref[0, :] + tot[:, 0]
            return c - 1

    jax.lax.while_loop(cond, step, done - 1)


@functools.partial(jax.jit, static_argnames=("opaque_threshold", "interpret"))
def blend_bwd_pallas(
    tile_feat: jnp.ndarray,    # [T, Kt, 11]
    tile_gidx: jnp.ndarray,    # [T, Kt] int32
    origins: jnp.ndarray,      # [T, 2] float32
    entry_T: jnp.ndarray,      # [T, n_chunks, 256]
    done: jnp.ndarray,         # [T] int32 chunks processed
    g_color: jnp.ndarray,      # [T, 256, 3] cotangent of color
    g_depth: jnp.ndarray,      # [T, 256]
    tfin_gt: jnp.ndarray,      # [T, 256]  T_final * cot(T_final)
    depth_index: jnp.ndarray,  # [T, 256] int32 forward's hit indices
    opaque_threshold: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas backward for the fused blend; returns d(loss)/d(tile_feat)."""
    T_tiles, Kt, F = tile_feat.shape
    assert Kt % CHUNK == 0
    n_chunks = Kt // CHUNK

    kernel = functools.partial(
        _bwd_kernel, n_chunks_static=n_chunks,
        opaque_threshold=float(opaque_threshold))

    def imap(t, d_ref, o_ref):
        return (t, 0, 0)

    def imap4(t, d_ref, o_ref):
        return (t, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T_tiles,),
        in_specs=[
            pl.BlockSpec((1, Kt, F), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_chunks, CHUNK), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_chunks, NPIX), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPIX, 3), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NPIX), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NPIX), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NPIX), imap, memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, n_chunks, F, CHUNK), imap4,
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((1, NPIX), jnp.float32)],
    )

    (gfeat_c,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((T_tiles, n_chunks, F, CHUNK),
                                        jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(done, origins, tile_feat,
      tile_gidx.reshape(T_tiles, n_chunks, CHUNK), entry_T,
      g_color, g_depth[:, None, :], tfin_gt[:, None, :],
      depth_index[:, None, :])
    # kernel emits [n_chunks, F, C] per tile (chunk-indexed stores +
    # contraction-kept rows); transpose/reshape back outside the kernel
    return jnp.transpose(gfeat_c, (0, 1, 3, 2)).reshape(T_tiles, Kt, F)


def _forward_call(tile_feat, tile_gidx, tile_counts, origins,
                  opaque_threshold, t_threshold, interpret):
    T_tiles, Kt, F = tile_feat.shape
    assert Kt % CHUNK == 0, "tile_capacity must be a multiple of 128"
    n_chunks = Kt // CHUNK

    kernel = functools.partial(
        _kernel, n_chunks_static=n_chunks,
        opaque_threshold=float(opaque_threshold),
        t_threshold=float(t_threshold))

    def imap(t, c_ref, o_ref):
        return (t, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T_tiles,),
        in_specs=[
            pl.BlockSpec((1, Kt, F), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_chunks, CHUNK), imap, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, NPIX), imap, memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((1, 1, NPIX), imap, memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec((1, n_chunks, NPIX), imap, memory_space=pltpu.VMEM)],
    )

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T_tiles, 3, NPIX), jnp.float32),
            jax.ShapeDtypeStruct((T_tiles, 1, NPIX), jnp.float32),
            jax.ShapeDtypeStruct((T_tiles, 1, NPIX), jnp.int32),
            jax.ShapeDtypeStruct((T_tiles, 1, NPIX), jnp.int32),
            jax.ShapeDtypeStruct((T_tiles, 1, NPIX), jnp.float32),
            jax.ShapeDtypeStruct((T_tiles, 1, NPIX), jnp.float32),
            jax.ShapeDtypeStruct((T_tiles, 1, NPIX), jnp.float32),
            jax.ShapeDtypeStruct((T_tiles, n_chunks, NPIX), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tile_counts, origins, tile_feat,
      tile_gidx.reshape(T_tiles, n_chunks, CHUNK))

    color, depth, didx, cidx, dw, cw, Tf, entry = outs
    tiles = TileOutputs(
        color=jnp.swapaxes(color, 1, 2), depth=depth[:, 0], depth_index=didx[:, 0],
        color_index=cidx[:, 0], depth_weight=dw[:, 0],
        color_weight=cw[:, 0], T_final=Tf[:, 0],
    )
    return tiles, entry


@functools.partial(jax.jit, static_argnames=("opaque_threshold", "t_threshold",
                                             "interpret"))
def blend_tiles_pallas(
    tile_feat: jnp.ndarray,    # [T, Kt, 11] pre-gathered, depth-ordered
    tile_gidx: jnp.ndarray,    # [T, Kt] int32 original indices (-1 sentinel)
    tile_counts: jnp.ndarray,  # [T] int32
    origins: jnp.ndarray,      # [T, 2] float32
    opaque_threshold: float,
    t_threshold: float = 1e-4,
    interpret: bool = False,
) -> TileOutputs:
    tiles, _ = _forward_call(tile_feat, tile_gidx, tile_counts, origins,
                             opaque_threshold, t_threshold, interpret)
    return tiles


def blend_fwd_pallas(tile_feat, tile_gidx, tile_counts, origins,
                     opaque_threshold, t_threshold, interpret):
    """Forward for the custom-VJP path: also returns (entry_T, done).

    ``done`` (chunks processed per tile before early exit) is recovered from
    the entry rows: a chunk was processed iff its entry row was written,
    and written rows have max > t_threshold (the while condition)."""
    tiles, entry = _forward_call(tile_feat, tile_gidx, tile_counts, origins,
                                 opaque_threshold, t_threshold, interpret)
    done = jnp.sum(jnp.max(entry, axis=-1) > t_threshold, axis=-1,
                   dtype=jnp.int32)
    return tiles, entry, done
