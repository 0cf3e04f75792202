"""Tile binning with static shapes: pair expansion + one global key sort.

The reference rasterizer duplicates each Gaussian into one (tile, depth) key
per covered tile and radix-sorts the pairs (CUDA InclusiveSum + SortPairs).
The TPU equivalent here keeps every shape static:

  * pair slots live in a fixed [PAIR_CAP] buffer; the slot -> Gaussian map is
    recovered with a scatter-of-segment-starts + cumsum (no searchsorted over
    millions of elements, no dynamic shapes);
  * keys are (tile_id << depth_bits) | log-quantized depth packed into a
    *positive int32*, sorted with a single jax.lax.sort_key_val;
  * per-tile ranges come from a [num_tiles+1] searchsorted over the sorted
    keys.

Overflow beyond PAIR_CAP is dropped and counted (telemetry), mirroring the
survey's capacity-with-telemetry design (SURVEY.md section 7.3).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from splatam_tpu.render.projection import NEAR_CLIP, TILE, Projected, ProjectedAux


class Bins(NamedTuple):
    pair_gauss: jax.Array  # [PAIR_CAP] int32 gaussian index per sorted pair
    tile_start: jax.Array  # [num_tiles + 1] int32 segment starts
    n_pairs: jax.Array  # scalar int32 (valid pairs)
    overflow: jax.Array  # scalar int32 (pairs dropped)
    counts: jax.Array  # [N] int32 pairs per gaussian (0 = invisible)
    in_stream: jax.Array  # [N] bool: gaussian has >= 1 pair inside pair_cap
    #   (the Pallas backward's rank-compacted segment reduction needs to
    #   know exactly which gaussians appear in the sorted pair stream)


def grid_shape(width: int, height: int) -> tuple[int, int]:
    return (width + TILE - 1) // TILE, (height + TILE - 1) // TILE


def depth_bits_for(num_tiles: int) -> int:
    """Depth bits so that (num_tiles+1) << bits fits in a positive int32."""
    tile_bits = max(1, math.ceil(math.log2(num_tiles + 2)))
    bits = 31 - tile_bits
    if bits < 12:
        raise ValueError(f"image too large: {num_tiles} tiles leaves {bits} depth bits")
    return min(bits, 22)


def segment_spread(values: jax.Array, seg_starts: jax.Array, out_len: int) -> jax.Array:
    """Spread per-segment int values over their segments: out[j] = values[k]
    for j in [seg_starts[k], seg_starts[k+1]).

    Random gathers cost ~7ms per million elements on TPU; this delta-scatter
    + cumsum form costs one N-row scatter and one vectorized cumsum instead
    (exact for integers via telescoping). values: [N, M] int32 (or [N]),
    seg_starts: [N] int32 monotonic (equal starts = empty segments, the
    later value wins, matching the marker-cumsum convention).
    """
    squeeze = values.ndim == 1
    if squeeze:
        values = values[:, None]
    deltas = values - jnp.concatenate(
        [jnp.zeros((1, values.shape[1]), values.dtype), values[:-1]], axis=0
    )
    spread = jnp.zeros((out_len, values.shape[1]), values.dtype)
    spread = spread.at[seg_starts].add(deltas, mode="drop")
    out = jnp.cumsum(spread, axis=0)
    return out[:, 0] if squeeze else out


def _box_min_quad(xlo, xhi, ylo, yhi, a, b, c):
    """min over the box [xlo,xhi]x[ylo,yhi] of q(d) = a*dx^2 + 2b*dx*dy + c*dy^2.

    q is PSD (conic of a positive-definite cov2d), so the min is 0 when the
    box contains the origin and lies on one of the four edges otherwise —
    each edge min is a clamped 1D quadratic. Pure elementwise math."""
    c_s = jnp.maximum(c, 1e-12)
    a_s = jnp.maximum(a, 1e-12)

    def edge_x(x0):
        ys = jnp.clip(-b * x0 / c_s, ylo, yhi)
        return a * x0 * x0 + 2.0 * b * x0 * ys + c * ys * ys

    def edge_y(y0):
        xs = jnp.clip(-b * y0 / a_s, xlo, xhi)
        return a * xs * xs + 2.0 * b * xs * y0 + c * y0 * y0

    m = jnp.minimum(
        jnp.minimum(edge_x(xlo), edge_x(xhi)),
        jnp.minimum(edge_y(ylo), edge_y(yhi)),
    )
    inside = (xlo <= 0.0) & (xhi >= 0.0) & (ylo <= 0.0) & (yhi >= 0.0)
    return jnp.where(inside, 0.0, m)


def _cull_cut(opacity: jax.Array) -> jax.Array:
    """Mahalanobis-squared alpha-cutoff threshold: alpha = op*exp(-q/2) <
    1/255 iff q > 2*ln(255*op). NO 3-sigma cap here (unlike the rect bound):
    the cull must only drop pairs every backend's alpha<1/255 in-kernel skip
    already zeroes, leaving contributions and gradients exactly unchanged."""
    return jnp.maximum(2.0 * jnp.log(255.0 * jnp.maximum(opacity, 1e-12)), 0.0)


def _tile_cull(tx, ty, px, py, a, b, c, cut):
    """True for (gaussian, tile) pairs whose minimum alpha over the tile's
    16x16 pixel box is below 1/255 — exactly-zero contributors forward and
    backward. The 1e-4 slack keeps borderline pairs against float noise
    between this expression and the kernels' per-pixel power."""
    xlo = tx.astype(jnp.float32) * TILE - px
    ylo = ty.astype(jnp.float32) * TILE - py
    m = _box_min_quad(xlo, xlo + (TILE - 1.0), ylo, ylo + (TILE - 1.0), a, b, c)
    return m > cut + 1e-4


def build_bins(
    proj: Projected,
    aux: ProjectedAux,
    width: int,
    height: int,
    pair_cap: int,
    far: float = 100.0,
    direct_j: int = 0,
    tile_cull: bool = False,
) -> Bins:
    """Expand (gaussian, tile) pairs and sort them by (tile, depth) key.

    direct_j > 0 selects the J-slot direct expansion: each gaussian's first
    J pairs come from pure elementwise [N, J] math (no scatter, no gather)
    and only rect areas > J go through the spread path over a small
    remainder buffer — the spread+gather stage shrinks to the tail's size.
    Falls back to the classic path when pair_cap cannot fit J*N + tail.

    tile_cull drops pairs whose tile lies inside the bbox but entirely
    outside the alpha-cutoff ellipse (_tile_cull): every pixel of such a pair
    is skipped in-kernel, so dropping them changes outputs only by the float
    reassociation of shifting survivors across compositor chunk boundaries
    (~1 ulp). Each gaussian's first pair is force-kept so in_stream/offsets
    semantics are unchanged.
    """
    if direct_j > 0 and pair_cap >= direct_j * proj.depth.shape[0] + 4096:
        return _build_bins_direct(
            proj, aux, width, height, pair_cap, direct_j, far, tile_cull
        )
    grid_x, grid_y = grid_shape(width, height)
    num_tiles = grid_x * grid_y
    bits = depth_bits_for(num_tiles)
    qmax = (1 << bits) - 1

    rect_w = aux.rect_wh[:, 0]
    counts = jnp.where(aux.visible, rect_w * aux.rect_wh[:, 1], 0)
    offsets = jnp.cumsum(counts) - counts  # exclusive prefix sum
    total = offsets[-1] + counts[-1]
    overflow = jnp.maximum(total - pair_cap, 0)

    n = proj.depth.shape[0]
    if pair_cap >= 1 << 23:
        raise ValueError("pair_cap must be < 2^23 (offset|rect_w bit packing)")
    # Per-gaussian quantities, bit-packed into three int32 columns and
    # spread over pair slots as SEPARATE single-column delta-scatters:
    # multi-column scatters cost ~3x a single column on TPU, single
    # columns ~7.8ms + ~4.6ms each per million indices.
    z = jnp.clip(proj.depth, NEAR_CLIP, far)
    log_span = math.log(far / NEAR_CLIP)
    qdepth = jnp.clip(
        (jnp.log(z / NEAR_CLIP) / log_span * qmax).astype(jnp.int32), 0, qmax
    )
    # key_base: key of the gaussian's rect-min tile (tile deltas add on top).
    key_base = (
        (aux.rect_min[:, 1] * grid_x + aux.rect_min[:, 0]) << bits
    ) | qdepth
    # Overflowing offsets belong to dropped pairs; clamping keeps the
    # packing in range while leaving every valid slot's value exact.
    off_clamped = jnp.minimum(offsets, pair_cap).astype(jnp.int32)
    off_w = off_clamped | (jnp.clip(jnp.maximum(rect_w, 1), 1, 127) << 23)
    starts = off_clamped
    # One delta-scatter spread of the gaussian index, then one [P,k] row
    # gather of the packed per-gaussian table. (Measured on the current
    # runtime: 9.1 ms vs 15.7 ms for three separate spreads — narrow row
    # gathers are cheap, scatters are not; row gathers are per-ROW bound,
    # so the tile_cull columns below widen the rows for free.)
    g = segment_spread(jnp.arange(n, dtype=jnp.int32), starts, pair_cap)
    cols = [off_w, key_base]
    if tile_cull:
        bc = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
        rm_xy = aux.rect_min[:, 0] | (aux.rect_min[:, 1] << 12)
        cols += [
            rm_xy,
            bc(proj.xy[:, 0]), bc(proj.xy[:, 1]),
            bc(proj.conic[:, 0]), bc(proj.conic[:, 1]), bc(proj.conic[:, 2]),
            bc(_cull_cut(proj.opacity)),
        ]
    table = jnp.stack(cols, axis=1)  # [N, 2 or 9]
    seg = table[g]
    seg_ow, seg_base = seg[:, 0], seg[:, 1]
    seg_off = seg_ow & ((1 << 23) - 1)
    w = seg_ow >> 23

    slot = jnp.arange(pair_cap, dtype=jnp.int32)
    valid = slot < total
    j = slot - seg_off
    # Integer div/mod has no TPU hardware support (expands to very slow op
    # sequences); rect extents are tiny so exact float math is safe.
    jf = j.astype(jnp.float32)
    tdy = jnp.floor(jf / w.astype(jnp.float32)).astype(jnp.int32)
    tdx = j - tdy * w
    if tile_cull:
        fb = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
        tx = (seg[:, 2] & 0xFFF) + tdx
        ty = (seg[:, 2] >> 12) + tdy
        cull = _tile_cull(
            tx, ty, fb(seg[:, 3]), fb(seg[:, 4]),
            fb(seg[:, 5]), fb(seg[:, 6]), fb(seg[:, 7]), fb(seg[:, 8]),
        )
        cull = cull & (j > 0) & valid  # force-keep each gaussian's first pair
        valid_k = valid & ~cull
        n_culled = jnp.sum(cull.astype(jnp.int32))
    else:
        valid_k = valid
        n_culled = jnp.int32(0)
    key = seg_base + ((tdy * grid_x + tdx) << bits)
    key = jnp.where(valid_k, key, jnp.int32(2**31 - 1))

    sorted_key, pair_gauss = jax.lax.sort_key_val(key, g, is_stable=True)

    targets = (jnp.arange(num_tiles + 1, dtype=jnp.int32) << bits)
    tile_start = jnp.searchsorted(sorted_key, targets, side="left").astype(jnp.int32)
    n_pairs = jnp.minimum(total, pair_cap) - n_culled
    return Bins(
        pair_gauss=pair_gauss,
        tile_start=tile_start,
        n_pairs=n_pairs,
        overflow=overflow,
        counts=counts.astype(jnp.int32),
        in_stream=(counts > 0) & (offsets < pair_cap),
    )


def _build_bins_direct(
    proj: Projected,
    aux: ProjectedAux,
    width: int,
    height: int,
    pair_cap: int,
    J: int,
    far: float,
    tile_cull: bool = False,
) -> Bins:
    """J-slot direct pair expansion (see build_bins docstring).

    The total pair stream stays exactly [pair_cap]: the leading J*N slots
    hold each gaussian's first J pairs in (gaussian, j) row-major order —
    matching the classic path's stable-sort tie order for rect areas <= J —
    and the trailing rem_cap = pair_cap - J*N slots hold the j >= J tail
    via the classic spread. Only the tail can overflow: every visible
    gaussian always keeps its first J pairs, so overflow degrades renders
    gradually instead of dropping whole gaussians from the stream (the
    classic path truncates by gaussian index, silently un-streaming the
    tail of the map)."""
    grid_x, grid_y = grid_shape(width, height)
    num_tiles = grid_x * grid_y
    bits = depth_bits_for(num_tiles)
    qmax = (1 << bits) - 1
    n = proj.depth.shape[0]
    rem_cap = pair_cap - J * n
    assert rem_cap >= 4096
    if rem_cap >= 1 << 23:
        raise ValueError("remainder cap must be < 2^23 (offset bit packing)")

    rect_w = aux.rect_wh[:, 0]
    counts = jnp.where(aux.visible, rect_w * aux.rect_wh[:, 1], 0)

    z = jnp.clip(proj.depth, NEAR_CLIP, far)
    log_span = math.log(far / NEAR_CLIP)
    qdepth = jnp.clip(
        (jnp.log(z / NEAR_CLIP) / log_span * qmax).astype(jnp.int32), 0, qmax
    )
    key_base = (
        (aux.rect_min[:, 1] * grid_x + aux.rect_min[:, 0]) << bits
    ) | qdepth
    sentinel = jnp.int32(2**31 - 1)

    # Direct part: [N, J] pure elementwise math, row-major so ties keep the
    # classic (gaussian, j) order. Integer div/mod has no TPU hardware
    # support; rect widths are tiny so exact float math is safe.
    wf = jnp.maximum(rect_w, 1).astype(jnp.float32)[:, None]  # [N, 1]
    jf = jnp.arange(J, dtype=jnp.float32)[None, :]  # [1, J]
    tdy = jnp.floor(jf / wf).astype(jnp.int32)
    tdx = jnp.arange(J, dtype=jnp.int32)[None, :] - tdy * rect_w[:, None]
    dkey = key_base[:, None] + ((tdy * grid_x + tdx) << bits)
    dvalid = jnp.arange(J, dtype=jnp.int32)[None, :] < counts[:, None]
    dkey = jnp.where(dvalid, dkey, sentinel)
    dg = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, J))
    n_culled = jnp.int32(0)
    if tile_cull:
        # Direct slots never leave per-gaussian layout, so the cull inputs
        # broadcast straight from the projection — no table, no gather.
        cut = _cull_cut(proj.opacity)
        dcull = _tile_cull(
            aux.rect_min[:, 0:1] + tdx, aux.rect_min[:, 1:2] + tdy,
            proj.xy[:, 0:1], proj.xy[:, 1:2],
            proj.conic[:, 0:1], proj.conic[:, 1:2], proj.conic[:, 2:3],
            cut[:, None],
        )
        # force-keep j == 0 so in_stream = counts > 0 stays true
        dcull = dcull & dvalid & (jnp.arange(J, dtype=jnp.int32)[None, :] > 0)
        dkey = jnp.where(dcull, sentinel, dkey)
        n_culled = n_culled + jnp.sum(dcull.astype(jnp.int32))

    # Remainder part (j >= J): classic spread over the small tail buffer.
    rem_counts = jnp.maximum(counts - J, 0)
    rem_offsets = jnp.cumsum(rem_counts) - rem_counts
    rem_total = rem_offsets[-1] + rem_counts[-1]
    overflow = jnp.maximum(rem_total - rem_cap, 0)
    off_clamped = jnp.minimum(rem_offsets, rem_cap).astype(jnp.int32)
    off_w = off_clamped | (jnp.clip(jnp.maximum(rect_w, 1), 1, 127) << 23)
    g = segment_spread(jnp.arange(n, dtype=jnp.int32), off_clamped, rem_cap)
    cols = [off_w, key_base]
    if tile_cull:
        bc = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
        rm_xy = aux.rect_min[:, 0] | (aux.rect_min[:, 1] << 12)
        cols += [
            rm_xy,
            bc(proj.xy[:, 0]), bc(proj.xy[:, 1]),
            bc(proj.conic[:, 0]), bc(proj.conic[:, 1]), bc(proj.conic[:, 2]),
            bc(_cull_cut(proj.opacity)),
        ]
    table = jnp.stack(cols, axis=1)  # [N, 2 or 9]
    seg = table[g]
    seg_ow, seg_base = seg[:, 0], seg[:, 1]
    seg_off = seg_ow & ((1 << 23) - 1)
    w = seg_ow >> 23
    slot = jnp.arange(rem_cap, dtype=jnp.int32)
    rvalid = slot < rem_total
    j = slot - seg_off + J
    jfr = j.astype(jnp.float32)
    rtdy = jnp.floor(jfr / w.astype(jnp.float32)).astype(jnp.int32)
    rtdx = j - rtdy * w
    rkey = seg_base + ((rtdy * grid_x + rtdx) << bits)
    rkey = jnp.where(rvalid, rkey, sentinel)
    if tile_cull:
        # Tail slots all have j >= J >= 1, so none is a gaussian's first pair
        # and every one may be culled.
        fb = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
        rcull = _tile_cull(
            (seg[:, 2] & 0xFFF) + rtdx, (seg[:, 2] >> 12) + rtdy,
            fb(seg[:, 3]), fb(seg[:, 4]),
            fb(seg[:, 5]), fb(seg[:, 6]), fb(seg[:, 7]), fb(seg[:, 8]),
        )
        rcull = rcull & rvalid
        rkey = jnp.where(rcull, sentinel, rkey)
        n_culled = n_culled + jnp.sum(rcull.astype(jnp.int32))

    key = jnp.concatenate([dkey.reshape(n * J), rkey])
    gs = jnp.concatenate([dg.reshape(n * J), g])
    sorted_key, pair_gauss = jax.lax.sort_key_val(key, gs, is_stable=True)

    targets = (jnp.arange(num_tiles + 1, dtype=jnp.int32) << bits)
    tile_start = jnp.searchsorted(sorted_key, targets, side="left").astype(jnp.int32)
    total = jnp.sum(counts)
    return Bins(
        pair_gauss=pair_gauss,
        tile_start=tile_start,
        n_pairs=total - overflow - n_culled,
        overflow=overflow,
        counts=counts.astype(jnp.int32),
        # Every visible gaussian's first pair is a direct slot, always in
        # stream; only j >= J tail pairs can drop.
        in_stream=counts > 0,
    )


def padded_layout(bins: Bins, num_tiles: int, pad_cap: int, align: int = 128):
    """Re-index sorted pairs into 128-lane-aligned per-tile segments.

    The Pallas compositor streams each tile's pair attributes with aligned
    DMAs, which requires every tile segment to start at a multiple of
    `align` in the padded array. Returns:
      pad_gauss [pad_cap] int32 — gaussian id per padded slot (0 for pads),
      pad_start [T+1] int32 — aligned segment starts,
      lens      [T]   int32 — real (unpadded) segment lengths,
      dst       [PAIR_CAP] int32 — padded slot per sorted pair (pad_cap for
                 slots past n_pairs; the backward gathers pair grads by it).
    """
    lens = bins.tile_start[1:] - bins.tile_start[:-1]
    pad_lens = ((lens + align - 1) // align) * align
    pad_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(pad_lens).astype(jnp.int32)]
    )
    # Scatter sorted pairs directly to their padded destinations: for the
    # sorted pair at position p in tile t, dst = p + (pad_start[t] -
    # tile_start[t]). The per-tile shift is segment-constant over the
    # sorted array, so one spread + one scatter does it — no random
    # gathers at all.
    pair_cap = bins.pair_gauss.shape[0]
    shift = segment_spread(
        (pad_start[:-1] - bins.tile_start[:-1]).astype(jnp.int32),
        bins.tile_start[:-1],
        pair_cap,
    )
    pos = jnp.arange(pair_cap, dtype=jnp.int32)
    dst = jnp.where(pos < bins.n_pairs, pos + shift, pad_cap)
    pad_gauss = (
        jnp.zeros((pad_cap,), jnp.int32).at[dst].set(bins.pair_gauss, mode="drop")
    )
    return pad_gauss, pad_start, lens, dst


def tile_lists(bins: Bins, num_tiles: int, k_max: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fixed-width per-tile Gaussian lists for the scan compositor.

    Returns (lists [T, K] int32 gaussian idx, lens [T] int32, overflow scalar)
    where entries beyond lens are undefined (masked by the consumer).
    """
    starts = bins.tile_start[:-1]
    full_lens = bins.tile_start[1:] - starts
    lens = jnp.minimum(full_lens, k_max)
    overflow = jnp.sum(jnp.maximum(full_lens - k_max, 0))
    cols = jnp.arange(k_max, dtype=jnp.int32)
    idx = starts[:, None] + cols[None, :]
    idx = jnp.clip(idx, 0, bins.pair_gauss.shape[0] - 1)
    lists = bins.pair_gauss[idx]
    return lists, lens, overflow
