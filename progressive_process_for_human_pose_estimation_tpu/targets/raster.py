"""On-device, PIL-parity label rasterization (jnp, jit/vmap-friendly).

The reference renders its training targets on the host with PIL ImageDraw in
DataLoader worker processes — the CPU hot loop that forces it to 16-20
workers (SURVEY.md §3). Here the same semantics run inside the XLA program:

- keypoints as single pixels with class value k+1
  (``draw.point``, /root/reference/train.py:319)
- keypoints as size-1 ellipses (``draw.ellipse`` over a ±0.5 box,
  /root/reference/train.py:680-686)
- skeleton edges as 1-px lines with class value e+1
  (``draw.line``, /root/reference/train.py:320-323, 687-690)
- person silhouettes as filled polygons with value 1
  (``draw.polygon`` fill '#010101', /root/reference/train.py:293-297)

Pixel-exact semantics were established empirically against PIL (see
tests/test_raster.py golden tests) and are:

- **point**: pixel (floor(x), floor(y)); out-of-bounds dropped.
- **size-1 ellipse**: the 2x2 block floor(cx-0.5)..floor(cx+0.5) ×
  floor(cy-0.5)..floor(cy+0.5), clipped.
- **line**: endpoints truncated toward zero; walk the major axis one pixel
  per step; minor = minor0 + sign(dminor) * floor(i*|dminor|/|dmajor| + 0.5)
  (ties round away from the start — direction-dependent, as in PIL).
- **polygon**: vertices truncated toward zero; per scanline y, even-odd fill
  between intersections of non-horizontal edges counted on the half-open
  span [ymin, ymax), with integer pixel x filled iff
  odd(#{xint <= x}) or odd(#{xint < x}) (equivalent to PIL's
  fill ceil(xl)..floor(xr) between sorted pairs); plus horizontal edges
  filled directly; plus single pixels at strict local-extremum vertices.

Draw order (later overwrites earlier — PIL semantics, persons drawn in
annotation order, classes in ascending order) is reproduced with a
scatter-max over the draw-sequence index, which is deterministic on TPU.

All shapes are static (persons/keypoints/edges/vertices padded + masked at
manifest build time per SURVEY.md §7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _order_resolve(seq_grid: jax.Array, n_classes: int) -> jax.Array:
    """Map a scatter-max'd draw-sequence grid (-1 = untouched) to class
    values ``(seq % n_classes) + 1``."""
    return jnp.where(seq_grid >= 0, seq_grid % n_classes + 1, 0).astype(jnp.int32)


def _oob_to_sentinel(ys: jax.Array, xs: jax.Array, h: int, w: int):
    """Route out-of-bounds (incl. negative) indices to a sentinel that
    scatter mode='drop' discards. Plain negative indices would WRAP (numpy
    semantics), silently drawing on the opposite edge."""
    bad = (xs < 0) | (xs >= w) | (ys < 0) | (ys >= h)
    return jnp.where(bad, h, ys), jnp.where(bad, w, xs)


def rasterize_points(
    xy: jax.Array, valid: jax.Array, h: int, w: int
) -> jax.Array:
    """PIL ``draw.point`` class map (/root/reference/train.py:319).

    Args:
      xy: (P, K, 2) float pixel coords (x, y) per person per keypoint.
      valid: (P, K) bool — visibility (reference draws when v > 0).
      h, w: output map size.
    Returns:
      (h, w) int32 class map with values k+1 (0 = background); draw order is
      person-major then keypoint index, later wins.
    """
    p, k, _ = xy.shape
    ix = jnp.floor(xy[..., 0]).astype(jnp.int32)
    iy = jnp.floor(xy[..., 1]).astype(jnp.int32)
    seq = jnp.arange(p * k, dtype=jnp.int32).reshape(p, k)
    seq = jnp.where(valid, seq, -1)
    iy, ix = _oob_to_sentinel(iy, ix, h, w)
    grid = jnp.full((h, w), -1, jnp.int32)
    grid = grid.at[iy.reshape(-1), ix.reshape(-1)].max(seq.reshape(-1), mode="drop")
    return _order_resolve(grid, k)


def rasterize_ellipses_1px(
    centers: jax.Array, valid: jax.Array, h: int, w: int
) -> jax.Array:
    """PIL size-1 ``draw.ellipse`` class map (/root/reference/train.py:680-686).

    The reference draws, per visible MPII joint i, an ellipse over the box
    (x-0.5, y-0.5, x+0.5, y+0.5) with fill i+1; PIL renders that as the 2x2
    pixel block floor(x-0.5)..floor(x+0.5) × floor(y-0.5)..floor(y+0.5).

    Args:
      centers: (K, 2) float (x, y); valid: (K,) bool.
    Returns:
      (h, w) int32 class map, values i+1, later joints win.
    """
    k = centers.shape[0]
    x0 = jnp.floor(centers[:, 0] - 0.5).astype(jnp.int32)
    x1 = jnp.floor(centers[:, 0] + 0.5).astype(jnp.int32)
    y0 = jnp.floor(centers[:, 1] - 0.5).astype(jnp.int32)
    y1 = jnp.floor(centers[:, 1] + 0.5).astype(jnp.int32)
    # 4 candidate pixels per joint (duplicates collapse in the scatter).
    xs = jnp.stack([x0, x1, x0, x1], axis=1)  # (K, 4)
    ys = jnp.stack([y0, y0, y1, y1], axis=1)
    seq = jnp.where(valid, jnp.arange(k, dtype=jnp.int32), -1)
    seq4 = jnp.broadcast_to(seq[:, None], (k, 4))
    ys, xs = _oob_to_sentinel(ys, xs, h, w)
    grid = jnp.full((h, w), -1, jnp.int32)
    grid = grid.at[ys.reshape(-1), xs.reshape(-1)].max(seq4.reshape(-1), mode="drop")
    return _order_resolve(grid, k)


def rasterize_lines(
    p0: jax.Array,
    p1: jax.Array,
    valid: jax.Array,
    h: int,
    w: int,
    max_steps: int | None = None,
) -> jax.Array:
    """PIL 1-px ``draw.line`` class map (/root/reference/train.py:320-323).

    Args:
      p0, p1: (P, E, 2) float endpoints (x, y) per person per skeleton edge.
      valid: (P, E) bool — edge drawn when both endpoint joints visible.
    Returns:
      (h, w) int32 class map with values e+1, later wins.
    """
    p, e, _ = p0.shape
    if max_steps is None:
        max_steps = h + w
    a = p0.astype(jnp.int32)  # trunc toward zero, like PIL's int conversion
    b = p1.astype(jnp.int32)
    d = b - a  # (P, E, 2)
    adx, ady = jnp.abs(d[..., 0]), jnp.abs(d[..., 1])
    x_major = adx >= ady
    l_major = jnp.maximum(jnp.where(x_major, adx, ady), 0)  # steps count
    l_minor = jnp.where(x_major, ady, adx)
    maj0 = jnp.where(x_major, a[..., 0], a[..., 1])
    min0 = jnp.where(x_major, a[..., 1], a[..., 0])
    s_maj = jnp.sign(jnp.where(x_major, d[..., 0], d[..., 1]))
    s_min = jnp.sign(jnp.where(x_major, d[..., 1], d[..., 0]))

    # The step window is bounded (max_steps) but a line with a far
    # off-canvas endpoint can have l_major >> max_steps while its VISIBLE
    # span is at most max(h, w). Start the window at the first step whose
    # major coordinate is on-canvas (k_start): same per-step arithmetic,
    # just shifted — in-range lines keep k_start = 0 and are bit-identical.
    m_lim = jnp.where(x_major, w, h)
    k_start = jnp.where(
        s_maj > 0,
        jnp.clip(-maj0, 0, None),
        jnp.where(s_maj < 0, jnp.clip(maj0 - (m_lim - 1), 0, None), 0),
    )
    i = jnp.arange(max_steps, dtype=jnp.int32)  # (S,)
    ii = k_start[..., None] + i[None, None, :]  # (P, E, S) absolute steps
    active = (ii <= l_major[..., None]) & valid[..., None]  # (P,E,S)
    maj = maj0[..., None] + s_maj[..., None] * ii
    denom = jnp.maximum(l_major, 1).astype(jnp.float32)
    off = jnp.floor(
        ii.astype(jnp.float32) * l_minor[..., None].astype(jnp.float32)
        / denom[..., None]
        + 0.5
    ).astype(jnp.int32)
    minr = min0[..., None] + s_min[..., None] * off
    xs = jnp.where(x_major[..., None], maj, minr)
    ys = jnp.where(x_major[..., None], minr, maj)

    seq = jnp.arange(p * e, dtype=jnp.int32).reshape(p, e)
    seq = jnp.broadcast_to(seq[..., None], (p, e, max_steps))
    seq = jnp.where(active, seq, -1)
    # Inactive and out-of-bounds steps must drop, not clamp or wrap.
    xs = jnp.where(active, xs, w)
    ys = jnp.where(active, ys, h)
    ys, xs = _oob_to_sentinel(ys, xs, h, w)
    grid = jnp.full((h, w), -1, jnp.int32)
    grid = grid.at[ys.reshape(-1), xs.reshape(-1)].max(seq.reshape(-1), mode="drop")
    return _order_resolve(grid, e)


def _polygon_mask_single(
    verts: jax.Array, n_verts: jax.Array, h: int, w: int
) -> jax.Array:
    """(h, w) bool fill mask of one polygon; verts (V, 2) float, n_verts traced.

    Replicates PIL's ``polygon_generic`` scanline algorithm exactly:

    - vertices truncated to int;
    - horizontal edges drawn directly (inclusive endpoints);
    - per scanline y, each non-horizontal edge with ymin <= y <= ymax
      (inclusive) contributes its float intersection x, DUPLICATED when
      y == the edge's ymax and y is above the polygon's last row — this is
      PIL's "needed to draw consistent polygons" vertex rule, which yields
      single pixels at local extrema and correct pass-through parity;
    - PIL's "connect discontiguous corners" rule (established empirically
      against Pillow 12): at a vertex whose two edges both slope to the same
      x side (strictly same dx/dy sign) and which is either a local MINIMUM
      in y or a local maximum on the polygon's last row, one of the two
      vertex entries is replaced by an extension toward the adjacent
      interior row: with adj = the two edges' x at y±1 (toward the
      interior), ext = min(max(adj)+1, vx) when extending left, or
      max(min(adj)-1, vx) when extending right;
    - sorted intersections are paired, each pair (xl, xr) filling pixels
      round_half_up(xl) .. round_half_down(xr) inclusive.

    Known divergence: PIL's corner rule is additionally gated on an
    insertion-order parity quirk (it is skipped when an unrelated edge
    interleaves in its scan array); we apply it unconditionally. Measured
    (round 4, 600 random star polygons at 64x64): 11/600 polygons diverge,
    12 pixels total (~5e-5 pixel rate), each 1-2 px adjacent to SOME vertex
    (not preferentially the wrap vertex 0, so the gate is not a simple
    wrap-edge condition). Reproducing it exactly would require emulating
    PIL's per-scanline edge-array construction ORDER, which this
    order-free histogram formulation cannot express without a per-vertex
    sort — rejected for a 5e-5-rate effect with no observed impact on any
    label or metric test.

    Rather than sorting, we use an order-statistics identity: with
    L = #(intersections, with multiplicity, < x + 0.5),
    G = #(intersections <= x - 0.5) and T the total count on the row, pixel
    x is covered by pair (xx[2m], xx[2m+1]) for some m iff an even index
    exists in [max(0, G-1), min(L-1, T-2)] — the T-2 bound reproduces PIL's
    behaviour of ignoring a trailing unpaired intersection when the count is
    odd. Counts are computed with a bucket histogram + cumsum along the row,
    so the whole mask is O(H*(V + W)).
    """
    v = verts.shape[0]
    iverts = verts.astype(jnp.int32)  # trunc toward zero (PIL int conversion)
    idx = jnp.arange(v)
    edge_valid = idx < n_verts
    nxt = jnp.where(idx + 1 < n_verts, idx + 1, 0)
    x0 = iverts[:, 0]
    y0 = iverts[:, 1]
    x1 = iverts[nxt, 0]
    y1 = iverts[nxt, 1]

    poly_ymax = jnp.max(jnp.where(edge_valid, y0, jnp.iinfo(jnp.int32).min))

    ys = jnp.arange(h, dtype=jnp.int32)[:, None]  # (h, 1)
    fy0, fy1 = y0[None, :], y1[None, :]  # (1, V)
    fx0 = x0[None, :].astype(jnp.float32)
    fx1 = x1[None, :].astype(jnp.float32)

    non_horiz = (fy0 != fy1) & edge_valid[None, :]
    ymin = jnp.minimum(fy0, fy1)
    ymax = jnp.maximum(fy0, fy1)
    crosses = non_horiz & (ys >= ymin) & (ys <= ymax)  # inclusive, as in PIL
    # PIL clips the scanline range to the canvas; the dup rule compares
    # against that clipped bottom row.
    ymax_clip = jnp.minimum(poly_ymax, h)
    dup = crosses & (ys == ymax) & (ys < ymax_clip)
    mult = crosses.astype(jnp.int32) + dup.astype(jnp.int32)  # (h, V)

    # Same float expression as PIL: slope first, then (y - y0) * slope + x0.
    slope = (fx1 - fx0) / jnp.where(fy1 != fy0, fy1 - fy0, 1).astype(jnp.float32)
    xint = (ys - fy0).astype(jnp.float32) * slope + fx0  # (h, V)

    # --- "Connect discontiguous corners" vertex corrections -------------
    # Vertex j joins edge P = (v[j-1] -> v[j]) and edge N = (v[j] -> v[j+1]).
    prv = jnp.where(idx > 0, idx - 1, n_verts - 1)
    vx = x0.astype(jnp.float32)
    vy = y0
    yp = y0[prv]  # other endpoint (y) of edge P
    yn = y1       # other endpoint (y) of edge N
    slope_p = slope[0][prv]
    slope_n = slope[0]
    same_sign = ((slope_p > 0) & (slope_n > 0)) | ((slope_p < 0) & (slope_n < 0))
    local_min = (yp > vy) & (yn > vy)
    bottom_max = (yp < vy) & (yn < vy) & (vy == ymax_clip)
    corner = edge_valid & same_sign & (local_min | bottom_max) & (vy >= 0) & (vy < h)
    off = jnp.where(local_min, 1.0, -1.0)
    adj_p = vx + slope_p * off
    adj_n = vx + slope_n * off
    ext_left = (local_min & (slope_n < 0)) | (bottom_max & (slope_n > 0))
    ext = jnp.where(
        ext_left,
        jnp.minimum(jnp.maximum(adj_p, adj_n) + 1.0, vx),
        jnp.maximum(jnp.minimum(adj_p, adj_n) - 1.0, vx),
    )

    # Bucket histogram + cumsum: count(x) = #(entries whose condition first
    # holds at pixel <= x). Vertex corrections contribute signed deltas:
    # -1 at the vertex x, +1 at the extension x.
    rows = jnp.broadcast_to(jnp.arange(h)[:, None], xint.shape)
    corner_rows = jnp.where(corner, vy, h)  # h = dropped row sentinel

    def count_from_bucket_fn(bucket_of):
        hist = jnp.zeros((h + 1, w + 2), jnp.int32)

        def acc(hist, rows_, values, mults):
            bucket = jnp.clip(bucket_of(values), 0, w + 1)
            return hist.at[rows_.reshape(-1), bucket.reshape(-1)].add(
                mults.reshape(-1), mode="drop"
            )

        hist = acc(hist, jnp.where(mult > 0, rows, h), xint, mult)
        hist = acc(hist, corner_rows, vx[None, :], -corner.astype(jnp.int32)[None, :])
        hist = acc(hist, corner_rows, ext[None, :], corner.astype(jnp.int32)[None, :])
        return jnp.cumsum(hist[:h], axis=1)[:, :w]

    # L: xint < x + 0.5 first holds at x = floor(xint - 0.5) + 1.
    l_cnt = count_from_bucket_fn(
        lambda v: jnp.floor(v - 0.5).astype(jnp.int32) + 1
    )
    # G: xint <= x - 0.5 first holds at x = ceil(xint + 0.5).
    g_cnt = count_from_bucket_fn(lambda v: jnp.ceil(v + 0.5).astype(jnp.int32))
    total = jnp.sum(mult, axis=1, keepdims=True)  # (h, 1); deltas cancel
    lo = jnp.maximum(0, g_cnt - 1)
    hi = jnp.minimum(l_cnt - 1, total - 2)
    inside = (hi >= lo) & ((hi > lo) | (lo % 2 == 0))

    # Horizontal edges: filled directly, endpoints inclusive.
    horiz = (fy0 == fy1) & edge_valid[None, :]
    xs_pix = jnp.arange(w, dtype=jnp.int32)[None, None, :]  # (1, 1, w)
    hx0 = jnp.minimum(x0, x1)[None, :, None]
    hx1 = jnp.maximum(x0, x1)[None, :, None]
    hrow = (ys[:, :, None] == fy0[:, :, None]) & horiz[:, :, None]
    hfill = jnp.any(hrow & (xs_pix >= hx0) & (xs_pix <= hx1), axis=1)  # (h, w)

    return inside | hfill


def rasterize_polygons(
    verts: jax.Array,
    n_verts: jax.Array,
    valid: jax.Array,
    h: int,
    w: int,
    fill_value: int = 1,
) -> jax.Array:
    """PIL ``draw.polygon`` fill map (/root/reference/train.py:293-297).

    Args:
      verts: (P, V, 2) float vertices (x, y), padded to V per polygon.
      n_verts: (P,) int actual vertex counts.
      valid: (P,) bool.
    Returns:
      (h, w) int32 map: fill_value inside any valid polygon (the reference
      fills every person with the same value 1, so order is irrelevant).
    """
    masks = jax.vmap(lambda vv, nn: _polygon_mask_single(vv, nn, h, w))(verts, n_verts)
    masks = masks & valid[:, None, None]
    return jnp.any(masks, axis=0).astype(jnp.int32) * fill_value
