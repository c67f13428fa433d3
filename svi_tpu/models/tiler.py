"""Feathered spatial tiling for memory-bound conv/attention forwards.

Behavioral reference: diffsynth/models/tiler.py — `TileWorker` (:5-106,
unfold -> per-tile forward -> masked fold with io-scale handling),
`FastTileWorker` (:110-160, boundary-clamped tile tasks with per-tile border
masks), `TileWorker2Dto3D` (:164-234, 2D spatial tiling of 5D video tensors
with per-axis output scales).

TPU-first notes: tensors are channels-last ((B,H,W,C) 2D / (B,T,H,W,C) 3D,
the repo conv layout) instead of the reference's NCHW/NCTHW. Tile extraction
and the feathered scatter-add run as host-side Python loops over *static*
tile coordinates, so `forward_fn` — the expensive part — can be a jitted
function compiled once per tile shape; the blend is pure XLA `at[].add`.
Accumulation is f32 regardless of compute dtype (the reference accumulates in
`tile_dtype`, normally the sample dtype; f32 is strictly tighter).

Semantics notes (all verified against the reference by golden tests in
tests/test_tiler.py):
  * TileWorker tile positions are torch-Unfold positions — every (i,j) with a
    full window, step `tile_stride`; trailing rows/cols not covered by any
    window are dropped from the blend exactly like torch Fold drops them
    (we return 0 there instead of the reference's 0/0 NaN).
  * the border mask is `min(x+1, H-x, y+1, W-y)/border_width` clipped to
    (0,1], with `border_width = tile_stride//2` by default, evaluated at the
    *output* scale when forward_fn changes resolution (io_scale, ref :57-61).
  * FastTileWorker/TileWorker2Dto3D masks always use `(H+W)//4` of the tile
    as the feather width (the reference's build_mask ignores the
    border_width argument for FastTileWorker; 2Dto3D honors it).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "tiled_forward",
    "fast_tiled_forward",
    "tiled_forward_2dto3d",
]


def _border_mask(h, w, border_width):
    """Ref tiler.py:10-17: centre 1, linear ramp of `border_width` px."""
    x = np.arange(h)[:, None]
    y = np.arange(w)[None, :]
    m = np.minimum(np.minimum(x + 1, h - x), np.minimum(y + 1, w - y))
    return np.clip(m / max(border_width, 1), 0.0, 1.0).astype(np.float32)


def _clamped_mask(h, w, is_bound, border_width=None):
    """Ref tiler.py:115-130 / :172-189: ramp clipped to [1, border]; edges
    touching the tensor boundary get full weight."""
    bw = (h + w) // 4 if border_width is None else border_width
    bw = max(bw, 1)
    x = np.arange(h)[:, None] * np.ones((1, w))
    y = np.arange(w)[None, :] * np.ones((h, 1))
    pad = np.full((h, w), bw, np.float64)
    m = np.stack([
        pad if is_bound[0] else x + 1,
        pad if is_bound[1] else h - x,
        pad if is_bound[2] else y + 1,
        pad if is_bound[3] else w - y,
    ]).min(axis=0)
    return (np.clip(m, 1, bw) / bw).astype(np.float32)


def _unfold_positions(size, tile_size, tile_stride):
    return list(range(0, size - tile_size + 1, tile_stride))


def tiled_forward(forward_fn, x, tile_size, tile_stride, tile_batch_size=1,
                  border_width=None):
    """TileWorker.tiled_forward (ref tiler.py:83-106) on (B,H,W,C).

    forward_fn: (N,ts,ts,C) -> (N,ts',ts',C'); a uniform spatial io-scale
    ts'/ts is honored like the reference (fold at the scaled geometry).
    """
    b, h, w, c = x.shape
    bw = int(tile_stride * 0.5) if border_width is None else border_width
    rows = _unfold_positions(h, tile_size, tile_stride)
    cols = _unfold_positions(w, tile_size, tile_stride)
    pos = [(i, j) for i in rows for j in cols]
    outs = []
    for k in range(0, len(pos), tile_batch_size):
        chunk = jnp.concatenate(
            [x[:, i:i + tile_size, j:j + tile_size, :]
             for i, j in pos[k:k + tile_batch_size]], axis=0)
        y = forward_fn(chunk)
        outs.append(y.reshape(-1, b, *y.shape[1:]))
    out = jnp.concatenate(outs, axis=0)  # (n_tiles, b, ts', ts', c')
    ts_o = out.shape[2]
    io = ts_o / tile_size
    h_o, w_o = int(h * io), int(w * io)
    stride_o, bw_o = int(tile_stride * io), int(bw * io)
    # fold positions at the output scale (ref :96-102); same enumeration
    # order as unfold so tile k lands at scaled position k
    rows_o = _unfold_positions(h_o, ts_o, stride_o)
    cols_o = _unfold_positions(w_o, ts_o, stride_o)
    assert len(rows_o) == len(rows) and len(cols_o) == len(cols), (
        f"non-integer io_scale {io} breaks fold alignment")
    mask = jnp.asarray(_border_mask(ts_o, ts_o, bw_o))[None, :, :, None]
    acc = jnp.zeros((b, h_o, w_o, out.shape[-1]), jnp.float32)
    wacc = jnp.zeros((1, h_o, w_o, 1), jnp.float32)
    for k, (i, j) in enumerate([(i, j) for i in rows_o for j in cols_o]):
        acc = acc.at[:, i:i + ts_o, j:j + ts_o, :].add(
            out[k].astype(jnp.float32) * mask)
        wacc = wacc.at[:, i:i + ts_o, j:j + ts_o, :].add(mask)
    return (acc / jnp.maximum(wacc, 1e-6)).astype(x.dtype)


def _clamped_tasks(h, w, tile_size, tile_stride, floor_zero=False):
    """Ref tiler.py:141-149 / :211-219: stride grid with edge clamping and
    redundant-final-tile suppression."""
    tasks = []
    for i in range(0, h, tile_stride):
        for j in range(0, w, tile_stride):
            if (i - tile_stride >= 0 and i - tile_stride + tile_size[0] >= h) or \
               (j - tile_stride >= 0 and j - tile_stride + tile_size[1] >= w):
                continue
            hl, wl, hr, wr = i, j, i + tile_size[0], j + tile_size[1]
            if hr > h:
                hl, hr = (max(h - tile_size[0], 0) if floor_zero
                          else h - tile_size[0]), h
            if wr > w:
                wl, wr = (max(w - tile_size[1], 0) if floor_zero
                          else w - tile_size[1]), w
            tasks.append((hl, hr, wl, wr))
    return tasks


def _clamped_tasks2(h, w, tile_size, tile_stride, floor_zero=False):
    """2Dto3D variant (ref :211-219): independent H/W strides."""
    tasks = []
    for i in range(0, h, tile_stride[0]):
        for j in range(0, w, tile_stride[1]):
            if (i - tile_stride[0] >= 0 and i - tile_stride[0] + tile_size[0] >= h) or \
               (j - tile_stride[1] >= 0 and j - tile_stride[1] + tile_size[1] >= w):
                continue
            hl, wl, hr, wr = i, j, i + tile_size[0], j + tile_size[1]
            if hr > h:
                hl, hr = (max(h - tile_size[0], 0) if floor_zero
                          else h - tile_size[0]), h
            if wr > w:
                wl, wr = (max(w - tile_size[1], 0) if floor_zero
                          else w - tile_size[1]), w
            tasks.append((hl, hr, wl, wr))
    return tasks


def fast_tiled_forward(forward_fn, x, tile_size, tile_stride,
                       border_width=None):
    """FastTileWorker.tiled_forward (ref tiler.py:133-160) on (B,H,W,C).

    forward_fn(hl, hr, wl, wr) -> processed (B,hr-hl,wr-wl,C) tile (the
    caller slices its own inputs, as in flux_image.py:552-559). The feather
    width is always (tileH+tileW)//4 — the reference's build_mask ignores
    the border_width argument on this path.
    """
    b, h, w, c = x.shape
    tasks = _clamped_tasks(h, w, (tile_size, tile_size), tile_stride)
    acc = jnp.zeros((b, h, w, c), jnp.float32)
    wacc = jnp.zeros((1, h, w, 1), jnp.float32)
    for hl, hr, wl, wr in tasks:
        y = forward_fn(hl, hr, wl, wr).astype(jnp.float32)
        mask = jnp.asarray(_clamped_mask(
            hr - hl, wr - wl,
            is_bound=(hl == 0, hr >= h, wl == 0, wr >= w)))[None, :, :, None]
        acc = acc.at[:, hl:hr, wl:wr, :].add(y * mask)
        wacc = wacc.at[:, hl:hr, wl:wr, :].add(mask)
    return (acc / wacc).astype(x.dtype)


def tiled_forward_2dto3d(forward_fn, x, tile_size, tile_stride,
                         scales=(1, 1, 1, 1), border_width=None,
                         progress_bar=lambda t: t):
    """TileWorker2Dto3D.tiled_forward (ref tiler.py:192-234) on (B,T,H,W,C).

    Spatially tiles the (H,W) plane only; forward_fn maps a full-T tile
    (B,T,h,w,C) -> (B,T*sT,h*sH,w*sW,C*sC) per `scales` = (sC,sT,sH,sW)
    (e.g. a VAE decoder has sT=4, sH=sW=8, sC=3/16).
    """
    b, t, h, w, c = x.shape
    s_c, s_t, s_h, s_w = scales
    t_o, h_o, w_o, c_o = int(t * s_t), int(h * s_h), int(w * s_w), int(c * s_c)
    tasks = _clamped_tasks2(h, w, tile_size, tile_stride, floor_zero=True)
    acc = jnp.zeros((b, t_o, h_o, w_o, c_o), jnp.float32)
    wacc = jnp.zeros((1, t_o, h_o, w_o, 1), jnp.float32)
    for hl, hr, wl, wr in progress_bar(tasks):
        y = forward_fn(x[:, :, hl:hr, wl:wr, :]).astype(jnp.float32)
        mask = jnp.asarray(_clamped_mask(
            int((hr - hl) * s_h), int((wr - wl) * s_w),
            is_bound=(hl == 0, hr >= h, wl == 0, wr >= w),
            border_width=border_width))[None, None, :, :, None]
        ho_l, ho_r = int(hl * s_h), int(hr * s_h)
        wo_l, wo_r = int(wl * s_w), int(wr * s_w)
        acc = acc.at[:, :, ho_l:ho_r, wo_l:wo_r, :].add(y * mask)
        wacc = wacc.at[:, :, ho_l:ho_r, wo_l:wo_r, :].add(mask)
    return (acc / wacc).astype(x.dtype)
