"""FastBlend video deflickering / style blending, TPU-native.

Behavioral reference: diffsynth/extensions/FastBlend/ — patch-match based
temporal blending: estimate a nearest-neighbor field (NNF) between frames
with coarse-to-fine PatchMatch (propagation + random search), remap style
frames through the NNF, and blend windows of remapped frames (Fast mode uses
a binary-lifting remapping table, Balanced mode averages a sliding window).

The reference's compute core is three cupy RawKernels (cupy_kernels.py:
remap, patch_error, pairwise_patch_error). Here they are vectorized JAX
gathers jitted per (patch_size, shape) — one flattened take_along_axis per
patch offset — which run on TPU (or any XLA backend) with no custom CUDA.

One deliberate deviation: PyramidPatchMatcher.update_nnf's odd-row/column
+1 adjustment indexes rows with `range(nnf.shape[0])` (the BATCH size) in
the reference (patch_match.py:265-266) — an indexing bug that only
coincidentally works when batch >= height. We implement the intended
semantics (odd output rows/cols offset by 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# kernel equivalents (all images channels-last, padded by `pad`)
# ---------------------------------------------------------------------------


def _gather_pad(img_pad, xx, yy):
    """img_pad: (B, Hp, Wp, C); xx/yy: (B, H, W) padded-space indices."""
    b, hp, wp, c = img_pad.shape
    flat = img_pad.reshape(b, hp * wp, c)
    idx = (xx * wp + yy).reshape(b, -1, 1)
    out = jnp.take_along_axis(flat, idx, axis=1)
    return out.reshape(b, xx.shape[1], xx.shape[2], c)


@functools.partial(jax.jit, static_argnums=(2, 3))
def apply_nnf_to_image(source_pad, nnf, patch_size: int, pad: int):
    """remapping_kernel (ref cupy_kernels.py:3-43): target[x,y] = mean over
    in-bounds patch neighbors (px,py) of source[nnf[x+px,y+py] - (px,py)].
    Returns a PADDED target (zeros outside the interior, like the reference's
    zero-initialized buffer)."""
    b, h, w, _ = nnf.shape[0], nnf.shape[1], nnf.shape[2], None
    c = source_pad.shape[-1]
    r = (patch_size - 1) // 2
    acc = jnp.zeros((b, h, w, c), jnp.float32)
    cnt = jnp.zeros((b, h, w, 1), jnp.float32)
    big = 10 ** 6
    nnf_pad = jnp.pad(nnf, ((0, 0), (r, r), (r, r), (0, 0)), constant_values=-big)
    for px in range(-r, r + 1):
        for py in range(-r, r + 1):
            nn = nnf_pad[:, r + px:r + px + h, r + py:r + py + w]
            cx = nn[..., 0] - px
            cy = nn[..., 1] - py
            valid = (cx >= 0) & (cx < h) & (cy >= 0) & (cy < w)
            g = _gather_pad(source_pad, jnp.clip(cx, 0, h - 1) + pad,
                            jnp.clip(cy, 0, w - 1) + pad)
            acc = acc + jnp.where(valid[..., None], g, 0.0)
            cnt = cnt + valid[..., None].astype(jnp.float32)
    out = acc / jnp.maximum(cnt, 1.0)
    return jnp.pad(out, ((0, 0), (pad, pad), (pad, pad), (0, 0)))


@functools.partial(jax.jit, static_argnums=(3, 4))
def patch_error(source_pad, nnf, target_pad, patch_size: int, pad: int):
    """patch_error_kernel (ref :46-79): SSD between the target patch at (x,y)
    and the source patch at nnf[x,y]."""
    b, h, w = nnf.shape[:3]
    r = (patch_size - 1) // 2
    err = jnp.zeros((b, h, w), jnp.float32)
    for px in range(-r, r + 1):
        for py in range(-r, r + 1):
            t = target_pad[:, pad + px:pad + px + h, pad + py:pad + py + w]
            s = _gather_pad(source_pad, nnf[..., 0] + pad + px, nnf[..., 1] + pad + py)
            d = t - s
            err = err + jnp.sum(d * d, axis=-1)
    return err


@functools.partial(jax.jit, static_argnums=(4, 5))
def pairwise_patch_error(source_a_pad, nnf_a, source_b_pad, nnf_b,
                         patch_size: int, pad: int):
    """pairwise_patch_error_kernel (ref :82-119): SSD between the two sources'
    patches at their respective NNF positions."""
    b, h, w = nnf_a.shape[:3]
    r = (patch_size - 1) // 2
    err = jnp.zeros((b, h, w), jnp.float32)
    for px in range(-r, r + 1):
        for py in range(-r, r + 1):
            sa = _gather_pad(source_a_pad, nnf_a[..., 0] + pad + px, nnf_a[..., 1] + pad + py)
            sb = _gather_pad(source_b_pad, nnf_b[..., 0] + pad + px, nnf_b[..., 1] + pad + py)
            d = sa - sb
            err = err + jnp.sum(d * d, axis=-1)
    return err


# ---------------------------------------------------------------------------
# PatchMatch (ref patch_match.py:7-202)
# ---------------------------------------------------------------------------


class PatchMatcher:
    def __init__(self, height, width, channel, minimum_patch_size, num_iter=5,
                 guide_weight=10.0, random_search_steps=3, random_search_range=4,
                 use_mean_target_style=False, use_pairwise_patch_error=False,
                 tracking_window_size=0, rng=None, **_unused):
        self.height = height
        self.width = width
        self.channel = channel
        self.num_iter = num_iter
        self.guide_weight = guide_weight
        self.random_search_steps = random_search_steps
        self.random_search_range = random_search_range
        self.use_mean_target_style = use_mean_target_style
        self.use_pairwise_patch_error = use_pairwise_patch_error
        self.tracking_window_size = tracking_window_size
        self.patch_size_list = [minimum_patch_size + i * 2 for i in range(num_iter)][::-1]
        self.pad_size = self.patch_size_list[0] // 2
        self.patch_size = self.patch_size_list[0]
        self.rng = rng or np.random.default_rng(0)

    def pad_image(self, image):
        p = self.pad_size
        return jnp.pad(jnp.asarray(image, jnp.float32),
                       ((0, 0), (p, p), (p, p), (0, 0)))

    def unpad_image(self, image):
        p = self.pad_size
        return image[:, p:-p, p:-p, :]

    def apply_nnf_to_image(self, nnf, source_pad):
        return apply_nnf_to_image(source_pad, nnf, self.patch_size, self.pad_size)

    def get_error(self, source_guide, target_guide, source_style, target_style, nnf):
        """(ref :76-87): guide SSD * guide_weight + style SSD."""
        error_guide = patch_error(source_guide, nnf, target_guide,
                                  self.patch_size, self.pad_size)
        if self.use_mean_target_style:
            ts = self.apply_nnf_to_image(nnf, source_style)
            target_style = jnp.repeat(ts.mean(axis=0, keepdims=True),
                                      source_guide.shape[0], axis=0)
        if self.use_pairwise_patch_error:
            ea = pairwise_patch_error(
                source_style[0::2], nnf[0::2], source_style[1::2], nnf[1::2],
                self.patch_size, self.pad_size,
            )
            error_style = jnp.repeat(ea, 2, axis=0)
        else:
            error_style = patch_error(source_style, nnf, target_style,
                                      self.patch_size, self.pad_size)
        return error_guide * self.guide_weight + error_style

    def clamp_bound(self, nnf):
        return jnp.stack([
            jnp.clip(nnf[..., 0], 0, self.height - 1),
            jnp.clip(nnf[..., 1], 0, self.width - 1),
        ], axis=-1)

    def random_step(self, nnf, r):
        step = self.rng.integers(-r, r + 1, size=nnf.shape).astype(np.int32)
        return self.clamp_bound(nnf + jnp.asarray(step))

    def neighboor_step(self, nnf, d):
        """(ref :100-114): take the neighbor's NNF shifted by one."""
        if d == 0:
            upd = jnp.concatenate([nnf[:, :1], nnf[:, :-1]], axis=1)
            upd = upd.at[..., 0].add(1)
        elif d == 1:
            upd = jnp.concatenate([nnf[:, :, :1], nnf[:, :, :-1]], axis=2)
            upd = upd.at[..., 1].add(1)
        elif d == 2:
            upd = jnp.concatenate([nnf[:, 1:], nnf[:, -1:]], axis=1)
            upd = upd.at[..., 0].add(-1)
        else:
            upd = jnp.concatenate([nnf[:, :, 1:], nnf[:, :, -1:]], axis=2)
            upd = upd.at[..., 1].add(-1)
        return self.clamp_bound(upd)

    def shift_nnf(self, nnf, d):
        if d > 0:
            d = min(nnf.shape[0], d)
            return jnp.concatenate([nnf[d:]] + [nnf[-1:]] * d, axis=0)
        d = max(-nnf.shape[0], d)
        return jnp.concatenate([nnf[:1]] * (-d) + [nnf[:d]], axis=0)

    def track_step(self, nnf, d):
        if self.use_pairwise_patch_error:
            even = self.shift_nnf(nnf[0::2], d)
            odd = self.shift_nnf(nnf[1::2], d)
            upd = jnp.zeros_like(nnf)
            upd = upd.at[0::2].set(even).at[1::2].set(odd)
            return upd
        return self.shift_nnf(nnf, d)

    def update(self, sg, tg, ss, ts, nnf, err, upd_nnf):
        upd_err = self.get_error(sg, tg, ss, ts, upd_nnf)
        better = (upd_err < err)
        nnf = jnp.where(better[..., None], upd_nnf, nnf)
        err = jnp.where(better, upd_err, err)
        return nnf, err

    def iteration(self, sg, tg, ss, ts, nnf, err):
        for d in self.rng.permutation(4):
            nnf, err = self.update(sg, tg, ss, ts, nnf, err,
                                   self.neighboor_step(nnf, int(d)))
        for _ in range(self.random_search_steps):
            nnf, err = self.update(sg, tg, ss, ts, nnf, err,
                                   self.random_step(nnf, self.random_search_range))
        for d in range(1, self.tracking_window_size + 1):
            nnf, err = self.update(sg, tg, ss, ts, nnf, err, self.track_step(nnf, d))
            nnf, err = self.update(sg, tg, ss, ts, nnf, err, self.track_step(nnf, -d))
        return nnf, err

    def estimate_nnf(self, source_guide, target_guide, source_style, nnf):
        sg = self.pad_image(source_guide)
        tg = self.pad_image(target_guide)
        ss = self.pad_image(source_style)
        for it in range(self.num_iter):
            self.patch_size = self.patch_size_list[it]
            ts = self.apply_nnf_to_image(nnf, ss)
            err = self.get_error(sg, tg, ss, ts, nnf)
            nnf, err = self.iteration(sg, tg, ss, ts, nnf, err)
        target_style = self.unpad_image(self.apply_nnf_to_image(nnf, ss))
        return nnf, target_style


class PyramidPatchMatcher:
    """Coarse-to-fine PatchMatch (ref :205-298)."""

    def __init__(self, image_height, image_width, channel, minimum_patch_size,
                 num_iter=5, guide_weight=10.0, use_mean_target_style=False,
                 use_pairwise_patch_error=False, tracking_window_size=0,
                 initialize="identity", seed=0, **_unused):
        maximum_patch_size = minimum_patch_size + (num_iter - 1) * 2
        self.pyramid_level = max(
            1, int(np.log2(min(image_height, image_width) / maximum_patch_size))
        )
        self.initialize = initialize
        self.rng = np.random.default_rng(seed)
        self.pyramid_heights, self.pyramid_widths, self.patch_matchers = [], [], []
        for level in range(self.pyramid_level):
            h = image_height // (2 ** (self.pyramid_level - 1 - level))
            w = image_width // (2 ** (self.pyramid_level - 1 - level))
            self.pyramid_heights.append(h)
            self.pyramid_widths.append(w)
            self.patch_matchers.append(PatchMatcher(
                h, w, channel, minimum_patch_size, num_iter=num_iter,
                guide_weight=guide_weight,
                use_mean_target_style=use_mean_target_style,
                use_pairwise_patch_error=use_pairwise_patch_error,
                tracking_window_size=tracking_window_size, rng=self.rng,
            ))

    def resample_image(self, images, level):
        import cv2

        h, w = self.pyramid_heights[level], self.pyramid_widths[level]
        arr = np.asarray(images)
        out = [cv2.resize(im, (w, h), interpolation=cv2.INTER_AREA) for im in arr]
        return jnp.asarray(np.stack(out), jnp.float32)

    def initialize_nnf(self, batch_size):
        h, w = self.pyramid_heights[0], self.pyramid_widths[0]
        if self.initialize == "random":
            nnf = np.stack([
                self.rng.integers(0, h, (batch_size, h, w)),
                self.rng.integers(0, w, (batch_size, h, w)),
            ], axis=3).astype(np.int32)
        elif self.initialize == "identity":
            nnf = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"),
                           axis=2).astype(np.int32)
            nnf = np.stack([nnf] * batch_size)
        else:
            raise NotImplementedError(self.initialize)
        return jnp.asarray(nnf)

    def update_nnf(self, nnf, level):
        """Upscale the NNF to the next pyramid level (intended semantics of
        ref :262-274 — see module docstring on the reference's index bug)."""
        nnf = jnp.repeat(jnp.repeat(nnf, 2, axis=1), 2, axis=2) * 2
        h2, w2 = nnf.shape[1], nnf.shape[2]
        nnf = nnf.at[:, 1::2, :, 0].add(1)
        nnf = nnf.at[:, :, 1::2, 1].add(1)
        h, w = self.pyramid_heights[level], self.pyramid_widths[level]
        if h != h2 or w != w2:
            import cv2

            arr = np.asarray(nnf).astype(np.float32)
            arr = np.stack([cv2.resize(n, (w, h), interpolation=cv2.INTER_LINEAR)
                            for n in arr]).astype(np.int32)
            nnf = self.patch_matchers[level].clamp_bound(jnp.asarray(arr))
        return nnf

    def estimate_nnf(self, source_guide, target_guide, source_style):
        nnf = None
        target_style = None
        for level in range(self.pyramid_level):
            nnf = (self.initialize_nnf(np.asarray(source_guide).shape[0])
                   if level == 0 else self.update_nnf(nnf, level))
            sg = self.resample_image(source_guide, level)
            tg = self.resample_image(target_guide, level)
            ss = self.resample_image(source_style, level)
            nnf, target_style = self.patch_matchers[level].estimate_nnf(sg, tg, ss, nnf)
        return np.asarray(nnf), np.asarray(target_style)


# ---------------------------------------------------------------------------
# Runners (ref runners/fast.py, runners/balanced.py) + smoother facade
# ---------------------------------------------------------------------------


class TableManager:
    """Binary-lifting remapping tables for Fast mode (ref runners/fast.py)."""

    def task_list(self, n):
        import functools as ft

        tasks = []
        max_level = 1
        while (1 << max_level) <= n:
            max_level += 1
        for i in range(n):
            j = i
            for level in range(max_level):
                if i & (1 << level):
                    continue
                j |= 1 << level
                if j >= n:
                    break
                tasks.append({"source": i, "target": j, "level": level + 1})
        tasks.sort(key=ft.cmp_to_key(lambda u, v: u["level"] - v["level"]))
        return tasks

    def build_remapping_table(self, frames_guide, frames_style, engine, batch_size):
        n = len(frames_guide)
        tasks = self.task_list(n)
        table = [[(np.asarray(frames_style[i], np.float32), 1)] for i in range(n)]
        for b0 in range(0, len(tasks), batch_size):
            batch = tasks[b0:b0 + batch_size]
            sg = np.stack([frames_guide[t["source"]] for t in batch])
            tg = np.stack([frames_guide[t["target"]] for t in batch])
            ss = np.stack([frames_style[t["source"]] for t in batch])
            _, ts = engine.estimate_nnf(sg, tg, ss)
            for t, result in zip(batch, ts):
                target, level = t["target"], t["level"]
                if len(table[target]) == level:
                    table[target].append((result, 1))
                else:
                    frame, weight = table[target][level]
                    table[target][level] = (
                        frame * (weight / (weight + 1)) + result / (weight + 1),
                        weight + 1,
                    )
        return table

    def remapping_table_to_blending_table(self, table):
        for i in range(len(table)):
            for j in range(1, len(table[i])):
                f1, w1 = table[i][j - 1]
                f2, w2 = table[i][j]
                table[i][j] = ((f1 + f2) / 2, w1 + w2)
        return table

    def tree_query(self, leftbound, rightbound):
        node_list = []
        node_index = rightbound
        while node_index >= leftbound:
            node_level = 0
            while (1 << node_level) & node_index and \
                    node_index - (1 << (node_level + 1)) + 1 >= leftbound:
                node_level += 1
            node_list.append((node_index, node_level))
            node_index -= 1 << node_level
        return node_list

    def process_window_sum(self, frames_guide, blending_table, engine,
                           window_size, batch_size):
        n = len(blending_table)
        tasks, frames_result = [], []
        for target in range(n):
            for source, level in self.tree_query(max(target - window_size, 0), target):
                if source != target:
                    tasks.append({"source": source, "target": target, "level": level})
                else:
                    frames_result.append(blending_table[target][level])
        for b0 in range(0, len(tasks), batch_size):
            batch = tasks[b0:b0 + batch_size]
            sg = np.stack([frames_guide[t["source"]] for t in batch])
            tg = np.stack([frames_guide[t["target"]] for t in batch])
            ss = np.stack([blending_table[t["source"]][t["level"]][0] for t in batch])
            _, ts = engine.estimate_nnf(sg, tg, ss)
            for t, f2 in zip(batch, ts):
                source, target, level = t["source"], t["target"], t["level"]
                f1, w1 = frames_result[target]
                w2 = blending_table[source][level][1]
                w = w1 + w2
                frames_result[target] = (f1 * (w1 / w) + f2 * (w2 / w), w)
        return frames_result


class FastBlendSmoother:
    """Bidirectional Fast-mode blending (ref FastBlend/__init__.py:7-66)."""

    def __init__(self, batch_size=8, window_size=64, ebsynth_config=None):
        self.batch_size = batch_size
        self.window_size = window_size
        self.ebsynth_config = ebsynth_config or {
            "minimum_patch_size": 5,
            "num_iter": 5,
            "guide_weight": 10.0,
            "initialize": "identity",
            "tracking_window_size": 0,
        }

    @staticmethod
    def from_model_manager(model_manager, **kwargs):
        return FastBlendSmoother(**kwargs)

    def run(self, frames_guide, frames_style, batch_size, window_size, cfg):
        from PIL import Image

        frames_guide = [np.asarray(f, np.float32) for f in frames_guide]
        frames_style = [np.asarray(f, np.float32) for f in frames_style]
        tm = TableManager()
        engine = PyramidPatchMatcher(
            image_height=frames_style[0].shape[0],
            image_width=frames_style[0].shape[1],
            channel=3, **cfg,
        )
        table_l = tm.build_remapping_table(frames_guide, frames_style, engine, batch_size)
        table_l = tm.remapping_table_to_blending_table(table_l)
        table_l = tm.process_window_sum(frames_guide, table_l, engine, window_size, batch_size)
        table_r = tm.build_remapping_table(frames_guide[::-1], frames_style[::-1], engine, batch_size)
        table_r = tm.remapping_table_to_blending_table(table_r)
        table_r = tm.process_window_sum(frames_guide[::-1], table_r, engine,
                                        window_size, batch_size)[::-1]
        frames = []
        for (f_l, w_l), f_m, (f_r, w_r) in zip(table_l, frames_style, table_r):
            w_m = -1
            w = w_l + w_m + w_r
            frames.append(f_l * (w_l / w) + f_m * (w_m / w) + f_r * (w_r / w))
        return [Image.fromarray(np.clip(f, 0, 255).astype(np.uint8)) for f in frames]

    def __call__(self, rendered_frames, original_frames=None, **kwargs):
        return self.run(original_frames, rendered_frames,
                        self.batch_size, self.window_size, self.ebsynth_config)
