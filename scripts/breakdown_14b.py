"""Measured per-step time breakdown of the Wan-14B flagship denoise step.

Decomposes the batched-CFG (b=2) 480x832/81f step into:
  * self-attention (the bf16 flash kernel, 40 blocks)
  * per-block remainder (W4A8 linears: qkvo + FFN + cross-attn, norms,
    modulation)
  * prelude + head + scheduler glue (residual)
against the full-step wall clock, on the real chip with the same packed-int4
W4A8 weights bench.py uses. Prints one JSON line.

This is the evidence base for the roofline section in docs/PERFORMANCE.md
(VERDICT r4 item 1a).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import svi_tpu
    from svi_tpu.models import wan_dit
    from svi_tpu.ops.rope import rope_angles_for_grid

    svi_tpu.enable_compilation_cache()
    assert jax.default_backend() == "tpu"

    cfg = wan_dit.WAN_14B_I2V
    H, W, NF = 480, 832, 81
    LT = (NF - 1) // 4 + 1
    grid = (LT, H // 16, W // 16)
    S = grid[0] * grid[1] * grid[2]
    B = 2  # batched CFG
    dim = cfg.dim

    params = wan_dit.init_params_int4(jax.random.PRNGKey(2), cfg, w4a8=True)
    jax.block_until_ready(jax.tree.leaves(params)[0])
    rng = np.random.default_rng(0)

    def sync(x):
        return np.asarray(jax.tree.leaves(x)[0].ravel()[0])

    def timed(fn, *a, label=""):
        t0 = time.perf_counter()
        sync(fn(*a))
        t_first = time.perf_counter() - t0
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            sync(fn(*a))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"  {label}: {t * 1e3:.1f} ms (compile+first {t_first:.1f}s)",
              flush=True)
        return t

    # ---- full step: forward() batched-CFG ----
    x = jnp.asarray(rng.standard_normal((1, 16, LT, H // 8, W // 8)), jnp.bfloat16)
    x2 = jnp.concatenate([x, x], axis=0)
    tstep = jnp.asarray([500.0], jnp.float32)
    ctx2 = jnp.asarray(rng.standard_normal((B, 512, 4096)), jnp.bfloat16)
    clip2 = jnp.asarray(rng.standard_normal((B, 257, 1280)), jnp.bfloat16)
    y2 = jnp.asarray(rng.standard_normal((B, 20, LT, H // 8, W // 8)), jnp.bfloat16)

    fwd = jax.jit(lambda p, x, t, c, cl, y: wan_dit.forward(
        p, cfg, x, t, c, clip_feature=cl, y=y))
    t_full = timed(fwd, params, x2, tstep, ctx2, clip2, y2, label="full fwd b=2")

    # ---- one block (W4A8 linears + flash attention + norms) ----
    b0 = jax.tree.map(lambda v: v[0], params["blocks"])
    cos, sin = rope_angles_for_grid(grid, cfg.head_dim)
    tok = jnp.asarray(rng.standard_normal((B, S, dim)), jnp.bfloat16)
    ctx_tok = jnp.asarray(rng.standard_normal((B, 769, dim)), jnp.bfloat16)
    t_mod = jnp.asarray(rng.standard_normal((B, 6, dim)), jnp.bfloat16)

    def block_chain(tok, n):
        for _ in range(n):
            tok = wan_dit.dit_block(b0, cfg, tok, ctx_tok, t_mod, cos, sin)
        return tok

    blk1 = jax.jit(lambda t: block_chain(t, 1))
    blk3 = jax.jit(lambda t: block_chain(t, 3))
    tb1 = timed(blk1, tok, label="1 block")
    tb3 = timed(blk3, tok, label="3 blocks")
    t_block = (tb3 - tb1) / 2  # dispatch-free per-block time

    # ---- attention alone (same kernel + shapes as in-block) ----
    from svi_tpu.ops.attention import flash_attention_flat

    def attn_chain(q, n):
        for _ in range(n):
            q = flash_attention_flat(q, q, q, cfg.head_dim, cos=cos, sin=sin)
        return q

    at1 = jax.jit(lambda q: attn_chain(q, 1))
    at3 = jax.jit(lambda q: attn_chain(q, 3))
    ta1 = timed(at1, tok, label="1 attention")
    ta3 = timed(at3, tok, label="3 attentions")
    t_attn = (ta3 - ta1) / 2

    L = cfg.num_layers
    t_blocks_total = t_block * L
    t_attn_total = t_attn * L
    t_linears_total = t_blocks_total - t_attn_total
    t_glue = t_full - t_blocks_total

    # FLOP accounting (bf16-equivalent)
    attn_flops = 4 * B * S * S * dim * L
    n_lin = sum(
        (v.size * 2 if v.dtype == jnp.int8 else v.size)
        for v in jax.tree.leaves(params["blocks"]) if v.ndim >= 2
    )
    lin_flops = 2 * n_lin * B * S  # full stack: 2 * params * tokens

    out = {
        "shape": f"b{B} S{S} dim{dim} L{L} (480x832/81f batched CFG)",
        "full_step_seconds": round(t_full, 3),
        "block_stack_seconds": round(t_blocks_total, 3),
        "attention_seconds": round(t_attn_total, 3),
        "w4a8_linears_plus_norms_seconds": round(t_linears_total, 3),
        "prelude_head_glue_seconds": round(t_glue, 3),
        "attention_tf_s": round(attn_flops / t_attn_total / 1e12, 1),
        "linears_tf_s_equiv": round(lin_flops / t_linears_total / 1e12, 1),
        "attention_fraction": round(t_attn_total / t_full, 3),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
