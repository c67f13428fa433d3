"""Attention-kernel tuning harness (VERDICT r3 action #2).

Times ops.attention's Pallas forward at the 14B flagship shape
(b=1, heads=40, S=32760, d=128 — 480x832/81f) and reports achieved TF/s
per variant so block/unroll changes can be judged in isolation from the
full step. FLOPs counted as 4*S*S*d per head (QK^T + PV).

Usage: python scripts/bench_attention.py [--seq 32760] [--heads 40]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=32760)
    ap.add_argument("--heads", type=int, default=40)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--head_dim", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--rope", action="store_true", default=False)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import svi_tpu
    from svi_tpu.ops import attention as attn
    from svi_tpu.ops.rope import rope_angles_for_grid

    svi_tpu.enable_compilation_cache()
    assert jax.default_backend() == "tpu"

    b, s, n, d = args.batch, args.seq, args.heads, args.head_dim
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, n * d)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, n * d)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, n * d)) * 0.3, jnp.bfloat16)
    flops = 4.0 * b * n * float(s) * float(s) * d

    if args.rope:
        # 3D grid matching 21x30x52 latents (32760 tokens)
        cos, sin = rope_angles_for_grid((21, 30, 52), d)
    else:
        cos = sin = None

    fn = jax.jit(
        lambda q_, k_, v_: attn.flash_attention_flat(
            q_, k_, v_, head_dim=d, cos=cos, sin=sin
        )
    )

    def sync(x):
        # the axon tunnel dispatches asynchronously even through
        # block_until_ready; a literal host fetch is the only real barrier
        # (same workaround as bench.py)
        return np.asarray(x[0, 0, 0])

    out = fn(q, k, v)
    sync(out)
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        out = fn(q, k, v)
        sync(out)
        times.append(time.perf_counter() - t0)
    t = min(times)
    print(f"shape b{b} n{n} s{s} d{d} rope={args.rope}: "
          f"{t * 1e3:.2f} ms  {flops / t / 1e12:.1f} TF/s")


if __name__ == "__main__":
    main()
