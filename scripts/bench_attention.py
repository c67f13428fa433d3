"""Attention-kernel tuning harness.

Times ops.attention's Pallas forward at the 14B flagship shape
(b=1, heads=40, S=32760, d=128 — 480x832/81f) and reports achieved TF/s.
FLOPs counted as 4*S*S*d per head (QK^T + PV).

Timing method: the axon tunnel adds ~25-30ms of fixed dispatch latency per
python->device call, which swamps a ~130ms kernel. Each measurement
therefore runs the op CHAIN times inside one jit with a data dependency
(out feeds the next q) and reports (T_chain - T_single) / (CHAIN - 1).

Usage: python scripts/bench_attention.py [--seq 32760] [--heads 40] [--rope]
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
    ap.add_argument("--quant", type=str, default=None,
                    help="int8 forward: qk8 | qk8pv8 (bf16-equivalent TF/s reported)")
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

    CHAIN = 5

    def mk(nreps):
        def f(q_, k_, v_):
            out = q_
            for _ in range(nreps):
                out = attn.flash_attention_flat(out, k_, v_, head_dim=d,
                                                cos=cos, sin=sin,
                                                quant=args.quant)
            return out
        return f

    def sync(x):
        # the axon tunnel dispatches asynchronously even through
        # block_until_ready; a literal host fetch is the only real barrier
        # (same workaround as bench.py)
        return np.asarray(x[0, 0, 0])

    f1 = jax.jit(mk(1))
    fc = jax.jit(mk(CHAIN))
    sync(f1(q, k, v))
    sync(fc(q, k, v))
    t1s, tcs = [], []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        sync(f1(q, k, v))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        sync(fc(q, k, v))
        tcs.append(time.perf_counter() - t0)
    t = (min(tcs) - min(t1s)) / (CHAIN - 1)
    print(f"shape b{b} n{n} s{s} d{d} rope={args.rope} quant={args.quant}: "
          f"{t * 1e3:.2f} ms  {flops / t / 1e12:.1f} TF/s")


if __name__ == "__main__":
    main()
