"""Block-size sweep for the flat flash-attention BACKWARD kernels.

Times svi_tpu.ops.attention._flash_bwd_pallas_flat (dQ + dKV Pallas kernels)
at the SVI training shape, chained-timing method (dq feeds the next call's q
to defeat the ~25-30ms axon dispatch latency). Values of lse/delta don't
affect runtime, so random tensors suffice for timing.

FLOPs counted as the canonical flash-backward 2.5x forward: 10*S*S*d/head
(s-recompute x2, dp x2, dv, dk, dq matmuls across the two kernels).

Usage: python scripts/sweep_attention_bwd_blocks.py [--heads 40] [--rope]
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
    ap.add_argument("--heads", type=int, default=12,
                    help="12 = the 1.3B training config; 40 = 14B")
    ap.add_argument("--head_dim", type=int, default=128)
    ap.add_argument("--rope", action="store_true", default=False)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--configs", type=str, default="",
                    help="comma-separated bq:bk or bq:bk:nsub_dq:nsub_dkv; "
                         "empty = full grid at nsub 1/1")
    ap.add_argument("--chain", type=int, default=5)
    ap.add_argument("--onepass", action="store_true", default=False,
                    help="time the one-pass fused backward instead of the "
                         "dQ+dKV split (configs are bq_inner:bk pairs; RoPE "
                         "is XLA-level for this kernel, so --rope is ignored)")
    ap.add_argument("--unroll", type=int, default=1,
                    help="fori_loop unroll for the one-pass kernel")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import svi_tpu
    from svi_tpu.ops import attention as attn
    from svi_tpu.ops.rope import rope_angles_for_grid

    svi_tpu.enable_compilation_cache()
    assert jax.default_backend() == "tpu"

    b, s, n, d = 1, args.seq, args.heads, args.head_dim
    rng = np.random.default_rng(0)
    scale = 1.0 / np.sqrt(d)
    flops = 10.0 * b * n * float(s) * float(s) * d
    CHAIN = args.chain

    configs = [
        (512, 1024),   # round-3 default
        (1024, 1024),
        (512, 2048),
        (1024, 2048),
        (2048, 2048),
        (256, 1024),
        (512, 4096),
    ]
    if args.configs:
        configs = [tuple(int(x) for x in c.split(":"))
                   for c in args.configs.split(",")]
    configs = [c if len(c) == 4 else (*c, 1, 1) for c in configs]

    def ceil_to(x, m):
        return (x + m - 1) // m * m

    if args.rope:
        cos, sin = rope_angles_for_grid((21, 30, 52), d)

    results = []
    for (bq, bk, nsq, nskv) in configs:
        sq_p, sk_p = ceil_to(s, bq), ceil_to(s, bk)
        q = jnp.asarray(rng.standard_normal((b, sq_p, n * d)) * 0.3, jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, sk_p, n * d)) * 0.3, jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, sk_p, n * d)) * 0.3, jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal((b, sq_p, n * d)) * 0.3, jnp.bfloat16)
        if args.onepass:
            lse = jnp.asarray(
                rng.standard_normal((b, n, sq_p // bq, bq)) * 2.0, jnp.float32)
            delta = jnp.asarray(
                rng.standard_normal((b, n, sq_p // bq, bq)), jnp.float32)
        else:
            lse = jnp.asarray(rng.standard_normal((b, n, 1, sq_p)) * 2.0, jnp.float32)
            delta = jnp.asarray(rng.standard_normal((b, n, 1, sq_p)), jnp.float32)
        if args.rope and not args.onepass:
            tab_pad = ceil_to(max(sq_p, sk_p), max(bq, bk))
            cosE, sinE = attn._expand_rope_tables(cos, sin, d, tab_pad)
            fuse = True
        else:
            cosE = sinE = jnp.zeros((8, d), jnp.float32)
            fuse = False

        def mk(nreps, bq=bq, bk=bk, fuse=fuse, nsq=nsq, nskv=nskv):
            def f(q_, k_, v_, g_, lse_, dl_, cE, sE):
                # feed ALL THREE grads forward as the next rep's q/k/v —
                # a dq-only chain lets XLA dead-code-eliminate the dKV
                # kernel (measured: an impossible 290 TF/s)
                for _ in range(nreps):
                    if args.onepass:
                        dq32, k_, v_ = attn._flash_bwd_onepass_pallas_flat(
                            q_, k_, v_, g_, lse_, dl_, scale, bq, bk, d,
                            unroll=args.unroll)
                        q_ = dq32.astype(jnp.bfloat16)
                    else:
                        q_, k_, v_ = attn._flash_bwd_pallas_flat(
                            q_, k_, v_, g_, lse_, dl_, cE, sE, scale, bq, bk,
                            d, fuse, nsub_dq=nsq, nsub_dkv=nskv)
                return q_
            return f

        def sync(x):
            return np.asarray(x[0, 0, 0])

        try:
            f1 = jax.jit(mk(1))
            fc = jax.jit(mk(CHAIN))
            sync(f1(q, k, v, g, lse, delta, cosE, sinE))
            sync(fc(q, k, v, g, lse, delta, cosE, sinE))
            t1s, tcs = [], []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                sync(f1(q, k, v, g, lse, delta, cosE, sinE))
                t1s.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                sync(fc(q, k, v, g, lse, delta, cosE, sinE))
                tcs.append(time.perf_counter() - t0)
            t = (min(tcs) - min(t1s)) / (CHAIN - 1)
            tfs = flops / t / 1e12
            results.append((tfs, bq, bk, nsq, nskv))
            print(f"bq{bq} bk{bk} nsq{nsq} nskv{nskv}: {t * 1e3:.2f} ms  "
                  f"{tfs:.1f} TF/s", flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"bq{bq} bk{bk} nsq{nsq} nskv{nskv}: FAILED "
                  f"{type(ex).__name__}: {str(ex)[:120]}", flush=True)

    results.sort(reverse=True)
    print("\nbest:", " | ".join(
        f"{tfs:.1f} TF/s @ bq{bq}/bk{bk}/nsq{nsq}/nskv{nskv}"
        for tfs, bq, bk, nsq, nskv in results[:3]))


if __name__ == "__main__":
    main()
