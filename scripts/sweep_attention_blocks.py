"""Block-size sweep for the flat flash-attention forward kernel.

Drives svi_tpu.ops.attention._flash_fwd_pallas_flat directly with explicit
(block_q, block_k, nsub) at the 14B flagship shape (b=1, n=40, S=32760->pad,
d=128), chained-timing method (see scripts/bench_attention.py for why: the
axon tunnel adds ~25-30ms fixed dispatch latency per host->device call).

Usage: python scripts/sweep_attention_blocks.py [--rope] [--seq 32760]
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
    ap.add_argument("--head_dim", type=int, default=128)
    ap.add_argument("--rope", action="store_true", default=False)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--configs", type=str, default="",
                    help="comma-separated bq:bk:nsub triples; empty = full grid")
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

    if args.rope:
        cos, sin = rope_angles_for_grid((21, 30, 52), d)
    else:
        cos = sin = None

    CHAIN = 5
    flops = 4.0 * b * n * float(s) * float(s) * d

    configs = [
        # (block_q, block_k, nsub)
        (1024, 2048, 1),   # round-3 default
        (2048, 4096, 2),   # round-4 default
        (2048, 4096, 4),
        (2048, 2048, 2),
        (1024, 4096, 2),
        (4096, 4096, 2),
        (2048, 8192, 2),
        (2048, 8192, 4),
        (3072, 4096, 2),
        (2048, 4096, 8),
        (2048, 6144, 3),
        (1536, 4096, 2),
    ]
    if args.configs:
        configs = [tuple(int(x) for x in c.split(":"))
                   for c in args.configs.split(",")]

    def ceil_to(x, m):
        return (x + m - 1) // m * m

    results = []
    for (bq, bk, nsub) in configs:
        sq_p = ceil_to(s, bq)
        sk_p = ceil_to(s, bk)
        if bk % nsub or (bk // nsub) % 128:
            print(f"bq{bq} bk{bk} nsub{nsub}: skipped (sub-block not 128-aligned)")
            continue
        q = jnp.asarray(rng.standard_normal((b, sq_p, n * d)) * 0.3, jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, sk_p, n * d)) * 0.3, jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, sk_p, n * d)) * 0.3, jnp.bfloat16)
        if args.rope:
            cosE, sinE = attn._expand_rope_tables(cos, sin, d, sq_p)
            if sk_p != sq_p:
                ck, sk_tab = attn._expand_rope_tables(cos, sin, d, sk_p)
            else:
                ck, sk_tab = cosE, sinE
            fuse = True
        else:
            cosE = sinE = jnp.ones((8, d), jnp.float32)
            ck, sk_tab = cosE, sinE
            fuse = False

        def mk(nreps, bq=bq, bk=bk, nsub=nsub, fuse=fuse):
            def f(q_, k_, v_, cE, sE):
                out = q_
                for _ in range(nreps):
                    out, _ = attn._flash_fwd_pallas_flat(
                        out, k_, v_, cE, sE, s, scale, bq, bk, d, fuse,
                        nsub=nsub)
                return out
            return f

        def sync(x):
            return np.asarray(x[0, 0, 0])

        try:
            f1 = jax.jit(mk(1))
            fc = jax.jit(mk(CHAIN))
            sync(f1(q, k, v, cosE, sinE))
            sync(fc(q, k, v, cosE, sinE))
            t1s, tcs = [], []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                sync(f1(q, k, v, cosE, sinE))
                t1s.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                sync(fc(q, k, v, cosE, sinE))
                tcs.append(time.perf_counter() - t0)
            t = (min(tcs) - min(t1s)) / (CHAIN - 1)
            tfs = flops / t / 1e12
            results.append((tfs, bq, bk, nsub))
            print(f"bq{bq} bk{bk} nsub{nsub}: {t * 1e3:.2f} ms  {tfs:.1f} TF/s",
                  flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"bq{bq} bk{bk} nsub{nsub}: FAILED {type(ex).__name__}: "
                  f"{str(ex)[:120]}", flush=True)

    results.sort(reverse=True)
    print("\nbest:", " | ".join(
        f"{tfs:.1f} TF/s @ bq{bq}/bk{bk}/n{ns}" for tfs, bq, bk, ns in results[:3]))


if __name__ == "__main__":
    main()
