"""Block-size sweep for the Pallas MIPS/Hamming kernels on real hardware.

The grid is (q_tiles, groups, inner) with q outermost, so every q-tile
re-streams the whole corpus from HBM: at the bench shape (1M x 1600 bf16 =
3.2 GB) block_q=256 moves 12.8 GB per batch while block_q=1024 (whole
query batch resident in VMEM, 3.2 MB) moves 3.2 GB -- the difference
between a ~55 ms and a ~20 ms kernel at v5e bandwidth. This sweep measures
the real grid/block tradeoffs instead of guessing.

Usage: python examples/pallas_tune.py [--which dense,bucketed,hamming]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def bench(fn, q0, iters=10):
    q = q0
    out = None
    for _ in range(2):
        out = fn(q)
    import jax

    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(q)
        leaf = jax.tree_util.tree_leaves(out)[0]
        q = (q + (leaf[:1, :1] * 0).astype(q.dtype)
             if q.dtype.kind == "f" else q)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="dense,bucketed,hamming")
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--d", type=int, default=1600)
    ap.add_argument("--q", type=int, default=1024)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sessionsimilaritysearch_tpu.ops import hamming, pallas_mips
    from sessionsimilaritysearch_tpu.ops.topk import l2_normalize

    interp = jax.devices()[0].platform == "cpu"
    N, D, Q, K = args.n, args.d, args.q, args.k
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    corpus = l2_normalize(
        jax.random.normal(k1, (N, D), dtype=jnp.bfloat16).astype(jnp.float32)
    ).astype(jnp.bfloat16)
    queries = l2_normalize(
        jax.random.normal(k2, (Q, D), dtype=jnp.float32)
    ).astype(jnp.bfloat16)
    jax.block_until_ready((corpus, queries))

    def report(tag, dt, **kw):
        row = {"kernel": tag, "ms": round(dt * 1e3, 2), **kw}
        print(json.dumps(row))
        sys.stdout.flush()

    if "dense" in args.which:
        # production exact path end-to-end over (block_q, block_c)
        for bq, bc in itertools.product((256, 512, 1024), (512, 1024, 2048)):
            if Q % bq or (128 * 128) % bc:
                continue
            try:
                dt = bench(
                    lambda qq: pallas_mips.pallas_exact_topk(
                        qq, corpus, K, block_q=bq, block_c=bc,
                        interpret=interp,
                    ),
                    queries, args.iters,
                )
                report("pallas_exact", dt, bq=bq, bc=bc,
                       qps=round(Q / dt, 1))
            except Exception as e:
                report("pallas_exact", float("nan"), bq=bq, bc=bc,
                       err=str(e)[:120])
        # floor kernel (no score write, no selection)
        for bq, bc in ((1024, 512), (1024, 1024), (256, 1024)):
            try:
                dt = bench(
                    lambda qq: pallas_mips.scores_bucket_max(
                        qq, corpus, block_q=bq, block_c=bc,
                        interpret=interp,
                    ),
                    queries, args.iters,
                )
                report("bucket_max_floor", dt, bq=bq, bc=bc)
            except Exception as e:
                report("bucket_max_floor", float("nan"), bq=bq, bc=bc,
                       err=str(e)[:120])

    if "bucketed" in args.which:
        q256 = queries[:256]
        for rpb in (8, 16, 32):
            try:
                dt = bench(
                    lambda qq: pallas_mips.pallas_bucketed_topk(
                        qq, corpus, K, rows_per_bucket=rpb,
                        block_q=256, block_c=min(1024, 128 * rpb),
                        interpret=interp,
                    ),
                    q256, args.iters,
                )
                report("pallas_bucketed", dt, rpb=rpb,
                       qps=round(256 / dt, 1))
            except Exception as e:
                report("pallas_bucketed", float("nan"), rpb=rpb,
                       err=str(e)[:160])

    if "hamming" in args.which:
        bits = 250
        signs = jnp.where(
            jax.random.bernoulli(k1, 0.5, (N, bits)), 1.0, -1.0
        ).astype(jnp.bfloat16)
        packed_c = hamming.pack_bits(signs)
        packed_q = hamming.pack_bits(
            jnp.where(jax.random.bernoulli(k2, 0.5, (Q, bits)), 1.0, -1.0)
            .astype(jnp.bfloat16)
        )
        jax.block_until_ready((packed_c, packed_q))
        sig = (
            "block_q", "block_c",
        )
        for bq, bc in itertools.product((256, 512, 1024), (1024, 2048, 4096)):
            if Q % bq:
                continue
            try:
                dt = bench(
                    lambda qq: pallas_mips.pallas_hamming_topk(
                        qq, packed_c, K, block_q=bq, block_c=bc,
                        interpret=interp,
                    ),
                    packed_q, args.iters,
                )
                report("pallas_hamming", dt, bq=bq, bc=bc,
                       qps=round(Q / dt, 1))
            except Exception as e:
                report("pallas_hamming", float("nan"), bq=bq, bc=bc,
                       err=str(e)[:120])


if __name__ == "__main__":
    main()
