"""Benchmark: exact top-K session-similarity search throughput on one chip.

Headline metric (BASELINE.md): queries/sec/chip for exact cosine top-100
over a ~1M-session embedding shard at the reference's dimensions
(d=1600 = the GraphLevelEncoder output, K=100 = test_amazon_filterd.py:460),
with recall@10 vs a brute-force oracle verified on a subcorpus.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 10_000 (the >=10k QPS/chip target from BASELINE.json).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sessionsimilaritysearch_tpu.ops.topk import (
        chunked_topk,
        l2_normalize,
        oracle_topk_np,
        recall_at_k,
    )

    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        N, D, K, Q = 1 << 20, 1600, 100, 1024  # ~1.05M sessions
        chunk = N  # single-pass: the 1M x 1024 f32 score buffer fits HBM
        oracle_n, oracle_q = 65536, 64
        iters = 20
    else:  # CPU smoke fallback so the bench always emits a line
        N, D, K, Q = 1 << 15, 256, 100, 256
        chunk = 1 << 13
        oracle_n, oracle_q = 4096, 16
        iters = 3

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    # build the corpus on device in bf16 (half the HBM of f32, MXU-native)
    corpus = jax.random.normal(k1, (N, D), dtype=jnp.bfloat16)
    corpus = l2_normalize(corpus.astype(jnp.float32)).astype(jnp.bfloat16)
    queries = jax.random.normal(k2, (Q, D), dtype=jnp.float32)
    queries = l2_normalize(queries).astype(jnp.bfloat16)
    jax.block_until_ready((corpus, queries))

    # --- correctness: recall@10 vs numpy oracle on a subcorpus
    sub = np.asarray(corpus[:oracle_n], np.float32)
    subq = np.asarray(queries[:oracle_q], np.float32)
    d_dev, i_dev = chunked_topk(
        jnp.asarray(subq, jnp.bfloat16), corpus[:oracle_n], 10, chunk_size=chunk
    )
    _, i_oracle = oracle_topk_np(subq, sub, 10)
    recall10 = recall_at_k(np.asarray(i_dev), i_oracle)

    # --- throughput: timed exact top-K over the full shard. NOTE: corpus
    # must be a traced argument, not a closure capture -- capturing bakes
    # the multi-GB array into the lowered program as a constant.
    def search(q):
        return chunked_topk(q, corpus, K, chunk_size=chunk, mode="exact",
                            bucket=128)

    # compile + warm: several chained materialized iterations, so no prior
    # async work (corpus normalize, oracle pass) overlaps the timed region
    q = queries
    for _ in range(3):
        vals, _ = search(q)
        q = q + (vals[:, :1] * 1e-12).astype(q.dtype)
    np.asarray(vals)
    t0 = time.perf_counter()
    for _ in range(iters):
        vals, idx = search(q)
        # chain iterations through a data dependency so a lazily-dispatching
        # runtime cannot overlap or defer them past the timer
        q = q + (vals[:, :1] * 1e-12).astype(q.dtype)
    np.asarray(vals)
    dt = (time.perf_counter() - t0) / iters
    qps = Q / dt

    result = {
        "metric": f"exact_top{K}_qps_per_chip_{N>>20}M_x{D}d"
        + (f"_recall10_{recall10:.3f}" if recall10 < 0.999 else ""),
        "value": round(qps, 1),
        "unit": "queries/sec",
        "vs_baseline": round(qps / 10_000, 3),
    }
    print(json.dumps(result))
    print(
        f"# recall@10 vs oracle on {oracle_n} rows: {recall10:.4f}; "
        f"batch={Q}, {dt*1e3:.1f} ms/batch, platform="
        f"{jax.devices()[0].platform}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
