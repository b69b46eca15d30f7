"""On-chip sweep of the packed-MXU kernel's shape knobs at 1M x 250/256.

Times (a) the fused kernel alone (scores+bmax) and (b) the full
pallas_packed_topk, for block_q x block_rows x rows_per_bucket, against the
XLA sign_topk control. Timing per CLAUDE.md: chained data deps + final
materialize.
"""
import time
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from sessionsimilaritysearch_tpu.ops import hamming, pallas_mips

N, BITS, Q, K = 1 << 20, 256, 1024, 100
r = np.random.default_rng(0)
signs_np = np.where(r.standard_normal((N, BITS)) > 0, 1.0, -1.0).astype(
    np.float32
)
qs_np = np.where(r.standard_normal((Q, BITS)) > 0, 1.0, -1.0).astype(
    np.float32
)
signs = jnp.asarray(signs_np, jnp.bfloat16)
qs = jnp.asarray(qs_np, jnp.bfloat16)
jax.block_until_ready((signs, qs))
print(f"# platform={jax.devices()[0].platform} N={N} BITS={BITS} Q={Q}")


def timed(tag, fn, iters=8):
    try:
        out = fn(qs)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf)
        t0 = time.perf_counter()
        x = qs
        for _ in range(iters):
            out = fn(x)
            leaf = jax.tree_util.tree_leaves(out)[0]
            x = qs + (leaf[:1, :1] * 0).astype(qs.dtype)
        np.asarray(leaf)
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{tag}: {dt:.2f} ms ({Q / dt * 1000:.0f} QPS)")
        return dt
    except Exception as e:
        print(f"{tag}: FAILED {str(e).splitlines()[0][:140]}")
        return float("nan")


# control: XLA sign scan (exact) at the same bits
timed("xla_sign_topk_exact   ", lambda q: hamming.sign_topk(
    q, signs, K, n_bits=BITS))

# XLA twin of the packed scan (the Mosaic-unavailable fallback): measured
# 2x the sign control within-window -- XLA materializes the unpacked
# corpus through HBM instead of fusing the shifts into the matmul
# (docs/RESULTS.md "Packed tier re-engineered"); compare ratios, not
# absolutes (shared-chip load caveat)
packed_twin = jnp.asarray(hamming.pack_bits_t_np(signs_np))
jax.block_until_ready(packed_twin)
timed("xla_packed_t_topk twin", lambda q: hamming.packed_t_topk(
    q, packed_twin, K, BITS))
del packed_twin

packs = {}
for br in (2048, 4096, 8192, 16384):
    packs[br] = jnp.asarray(hamming.pack_bits_t_np(signs_np, block_rows=br))
jax.block_until_ready(tuple(packs.values()))

for br in (2048, 4096, 8192, 16384):
    for bq in (256, 512, 1024):
        for rpb in (128,):
            if (128 * rpb) % br:
                continue
            timed(
                f"kernel_only  br={br:5d} bq={bq:4d} rpb={rpb}",
                lambda q, br=br, bq=bq, rpb=rpb: (
                    pallas_mips.packed_scores_with_bucket_max(
                        q, packs[br], block_rows=br, rows_per_bucket=rpb,
                        block_q=bq,
                    )
                ),
            )
            timed(
                f"full_topk    br={br:5d} bq={bq:4d} rpb={rpb}",
                lambda q, br=br, bq=bq, rpb=rpb: pallas_mips.pallas_packed_topk(
                    q, packs[br], K, n_bits=BITS, block_rows=br,
                    rows_per_bucket=rpb, block_q=bq,
                ),
            )
