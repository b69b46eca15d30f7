"""Pallas MIPS kernels.

Fused building blocks for the blocked exact-search pipeline (ops/topk.py).
The XLA path materializes the [q, chunk] score matrix in HBM between the
matmul and the bucket-max reduction; the Pallas kernel fuses the two so each
score tile lives only in VMEM and the only HBM write is the [q, n/bucket]
bucket-max matrix -- a ``bucket``-fold reduction in score-buffer bandwidth.

Kernel shape (see /opt/skills/guides/pallas_guide.md):
  grid = (q_tiles, corpus_blocks); per step the MXU computes a
  [TQ, BLK] score tile from VMEM-resident operands (Pallas pipelines the
  HBM->VMEM streaming of corpus blocks across grid steps automatically via
  the BlockSpec index maps), the VPU reduces it over ``bucket``-wide groups,
  and only the maxes are written out.

Measured on v5e (1M x 1600 bf16 corpus, 1024 queries): the end-to-end exact
path is within ~2x of the pure-matmul floor already, so this kernel is an
optional backend (``scores_bucket_max``) and the default remains the XLA
path; both are exercised by tests for equality (interpret mode -- the
tunneled dev TPU does not lower Mosaic; native TPU hosts compile these
directly).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bucket_max_kernel(q_ref, c_ref, out_ref, *, bucket: int, inner: int):
    """One grid step: scores = q_tile @ c_blk.T, bucket-max reduce, write
    into this inner step's slice of the (revisited) output block.

    The output block holds 128 bucket maxes (the minimum lane-aligned tile);
    each inner step contributes ``block_c // bucket`` of them.
    """
    r = pl.program_id(2)
    scores = jax.lax.dot_general(
        q_ref[:],
        c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TQ, BLK]
    tq, blk = scores.shape
    nb_blk = blk // bucket
    bmax = jnp.max(scores.reshape(tq, nb_blk, bucket), axis=-1)
    out_ref[:, pl.ds(r * nb_blk, nb_blk)] = bmax


@functools.partial(
    jax.jit, static_argnames=("bucket", "block_q", "block_c")
)
def scores_bucket_max(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    bucket: int = 128,
    block_q: int = 256,
    block_c: int = 2048,
) -> jnp.ndarray:
    """Fused scores + bucket-max: returns [q, n // bucket] where entry
    (i, j) = max over rows [j*bucket, (j+1)*bucket) of <queries[i], row>.

    The [TQ, BLK] score tile lives only in VMEM; the HBM write is the
    bucket-max matrix, ``bucket``-fold smaller than the score matrix the
    XLA path materializes. TPU tiling requires the output block's lane dim
    to be 128, i.e. 128 buckets = 128 * bucket corpus rows per output
    block, so an inner grid axis accumulates ``128 * bucket / block_c``
    corpus sub-blocks into each revisited output block.

    Constraints: q % block_q == 0, n % (128 * bucket) == 0,
    (128 * bucket) % block_c == 0, block_c % bucket == 0.
    """
    q, d = queries.shape
    n = corpus.shape[0]
    rows_per_out = 128 * bucket
    assert q % block_q == 0, (q, block_q)
    assert n % rows_per_out == 0, (n, rows_per_out)
    assert rows_per_out % block_c == 0, (rows_per_out, block_c)
    assert block_c % bucket == 0, (block_c, bucket)
    inner = rows_per_out // block_c

    grid = (q // block_q, n // rows_per_out, inner)
    return pl.pallas_call(
        functools.partial(_bucket_max_kernel, bucket=bucket, inner=inner),
        out_shape=jax.ShapeDtypeStruct((q, n // bucket), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_q, d), lambda i, j, r: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_c, d),
                lambda i, j, r: (j * inner + r, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_q, 128), lambda i, j, r: (i, j), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * n * d,
            bytes_accessed=q * d * 2 + n * d * 2 + q * (n // bucket) * 4,
            transcendentals=0,
        ),
    )(queries, corpus)


def _scores_kernel(q_ref, c_ref, out_ref):
    out_ref[:] = jax.lax.dot_general(
        q_ref[:],
        c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("block_q", "block_c"))
def scores_matmul(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    block_q: int = 256,
    block_c: int = 2048,
) -> jnp.ndarray:
    """Plain tiled Pallas score matmul: [q, n] = queries @ corpus.T.
    The building block of the search pipeline, kept as a standalone kernel
    for benchmarking against XLA's matmul."""
    q, d = queries.shape
    n = corpus.shape[0]
    assert q % block_q == 0 and n % block_c == 0
    grid = (q // block_q, n // block_c)
    return pl.pallas_call(
        _scores_kernel,
        out_shape=jax.ShapeDtypeStruct((q, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_q, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_c, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_q, block_c), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * n * d,
            bytes_accessed=q * d * 2 + n * d * 2 + q * n * 4,
            transcendentals=0,
        ),
    )(queries, corpus)


def pallas_bucketed_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    bucket: int = 128,
    block_q: int = 256,
    block_c: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k using the fused Pallas bucket-max kernel for candidate
    bucket selection, then an XLA gather + re-rank over the full scores of
    the selected buckets (recomputed per bucket on the MXU).

    Equivalent to ops.topk.chunked_topk(mode='exact'); exchanges the HBM
    score matrix for a recompute of k*bucket candidate scores per query.
    NOTE the candidate gather reads q*k*bucket corpus rows -- at large q/k
    this exceeds the score-matrix traffic it avoids, so this variant is for
    small-batch / small-k serving; the chunked XLA path is the default.
    """
    q, d = queries.shape
    n = corpus.shape[0]
    bmax = scores_bucket_max(queries, corpus, bucket, block_q, block_c)
    _, b_idx = jax.lax.top_k(bmax, k)  # [q, k] bucket ids
    # gather the selected buckets' corpus rows: [q, k, bucket, d]
    rows = corpus.reshape(n // bucket, bucket, d)[b_idx]  # [q, k, bucket, d]
    cand = jnp.einsum(
        "qd,qkbd->qkb", queries.astype(jnp.float32), rows.astype(jnp.float32)
    ).reshape(q, k * bucket)
    c_vals, c_pos = jax.lax.top_k(cand, k)
    sel_bucket = jnp.take_along_axis(b_idx, c_pos // bucket, axis=1)
    idx = sel_bucket * bucket + c_pos % bucket
    return c_vals, idx


# ---------------------------------------------------------------------------
# Packed Hamming: XOR + popcount fully in VMEM over uint32-packed codes.
# The sign-matmul path (ops/hamming.py sign_topk) is the SPEED path (MXU);
# this kernel is the MEMORY path: the corpus stays packed at 1 bit/bit in
# HBM (32x smaller than +-1 bf16 x16 = 512x smaller than f32 embeddings)
# and distances never materialize beyond a [q, n/bucket] bucket-min matrix.
# Counterpart of FAISS IndexBinaryFlat's packed scan
# (reference: fine_tune_ours.py:839-879).
# ---------------------------------------------------------------------------


def _hamming_bucket_min_kernel(q_ref, c_ref, out_ref, *, bucket: int,
                               words: int):
    """One grid step: packed-XOR popcount distances [TQ, BLK], bucket-min
    reduce, write this inner step's slice of the output block. The per-word
    Python loop keeps the VMEM working set at one [TQ, BLK] accumulator
    instead of a [TQ, BLK, words] cube."""
    r = pl.program_id(2)
    qb = q_ref[:].astype(jnp.uint32)   # [TQ, W]
    cb = c_ref[:].astype(jnp.uint32)   # [BLK, W]
    tq = qb.shape[0]
    blk = cb.shape[0]
    dist = jnp.zeros((tq, blk), dtype=jnp.int32)
    for j in range(words):  # static unroll
        x = jnp.bitwise_xor(qb[:, j][:, None], cb[:, j][None, :])
        dist = dist + jax.lax.population_count(x).astype(jnp.int32)
    nb_blk = blk // bucket
    bmin = jnp.min(dist.reshape(tq, nb_blk, bucket), axis=-1)
    out_ref[:, pl.ds(r * nb_blk, nb_blk)] = bmin


@functools.partial(
    jax.jit, static_argnames=("bucket", "block_q", "block_c")
)
def hamming_bucket_min(
    q_codes: jnp.ndarray,
    c_codes: jnp.ndarray,
    bucket: int = 128,
    block_q: int = 256,
    block_c: int = 2048,
) -> jnp.ndarray:
    """Fused packed-Hamming + bucket-min: [q, n // bucket] where entry
    (i, j) = min Hamming distance from query i to corpus rows
    [j*bucket, (j+1)*bucket). Same grid/constraint structure as
    :func:`scores_bucket_max` (q % block_q == 0, n % (128*bucket) == 0,
    (128*bucket) % block_c == 0, block_c % bucket == 0)."""
    q, w = q_codes.shape
    n = c_codes.shape[0]
    rows_per_out = 128 * bucket
    assert q % block_q == 0, (q, block_q)
    assert n % rows_per_out == 0, (n, rows_per_out)
    assert rows_per_out % block_c == 0, (rows_per_out, block_c)
    assert block_c % bucket == 0, (block_c, bucket)
    inner = rows_per_out // block_c

    grid = (q // block_q, n // rows_per_out, inner)
    return pl.pallas_call(
        functools.partial(
            _hamming_bucket_min_kernel, bucket=bucket, words=w
        ),
        out_shape=jax.ShapeDtypeStruct((q, n // bucket), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_q, w), lambda i, j, r: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_c, w),
                lambda i, j, r: (j * inner + r, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_q, 128), lambda i, j, r: (i, j), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * q * n * w,  # xor + popcount + add per word
            bytes_accessed=q * w * 4 + n * w * 4 + q * (n // bucket) * 4,
            transcendentals=0,
        ),
    )(q_codes, c_codes)


def pallas_hamming_topk(
    q_codes: jnp.ndarray,
    c_codes: jnp.ndarray,
    k: int,
    bucket: int = 128,
    block_q: int = 256,
    block_c: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact Hamming top-k over packed codes: fused bucket-min kernel for
    candidate selection, then an exact popcount re-rank of the k*bucket
    gathered candidates. Identical ranking to ops.hamming.hamming_topk
    (ties may resolve to a different equal-distance row). Returns
    (distances ascending [q, k], indices)."""
    q, w = q_codes.shape
    n = c_codes.shape[0]
    bmin = hamming_bucket_min(q_codes, c_codes, bucket, block_q, block_c)
    _, b_idx = jax.lax.top_k(-bmin, k)  # k best (smallest-min) buckets
    rows = c_codes.reshape(n // bucket, bucket, w)[b_idx]  # [q, k, bucket, w]
    x = jnp.bitwise_xor(
        q_codes.astype(jnp.uint32)[:, None, None, :],
        rows.astype(jnp.uint32),
    )
    cand = jnp.sum(
        jax.lax.population_count(x).astype(jnp.int32), axis=-1
    ).reshape(q, k * bucket)
    c_neg, c_pos = jax.lax.top_k(-cand, k)
    sel_bucket = jnp.take_along_axis(b_idx, c_pos // bucket, axis=1)
    idx = sel_bucket * bucket + c_pos % bucket
    return -c_neg, idx
