"""Pallas MIPS kernels.

Fused building blocks for the blocked exact-search pipeline (ops/topk.py).
The XLA path materializes the [q, chunk] score matrix in HBM between the
matmul and the bucket-max reduction and then reads it back; the kernels here
fuse the matmul with the bucket reduction so each score tile is reduced
while still in VMEM. Two variants:

- ``scores_bucket_max``: emits ONLY the [q, n/128] bucket maxes (the score
  matrix never exists in HBM). Zero score-buffer bandwidth; the exact
  re-rank must then re-read corpus rows, so this backs the small-batch
  serving path (:func:`pallas_bucketed_topk`).
- ``scores_with_bucket_max``: emits the bf16 score matrix AND the bucket
  maxes in one pass. Costs one score write but saves the full score
  re-read the XLA path pays for its reduction, and the exact re-rank
  gathers candidates from the score matrix (cheap). This backs the
  large-batch path (:func:`pallas_exact_topk`), the production TPU search.

Bucket layout -- STRIDED, not contiguous: bucket ``b`` of corpus-row group
``g`` (groups of ``GROUP = 128 * rows_per_bucket`` rows) contains the rows
``g * GROUP + s * 128 + b``. Strided buckets let every grid step reduce its
whole [TQ, BLK] score tile into a full 128-lane output block with a plain
``jnp.maximum`` accumulation across revisits -- Mosaic rejects the
contiguous layout's sub-128-lane dynamic stores ("cannot statically prove
that index in dimension 1 is a multiple of 128"; observed on v5e). Bucket
composition is a free choice: the final exact re-rank only needs a
consistent row <-> bucket mapping, which :func:`bucket_members_view`
centralizes.

Kernel shape (see /opt/skills/guides/pallas_guide.md): grid
``(q_tiles, groups, inner)``; per step the MXU computes a [TQ, BLK] score
tile from VMEM-resident operands (Pallas pipelines the HBM->VMEM streaming
of corpus blocks across grid steps via the BlockSpec index maps), the VPU
folds it to [TQ, 128] partial maxes, and the revisited output block
accumulates across the ``inner`` axis.

Compiled and validated on TPU v5e (this round); interpret mode remains the
CPU-test path (tests/test_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _iota_cols(base, blk):
    return base + jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)


def _bucket_max_kernel(vc_ref, q_ref, c_ref, m_ref, *, block_c: int):
    """One grid step: scores = q_tile @ c_blk.T; fold the [TQ, BLK] tile to
    [TQ, 128] strided-bucket partial maxes; max-accumulate into the
    revisited output block. Rows >= valid_count score -inf."""
    r = pl.program_id(2)
    inner = pl.num_programs(2)
    j = pl.program_id(1)
    scores = jax.lax.dot_general(
        q_ref[:],
        c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TQ, BLK]
    base = (j * inner + r) * block_c
    valid = _iota_cols(base, block_c) < vc_ref[0]
    scores = jnp.where(valid, scores, -jnp.inf)
    tq, blk = scores.shape
    part = jnp.max(scores.reshape(tq, blk // 128, 128), axis=1)

    @pl.when(r == 0)
    def _():
        m_ref[:] = part

    @pl.when(r != 0)
    def _():
        m_ref[:] = jnp.maximum(m_ref[:], part)


@functools.partial(
    jax.jit,
    static_argnames=("rows_per_bucket", "block_q", "block_c", "interpret"),
)
def scores_bucket_max(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    rows_per_bucket: int = 128,
    block_q: int = 256,
    block_c: int = 1024,
    valid_count: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused scores + strided-bucket max: returns [q, n // rows_per_bucket]
    f32 where entry (i, g * 128 + b) = max over ``bucket_members_view``
    bucket (g, b) of <queries[i], row>. The score matrix never reaches HBM.

    Constraints: q % block_q == 0, n % (128 * rows_per_bucket) == 0,
    (128 * rows_per_bucket) % block_c == 0, block_c % 128 == 0.
    """
    q, d = queries.shape
    n = corpus.shape[0]
    group = 128 * rows_per_bucket
    assert q % block_q == 0, (q, block_q)
    assert n % group == 0, (n, group)
    assert group % block_c == 0, (group, block_c)
    assert block_c % 128 == 0, block_c
    inner = group // block_c
    vc = jnp.asarray(
        [n if valid_count is None else valid_count], jnp.int32
    )

    grid = (q // block_q, n // group, inner)
    return pl.pallas_call(
        functools.partial(_bucket_max_kernel, block_c=block_c),
        out_shape=jax.ShapeDtypeStruct((q, n // rows_per_bucket), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
            bytes_accessed=q * d * 2 + n * d * 2 + q * (n // rows_per_bucket) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(vc, queries, corpus)


def _scores_bmax_kernel(vc_ref, q_ref, c_ref, s_ref, m_ref, *, block_c: int):
    """Fused variant that also stores the bf16 score tile."""
    r = pl.program_id(2)
    inner = pl.num_programs(2)
    j = pl.program_id(1)
    scores = jax.lax.dot_general(
        q_ref[:],
        c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    base = (j * inner + r) * block_c
    valid = _iota_cols(base, block_c) < vc_ref[0]
    scores = jnp.where(valid, scores, -jnp.inf)
    s_ref[:] = scores.astype(s_ref.dtype)
    tq, blk = scores.shape
    part = jnp.max(scores.reshape(tq, blk // 128, 128), axis=1)

    @pl.when(r == 0)
    def _():
        m_ref[:] = part

    @pl.when(r != 0)
    def _():
        m_ref[:] = jnp.maximum(m_ref[:], part)


@functools.partial(
    jax.jit,
    static_argnames=(
        "rows_per_bucket", "block_q", "block_c", "score_dtype", "interpret"
    ),
)
def scores_with_bucket_max(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    rows_per_bucket: int = 128,
    block_q: int = 256,
    block_c: int = 1024,
    valid_count: Optional[jnp.ndarray] = None,
    score_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One fused pass emitting (scores [q, n] ``score_dtype``, strided
    bucket maxes [q, n // rows_per_bucket] f32). vs the XLA path: the
    bucket reduction happens in VMEM, saving the full score-matrix re-read
    between matmul and reduction. Same constraints as
    :func:`scores_bucket_max`."""
    q, d = queries.shape
    n = corpus.shape[0]
    group = 128 * rows_per_bucket
    assert q % block_q == 0, (q, block_q)
    assert n % group == 0, (n, group)
    assert group % block_c == 0, (group, block_c)
    assert block_c % 128 == 0, block_c
    inner = group // block_c
    vc = jnp.asarray(
        [n if valid_count is None else valid_count], jnp.int32
    )

    grid = (q // block_q, n // group, inner)
    return pl.pallas_call(
        functools.partial(_scores_bmax_kernel, block_c=block_c),
        out_shape=(
            jax.ShapeDtypeStruct((q, n), score_dtype),
            jax.ShapeDtypeStruct((q, n // rows_per_bucket), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (block_q, d), lambda i, j, r: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_c, d),
                lambda i, j, r: (j * inner + r, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (block_q, block_c),
                lambda i, j, r: (i, j * inner + r),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_q, 128), lambda i, j, r: (i, j),
                memory_space=pltpu.VMEM,
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * n * d,
            bytes_accessed=(
                q * d * 2 + n * d * 2
                + q * n * jnp.dtype(score_dtype).itemsize
                + q * (n // rows_per_bucket) * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(vc, queries, corpus)


def _scores_kernel(q_ref, c_ref, out_ref):
    out_ref[:] = jax.lax.dot_general(
        q_ref[:],
        c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_c", "interpret")
)
def scores_matmul(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    block_q: int = 256,
    block_c: int = 1024,
    interpret: bool = False,
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
        interpret=interpret,
    )(queries, corpus)


def bucket_members_view(corpus: jnp.ndarray, rows_per_bucket: int):
    """View of the corpus grouped by strided bucket: [n_groups,
    rows_per_bucket, 128, d] where bucket (g, b) -- global id g*128+b --
    holds ``view[g, :, b]`` = global rows g*128*rows_per_bucket + s*128 + b.
    The row <-> bucket mapping shared by all kernels/re-rankers here."""
    n, d = corpus.shape
    group = 128 * rows_per_bucket
    assert n % group == 0
    return corpus.reshape(n // group, rows_per_bucket, 128, d)


def _global_rows(b_idx, c_pos, rows_per_bucket: int):
    """Recover global row ids from (bucket ids [q,k], flat positions within
    the gathered [q, k*rows_per_bucket] candidate block)."""
    kk = c_pos // rows_per_bucket  # which of the k buckets
    s = c_pos % rows_per_bucket    # stride index within the bucket
    sel = jnp.take_along_axis(b_idx, kk, axis=1)
    g, b = sel // 128, sel % 128
    return g * (128 * rows_per_bucket) + s * 128 + b


@functools.partial(
    jax.jit,
    static_argnames=("k", "rows_per_bucket", "block_q", "block_c", "interpret"),
)
def pallas_bucketed_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    rows_per_bucket: int = 128,
    block_q: int = 256,
    block_c: int = 1024,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k with ZERO score-matrix HBM traffic: fused bucket-max
    kernel for candidate-bucket selection, then an exact re-rank over the
    k selected buckets' corpus rows (recomputed on the MXU).

    NOTE the candidate gather reads q*k*rows_per_bucket corpus rows -- at
    large q*k this exceeds the score traffic it avoids, so this variant is
    for small-batch / small-k serving; :func:`pallas_exact_topk` is the
    large-batch path.
    """
    q, d = queries.shape
    bmax = scores_bucket_max(
        queries, corpus, rows_per_bucket, block_q, block_c,
        interpret=interpret,
    )
    _, b_idx = jax.lax.top_k(bmax, k)  # [q, k] strided-bucket ids
    view = bucket_members_view(corpus, rows_per_bucket)  # [G, S, 128, d]
    g, b = b_idx // 128, b_idx % 128
    rows = view[g, :, b]  # [q, k, S, d]
    # keep the gathered rows in the corpus dtype and accumulate in f32 on
    # the MXU -- casting the [q, k, S, d] gather to f32 first doubles its
    # HBM footprint (q=256, k=100, S=128, d=1600 would materialize 21 GB).
    # NOTE: with a bf16 corpus this rounds f32 queries to bf16 for the
    # re-rank (exact at bf16 precision, same contract as the production
    # bf16-scored XLA scan). int8-quantized corpora are NOT supported here
    # -- the cast would truncate float queries to garbage codes; use
    # ops.topk.chunked_topk's corpus_scales path instead.
    assert jnp.issubdtype(corpus.dtype, jnp.floating), (
        f"pallas_bucketed_topk requires a floating corpus, got {corpus.dtype}"
    )
    cand = jnp.einsum(
        "qd,qksd->qks",
        queries.astype(corpus.dtype),
        rows,
        preferred_element_type=jnp.float32,
    ).reshape(q, k * rows_per_bucket)
    c_vals, c_pos = jax.lax.top_k(cand, k)
    return c_vals, _global_rows(b_idx, c_pos, rows_per_bucket)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "rows_per_bucket", "block_q", "block_c", "score_dtype",
        "interpret",
    ),
)
def pallas_exact_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    rows_per_bucket: int = 128,
    block_q: int = 256,
    block_c: int = 1024,
    valid_count: Optional[jnp.ndarray] = None,
    score_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k, large-batch production path: one fused kernel pass
    emits bf16 scores + bucket maxes; selection then gathers only the top-k
    buckets' scores ([q, k, rows_per_bucket], ~bucket-fold less traffic
    than a full score re-read) and re-ranks exactly.

    Counterpart of the FAISS flat-index scan the reference serves from
    (test_amazon_filterd.py:577-579); ranking matches
    ops.topk.chunked_topk(mode='exact') at equal score dtype (ties may
    resolve to a different equal-score row). Missing slots (k > valid
    rows) carry (-inf, -1).
    """
    q, d = queries.shape
    scores, bmax = scores_with_bucket_max(
        queries, corpus, rows_per_bucket, block_q, block_c,
        valid_count=valid_count, score_dtype=score_dtype,
        interpret=interpret,
    )
    return _select_exact_from_scores(scores, bmax, k, rows_per_bucket)


def _select_exact_from_scores(scores, bmax, k: int, rows_per_bucket: int):
    """Shared exact selection over an emitted score matrix: top-k strided
    buckets from the bucket maxes, gather those buckets' score rows
    ([q, k, rows_per_bucket] -- a bucket-fold less traffic than a full
    score re-read), exact top-k re-rank. Invalid/filtered rows must
    already score -inf (kernel-side masking); missing slots come back
    (-inf, -1)."""
    q, n = scores.shape
    _, b_idx = jax.lax.top_k(bmax, k)  # [q, k] bucket ids
    group = 128 * rows_per_bucket
    s4 = scores.reshape(q, n // group, rows_per_bucket, 128)
    g, b = b_idx // 128, b_idx % 128
    qi = jnp.arange(q)[:, None]
    cand = s4[qi, g, :, b].astype(jnp.float32)  # [q, k, S]
    c_vals, c_pos = jax.lax.top_k(cand.reshape(q, k * rows_per_bucket), k)
    idx = _global_rows(b_idx, c_pos, rows_per_bucket)
    idx = jnp.where(jnp.isfinite(c_vals), idx, -1)
    return c_vals, idx


def _scores_bmax_int8_kernel(q_ref, c_ref, cs_ref, s_ref, m_ref):
    """int8 x int8 -> int32 on the MXU's double-rate path, dequantized by
    the corpus-row scale and bucket-max-folded in VMEM. The full int32
    product matrix never exists in HBM (the XLA int8x8 path materializes
    it before dequantizing: 4 GB at 1024 x 1M).

    Per-QUERY scales are deliberately absent: a query's scale is a constant
    positive factor on its whole score row, so ranking and bucket argmax
    are invariant to it -- the caller rescales the final [q, k] values
    instead (pallas_exact_topk_int8)."""
    r = pl.program_id(2)
    qc = jax.lax.dot_general(
        q_ref[:],
        c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [TQ, BLK] int32
    scores = qc.astype(jnp.float32) * cs_ref[:]  # [1, BLK] broadcasts
    s_ref[:] = scores.astype(s_ref.dtype)
    tq, blk = scores.shape
    part = jnp.max(scores.reshape(tq, blk // 128, 128), axis=1)

    @pl.when(r == 0)
    def _():
        m_ref[:] = part

    @pl.when(r != 0)
    def _():
        m_ref[:] = jnp.maximum(m_ref[:], part)


@functools.partial(
    jax.jit,
    static_argnames=(
        "rows_per_bucket", "block_q", "block_c", "score_dtype", "interpret"
    ),
)
def scores_with_bucket_max_int8(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    corpus_scales: jnp.ndarray,
    rows_per_bucket: int = 128,
    block_q: int = 256,
    block_c: int = 1024,
    valid_count: Optional[jnp.ndarray] = None,
    score_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused int8 scan: (row-scaled scores [q, n] ``score_dtype``, strided
    bucket maxes [q, n // rows_per_bucket] f32). ``queries``/``corpus`` are
    int8 codes (DenseIndex(quantize='int8x8') storage); scores come back
    multiplied by ``corpus_scales`` only -- apply the per-query scale to
    the final top-k values, not the matrix. Rows >= valid_count score
    -3e38. Same grid constraints as :func:`scores_with_bucket_max`."""
    q, d = queries.shape
    n = corpus.shape[0]
    group = 128 * rows_per_bucket
    assert queries.dtype == jnp.int8 and corpus.dtype == jnp.int8
    assert q % block_q == 0, (q, block_q)
    assert n % group == 0, (n, group)
    assert group % block_c == 0, (group, block_c)
    assert block_c % 128 == 0, block_c
    inner = group // block_c
    cs = corpus_scales.astype(jnp.float32).reshape(1, n)
    if valid_count is not None:
        # fold validity into the scale stream: invalid rows get scale 0 and
        # hence score 0 (see pallas_exact_topk_int8's validity note); no
        # extra kernel input or in-kernel masking needed
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        cs = jnp.where(col < valid_count, cs, jnp.float32(0))
    out = pl.pallas_call(
        _scores_bmax_int8_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((q, n), score_dtype),
            jax.ShapeDtypeStruct((q, n // rows_per_bucket), jnp.float32),
        ),
        grid=(q // block_q, n // group, inner),
        in_specs=[
            pl.BlockSpec(
                (block_q, d), lambda i, j, r: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_c, d),
                lambda i, j, r: (j * inner + r, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_c),
                lambda i, j, r: (0, j * inner + r),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (block_q, block_c),
                lambda i, j, r: (i, j * inner + r),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_q, 128), lambda i, j, r: (i, j),
                memory_space=pltpu.VMEM,
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * n * d,
            bytes_accessed=(
                q * d + n * d + n * 4
                + q * n * jnp.dtype(score_dtype).itemsize
                + q * (n // rows_per_bucket) * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, corpus, cs)
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "rows_per_bucket", "block_q", "block_c", "score_dtype",
        "interpret",
    ),
)
def pallas_exact_topk_int8(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    query_scales: jnp.ndarray,
    corpus_scales: jnp.ndarray,
    rows_per_bucket: int = 128,
    block_q: int = 256,
    block_c: int = 1024,
    valid_count: Optional[jnp.ndarray] = None,
    score_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over an int8x8-quantized corpus with the fused Pallas
    scan: one kernel pass emits row-scaled scores + bucket maxes (the int32
    product matrix never reaches HBM), selection and exact re-rank follow
    :func:`pallas_exact_topk`, and the per-query scale multiplies only the
    final [q, k] values. Ranking matches ops.topk.chunked_topk with
    query_scales/corpus_scales at equal score dtype.

    Validity note: rows >= valid_count get corpus scale 0, i.e. score 0.
    For 'cos'/'ip' corpora whose true top-k scores are positive this is
    exact once >= k positive-scoring valid rows exist; the re-rank
    additionally masks candidate ids >= valid_count so invalid rows are
    never RETURNED (they can only waste candidate slots while the corpus
    is nearly empty or all-negative -- pair with the XLA path if that
    regime matters)."""
    q, d = queries.shape
    n = corpus.shape[0]
    scores, bmax = scores_with_bucket_max_int8(
        queries, corpus, corpus_scales, rows_per_bucket, block_q, block_c,
        valid_count=valid_count, score_dtype=score_dtype,
        interpret=interpret,
    )
    _, b_idx = jax.lax.top_k(bmax, k)
    group = 128 * rows_per_bucket
    s4 = scores.reshape(q, n // group, rows_per_bucket, 128)
    g, b = b_idx // 128, b_idx % 128
    qi = jnp.arange(q)[:, None]
    cand = s4[qi, g, :, b].astype(jnp.float32)  # [q, k, S]
    cand = cand.reshape(q, k * rows_per_bucket)
    all_pos = jnp.broadcast_to(
        jnp.arange(k * rows_per_bucket, dtype=jnp.int32),
        (q, k * rows_per_bucket),
    )
    gids = _global_rows(b_idx, all_pos, rows_per_bucket)
    if valid_count is not None:
        cand = jnp.where(gids < valid_count, cand, -jnp.inf)
    c_vals, c_pos = jax.lax.top_k(cand, k)
    idx = jnp.take_along_axis(gids, c_pos, axis=1)
    idx = jnp.where(jnp.isfinite(c_vals), idx, -1)
    vals = c_vals * query_scales[:, None].astype(jnp.float32)
    vals = jnp.where(jnp.isfinite(c_vals), vals, -jnp.inf)
    return vals, idx


# ---------------------------------------------------------------------------
# Packed Hamming: XOR + popcount fully in VMEM over uint32-packed codes.
# The sign-matmul path (ops/hamming.py sign_topk) is the SPEED path (MXU);
# this kernel is the MEMORY path: the corpus stays packed at 1 bit/bit in
# HBM (16x smaller than +-1 bf16 = 32x smaller than bf16 embeddings of the
# same width) and distances never materialize beyond a [q, n/128]
# bucket-min matrix. Counterpart of FAISS IndexBinaryFlat's packed scan
# (reference: fine_tune_ours.py:839-879).
# ---------------------------------------------------------------------------


def _hamming_bucket_min_kernel(q_ref, c_ref, m_ref, *, words: int):
    """One grid step: packed-XOR popcount distances [TQ, BLK], strided
    bucket-min fold to [TQ, 128], min-accumulate into the revisited output
    block. The per-word Python loop keeps the VMEM working set at one
    [TQ, BLK] accumulator instead of a [TQ, BLK, words] cube.

    Deliberately NO in-kernel valid_count masking: adding the SMEM scalar +
    per-step iota/where was measured to slow the kernel ~5x on v5e (40 ms
    -> 195 ms at 1M x 250 bits; likely deoptimized pipelining). Streaming
    validity is handled by the PENALTY variant below (a per-row additive
    int32 streamed alongside the codes), which costs one broadcast VPU add
    per tile instead of per-step index generation."""
    r = pl.program_id(2)
    qb = q_ref[:].astype(jnp.uint32)   # [TQ, W]
    cb = c_ref[:].astype(jnp.uint32)   # [BLK, W]
    tq = qb.shape[0]
    blk = cb.shape[0]
    dist = jnp.zeros((tq, blk), dtype=jnp.int32)
    for jw in range(words):  # static unroll
        x = jnp.bitwise_xor(qb[:, jw][:, None], cb[:, jw][None, :])
        dist = dist + jax.lax.population_count(x).astype(jnp.int32)
    part = jnp.min(dist.reshape(tq, blk // 128, 128), axis=1)

    @pl.when(r == 0)
    def _():
        m_ref[:] = part

    @pl.when(r != 0)
    def _():
        m_ref[:] = jnp.minimum(m_ref[:], part)


def _hamming_bucket_min_pen_kernel(q_ref, c_ref, pen_ref, m_ref, *, words: int):
    """Penalty variant: dist += per-row penalty (0 for valid rows, a huge
    constant for rows beyond the corpus fill count) BEFORE the bucket fold,
    so an invalid row can never contaminate its bucket's min. One extra
    [1, BLK] int32 stream (+4 bytes/row of HBM traffic vs 4*words for the
    codes) and one broadcast add per tile -- unlike in-kernel iota masking
    this preserves the pipelined grid (see _hamming_bucket_min_kernel)."""
    r = pl.program_id(2)
    qb = q_ref[:].astype(jnp.uint32)   # [TQ, W]
    cb = c_ref[:].astype(jnp.uint32)   # [BLK, W]
    tq = qb.shape[0]
    blk = cb.shape[0]
    dist = jnp.zeros((tq, blk), dtype=jnp.int32)
    for jw in range(words):  # static unroll
        x = jnp.bitwise_xor(qb[:, jw][:, None], cb[:, jw][None, :])
        dist = dist + jax.lax.population_count(x).astype(jnp.int32)
    dist = dist + pen_ref[:]           # [1, BLK] broadcasts over TQ
    part = jnp.min(dist.reshape(tq, blk // 128, 128), axis=1)

    @pl.when(r == 0)
    def _():
        m_ref[:] = part

    @pl.when(r != 0)
    def _():
        m_ref[:] = jnp.minimum(m_ref[:], part)


@functools.partial(
    jax.jit,
    static_argnames=("rows_per_bucket", "block_q", "block_c", "interpret"),
)
def hamming_bucket_min(
    q_codes: jnp.ndarray,
    c_codes: jnp.ndarray,
    rows_per_bucket: int = 128,
    block_q: int = 256,
    block_c: int = 1024,
    penalties: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused packed-Hamming + strided-bucket min: [q, n // rows_per_bucket]
    where entry (i, g * 128 + b) = min Hamming distance from query i to
    ``bucket_members_view`` bucket (g, b). Same grid/constraint structure
    as :func:`scores_bucket_max`.

    ``penalties``: optional [1, n] int32 added to each corpus row's
    distance before the bucket fold (0 = live row, huge = masked row) --
    the streaming-validity mechanism (see the kernel docstrings; in-kernel
    iota masking measured 5x slower). Without it, callers must mask at
    re-rank time."""
    q, w = q_codes.shape
    n = c_codes.shape[0]
    group = 128 * rows_per_bucket
    assert q % block_q == 0, (q, block_q)
    assert n % group == 0, (n, group)
    assert group % block_c == 0, (group, block_c)
    assert block_c % 128 == 0, block_c

    inner = group // block_c
    grid = (q // block_q, n // group, inner)
    in_specs = [
        pl.BlockSpec(
            (block_q, w), lambda i, j, r: (i, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (block_c, w),
            lambda i, j, r: (j * inner + r, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [q_codes, c_codes]
    if penalties is None:
        kernel = functools.partial(_hamming_bucket_min_kernel, words=w)
    else:
        assert penalties.shape == (1, n), (penalties.shape, n)
        kernel = functools.partial(_hamming_bucket_min_pen_kernel, words=w)
        in_specs.append(
            pl.BlockSpec(
                (1, block_c),
                lambda i, j, r: (0, j * inner + r),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(penalties)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (q, n // rows_per_bucket), jnp.int32
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_q, 128), lambda i, j, r: (i, j), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * q * n * w,  # xor + popcount + add per word
            bytes_accessed=q * w * 4 + n * w * 4
            + q * (n // rows_per_bucket) * 4
            + (0 if penalties is None else n * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


@functools.partial(
    jax.jit,
    static_argnames=("k", "rows_per_bucket", "block_q", "block_c", "interpret"),
)
def pallas_hamming_topk(
    q_codes: jnp.ndarray,
    c_codes: jnp.ndarray,
    k: int,
    rows_per_bucket: int = 128,
    block_q: int = 256,
    block_c: int = 1024,
    valid_count: Optional[jnp.ndarray] = None,
    row_mask: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact Hamming top-k over packed codes: fused bucket-min kernel for
    candidate selection, then an exact popcount re-rank of the
    k*rows_per_bucket gathered candidates. Identical distances to
    ops.hamming.hamming_topk (ties may resolve to a different
    equal-distance row). Returns (distances ascending [q, k], indices);
    rows >= valid_count are excluded and missing slots carry
    (INT32_MAX, -1), matching hamming_topk's conventions.

    Exactness with a valid_count: rows >= valid_count receive a +2^20
    additive penalty INSIDE the kernel (a [1, n] int32 streamed alongside
    the codes -- see _hamming_bucket_min_pen_kernel), so no bucket's min is
    ever contaminated by an invalid row and plain top-k bucket selection
    stays exact regardless of how many groups the invalid tail spans. (The
    previous compensation -- widening the selection by a flat 128 buckets
    -- silently dropped true neighbors whenever the tail spanned multiple
    128*rows_per_bucket groups.) The re-rank additionally masks gathered
    candidates by global id, which also covers ties at the boundary.

    ``row_mask``: optional [n] bool — filtered search; False rows fold
    into the SAME penalty stream (and the re-rank gather re-checks them),
    so a masked row can neither win a bucket nor surface in the output.
    Dynamic operand: fresh masks never retrace."""
    q, w = q_codes.shape
    n = c_codes.shape[0]
    big = jnp.iinfo(jnp.int32).max
    penalties = None
    if valid_count is not None or row_mask is not None:
        # 0 for live rows, +2^20 (>> any popcount distance) for the
        # invalid tail / filtered rows; rebuilt per call from the dynamic
        # operands so growing a corpus or changing the filter never
        # retraces this function
        live = (
            jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) < valid_count
            if valid_count is not None
            else jnp.ones((1, n), jnp.bool_)
        )
        if row_mask is not None:
            live = live & row_mask.astype(jnp.bool_).reshape(1, n)
        penalties = jnp.where(live, 0, 1 << 20).astype(jnp.int32)
    bmin = hamming_bucket_min(
        q_codes, c_codes, rows_per_bucket, block_q, block_c,
        penalties=penalties, interpret=interpret,
    )
    assert k <= n // rows_per_bucket, (k, n, rows_per_bucket)
    kb = k
    _, b_idx = jax.lax.top_k(-bmin, kb)  # best (smallest-min) buckets
    view = bucket_members_view(c_codes, rows_per_bucket)  # [G, S, 128, w]
    g, b = b_idx // 128, b_idx % 128
    rows = view[g, :, b]  # [q, kb, S, w]
    x = jnp.bitwise_xor(
        q_codes.astype(jnp.uint32)[:, None, None, :],
        rows.astype(jnp.uint32),
    )
    cand = jnp.sum(
        jax.lax.population_count(x).astype(jnp.int32), axis=-1
    ).reshape(q, kb * rows_per_bucket)
    # mask candidates whose GLOBAL row id falls beyond valid_count (a
    # selected bucket can straddle the valid boundary: strided layout)
    all_pos = jnp.broadcast_to(
        jnp.arange(kb * rows_per_bucket, dtype=jnp.int32),
        (q, kb * rows_per_bucket),
    )
    gids = _global_rows(b_idx, all_pos, rows_per_bucket)
    if valid_count is not None:
        cand = jnp.where(gids < valid_count, cand, big)
    if row_mask is not None:
        cand = jnp.where(
            row_mask.astype(jnp.bool_)[jnp.clip(gids, 0, n - 1)], cand, big
        )
    c_neg, c_pos = jax.lax.top_k(-cand, k)
    idx = jnp.take_along_axis(gids, c_pos, axis=1)
    dist = -c_neg
    return dist, jnp.where(dist < big, idx, -1)


# ---------------------------------------------------------------------------
# Packed-code MXU scan: codes stay packed at 1 bit/bit in HBM
# (ops.hamming.pack_bits_t_np transposed layout) and each corpus block is
# unpacked to +-1 bf16 INSIDE the kernel -- 32 static shifts + one SUBLANE
# concat, both near-free on the VPU -- then fed to the MXU like the sign
# path. Measured on v5e at 1M x 256 bits: 66.6 ms/1024-query batch vs
# 65.8 ms for the bf16 sign-matmul control (scores_bucket_max) that reads
# a 16x larger corpus -- i.e. the capacity tier at full matmul speed,
# 2.6x faster than the XOR+popcount bucket-min kernel above (175 ms).
# Lane-axis unpack variants (jnp.repeat / variable shift / lane concat)
# were all 5-10x slower or failed to lower; the transposed pack layout is
# what makes the sublane unpack possible. Counterpart of FAISS
# IndexBinaryFlat's packed scan (reference: fine_tune_ours.py:839-879).
# ---------------------------------------------------------------------------


def _packed_scores_bmax_kernel(q_ref, c_ref, pen_ref, s_ref, m_ref):
    """One grid step: unpack the [S, bits] packed block to the [32*S, bits]
    +-1 bf16 rows it encodes (original row order -- pack_bits_t_np layout),
    MXU-score against the query tile, add the per-row penalty stream
    (0 live / -inf masked: the streaming-validity mechanism, same rationale
    as _hamming_bucket_min_pen_kernel), store the score tile, and
    max-accumulate strided-bucket maxes into the revisited output block."""
    r = pl.program_id(2)
    cb = c_ref[:]  # [S, bits] int32
    parts = [((cb >> j) & jnp.int32(1)) for j in range(32)]
    pm = jnp.concatenate(parts, axis=0)  # [32*S, bits], original order
    pm = (2 * pm - 1).astype(jnp.float32).astype(jnp.bfloat16)
    scores = jax.lax.dot_general(
        q_ref[:],
        pm,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TQ, BLK]
    scores = scores + pen_ref[:]  # [1, BLK] broadcasts
    s_ref[:] = scores.astype(s_ref.dtype)
    tq, blk = scores.shape
    part = jnp.max(scores.reshape(tq, blk // 128, 128), axis=1)

    @pl.when(r == 0)
    def _():
        m_ref[:] = part

    @pl.when(r != 0)
    def _():
        m_ref[:] = jnp.maximum(m_ref[:], part)


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_rows", "rows_per_bucket", "block_q", "score_dtype",
        "interpret",
    ),
)
def packed_scores_with_bucket_max(
    q_signs: jnp.ndarray,
    c_packed_t: jnp.ndarray,
    block_rows: int = 2048,
    rows_per_bucket: int = 128,
    block_q: int = 256,
    penalties: Optional[jnp.ndarray] = None,
    score_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused packed scan: (sign-dot scores [q, n] ``score_dtype``, strided
    bucket maxes [q, n // rows_per_bucket] f32) over a transposed-packed
    corpus (``hamming.pack_bits_t_np(signs, block_rows)``; ``block_rows``
    must equal the pack-time value -- it fixes the unpack's row ordering,
    so it is a LAYOUT property, not a tuning knob).

    ``q_signs``: [q, bits] +-1 bf16; columns past the true code width must
    be ZERO so padded corpus bits contribute nothing to any dot.
    ``penalties``: optional [1, n] f32 added to each corpus row's score
    before both the store and the bucket fold (0 live / -inf masked) --
    valid_count and row-filter masking in one stream.

    Constraints: q % block_q == 0, bits % 128 == 0,
    n % (128 * rows_per_bucket) == 0, (128 * rows_per_bucket) % block_rows
    == 0 (so rows_per_bucket >= block_rows / 128)."""
    q, bits = q_signs.shape
    ns, bits2 = c_packed_t.shape
    assert bits == bits2, (bits, bits2)
    assert bits % 128 == 0, bits
    assert block_rows % 32 == 0, block_rows
    n = ns * 32
    group = 128 * rows_per_bucket
    assert q % block_q == 0, (q, block_q)
    assert n % group == 0, (n, group)
    assert group % block_rows == 0, (group, block_rows)
    inner = group // block_rows
    if penalties is None:
        penalties = jnp.zeros((1, n), jnp.float32)
    assert penalties.shape == (1, n), (penalties.shape, n)
    return pl.pallas_call(
        _packed_scores_bmax_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((q, n), score_dtype),
            jax.ShapeDtypeStruct((q, n // rows_per_bucket), jnp.float32),
        ),
        grid=(q // block_q, n // group, inner),
        in_specs=[
            pl.BlockSpec(
                (block_q, bits), lambda i, j, r: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_rows // 32, bits),
                lambda i, j, r: (j * inner + r, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_rows),
                lambda i, j, r: (0, j * inner + r),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (block_q, block_rows),
                lambda i, j, r: (i, j * inner + r),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_q, 128), lambda i, j, r: (i, j),
                memory_space=pltpu.VMEM,
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * n * bits,
            bytes_accessed=(
                q * bits * 2 + ns * bits * 4 + n * 4
                + q * n * jnp.dtype(score_dtype).itemsize
                + q * (n // rows_per_bucket) * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_signs, c_packed_t, penalties)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "n_bits", "block_rows", "rows_per_bucket", "block_q",
        "interpret",
    ),
)
def pallas_packed_topk(
    q_signs: jnp.ndarray,
    c_packed_t: jnp.ndarray,
    k: int,
    n_bits: int,
    block_rows: int = 2048,
    rows_per_bucket: int = 128,
    block_q: int = 256,
    valid_count: Optional[jnp.ndarray] = None,
    row_mask: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact Hamming top-k over a transposed-packed corpus at sign-matmul
    speed: one fused kernel pass emits sign-dot scores + bucket maxes,
    selection re-ranks from the score matrix (pallas_exact_topk's shape),
    and dots convert to Hamming distances by the +-1 identity
    (ops/hamming.py). Identical distances to ops.hamming.hamming_topk /
    packed_t_topk (ties may resolve to a different equal-distance row);
    rows >= valid_count / row_mask==False rows fold into the kernel's
    penalty stream (score -inf) so no bucket max is ever contaminated;
    missing slots carry (INT32_MAX, -1).

    Exact for n_bits <= 256 (bf16 scores represent every integer dot of
    magnitude <= 256); wider codes store f32 scores automatically."""
    n = c_packed_t.shape[0] * 32
    penalties = None
    if valid_count is not None or row_mask is not None:
        live = (
            jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) < valid_count
            if valid_count is not None
            else jnp.ones((1, n), jnp.bool_)
        )
        if row_mask is not None:
            live = live & row_mask.astype(jnp.bool_).reshape(1, n)
        penalties = jnp.where(live, 0.0, -jnp.inf).astype(jnp.float32)
    scores, bmax = packed_scores_with_bucket_max(
        q_signs.astype(jnp.bfloat16), c_packed_t,
        block_rows=block_rows, rows_per_bucket=rows_per_bucket,
        block_q=block_q, penalties=penalties,
        score_dtype=jnp.bfloat16 if n_bits <= 256 else jnp.float32,
        interpret=interpret,
    )
    assert k <= n // rows_per_bucket, (k, n, rows_per_bucket)
    vals, idx = _select_exact_from_scores(scores, bmax, k, rows_per_bucket)
    dist = jnp.where(
        idx < 0,
        jnp.iinfo(jnp.int32).max,
        ((n_bits - vals) * 0.5).astype(jnp.int32),
    )
    return dist, idx
