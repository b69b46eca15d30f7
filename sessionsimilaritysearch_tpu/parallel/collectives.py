"""Cross-shard retrieval collectives.

The scaling axis of this system is CORPUS SIZE (SURVEY.md §5): the embedding
corpus shards row-wise over the mesh's ``data`` axis, each chip scans its
shard with the blocked MIPS kernel, and the per-shard top-k candidates (a
[q, k] sliver each) are all-gathered over ICI and re-ranked -- the
"per-shard top-k + all-gather merge" plan of SURVEY.md §2.11. The heavy
traffic (the corpus scan) never crosses chips; only O(q * k * ndev) floats
do.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    mesh: Mesh,
    axis: str = "data",
    shard_ids: Optional[jnp.ndarray] = None,
    valid_per_shard: Optional[jnp.ndarray] = None,
    chunk_size: int = 262144,
    mode: str = "exact",
    bucket: int = 128,
    corpus_scales: Optional[jnp.ndarray] = None,
    query_scales: Optional[jnp.ndarray] = None,
    score_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over a row-sharded corpus.

    Args:
      queries: [q, d], replicated.
      corpus: [n, d] with rows sharded over ``axis`` (n divisible by the
        axis size).
      shard_ids: optional [n] int32 of global ids per row (same sharding);
        defaults to the row's global position.
      valid_per_shard: optional scalar count of valid rows per shard (ring
        buffers); defaults to the full shard.
      corpus_scales: optional [n] per-row int8 dequantization scales (same
        sharding as the corpus rows); see ``ops.topk.chunked_topk``.
      query_scales: optional [q] per-query int8 scales, replicated (the
        int8 x int8 MXU mode; requires corpus_scales).

    Returns replicated (values [q, k], ids [q, k]).
    """
    from sessionsimilaritysearch_tpu.ops.topk import chunked_topk, merge_topk

    ndev = mesh.shape[axis]
    n = corpus.shape[0]
    assert n % ndev == 0, f"corpus rows {n} not divisible by mesh axis {ndev}"
    shard_rows = n // ndev
    has_cs = corpus_scales is not None
    has_qs = query_scales is not None

    def local_search(q, c_local, ids_local, valid, *extra):
        it = iter(extra)
        cs = next(it) if has_cs else None
        qs = next(it) if has_qs else None
        vals, idx = chunked_topk(
            q, c_local, k,
            chunk_size=min(chunk_size, shard_rows),
            valid_count=valid[0],
            mode=mode, bucket=bucket,
            corpus_scales=cs, query_scales=qs,
            score_dtype=score_dtype,
        )
        safe = jnp.clip(idx, 0, shard_rows - 1)
        gids = jnp.where(idx >= 0, ids_local[safe], -1)
        # [ndev, q, k] -> [q, ndev * k] -> final exact top-k
        av = jax.lax.all_gather(vals, axis)
        ai = jax.lax.all_gather(gids, axis)
        av = jnp.moveaxis(av, 0, 1).reshape(q.shape[0], -1)
        ai = jnp.moveaxis(ai, 0, 1).reshape(q.shape[0], -1)
        top_vals, top_pos = jax.lax.top_k(av, k)
        top_ids = jnp.take_along_axis(ai, top_pos, axis=-1)
        return top_vals, top_ids

    if shard_ids is None:
        shard_ids = jnp.arange(n, dtype=jnp.int32)
    if valid_per_shard is None:
        valid_per_shard = jnp.full((ndev,), shard_rows, dtype=jnp.int32)

    extra_args, extra_specs = [], []
    if has_cs:
        extra_args.append(corpus_scales)
        extra_specs.append(P(axis))
    if has_qs:
        extra_args.append(query_scales)
        extra_specs.append(P())

    fn = jax.shard_map(
        local_search,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis), P(axis), *extra_specs),
        out_specs=(P(), P()),
        # the scan carry inside chunked_topk starts replicated and becomes
        # shard-varying after the first chunk; skip the static VMA check
        check_vma=False,
    )
    return fn(queries, corpus, shard_ids, valid_per_shard, *extra_args)


def shard_corpus(corpus, mesh: Mesh, axis: str = "data"):
    """Place a [n, d] corpus row-sharded over the mesh."""
    return jax.device_put(corpus, NamedSharding(mesh, P(axis, None)))
