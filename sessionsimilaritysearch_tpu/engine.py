"""SessionSearchEngine: the serving facade.

Ties the whole pipeline into one object — the role played in the reference
by the ad-hoc script bodies of fine_tune_ours.test() (:748-897) and
test_amazon_filterd.main2() (:452-692): encode sessions with a trained
encoder, keep the embedding corpus as a (optionally mesh-sharded) flat
index, stream-insert new sessions, answer top-k queries, and report
latency/QPS counters.
"""

from __future__ import annotations

import time
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import numpy as np

from sessionsimilaritysearch_tpu.config import Config
from sessionsimilaritysearch_tpu.evalharness import metrics as metrics_mod
from sessionsimilaritysearch_tpu.index.dense import DenseIndex
from sessionsimilaritysearch_tpu.utils.profiling import PhaseTimer


class SessionSearchEngine:
    """Encode-then-exact-search session similarity serving.

    Args:
      cfg: config (graph dims, ignore_query, retrieval defaults).
      tokenizer: host tokenizer.
      encode_fn: jitted ``batch_graphs -> [B, d]`` embedding function of the
        trained encoder.
      dim: embedding dimension.
      capacity: max corpus size.
      mesh: optional ``jax.sharding.Mesh`` -- shards the corpus row-wise and
        searches with the cross-shard collective.
      batch_size: encoder batch (static shape; short batches pad).
    """

    def __init__(
        self,
        cfg: Config,
        tokenizer,
        encode_fn: Callable,
        dim: int,
        capacity: int,
        metric: str = "cos",
        mesh=None,
        batch_size: int = 256,
        mode: str = "exact",
    ):
        from sessionsimilaritysearch_tpu.evalharness.harness import (
            EmbeddingPipeline,
        )

        self.cfg = cfg
        self.tokenizer = tokenizer
        self.encode_fn = encode_fn
        self.batch_size = batch_size
        self.timer = PhaseTimer()
        self.sessions: List = []  # retained for metric reports
        self._pipe = EmbeddingPipeline(cfg, tokenizer, encode_fn, batch_size)
        # sessions waiting until a full stripe is available (sharded mode)
        self._pending: List = []
        if mesh is not None:
            from sessionsimilaritysearch_tpu.index.sharded import (
                ShardedDenseIndex,
            )

            ndev = mesh.shape["data"]
            capacity = -(-capacity // ndev) * ndev
            self.index = ShardedDenseIndex(
                dim=dim, capacity=capacity, mesh=mesh, metric=metric,
                mode=mode,
            )
            self._pad_to = ndev
        else:
            self.index = DenseIndex(
                dim=dim, capacity=capacity, metric=metric
            )
            self._pad_to = 1

    # ------------------------------------------------------------------
    def embed(self, data: Sequence) -> np.ndarray:
        """Embed raw sessions / (prefix, future) pairs."""
        t0 = time.perf_counter()
        out = self._pipe(data)
        self.timer.totals["encode"] += time.perf_counter() - t0
        self.timer.counts["encode"] += 1
        return out

    def add_sessions(self, data: Sequence) -> None:
        """Encode + stream-insert sessions into the corpus.

        In sharded mode inserts stripe across shards, so only whole
        multiples of the shard count go in immediately; the remainder is
        buffered until the next add (``pending`` in :meth:`stats`). No
        duplicate rows are ever inserted -- duplicates would occupy top-k
        slots and double-count in reports.
        """
        self._pending.extend(data)
        m = (len(self._pending) // self._pad_to) * self._pad_to
        if m == 0:
            return
        batch, self._pending = self._pending[:m], self._pending[m:]
        emb = self.embed(batch)
        with self.timer("insert"):
            self.index.add(emb)
            jax.block_until_ready(self.index._buf)  # time the device work
        self.sessions.extend(
            d[0] if isinstance(d, tuple) and len(d) == 2 else d
            for d in batch
        )

    # ------------------------------------------------------------------
    def search(self, data: Sequence, k: Optional[int] = None):
        """Full query path: sessions -> embed -> exact top-k.
        Returns (D, I)."""
        k = k or self.cfg.retrieval_k
        emb = self.embed(data)
        t0 = time.perf_counter()
        D, I = self.index.search(emb, k)
        self.timer.totals["search"] += time.perf_counter() - t0
        self.timer.counts["search"] += 1
        return D, I

    def search_embeddings(self, emb, k: Optional[int] = None):
        k = k or self.cfg.retrieval_k
        return self.index.search(np.asarray(emb), k)

    # ------------------------------------------------------------------
    def report(self, test_data: Sequence, I, D=None) -> dict:
        """Ground-truth quality report for retrieved results. Pass the
        cosine D matrix to include the |score - jaccard| diagnostic."""
        return metrics_mod.full_report(D, I, list(test_data), self.sessions)

    def stats(self) -> dict:
        s = self.timer.summary()
        s["ntotal"] = self.index.ntotal
        s["pending"] = len(self._pending)
        return s
