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
from sessionsimilaritysearch_tpu.data.graph import batch_graphs, sequence_to_graph
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
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.encode_fn = encode_fn
        self.batch_size = batch_size
        self.timer = PhaseTimer()
        self.sessions: List = []  # retained for metric reports
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
        norm = [
            d if isinstance(d, tuple) and len(d) == 2 else (d, [])
            for d in data
        ]
        out = []
        bs = self.batch_size
        for s in range(0, len(norm), bs):
            chunk = norm[s : s + bs]
            pad = bs - len(chunk)
            graphs = [
                sequence_to_graph(
                    i, seq, tar, self.tokenizer, self.cfg.dims,
                    ignore_query=self.cfg.ignore_query,
                )
                for i, (seq, tar) in enumerate(chunk)
            ]
            if pad:
                graphs.extend([graphs[-1]] * pad)
            emb = self.timer.timed(
                "encode", self.encode_fn, batch_graphs(graphs)
            )
            out.append(np.asarray(emb)[: len(chunk)])
        return np.concatenate(out, axis=0)

    def add_sessions(self, data: Sequence) -> None:
        """Encode + stream-insert sessions into the corpus."""
        emb = self.embed(data)
        m = emb.shape[0]
        keep = m
        if m % self._pad_to:
            # sharded inserts must stripe evenly; repeat the tail row and
            # remember only the real sessions for metric reports
            reps = self._pad_to - m % self._pad_to
            emb = np.concatenate([emb, np.repeat(emb[-1:], reps, axis=0)])
        with self.timer("insert"):
            self.index.add(emb)
        self.sessions.extend(
            d[0] if isinstance(d, tuple) and len(d) == 2 else d for d in data
        )
        if emb.shape[0] != keep:
            # padded duplicates also need session entries to keep global ids
            # aligned with corpus rows
            tail = self.sessions[-1]
            self.sessions.extend([tail] * (emb.shape[0] - keep))

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
    def report(self, test_data: Sequence, I) -> dict:
        """Ground-truth quality report for retrieved results."""
        return metrics_mod.full_report(
            np.zeros_like(np.asarray(I), dtype=np.float32),
            I,
            list(test_data),
            self.sessions,
        )

    def stats(self) -> dict:
        s = self.timer.summary()
        s["ntotal"] = self.index.ntotal
        return s
