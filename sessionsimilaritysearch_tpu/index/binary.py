"""Binary hash-code index (Hamming search).

Replaces FAISS ``IndexBinaryFlat`` over packbits codes (reference:
fine_tune_ours.py:839-843 build, :871-879 timed search). Codes come from the
BinarizeHead's sign outputs. Two storage modes:

- 'packed': int32 words, XOR+popcount scan (memory-optimal);
- 'sign': +-1 bf16 rows, ranked by MXU matmul (compute-optimal; see
  ops/hamming.py for the dot<->Hamming identity).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from sessionsimilaritysearch_tpu.index.dense import _write_rows
from sessionsimilaritysearch_tpu.ops import hamming


class BinaryIndex:
    def __init__(self, n_bits: int, capacity: int, mode: str = "sign"):
        assert mode in ("packed", "sign")
        self.n_bits = n_bits
        self.capacity = capacity
        self.mode = mode
        self.size = 0
        if mode == "packed":
            self.words = -(-n_bits // 32)
            self._buf = jnp.zeros((capacity, self.words), dtype=jnp.int32)
        else:
            self._buf = -jnp.ones((capacity, n_bits), dtype=jnp.bfloat16)

    @property
    def ntotal(self) -> int:
        return self.size

    def add(self, signs) -> None:
        """Append [m, n_bits] sign codes (+-1 or {0,1} floats)."""
        signs = np.asarray(signs)
        assert signs.ndim == 2 and signs.shape[1] == self.n_bits
        m = signs.shape[0]
        if self.size + m > self.capacity:
            raise ValueError("binary index full")
        if self.mode == "packed":
            rows = jnp.asarray(hamming.pack_bits_np(signs))
        else:
            rows = jnp.where(jnp.asarray(signs) > 0, 1.0, -1.0).astype(jnp.bfloat16)
        # O(batch) in-place append (donated dynamic_update_slice), not an
        # O(capacity) functional copy -- same pattern as DenseIndex.add
        self._buf = _write_rows(
            self._buf, rows, jnp.asarray(self.size, jnp.int32)
        )
        self.size += m

    def search(self, q_signs, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (hamming distances ascending [q,k], indices [q,k])."""
        q_signs = np.asarray(q_signs)
        buf = self._buf[: self.size]
        if self.mode == "packed":
            q = jnp.asarray(hamming.pack_bits_np(q_signs))
            d, i = hamming.hamming_topk(q, buf, k)
        else:
            q = jnp.where(jnp.asarray(q_signs) > 0, 1.0, -1.0).astype(jnp.bfloat16)
            d, i = hamming.sign_topk(q, buf, k, n_bits=self.n_bits)
        return np.asarray(d), np.asarray(i)
