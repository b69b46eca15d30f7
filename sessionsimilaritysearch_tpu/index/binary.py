"""Binary hash-code index (Hamming search).

Replaces FAISS ``IndexBinaryFlat`` over packbits codes (reference:
fine_tune_ours.py:839-843 build, :871-879 timed search). Codes come from the
BinarizeHead's sign outputs. Two storage modes:

- 'packed': int32 words, XOR+popcount scan (memory-optimal). On TPU the
  scan runs as the fused Pallas bucket-min kernel
  (ops.pallas_mips.pallas_hamming_topk) -- measured 3x the sign-matmul
  path and 34x the XLA popcount scan at 1M x 250 bits on v5e -- with
  automatic fallback to the XLA scan where Mosaic is unavailable.
- 'sign': +-1 bf16 rows, ranked by MXU matmul (see ops/hamming.py for the
  dot<->Hamming identity).

Streaming contract (same as DenseIndex): the buffer is allocated at full
``capacity`` once and every search scans the whole buffer with a dynamic
``valid_count`` mask, so interleaved add/search NEVER recompiles -- scan
cost is proportional to capacity, which the caller sizes. (Earlier rounds
sliced ``buf[:size]``, retracing ~20-40 s per insert through the dev
tunnel.)
"""

from __future__ import annotations

import warnings
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from sessionsimilaritysearch_tpu.index.dense import (
    _move_rows,
    _padded_moves,
    _write_rows,
    compaction_plan,
)
from sessionsimilaritysearch_tpu.ops import hamming

# Pallas kernel grid units: buffers are padded so any power-of-two
# rows_per_bucket <= 128 divides them (group = 128 * rpb divides 16384).
_GROUP = 128 * 128
_BLOCK_Q = 256


class BinaryIndex:
    def __init__(
        self,
        n_bits: int,
        capacity: int,
        mode: str = "sign",
        use_pallas: Optional[bool] = None,
        interpret: bool = False,
        selection: str = "exact",
        recall_target: float = 0.95,
    ):
        """``use_pallas``: None = auto (packed mode on an accelerator),
        True/False = force. ``interpret`` runs the kernel in interpret mode
        (CPU tests). ``selection='approx'`` (sign mode only) uses
        ``lax.approx_max_k`` per chunk: 4.3x the exact sign scan on TPU
        (168k QPS at 1M x 250 bits, tie-aware value-recall@100 0.9985 at
        the default ``recall_target``; see ops.hamming.sign_topk)."""
        assert mode in ("packed", "sign")
        assert selection in ("exact", "approx")
        assert selection == "exact" or mode == "sign", (
            "approx selection is wired for the sign-matmul path"
        )
        self.n_bits = n_bits
        self.capacity = capacity
        self.mode = mode
        self.selection = selection
        self.recall_target = recall_target
        self.size = 0
        self.use_pallas = use_pallas
        self.interpret = interpret
        self._pallas_broken = False
        if mode == "packed":
            self.words = -(-n_bits // 32)
            # round the buffer up to the kernel grid unit; rows past
            # ``capacity`` are never valid (search masks at ``size``)
            cap_pad = -(-capacity // _GROUP) * _GROUP
            self._buf = jnp.zeros((cap_pad, self.words), dtype=jnp.int32)
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

    def remove_ids(self, ids) -> int:
        """Remove codes by row id (``faiss.IndexBinaryFlat.remove_ids``
        counterpart). Swap-with-last compaction: surviving row ids change
        exactly as in FAISS (see index.dense.compaction_plan); freed
        capacity is reusable; search never retraces. Returns the count."""
        src, dst, new_size = compaction_plan(self.size, ids)
        if src.size:
            # pad with the buffer's last physical row (packed mode rounds
            # the buffer up past `capacity`, never a real destination)
            s, d = _padded_moves(src, dst, self._buf.shape[0] - 1)
            self._buf = _move_rows(self._buf, s, d)
        removed = self.size - new_size
        self.size = new_size
        return removed

    def _pallas_wanted(self, k: int) -> bool:
        if self.mode != "packed" or self._pallas_broken:
            return False
        if self.use_pallas is not None:
            return self.use_pallas
        if self.interpret:
            return False
        import jax

        return jax.devices()[0].platform != "cpu"

    def _search_pallas(self, q, k: int) -> Tuple[np.ndarray, np.ndarray]:
        from sessionsimilaritysearch_tpu.ops.pallas_mips import (
            pallas_hamming_topk,
        )

        nq = q.shape[0]
        n_scan = self._buf.shape[0]  # full capacity: inserts never retrace
        # rows_per_bucket: largest power of two <= 128 leaving >= k buckets
        rpb = 128
        while rpb > 1 and n_scan // rpb < k:
            rpb //= 2
        if n_scan // rpb < k:
            raise ValueError(f"k={k} too large for {n_scan} rows")
        # group = 128*rpb must be divisible by block_c (% 128 == 0): shrink
        # the corpus block when a large k drives rpb below 8
        block_c = min(1024, 128 * rpb)
        q_pad = -(-nq // _BLOCK_Q) * _BLOCK_Q
        if q_pad != nq:
            q = jnp.pad(q, ((0, q_pad - nq), (0, 0)))
        d, i = pallas_hamming_topk(
            q, self._buf, k, rows_per_bucket=rpb,
            block_q=_BLOCK_Q, block_c=block_c,
            valid_count=jnp.asarray(self.size, jnp.int32),
            interpret=self.interpret,
        )
        return np.asarray(d[:nq]), np.asarray(i[:nq])

    def search(self, q_signs, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (hamming distances ascending [q,k], indices [q,k])."""
        q_signs = np.asarray(q_signs)
        vc = jnp.asarray(self.size, jnp.int32)
        if self.mode == "packed":
            q = jnp.asarray(hamming.pack_bits_np(q_signs))
            if self._pallas_wanted(k):
                try:
                    return self._search_pallas(q, k)
                except ValueError:
                    raise
                except Exception as e:  # Mosaic unavailable / lowering error
                    warnings.warn(
                        "Pallas Hamming kernel failed; this index falls "
                        f"back to the ~34x-slower XLA popcount scan: {e!r}",
                        RuntimeWarning,
                        stacklevel=2,
                    )
                    self._pallas_broken = True
            d, i = hamming.hamming_topk(q, self._buf, k, valid_count=vc)
        else:
            q = jnp.where(jnp.asarray(q_signs) > 0, 1.0, -1.0).astype(jnp.bfloat16)
            d, i = hamming.sign_topk(
                q, self._buf, k, n_bits=self.n_bits,
                mode=self.selection, recall_target=self.recall_target,
                valid_count=vc,
            )
        return np.asarray(d), np.asarray(i)

    # --- persistence (reference: faiss.write_index/read_index for the
    #     binary index are absent upstream -- fine_tune_ours.py rebuilds
    #     from embeddings every run; first-class here, incl. the serving
    #     configuration so a tuned engine restores tuned)
    def save(self, path: str) -> None:
        rows = self._buf[: self.size]
        if self.mode == "sign":
            # bf16 isn't a native npz dtype; +-1 rows round-trip via int8
            buf = np.asarray(rows.astype(jnp.int8))
        else:
            buf = np.asarray(rows)
        np.savez(
            path,
            buf=buf,
            n_bits=self.n_bits,
            capacity=self.capacity,
            mode=self.mode,
            selection=self.selection,
            recall_target=self.recall_target,
            size=self.size,
        )

    @classmethod
    def load(cls, path: str, capacity: Optional[int] = None, **kw) -> "BinaryIndex":
        z = np.load(path if path.endswith(".npz") else path + ".npz")
        idx = cls(
            n_bits=int(z["n_bits"]),
            capacity=capacity or int(z["capacity"]),
            mode=str(z["mode"]),
            selection=str(z["selection"]),
            recall_target=float(z["recall_target"]),
            **kw,
        )
        size = int(z["size"])
        if size:
            rows = jnp.asarray(z["buf"])
            if idx.mode == "sign":
                rows = rows.astype(jnp.bfloat16)  # int8 +-1 -> bf16 rows
            idx._buf = _write_rows(idx._buf, rows, jnp.asarray(0, jnp.int32))
            idx.size = size
        return idx
