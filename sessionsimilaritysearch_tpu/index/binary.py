"""Binary hash-code index (Hamming search).

Replaces FAISS ``IndexBinaryFlat`` over packbits codes (reference:
fine_tune_ours.py:839-843 build, :871-879 timed search). Codes come from the
BinarizeHead's sign outputs. Two storage modes:

- 'packed': int32 words, XOR+popcount scan -- the CAPACITY tier: 1 bit/bit
  of HBM (32 MB per 1M x 250-bit rows, 1/16th of 'sign'). On TPU the scan
  runs as the fused Pallas bucket-min kernel
  (ops.pallas_mips.pallas_hamming_topk), measured 175 ms / 5.8k QPS at
  1M x 250 bits on v5e -- ~8x the XLA popcount scan but 7x SLOWER than
  the sign matmul (the VPU XOR+popcount stream cannot compete with the
  MXU; an earlier 39.6 ms reading predates the materialize-when-timing
  protocol and was a tunnel artifact -- docs/RESULTS.md r3 correction).
  Automatic fallback to the XLA scan where Mosaic is unavailable.
- 'sign': +-1 bf16 rows, ranked by MXU matmul (see ops/hamming.py for the
  dot<->Hamming identity) -- the SPEED tier and the default: 41k QPS
  exact / 167k approx at the same shape.

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
        """Append [m, n_bits] sign codes (+-1 or {0,1} floats). Device
        arrays pack on device (no host round-trip)."""
        on_device = isinstance(signs, jnp.ndarray)
        if not on_device:
            signs = np.asarray(signs)
        assert signs.ndim == 2 and signs.shape[1] == self.n_bits
        m = signs.shape[0]
        if self.size + m > self.capacity:
            raise ValueError("binary index full")
        if self.mode == "packed":
            rows = (
                hamming.pack_bits(signs)
                if on_device
                else jnp.asarray(hamming.pack_bits_np(signs))
            )
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

    def _search_pallas(self, q, k: int,
                       row_mask=None) -> Tuple[np.ndarray, np.ndarray]:
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
            row_mask=row_mask,
            interpret=self.interpret,
        )
        return d[:nq], i[:nq]

    def _prep_mask(self, row_mask):
        """Validate a positional row mask and pad it to the scan buffer's
        physical row count (packed mode rounds the buffer up past
        ``capacity``; padded rows are already dead via valid_count)."""
        if row_mask is None:
            return None
        row_mask = np.asarray(row_mask, bool)
        assert row_mask.shape[0] in (self.size, self.capacity), (
            f"row_mask length {row_mask.shape[0]} matches neither "
            f"size {self.size} nor capacity {self.capacity}"
        )
        n_buf = self._buf.shape[0]
        if row_mask.shape[0] < n_buf:
            row_mask = np.pad(row_mask, (0, n_buf - row_mask.shape[0]))
        return jnp.asarray(row_mask)

    def search(self, q_signs, k: int,
               row_mask=None) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (hamming distances ascending [q,k], indices [q,k]).

        ``row_mask``: optional bool array over the current rows (length
        ``size`` or ``capacity``) — filtered search (FAISS IDSelector
        counterpart): False rows never rank. Dynamic operand on every
        path (Pallas penalty stream / XLA scans) — fresh masks never
        retrace. NOTE after :meth:`remove_ids` row ids renumber — rebuild
        positional masks after removal.

        ``q_signs`` may be a device array (sign codes computed on the
        accelerator by an upstream projection, e.g. two-stage serving):
        packing then runs on device (``hamming.pack_bits``) with no host
        round-trip."""
        d, i = self.search_device(q_signs, k, row_mask=row_mask)
        return np.asarray(d), np.asarray(i)

    def search_device(self, q_signs, k: int, row_mask=None):
        """:meth:`search` that returns DEVICE arrays — the fused form for
        pipelines whose next stage is another device computation (e.g.
        two-stage serving's exact re-rank): no host sync between the code
        scan and the consumer."""
        on_device = isinstance(q_signs, jnp.ndarray)
        if not on_device:
            q_signs = np.asarray(q_signs)
        vc = jnp.asarray(self.size, jnp.int32)
        mask = self._prep_mask(row_mask)
        if self.mode == "packed":
            q = (
                hamming.pack_bits(q_signs)
                if on_device
                else jnp.asarray(hamming.pack_bits_np(q_signs))
            )
            if self._pallas_wanted(k):
                try:
                    return self._search_pallas(q, k, row_mask=mask)
                except ValueError:
                    raise
                except Exception as e:  # Mosaic unavailable / lowering error
                    warnings.warn(
                        "Pallas Hamming kernel failed; this index falls "
                        f"back to the ~8x-slower XLA popcount scan: {e!r}",
                        RuntimeWarning,
                        stacklevel=2,
                    )
                    self._pallas_broken = True
            d, i = hamming.hamming_topk(
                q, self._buf, k, valid_count=vc, row_mask=mask
            )
        else:
            q = jnp.where(jnp.asarray(q_signs) > 0, 1.0, -1.0).astype(jnp.bfloat16)
            d, i = hamming.sign_topk(
                q, self._buf, k, n_bits=self.n_bits,
                mode=self.selection, recall_target=self.recall_target,
                valid_count=vc, row_mask=mask,
            )
        return d, i

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
