"""Pallas kernel tests (interpret mode).

The CI/test environment is a CPU mesh, so kernels are validated through the
Pallas interpreter against XLA references; the same calls Mosaic-compile on
TPU (validated on v5e this round -- see docs/RESULTS.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from sessionsimilaritysearch_tpu.ops import pallas_mips
from sessionsimilaritysearch_tpu.ops.topk import chunked_topk


@pytest.fixture(scope="module")
def data():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    c = jax.random.normal(k1, (8192, 256), dtype=jnp.bfloat16)
    q = jax.random.normal(k2, (256, 256), dtype=jnp.bfloat16)
    return q, c


def _strided_bucket_ref(s_ref: np.ndarray, rows_per_bucket: int, op):
    """Reference strided-bucket reduce: bucket (g, b) of groups of
    128*rows_per_bucket columns holds columns g*group + s*128 + b."""
    q, n = s_ref.shape
    group = 128 * rows_per_bucket
    v = s_ref.reshape(q, n // group, rows_per_bucket, 128)
    return op(v, axis=2).reshape(q, -1)


class TestPallasMips:
    def test_scores_matmul_matches_xla(self, data):
        q, c = data
        with pltpu.force_tpu_interpret_mode():
            s_pl = np.asarray(
                pallas_mips.scores_matmul(q, c, block_q=128, block_c=1024)
            )
        s_ref = np.asarray(
            jnp.dot(q, c.T, preferred_element_type=jnp.float32)
        )
        np.testing.assert_allclose(s_pl, s_ref, atol=0.5, rtol=1e-2)

    def test_bucket_max_matches_reference(self, data):
        q, c = data
        with pltpu.force_tpu_interpret_mode():
            bm = np.asarray(
                pallas_mips.scores_bucket_max(
                    q, c, rows_per_bucket=32, block_q=128, block_c=1024
                )
            )
        s_ref = np.asarray(
            jnp.dot(q, c.T, preferred_element_type=jnp.float32)
        )
        bm_ref = _strided_bucket_ref(s_ref, 32, np.max)
        np.testing.assert_allclose(bm, bm_ref, atol=0.5, rtol=1e-2)

    def test_scores_with_bucket_max(self, data):
        q, c = data
        with pltpu.force_tpu_interpret_mode():
            s_pl, bm = pallas_mips.scores_with_bucket_max(
                q, c, rows_per_bucket=32, block_q=128, block_c=1024,
                score_dtype=jnp.float32,
            )
        s_pl, bm = np.asarray(s_pl), np.asarray(bm)
        s_ref = np.asarray(
            jnp.dot(q, c.T, preferred_element_type=jnp.float32)
        )
        np.testing.assert_allclose(s_pl, s_ref, atol=0.5, rtol=1e-2)
        np.testing.assert_allclose(
            bm, _strided_bucket_ref(s_pl, 32, np.max), atol=1e-6
        )

    def test_scores_with_bucket_max_valid_count(self, data):
        q, c = data
        vc = 5000
        with pltpu.force_tpu_interpret_mode():
            s_pl, bm = pallas_mips.scores_with_bucket_max(
                q, c, rows_per_bucket=32, block_q=128, block_c=1024,
                valid_count=jnp.asarray(vc), score_dtype=jnp.float32,
            )
        s_pl = np.asarray(s_pl)
        assert np.isneginf(s_pl[:, vc:]).all()
        assert np.isfinite(s_pl[:, :vc]).all()
        np.testing.assert_allclose(
            np.asarray(bm), _strided_bucket_ref(s_pl, 32, np.max)
        )

    def test_bucketed_topk_exact(self, data):
        q, c = data
        with pltpu.force_tpu_interpret_mode():
            v1, i1 = pallas_mips.pallas_bucketed_topk(
                q, c, 10, rows_per_bucket=32
            )
        v2, i2 = chunked_topk(q, c, 10, chunk_size=8192, mode="sort")
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), atol=0.5, rtol=1e-2
        )

    def test_exact_topk_matches_chunked(self, data):
        q, c = data
        with pltpu.force_tpu_interpret_mode():
            v1, i1 = pallas_mips.pallas_exact_topk(
                q, c, 10, rows_per_bucket=32, score_dtype=jnp.float32
            )
        v2, i2 = chunked_topk(q, c, 10, chunk_size=8192, mode="sort")
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), atol=1e-3, rtol=1e-5
        )
        # returned global ids really carry their reported scores
        s_ref = np.asarray(
            jnp.dot(q, c.T, preferred_element_type=jnp.float32)
        )
        got = np.take_along_axis(s_ref, np.asarray(i1), axis=1)
        np.testing.assert_allclose(got, np.asarray(v1), atol=1e-3)

    def test_exact_topk_valid_count_and_missing_slots(self, data):
        q, c = data
        with pltpu.force_tpu_interpret_mode():
            v, i = pallas_mips.pallas_exact_topk(
                q, c, 10, rows_per_bucket=32,
                valid_count=jnp.asarray(7), score_dtype=jnp.float32,
            )
        v, i = np.asarray(v), np.asarray(i)
        assert (i[:, 7:] == -1).all()
        assert np.isneginf(v[:, 7:]).all()
        assert (i[:, :7] < 7).all() and (i[:, :7] >= 0).all()

    def test_shape_constraints_enforced(self, data):
        q, c = data
        with pytest.raises(AssertionError):
            pallas_mips.scores_bucket_max(
                q, c, rows_per_bucket=32, block_c=999
            )


class TestPallasHamming:
    @pytest.fixture(scope="class")
    def codes(self):
        rng = np.random.default_rng(3)
        c_signs = np.sign(rng.standard_normal((4096, 250))).astype(np.float32)
        q_signs = np.sign(rng.standard_normal((256, 250))).astype(np.float32)
        from sessionsimilaritysearch_tpu.ops.hamming import pack_bits_np

        return (q_signs, c_signs,
                jnp.asarray(pack_bits_np(q_signs)),
                jnp.asarray(pack_bits_np(c_signs)))

    def test_bucket_min_matches_xla(self, codes):
        _, _, qc, cc = codes
        with pltpu.force_tpu_interpret_mode():
            bmin = pallas_mips.hamming_bucket_min(
                qc, cc, rows_per_bucket=16, block_q=256, block_c=2048
            )
        x = np.bitwise_xor(
            np.asarray(qc).view(np.uint32)[:, None, :],
            np.asarray(cc).view(np.uint32)[None, :, :],
        )
        dist = np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)
        ref = _strided_bucket_ref(dist, 16, np.min)
        np.testing.assert_array_equal(np.asarray(bmin), ref)

    def test_pallas_hamming_topk_matches_oracle(self, codes):
        from sessionsimilaritysearch_tpu.ops.hamming import oracle_hamming_np

        q_signs, c_signs, qc, cc = codes
        with pltpu.force_tpu_interpret_mode():
            d, i = pallas_mips.pallas_hamming_topk(
                qc, cc, k=10, rows_per_bucket=16, block_q=256, block_c=2048
            )
        d, i = np.asarray(d), np.asarray(i)
        ov, _ = oracle_hamming_np(q_signs, c_signs, 10)
        # distances match the oracle's exactly; tie rows may swap, so also
        # check every returned index really has its reported distance
        np.testing.assert_array_equal(np.sort(d, axis=1), np.sort(ov, axis=1))
        qb = (q_signs > 0).astype(np.int32)
        cb = (c_signs > 0).astype(np.int32)
        true = (qb[:, None, :] != cb[i]).sum(-1)
        np.testing.assert_array_equal(true, d)

    def test_pallas_hamming_topk_valid_count(self, codes):
        """Rows >= valid_count never appear: a selected bucket straddling
        the valid boundary must not leak its padded members (the strided
        layout spreads the tail across every bucket of the last group)."""
        from sessionsimilaritysearch_tpu.ops.hamming import oracle_hamming_np

        q_signs, c_signs, qc, cc = codes
        valid = 3000  # mid-group cut: 4096-row corpus, groups of 2048
        with pltpu.force_tpu_interpret_mode():
            d, i = pallas_mips.pallas_hamming_topk(
                qc, cc, k=10, rows_per_bucket=16, block_q=256,
                block_c=2048, valid_count=jnp.asarray(valid, jnp.int32),
            )
        d, i = np.asarray(d), np.asarray(i)
        assert i.max() < valid
        ov, _ = oracle_hamming_np(q_signs, c_signs[:valid], 10)
        np.testing.assert_array_equal(np.sort(d, axis=1), np.sort(ov, axis=1))

    def test_binary_index_pallas_path(self, codes):
        """BinaryIndex(packed, use_pallas=True, interpret=True): odd sizes,
        padded queries, streaming inserts -- identical result set to the
        XLA scan."""
        from sessionsimilaritysearch_tpu.index.binary import BinaryIndex

        q_signs, c_signs, _, _ = codes
        pall = BinaryIndex(n_bits=250, capacity=4096, mode="packed",
                           use_pallas=True, interpret=True)
        xla = BinaryIndex(n_bits=250, capacity=4096, mode="packed",
                          use_pallas=False)
        pall.add(c_signs[:1000])  # not a multiple of any kernel unit
        xla.add(c_signs[:1000])
        dp, ip = pall.search(q_signs[:13], k=7)  # q needs padding to 256
        dx, ix = xla.search(q_signs[:13], k=7)
        np.testing.assert_array_equal(np.sort(dp, 1), np.sort(dx, 1))
        assert ip.max() < 1000
        # stream more rows in; the scan prefix must grow with size
        pall.add(c_signs[1000:3000])
        xla.add(c_signs[1000:3000])
        dp, ip = pall.search(q_signs[:13], k=7)
        dx, ix = xla.search(q_signs[:13], k=7)
        np.testing.assert_array_equal(np.sort(dp, 1), np.sort(dx, 1))

    def test_pallas_hamming_topk_multi_group_tail(self, codes):
        """ADVICE r2 (medium): with small rows_per_bucket the invalid tail
        can span MANY 128*rpb groups; the old flat k+128 bucket widening
        silently dropped true neighbors. The penalty-word kernel keeps the
        result exact: here the tail is 3596 rows (> one 2048-row group) and
        every tail row is a COPY of the queries (distance-0 contamination in
        almost every bucket)."""
        from sessionsimilaritysearch_tpu.ops.hamming import (
            oracle_hamming_np, pack_bits_np,
        )

        q_signs, c_signs, qc, _ = codes
        valid = 500
        hostile = np.concatenate(
            [c_signs[:valid]]
            + [q_signs for _ in range(15)]  # 500 + 15*256 = 4340 -> trim
        )[:4096]
        cc = jnp.asarray(pack_bits_np(hostile))
        with pltpu.force_tpu_interpret_mode():
            d, i = pallas_mips.pallas_hamming_topk(
                qc, cc, k=10, rows_per_bucket=16, block_q=256,
                block_c=2048, valid_count=jnp.asarray(valid, jnp.int32),
            )
        d, i = np.asarray(d), np.asarray(i)
        assert i.max() < valid
        ov, _ = oracle_hamming_np(q_signs, hostile[:valid], 10)
        np.testing.assert_array_equal(np.sort(d, axis=1), np.sort(ov, axis=1))

    def test_small_rows_per_bucket_block_c(self, codes):
        """k beyond the transposed kernel's bucket budget (rows_per_bucket
        is floored at block_rows/128 by the pack layout) must route to the
        XLA fallback WITHOUT tripping any kernel assert or permanently
        pinning the index off the Pallas path (ADVICE r2 lineage)."""
        from sessionsimilaritysearch_tpu.index.binary import BinaryIndex

        q_signs, c_signs, _, _ = codes
        idx = BinaryIndex(n_bits=250, capacity=4096, mode="packed",
                          use_pallas=True, interpret=True)
        idx.add(c_signs[:3000])
        # capacity pads to 16384 rows; k=200 needs rpb <= 16384/200 -> rpb=64
        # still fine; force tiny rpb via a much larger k
        d, i = idx.search(q_signs[:8], k=3000)
        assert not idx._pallas_broken
        assert i.shape == (8, 3000)
        valid_hits = i[d < np.iinfo(np.int32).max]
        assert valid_hits.max() < 3000


class TestPallasInt8:
    """Fused int8 x int8 scan (VERDICT r2 item 6: re-sweep the fused kernel
    over the int8 matmul). Interpret mode; semantics vs the XLA int8x8
    path."""

    @pytest.fixture(scope="class")
    def qdata(self):
        from sessionsimilaritysearch_tpu.index.dense import (
            _quantize_rows_int8,
        )

        k1, k2 = jax.random.split(jax.random.PRNGKey(5))
        c = jax.random.normal(k1, (8192, 256))
        q = jax.random.normal(k2, (256, 256))
        cq, cs = _quantize_rows_int8(c)
        qq, qs = _quantize_rows_int8(q)
        return qq, qs, cq, cs

    def test_scores_match_xla_dequant(self, qdata):
        qq, qs, cq, cs = qdata
        with pltpu.force_tpu_interpret_mode():
            s, bm = pallas_mips.scores_with_bucket_max_int8(
                qq, cq, cs, rows_per_bucket=32, block_q=128, block_c=1024,
                score_dtype=jnp.float32,
            )
        ref = np.asarray(
            jnp.dot(qq.astype(jnp.int32), cq.astype(jnp.int32).T)
        ).astype(np.float32) * np.asarray(cs)[None, :]
        np.testing.assert_allclose(np.asarray(s), ref, rtol=1e-5)
        # bucket maxes consistent with the stored scores
        bm_ref = _strided_bucket_ref(np.asarray(s), 32, np.max)
        np.testing.assert_allclose(np.asarray(bm), bm_ref, rtol=1e-6)

    def test_exact_topk_int8_matches_chunked(self, qdata):
        from sessionsimilaritysearch_tpu.ops.topk import chunked_topk

        qq, qs, cq, cs = qdata
        with pltpu.force_tpu_interpret_mode():
            v1, i1 = pallas_mips.pallas_exact_topk_int8(
                qq, cq, 10, qs, cs, rows_per_bucket=32,
                block_q=128, block_c=1024, score_dtype=jnp.float32,
            )
        v2, i2 = chunked_topk(
            qq, cq, 10, chunk_size=8192, metric="ip", mode="sort",
            corpus_scales=cs, query_scales=qs,
        )
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), rtol=1e-4, atol=1e-5
        )
        agree = (np.asarray(i1) == np.asarray(i2)).mean()
        assert agree > 0.95  # ties may swap

    def test_valid_count_masks(self, qdata):
        qq, qs, cq, cs = qdata
        with pltpu.force_tpu_interpret_mode():
            v, i = pallas_mips.pallas_exact_topk_int8(
                qq, cq, 10, qs, cs, rows_per_bucket=32,
                block_q=128, block_c=1024,
                valid_count=jnp.asarray(5000, jnp.int32),
                score_dtype=jnp.float32,
            )
        assert np.asarray(i).max() < 5000
