"""Pallas kernel tests (interpret mode).

The CI/test environment is a CPU mesh and the tunneled single-TPU dev
environment does not lower Mosaic, so kernels are validated through the
Pallas interpreter against XLA references; on native TPU hosts the same
calls compile to Mosaic.
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
    c = jax.random.normal(k1, (4096, 256), dtype=jnp.bfloat16)
    q = jax.random.normal(k2, (256, 256), dtype=jnp.bfloat16)
    return q, c


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
                    q, c, bucket=32, block_q=128, block_c=1024
                )
            )
        s_ref = np.asarray(
            jnp.dot(q, c.T, preferred_element_type=jnp.float32)
        )
        bm_ref = np.max(s_ref.reshape(256, -1, 32), axis=-1)
        np.testing.assert_allclose(bm, bm_ref, atol=0.5, rtol=1e-2)

    def test_bucketed_topk_exact(self, data):
        q, c = data
        with pltpu.force_tpu_interpret_mode():
            v1, i1 = pallas_mips.pallas_bucketed_topk(q, c, 10, bucket=32)
        v2, i2 = chunked_topk(q, c, 10, chunk_size=4096, mode="sort")
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), atol=0.5, rtol=1e-2
        )

    def test_shape_constraints_enforced(self, data):
        q, c = data
        with pytest.raises(AssertionError):
            pallas_mips.scores_bucket_max(q, c, bucket=32, block_c=999)


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
                qc, cc, bucket=16, block_q=256, block_c=2048
            )
        x = np.bitwise_xor(
            np.asarray(qc).view(np.uint32)[:, None, :],
            np.asarray(cc).view(np.uint32)[None, :, :],
        )
        dist = np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)
        ref = dist.reshape(256, 4096 // 16, 16).min(-1)
        np.testing.assert_array_equal(np.asarray(bmin), ref)

    def test_pallas_hamming_topk_matches_oracle(self, codes):
        from sessionsimilaritysearch_tpu.ops.hamming import oracle_hamming_np

        q_signs, c_signs, qc, cc = codes
        with pltpu.force_tpu_interpret_mode():
            d, i = pallas_mips.pallas_hamming_topk(
                qc, cc, k=10, bucket=16, block_q=256, block_c=2048
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
