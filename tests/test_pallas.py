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
