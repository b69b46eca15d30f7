"""SessionSearchEngine serving-facade tests (single-device and sharded)."""

import jax
import numpy as np
import pytest

from sessionsimilaritysearch_tpu.config import tiny_test_config
from sessionsimilaritysearch_tpu.engine import SessionSearchEngine
from sessionsimilaritysearch_tpu.models import build_text_session_encoder
from sessionsimilaritysearch_tpu.parallel import create_mesh


@pytest.fixture(scope="module")
def engine_parts(gen, tokenizer):
    cfg = tiny_test_config()
    enc = build_text_session_encoder(cfg)
    from sessionsimilaritysearch_tpu.data.graph import (
        batch_graphs,
        sequence_to_graph,
    )

    sample = batch_graphs([
        sequence_to_graph(0, *gen.datum(), tokenizer, cfg.dims)
    ] * 8)
    params = enc.init(jax.random.PRNGKey(0), sample)
    encode_fn = jax.jit(lambda g: enc.apply(params, g))
    return cfg, encode_fn


class TestEngine:
    def test_add_then_search(self, engine_parts, gen, tokenizer):
        cfg, encode_fn = engine_parts
        eng = SessionSearchEngine(
            cfg, tokenizer, encode_fn, dim=cfg.n_out, capacity=128,
            batch_size=8,
        )
        data = gen.dataset(20)
        eng.add_sessions(data)
        assert eng.index.ntotal == 20
        D, I = eng.search(data[:5], k=3)
        np.testing.assert_array_equal(I[:, 0], np.arange(5))  # self top-1
        rep = eng.report(data[:5], I)
        assert "ave_all_jaccard" in rep
        stats = eng.stats()
        assert stats["ntotal"] == 20 and "encode" in stats

    def test_streaming_insert_mid_serving(self, engine_parts, gen, tokenizer):
        cfg, encode_fn = engine_parts
        eng = SessionSearchEngine(
            cfg, tokenizer, encode_fn, dim=cfg.n_out, capacity=128,
            batch_size=8,
        )
        a, b = gen.dataset(10), gen.dataset(6)
        eng.add_sessions(a)
        _, I1 = eng.search(a[:2], k=2)
        eng.add_sessions(b)
        _, I2 = eng.search(b[:2], k=1)
        np.testing.assert_array_equal(I2[:, 0], [10, 11])  # global ids

    def test_sharded_engine(self, engine_parts, gen, tokenizer):
        cfg, encode_fn = engine_parts
        mesh = create_mesh()
        eng = SessionSearchEngine(
            cfg, tokenizer, encode_fn, dim=cfg.n_out, capacity=128,
            mesh=mesh, batch_size=8,
        )
        data = gen.dataset(20)  # 20 % 8 != 0 -> remainder stays pending
        eng.add_sessions(data)
        assert eng.index.ntotal == 16  # whole stripes only, no duplicates
        assert eng.stats()["pending"] == 4
        D, I = eng.search(data[:5], k=3)
        np.testing.assert_array_equal(I[:, 0], np.arange(5))
        # the pending tail flushes with the next add
        eng.add_sessions(gen.dataset(4))
        assert eng.index.ntotal == 24
        assert eng.stats()["pending"] == 0
        # a late row is findable under its global insertion id
        D2, I2 = eng.search([data[16][0]], k=1)
        assert I2[0, 0] == 16
