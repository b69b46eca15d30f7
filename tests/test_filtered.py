"""Filtered search (``row_mask`` / engine ``where=``): restrict ranking to
a predicate-selected subset of the corpus — the FAISS ``IDSelector``
counterpart (the reference's evaluation itself slices by session kind,
e.g. purchase sessions, test_amazon_filterd.py metric family)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sessionsimilaritysearch_tpu.index import DenseIndex, build_index
from sessionsimilaritysearch_tpu.ops.topk import (
    chunked_topk,
    l2_normalize,
    oracle_topk_np,
)


class TestChunkedTopkRowMask:
    def test_matches_oracle_on_masked_subset(self, rng):
        corpus = rng.standard_normal((512, 32)).astype(np.float32)
        queries = rng.standard_normal((9, 32)).astype(np.float32)
        mask = rng.random(512) < 0.3
        vals, idx = chunked_topk(
            jnp.asarray(queries), jnp.asarray(corpus), 7, chunk_size=128,
            row_mask=jnp.asarray(mask),
        )
        keep = np.flatnonzero(mask)
        ovals, oidx = oracle_topk_np(queries, corpus[keep], 7)
        np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx), keep[oidx])

    def test_composes_with_valid_count(self, rng):
        corpus = rng.standard_normal((256, 16)).astype(np.float32)
        queries = rng.standard_normal((5, 16)).astype(np.float32)
        mask = np.ones(256, bool)
        mask[::2] = False
        vals, idx = chunked_topk(
            jnp.asarray(queries), jnp.asarray(corpus), 5, chunk_size=64,
            valid_count=jnp.asarray(100, jnp.int32),
            row_mask=jnp.asarray(mask),
        )
        keep = np.flatnonzero(mask[:100])
        ovals, oidx = oracle_topk_np(queries, corpus[keep], 5)
        np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx), keep[oidx])

    def test_empty_mask_yields_missing_slots(self, rng):
        corpus = rng.standard_normal((64, 8)).astype(np.float32)
        queries = rng.standard_normal((3, 8)).astype(np.float32)
        vals, idx = chunked_topk(
            jnp.asarray(queries), jnp.asarray(corpus), 4, chunk_size=64,
            row_mask=jnp.zeros(64, bool),
        )
        assert np.all(np.asarray(idx) == -1)
        assert np.all(np.isneginf(np.asarray(vals)))

    def test_approx_mode_respects_mask(self, rng):
        corpus = rng.standard_normal((512, 16)).astype(np.float32)
        queries = rng.standard_normal((4, 16)).astype(np.float32)
        mask = rng.random(512) < 0.2
        _, idx = chunked_topk(
            jnp.asarray(queries), jnp.asarray(corpus), 5, chunk_size=128,
            mode="approx", row_mask=jnp.asarray(mask),
        )
        idx = np.asarray(idx)
        assert np.all(mask[idx[idx >= 0]])


class TestDenseIndexRowMask:
    def test_masked_search(self, rng):
        emb = rng.standard_normal((200, 24)).astype(np.float32)
        idx = build_index(emb, metric="cos")
        mask = rng.random(200) < 0.4
        q = rng.standard_normal((6, 24)).astype(np.float32)
        D, I = idx.search(q, 5, row_mask=mask)
        assert np.all(mask[I[I >= 0]])
        cn = np.asarray(l2_normalize(jnp.asarray(emb)))
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        keep = np.flatnonzero(mask)
        ovals, oidx = oracle_topk_np(qn, cn[keep], 5)
        np.testing.assert_allclose(D, ovals, rtol=1e-4)
        np.testing.assert_array_equal(I, keep[oidx])

    def test_mask_shorter_than_capacity_pads(self, rng):
        emb = rng.standard_normal((50, 8)).astype(np.float32)
        idx = DenseIndex(dim=8, capacity=128, metric="cos")
        idx.add(emb)
        mask = np.zeros(50, bool)
        mask[7] = True
        _, I = idx.search(emb[:3], 1, row_mask=mask)
        np.testing.assert_array_equal(I[:, 0], [7, 7, 7])

    def test_fresh_masks_never_retrace(self, rng):
        emb = rng.standard_normal((64, 8)).astype(np.float32)
        idx = build_index(emb, metric="cos")
        q = rng.standard_normal((4, 8)).astype(np.float32)
        idx.search(q, 3, row_mask=np.ones(64, bool))
        before = chunked_topk._cache_size()
        for _ in range(3):
            idx.search(q, 3, row_mask=rng.random(64) < 0.5)
        assert chunked_topk._cache_size() == before

    def test_bad_mask_length_raises(self, rng):
        emb = rng.standard_normal((50, 8)).astype(np.float32)
        idx = DenseIndex(dim=8, capacity=128, metric="cos")
        idx.add(emb)
        with pytest.raises(AssertionError, match="row_mask length"):
            idx.search(emb[:2], 1, row_mask=np.ones(60, bool))


@pytest.fixture(scope="module")
def mesh():
    from sessionsimilaritysearch_tpu.parallel import create_mesh

    return create_mesh()


class TestShardedRowMask:
    def test_gid_keyed_mask(self, mesh, rng):
        from sessionsimilaritysearch_tpu.index.sharded import (
            ShardedDenseIndex,
        )

        corpus = rng.standard_normal((160, 16)).astype(np.float32)
        idx = ShardedDenseIndex(dim=16, capacity=256, mesh=mesh,
                                metric="cos", chunk_size=64)
        idx.add(corpus)
        mask = rng.random(160) < 0.3
        cn = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
        D, I = idx.search(cn[:6], 5, row_mask=mask)
        assert np.all(mask[I[I >= 0]])
        keep = np.flatnonzero(mask)
        ovals, oidx = oracle_topk_np(cn[:6], cn[keep], 5)
        np.testing.assert_allclose(D, ovals, rtol=1e-4)
        np.testing.assert_array_equal(I, keep[oidx])

    def test_mask_stays_valid_across_removal(self, mesh, rng):
        from sessionsimilaritysearch_tpu.index.sharded import (
            ShardedDenseIndex,
        )

        corpus = rng.standard_normal((64, 8)).astype(np.float32)
        idx = ShardedDenseIndex(dim=8, capacity=128, mesh=mesh,
                                metric="cos", chunk_size=64)
        idx.add(corpus)
        idx.remove_ids([0, 9, 33])  # gids stay stable for survivors
        mask = np.zeros(64, bool)
        mask[40] = True
        cn = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
        _, I = idx.search(cn[:3], 1, row_mask=mask)
        np.testing.assert_array_equal(I[:, 0], [40, 40, 40])


class TestEngineWhere:
    def _engine(self, gen, tokenizer, mesh=None, prefilter=None):
        import jax

        from sessionsimilaritysearch_tpu.config import tiny_test_config
        from sessionsimilaritysearch_tpu.engine import SessionSearchEngine
        from sessionsimilaritysearch_tpu.models import (
            build_text_session_encoder,
        )
        from sessionsimilaritysearch_tpu.data.graph import (
            batch_graphs,
            sequence_to_graph,
        )

        cfg = tiny_test_config()
        enc = build_text_session_encoder(cfg)
        sample = batch_graphs([
            sequence_to_graph(0, *gen.datum(), tokenizer, cfg.dims)
        ] * 8)
        params = enc.init(jax.random.PRNGKey(0), sample)
        encode_fn = jax.jit(lambda g: enc.apply(params, g))
        return SessionSearchEngine(
            cfg, tokenizer, encode_fn, dim=cfg.n_out, capacity=128,
            batch_size=8, mesh=mesh, prefilter=prefilter,
        )

    def test_where_restricts_results(self, gen, tokenizer):
        eng = self._engine(gen, tokenizer)
        data = gen.dataset(24)
        eng.add_sessions(data)
        allowed = {id(eng.sessions[i]) for i in range(0, 24, 3)}
        pred = lambda s: id(s) in allowed  # noqa: E731
        D, I = eng.search(data[:4], k=4, where=pred)
        for row in I:
            for i in row:
                if i >= 0:
                    assert id(eng.sessions[i]) in allowed
        # predicate composes with dedup
        _, I2 = eng.search(data[:2], k=3, dedup=True, where=pred)
        assert np.all((I2 < 0) | (I2 % 3 == 0))

    def test_where_on_sharded_engine(self, gen, tokenizer, mesh):
        eng = self._engine(gen, tokenizer, mesh=mesh)
        data = gen.dataset(16)
        eng.add_sessions(data)
        targets = [d[0] for d in data[8:]]
        D, I = eng.search(data[:4], k=3,
                          where=lambda s: s in targets)
        assert np.all((I < 0) | (I >= 8))

    def test_where_rejects_twostage(self, gen, tokenizer):
        eng = self._engine(gen, tokenizer, prefilter="binary")
        data = gen.dataset(8)
        eng.add_sessions(data)
        with pytest.raises(ValueError, match="filtered search"):
            eng.search(data[:2], k=2, where=lambda s: True)
