"""Out-of-catalog generalization benchmark.

Corpus and query sessions are drawn from DISJOINT halves of the product
catalog (zero item overlap, verified) with a shared product-type structure.
Item-overlap baselines (SKNN/STAN) collapse to chance; the text-driven
session encoder retrieves same-type sessions -- the semantic-similarity
capability this framework provides (docs/RESULTS.md has measured numbers:
trained 0.637 vs sparse 0.062 on a TPU v5e).

Run: python examples/generalization_benchmark.py [--epochs 30] [--platform cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sessionsimilaritysearch_tpu.config import tiny_test_config
from sessionsimilaritysearch_tpu.data import SyntheticSessionGenerator
from sessionsimilaritysearch_tpu.data.augment import random_exchange_order
from sessionsimilaritysearch_tpu.data.loader import (
    ContrastiveViewLoader,
    SessionGraphLoader,
)
from sessionsimilaritysearch_tpu.data.similarity import get_ave_score
from sessionsimilaritysearch_tpu.evalharness.harness import evaluate_sparse
from sessionsimilaritysearch_tpu.index import build_index
from sessionsimilaritysearch_tpu.tokenizer import get_tokenizer
from sessionsimilaritysearch_tpu.training.pretrain import (
    PretrainModel,
    make_encode_fn,
    make_train_step,
)
from sessionsimilaritysearch_tpu.training.train_state import (
    adam_with_clip,
    create_train_state,
)


def keep(d, lo, hi):
    items = [a[-1] for a in (list(d[0]) + list(d[1])) if a[1] != "s"]
    return bool(items) and all(lo <= i < hi for i in items)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--corpus", type=int, default=1500)
    ap.add_argument("--queries", type=int, default=80)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    cfg = tiny_test_config(
        asin_num=1600, gnn_nout=64, gnn_nhid=64, emb_len=48,
        text_encoder_dim=64, batch_size=64, ctv_w=0.5,
    )
    # same catalog (seed), independent session streams; corpus sessions use
    # only products [0, 800), queries only [800, 1600)
    gen_a = SyntheticSessionGenerator(asin_num=1600, n_types=10, seed=5)
    gen_b = SyntheticSessionGenerator(asin_num=1600, n_types=10, seed=5)
    gen_b.rng = np.random.default_rng(12345)
    corpus_data, test_data = [], []
    while len(corpus_data) < args.corpus:
        d = gen_a.datum()
        if keep(d, 0, 800):
            corpus_data.append(d)
    while len(test_data) < args.queries:
        d = gen_b.datum()
        if keep(d, 800, 1600):
            test_data.append(d)
    c_items = {a[-1] for d in corpus_data for a in list(d[0]) + list(d[1])
               if a[1] != "s"}
    t_items = {a[-1] for d in test_data for a in list(d[0]) + list(d[1])
               if a[1] != "s"}
    assert not (c_items & t_items), "catalogs must be disjoint"
    print(f"corpus {len(corpus_data)} sessions, queries {len(test_data)}, "
          f"item overlap 0")

    tok = get_tokenizer(cfg.vocab_size)
    base = SessionGraphLoader(corpus_data, tok, cfg.dims, cfg.batch_size,
                              seed=0, prefetch=4)
    loader = ContrastiveViewLoader(base, random_exchange_order, seed=1)
    rng = jax.random.PRNGKey(0)
    b0, v0 = next(iter(loader))
    sample = jax.tree.map(jnp.asarray, b0)
    model = PretrainModel(cfg)
    state = create_train_state(
        model, rng, (sample, rng), adam_with_clip(cfg.lr),
        init_kwargs={"view_graph": sample, "deterministic": True},
    )
    step = make_train_step(model, has_view=True)
    encode = make_encode_fn(model)

    def embed_all(state, data):
        out = []
        l = SessionGraphLoader(data, tok, cfg.dims, cfg.batch_size,
                               shuffle=False, prefetch=2)
        for b in l:
            out.append(np.asarray(encode(state, jax.tree.map(jnp.asarray, b))))
        return np.concatenate(out)[: len(data)]

    def quality(state, tag, k=10):
        ce = embed_all(state, [(d[0], []) for d in corpus_data])
        qe = embed_all(state, test_data)
        idx = build_index(ce, metric="cos")
        _, I = idx.search(qe, k)
        s = get_ave_score(I, test_data, [d[0] for d in corpus_data],
                          "all_product_type_score")
        print(f"{tag}: ave type score@{k} = {s:.3f}")
        return s

    quality(state, "untrained")
    t0 = time.time()
    for epoch in range(args.epochs):
        for b, v in loader:
            rng, sub = jax.random.split(rng)
            state, m = step(state, jax.tree.map(jnp.asarray, b), sub,
                            jax.tree.map(jnp.asarray, v))
    print(f"trained {args.epochs} epochs in {time.time() - t0:.0f}s, "
          f"loss {float(m['loss']):.3f}")
    quality(state, "trained")
    for kind, name in (("binary", "SKNN"), ("stan", "STAN")):
        res = evaluate_sparse(cfg, [d[0] for d in corpus_data], test_data,
                              kind=kind, k=10)
        print(f"{name}: {res.report['ave_all_product_type_score']:.3f}")


if __name__ == "__main__":
    main()
