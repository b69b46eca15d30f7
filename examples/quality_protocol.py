"""Multi-seed retrieval-quality protocol: encoder vs sparse baselines with
error bars (VERDICT r1 item 6 — make the quality claims falsifiable).

For each seed: draw a fresh synthetic catalog + corpus + query set, train
the flagship pretrain objective (next-product BCE + contrastive views) on a
training subset, then score every system on the SAME corpus/queries with
the reference's default similarity (`all_product_type_score`,
test_amazon_filterd.py:452-692 evaluation loop; similarity defs :37-57):

  encoder (trained) / SKNN / STAN / hybrid(alpha)

and report mean +- std over seeds. The corpus is deliberately much larger
than the train set (default 20k corpus vs 2k train) so the retrieval task
is not memorization.

Run: python examples/quality_protocol.py --seeds 5 --corpus 20000
Add --out results.json to append one JSON line per seed + the summary.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run_seed(seed, args):
    from sessionsimilaritysearch_tpu.config import tiny_test_config
    from sessionsimilaritysearch_tpu.data import SyntheticSessionGenerator
    from sessionsimilaritysearch_tpu.data.augment import random_exchange_order
    from sessionsimilaritysearch_tpu.data.loader import (
        ContrastiveViewLoader,
        SessionGraphLoader,
    )
    from sessionsimilaritysearch_tpu.data.similarity import get_ave_score
    from sessionsimilaritysearch_tpu.evalharness.harness import (
        evaluate_hybrid,
        evaluate_sparse,
    )
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

    cfg = tiny_test_config(
        asin_num=1600, gnn_nout=64, gnn_nhid=64, emb_len=48,
        text_encoder_dim=64, batch_size=64, ctv_w=0.5,
    )
    gen = SyntheticSessionGenerator(asin_num=1600, n_types=10, seed=seed)
    corpus_data = gen.dataset(args.corpus)
    test_data = gen.dataset(args.queries)
    train_data = corpus_data[: args.train_sessions]

    tok = get_tokenizer(cfg.vocab_size)
    base = SessionGraphLoader(train_data, tok, cfg.dims, cfg.batch_size,
                              seed=seed, prefetch=4)
    loader = ContrastiveViewLoader(base, random_exchange_order, seed=seed + 1)
    rng = jax.random.PRNGKey(seed)
    b0, v0 = next(iter(loader))
    sample = jax.tree.map(jnp.asarray, b0)
    model = PretrainModel(cfg)
    state = create_train_state(
        model, rng, (sample, rng), adam_with_clip(cfg.lr),
        init_kwargs={"view_graph": sample, "deterministic": True},
    )
    step = make_train_step(model, has_view=True)
    encode = make_encode_fn(model)

    t0 = time.time()
    for _ in range(args.epochs):
        for b, v in loader:
            rng, sub = jax.random.split(rng)
            state, _ = step(state, jax.tree.map(jnp.asarray, b), sub,
                            jax.tree.map(jnp.asarray, v))
    train_s = time.time() - t0

    def embed_all(data):
        out = []
        ld = SessionGraphLoader(data, tok, cfg.dims, cfg.batch_size,
                                shuffle=False, prefetch=2, cache=False)
        for b in ld:
            out.append(
                np.asarray(encode(state, jax.tree.map(jnp.asarray, b)))
            )
        return np.concatenate(out)[: len(data)]

    corpus_sessions = [d[0] for d in corpus_data]
    row = {"seed": seed, "train_s": round(train_s, 1)}

    t0 = time.time()
    ce = embed_all([(s, []) for s in corpus_data])
    qe = embed_all(test_data)
    idx = build_index(ce, metric="cos")
    _, I = idx.search(qe, args.k)
    row["encoder"] = get_ave_score(
        I, test_data, corpus_sessions, "all_product_type_score"
    )
    row["dense_s"] = round(time.time() - t0, 1)

    for kind, name in (("binary", "sknn"), ("stan", "stan")):
        t0 = time.time()
        res = evaluate_sparse(cfg, corpus_sessions, test_data,
                              kind=kind, k=args.k)
        row[name] = res.report["ave_all_product_type_score"]
        row[f"{name}_s"] = round(time.time() - t0, 1)

    enc_fn = lambda g: encode(state, g)
    res = evaluate_hybrid(cfg, tok, enc_fn, [(s, []) for s in corpus_data],
                          test_data, k=args.k, alpha=args.alpha,
                          batch_size=cfg.batch_size)
    row["hybrid"] = res.report["ave_all_product_type_score"]
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--seed0", type=int, default=100)
    ap.add_argument("--corpus", type=int, default=20000)
    ap.add_argument("--queries", type=int, default=200)
    ap.add_argument("--train-sessions", type=int, default=2000)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--alpha", type=float, default=0.5)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    rows = []
    for i in range(args.seeds):
        row = run_seed(args.seed0 + i, args)
        rows.append(row)
        print(json.dumps(row))
        sys.stdout.flush()
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")

    systems = ["encoder", "sknn", "stan", "hybrid"]
    summary = {"n_seeds": len(rows), "corpus": args.corpus,
               "queries": args.queries, "epochs": args.epochs}
    for s in systems:
        v = np.asarray([r[s] for r in rows], np.float64)
        summary[s] = {"mean": round(float(v.mean()), 4),
                      "std": round(float(v.std(ddof=1)) if len(v) > 1
                                   else 0.0, 4)}
    # the claim under test: encoder-vs-sknn and hybrid-vs-sknn deltas with
    # paired-seed std (both systems see the same data per seed)
    for a, b in (("encoder", "sknn"), ("hybrid", "sknn")):
        d = np.asarray([r[a] - r[b] for r in rows], np.float64)
        summary[f"{a}_minus_{b}"] = {
            "mean": round(float(d.mean()), 4),
            "std": round(float(d.std(ddof=1)) if len(d) > 1 else 0.0, 4),
        }
    print(json.dumps({"summary": summary}))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps({"summary": summary}) + "\n")


if __name__ == "__main__":
    main()
