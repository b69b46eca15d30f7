"""Three-pairing kNN next-item evaluation with TRAINED towers (VERDICT r3
item 6 — the measured-numbers half; the capability itself is
`harness.evaluate_knn_pairings` + `cli evaluate --mode knn --pairings`).

The reference's Yoochoose `main()` builds BOTH a session and a subsession
encoder, embeds the SAME train corpus through each, and logs next-item
recall@20 under three query/db pairings (test_amazon_filterd.py:87-205,
:189-201):

    subsession->session, subsession->subsession, session->session

This script reproduces that protocol on the synthetic regimes: two
independently trained towers (the production two-pool graph encoder under
the subsession objective and the whole-session objective,
training/session_trainers.py modes), then the three-way pairing matrix
per regime.

Run (TPU):  python examples/knn_pairings.py --out docs/knn_pairings_r4.json
Smoke:      python examples/knn_pairings.py --platform cpu --tiny
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_regime(regime: str, args) -> dict:
    import jax
    import jax.numpy as jnp

    from sessionsimilaritysearch_tpu.config import tiny_test_config
    from sessionsimilaritysearch_tpu.data import (
        AdversarialSessionGenerator,
        SyntheticSessionGenerator,
    )
    from sessionsimilaritysearch_tpu.data.loader import SessionGraphLoader
    from sessionsimilaritysearch_tpu.evalharness import harness
    from sessionsimilaritysearch_tpu.models.encoder import build_graph_encoder
    from sessionsimilaritysearch_tpu.tokenizer import get_tokenizer
    from sessionsimilaritysearch_tpu.training.session_trainers import (
        create_session_state,
        make_session_train_step,
    )
    from sessionsimilaritysearch_tpu.utils.precision import serving_params

    cfg = tiny_test_config(
        asin_num=args.asins, gnn_nout=args.gnn_nout, gnn_nhid=args.gnn_nhid,
        emb_len=args.emb_len, text_encoder_dim=args.text_dim,
        batch_size=64, ctv_w=0.5,
    ).replace(product_pooling="recency")
    gen = (AdversarialSessionGenerator(asin_num=args.asins, seed=1000)
           if regime == "adversarial"
           else SyntheticSessionGenerator(asin_num=args.asins, seed=1000))
    corpus_data = gen.dataset(args.corpus)
    test_data = gen.dataset(args.queries)
    train_data = corpus_data[: args.train]
    tok = get_tokenizer(cfg.vocab_size)

    def train_tower(mode: str, seed: int):
        """One tower under the given objective; returns its encode fn."""
        rng = jax.random.PRNGKey(seed)
        loader = SessionGraphLoader(train_data, tok, cfg.dims,
                                    cfg.batch_size, seed=seed, prefetch=4)
        sample = jax.tree.map(jnp.asarray, next(iter(loader)))
        model, state = create_session_state(
            cfg, rng, sample, mode=mode, encoder_kind="flagship")
        step = make_session_train_step(model)
        t0 = time.time()
        m = {}
        for _ in range(args.epochs):
            for b in loader:
                rng, sub = jax.random.split(rng)
                state, m = step(state, jax.tree.map(jnp.asarray, b), sub)
        t_train = time.time() - t0
        enc_mod = build_graph_encoder(cfg)
        enc_vars = {"params": serving_params(state.params)["encoder"]}
        enc_apply = jax.jit(lambda g: enc_mod.apply(enc_vars, g))
        loss = float(m.get("loss", np.nan))
        return enc_apply, t_train, loss

    sub_fn, t_sub, loss_sub = train_tower("subsession", seed=1)
    ses_fn, t_ses, loss_ses = train_tower("session", seed=2)

    t0 = time.time()
    out = harness.evaluate_knn_pairings(
        cfg, tok, sub_fn, ses_fn, corpus_data, test_data,
        K=args.K, sample_size=args.sample_size, batch_size=cfg.batch_size,
    )
    t_eval = time.time() - t0
    out.update({
        "regime": regime, "corpus": args.corpus, "train": args.train,
        "queries": args.queries, "epochs": args.epochs,
        "train_s_subsession": round(t_sub, 1),
        "train_s_session": round(t_ses, 1),
        "final_loss_subsession": round(loss_sub, 4),
        "final_loss_session": round(loss_ses, 4),
        "eval_s": round(t_eval, 1),
    })
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--regimes", default="clustered,adversarial")
    ap.add_argument("--corpus", type=int, default=20_000)
    ap.add_argument("--train", type=int, default=8_000)
    ap.add_argument("--queries", type=int, default=500)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--K", type=int, default=20)
    ap.add_argument("--sample-size", type=int, default=500)
    ap.add_argument("--asins", type=int, default=8000)
    ap.add_argument("--gnn-nout", type=int, default=256)
    ap.add_argument("--gnn-nhid", type=int, default=256)
    ap.add_argument("--emb-len", type=int, default=128)
    ap.add_argument("--text-dim", type=int, default=256)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.tiny:
        args.corpus, args.train, args.queries = 512, 256, 32
        args.epochs, args.sample_size, args.asins = 2, 64, 1000
        args.gnn_nout = args.gnn_nhid = 32
        args.emb_len, args.text_dim = 16, 32

    results = {}
    for regime in args.regimes.split(","):
        results[regime] = run_regime(regime.strip(), args)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
