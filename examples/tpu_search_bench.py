"""Single-chip search-path shootout at flagship shapes.

Times every dense and binary search formulation at BASELINE config
(1M-session corpus, d=1600 dense / 250-bit codes, K=100, 1024-query
batches) on whatever jax.devices()[0] is, and prints one JSON dict per
path. This is the measurement harness behind docs/RESULTS.md's search
tables and the bench.py mode choices; the reference counterpart of the
timed region is the FAISS flat scan (test_amazon_filterd.py:577-579) and
the timed binary path (fine_tune_ours.py:875-879).

Usage: python examples/tpu_search_bench.py [--paths dense,binary]
       [--n 1048576] [--q 1024] [--iters 20]

Timing notes (CLAUDE.md): results chain data dependencies between timed
iterations and materialize the final output -- on the tunneled dev TPU
`block_until_ready` can return early.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def timed(fn, q0, iters, chain):
    """Run fn(q) `iters` times, chaining a data dependency through q."""
    q = q0
    out = None
    for _ in range(2):  # warm/compile
        out = fn(q)
        q = chain(q, out)
    np.asarray(jax_leaf(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(q)
        q = chain(q, out)
    np.asarray(jax_leaf(out))
    return (time.perf_counter() - t0) / iters


def jax_leaf(out):
    import jax

    return jax.tree_util.tree_leaves(out)[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", default="dense,binary")
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--d", type=int, default=1600)
    ap.add_argument("--bits", type=int, default=250)
    ap.add_argument("--q", type=int, default=1024)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--oracle-n", type=int, default=65536)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sessionsimilaritysearch_tpu.ops import hamming, pallas_mips
    from sessionsimilaritysearch_tpu.ops.topk import (
        chunked_topk,
        l2_normalize,
        oracle_topk_np,
        recall_at_k,
        value_recall_at_k,
    )

    dev = jax.devices()[0]
    interp = dev.platform == "cpu"
    N, D, K, Q = args.n, args.d, args.k, args.q
    print(f"# platform={dev.platform} N={N} D={D} K={K} Q={Q}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    corpus = jax.random.normal(k1, (N, D), dtype=jnp.bfloat16)
    corpus = l2_normalize(corpus.astype(jnp.float32)).astype(jnp.bfloat16)
    queries = l2_normalize(
        jax.random.normal(k2, (Q, D), dtype=jnp.float32)
    ).astype(jnp.bfloat16)
    jax.block_until_ready((corpus, queries))

    results = []

    def report(name, dt, extra=None):
        row = {
            "path": name,
            "ms_per_batch": round(dt * 1e3, 2),
            "qps": round(Q / dt, 1),
        }
        row.update(extra or {})
        results.append(row)
        print(json.dumps(row))
        sys.stdout.flush()

    def vrecall(fn, sub_n):
        """value-recall@10 of `fn` restricted to a subcorpus vs f64 oracle."""
        sub = np.asarray(corpus[:sub_n], np.float32)
        subq = np.asarray(queries[:256], np.float32)
        _, i_dev = fn(jnp.asarray(subq, jnp.bfloat16), corpus[:sub_n])
        sr = recall_at_k(np.asarray(i_dev)[:, :10], oracle_topk_np(subq, sub, 10)[1])
        vr = value_recall_at_k(
            np.asarray(i_dev), subq, sub, 10, rel_tol=2 * 2.0**-8
        )
        return round(vr, 4), round(sr, 4)

    chain_d = lambda q, out: q + (out[0][:, :1] * 1e-12).astype(q.dtype)

    if "dense" in args.paths:
        # -- XLA exact, bf16 scores (bench.py default)
        dt = timed(
            lambda q: chunked_topk(q, corpus, K, chunk_size=N, mode="exact",
                                   bucket=128, score_dtype=jnp.bfloat16),
            queries, args.iters, chain_d,
        )
        vr, sr = vrecall(
            lambda q, c: chunked_topk(q, c, 10, chunk_size=N,
                                      score_dtype=jnp.bfloat16),
            args.oracle_n,
        )
        report("xla_exact_bf16", dt, {"value_recall10": vr, "set_recall10": sr})

        # -- XLA exact, f32 scores
        dt = timed(
            lambda q: chunked_topk(q, corpus, K, chunk_size=N, mode="exact",
                                   bucket=128, score_dtype=jnp.float32),
            queries, args.iters, chain_d,
        )
        report("xla_exact_f32", dt)

        # -- matmul floor (no selection): what the MXU+HBM structure allows
        def floor_fn(q):
            s = pallas_mips.scores_bucket_max(q, corpus, interpret=interp)
            return (s,)

        try:
            dt = timed(floor_fn, queries, args.iters, chain_d)
            report("pallas_bucketmax_floor", dt)
        except Exception as e:  # Mosaic lowering may fail on some backends
            print(f"# pallas_bucketmax_floor FAILED: {e}", file=sys.stderr)

        # -- Pallas fused exact (large batch production candidate)
        def pexact(q):
            return pallas_mips.pallas_exact_topk(
                q, corpus, K, interpret=interp
            )

        try:
            dt = timed(pexact, queries, args.iters, chain_d)
            vr, sr = vrecall(
                lambda q, c: pallas_mips.pallas_exact_topk(
                    q, c, 10, interpret=interp
                ),
                args.oracle_n,
            )
            report("pallas_exact_bf16", dt,
                   {"value_recall10": vr, "set_recall10": sr})
        except Exception as e:
            print(f"# pallas_exact_bf16 FAILED: {e}", file=sys.stderr)

        # -- Pallas zero-score-traffic (small batch serving candidate).
        # rows_per_bucket scales the candidate gather (q*k*S rows); S=128
        # would gather 10.5 GB bf16 at q=256,k=100 -- serving uses S=16.
        q256 = queries[:256]
        for rpb in (8, 16):
            try:
                dt = timed(
                    lambda q: pallas_mips.pallas_bucketed_topk(
                        q, corpus, K, rows_per_bucket=rpb, interpret=interp
                    ),
                    q256, args.iters, chain_d,
                )
                row = {
                    "path": f"pallas_bucketed_q256_s{rpb}",
                    "ms_per_batch": round(dt * 1e3, 2),
                    "qps": round(256 / dt, 1),
                }
                results.append(row)
                print(json.dumps(row))
            except Exception as e:
                print(f"# pallas_bucketed_q256_s{rpb} FAILED: {e}",
                      file=sys.stderr)

        # -- XLA approx (recall-target mode)
        dt = timed(
            lambda q: chunked_topk(q, corpus, K, chunk_size=N, mode="approx",
                                   recall_target=0.95),
            queries, args.iters, chain_d,
        )
        report("xla_approx_rt95", dt)

    if "int8" in args.paths:
        # -- int8-quantized corpus (half the HBM traffic of bf16)
        from sessionsimilaritysearch_tpu.index.dense import (
            _quantize_rows_int8,
        )

        codes, scales = _quantize_rows_int8(corpus.astype(jnp.float32))
        jax.block_until_ready((codes, scales))
        dt = timed(
            lambda q: chunked_topk(q, codes, K, chunk_size=N, mode="exact",
                                   bucket=128, score_dtype=jnp.bfloat16,
                                   corpus_scales=scales),
            queries, args.iters, chain_d,
        )
        sub_n = args.oracle_n
        sub = np.asarray(corpus[:sub_n], np.float32)
        subq = np.asarray(queries[:256], np.float32)
        _, i_dev = chunked_topk(
            jnp.asarray(subq, jnp.bfloat16), codes[:sub_n], 10,
            chunk_size=sub_n, score_dtype=jnp.bfloat16,
            corpus_scales=scales[:sub_n],
        )
        vr = value_recall_at_k(
            np.asarray(i_dev), subq, sub, 10, rel_tol=2 * 2.0**-7
        )
        report("xla_exact_int8", dt, {"value_recall10": round(vr, 4)})

    if "cert" in args.paths:
        # -- exact-with-certificate: approx bucket selection + bucket-max
        # certificate, exact fallback only on violation (ops/topk.py
        # _chunk_topk_cert; VERDICT r2 item 6)
        from sessionsimilaritysearch_tpu.index.dense import (
            _quantize_rows_int8,
        )

        dt = timed(
            lambda q: chunked_topk(q, corpus, K, chunk_size=N,
                                   mode="exact_cert",
                                   score_dtype=jnp.bfloat16),
            queries, args.iters, chain_d,
        )
        vr, sr = vrecall(
            lambda q, c: chunked_topk(q, c, 10, chunk_size=N,
                                      mode="exact_cert",
                                      score_dtype=jnp.bfloat16),
            args.oracle_n,
        )
        report("xla_cert_bf16", dt,
               {"value_recall10": vr, "set_recall10": sr})

        c8, cs = _quantize_rows_int8(corpus.astype(jnp.float32))
        q8, qs = _quantize_rows_int8(queries.astype(jnp.float32))
        jax.block_until_ready((c8, cs, q8, qs))
        chain_i8 = lambda q, out: q + (out[0][:, :1] > 1e30).astype(q.dtype)
        for mode, tag in (("exact", "xla_int8x8_exact_ctl"),
                          ("exact_cert", "xla_cert_int8x8")):
            dt = timed(
                lambda q, m=mode: chunked_topk(
                    q, c8, K, chunk_size=N, mode=m,
                    score_dtype=jnp.bfloat16, corpus_scales=cs,
                    query_scales=qs),
                q8, args.iters, chain_i8,
            )
            sub = np.asarray(corpus[: args.oracle_n], np.float32)
            subq = np.asarray(queries[:256], np.float32)
            _, i_dev = chunked_topk(
                q8[:256], c8[: args.oracle_n], 10,
                chunk_size=args.oracle_n, mode=mode,
                score_dtype=jnp.bfloat16,
                corpus_scales=cs[: args.oracle_n], query_scales=qs[:256],
            )
            vr = value_recall_at_k(
                np.asarray(i_dev), subq, sub, 10, rel_tol=4 / 127
            )
            report(tag, dt, {"value_recall10": round(vr, 4)})

    if "int8pallas" in args.paths:
        # -- fused int8 Pallas kernel sweep (matmul + dequant + bucket-max
        # in VMEM; the int32 product matrix never reaches HBM). VERDICT r2
        # item 6's second route.
        from sessionsimilaritysearch_tpu.index.dense import (
            _quantize_rows_int8,
        )

        c8, cs = _quantize_rows_int8(corpus.astype(jnp.float32))
        q8, qs = _quantize_rows_int8(queries.astype(jnp.float32))
        jax.block_until_ready((c8, cs, q8, qs))
        chain_i8 = lambda q, out: q + (out[0][:, :1] > 1e30).astype(q.dtype)
        sub = np.asarray(corpus[: args.oracle_n], np.float32)
        subq = np.asarray(queries[:256], np.float32)
        for rpb, bq, bc in ((128, 256, 1024), (128, 256, 2048),
                            (128, 512, 1024), (64, 256, 1024),
                            (128, 128, 1024)):
            try:
                dt = timed(
                    lambda q, a=rpb, b=bq, c=bc:
                        pallas_mips.pallas_exact_topk_int8(
                            q, c8, K, qs, cs, rows_per_bucket=a,
                            block_q=b, block_c=c,
                            score_dtype=jnp.bfloat16, interpret=interp),
                    q8, args.iters, chain_i8,
                )
            except Exception as e:
                print(f"# int8pallas rpb={rpb} bq={bq} bc={bc} failed: "
                      f"{type(e).__name__}", file=sys.stderr)
                continue
            _, i_dev = pallas_mips.pallas_exact_topk_int8(
                q8[:256], c8[: args.oracle_n], 10, qs[:256],
                cs[: args.oracle_n], rows_per_bucket=min(rpb, 64),
                block_q=256, block_c=1024, score_dtype=jnp.bfloat16,
                interpret=interp,
            )
            vr = value_recall_at_k(
                np.asarray(i_dev), subq, sub, 10, rel_tol=4 / 127
            )
            report(f"pallas_int8_rpb{rpb}_bq{bq}_bc{bc}", dt,
                   {"value_recall10": round(vr, 4)})

    if "twostage" in args.paths:
        # -- two-stage serving (index/twostage.py): cheap stage-1 prefilter
        # over the whole corpus nominates `pool` candidates per query,
        # stage 2 (ops.topk.rerank_topk) gathers only those rows at full
        # dimension and ranks them exactly. Quality column: containment of
        # the device-exact f32 top-10 in the final top-10, measured at the
        # FULL corpus size (pool recall is what two-stage quality is).
        from sessionsimilaritysearch_tpu.ops.topk import rerank_topk

        bits = 256  # bf16-lossless sign-scan width (ops/hamming.py)
        Rb = jax.random.normal(
            jax.random.PRNGKey(7), (D, bits), jnp.float32
        ).astype(jnp.bfloat16)
        signs = jnp.where(
            jnp.dot(corpus, Rb, preferred_element_type=jnp.float32) >= 0,
            1.0, -1.0,
        ).astype(jnp.bfloat16)
        jax.block_until_ready(signs)
        ref_v, ref_i = chunked_topk(
            queries, corpus, 10, chunk_size=N, score_dtype=jnp.float32
        )
        ref_i = np.asarray(ref_i)

        def containment(I):
            I = np.asarray(I)[:, :10]
            hits = sum(
                len(set(f.tolist()) & set(t.tolist()))
                for f, t in zip(I, ref_i)
            )
            return round(hits / ref_i.size, 4)

        for pool in (128, 256, 512, 1024):
            def ts_bin(q, p=pool):
                qs = jnp.where(
                    jnp.dot(q, Rb, preferred_element_type=jnp.float32) >= 0,
                    1.0, -1.0,
                ).astype(jnp.bfloat16)
                _, cand = hamming.sign_topk(
                    qs, signs, p, n_bits=bits, mode="approx",
                    recall_target=0.95,
                )
                return rerank_topk(q, corpus, cand, K,
                                   score_dtype=jnp.bfloat16)

            dt = timed(ts_bin, queries, args.iters, chain_d)
            _, I = ts_bin(queries)
            report(f"twostage_bin{bits}_pool{pool}", dt,
                   {"exact_top10_containment": containment(I)})

        # packed stage 1: the fused Pallas unpack->MXU scan over
        # TRANSPOSED int32-packed codes (TwoStageIndex(stage1='packed')
        # semantics) -- 1 bit/bit of stage-1 HBM and an EXACT Hamming
        # top-pool at sign-matmul speed (the earlier XOR+popcount kernel
        # measured 7x slower than the matmul; docs/RESULTS.md r3)
        bits_pad = -(-bits // 128) * 128  # kernel lane multiple; query pad
        # columns are ZERO so corpus pad bits never score
        packed_t = jnp.asarray(
            hamming.pack_bits_t_np(
                np.pad(
                    np.asarray(signs.astype(jnp.float32)),
                    ((0, 0), (0, bits_pad - bits)),
                )
            )
        )
        jax.block_until_ready(packed_t)
        for pool in (128, 256, 512):
            def ts_packed(q, p=pool):
                qs = jnp.where(
                    jnp.dot(q, Rb, preferred_element_type=jnp.float32) >= 0,
                    1.0, -1.0,
                ).astype(jnp.bfloat16)
                qs = jnp.pad(qs, ((0, 0), (0, bits_pad - bits)))
                _, cand = pallas_mips.pallas_packed_topk(
                    qs, packed_t, p, n_bits=bits, rows_per_bucket=128,
                    block_q=256, interpret=interp,
                )
                return rerank_topk(q, corpus, cand, K,
                                   score_dtype=jnp.bfloat16)

            try:
                dt = timed(ts_packed, queries, args.iters, chain_d)
                _, I = ts_packed(queries)
                report(f"twostage_packed{bits}_pool{pool}", dt,
                       {"exact_top10_containment": containment(I)})
            except Exception as e:
                print(f"# twostage_packed pool={pool} FAILED: {e}",
                      file=sys.stderr)

        from sessionsimilaritysearch_tpu.index.dense import (
            _quantize_rows_int8,
        )

        c8, cs = _quantize_rows_int8(corpus.astype(jnp.float32))
        jax.block_until_ready((c8, cs))
        for pool in (128, 256, 512):
            def ts_i8(q, p=pool):
                q8, qs = _quantize_rows_int8(q.astype(jnp.float32))
                _, cand = chunked_topk(
                    q8, c8, p, chunk_size=N, mode="approx",
                    recall_target=0.95, score_dtype=jnp.bfloat16,
                    corpus_scales=cs, query_scales=qs,
                )
                return rerank_topk(q, corpus, cand, K,
                                   score_dtype=jnp.bfloat16)

            dt = timed(ts_i8, queries, args.iters, chain_d)
            _, I = ts_i8(queries)
            report(f"twostage_int8x8_pool{pool}", dt,
                   {"exact_top10_containment": containment(I)})

    if "binary" in args.paths:
        bits = args.bits
        signs = jnp.where(
            jax.random.bernoulli(k1, 0.5, (N, bits)), 1.0, -1.0
        ).astype(jnp.bfloat16)
        q_signs = jnp.where(
            jax.random.bernoulli(k2, 0.5, (Q, bits)), 1.0, -1.0
        ).astype(jnp.bfloat16)
        packed_c = hamming.pack_bits(signs)
        packed_q = hamming.pack_bits(q_signs)
        jax.block_until_ready((signs, q_signs, packed_c, packed_q))
        chain_b = lambda q, out: q  # int outputs; rely on materialize-per-iter

        def chain_sign(q, out):
            # flip nothing but keep a data dependency: add 0*dist
            return q + (out[0][:, :1] * 0).astype(q.dtype)

        dt = timed(
            lambda q: hamming.sign_topk(q, signs, K, n_bits=bits),
            q_signs, args.iters, chain_sign,
        )
        report(f"binary_sign_matmul_{bits}b", dt)

        def chain_pack(q, out):
            return jnp.bitwise_xor(q, (out[0][:, :1] * 0).astype(q.dtype))

        dt = timed(
            lambda q: hamming.hamming_topk(q, packed_c, K),
            packed_q, args.iters, chain_pack,
        )
        report(f"binary_xla_popcount_{bits}b", dt)

        try:
            dt = timed(
                lambda q: pallas_mips.pallas_hamming_topk(
                    q, packed_c, K, interpret=interp
                ),
                packed_q, args.iters, chain_pack,
            )
            report(f"binary_pallas_popcount_{bits}b", dt)
        except Exception as e:
            print(f"# binary_pallas FAILED: {e}", file=sys.stderr)

        # production packed path: transposed pack + in-kernel unpack->MXU
        try:
            bits_pad = -(-bits // 128) * 128
            packed_tc = jnp.asarray(
                hamming.pack_bits_t_np(
                    np.pad(
                        np.asarray(signs.astype(jnp.float32)),
                        ((0, 0), (0, bits_pad - bits)),
                    )
                )
            )
            q_signs_pad = jnp.pad(
                q_signs, ((0, 0), (0, bits_pad - bits))
            )
            jax.block_until_ready((packed_tc, q_signs_pad))
            dt = timed(
                lambda q: pallas_mips.pallas_packed_topk(
                    q, packed_tc, K, n_bits=bits, interpret=interp
                ),
                q_signs_pad, args.iters, chain_sign,
            )
            report(f"binary_packed_mxu_{bits}b", dt)
        except Exception as e:
            print(f"# binary_packed_mxu FAILED: {e}", file=sys.stderr)

    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
