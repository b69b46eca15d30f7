"""Experiment: in-kernel unpack of int32-packed codes to +-1 bf16 + MXU matmul.

Tests whether Mosaic lowers the bit-unpack (repeat / broadcast+reshape /
variable shift) and how a fused unpack+matmul+bucket-max kernel times vs the
sign-matmul control at 1M x 256 bits.
"""
import functools
import sys
import time

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sessionsimilaritysearch_tpu.ops import hamming

INTERP = "--interp" in sys.argv
if INTERP:
    jax.config.update("jax_platforms", "cpu")


def _unpack_v1(cb, words):
    """[BLK, W] int32 -> [BLK, 32*W] +-1 bf16 via repeat + variable shift.
    Layout matches pack_bits: out[:, 32*w + j] = bit j of word w."""
    blk = cb.shape[0]
    rep = jnp.repeat(cb.astype(jnp.uint32), 32, axis=1)  # [BLK, 32W]
    sh = jax.lax.broadcasted_iota(jnp.uint32, (blk, 32 * words), 1) % 32
    bits = ((rep >> sh) & jnp.uint32(1)).astype(jnp.int32)
    return (2 * bits - 1).astype(jnp.float32).astype(jnp.bfloat16)


def _unpack_v2(cb, words):
    """3D broadcast + reshape variant."""
    blk = cb.shape[0]
    w3 = jnp.broadcast_to(
        cb.astype(jnp.uint32)[:, :, None], (blk, words, 32)
    )
    sh = jax.lax.broadcasted_iota(jnp.uint32, (blk, words, 32), 2)
    bits = ((w3 >> sh) & jnp.uint32(1)).reshape(blk, words * 32).astype(jnp.int32)
    return (2 * bits - 1).astype(jnp.float32).astype(jnp.bfloat16)


def _unpack_v3(cb, words):
    """32 static shifts + lane concat. Output bit order is PERMUTED:
    out[:, j*W + w] = bit j of word w (vs pack layout 32w+j). Callers must
    permute query columns to match: q_perm[:, j*W+w] = q[:, 32w+j]."""
    c = cb
    parts = [((c >> j) & jnp.int32(1)) for j in range(32)]
    bits = jnp.concatenate(parts, axis=1)
    return (2 * bits - 1).astype(jnp.float32).astype(jnp.bfloat16)


def pack_bits_t(signs: np.ndarray, block_c: int = 2048) -> np.ndarray:
    """Transposed packing: rows packed ACROSS the word's 32 bits.

    signs: [N, BITS] +-1, N % block_c == 0. Output [N//32, BITS] int32.
    Within each block_c-row group, packed row s (s < block_c//32), bit j,
    column b  =  sign bit of original row (j * block_c//32 + s), column b.
    In-kernel unpack is then 32 static shifts + sublane concat, and the
    unpacked row order equals the original order exactly.
    """
    n, bits = signs.shape
    assert n % block_c == 0 and block_c % 32 == 0
    s_rows = block_c // 32
    b01 = (signs > 0).astype(np.uint32)  # [N, BITS]
    g = b01.reshape(n // block_c, 32, s_rows, bits)  # [G, j, s, b]
    out = np.zeros((n // block_c, s_rows, bits), dtype=np.uint32)
    for j in range(32):
        out |= g[:, j, :, :] << np.uint32(j)
    return out.reshape(n // 32, bits).astype(np.int32)


def _unpack_v4(cb, words_unused):
    """Full-lane transposed unpack: cb [S, BITS] int32 (pack_bits_t layout)
    -> [32*S, BITS] +-1 bf16 in ORIGINAL row order."""
    parts = [((cb >> j) & jnp.int32(1)) for j in range(32)]
    bits = jnp.concatenate(parts, axis=0)
    return (2 * bits - 1).astype(jnp.float32).astype(jnp.bfloat16)


def v3_query_perm(bits: int):
    """Column permutation aligning query sign vectors with _unpack_v3."""
    w = bits // 32
    perm = np.empty(bits, dtype=np.int32)
    for j in range(32):
        for k in range(w):
            perm[j * w + k] = 32 * k + j
    return perm


_UNPACKS = {1: _unpack_v1, 2: _unpack_v2, 3: _unpack_v3}


def _kernel(q_ref, c_ref, m_ref, *, words: int, variant: int):
    r = pl.program_id(2)
    unpack = _UNPACKS[variant]
    pm = unpack(c_ref[:], words)  # [BLK, BITS] +-1 bf16
    scores = jax.lax.dot_general(
        q_ref[:], pm,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TQ, BLK]
    tq, blk = scores.shape
    part = jnp.max(scores.reshape(tq, blk // 128, 128), axis=1)

    @pl.when(r == 0)
    def _():
        m_ref[:] = part

    @pl.when(r != 0)
    def _():
        m_ref[:] = jnp.maximum(m_ref[:], part)


@functools.partial(jax.jit, static_argnames=(
    "rows_per_bucket", "block_q", "block_c", "variant", "interpret"))
def packed_sign_bmax(q_signs, c_packed, rows_per_bucket=128, block_q=256,
                     block_c=1024, variant=1, interpret=False):
    q, bits = q_signs.shape
    n, w = c_packed.shape
    assert bits == 32 * w
    group = 128 * rows_per_bucket
    inner = group // block_c
    grid = (q // block_q, n // group, inner)
    return pl.pallas_call(
        functools.partial(_kernel, words=w, variant=variant),
        out_shape=jax.ShapeDtypeStruct((q, n // rows_per_bucket), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, bits), lambda i, j, r: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_c, w), lambda i, j, r: (j * inner + r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_q, 128), lambda i, j, r: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * n * bits,
            bytes_accessed=q * bits * 2 + n * w * 4
            + q * (n // rows_per_bucket) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_signs, c_packed)


def _kernel_t(q_ref, c_ref, m_ref):
    r = pl.program_id(2)
    pm = _unpack_v4(c_ref[:], None)  # [BLK, BITS] +-1 bf16, original order
    scores = jax.lax.dot_general(
        q_ref[:], pm,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TQ, BLK]
    tq, blk = scores.shape
    # strided buckets: bucket j = max over rows == j (mod 128) in the group
    part = jnp.max(scores.reshape(tq, blk // 128, 128), axis=1)

    @pl.when(r == 0)
    def _():
        m_ref[:] = part

    @pl.when(r != 0)
    def _():
        m_ref[:] = jnp.maximum(m_ref[:], part)


@functools.partial(jax.jit, static_argnames=(
    "rows_per_bucket", "block_q", "block_c", "interpret"))
def packed_t_bmax(q_signs, c_packed_t, rows_per_bucket=128, block_q=256,
                  block_c=2048, interpret=False):
    """Bucket max over a transposed-packed corpus (strided buckets, v1-3
    convention: within each group of 128*rows_per_bucket rows, bucket j =
    max over rows == j mod 128).

    c_packed_t: [N/32, BITS] int32, pack_bits_t(signs, block_c) layout —
    block_c here MUST match the pack-time block_c.
    """
    q, bits = q_signs.shape
    ns, bits2 = c_packed_t.shape
    assert bits == bits2
    n = ns * 32
    group = 128 * rows_per_bucket
    assert group % block_c == 0
    inner = group // block_c
    return pl.pallas_call(
        _kernel_t,
        out_shape=jax.ShapeDtypeStruct((q, n // rows_per_bucket),
                                       jnp.float32),
        grid=(q // block_q, n // group, inner),
        in_specs=[
            pl.BlockSpec((block_q, bits), lambda i, j, r: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_c // 32, bits),
                         lambda i, j, r: (j * inner + r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_q, 128), lambda i, j, r: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * n * bits,
            bytes_accessed=q * bits * 2 + ns * bits * 4
            + q * (n // rows_per_bucket) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_signs, c_packed_t)


def main():
    r = np.random.default_rng(0)
    if INTERP:
        N, BITS, Q = 16384, 256, 256
    else:
        N, BITS, Q = 1 << 20, 256, 1024
    W = BITS // 32
    signs_np = np.where(
        r.standard_normal((N, BITS)) > 0, 1.0, -1.0
    ).astype(np.float32)
    qs_np = np.where(
        r.standard_normal((Q, BITS)) > 0, 1.0, -1.0
    ).astype(np.float32)
    signs = jnp.asarray(signs_np, jnp.bfloat16)
    qs = jnp.asarray(qs_np, jnp.bfloat16)
    packed = hamming.pack_bits(signs)
    jax.block_until_ready((signs, qs, packed))
    print(f"# N={N} BITS={BITS} Q={Q} interp={INTERP}")

    # oracle bucket max on a small slice
    qs_small, n_small = qs_np[:8], 128 * 128
    dots = qs_small @ signs_np[:n_small].T  # [8, n_small]
    om = dots.reshape(8, n_small // (128 * 128), 128, 128).max(axis=2)
    om = om.reshape(8, -1)

    perm = v3_query_perm(BITS)
    qs_v3 = jnp.asarray(qs_np[:, perm], jnp.bfloat16)

    for v in (1, 2, 3):
        try:
            bm = packed_sign_bmax(
                qs_v3 if v == 3 else qs, packed, variant=v, interpret=INTERP)
            got = np.asarray(bm[:8, : om.shape[1]])
            ok = np.allclose(got, om, atol=0.5)
            print(f"variant {v}: lowered, bucket-max exact={ok}")
            if not ok:
                print("  got ", got[0, :6], "\n  want", om[0, :6])
        except Exception as e:
            print(f"variant {v}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}")

    packed_t = jnp.asarray(pack_bits_t(signs_np, block_c=2048))
    try:
        bm = packed_t_bmax(qs, packed_t, interpret=INTERP)
        got = np.asarray(bm[:8, : om.shape[1]])
        ok = np.allclose(got, om, atol=0.5)
        print(f"variant 4 (transposed): lowered, bucket-max exact={ok}")
        if not ok:
            print("  got ", got[0, :6], "\n  want", om[0, :6])
    except Exception as e:
        print(f"variant 4: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]}")

    if INTERP:
        return

    # timing vs sign-matmul control
    def run(tag, fn, iters=8):
        out = fn(qs)
        np.asarray(out[0] if isinstance(out, tuple) else out)
        t0 = time.perf_counter()
        x = qs
        for _ in range(iters):
            out = fn(x)
            o0 = out[0] if isinstance(out, tuple) else out
            x = qs + jnp.zeros_like(qs) * o0.reshape(-1)[0].astype(qs.dtype)
        np.asarray(o0)
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{tag}: {dt:.2f} ms/batch ({Q / dt * 1000:.0f} QPS)")

    for v in (3,):
        try:
            run(f"packed_unpack_v{v}_bmax",
                lambda q, v=v: packed_sign_bmax(
                    qs_v3 if v == 3 else q, packed, variant=v))
        except Exception as e:
            print(f"packed_unpack_v{v}_bmax: FAILED "
                  f"{str(e).splitlines()[0][:160]}")

    try:
        run("packed_t_bmax (v4)   ",
            lambda q: packed_t_bmax(q, packed_t))
        for bc in (4096, 8192):
            pt = jnp.asarray(pack_bits_t(signs_np, block_c=bc))
            run(f"packed_t_bmax bc={bc}",
                lambda q, pt=pt, bc=bc: packed_t_bmax(q, pt, block_c=bc))
    except Exception as e:
        print(f"packed_t_bmax: FAILED {str(e).splitlines()[0][:160]}")

    # control: existing fused bf16 bucket-max over unpacked signs
    from sessionsimilaritysearch_tpu.ops.pallas_mips import scores_bucket_max
    run("signs_bmax_control ",
        lambda q: scores_bucket_max(q, signs))


main()
