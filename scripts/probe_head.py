"""Head-fusion probe (VERDICT r3 item 5 tail / RESULTS.md "Remaining headroom").

The detector head's hidden matmul measured ~80 TFLOP/s (~40% of bf16 peak)
at the bench shape — the single biggest known utilization gap. Hypothesis
ladder, measured as marginal chain-differenced ms on chip (interleaved in
one process; CLAUDE.md "BENCHMARK METHODOLOGY"):

A. current: reshape (M,7,7,512) -> (M,25088) then Dense+relu+Dense+relu.
   The flatten merges a tile-UNALIGNED (7,7,512) minor block -> possible
   relayout cost before the MXU ever sees the data.
B. einsum: same math, first layer as einsum('mpqc,pqch->mh') directly on
   the unreshaped pooled tensor — no relayout, contraction over (p,q,c).
C. Pallas: one kernel fusing hidden1 + relu + hidden2 + relu, K streamed
   in (p,q) blocks of (512,1024), W2 VMEM-resident, f32 scratch accum.

All variants share weights and finish with the f32 cls/bbox Denses so the
compared segment is the full head. Parity asserted (<=2e-2 abs on logits,
bf16 reassociation) before timing.

Run ON THE CHIP:  JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache python scripts/probe_head.py
"""

from __future__ import annotations

import functools
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 2048  # B=32 chunks x R=64 rois (bench.py shape)
P, C, H = 7, 512, 1024  # roi_pool, backbone channels, head hidden (base)
K = 31
CHAIN_LO, CHAIN_HI = 8, 64
REPS = 5
BM = 256  # Pallas M tile


def make_params(rng):
    s = 1.0 / np.sqrt(P * P * C)
    w1 = rng.normal(0, s, (P * P * C, H)).astype(np.float32)
    b1 = rng.normal(0, 0.01, (H,)).astype(np.float32)
    w2 = rng.normal(0, 1.0 / np.sqrt(H), (H, H)).astype(np.float32)
    b2 = rng.normal(0, 0.01, (H,)).astype(np.float32)
    wc = rng.normal(0, 0.02, (H, K)).astype(np.float32)
    bc = np.zeros((K,), np.float32)
    wb = rng.normal(0, 0.02, (H, K * 4)).astype(np.float32)
    bb = np.zeros((K * 4,), np.float32)
    return tuple(jnp.asarray(v) for v in (w1, b1, w2, b2, wc, bc, wb, bb))


def tail(x, wc, bc, wb, bb):
    xf = x.astype(jnp.float32)
    return xf @ wc + bc, xf @ wb + bb


def head_a(pooled, params):
    """Current RCNNHead data path (nn/heads.py:117-128)."""
    w1, b1, w2, b2, *t = params
    x = pooled.astype(jnp.bfloat16).reshape(M, -1)
    x = jax.nn.relu((x @ w1.astype(jnp.bfloat16) + b1).astype(jnp.bfloat16))
    x = jax.nn.relu((x @ w2.astype(jnp.bfloat16) + b2).astype(jnp.bfloat16))
    return tail(x, *t)


def head_b(pooled, params):
    """Einsum first layer: contraction over (p,q,c), no flatten relayout."""
    w1, b1, w2, b2, *t = params
    w1r = w1.reshape(P, P, C, H).astype(jnp.bfloat16)
    x = jnp.einsum(
        "mpqc,pqch->mh", pooled.astype(jnp.bfloat16), w1r,
        preferred_element_type=jnp.float32,
    )
    x = jax.nn.relu((x + b1).astype(jnp.bfloat16))
    x = jax.nn.relu((x @ w2.astype(jnp.bfloat16) + b2).astype(jnp.bfloat16))
    return tail(x, *t)


def _head_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, acc):
    pq = pl.program_id(1)
    x = x_ref[0]  # (BM, C) bf16 — (p,q) slice of the pooled tensor
    part = jnp.dot(x, w1_ref[0], preferred_element_type=jnp.float32)

    @pl.when(pq == 0)
    def _():
        acc[:] = part

    @pl.when(pq > 0)
    def _():
        acc[:] = acc[:] + part

    @pl.when(pq == P * P - 1)
    def _():
        h1 = jax.nn.relu(acc[:] + b1_ref[0]).astype(jnp.bfloat16)
        h2 = jnp.dot(h1, w2_ref[:], preferred_element_type=jnp.float32)
        o_ref[:] = jax.nn.relu(h2 + b2_ref[0]).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_hidden(pooled, w1, b1, w2, b2, interpret=False):
    """relu((relu(pooled @ w1 + b1)) @ w2 + b2) in one kernel, bf16/f32-acc."""
    # (P², M, C) layout so K-blocks are (1, BM, C); the transpose relayout
    # is charged to this variant (it replaces the flatten relayout of A).
    x = jnp.transpose(
        pooled.astype(jnp.bfloat16).reshape(M, P * P, C), (1, 0, 2)
    )
    w1r = w1.astype(jnp.bfloat16).reshape(P * P, C, H)
    return pl.pallas_call(
        _head_kernel,
        out_shape=jax.ShapeDtypeStruct((M, H), jnp.bfloat16),
        grid=(M // BM, P * P),
        in_specs=[
            pl.BlockSpec((1, BM, C), lambda m, p: (p, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, H), lambda m, p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda m, p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda m, p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda m, p: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, H), lambda m, p: (m, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BM, H), jnp.float32)],
        interpret=interpret,
    )(x, w1r, b1[None].astype(jnp.float32), w2.astype(jnp.bfloat16),
      b2[None].astype(jnp.float32))


def head_c(pooled, params):
    w1, b1, w2, b2, *t = params
    return tail(pallas_hidden(pooled, w1, b1, w2, b2), *t)


def bench_variant(name, fn, pooled, params):
    def make(chain):
        @jax.jit
        def run(p0):
            def body(carry, _):
                s, d = fn(p0 + carry * 1e-6, params)
                return carry + 1.0, s.sum() + d.sum()
            _, outs = jax.lax.scan(body, 0.0, None, length=chain)
            return outs.sum()
        return run

    lo, hi = make(CHAIN_LO), make(CHAIN_HI)
    float(lo(pooled)), float(hi(pooled))  # compile + warm

    def timed(fn):  # min over reps per chain, THEN difference (noise-robust)
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(fn(pooled))
            best = min(best, time.perf_counter() - t0)
        return best

    best = (timed(hi) - timed(lo)) / (CHAIN_HI - CHAIN_LO)
    gflop = 2 * M * (P * P * C * H + H * H + H * K * 5) / 1e9
    print(json.dumps({
        "variant": name, "ms": round(best * 1e3, 3),
        "tflops": round(gflop / best / 1e3, 1),
        "pct_peak": round(100 * gflop / best / 1e3 / 197, 1),
    }), flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    pooled = jnp.asarray(rng.normal(0, 1, (M, P, P, C)).astype(np.float32))
    params = make_params(rng)

    sa, da = head_a(pooled, params)
    for name, fn in [("einsum", head_b), ("pallas", head_c)]:
        s, d = fn(pooled, params)
        err = max(float(jnp.abs(s - sa).max()), float(jnp.abs(d - da).max()))
        scale = float(jnp.abs(sa).max())
        assert err <= 2e-2 * max(scale, 1.0), (name, err, scale)
        print(f"parity {name}: max abs err {err:.4f} (scale {scale:.1f})")

    for _ in range(2):  # interleaved A/B/C, twice, to expose drift
        for name, fn in [("reshape_dense", head_a), ("einsum", head_b),
                         ("pallas", head_c)]:
            bench_variant(name, fn, pooled, params)


if __name__ == "__main__":
    main()
