"""dmax follow-up experiment (VERDICT r4 item 8): one more idea, then
close.

The suggested int8/int16 SIDECAR for the S-accumulating carries does
not decompose: dmax's v/w carries are p2 = D[i-2]*sh1 + S[i-1] and
p4 = D[i-3]*sh1 + S[i-2] + S[i-1] — fp32 DP values with the integer S
accumulation RIDING ON TOP, so there is no int-only stream to split
out without re-materializing the D part each row (more work, not
less). What IS testable is the per-row S load conversion: the kernel
converts the uint8 CRP row via `.astype(int32).astype(float32)` (two
VPU converts); this probe measures a variant with the direct
uint8 -> float32 convert and a variant reading the row as a
pre-converted fp32 input stream (4x the HBM/VMEM traffic, zero
converts), against the shipped kernel.

    python scripts/dmax_conv_probe.py
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from acoss_tpu.ops import alignment_pallas as ap

NITER = 7


def _dmax_kernel_direct(T, gap, s_ref, out_ref, A1, V, W, bestv):
    """`ap._dmax_kernel` with sd = s.astype(float32) directly."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        z = jnp.zeros_like(bestv)
        for ref in (A1, V, W, bestv):
            ref[:] = z

    ii = jax.lax.broadcasted_iota(jnp.int32, bestv.shape, 0)
    colbias = jnp.where(ii >= 3, -gap, -ap._BIG)

    def row(k, carry):
        a1, v, w, bv = carry
        sd = s_ref[0, k].astype(jnp.float32)   # <-- the one change
        s1 = pltpu.roll(sd, 1, 0)
        a2 = pltpu.roll(a1, 1, 0)
        p3 = a2 + s1
        p5 = pltpu.roll(p3, 1, 0) + s1
        m5 = jnp.maximum(jnp.maximum(jnp.maximum(a1, v), p3),
                         jnp.maximum(w, p5))
        rowbias = jnp.where(t * T + k >= 3, 0.0, -ap._BIG)
        Dd = jnp.maximum(
            m5 + ((1.0 + gap) * sd + (colbias + rowbias)), 0.0)
        return (pltpu.roll(Dd, 1, 0), a1 + sd, v + sd,
                jnp.maximum(bv, Dd))

    def body(kk, carry):
        for u in range(ap._UNROLL):
            carry = row(kk * ap._UNROLL + u, carry)
        return carry

    (A1[:], V[:], W[:], bestv[:]) = jax.lax.fori_loop(
        0, T // ap._UNROLL, body, (A1[:], V[:], W[:], bestv[:]))

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = jnp.max(bestv[:], axis=0, keepdims=True)[None]


@functools.partial(jax.jit, static_argnames=("gap",))
def dmax_direct(S, m_len, n_len, gap: float = 0.5):
    return ap._run(functools.partial(_dmax_kernel_direct, 64, gap), 4,
                   S, m_len, n_len, 4, 128, 64, False)


def amortized(make, args, reps=3):
    f1, fn = make(1), make(NITER)
    _ = float(f1(*args))
    _ = float(fn(*args))
    vals = []
    for _i in range(reps):
        t0 = time.perf_counter()
        _ = float(f1(*args))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(fn(*args))
        tn = time.perf_counter() - t0
        vals.append(max(tn - t1, 1e-9) / (NITER - 1))
    return float(np.median(vals))


def main() -> int:
    rng = np.random.default_rng(0)
    B, L = 512, 512
    m_len = rng.integers(320, L + 1, B).astype(np.int32)
    n_len = rng.integers(320, L + 1, B).astype(np.int32)
    S = np.zeros((B, L, L), np.uint8)
    for b in range(B):
        S[b, :m_len[b], :n_len[b]] = (
            rng.random((m_len[b], n_len[b])) < 0.095)
    Sd, ml, nl = jax.device_put((S, m_len, n_len))

    base = np.asarray(ap.dmax_batch_pallas(Sd, ml, nl))
    direct = np.asarray(dmax_direct(Sd, ml, nl))
    ok = bool(np.allclose(base, direct, atol=1e-3))

    def mk(fn):
        def make(n):
            @jax.jit
            def many(S, a, b):
                def body(c, k):
                    return c + jnp.sum(fn(jnp.roll(S, k, 0),
                                          jnp.roll(a, k), b)), None
                c, _ = jax.lax.scan(body, 0.0, jnp.arange(n))
                return c
            return many
        return make

    t_base = amortized(mk(ap.dmax_batch_pallas), (Sd, ml, nl))
    t_dir = amortized(mk(dmax_direct), (Sd, ml, nl))
    print(json.dumps({
        "pairs": B, "L": L, "direct_matches": ok,
        "base_pairs_per_s": round(B / t_base, 1),
        "direct_pairs_per_s": round(B / t_dir, 1),
        "speedup": round(t_base / t_dir, 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
