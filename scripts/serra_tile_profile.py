"""Serra09 tile decomposition + fused-binarizer variant A/B on chip.

The VERDICT r4 gap: fully-scored Serra09 is ~16k pairs/s vs ~320k for
the bare qmax — this script measures WHERE the tile time goes at the
bench workload dims (L=512, d=12 chroma / 13 mfcc) and A/Bs the
binarizer's `dual` search layout (both per-iteration rank counts
reduced along the sublane axis from a transposed copy) against the
baseline.

    python scripts/serra_tile_profile.py [--pairs 256] [--reps 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

KAPPA = 0.095
NITER = 7


def amortized(fn1, fnN, args, reps):
    """Median amortized seconds/call over `reps` readings. float()
    forces the readback so each timing spans the full execution (the
    jitted fns return a scalar reduction precisely for this)."""
    _ = float(fn1(*args))
    _ = float(fnN(*args))
    vals = []
    for _i in range(reps):
        t0 = time.perf_counter()
        _ = float(fn1(*args))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(fnN(*args))
        tn = time.perf_counter() - t0
        vals.append(max(tn - t1, 1e-9) / (NITER - 1))
    return float(np.median(vals))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=256)
    ap.add_argument("--L", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from acoss_tpu.ops.alignment import dmax_batch_best, qmax_batch_best
    from acoss_tpu.ops.crp_pallas import fused_binary_crp_batch

    B, L = args.pairs, args.L
    rng = np.random.default_rng(0)
    X = rng.random((B, L, 12), dtype=np.float32)
    Y = rng.random((B, L, 12), dtype=np.float32)
    l1 = rng.integers(320, L + 1, B).astype(np.int32)
    l2 = rng.integers(320, L + 1, B).astype(np.int32)
    Xd, Yd, l1d, l2d = jax.device_put((X, Y, l1, l2))

    out = {"pairs": B, "L": L}

    # --- binarizer variants (CSM + sliding + mutual-kNN, m=9)
    def bin_many(n, dual):
        @jax.jit
        def f(X, Y, l1, l2):
            def body(c, k):
                S, _, _ = fused_binary_crp_batch(
                    jnp.roll(X, k, 0), Y, jnp.roll(l1, k), l2,
                    kappa=KAPPA, m=9, dual=dual)
                return c + jnp.sum(S.astype(jnp.int32)), None
            c, _ = jax.lax.scan(body, 0, jnp.arange(n))
            return c
        return f

    for dual in (False, True):
        sec = amortized(bin_many(1, dual), bin_many(NITER, dual),
                        (Xd, Yd, l1d, l2d), args.reps)
        key = "binarize_dual_ms" if dual else "binarize_base_ms"
        out[key] = round(sec * 1e3, 2)
    # equality on chip (not just interpret mode)
    S0 = np.asarray(fused_binary_crp_batch(Xd, Yd, l1d, l2d,
                                           kappa=KAPPA, m=9)[0])
    S1 = np.asarray(fused_binary_crp_batch(Xd, Yd, l1d, l2d,
                                           kappa=KAPPA, m=9,
                                           dual=True)[0])
    out["dual_bit_identical"] = bool(np.array_equal(S0, S1))

    # --- aligners on the produced CRPs
    Sd = jax.device_put(S0)
    l1e = jnp.maximum(l1d - 8, 0)
    l2e = jnp.maximum(l2d - 8, 0)

    def align_many(n, fn):
        @jax.jit
        def f(S, a, b):
            def body(c, k):
                return c + jnp.sum(fn(jnp.roll(S, k, 0),
                                      jnp.roll(a, k), b)), None
            c, _ = jax.lax.scan(body, 0.0, jnp.arange(n))
            return c
        return f

    for nm, fn in (("qmax", qmax_batch_best), ("dmax", dmax_batch_best)):
        sec = amortized(align_many(1, fn), align_many(NITER, fn),
                        (Sd, l1e, l2e), args.reps)
        out[f"{nm}_ms"] = round(sec * 1e3, 2)

    # derived: fully-scored tile estimate (2 channels x binarize + q + d)
    base = 2 * (out["binarize_base_ms"] + out["qmax_ms"] + out["dmax_ms"])
    dualt = 2 * (out["binarize_dual_ms"] + out["qmax_ms"] + out["dmax_ms"])
    out["est_tile_base_ms"] = round(base, 2)
    out["est_tile_dual_ms"] = round(dualt, 2)
    out["est_scored_pps_base"] = round(B / base * 1e3, 1)
    out["est_scored_pps_dual"] = round(B / dualt * 1e3, 1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
