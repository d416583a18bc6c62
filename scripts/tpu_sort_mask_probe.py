"""Probe for the TPU backend sort-operand fusion fault.

Round-4 diagnosis (RESULTS.md "TPU-worker kernel-fault diagnosis"): an
iota-`jnp.where` mask fused into a `jnp.sort` operand kernel-faults the
TPU worker at some 4-D small-minor-dim shapes — reproduced at
(B=12, L=16400, d=12), fac=40, with random inputs in a fresh process.
`ops/segment.uniform_downsample_batch` works around it by pre-filling
the host staging buffer with +inf so the compiled median program is
reshape-sort-gather with no mask.

Run this when the backend/jax version changes to see whether the
underlying fault is fixed (each variant in a separate process — a
worker crash kills the whole client backend):

    python scripts/tpu_sort_mask_probe.py            # orchestrates
    python scripts/tpu_sort_mask_probe.py masksort   # one variant

Variants: masksort (the faulting pattern), sortgather (the workaround's
program), mean, sort_only, gather_only (all historically clean).
"""

from __future__ import annotations

import functools
import subprocess
import sys

VARIANTS = ("masksort", "sortgather", "sort_only", "gather_only", "mean")
B, L, D, FAC = 12, 16400, 12, 40


def run_variant(mode: str) -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("fac", "agg"))
    def down(X, lengths, fac, agg):
        Bs, Lp, d = X.shape
        nseg = Lp // fac
        W = X.reshape(Bs, nseg, fac, d)
        k = jnp.arange(nseg)[None, :]
        c = jnp.clip(lengths[:, None] - k * fac, 0, fac)
        if agg == "mean":
            return jnp.sum(W, axis=2) / jnp.maximum(c, 1)[..., None]
        if agg == "sort_only":
            return jnp.sort(W, axis=2)[:, :, 0]
        if agg == "gather_only":
            cc = jnp.maximum(c, 1)
            return jnp.take_along_axis(
                W, ((cc - 1) // 2)[..., None, None], axis=2)[:, :, 0]
        if agg == "masksort":
            masked = jnp.where(jnp.arange(fac)[None, None, :, None]
                               < c[..., None, None], W, 1e30)
            return jnp.sort(masked, axis=2)[:, :, 0]
        if agg == "sortgather":
            srt = jnp.sort(W, axis=2)
            cc = jnp.maximum(c, 1)
            lo = jnp.take_along_axis(
                srt, ((cc - 1) // 2)[..., None, None], axis=2)[:, :, 0]
            hi = jnp.take_along_axis(
                srt, (cc // 2)[..., None, None], axis=2)[:, :, 0]
            return 0.5 * (lo + hi)
        raise ValueError(agg)

    rng = np.random.default_rng(0)
    Lpad = -(-L // FAC) * FAC
    X = rng.random((B, Lpad, D), dtype=np.float32)
    lens = np.full(B, L, np.int32)
    Y = np.asarray(down(X, lens, FAC, mode))
    print(f"{mode} B={B} L={L} d={D} OK {Y.shape}", flush=True)
    return 0


def main() -> int:
    if len(sys.argv) > 1:
        return run_variant(sys.argv[1])
    results = {}
    for mode in VARIANTS:
        print(f"=== {mode}", flush=True)
        p = subprocess.run([sys.executable, __file__, mode],
                           capture_output=True, text=True, timeout=600)
        ok = f"{mode} B={B}" in p.stdout
        results[mode] = "OK" if ok else "FAULT/HANG"
        print(p.stdout.strip() or p.stderr.strip()[-200:], flush=True)
    print("\nsummary:", results)
    if results.get("masksort") == "OK":
        print("masked sort no longer faults: the segment.down host-fill "
              "workaround can be retired (keep the equality tests).")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
