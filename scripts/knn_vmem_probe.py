"""Chip probe for the knn_mask scoped-VMEM fix (r4e queue failure).

The r4e hardware queue failed to compile the EarlySNF tile program:
Mosaic's kernel stack for `_knn_mask_kernel` needs ~90 bytes/element of
the row slab, and the old `_row_block` (16 B/elem estimate) OOMed the
16M scoped-vmem limit at n >= 896 (f32[128,896,896]: 18.07M;
f32[128,1024,1024]: 23.69M). This probe compiles + runs the kernel at
the two exact failing shapes and checks bit-equality against the XLA
rank-threshold path.

    python scripts/knn_vmem_probe.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main() -> int:
    sys.path.insert(0, ".")
    from acoss_tpu.ops import fusion
    from acoss_tpu.ops.crp_pallas import _row_block, knn_mask_matrix_batch

    rng = np.random.default_rng(0)
    ok = True
    for n in (896, 1024):
        rb, n_pad = _row_block(n)
        print(f"n={n}: rb={rb} n_pad={n_pad} "
              f"est_stack={rb * n * 96 / 2**20:.1f}M")
        B = 128
        W = rng.random((B, n, n), dtype=np.float32)
        W[rng.random((B, n, n)) < 0.1] = 0.5   # ties
        k = rng.integers(1, n, B).astype(np.int32)
        t0 = time.time()
        V = np.asarray(knn_mask_matrix_batch(jnp.asarray(W),
                                             jnp.asarray(k)))
        t1 = time.time()
        # XLA oracle on a few rows (full 128x n x n top_k is slow here)
        sel = rng.integers(0, B, 4)
        for b in sel:
            thresh = -np.asarray(fusion._kth_smallest(
                jnp.asarray(-W[b]), int(k[b]), int(k[b])))
            R = np.where(W[b] >= thresh, W[b], 0.0)
            if not np.array_equal(V[b], R):
                print(f"  MISMATCH at b={b}")
                ok = False
        print(f"  compile+run {t1 - t0:.1f}s; spot-check "
              f"{'OK' if ok else 'FAIL'}")
    print("PROBE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
