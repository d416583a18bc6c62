"""Benchmark: Qmax pair-alignment throughput, TPU vs single-core CPU C++.

Prints ONE JSON line:
  {"metric": "qmax_pairs_per_sec_per_chip", "value": ..., "unit":
   "song-pairs/sec/chip", "vs_baseline": ...}

vs_baseline is the multiplier over the native single-core C++ qmax baseline
(the analog of the reference's Cython/C kernel,
`/root/reference/benchmarking/SequenceAlignment.c:113-143`), measured in
this same process on the same CRP workload. BASELINE.md target: >= 50x.

Workload: covers80-scale binary CRPs — L = 512 padded frames (a ~3.5-minute
song at hop 512 downsampled x40 gives ~430 frames), kappa = 0.095 mutual-kNN
density, ragged lengths drawn from [320, 512].
"""

import json
import os
import sys
import time

import numpy as np

L = 512            # padded CRP side
BATCH = 512        # pairs per device call
CPU_PAIRS = 12     # pairs timed for the CPU baseline
KAPPA = 0.095


def make_crps(rng, batch, L):
    """Random binary CRPs with mutual-kNN-like density and ragged sizes."""
    m_len = rng.integers(320, L + 1, size=batch).astype(np.int32)
    n_len = rng.integers(320, L + 1, size=batch).astype(np.int32)
    S = np.zeros((batch, L, L), dtype=np.uint8)
    for b in range(batch):
        m, n = m_len[b], n_len[b]
        # roughly kappa-fraction of entries on, band-structured like a CRP
        density = KAPPA
        Sb = (rng.random((m, n)) < density).astype(np.uint8)
        S[b, :m, :n] = Sb
    return S, m_len, n_len


def main():
    rng = np.random.default_rng(0)
    S, m_len, n_len = make_crps(rng, BATCH, L)

    # --- CPU baseline: native single-core C++ (rolling-row qmax).
    from acoss_tpu import native
    native.qmax_cpu(S[0, :64, :64])  # warm the .so build
    t0 = time.perf_counter()
    for b in range(CPU_PAIRS):
        native.qmax_cpu(S[b, :m_len[b], :n_len[b]])
    cpu_time = time.perf_counter() - t0
    cpu_pps = CPU_PAIRS / cpu_time

    # --- TPU: batched wavefront qmax.
    import jax
    from acoss_tpu.ops.alignment import qmax_batch

    # Timing protocol: the tunneled device caches identical executions and
    # its block_until_ready is unreliable, so every timed call gets DISTINCT
    # input buffers and the timed region includes a host read of the result.
    n_iters = 3
    variants = [jax.device_put(np.roll(S, k, axis=0))
                for k in range(n_iters + 1)]
    ml = jax.device_put(m_len)
    nl = jax.device_put(n_len)
    _ = np.asarray(qmax_batch(variants[0], ml, nl))  # compile + warm
    t0 = time.perf_counter()
    for k in range(1, n_iters + 1):
        out = qmax_batch(variants[k], ml, nl)
        _ = np.asarray(out)
    tpu_time = (time.perf_counter() - t0) / n_iters
    tpu_pps = BATCH / tpu_time
    out = qmax_batch(jax.device_put(S), ml, nl)

    # Sanity: TPU and CPU agree on the scored pairs.
    cpu_scores = np.array([
        native.qmax_cpu(S[b, :m_len[b], :n_len[b]]) for b in range(4)])
    np.testing.assert_allclose(np.asarray(out)[:4], cpu_scores, atol=1e-3)

    result = {
        "metric": "qmax_pairs_per_sec_per_chip",
        "value": round(tpu_pps, 2),
        "unit": "song-pairs/sec/chip",
        "vs_baseline": round(tpu_pps / cpu_pps, 2),
    }
    print(json.dumps(result))
    print(f"# CPU baseline: {cpu_pps:.1f} pairs/s (1 core); "
          f"TPU: {tpu_pps:.1f} pairs/s; device={jax.devices()[0]}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
