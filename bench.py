"""Benchmark: Qmax pair-alignment throughput, TPU vs single-core CPU C++.

Prints ONE JSON line:
  {"metric": "qmax_pairs_per_sec_per_chip", "value": ..., "unit":
   "song-pairs/sec/chip", "vs_baseline": ...,
   "serra09_scored_pairs_per_sec": ...}

The extra `serra09_scored_pairs_per_sec` field is the FULLY-SCORED
end-to-end rate (OTI -> CSM -> CRP -> qmax+dmax on 2 channels per pair)
so the driver record tracks sweep throughput, not just the bare kernel.

vs_baseline is the multiplier over the native single-core C++ qmax baseline
(the analog of the reference's Cython/C kernel,
`/root/reference/benchmarking/SequenceAlignment.c:113-143`), measured in
this same process on the same CRP workload. BASELINE.md target: >= 50x.

Workload: covers80-scale binary CRPs — L = 512 padded frames (a ~3.5-minute
song at hop 512 downsampled x40 gives ~430 frames), kappa = 0.095 mutual-kNN
density, ragged lengths drawn from [320, 512].

Timing protocol: this environment reaches the TPU through a tunnel with
~30 ms RTT per dispatch and it caches identical executions, so the kernel
is timed AMORTIZED: one jitted call runs the aligner over `NITER` distinct
on-device-generated input variants (lax.scan over rolled batches); per-call
time = (T(NITER) - T(1)) / (NITER - 1), which cancels the RTT and any fixed
dispatch overhead.
"""

import json
import sys
import time

import numpy as np

L = 512            # padded CRP side
BATCH = 512        # pairs per device call
CPU_PAIRS = 12     # pairs timed for the CPU baseline
KAPPA = 0.095
NITER = 9
REPEATS = 7        # median-of-k readings; spread reported alongside


def make_crps(rng, batch, L):
    """Random binary CRPs with mutual-kNN-like density and ragged sizes."""
    m_len = rng.integers(320, L + 1, size=batch).astype(np.int32)
    n_len = rng.integers(320, L + 1, size=batch).astype(np.int32)
    S = np.zeros((batch, L, L), dtype=np.uint8)
    for b in range(batch):
        m, n = m_len[b], n_len[b]
        S[b, :m, :n] = (rng.random((m, n)) < KAPPA).astype(np.uint8)
    return S, m_len, n_len


def _wait_for_backend(max_wait: float = 900.0,
                      probe_timeout: float = 90.0) -> None:
    """The tunnel TPU backend can be transiently unavailable, and its
    init path can HANG indefinitely (observed: a retry loop sleeping in
    the plugin). Probe `jax.devices()` in a SUBPROCESS with a bound —
    a hung in-process probe would wedge jax's backend lock for good —
    and retry up to `max_wait`; on exhaustion, emit a diagnostic JSON
    line and exit nonzero instead of hanging the driver."""
    import subprocess

    deadline = time.time() + max_wait
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout, capture_output=True)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            print(json.dumps({
                "metric": "qmax_pairs_per_sec_per_chip", "value": 0.0,
                "unit": "song-pairs/sec/chip", "vs_baseline": 0.0,
                "error": f"TPU backend unavailable/hung for {max_wait:.0f}s"}))
            sys.exit(1)
        print("# TPU backend unavailable, retrying ...", file=sys.stderr)
        time.sleep(15.0)


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

    # --- TPU: Pallas row-streaming qmax, amortized timing.
    _wait_for_backend()
    import jax
    import jax.numpy as jnp

    from acoss_tpu.ops.alignment import qmax_batch_best

    def amortized(niter):
        @jax.jit
        def many(S, ml, nl):
            def body(c, k):
                Sk = jnp.roll(S, k, axis=0)  # distinct input per iteration
                return c + jnp.sum(qmax_batch_best(Sk, ml, nl)), None
            c, _ = jax.lax.scan(body, 0.0, jnp.arange(niter))
            return c
        return many

    Sd, ml, nl = jax.device_put((S, m_len, n_len))
    f1, fn = amortized(1), amortized(NITER)
    _ = float(f1(Sd, ml, nl))
    _ = float(fn(Sd, ml, nl))
    # median-of-k with spread (VERDICT r4: one reading hid an 8%
    # round-to-round swing); each repeat yields an independent
    # amortized rate, the median is the headline
    rates = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        _ = float(f1(Sd, ml, nl))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(fn(Sd, ml, nl))
        tn = time.perf_counter() - t0
        rates.append(BATCH * (NITER - 1) / max(tn - t1, 1e-9))
    tpu_pps = float(np.median(rates))
    spread_pct = 100.0 * (max(rates) - min(rates)) / tpu_pps

    # Sanity: TPU and CPU agree on the scored pairs — for ALL THREE
    # alignment kernels (this runs on real hardware every round).
    from acoss_tpu.ops.alignment import (dmax_batch_best,
                                         swconstrained_batch_best)
    out = np.asarray(qmax_batch_best(Sd, ml, nl))
    np.testing.assert_allclose(
        out[:4], [native.qmax_cpu(S[b, :m_len[b], :n_len[b]])
                  for b in range(4)], atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(dmax_batch_best(Sd, ml, nl))[:4],
        [native.dmax_cpu(S[b, :m_len[b], :n_len[b]]) for b in range(4)],
        atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(swconstrained_batch_best(Sd, ml, nl))[:4],
        [native.swconstrained_cpu(S[b, :m_len[b], :n_len[b]])
         for b in range(4)], atol=1e-3)

    result = {
        "metric": "qmax_pairs_per_sec_per_chip",
        "value": round(tpu_pps, 2),
        "unit": "song-pairs/sec/chip",
        "vs_baseline": round(tpu_pps / cpu_pps, 2),
        "readings_k": REPEATS,
        "spread_pct": round(spread_pct, 1),
    }

    # --- end-to-end metric: FULLY-SCORED Serra09 tile throughput (OTI ->
    # CSM -> sliding window -> mutual-kNN CRP -> qmax + dmax, 2 channels)
    # at covers80-realistic descriptor dims — the sweep rate a user sees,
    # not just the bare kernel. Recorded alongside the primary metric so
    # the driver tracks it across rounds (VERDICT r3 item 7).
    try:
        s_pps, s_spread = _serra09_scored_pps(jax, jnp)
        result["serra09_scored_pairs_per_sec"] = round(s_pps, 2)
        result["serra09_spread_pct"] = round(s_spread, 1)
    except Exception as e:                      # never mask the headline
        result["serra09_error"] = f"{type(e).__name__}: {e}"

    print(json.dumps(result))
    print(f"# CPU baseline: {cpu_pps:.1f} pairs/s (1 core); "
          f"TPU: {tpu_pps:.1f} pairs/s; device={jax.devices()[0]}",
          file=sys.stderr)


def _serra09_scored_pps(jax, jnp, tile: int = 16,
                        niter: int = 5) -> tuple[float, float]:
    """Amortized (median pairs/s, spread %) of the full Serra09 tile
    program.

    32 synthetic songs at covers80-realistic CRP dims (descriptor
    lengths 160-480 -> padded 512, matching the headline L=512 qmax
    workload); one jitted call scores `niter` rolled row-tile variants
    so the tunnel RTT and dispatch overhead cancel exactly like the
    kernel metric."""
    from acoss_tpu.benchmarking.algorithms import Serra09
    from acoss_tpu.data import make_synthetic_dataset

    fs = make_synthetic_dataset(n_cliques=tile, clique_size=2, seed=1)
    algo = Serra09(chroma_type="hpcp", downsample_fac=1)
    desc = algo.extract_descriptors(fs)
    row = jax.device_put({k: np.asarray(v)[:tile] for k, v in desc.items()})
    col = jax.device_put({k: np.asarray(v)[tile:2 * tile]
                          for k, v in desc.items()})

    def amortized(n):
        @jax.jit
        def many(row, col):
            def body(c, k):
                rk = {kk: jnp.roll(v, k, axis=0) for kk, v in row.items()}
                out = algo.tile_scores(rk, col)
                return c + sum(jnp.sum(v) for v in out.values()), None
            c, _ = jax.lax.scan(body, 0.0, jnp.arange(n))
            return c
        return many

    f1, fn = amortized(1), amortized(niter)
    _ = float(f1(row, col))
    _ = float(fn(row, col))
    rates = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        _ = float(f1(row, col))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(fn(row, col))
        tn = time.perf_counter() - t0
        rates.append(tile * tile * (niter - 1) / max(tn - t1, 1e-9))
    med = float(np.median(rates))
    return med, 100.0 * (max(rates) - min(rates)) / med


if __name__ == "__main__":
    main()
