import time, numpy as np, json, sys
sys.stdout = open("/root/repo/_allalgos_log.txt", "a", buffering=1)
import jax, jax.numpy as jnp
from acoss_tpu.data import make_synthetic_dataset
from acoss_tpu.benchmarking.harness import benchmark
from acoss_tpu.benchmarking.algorithms import (Simple, TGAlg, ANFScattering,
                                               StrucFTM2D, StrucShingles,
                                               StrucLaplacian, EarlyFusion)
fs = make_synthetic_dataset(n_cliques=80, clique_size=2, n_states=400,
                            base_duration=40.0, beat_period=40.0, seed=42)
print(f"songs: {fs.n_songs}, med frames {int(np.median(fs.length('hpcp')))}",
      flush=True)
t0=time.time(); _=float(jnp.zeros(8).sum())
print(f"warmup {time.time()-t0:.0f}s", flush=True)
for algo, name in [
    (Simple(chroma_type="hpcp"), "Simple"),
    (TGAlg(), "TGAlg"),
    (ANFScattering(), "ANFScattering"),
    (StrucFTM2D(), "StrucFTM2D"),
    (StrucLaplacian(), "StrucLaplacian"),
    (EarlyFusion(), "EarlyFusion"),
]:
    try:
        t0 = time.time()
        stats = benchmark(algo, fs)
        dt = time.time() - t0
        tops = " ".join(f"{k}:MAP={s.map:.3f}" for k, s in stats.items())
        print(f"{name}: {dt:.1f}s -> {tops}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
