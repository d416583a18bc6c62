import time, sys, numpy as np
log = open("/root/repo/_diag_log.txt", "a", buffering=1)
def P(*a):
    print(*a, file=log); print(*a, flush=True)
import jax; jax.config.update('jax_platforms','cpu')   # CPU: isolate host cost
from acoss_tpu.data import make_synthetic_dataset
fs = make_synthetic_dataset(n_cliques=5, clique_size=2, n_states=400,
                            base_duration=40.0, beat_period=40.0, seed=42)
P("10 songs, med frames", int(np.median(fs.length('hpcp'))))
from acoss_tpu.benchmarking.algorithms import (Simple, TGAlg, ANFScattering,
                                               StrucFTM2D, StrucLaplacian,
                                               EarlyFusion)
for algo, name in [(Simple(chroma_type="hpcp"), "Simple"),
                   (TGAlg(), "TGAlg"),
                   (ANFScattering(), "ANFScattering"),
                   (StrucFTM2D(), "StrucFTM2D"),
                   (StrucLaplacian(), "StrucLaplacian"),
                   (EarlyFusion(), "EarlyFusion")]:
    t0=time.time()
    desc = algo.extract_descriptors(fs)
    P(f"{name}: desc {time.time()-t0:.1f}s for 10 songs")
