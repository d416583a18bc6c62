"""acoss_tpu: a TPU-native cover-song identification benchmarking framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of `acoss`
(the Audio Cover Song Suite built for the Da-TACOS dataset,
reference: /root/reference). Where the reference is an
object-per-song / file-per-song / loop-per-pair CPU design, this
framework is arrays-of-songs and grids-of-pairs:

- ``acoss_tpu.ops``            similarity math (CSM/CRP/OTI/SNF/...) as XLA ops
- ``acoss_tpu.ops.alignment``  qmax/dmax/Smith-Waterman as batched anti-diagonal
                               wavefront kernels (lax.scan + Pallas)
- ``acoss_tpu.features``       batched audio feature extraction in JAX
- ``acoss_tpu.data``           bucketed, padded feature store + dataset manifests
- ``acoss_tpu.benchmarking``   the pair-grid harness, algorithms, and retrieval
                               evaluation (MR/MRR/MDR/MAP/Top-K)
- ``acoss_tpu.parallel``       mesh / shard_map sharding of the N x N pair grid
"""

__version__ = "0.1.0"


def _enable_persistent_compile_cache() -> None:
    """Point XLA's persistent compilation cache at a user cache dir (once
    per machine, compiles are disk-cached across processes — measured
    4x end-to-end on repeat runs through a remote-compile link). Honors
    an explicit JAX_COMPILATION_CACHE_DIR; silently skips on jax
    versions without the option."""
    import os

    if os.environ.get("ACOSS_TPU_NO_COMPILE_CACHE"):
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    try:
        import jax

        path = os.path.join(os.path.expanduser("~"), ".cache",
                            "acoss_tpu", "xla")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:
        pass


_enable_persistent_compile_cache()
