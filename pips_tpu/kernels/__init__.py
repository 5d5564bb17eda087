import jax

from pips_tpu.kernels.corr_pallas import corr_sample_pallas, sample_corr_onehot

# Platforms where the Mosaic/Pallas TPU kernels compile. "axon" is the
# tunneled TPU plugin backend; anything else (cpu, gpu, ...) must use the
# plain-XLA fallbacks — "not cpu" gating would crash on a GPU backend.
TPU_BACKENDS = ("tpu", "axon")


def fused_kernels_supported() -> bool:
    return jax.default_backend() in TPU_BACKENDS


__all__ = ["corr_sample_pallas", "sample_corr_onehot", "TPU_BACKENDS",
           "fused_kernels_supported"]
