import jax

from pips_tpu.kernels.corr_pallas import corr_sample_pallas, sample_corr_onehot

# Platforms where the Mosaic/Pallas TPU kernels compile. "axon" is the
# tunneled TPU plugin backend; anything else (cpu, gpu, ...) must use the
# plain-XLA fallbacks — "not cpu" gating would crash on a GPU backend.
TPU_BACKENDS = ("tpu", "axon")


def fused_kernels_supported(devices=None) -> bool:
    """True iff the Mosaic/Pallas kernels can compile for the devices the
    computation will actually run on.

    Pass the mesh's devices (e.g. ``mesh.devices.flat``) whenever the
    computation is placed on an explicit device set: the process default
    backend can be a TPU plugin while the mesh lives on CPU devices (the
    driver's virtual-device dryrun), in which case gating on
    ``jax.default_backend()`` lowers pallas_call for CPU and dies with
    "Only interpret mode is supported on CPU backend".
    """
    if devices is not None:
        return all(d.platform in TPU_BACKENDS for d in devices)
    return jax.default_backend() in TPU_BACKENDS


__all__ = ["corr_sample_pallas", "sample_corr_onehot", "TPU_BACKENDS",
           "fused_kernels_supported"]
