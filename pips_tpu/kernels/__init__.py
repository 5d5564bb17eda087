from pips_tpu.kernels.corr_pallas import corr_sample_pallas, sample_corr_onehot

__all__ = ["corr_sample_pallas", "sample_corr_onehot"]
