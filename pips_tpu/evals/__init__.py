from pips_tpu.evals.metrics import ate_metrics, pck_at_sqrt_area, per_seq_vis_label

__all__ = ["ate_metrics", "pck_at_sqrt_area", "per_seq_vis_label"]
