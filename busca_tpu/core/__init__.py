from busca_tpu.core import boxes, kalman

__all__ = ["boxes", "kalman"]
