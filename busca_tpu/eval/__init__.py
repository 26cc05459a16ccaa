from busca_tpu.eval import metrics, mot

__all__ = ["metrics", "mot"]
