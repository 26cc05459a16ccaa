from busca_tpu.ops import crop

__all__ = ["crop"]
