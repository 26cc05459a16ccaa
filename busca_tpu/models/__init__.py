from busca_tpu.models import encodings

__all__ = ["encodings"]
