from busca_tpu.ops import crop, deform, ecc, lap, nms

__all__ = ["crop", "deform", "ecc", "lap", "nms"]
