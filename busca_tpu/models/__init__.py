from busca_tpu.models import encodings

# Heavier modules (busca, reid, transformer, yolox, convert, checkpoint) are
# imported directly by consumers to keep `import busca_tpu` light.
__all__ = ["encodings"]
