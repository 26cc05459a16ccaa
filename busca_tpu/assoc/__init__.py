from busca_tpu.assoc.engine import AssociationEngine

__all__ = ["AssociationEngine"]
