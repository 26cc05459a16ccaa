from busca_tpu.assoc.bank import BankedCrop, DeviceCropBank
from busca_tpu.assoc.engine import AssociationEngine

__all__ = ["AssociationEngine", "BankedCrop", "DeviceCropBank"]
