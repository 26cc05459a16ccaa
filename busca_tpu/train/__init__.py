from busca_tpu.train import data, trainer

__all__ = ["data", "trainer"]
