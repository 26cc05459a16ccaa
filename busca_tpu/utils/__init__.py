from busca_tpu.utils.memory import get_ram_usage

__all__ = ["get_ram_usage"]
