from busca_tpu.config.options import (
    load_args_from_config,
    merge_args,
    load_tracker_bundle,
)

__all__ = ["load_args_from_config", "merge_args", "load_tracker_bundle"]
