from adsorbdiff_tpu.common.registry import registry
from adsorbdiff_tpu.common.config import load_config, build_config, merge_dicts

__all__ = ["registry", "load_config", "build_config", "merge_dicts"]
