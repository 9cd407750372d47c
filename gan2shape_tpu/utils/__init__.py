from gan2shape_tpu.utils.config import load_config, create_results_folder

__all__ = ["load_config", "create_results_folder"]
