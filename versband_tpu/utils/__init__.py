from versband_tpu.utils.config import (
    Config,
    instantiate_from_config,
    get_obj_from_str,
    load_config,
    merge_configs,
    apply_dot_overrides,
)
