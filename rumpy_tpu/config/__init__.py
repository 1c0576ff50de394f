from rumpy_tpu.config.loader import (
    NoneDict,
    load_config,
    to_none_dict,
    dump_toml,
    merge_overrides,
)
