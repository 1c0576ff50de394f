from rumpy_tpu.registry import available_models, get_model, register_model  # noqa: F401
