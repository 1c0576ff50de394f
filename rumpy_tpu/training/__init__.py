from rumpy_tpu.training.trainer import TrainingHandler  # noqa: F401
