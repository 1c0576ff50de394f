from rumpy_tpu.evaluation.eval_hub import EvalHub  # noqa: F401
