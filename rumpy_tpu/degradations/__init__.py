from rumpy_tpu.registry import available_tools, get_tool, register_tool  # noqa: F401
from rumpy_tpu.degradations.pipeline import ImagePipeline, fused_degrade  # noqa: F401
