from rumpy_tpu.data.datasets import SuperResImages  # noqa: F401
from rumpy_tpu.data.loader import DataLoader, sisr_data_setup  # noqa: F401
