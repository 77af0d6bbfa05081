from studiogan_tpu.data.datasets import Dataset_  # noqa: F401
from studiogan_tpu.data.pipeline import BasketLoader  # noqa: F401
