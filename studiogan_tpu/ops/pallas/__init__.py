"""Pallas TPU kernels — the native-code parity targets for the
reference's CUDA ops (src/utils/style_ops/*.cu)."""

from studiogan_tpu.ops.pallas.filtered_lrelu_kernel import (  # noqa: F401
    filtered_lrelu_pallas,
)
from studiogan_tpu.ops.pallas.bias_act_kernel import bias_act_pallas  # noqa: F401
