"""TPU-native op library.

Replaces the reference's layer factories + CUDA kernels
(reference: src/utils/ops.py, src/utils/style_ops/).
"""

from studiogan_tpu.ops.layers import (  # noqa: F401
    Dense,
    Conv2d,
    ConvTranspose2d,
    Embedding,
    BatchNorm2d,
    ConditionalBatchNorm2d,
    SelfAttention,
    get_activation,
    make_initializer,
)
from studiogan_tpu.ops.upfirdn2d import (  # noqa: F401
    setup_filter,
    upfirdn2d,
    upsample2d,
    downsample2d,
    filter2d,
)
from studiogan_tpu.ops.bias_act import bias_act, activation_funcs  # noqa: F401
from studiogan_tpu.ops.filtered_lrelu import filtered_lrelu  # noqa: F401
