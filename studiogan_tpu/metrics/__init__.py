"""Metrics & evaluation (capability parity with reference src/metrics/).

8 metrics: IS, FID, improved precision & recall, density & coverage,
intra-class FID, CAS (GAN_train/GAN_test), plus top-1/top-5 accuracy of
the eval backbone; 'legacy'/'clean'/'friendly' resizer semantics.
"""

from studiogan_tpu.metrics.preparation import Evaluator, LoadEvalModel  # noqa: F401
from studiogan_tpu.metrics import fid, ins, prdc, features  # noqa: F401
