"""Training engine: one SPMD jitted step replaces the reference's
WORKER + DP/DDP machinery (reference src/worker.py:59-681)."""

from studiogan_tpu.train.state import GANTrainState  # noqa: F401
from studiogan_tpu.train.engine import TrainEngine  # noqa: F401
