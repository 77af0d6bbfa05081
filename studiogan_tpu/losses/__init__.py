from studiogan_tpu.losses.losses import *  # noqa: F401,F403
