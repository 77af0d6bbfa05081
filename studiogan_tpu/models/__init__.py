"""Model zoo: 7 backbones with capability parity to reference src/models/."""

from studiogan_tpu.models.factory import build_generator, build_discriminator  # noqa: F401
