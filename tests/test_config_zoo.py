"""Zoo-wide parity: every shipped reference YAML must load, finalize,
validate, and construct its G/D modules through the factory."""

import glob

import pytest

from studiogan_tpu.config import Configurations
from studiogan_tpu.models import build_discriminator, build_generator

REF_CONFIGS = sorted(glob.glob("/root/reference/src/configs/**/*.yaml",
                               recursive=True))


@pytest.mark.skipif(not REF_CONFIGS, reason="reference configs not mounted")
def test_all_reference_configs_construct():
    assert len(REF_CONFIGS) > 150
    failures = []
    for path in REF_CONFIGS:
        try:
            cfg = Configurations(path)
            cfg.RUN.train = True
            cfg.finalize(world_size=1)
            cfg.check_compatability()
            G = build_generator(cfg)
            D = build_discriminator(cfg)
            assert G is not None and D is not None
        except Exception as e:  # noqa: BLE001
            failures.append((path.split("configs/")[-1], repr(e)[:200]))
    assert not failures, "\n".join(f"{p}: {e}" for p, e in failures)
