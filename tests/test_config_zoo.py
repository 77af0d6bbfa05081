"""Zoo-wide parity: every YAML in the IN-REPO ``configs/`` zoo (the full
196-file reference surface, reference src/configs/**) must load,
finalize, validate, and construct its G/D modules through the factory.

Gates the repo itself — no reference mount required."""

import glob
import os

from studiogan_tpu.config import Configurations
from studiogan_tpu.models import build_discriminator, build_generator

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPO_CONFIGS = sorted(glob.glob(os.path.join(_REPO, "configs", "**", "*.yaml"),
                                recursive=True))


def test_all_repo_configs_construct():
    assert len(REPO_CONFIGS) >= 196, (
        f"config zoo incomplete: {len(REPO_CONFIGS)} YAMLs shipped")
    failures = []
    for path in REPO_CONFIGS:
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
