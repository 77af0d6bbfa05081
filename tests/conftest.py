"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the JAX analog of a fake distributed backend (which the
reference lacks entirely — SURVEY.md §4): sharding/collective code paths
are exercised for real on 8 virtual devices without TPU hardware.
"""

import os

# Force CPU even if a site customization already imported jax with
# JAX_PLATFORMS pointing at real hardware (the env var is captured at jax
# import time, so os.environ alone is not enough — the config update below
# works as long as no backend has initialized yet).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + str(jax.devices()[:1]))

jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: full-train-step XLA compiles are minutes on CPU;
# cache them across pytest runs.  Lives inside the repo (gitignored) so it
# survives environment /tmp resets across build rounds.
_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# Tests run without pretrained eval-backbone weights by design — allow
# untagged scores suite-wide; the guardrail itself is covered explicitly
# in test_metrics.TestEvaluatorEndToEnd (which pops this var).
os.environ.setdefault("STUDIOGAN_ALLOW_RANDOM_BACKBONE", "1")
