from studiogan_tpu.parallel.mesh import setup_runtime, Runtime  # noqa: F401
