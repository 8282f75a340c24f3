from coin_tpu.parallel import mesh_utils  # noqa: F401
