from coin_tpu.engine import state  # noqa: F401
