from coin_tpu.ops import boxes, losses, matcher, nms  # noqa: F401
