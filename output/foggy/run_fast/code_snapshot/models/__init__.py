from coin_tpu.models import clip_resnet  # noqa: F401
