from coin_tpu.utils.setup import default_setup, seed_all  # noqa: F401
from coin_tpu.utils.profiling import (IterationTimer,
                                      trace_context)  # noqa: F401
