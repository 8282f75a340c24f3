from coin_tpu.solver.build import (build_optimizer, two_stage_lr_schedule,
                                   lr_multiplier_for_path)  # noqa: F401
