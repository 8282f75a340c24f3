from coin_tpu.data.voc import (load_voc_instances, register_pascal_voc,
                               DATASET_REGISTRY, get_dataset,
                               register_all_builtin)  # noqa: F401
from coin_tpu.data.loader import (TestLoader, TrainLoader,
                                  Batch)  # noqa: F401
