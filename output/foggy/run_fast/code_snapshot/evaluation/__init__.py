from coin_tpu.evaluation.voc_eval import (VOCEvaluator, voc_ap,
                                          voc_eval_class)  # noqa: F401
from coin_tpu.evaluation.testing import (print_csv_format,
                                         verify_results)  # noqa: F401
