"""MetricLogger: metrics.json + optional TensorBoard event files
(reference writes CommonMetricPrinter/JSONWriter/TensorboardXWriter,
coin/utils/util.py:270-400; TB enabled via TPU.TENSORBOARD)."""

import glob
import json
import os

from coin_tpu.engine.common import MetricLogger


def test_json_and_tensorboard(tmp_path):
    d = str(tmp_path)
    m = MetricLogger(d, max_iter=100, period=2, tensorboard=True)
    for i in range(1, 7):
        m.log(i, {"loss_cls": 1.0 / i, "lr": 0.01})
    m.close()

    lines = [json.loads(x) for x in open(os.path.join(d, "metrics.json"))]
    assert [x["iteration"] for x in lines] == [2, 4, 6]
    # window means: iters (1,2) -> mean of 1, 1/2
    assert abs(lines[0]["loss_cls"] - 0.75) < 1e-6

    events = glob.glob(os.path.join(d, "events.out.tfevents.*"))
    assert events, "TensorBoard event file missing"
    assert os.path.getsize(events[0]) > 0


def test_tensorboard_off_by_default(tmp_path):
    d = str(tmp_path)
    m = MetricLogger(d, max_iter=10, period=1)
    m.log(1, {"loss": 1.0})
    m.close()
    assert not glob.glob(os.path.join(d, "events.out.tfevents.*"))


def test_residual_flush_stamped_with_last_logged_step(tmp_path):
    """The tail window must be stamped with the last step passed to
    log(), not the previous flush boundary (which would duplicate an
    existing iteration key and mislabel the tail means)."""
    d = str(tmp_path)
    m = MetricLogger(d, max_iter=100, period=4)
    for i in range(1, 7):  # flush at 4; residual window holds 5, 6
        m.log(i, {"loss": float(i)})
    m.close()
    lines = [json.loads(x) for x in open(os.path.join(d, "metrics.json"))]
    assert [x["iteration"] for x in lines] == [4, 6]
    assert abs(lines[1]["loss"] - 5.5) < 1e-6  # mean of steps 5, 6
