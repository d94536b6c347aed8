"""Metrics logging + TB/jsonl export round trip (ConvertLog counterpart)."""

import os

import numpy as np

from learning_embeddings_tpu.train.experiment import (
    ExperimentDir,
    MetricsLogger,
)
from learning_embeddings_tpu.utils.tblog import (
    export_plots,
    read_jsonl_scalars,
    read_scalars,
)


def test_jsonl_roundtrip_and_export(tmp_path):
    exp = ExperimentDir(str(tmp_path), "e1")
    logger = MetricsLogger(exp, use_tensorboard=False)
    for step in range(5):
        logger.scalar("train/loss", 1.0 / (step + 1), step)
        logger.scalar("val/f1", 0.1 * step, step)
    logger.close()
    scalars = read_jsonl_scalars(logger.jsonl_path)
    assert len(scalars["train/loss"]) == 5
    assert scalars["val/f1"][-1] == (4, 0.4)
    written = export_plots({"e1": scalars}, str(tmp_path / "plots"))
    assert len(written) == 2
    assert all(p.endswith(".pdf") and os.path.exists(p) for p in written)


def test_tensorboard_event_roundtrip(tmp_path):
    exp = ExperimentDir(str(tmp_path), "e2")
    logger = MetricsLogger(exp, use_tensorboard=True)
    for step in range(3):
        logger.scalar("train/loss", float(3 - step), step)
    logger.close()
    scalars = read_scalars(exp.logs)
    assert "train/loss" in scalars
    steps, values = zip(*scalars["train/loss"])
    assert list(steps) == [0, 1, 2]
    np.testing.assert_allclose(values, [3.0, 2.0, 1.0])


def test_export_combines_experiments(tmp_path):
    a = {"m": [(0, 1.0), (1, 2.0)]}
    b = {"m": [(0, 2.0), (1, 1.0)]}
    written = export_plots({"expA": a, "expB": b}, str(tmp_path), fmt="png")
    assert len(written) == 1


def test_convert_tblog_cli(tmp_path):
    import json
    import os

    from learning_embeddings_tpu.cli.convert_tblog import main

    exp = tmp_path / "run" / "logs"
    exp.mkdir(parents=True)
    with open(exp / "metrics.jsonl", "w") as f:
        for i in range(5):
            f.write(json.dumps({"tag": "train/loss", "value": 1.0 / (i + 1),
                                "step": i}) + "\n")
    out = main(["--experiment_path", str(tmp_path / "run"),
                "--output_dir", str(tmp_path / "plots"), "--fmt", "png"])
    assert out and all(os.path.exists(p) for p in out)
