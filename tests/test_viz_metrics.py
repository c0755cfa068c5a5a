"""Observability-layer tests: metric plots, mask image, jsonl metrics logger."""

import os

import numpy as np

from cvml_goalnet_tpu.utils.metrics import MetricsLogger
from cvml_goalnet_tpu.utils.profiling import StageTimer
from cvml_goalnet_tpu.viz import export_indices, generate_metric_plots


class TestViz:
    def test_metric_plots_written(self, tmp_path):
        history = {
            "train_loss": [1.0, 0.8, 0.6], "val_loss": [1.1, 0.9, 0.7],
            "train_f_avg": [0.1, 0.2, 0.3], "train_f_max": [0.3, 0.4, 0.5],
            "val_f_avg": [0.1, 0.15, 0.2], "val_f_max": [0.2, 0.3, 0.4],
        }
        fp = str(tmp_path / "curves.png")
        generate_metric_plots(history, fp, opt_val_loss=0.7)
        assert os.path.getsize(fp) > 1000

    def test_export_indices(self, tmp_path, rng):
        pred = (rng.random(200) < 0.2).astype(np.uint8)
        gd = (rng.random((20, 200)) < 0.15).astype(np.uint8)
        fp = str(tmp_path / "indices.png")
        export_indices(pred, gd, fp)
        assert os.path.getsize(fp) > 1000


class TestMetricsLogger:
    def test_jsonl_roundtrip(self, tmp_path):
        fp = str(tmp_path / "events.jsonl")
        logger = MetricsLogger(fp)
        logger.log("start", config="test")
        logger.log_epoch(0, (0.5, 0.1, 0.2), (0.6, 0.05, 0.1), dt=1.5)
        events = MetricsLogger.read(fp)
        assert [e["event"] for e in events] == ["start", "epoch"]
        assert events[1]["epoch"] == 0
        assert events[1]["train_loss"] == 0.5
        assert events[1]["dt_s"] == 1.5


class TestStageTimer:
    def test_accumulates(self):
        t = StageTimer()
        with t.stage("decode"):
            pass
        with t.stage("decode"):
            pass
        s = t.summary()
        assert s["decode"]["count"] == 2
        assert s["decode"]["total_s"] >= 0


class TestConfigRoundtrip:
    def test_json_roundtrip(self, small_cfg):
        from cvml_goalnet_tpu.config import PipelineConfig

        s = small_cfg.to_json()
        back = PipelineConfig.from_json(s)
        assert back == small_cfg

    def test_file_roundtrip(self, small_cfg, tmp_path):
        from cvml_goalnet_tpu.config import PipelineConfig

        fp = str(tmp_path / "cfg.json")
        small_cfg.save(fp)
        assert PipelineConfig.load(fp) == small_cfg

    def test_unknown_keys_fail_loudly(self):
        # a typo'd hyperparameter must not silently run with the default
        # (eighth review pass)
        import json

        import pytest as _pytest

        from cvml_goalnet_tpu.config import PipelineConfig

        good = json.loads(PipelineConfig().to_json())
        good["train"]["learning_rte"] = 0.01
        with _pytest.raises(ValueError, match=r"learning_rte.*config\.train"):
            PipelineConfig.from_json(json.dumps(good))
        with _pytest.raises(ValueError, match="not_a_section"):
            PipelineConfig.from_json('{"not_a_section": {}}')

    def test_defaults_match_reference_constants(self):
        from cvml_goalnet_tpu.config import PipelineConfig

        cfg = PipelineConfig()
        # reference main.py:45-53, utils.py:333,466,629
        assert cfg.preprocess.skip_frames == 30
        assert cfg.preprocess.frame_size == (40, 40)
        assert cfg.train.num_epochs == 150
        assert cfg.train.subbatch_size == 10
        assert cfg.train.learning_rate == 1e-3
        assert cfg.train.train_ratio == 0.8
        assert cfg.train.seed == 12344321
        assert cfg.audio.n_mfcc == 30
        assert cfg.knapsack.summary_ratio == 0.15
        assert cfg.knapsack.scale_factor == 5


def test_package_version_matches_pyproject():
    # __init__ sat at 0.1.0 while pyproject said 0.3.0 for two rounds —
    # pin the two to each other so they can't drift again
    import os
    import tomllib

    import cvml_goalnet_tpu

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    assert cvml_goalnet_tpu.__version__ == meta["project"]["version"]
