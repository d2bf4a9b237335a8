"""Drive-report tooling: log parsers and resume markers.

tools/drive_coclr_cycle.py + tools/summarize_coclr_drive.py produce the
committed learning-dynamics artifact (DRIVE_coclr_cycle.{json,md}); these
tests pin the progress-line grammar they parse (the meter format of
train/pretrain.py, mirroring the reference's ProgressMeter lines) so a
logging change can't silently empty the artifact.
"""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "tools", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


LOG = """\
Epoch:[0][ 0/17]\tTime 175.2 (175.2)\tData 8.7 (8.7)\tLoss 0.0343 (0.0343)\tacc@1 1.0000 (1.0000)\tacc@5 1.0000 (1.0000)
Epoch:[0][15/17]\tTime 5.9 (34.4)\tData 0.0 (1.9)\tLoss 5.6321 (4.8561)\tacc@1 0.0312 (0.0898)\tacc@5 0.0625 (0.1387)
Epoch: [0][17] T-epoch:553.54
Epoch:[1][15/17]\tTime 4.1 (30.3)\tData 0.0 (4.3)\tLoss 5.6341 (5.6176)\tacc@1 0.0625 (0.0508)\tacc@5 0.1250 (0.1719)\tSelf-acc@1 0.1250 (0.0781)\tSelf-acc@5 0.1250 (0.1615)
Training from ep 0 to ep 2 finished
"""

RETR = """\
1NN acc = 0.4167
5NN acc = 0.7500
10NN acc = 1.0000
"""


def test_parse_epochs_takes_epoch_averages():
    drive = _load("drive_coclr_cycle")
    eps = drive.parse_epochs(LOG)
    assert [e["epoch"] for e in eps] == [0, 1]
    # last progress line of the epoch carries the epoch running average
    assert eps[0]["loss"] == 4.8561 and eps[0]["acc1"] == 0.0898
    assert eps[1]["loss"] == 5.6176


def test_parse_retrieval():
    drive = _load("drive_coclr_cycle")
    got = drive.parse_retrieval(RETR)
    assert got == {"R@1": 0.4167, "R@5": 0.75, "R@10": 1.0}


def test_summarizer_multi_cycle(tmp_path, monkeypatch):
    """cycleN retrieval logs feed per-cycle delta lines and the
    best-vs-chance line takes the max across all cycles."""
    logs = tmp_path / "drivelogs"
    logs.mkdir()
    (logs / "nce_rgb.log").write_text(LOG)
    r = {"init": (0.20, 0.10), "coclr": (0.30, 0.25),
         "cycle2": (0.28, 0.40), "cycle3": (0.26, 0.44)}
    for suf, (rgb, flow) in r.items():
        (logs / f"retrieval_rgb_{suf}.log").write_text(
            f"1NN acc = {rgb:.4f}\n5NN acc = 0.9\n")
        (logs / f"retrieval_flow_{suf}.log").write_text(
            f"1NN acc = {flow:.4f}\n5NN acc = 0.9\n")
    out = tmp_path / "ART"
    import json

    # a prior report carries the drive config (query-count for sigma notes)
    out.with_suffix(".json").write_text(json.dumps({"config": {
        "moco_k": 16, "seq_len": 8, "img_dim": 32, "seed": 1,
        "n_classes": 2, "test_groups": 2, "n_clips": 2}, "phases": {}}))
    monkeypatch.setattr(sys, "argv", [
        "summarize_coclr_drive", "--workdir", str(tmp_path),
        "--chance", "0.25", "--out_prefix", str(out)])
    _load("summarize_coclr_drive").main()
    rep = json.loads((tmp_path / "ART.json").read_text())
    assert rep["phases"]["retrieval_flow_cycle3"]["R@1"] == 0.44
    md = (tmp_path / "ART.md").read_text()
    assert "Mining cycle 2" in md and "Mining cycle 3" in md
    # best across coclr/cycle2/cycle3, not just the last cycle
    assert "rgb 0.300" in md and "flow 0.440" in md


def test_run_cli_resume_skip(tmp_path):
    """A phase whose saved log shows completion is not re-run (wall None
    marks the resume), but a degenerate 0-progress 'finished' log fails the
    validator and does rerun."""
    drive = _load("drive_coclr_cycle")
    log_dir = tmp_path / "logs"
    log_dir.mkdir()
    (log_dir / "ph.log").write_text(LOG)
    ok = lambda t: bool(drive.parse_epochs(t))
    text, wall = drive.run_cli(
        "ph", ["definitely-no-such-entrypoint.py"], str(tmp_path),
        str(log_dir), done_marker="finished", validate=ok)
    assert wall is None and "finished" in text

    # 0-step phase: "finished" but no progress lines -> must NOT skip
    (log_dir / "ph0.log").write_text(
        "Epoch: [0][0] T-epoch:0.00\nTraining from ep 0 to ep 1 finished\n")
    import pytest

    with pytest.raises(Exception):
        drive.run_cli("ph0", ["definitely-no-such-entrypoint.py"],
                      str(tmp_path), str(log_dir), done_marker="finished",
                      validate=ok)


def test_summarize_drives_cross_seed(tmp_path):
    """tools/summarize_drives.py aggregates every DRIVE_coclr_cycle*.json
    into per-seed best-post-mining rows + improvement counts."""
    import json

    def art(seed, r1):
        phases = {f"retrieval_{m}_{s}": {"R@1": v}
                  for (m, s), v in r1.items()}
        return {"phases": phases, "chance_R@1": 0.25,
                "config": {"seed": seed}}

    (tmp_path / "DRIVE_coclr_cycle.json").write_text(json.dumps(art(0, {
        ("rgb", "init"): 0.14, ("rgb", "coclr"): 0.29,
        ("rgb", "cycle2"): 0.24,
        ("flow", "init"): 0.28, ("flow", "coclr"): 0.29,
        ("flow", "cycle2"): 0.44})))
    (tmp_path / "DRIVE_coclr_cycle_seed1.json").write_text(json.dumps(art(1, {
        ("rgb", "init"): 0.24, ("rgb", "coclr"): 0.29,
        ("flow", "init"): 0.32, ("flow", "coclr"): 0.22})))

    mod = _load("summarize_drives")
    drives = mod.load_drives(str(tmp_path))
    rows, improved, total = mod.summarize(drives, n_queries=72)
    assert len(rows) == 4
    assert improved == {"rgb": 2, "flow": 1} and total == {"rgb": 2, "flow": 2}
    r0_flow = next(r for r in rows if r["seed"] == 0
                   and r["modality"] == "flow")
    assert abs(r0_flow["best_post_mining"] - 0.44) < 1e-9
    # sigma at chance 0.25 with 72 queries = sqrt(.25*.75/72) ~ 0.051
    assert abs(r0_flow["vs_chance_sigma"] - (0.44 - 0.25) / 0.05103) < 0.02


def test_seed_report_preserves_prior_artifact(tmp_path):
    """A relaunch must inherit the existing artifact's phases (wall_min,
    self_acc1_final) and accumulate total_wall_min instead of starting
    from an empty report — a round-4 relaunch wiped the committed primary
    artifact's wall-clock fields (review finding)."""
    import json

    drive = _load("drive_coclr_cycle")
    out = tmp_path / "ART.json"
    out.write_text(json.dumps({
        "config": {"cycles": 1},
        "phases": {"coclr_flowmining": {"wall_min": 52.0,
                                        "self_acc1_final": 0.0367,
                                        "epochs": []}},
        "total_wall_min": 223.8}))
    report, prior = drive.seed_report(str(out), {"cycles": 2})
    assert report["phases"]["coclr_flowmining"]["wall_min"] == 52.0
    assert report["config"] == {"cycles": 2}  # config is the CURRENT launch
    assert prior == 223.8

    # no prior artifact -> fresh report, zero prior wall
    report, prior = drive.seed_report(str(tmp_path / "none.json"), {})
    assert report["phases"] == {} and prior == 0.0

    # corrupt artifact (half-written by a cut launch) -> fresh, not a crash
    out.write_text("{not json")
    report, prior = drive.seed_report(str(out), {})
    assert report["phases"] == {} and prior == 0.0


def test_partial_nce_requires_log_progress():
    """--accept_partial_nce's guard: a checkpoint alone must not qualify a
    log with zero progress lines (stale ckpt + degenerate 0-video relaunch
    must rerun, same as the validate guard for completed runs)."""
    drive = _load("drive_coclr_cycle")
    # the guard composes parse_epochs(prev) with the ckpt glob; pin the
    # log half here (the glob half is plain os.path plumbing)
    assert drive.parse_epochs(LOG)  # real progress lines qualify
    degenerate = "Epoch: [0][0] T-epoch:0.00\nTraining finished\n"
    assert not drive.parse_epochs(degenerate)


def test_summarize_scale_drive(tmp_path):
    """tools/summarize_scale_drive.py (the K400-regime scale-drive
    artifact): pins the progress-line grammar and the derived metrics —
    dataset size = steps x batch, queue-fill step = K/batch, steady-state
    median step time skips the warmup, deciles come from the
    instantaneous Loss column."""
    scale = _load("summarize_scale_drive")
    lines = []
    for s in range(0, 100, 5):
        t = 60.0 if s == 0 else 2.0  # step 0 carries compile
        loss = 6.0 - s * 0.01
        lines.append(
            f"Epoch:[0][{s:3d}/100]\tTime {t:.4f} ({t:.4f})\t"
            f"Data 0.0010 (0.0500)\tLoss {loss:.4f} ({loss:.4f})\t"
            f"acc@1 0.1000 (0.1000)\tacc@5 0.3000 (0.3000)")
    log = tmp_path / "k4.log"
    log.write_text("\n".join(lines) + "\n")

    r = scale.summarize(str(log), "k4test", batch_size=32, moco_k=1024,
                        notes=["synthetic"])
    assert r["dataset_videos"] == 3200
    assert r["steps_per_epoch"] == 100
    assert r["queue_first_full_step"] == 32
    assert r["step_time_median_s"] == 2.0  # warmup step excluded
    assert r["clips_per_sec"] == 32.0      # 64 clips / 2 s
    assert abs(r["loss_first_decile"] - 5.975) < 1e-6  # steps 0,5
    assert abs(r["loss_last_decile"] - 5.075) < 1e-6   # steps 90,95
    md = scale.to_markdown(r)
    assert "3,200" in md and "synthetic" in md

    # CLI writes both artifacts
    scale.main(["--log", str(log), "--name", "k4test", "--batch_size",
                "32", "--moco_k", "1024", "--out_root", str(tmp_path)])
    import json
    with open(tmp_path / "DRIVE_k4test.json") as f:
        assert json.load(f)["clips_per_sec"] == 32.0
    assert (tmp_path / "DRIVE_k4test.md").exists()
