"""Drive the REAL entry points (scripts/test.py, scripts/train.py) over
miniature fixture trees in the real on-disk dataset formats.

This is the attainable substitute for running on actual 3DMatch/KITTI/ETH
data (none ships in this environment): the overlap-pkl schema, gt_result
layout, ``gt.info`` parsing, KITTI ``.bin``/poses/ICP-cache handling, ETH
scene layout, trajectory writing, and the Redwood RR math all execute
unmodified — only the static device plan is shrunk (``--tiny``).
"""

import os
import runpy
import sys

import numpy as np
import pytest

import fixtures_gen

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")


@pytest.fixture(scope="session")
def trees(tmp_path_factory):
    base = tmp_path_factory.mktemp("fixture_data")
    tdm = str(base / "ThreeDMatch")
    kitti = str(base / "KITTI")
    eth = str(base / "ETH")
    os.makedirs(tdm), os.makedirs(kitti), os.makedirs(eth)
    scene = fixtures_gen.make_threedmatch_tree(tdm)
    fixtures_gen.make_kitti_tree(kitti)
    fixtures_gen.make_eth_tree(eth)
    return {"3dm": tdm, "kitti": kitti, "eth": eth, "tdm_test_scene": scene}


@pytest.fixture(scope="session")
def weights_dir(tmp_path_factory):
    """Random-init per-stage msgpack checkpoints (format plumbing only —
    pose quality is not asserted here)."""
    import jax
    from buffer_tpu.config import tiny_cfg
    from buffer_tpu.models.composite import BufferModel
    from buffer_tpu.train.checkpoint import save_variables

    d = str(tmp_path_factory.mktemp("weights"))
    variables = BufferModel(tiny_cfg()).init(jax.random.PRNGKey(0))
    for stage in ("Ref", "Desc", "Keypt", "Inlier"):
        save_variables(variables, os.path.join(d, stage, "best.msgpack"))
    return d


def _run(script, argv):
    old = sys.argv
    sys.argv = [script] + argv
    try:
        runpy.run_path(os.path.join(SCRIPTS, script), run_name="__main__")
    finally:
        sys.argv = old


def test_test_entry_3dmatch(trees, weights_dir, tmp_path, capsys):
    log_dir = str(tmp_path / "log3dm")
    _run("test.py", ["--config", "3DMatch", "--tiny",
                     "--data-root", trees["3dm"],
                     "--weights", weights_dir, "--log-dir", log_dir])
    out = capsys.readouterr().out
    assert "recall" in out
    # the full Redwood RR path must have executed (gt.info parsed, est.log
    # written per scene, covariance-weighted errors computed)
    assert "registration_recall" in out
    est = os.path.join(log_dir, trees["tdm_test_scene"], "est.log")
    assert os.path.exists(est)
    from buffer_tpu.eval.metrics import read_trajectory
    pairs, traj = read_trajectory(est)
    assert len(pairs) == 3 and traj.shape == (3, 4, 4)


def test_test_entry_kitti(trees, weights_dir, tmp_path, capsys):
    log_dir = str(tmp_path / "logk")
    _run("test.py", ["--config", "KITTI", "--tiny",
                     "--data-root", trees["kitti"],
                     "--weights", weights_dir, "--log-dir", log_dir])
    out = capsys.readouterr().out
    assert "recall" in out and "pairs': 1" in out
    # ICP-refined GT must have been computed and disk-cached
    assert os.path.exists(os.path.join(trees["kitti"], "icp", "8_0_1.npy"))


def test_test_entry_eth(trees, weights_dir, tmp_path, capsys):
    log_dir = str(tmp_path / "loge")
    _run("test.py", ["--config", "ThreeD2ETH", "--tiny",
                     "--data-root", trees["eth"],
                     "--weights", weights_dir, "--log-dir", log_dir])
    out = capsys.readouterr().out
    assert "recall" in out and "pairs': 1" in out
    assert os.path.exists(os.path.join(log_dir, "gazebo_summer", "est.log"))


def test_train_entry_3dmatch(trees, tmp_path):
    out_dir = str(tmp_path / "snap")
    _run("train.py", ["--config", "3DMatch", "--tiny",
                      "--data-root", trees["3dm"], "--out", out_dir,
                      "--stages", "Ref", "Desc",
                      "--epochs", "1", "--max-iter", "2"])
    for stage in ("Ref", "Desc"):
        assert os.path.exists(os.path.join(out_dir, stage, "best.msgpack"))
    assert os.path.exists(os.path.join(out_dir, "metrics.jsonl"))
    lines = open(os.path.join(out_dir, "metrics.jsonl")).read().splitlines()
    assert any('"split": "val"' in l and '"stage": "Ref"' in l for l in lines)
    assert any('"stage": "Desc"' in l for l in lines)


def test_train_entry_kitti(trees, tmp_path):
    out_dir = str(tmp_path / "snapk")
    _run("train.py", ["--config", "KITTI", "--tiny",
                      "--data-root", trees["kitti"], "--out", out_dir,
                      "--stages", "Ref",
                      "--epochs", "1", "--max-iter", "1"])
    assert os.path.exists(os.path.join(out_dir, "Ref", "best.msgpack"))
