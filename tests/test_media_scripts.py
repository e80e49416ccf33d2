"""Smoke tests for the media/demo scripts
(reference scripts/images/*, scripts/videos/*): run each script's main()
in-process against the CI-sized synthetic config (48x64, random init) and
assert the expected artifacts appear. In-process (rather than subprocess)
so all five share one JAX runtime and jit cache; the CLI surface is still
exercised via sys.argv + argparse.
"""
import importlib.util
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_module_cache = {}


def load_script(rel_path):
    """Import a script file the way `python scripts/...` would: with the
    scripts/ dir and repo root on sys.path (the scripts do this themselves
    at import time)."""
    if rel_path in _module_cache:
        return _module_cache[rel_path]
    path = os.path.join(REPO, rel_path)
    name = "media_" + os.path.basename(rel_path)[:-3]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _module_cache[rel_path] = mod
    return mod


def run_script(monkeypatch, rel_path, *args):
    mod = load_script(rel_path)
    monkeypatch.setattr(sys, "argv", [os.path.basename(rel_path), *args])
    monkeypatch.chdir(REPO)
    mod.main()


def _read_png(path):
    import cv2
    img = cv2.imread(path)
    assert img is not None, f"unreadable png: {path}"
    return img


def test_gen_imgs(monkeypatch, tmp_path):
    out = str(tmp_path / "imgs")
    run_script(monkeypatch, "scripts/images/gen_imgs.py", "-cn",
               "exp_synthetic", "--indices", "0", "--out", out)
    for suffix in ("in", "depth", "profile"):
        img = _read_png(os.path.join(out, f"000000_{suffix}.png"))
        assert img.size > 0


def test_gen_img_custom(monkeypatch, tmp_path):
    # Build a throwaway input photo; the script resizes to the model family
    # resolution (synthetic: 48x64).
    import cv2
    rng = np.random.default_rng(0)
    src = str(tmp_path / "photo.png")
    cv2.imwrite(src, rng.integers(0, 255, (100, 160, 3), dtype=np.uint8))
    out = str(tmp_path / "custom")
    run_script(monkeypatch, "scripts/images/gen_img_custom.py", "--img",
               src, "--model", "synthetic", "--out", out)
    for suffix in ("in", "depth", "profile"):
        _read_png(os.path.join(out, f"photo_{suffix}.png"))


def test_gen_vid_seq(monkeypatch, tmp_path):
    out = str(tmp_path / "vid" / "seq.mp4")
    run_script(monkeypatch, "scripts/videos/gen_vid_seq.py", "-cn",
               "exp_synthetic", "--from-idx", "0", "--to-idx", "2",
               "--out", out)
    assert os.path.getsize(out) > 0


def test_gen_vid_nvs(monkeypatch, tmp_path):
    # 3-pose trajectory: keyframe + two small forward steps.
    traj = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    traj[:, 2, 3] = [0.0, 0.5, 1.0]
    traj_path = str(tmp_path / "traj.npy")
    np.save(traj_path, traj)
    out = str(tmp_path / "vid" / "nvs.mp4")
    run_script(monkeypatch, "scripts/videos/gen_vid_nvs.py", "-cn",
               "exp_synthetic", "--index", "0", "--trajectory", traj_path,
               "--out", out)
    assert os.path.getsize(out) > 0


def test_gen_vid_transition(monkeypatch, tmp_path):
    out = str(tmp_path / "vid" / "transition.mp4")
    run_script(monkeypatch, "scripts/videos/gen_vid_transition.py", "-cn",
               "exp_synthetic", "--index", "0", "--n-frames", "3",
               "--out", out)
    assert os.path.getsize(out) > 0


def test_export_camera_trj_math():
    """export_camera_trj runs inside Blender (bpy) which is absent here;
    validate the coordinate-change math instead."""
    mod = load_script("scripts/blender/export_camera_trj.py")
    # Blender identity camera: at origin looking down blender -Z, +Y up.
    mat = np.eye(4, dtype=np.float32)
    pose = mod.COORD_FROM_BLENDER @ mat @ mod.CAM_FLIP
    rot = pose[:3, :3]
    assert np.allclose(rot @ rot.T, np.eye(3), atol=1e-6)
    assert np.isclose(np.linalg.det(rot), 1.0, atol=1e-6)
