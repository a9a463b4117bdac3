"""JSON scene descriptions."""

import json
import os
import re
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttrt.config import RenderConfig
from ttrt.render.integrator import render_frame
from ttrt.scenefile import SceneFileError, load_scene_file, scene_from_dict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _desc():
    return {
        "skybox": "colors",
        "spheres": [
            {"center": [0, 0, 0], "radius": 0.5, "color": [0, 1, 0],
             "reflectivity": 0.3},
            {"center": [1.5, 0, 0]},
        ],
        "ground": {"y": -1.0, "reflectivity": 0.1},
        "directional_lights": [
            {"direction": [0, -1, 0], "color": [1, 1, 1]}
        ],
        "point_lights": [],
    }


def test_scene_from_dict_shapes_and_defaults():
    scene = scene_from_dict(_desc(), 16, 8)
    assert scene.spheres.count == 2
    assert float(scene.spheres.radius[1]) == 0.5  # default radius
    assert float(scene.ground.point.y) == -1.0
    assert scene.directional_lights.count == 1
    # empty point_lights list -> one zero-intensity placeholder
    assert scene.point_lights.count == 1
    assert float(scene.point_lights.intensity[0]) == 0.0


def test_scene_from_dict_renders():
    cfg = RenderConfig(width=16, height=8, rays_per_pixel=1,
                       bounce_limit=3, dtype=jnp.float32)
    scene = scene_from_dict(_desc(), 16, 8)
    fb, _ = jax.jit(lambda s: render_frame(s, cfg))(scene)
    assert np.isfinite(np.asarray(fb.to_array())).all()


def test_bad_scene_rejected(tmp_path):
    with pytest.raises(SceneFileError):
        scene_from_dict({"spheres": []}, 8, 8)
    with pytest.raises(SceneFileError):
        scene_from_dict({"spheres": [{"center": [1, 2]}]}, 8, 8)
    p = tmp_path / "bad.json"
    p.write_text("not json {")
    with pytest.raises(SceneFileError):
        load_scene_file(str(p), 8, 8)


def test_cli_scene_file_and_png(tmp_path):
    desc = _desc()
    sf = tmp_path / "scene.json"
    sf.write_text(json.dumps(desc))
    out = tmp_path / "out.png"
    r = subprocess.run(
        [sys.executable, "-m", "ttrt", "--cpu", "--no-input",
         "--scene-file", str(sf), "--still", str(out),
         "--width", "24", "--height", "12", "--spp", "1"],
        cwd=REPO, capture_output=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    from PIL import Image

    im = Image.open(out)
    assert im.size == (24, 12)


def test_cli_show_skybox():
    r = subprocess.run(
        [sys.executable, "-m", "ttrt", "--cpu", "--no-input",
         "--show-skybox", "colors", "--width", "30"],
        cwd=REPO, capture_output=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    # contact sheet of solid faces: truecolor cells present
    assert re.search(rb"\x1b\[48;2;\d+;\d+;\d+m", r.stdout)
