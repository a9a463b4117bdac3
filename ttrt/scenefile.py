"""JSON scene descriptions.

The reference hard-codes its scene in main() (TerminalRayTracer.c:
1256-1306); ttrt additionally accepts a declarative scene file so users
can compose scenes without code:

```json
{
  "skybox": "colors",
  "spheres": [
    {"center": [1, 0, 0], "radius": 0.5,
     "color": [1, 0, 0], "reflectivity": 1.0}
  ],
  "ground": {"y": -2.0, "even_color": [1, 1, 1],
             "odd_color": [1, 0, 0], "reflectivity": 0.2},
  "directional_lights": [
    {"direction": [-1, -1, -1], "color": [1, 1, 1]}
  ],
  "point_lights": [
    {"position": [0, 0, 0], "color": [1, 1, 1], "intensity": 10}
  ]
}
```

Every field has the demo default, so a partial file is valid. Values are
assembled in NumPy and transferred once (no eager device ops).
"""

from __future__ import annotations

import json
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ttrt import assets
from ttrt.scene import (
    Camera,
    DirectionalLights,
    GROUND_EVEN_COLOR,
    GROUND_ODD_COLOR,
    Materials,
    Plane,
    PointLights,
    Scene,
    Spheres,
)
from ttrt.vec import vec3
from ttrt.vec import Vec3


class SceneFileError(ValueError):
    """Malformed scene description."""


def _vec_field(obj, key, default, n=3):
    v = obj.get(key, default)
    a = np.asarray(v, np.float64)
    if a.shape != (n,):
        raise SceneFileError(f"{key!r} must have {n} components, got {v!r}")
    return a


def scene_from_dict(desc: dict, width_px: int, height_px: int,
                    dtype=jnp.float32) -> Scene:
    """Build a Scene from a parsed description (see module docstring)."""
    f32 = np.float32

    sph_list = desc.get("spheres", [])
    if not isinstance(sph_list, list) or not sph_list:
        raise SceneFileError("scene needs a non-empty 'spheres' list")
    centers = np.stack(
        [_vec_field(s, "center", None) for s in sph_list]
    ).astype(f32)
    radii = np.asarray(
        [float(s.get("radius", 0.5)) for s in sph_list], f32
    )
    colors = np.stack(
        [_vec_field(s, "color", [1.0, 1.0, 1.0]) for s in sph_list]
    ).astype(f32)
    refl = np.asarray(
        [float(s.get("reflectivity", 0.8)) for s in sph_list], f32
    )
    spec = np.asarray(
        [float(s.get("specularity", 100.0)) for s in sph_list], f32
    )
    spheres = Spheres(
        center=Vec3(*(jnp.asarray(centers[:, i], dtype) for i in range(3))),
        radius=jnp.asarray(radii, dtype),
        material=Materials(
            color=Vec3(
                *(jnp.asarray(colors[:, i], dtype) for i in range(3))
            ),
            reflectivity=jnp.asarray(refl, dtype),
            specularity=jnp.asarray(spec, dtype),
        ),
    )

    g = desc.get("ground", {})
    ground = Plane(
        point=vec3(0.0, float(g.get("y", -2.0)), 0.0, dtype),
        normal=vec3(0.0, 1.0, 0.0, dtype),
        even_material=Materials.create(
            _vec_field(g, "even_color", list(GROUND_EVEN_COLOR)),
            float(g.get("reflectivity", 0.2)), 100.0, dtype,
        ),
        odd_material=Materials.create(
            _vec_field(g, "odd_color", list(GROUND_ODD_COLOR)),
            float(g.get("reflectivity", 0.2)), 100.0, dtype,
        ),
    )

    dls = desc.get(
        "directional_lights",
        [{"direction": [-1.0, -1.0, -1.0], "color": [1.0, 1.0, 1.0]}],
    )
    if dls:
        ddirs = np.stack(
            [_vec_field(l, "direction", None) for l in dls]
        ).astype(f32)
        dcols = np.stack(
            [_vec_field(l, "color", [1.0, 1.0, 1.0]) for l in dls]
        ).astype(f32)
    else:  # zero lights: keep shapes static with a black light
        ddirs = np.array([[-1.0, -1.0, -1.0]], f32)
        dcols = np.zeros((1, 3), f32)
    directional = DirectionalLights(
        direction=Vec3(*(jnp.asarray(ddirs[:, i], dtype) for i in range(3))),
        color=Vec3(*(jnp.asarray(dcols[:, i], dtype) for i in range(3))),
    )

    pls = desc.get(
        "point_lights",
        [{"position": [0.0, 0.0, 0.0], "color": [1.0, 1.0, 1.0],
          "intensity": 10.0}],
    )
    if pls:
        ppos = np.stack(
            [_vec_field(l, "position", None) for l in pls]
        ).astype(f32)
        pcols = np.stack(
            [_vec_field(l, "color", [1.0, 1.0, 1.0]) for l in pls]
        ).astype(f32)
        pint = np.asarray(
            [float(l.get("intensity", 10.0)) for l in pls], f32
        )
    else:
        ppos = np.zeros((1, 3), f32)
        pcols = np.zeros((1, 3), f32)
        pint = np.zeros((1,), f32)
    point = PointLights(
        position=Vec3(*(jnp.asarray(ppos[:, i], dtype) for i in range(3))),
        color=Vec3(*(jnp.asarray(pcols[:, i], dtype) for i in range(3))),
        intensity=jnp.asarray(pint, dtype),
    )

    skybox_name = desc.get("skybox", "colors")
    skybox = assets.load_skybox(skybox_name, dtype)

    return Scene(
        spheres=spheres,
        ground=ground,
        directional_lights=directional,
        point_lights=point,
        camera=Camera.default(width_px, height_px, dtype),
        skybox=skybox,
    )


def load_scene_file(path: str, width_px: int, height_px: int,
                    dtype=jnp.float32) -> Scene:
    try:
        with open(path) as f:
            desc = json.load(f)
    except (OSError, json.JSONDecodeError) as e:
        raise SceneFileError(f"cannot read scene file {path}: {e}")
    if not isinstance(desc, dict):
        raise SceneFileError("scene file must contain a JSON object")
    return scene_from_dict(desc, width_px, height_px, dtype)
