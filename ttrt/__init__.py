"""ttrt — Terminal TPU Ray Tracer.

A TPU-native (JAX / XLA / Pallas / pjit) ray-tracing framework with the full
capability surface of the reference terminal ray tracer
(reference: TerminalRayTracer.c, 1369 LoC C): sphere/plane scenes, reflective
materials, diffuse + shadow-ray lighting, cubemap skyboxes, anti-aliased
multi-bounce rendering, and ANSI truecolor terminal streaming — plus the
reference's roadmap tiers (many-object acceleration structures, triangle
meshes, physics stepping, camera controls) built TPU-first.

Architecture (see SURVEY.md §7):
  - Scene state lives as struct-of-arrays pytrees on device.
  - The renderer is a batched, masked, fixed-depth bounce loop over flat ray
    batches; everything through ANSI byte-buffer assembly runs on device.
  - Scale-out shards the pixel grid over a `jax.sharding.Mesh`.
"""

from ttrt.config import RenderConfig, constants
from ttrt.scene import (
    Camera,
    DirectionalLights,
    Plane,
    PointLights,
    Scene,
    Skybox,
    Spheres,
    demo_scene,
)
from ttrt.render.integrator import render_frame

__version__ = "0.1.0"

__all__ = [
    "RenderConfig",
    "constants",
    "Camera",
    "DirectionalLights",
    "Plane",
    "PointLights",
    "Scene",
    "Skybox",
    "Spheres",
    "demo_scene",
    "render_frame",
]
