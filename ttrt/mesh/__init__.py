"""Many-object tier: triangle meshes, uniform-grid acceleration, 10k-sphere
scenes (BASELINE.json config 4; reference roadmap items "other shapes" /
"hierarchy/acceleration structures", README.md:19 / TerminalRayTracer.c:30)."""

from ttrt.mesh.triangles import Triangles, floor_mesh
from ttrt.mesh.grid import UniformGrid, build_grid
from ttrt.mesh.scene import MeshScene, many_sphere_scene, trace_ray_mesh
