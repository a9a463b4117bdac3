"""Physics tier (BASELINE.json config 5): GJK collision queries + on-device
rigid-body stepping fused with the render loop. The reference lists "GJK
collision detection + reaction physics" as a roadmap item (README.md:21);
this is the from-scratch TPU-native implementation."""

from ttrt.physics.gjk import gjk_distance, sphere_support, polytope_support
from ttrt.physics.world import PhysicsParams, PhysicsState, physics_step
