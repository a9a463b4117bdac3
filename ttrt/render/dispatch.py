"""Trace dispatch: route (scene-type -> batched trace function).

The integrator and the lighting module are generic over the scene
representation: the demo tier traces a linear object scan
(ttrt.render.intersect.trace_ray) while the many-object tier traces through
a uniform-grid acceleration structure (ttrt.mesh.trace_ray_mesh). Both
return the same Hit record, so everything above the trace — the bounce
loop, shading, shadows, skybox — is shared.

Scene types register here at import time; dispatch is a plain Python
isinstance scan resolved at TRACE time (static under jit — no runtime cost).
"""

from __future__ import annotations

from typing import Callable, Dict, Type

_TRACE_FNS: Dict[type, Callable] = {}


def register_trace(scene_type: Type, fn: Callable) -> None:
    _TRACE_FNS[scene_type] = fn


def trace(scene, o, d, *, sample_sky: bool = True, bilinear: bool = False):
    """Trace a ray batch against ``scene`` with its registered tracer."""
    fn = _TRACE_FNS.get(type(scene))
    if fn is None:
        # bootstrap: the registrations are import side effects; pull in the
        # built-in scene modules lazily so dispatch works from any entry
        # point regardless of import order.
        import ttrt.render.intersect  # noqa: F401
        import ttrt.mesh.scene  # noqa: F401

        fn = _TRACE_FNS.get(type(scene))
    if fn is None:
        raise TypeError(
            f"no trace function registered for scene type {type(scene)!r}"
        )
    return fn(scene, o, d, sample_sky=sample_sky, bilinear=bilinear)
