"""Render configuration and reference constants.

The reference hard-codes all of these as compile-time ``#define``s
(TerminalRayTracer.c:43-58); here they are a runtime config so one compiled
renderer serves every resolution / quality tier (the shapes that feed XLA
remain static per-config, so each distinct config compiles once).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Constants:
    """Math/behavioral constants of the reference implementation.

    Values and provenance:
      - PI: TerminalRayTracer.c:43
      - EPSILON: self-intersection offset, TerminalRayTracer.c:44
      - NORMALIZE_GUARD: normalize is a no-op for ||v|| <= 1e-4
        (TerminalRayTracer.c:444)
      - PLANE_DENOM_EPS / PLANE_T_EPS: ray-plane rejection thresholds
        (TerminalRayTracer.c:680,685)
      - CONTRIBUTION_EPS: bounce-loop termination threshold
        (TerminalRayTracer.c:1018)
    """

    PI: float = 3.14159265358979323846
    EPSILON: float = 1e-6
    NORMALIZE_GUARD: float = 1e-4
    PLANE_DENOM_EPS: float = 1e-5
    PLANE_T_EPS: float = 1e-5
    CONTRIBUTION_EPS: float = 1e-5


constants = Constants()


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render parameters (hashable; safe as a jit static arg).

    Defaults mirror the reference (TerminalRayTracer.c:47-58):
    480x280 pixels, 10 AA rays per pixel, 10 bounce limit, 60 fps target.

    ``dtype`` selects the compute precision. The reference is all-double
    (C ``double``); on TPU the production path is float32 (f64 is emulated
    and slow), while the float64 path exists for bit-level parity testing
    on CPU (requires ``jax_enable_x64``).

    ``skybox_bilinear`` enables bilinear texel filtering — a reference
    roadmap item (TerminalRayTracer.c:23); ``False`` reproduces the
    reference's nearest-neighbor lookup (TerminalRayTracer.c:782-788).

    ``energy_model`` selects the bounce-mixing model:
      - ``"parity"`` (default): the reference's accumulation — every hit
        adds its full contribution-weighted shaded color, the bounce
        weight multiplies by reflectivity, and the pixel is normalized
        by the accumulated contribution total
        (TerminalRayTracer.c:1034-1061).
      - ``"subtract"``: the reference's OWN roadmap model
        (TerminalRayTracer.c:24-28, "make reflectivity subtract from the
        color that a ray sees"): a hit's local shading is weighted by
        (1 - reflectivity) — reflectivity 1.0 shows none of the object's
        own color, 0.0 shows only it — and the reflected continuation
        carries the remaining fraction. The weights form a partition of
        unity along the path (no final normalization); energy left when
        the bounce limit or the 1e-5 contribution cutoff truncates a
        path is absorbed (dropped), which is the energy-conserving
        reading of the TODO.
    """

    width: int = 480
    height: int = 280
    rays_per_pixel: int = 10
    bounce_limit: int = 10
    frame_rate: float = 60.0
    dtype: Any = jnp.float32
    skybox_bilinear: bool = False
    # Blinn-Phong specular highlights: present in the reference only as
    # commented-out code (TerminalRayTracer.c:913-916, 947-950); off = parity.
    specular: bool = False
    # reflectivity mixing model: "parity" or "subtract" (latent reference
    # roadmap item, TerminalRayTracer.c:24-28)
    energy_model: str = "parity"

    def __post_init__(self):
        if self.energy_model not in ("parity", "subtract"):
            raise ConfigError(
                f"energy_model must be 'parity' or 'subtract', "
                f"got {self.energy_model!r}"
            )

    @property
    def frame_duration(self) -> float:
        return 1.0 / self.frame_rate

    @property
    def n_pixels(self) -> int:
        return self.width * self.height

    @property
    def n_primary_rays(self) -> int:
        return self.n_pixels * self.rays_per_pixel

    def with_(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


class ConfigError(ValueError):
    """A user-configuration refusal (renderer/extension constraints).

    Subclasses ValueError so library callers and tests that catch
    ValueError keep working; the CLI catches THIS (plus AssetError and
    SceneFileError) to print a clean one-line error — internal
    ValueErrors from jnp/shape bugs still traceback, preserving their
    diagnostics (advisor finding, 2026-08-18)."""
