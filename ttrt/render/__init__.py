"""Render core: intersections, skybox sampling, lighting, integrator."""
