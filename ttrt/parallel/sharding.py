"""Multi-chip rendering: shard the pixel grid over a device mesh.

The reference is single-threaded (SURVEY.md §2: no parallelism anywhere);
the TPU-native scaling story is data parallelism over rays — rays are
independent, so the (H*W*spp) ray batch shards perfectly with ZERO
cross-chip communication during tracing. Scene constants (spheres, lights,
skybox texels) are replicated on every chip.

Mesh layout: a 2D ('rows', 'samples') mesh.
  - 'rows': shards image rows — each chip traces a horizontal band AND
    ANSI-encodes its own band (the encode is row-local by construction:
    every row maps to a fixed-size byte span). The all_gather of encoded
    bands rides the ICI once per frame.
  - 'samples': shards AA samples within each pixel — per-pixel partial
    color sums are combined with one psum before the sample average. This
    axis exists so sample-heavy configs (path-tracing tier) can scale
    without needing H divisible by a huge chip count.

Everything is expressed with shard_map over a Mesh so XLA inserts the
collectives; there is no hand-written communication.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ttrt.config import RenderConfig
from ttrt.render.integrator import generate_rays, trace_batch
from ttrt.scene import Scene
from ttrt.term.encoder import encode_ansi_frame, encode_rgb_frame
from ttrt.vec import Vec3


def make_mesh(
    n_rows: Optional[int] = None,
    n_samples: int = 1,
    devices=None,
) -> Mesh:
    """Build a ('rows', 'samples') mesh over the available devices."""
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if n_rows is None:
        n_rows = n // n_samples
    if n_rows * n_samples != n:
        raise ValueError(
            f"mesh {n_rows}x{n_samples} does not tile the {n} available "
            f"devices; pick factors of the device count"
        )
    dev_grid = np.asarray(devices).reshape(n_rows, n_samples)
    return Mesh(dev_grid, ("rows", "samples"))


def mesh_from_spec(spec: str) -> Mesh:
    """CLI mesh spec -> device Mesh. ``"auto"`` uses every available
    device on the rows axis; ``"RxS"`` (e.g. ``4x2``) builds the
    ('rows', 'samples') ray mesh; ``"RxSxO"`` (e.g. ``2x2x2``) adds the
    'objects' geometry axis (many-object scenes only — each chip traces
    against its Morton subcluster slice, ttrt.parallel.objects). The
    shape must tile the device count exactly. User errors raise
    ConfigError (one-line CLI message, no traceback)."""
    from ttrt.config import ConfigError

    devices = jax.devices()
    if spec == "auto":
        return make_mesh(len(devices), 1, devices)
    parts = spec.lower().split("x")
    try:
        if len(parts) not in (2, 3):
            raise ValueError
        factors = [int(q) for q in parts]
        if any(f < 1 for f in factors):
            raise ValueError
    except ValueError:
        raise ConfigError(
            f"--mesh expects 'auto', ROWSxSAMPLES (e.g. 4x2) or "
            f"ROWSxSAMPLESxOBJECTS (e.g. 2x2x2), got {spec!r}"
        ) from None
    n_total = math.prod(factors)
    if n_total != len(devices):
        raise ConfigError(
            f"--mesh {spec} needs {n_total} devices but "
            f"{len(devices)} are available"
        )
    if len(parts) == 2:
        return make_mesh(factors[0], factors[1], devices)
    dev_grid = np.asarray(devices).reshape(*factors)
    return Mesh(dev_grid, ("rows", "samples", "objects"))


def check_mesh_divisible(cfg: RenderConfig, mesh: Mesh) -> None:
    """CLI-facing divisibility check: ConfigError instead of the
    trace-time ValueError from _check_divisible."""
    from ttrt.config import ConfigError

    try:
        _check_divisible(cfg, mesh)
    except ValueError as e:
        raise ConfigError(str(e)) from None


def _check_divisible(cfg: RenderConfig, mesh: Mesh) -> None:
    n_rows = mesh.shape["rows"]
    n_samp = mesh.shape["samples"]
    if cfg.height % n_rows:
        raise ValueError(
            f"height {cfg.height} not divisible by mesh rows {n_rows}"
        )
    if cfg.rays_per_pixel % n_samp:
        raise ValueError(
            f"rays_per_pixel {cfg.rays_per_pixel} not divisible by mesh "
            f"samples {n_samp}"
        )


def render_frame_sharded(
    scene: Scene, cfg: RenderConfig, mesh: Mesh
) -> Tuple[Vec3, jnp.ndarray]:
    """Sharded analog of render_frame: each chip traces its (row-band x
    sample-slice); one psum combines sample partials. Returns the full
    replicated (H, W) framebuffer Vec3 + total trace count."""
    _check_divisible(cfg, mesh)
    H, W, N = cfg.height, cfg.width, cfg.rays_per_pixel
    n_rows = mesh.shape["rows"]
    n_samp = mesh.shape["samples"]

    # Generate rays globally (cheap, elementwise) shaped (H, W, N) per
    # component, then shard rows/samples. XLA partitions the generation
    # itself once shard_map slices flow in.
    o, d = generate_rays(scene, cfg)

    def reshape(c):
        return c.reshape(H, W, N)

    o = Vec3(reshape(o.x), reshape(o.y), reshape(o.z))
    d = Vec3(reshape(d.x), reshape(d.y), reshape(d.z))

    ray_spec = P("rows", None, "samples")

    @jax.shard_map(
        mesh=mesh,
        in_specs=(ray_spec, ray_spec, P()),
        out_specs=(P("rows", None), jax.sharding.PartitionSpec()),
        check_vma=False,
    )
    def shard_render(o_shard, d_shard, scene_rep):
        h_loc, w, n_loc = o_shard.x.shape

        def flat(c):
            return c.reshape(-1)

        of = Vec3(flat(o_shard.x), flat(o_shard.y), flat(o_shard.z))
        df = Vec3(flat(d_shard.x), flat(d_shard.y), flat(d_shard.z))
        color, rays = trace_batch(
            scene_rep, of, df, cfg, count_rays=True
        )

        def unflat_sum(c):
            # local partial sum over this chip's sample slice
            return c.reshape(h_loc, w, n_loc).sum(axis=-1)

        partial = Vec3(
            unflat_sum(color.x), unflat_sum(color.y), unflat_sum(color.z)
        )
        # combine sample partials across the 'samples' axis, then average
        total = Vec3(
            jax.lax.psum(partial.x, "samples") * (1.0 / N),
            jax.lax.psum(partial.y, "samples") * (1.0 / N),
            jax.lax.psum(partial.z, "samples") * (1.0 / N),
        )
        rays_total = jax.lax.psum(
            jax.lax.psum(rays, "samples"), "rows"
        )
        return total, rays_total

    fb_band, rays = shard_render(o, d, scene)
    return fb_band, rays


def make_sharded_frame_fn(scene: Scene, cfg: RenderConfig, mesh: Mesh,
                          encode: str = "ansi"):
    """jit-compiled t -> encoded frame over the mesh. ``encode`` selects
    'ansi' (uint8 escape buffer) or 'rgb' ((H, W, 3) uint8)."""
    from ttrt.frames import orbit_camera_frame

    enc = encode_ansi_frame if encode == "ansi" else encode_rgb_frame

    @jax.jit
    def frame(t):
        fr = jax.tree.map(
            lambda a: a.astype(cfg.dtype), orbit_camera_frame(t, cfg.dtype)
        )
        s = scene.with_camera_frame(fr)
        fb, rays = render_frame_sharded(s, cfg, mesh)
        return enc(fb), rays

    return frame


def check_pathtrace_mesh(cfg: RenderConfig, mesh: Mesh) -> None:
    """CLI-facing validation for --pathtrace --mesh: the path tracer
    shards samples (no geometry axis) and needs an even spp split."""
    from ttrt.config import ConfigError

    if "objects" in mesh.axis_names:
        raise ConfigError(
            "--pathtrace shards samples, not geometry: use a "
            "ROWSxSAMPLES --mesh (no objects factor)"
        )
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    if cfg.rays_per_pixel % n_dev:
        raise ConfigError(
            f"--pathtrace --mesh: --spp {cfg.rays_per_pixel} not "
            f"divisible by {n_dev} devices"
        )


def pathtrace_frame_sharded_pallas(
    scene, lights, cfg: RenderConfig, fseed, mesh: Mesh, *,
    interpret: bool = False,
) -> Vec3:
    """pathtrace_frame_sharded with the counter-RNG Pallas sampler as
    each device's estimator (same contract: every device renders the
    full image at spp/n_devices, unclipped radiance sums psum-combine,
    one global divide + clip). ``fseed`` is the int32 frame seed; each
    device hashes in its flattened mesh index so streams decorrelate
    exactly as the kernel's purpose-stream tests pin."""
    from ttrt.kernels.pathtrace_pallas import _mix32, pathtrace_frame_pallas

    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    if cfg.rays_per_pixel % n:
        raise ValueError(
            f"rays_per_pixel {cfg.rays_per_pixel} not divisible by "
            f"{n} devices"
        )
    cfg_loc = cfg.with_(rays_per_pixel=cfg.rays_per_pixel // n)
    inv_n = 1.0 / cfg.rays_per_pixel
    axes = tuple(mesh.axis_names)

    @jax.shard_map(
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    def body(scene_rep, fs):
        idx = jax.lax.axis_index(axes[0])
        for a in axes[1:]:
            idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
        dev_seed = (
            _mix32((idx + 1).astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
            ^ fs.astype(jnp.uint32)
        ).astype(jnp.int32)
        fb = pathtrace_frame_pallas(
            scene_rep, lights, cfg_loc, dev_seed, reduce="sum",
            interpret=interpret,
        )
        return Vec3(
            jnp.clip(jax.lax.psum(fb.x, axes) * inv_n, 0.0, 1.0),
            jnp.clip(jax.lax.psum(fb.y, axes) * inv_n, 0.0, 1.0),
            jnp.clip(jax.lax.psum(fb.z, axes) * inv_n, 0.0, 1.0),
        )

    return body(scene, jnp.asarray(fseed, jnp.int32))


def pathtrace_frame_sharded(
    scene, lights, cfg: RenderConfig, key, mesh: Mesh,
) -> Vec3:
    """Config-5 path tracing over the device mesh. Stochastic AA samples
    are embarrassingly parallel, so EVERY device (both mesh axes
    flattened into one sample pool) renders the full image at
    spp/n_devices with an independently folded key; one psum combines the
    unclipped radiance sums and the divide + clip happen once globally —
    the sharded estimator is the single-chip estimator with the same
    total sample count, not an average of clipped partial means."""
    from ttrt.render.pathtrace import pathtrace_frame

    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    if cfg.rays_per_pixel % n:
        raise ValueError(
            f"rays_per_pixel {cfg.rays_per_pixel} not divisible by "
            f"{n} devices"
        )
    cfg_loc = cfg.with_(rays_per_pixel=cfg.rays_per_pixel // n)
    inv_n = 1.0 / cfg.rays_per_pixel
    axes = tuple(mesh.axis_names)

    @jax.shard_map(
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    def body(scene_rep, key_rep):
        idx = jax.lax.axis_index(axes[0])
        for a in axes[1:]:
            idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
        k = jax.random.fold_in(key_rep, idx)
        fb = pathtrace_frame(scene_rep, lights, cfg_loc, k, reduce="sum")
        return Vec3(
            jnp.clip(jax.lax.psum(fb.x, axes) * inv_n, 0.0, 1.0),
            jnp.clip(jax.lax.psum(fb.y, axes) * inv_n, 0.0, 1.0),
            jnp.clip(jax.lax.psum(fb.z, axes) * inv_n, 0.0, 1.0),
        )

    return body(scene, key)


def render_frame_sharded_mesh_fused(
    scene, cfg: RenderConfig, mesh: Mesh, *, interpret: bool = False,
    tile_rows: int = None,
) -> Tuple[Vec3, jnp.ndarray]:
    """Multi-chip rendering of a many-object MeshScene through the
    monolithic fused kernel (ttrt.kernels.mesh_fused) over the
    ('rows', 'samples') mesh. Rays are embarrassingly parallel, so the
    sharding is identical to render_frame_sharded_pallas: each device
    renders its (row band x AA-sample slice) in ONE kernel launch — the
    cluster pack, AABB table and visit order are replicated — and one
    psum over 'samples' combines per-pixel partial sums before the global
    divide (TerminalRayTracer.c:1061-1065 reassociated across chips).

    ``interpret=True`` validates the shard_map plumbing on a virtual CPU
    mesh (the driver dryrun's tier-3 path)."""
    from ttrt.kernels.mesh_fused import TILE_ROWS, render_band_mesh_fused

    if tile_rows is None:
        # production default on TPU; interpret (CPU validation) programs
        # use the small tile the fused parity tests use — the full 16-row
        # body takes XLA:CPU many minutes to compile
        tile_rows = 8 if interpret else TILE_ROWS
    _check_divisible(cfg, mesh)
    n_rows_axis = mesh.shape["rows"]
    n_samp_axis = mesh.shape.get("samples", 1)
    rows_per = cfg.height // n_rows_axis
    samples_per = cfg.rays_per_pixel // n_samp_axis
    inv_n = 1.0 / cfg.rays_per_pixel

    @jax.shard_map(
        mesh=mesh,
        in_specs=(P(),),
        out_specs=(P("rows", None), P()),
        check_vma=False,
    )
    def body(scene_rep):
        i = jax.lax.axis_index("rows")
        j = jax.lax.axis_index("samples")
        fb, count = render_band_mesh_fused(
            scene_rep, cfg,
            (i * rows_per).astype(cfg.dtype), rows_per,
            sample_offset=(j * samples_per).astype(cfg.dtype),
            n_samples=samples_per,
            interpret=interpret,
            tile_rows=tile_rows,
            reduce="sum",
        )
        fb = Vec3(
            jax.lax.psum(fb.x, "samples") * inv_n,
            jax.lax.psum(fb.y, "samples") * inv_n,
            jax.lax.psum(fb.z, "samples") * inv_n,
        )
        total = jax.lax.psum(jax.lax.psum(count, "samples"), "rows")
        return fb, total

    return body(scene)


def render_frame_sharded_pallas(
    scene: Scene, cfg: RenderConfig, mesh: Mesh, *, interpret: bool = False
) -> Tuple[Vec3, jnp.ndarray]:
    """Multi-chip rendering through the PALLAS kernel over the full
    ('rows', 'samples') mesh: each device runs the kernel on its own
    (horizontal band x AA-sample slice) — the band's row offset and the
    slice's sample offset come from lax.axis_index, threaded into the
    kernel's in-SMEM camera block — so the hand-tiled production path
    scales with the same sharding axes as the XLA path. Per-pixel sample
    partial SUMS are combined with one psum over 'samples' before the
    divide by the global sample count (exactly the reference's Σ/N,
    TerminalRayTracer.c:1061-1065, reassociated across chips).

    ``interpret=True`` runs the kernel in interpreter mode — how the CPU
    test mesh validates this path without TPU hardware."""
    from ttrt.kernels.render_pallas import render_band_pallas

    _check_divisible(cfg, mesh)
    n_rows_axis = mesh.shape["rows"]
    n_samp_axis = mesh.shape.get("samples", 1)
    rows_per = cfg.height // n_rows_axis
    samples_per = cfg.rays_per_pixel // n_samp_axis
    inv_n = 1.0 / cfg.rays_per_pixel

    @jax.shard_map(
        mesh=mesh,
        in_specs=(P(),),
        out_specs=(P("rows", None), P()),
        check_vma=False,
    )
    def body(scene_rep):
        i = jax.lax.axis_index("rows")
        j = jax.lax.axis_index("samples")
        fb, count = render_band_pallas(
            scene_rep, cfg,
            (i * rows_per).astype(cfg.dtype), rows_per,
            sample_offset=(j * samples_per).astype(cfg.dtype),
            n_samples=samples_per,
            interpret=interpret,
            reduce="sum",
        )
        fb = Vec3(
            jax.lax.psum(fb.x, "samples") * inv_n,
            jax.lax.psum(fb.y, "samples") * inv_n,
            jax.lax.psum(fb.z, "samples") * inv_n,
        )
        total = jax.lax.psum(jax.lax.psum(count, "samples"), "rows")
        return fb, total

    return body(scene)
