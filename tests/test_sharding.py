"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §5: pixel-grid data parallelism; zero communication during
trace, one psum over the samples axis)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttrt.config import RenderConfig
from ttrt.assets import make_colors_skybox, skybox_from_faces
from ttrt.frames import orbit_camera_frame
from ttrt.parallel.sharding import (
    make_mesh,
    make_sharded_frame_fn,
    render_frame_sharded,
)
from ttrt.render.integrator import render_frame
from ttrt.scene import demo_scene

F64 = jnp.float64


def make_scene(t=1.0, W=32, H=16):
    sky = skybox_from_faces(make_colors_skybox(8), F64)
    scene = demo_scene(sky, W, H, F64)
    return scene.with_camera_frame(orbit_camera_frame(t, F64))


@pytest.fixture(scope="module", autouse=True)
def need_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (conftest XLA_FLAGS)")


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_matches_single_device(mesh_shape):
    n_rows, n_samp = mesh_shape
    W, H, N = 24, 16, 8
    cfg = RenderConfig(width=W, height=H, rays_per_pixel=N, dtype=F64)
    scene = make_scene(1.234, W, H)
    mesh = make_mesh(n_rows, n_samp)

    fb_ref, rays_ref = jax.jit(
        lambda s: render_frame(s, cfg, count_rays=True)
    )(scene)
    fb_sh, rays_sh = jax.jit(
        lambda s: render_frame_sharded(s, cfg, mesh)
    )(scene)

    a = np.asarray(fb_ref.to_array())
    b = np.asarray(fb_sh.to_array())
    # FP reassociation across the samples psum can reorder the AA sum
    np.testing.assert_allclose(a, b, atol=1e-12)
    assert int(rays_ref) == int(rays_sh)


def test_indivisible_height_rejected():
    cfg = RenderConfig(width=8, height=10, rays_per_pixel=8, dtype=F64)
    scene = make_scene(1.0, 8, 10)
    mesh = make_mesh(8, 1)
    with pytest.raises(ValueError, match="not divisible"):
        render_frame_sharded(scene, cfg, mesh)


def test_sharded_frame_fn_ansi():
    W, H, N = 16, 8, 2
    cfg = RenderConfig(width=W, height=H, rays_per_pixel=N, dtype=F64)
    sky = skybox_from_faces(make_colors_skybox(8), F64)
    scene = demo_scene(sky, W, H, F64)
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    frame = make_sharded_frame_fn(scene, cfg, mesh, encode="ansi")
    buf, rays = frame(jnp.asarray(1.0, F64))
    from ttrt.term.encoder import ansi_buffer_size

    assert buf.shape == (ansi_buffer_size(W, H),)
    assert bytes(np.asarray(buf[:6])) == b"\033[0;0H"
    assert int(rays) > 0


class TestShardedMeshScene:
    """The many-object tier shards identically to the demo tier: rays are
    independent, the grid + triangles replicate, zero cross-chip traffic
    during traversal."""

    def test_mesh_scene_sharded_matches_single(self):
        import numpy as np
        from ttrt.assets import make_colors_skybox, skybox_from_faces
        from ttrt.config import RenderConfig
        from ttrt.mesh import many_sphere_scene
        from ttrt.parallel.sharding import make_mesh, render_frame_sharded
        from ttrt.render.integrator import render_frame

        cfg = RenderConfig(width=16, height=8, rays_per_pixel=2,
                           bounce_limit=3, dtype=jnp.float32)
        scene = many_sphere_scene(
            skybox_from_faces(make_colors_skybox(8), jnp.float32),
            n_spheres=32, width_px=cfg.width, height_px=cfg.height,
            floor_cells=2,
        )
        mesh = make_mesh(4, 2)
        fb_s, rays_s = jax.jit(
            lambda s: render_frame_sharded(s, cfg, mesh)
        )(scene)
        fb, rays = jax.jit(
            lambda s: render_frame(s, cfg, count_rays=True)
        )(scene)
        np.testing.assert_allclose(
            np.asarray(fb_s.to_array()), np.asarray(fb.to_array()),
            atol=1e-5,
        )
        assert int(rays_s) == int(rays)


@pytest.mark.slow
class TestShardedPallas:
    """The Pallas kernel path under shard_map (interpret mode on the CPU
    test mesh): per-device row bands must reassemble into the full frame."""

    @pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
    def test_pallas_mesh_matches_single_device(self, mesh_shape):
        import numpy as np
        from ttrt.assets import load_skybox
        from ttrt.config import RenderConfig
        from ttrt.kernels.render_pallas import render_frame_pallas
        from ttrt.parallel.sharding import (
            make_mesh,
            render_frame_sharded_pallas,
        )
        from ttrt.scene import demo_scene

        cfg = RenderConfig(width=32, height=16, rays_per_pixel=4,
                           bounce_limit=4, dtype=jnp.float32)
        scene = demo_scene(load_skybox("colors"), 32, 16, jnp.float32)
        mesh = make_mesh(*mesh_shape)

        fb_s, rays_s = jax.jit(
            lambda s: render_frame_sharded_pallas(
                s, cfg, mesh, interpret=True
            )
        )(scene)
        fb, rays = render_frame_pallas(scene, cfg, interpret=True)

        ref = np.asarray(fb.to_array())
        shd = np.asarray(fb_s.to_array())
        assert shd.shape == ref.shape
        # Per-ray math is bit-identical across shardings (row/sample
        # offsets enter ray generation as exact small-integer f32 adds);
        # the ONLY legal difference is reassociation of the per-pixel AA
        # sum (local partial sums + psum vs one flat sum): a couple of
        # ulps, never a branch flip.
        np.testing.assert_allclose(ref, shd, rtol=0.0, atol=4e-7)
        # quantized-u8 output must be bit-equal except at channels the
        # oracle places within half the reassociation error of a u8
        # truncation boundary (enumerated, not a blanket tolerance)
        q_ref = np.clip((ref.astype(np.float64) * 255).astype(np.int32),
                        0, 255)
        q_shd = np.clip((shd.astype(np.float64) * 255).astype(np.int32),
                        0, 255)
        boundary = np.abs(ref.astype(np.float64) * 255
                          - np.round(ref.astype(np.float64) * 255))
        flips = q_ref != q_shd
        assert not (flips & (boundary > 1e-3)).any(), (
            "quantized flip away from a truncation boundary"
        )
        # the trace schedule is identical, not merely close
        assert int(rays_s) == int(rays)


class TestShardedPathtrace:
    """Config-5 stochastic tier: sample-sharded over every mesh device."""

    def test_pathtrace_sharded_runs_and_is_sane(self):
        import numpy as np
        from ttrt.parallel.sharding import (
            make_mesh,
            pathtrace_frame_sharded,
        )
        from ttrt.render.pathtrace import AreaLights

        f32 = jnp.float32
        cfg = RenderConfig(width=16, height=8, rays_per_pixel=8,
                           bounce_limit=2, dtype=f32)
        sky = skybox_from_faces(make_colors_skybox(8), f32)
        scene = demo_scene(sky, cfg.width, cfg.height, f32)
        scene = scene.with_camera_frame(orbit_camera_frame(1.0, f32))
        lights = AreaLights.create(
            positions=[[0.0, 3.0, 0.0]], radii=[0.5],
            colors=[[1.0, 1.0, 1.0]], intensities=[10.0], dtype=f32,
        )
        mesh = make_mesh(4, 2)
        fb = pathtrace_frame_sharded(
            scene, lights, cfg, jax.random.PRNGKey(0), mesh
        )
        a = np.asarray(fb.to_array())
        assert a.shape == (cfg.height, cfg.width, 3)
        assert np.isfinite(a).all()
        assert a.min() >= 0.0 and a.max() <= 1.0
        assert a.std() > 0.01  # an actual image, not a constant

    @pytest.mark.slow
    def test_pathtrace_sharded_pallas_runs_and_is_sane(self):
        """The counter-RNG Pallas sampler as each device's estimator
        (interpret mode on the CPU mesh): every device renders the full
        image at spp/8 with a hashed-index seed; unclipped sums psum-
        combine. Slow: interpret XLA:CPU compile."""
        import numpy as np
        from ttrt.parallel.sharding import (
            make_mesh,
            pathtrace_frame_sharded_pallas,
        )
        from ttrt.render.pathtrace import AreaLights

        f32 = jnp.float32
        cfg = RenderConfig(width=16, height=8, rays_per_pixel=8,
                           bounce_limit=2, dtype=f32)
        sky = skybox_from_faces(make_colors_skybox(8), f32,
                                procedural="colors")
        scene = demo_scene(sky, cfg.width, cfg.height, f32)
        scene = scene.with_camera_frame(orbit_camera_frame(1.0, f32))
        lights = AreaLights.create(
            positions=[[0.0, 3.0, 0.0]], radii=[0.5],
            colors=[[1.0, 1.0, 1.0]], intensities=[10.0], dtype=f32,
        )
        mesh = make_mesh(4, 2)
        fb = jax.jit(
            lambda s: pathtrace_frame_sharded_pallas(
                s, lights, cfg, 7, mesh, interpret=True
            )
        )(scene)
        a = np.asarray(fb.to_array())
        assert a.shape == (cfg.height, cfg.width, 3)
        assert np.isfinite(a).all()
        assert a.min() >= 0.0 and a.max() <= 1.0
        assert a.std() > 0.01

    def test_pathtrace_indivisible_spp_rejected(self):
        from ttrt.parallel.sharding import (
            make_mesh,
            pathtrace_frame_sharded,
        )
        from ttrt.render.pathtrace import AreaLights

        f32 = jnp.float32
        cfg = RenderConfig(width=8, height=8, rays_per_pixel=3, dtype=f32)
        sky = skybox_from_faces(make_colors_skybox(8), f32)
        scene = demo_scene(sky, 8, 8, f32)
        lights = AreaLights.create(
            positions=[[0.0, 3.0, 0.0]], radii=[0.5],
            colors=[[1.0, 1.0, 1.0]], intensities=[10.0], dtype=f32,
        )
        with pytest.raises(ValueError, match="not divisible"):
            pathtrace_frame_sharded(
                scene, lights, cfg, jax.random.PRNGKey(0), make_mesh(8, 1)
            )


@pytest.mark.slow
class TestShardedMeshFused:
    """The monolithic fused mesh kernel under shard_map (interpret mode,
    tile_rows=8): each device renders its (row band x sample slice) in
    one launch; partial sums psum-combine. Tiny scene — the interpret
    compile dominates on the CPU box."""

    def test_fused_mesh_sharded_matches_single_device(self):
        import numpy as np
        from ttrt.assets import make_colors_skybox, skybox_from_faces
        from ttrt.config import RenderConfig
        from ttrt.kernels.mesh_fused import render_frame_mesh_fused
        from ttrt.mesh import many_sphere_scene
        from ttrt.parallel.sharding import (
            make_mesh,
            render_frame_sharded_mesh_fused,
        )

        cfg = RenderConfig(width=16, height=8, rays_per_pixel=2,
                           bounce_limit=2, dtype=jnp.float32)
        scene = many_sphere_scene(
            skybox_from_faces(make_colors_skybox(8), jnp.float32,
                              procedural="colors"),
            n_spheres=32, width_px=cfg.width, height_px=cfg.height,
            floor_cells=2,
        )
        frame = jax.tree.map(lambda a: a.astype(jnp.float32),
                             orbit_camera_frame(0.9, jnp.float32))
        scene = scene.with_camera_frame(frame)
        mesh = make_mesh(4, 2)
        fb_s, rays_s = jax.jit(
            lambda s: render_frame_sharded_mesh_fused(
                s, cfg, mesh, interpret=True
            )
        )(scene)
        fb, rays = render_frame_mesh_fused(scene, cfg, interpret=True,
                                           tile_rows=8)
        ref = np.asarray(fb.to_array())
        shd = np.asarray(fb_s.to_array())
        # per-ray math is identical; only the per-pixel AA sum
        # reassociates across the 'samples' axis (see the Pallas demo
        # sharding test above for the rationale)
        np.testing.assert_allclose(ref, shd, rtol=0.0, atol=4e-7)
        assert int(rays_s) == int(rays)


@pytest.mark.slow
class TestObjectSharded:
    """The 'objects' axis (ttrt.parallel.objects): the cluster pack's
    subcluster axis sharded across chips, ALL rays replicated, one
    pmin-pair per trace combining local winners. Geometry-parallel — the
    axis for scenes whose pack exceeds one chip's VMEM."""

    def _scene(self, cfg, n_spheres=1024):
        from ttrt.assets import make_colors_skybox, skybox_from_faces
        from ttrt.mesh import many_sphere_scene

        scene = many_sphere_scene(
            skybox_from_faces(make_colors_skybox(8), jnp.float32),
            n_spheres=n_spheres, width_px=cfg.width, height_px=cfg.height,
            floor_cells=2, seed=7,
        )
        frame = jax.tree.map(lambda a: a.astype(jnp.float32),
                             orbit_camera_frame(0.9, jnp.float32))
        return scene.with_camera_frame(frame)

    def test_sharded_nearest_matches_full_pack(self):
        """Exact (t, id) equality: 8-way sharded sweep + combine vs the
        full-pack kernel. 1024 spheres -> kb_sph 8 (1/device); the floor
        pads from kb_tri 1 to 8 (7 devices sweep only inert padding)."""
        from jax.sharding import Mesh, PartitionSpec as P

        from ttrt.kernels.mesh_pallas import cluster_nearest
        from ttrt.parallel.objects import (combine_nearest,
                                           pack_specs,
                                           pad_pack_subclusters)
        from ttrt.vec import Vec3

        cfg = RenderConfig(width=16, height=8, rays_per_pixel=1,
                           bounce_limit=1, dtype=jnp.float32)
        scene = self._scene(cfg)
        rng = np.random.default_rng(5)
        n = 256
        o = rng.uniform(-4, 4, (3, n)).astype(np.float32)
        d = rng.standard_normal((3, n)).astype(np.float32)
        d /= np.linalg.norm(d, axis=0, keepdims=True)
        o_j = jnp.asarray(o)
        d_j = jnp.asarray(d)

        gh_ref = cluster_nearest(
            scene.clusters, Vec3(*o_j), Vec3(*d_j), interpret=True,
            tile_rows=8, subs_per_page=2,
        )

        mesh = Mesh(np.array(jax.devices()[:8]), ("objects",))
        pack_p = pad_pack_subclusters(scene.clusters, 8)

        @jax.jit
        @jax.shard_map(mesh=mesh, in_specs=(pack_specs(), P(), P()),
                       out_specs=(P(), P()), check_vma=False)
        def sharded(pack, ov, dv):
            gh = cluster_nearest(pack, Vec3(*ov), Vec3(*dv),
                                 interpret=True, tile_rows=8,
                                 subs_per_page=2)
            gh = combine_nearest(gh)
            return gh.t, gh.obj

        t_s, obj_s = sharded(pack_p, o_j, d_j)
        np.testing.assert_array_equal(np.asarray(obj_s),
                                      np.asarray(gh_ref.obj))
        np.testing.assert_array_equal(np.asarray(t_s),
                                      np.asarray(gh_ref.t))

    def test_sharded_render_matches_cluster_path(self):
        """Full-frame render over the 'objects' mesh == the unsharded
        CPU render forced through the SAME cluster kernel (exact: the
        combine changes nothing without cross-shard exact-t ties)."""
        from jax.sharding import Mesh

        import ttrt.mesh.scene as ms
        from ttrt.parallel.objects import render_frame_sharded_objects

        cfg = RenderConfig(width=16, height=8, rays_per_pixel=1,
                           bounce_limit=2, dtype=jnp.float32)
        scene = self._scene(cfg, n_spheres=256)
        mesh = Mesh(np.array(jax.devices()[:8]), ("objects",))

        old = ms._FORCE_CLUSTERS
        ms._FORCE_CLUSTERS = True
        try:
            fb_ref, rays_ref = render_frame(scene, cfg, count_rays=True)
        finally:
            ms._FORCE_CLUSTERS = old
        fb_s, rays_s = jax.jit(
            lambda s: render_frame_sharded_objects(s, cfg, mesh)
        )(scene)
        np.testing.assert_array_equal(
            np.asarray(fb_s.to_array()), np.asarray(fb_ref.to_array())
        )
        assert int(rays_s) == int(rays_ref)

    def test_rows_objects_composed_mesh(self):
        """('rows', 'objects') 2D mesh: ray rows sharded AND geometry
        sharded (the dp x tp composition) must still reproduce the
        unsharded cluster-path frame exactly."""
        from jax.sharding import Mesh

        import ttrt.mesh.scene as ms
        from ttrt.parallel.objects import render_frame_sharded_objects

        cfg = RenderConfig(width=16, height=8, rays_per_pixel=1,
                           bounce_limit=2, dtype=jnp.float32)
        scene = self._scene(cfg, n_spheres=256)
        mesh = Mesh(
            np.array(jax.devices()[:8]).reshape(4, 2),
            ("rows", "objects"),
        )

        old = ms._FORCE_CLUSTERS
        ms._FORCE_CLUSTERS = True
        try:
            fb_ref, rays_ref = render_frame(scene, cfg, count_rays=True)
        finally:
            ms._FORCE_CLUSTERS = old
        fb_s, rays_s = jax.jit(
            lambda s: render_frame_sharded_objects(s, cfg, mesh)
        )(scene)
        np.testing.assert_array_equal(
            np.asarray(fb_s.to_array()), np.asarray(fb_ref.to_array())
        )
        assert int(rays_s) == int(rays_ref)


class TestCombineNearest:
    """Unit semantics of the objects-axis combine (fast: no kernels).
    Pins the contract the render tests rely on: argmin-by-t across
    shards, exact-t ties to the LOWEST id (the C scan's ascending-id
    strict-'<' semantics), misses as (inf, -1), padding-only shards
    inert."""

    def _run(self, ts, objs):
        from jax.sharding import Mesh, PartitionSpec as P

        from ttrt.mesh.grid import GridHit
        from ttrt.parallel.objects import combine_nearest

        n = len(ts)  # one (t, obj) row per device
        mesh = Mesh(np.array(jax.devices()[:n]), ("objects",))

        @jax.shard_map(mesh=mesh, in_specs=(P("objects"), P("objects")),
                       out_specs=(P(), P()), check_vma=False)
        def body(t, obj):
            gh = combine_nearest(GridHit(t=t[0], obj=obj[0]))
            return gh.t, gh.obj

        t = jnp.asarray(np.array(ts, np.float32))
        o = jnp.asarray(np.array(objs, np.int32))
        tt, oo = body(t, o)
        return np.asarray(tt), np.asarray(oo)

    def test_nearest_wins(self):
        inf = np.inf
        t, o = self._run(
            [[3.0, 2.0], [1.5, inf], [2.5, 0.5], [inf, inf]],
            [[10, 11], [20, -1], [30, 31], [-1, -1]],
        )
        np.testing.assert_array_equal(t, [1.5, 0.5])
        np.testing.assert_array_equal(o, [20, 31])

    def test_exact_tie_lowest_id(self):
        t, o = self._run(
            [[2.0], [2.0], [2.0], [5.0]],
            [[7], [3], [12], [0]],
        )
        assert t[0] == 2.0 and o[0] == 3

    def test_all_miss_and_padding_shards(self):
        inf = np.inf
        t, o = self._run(
            [[inf], [inf], [inf], [inf]],
            [[-1], [-1], [-1], [-1]],
        )
        assert np.isinf(t[0]) and o[0] == -1
