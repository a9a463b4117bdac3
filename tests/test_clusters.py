"""Cluster-culled many-object path: packing invariants, broad-phase
conservativeness, and narrow-kernel (interpret mode) parity vs the
brute-force oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ttrt.mesh.scene as mesh_scene
from ttrt.kernels.mesh_pallas import cluster_nearest
from ttrt.mesh.clusters import (BLOCK, PAGE, TILE_RAYS, live_clusters,
                                pack_clusters)
from ttrt.mesh.scene import trace_ray_mesh_brute
from ttrt.scene import HIT_SPHERE, HIT_TRIANGLE
from ttrt.vec import Vec3

from test_mesh import _random_mesh_scene, _vec



def _slots(comp) -> np.ndarray:
    """Flatten a packed (KB, 8, 16) component to Morton slot order
    (slot = k*128 + g*8 + s)."""
    return np.asarray(comp).transpose(0, 2, 1).reshape(-1)

def _rays(rng, n_rays):
    # NOTE: callers pass a LOCAL rng (not the session fixture) so this
    # file does not shift the shared draw sequence other test files'
    # expectations are anchored to.
    o = _vec(rng.uniform(-18, 18, (n_rays, 3)).astype(np.float32))
    o = Vec3(o.x, jnp.abs(o.y) + 0.5, o.z)
    d = _vec(rng.normal(size=(n_rays, 3)).astype(np.float32)).normalize()
    return o, d


class TestPacking:
    def test_permutation_and_padding(self):
        scene = _random_mesh_scene(n=300)
        pack = scene.clusters
        ids = _slots(pack.sph[4])
        real = ids[ids >= 0].astype(np.int64)
        assert sorted(real.tolist()) == list(range(300))
        assert (ids < 0).sum() == (-300) % PAGE
        tid = _slots(pack.tri[9])
        realt = tid[tid >= 0].astype(np.int64)
        m = scene.triangles.count
        assert sorted(realt.tolist()) == list(range(300, 300 + m))

    def test_aabbs_contain_members(self):
        scene = _random_mesh_scene(n=300)
        pack = scene.clusters
        sph = np.asarray(pack.sph)  # (5, 8, NB)
        ids = _slots(sph[4])
        cx = _slots(sph[0])
        cy = _slots(sph[1])
        cz = _slots(sph[2])
        # recover radius from ccr2 = |C|^2 - r^2
        r2 = cx * cx + cy * cy + cz * cz - _slots(sph[3])
        r = np.sqrt(np.maximum(r2, 0.0))
        lo = np.asarray(pack.sph_lo)
        hi = np.asarray(pack.sph_hi)
        for k in range(pack.kb_sph):
            sl = slice(k * BLOCK, (k + 1) * BLOCK)
            m = ids[sl] >= 0
            assert (cx[sl][m] - r[sl][m] >= lo[k, 0] - 1e-4).all()
            assert (cy[sl][m] - r[sl][m] >= lo[k, 1] - 1e-4).all()
            assert (cz[sl][m] - r[sl][m] >= lo[k, 2] - 1e-4).all()
            assert (cx[sl][m] + r[sl][m] <= hi[k, 0] + 1e-4).all()
            assert (cy[sl][m] + r[sl][m] <= hi[k, 1] + 1e-4).all()
            assert (cz[sl][m] + r[sl][m] <= hi[k, 2] + 1e-4).all()


@pytest.mark.slow
class TestNearestParity:
    def test_matches_brute_and_broad_phase_conservative(self):
        """ONE kernel compile (interpret mode is ~2 min of XLA:CPU compile
        per structure on this box, so the parity and broad-phase checks
        share it): the cluster path must agree with the dense tester, and
        every winning object must come from a cluster the broad phase
        kept live for that ray's tile (conservativeness — a false
        negative would silently drop intersections)."""
        scene = _random_mesh_scene(n=300)
        pack = scene.clusters
        n_rays = TILE_RAYS + 197  # exercises the ray-padding path
        o, d = _rays(np.random.default_rng(77), n_rays)
        # tile_rows=8 halves the kernel body: the production 16-row body
        # takes XLA:CPU ~10 min to compile in interpret mode on this box
        hit = jax.jit(
            lambda o, d: cluster_nearest(pack, o, d, interpret=True,
                                         tile_rows=8, subs_per_page=2)
        )(o, d)
        from ttrt.mesh.dense import dense_nearest

        ref = jax.jit(
            lambda o, d: dense_nearest(scene.spheres, scene.triangles, o, d)
        )(o, d)
        obj = np.asarray(hit.obj)
        robj = np.asarray(ref.obj)
        t = np.asarray(hit.t)
        rt = np.asarray(ref.t)
        # identical winner everywhere except exact-f32 near-ties, where
        # both must still agree on t to fp noise
        same = obj == robj
        np.testing.assert_allclose(
            t[np.isfinite(rt)], rt[np.isfinite(rt)], rtol=2e-5, atol=1e-5
        )
        assert same.mean() > 0.999, f"{(~same).sum()} winner mismatches"
        assert (np.isfinite(t) == np.isfinite(rt)).all()
        assert np.isfinite(t).any()

        # broad-phase conservativeness vs the winners just computed
        T = -(-n_rays // TILE_RAYS)
        pad = T * TILE_RAYS - n_rays
        op = Vec3(*(jnp.concatenate([v, jnp.zeros(pad, v.dtype)])
                    for v in o))
        dp = Vec3(*(jnp.concatenate([v, jnp.zeros(pad, v.dtype)])
                    for v in d))
        live = np.asarray(jax.jit(
            lambda o, d: live_clusters(pack, o, d, T)
        )(op, dp))
        ids = _slots(pack.sph[4])
        tid = _slots(pack.tri[9])
        slot_of = {int(v): s for s, v in enumerate(ids) if v >= 0}
        tslot_of = {int(v): s for s, v in enumerate(tid) if v >= 0}
        for ray in range(n_rays):
            w = int(obj[ray])
            if w < 0:
                continue
            tile = ray // TILE_RAYS
            row = (ray % TILE_RAYS) // 128  # live is row-granular (T,8,K)
            if w < 300:
                k = slot_of[w] // BLOCK
            else:
                k = pack.kb_sph + tslot_of[w] // BLOCK
            assert live[tile, row, k], (ray, row, w, k)

    def test_end_to_end_render(self):
        """Full integrator render through the cluster kernel (interpret)
        vs the normal CPU grid path."""
        from ttrt.config import RenderConfig
        from ttrt.render.integrator import render_frame

        scene = _random_mesh_scene(n=200)
        cfg = RenderConfig(width=32, height=16, rays_per_pixel=2,
                           bounce_limit=2, dtype=jnp.float32)
        fb_ref, _ = render_frame(scene, cfg, count_rays=True)
        old = mesh_scene._FORCE_CLUSTERS
        mesh_scene._FORCE_CLUSTERS = True
        try:
            fb_cl, _ = render_frame(scene, cfg, count_rays=True)
        finally:
            mesh_scene._FORCE_CLUSTERS = old
        ref = np.asarray(fb_ref.to_array())
        cl = np.asarray(fb_cl.to_array())
        diff = np.abs(ref - cl).max(axis=-1)
        # winner near-ties can flip isolated pixels; the image must agree
        assert float((diff > 1e-3).mean()) <= 0.01
        assert float(np.median(diff)) < 1e-5


@pytest.mark.slow
class TestCullDenseEquivalence:
    def test_cull_equals_dense_mode(self):
        """mode='cull' (in-kernel AABB skip) must return EXACTLY what
        mode='dense' (branch-free exhaustive) returns — a cull false
        negative would silently drop intersections."""
        scene = _random_mesh_scene(n=300)
        pack = scene.clusters
        o, d = _rays(np.random.default_rng(123), TILE_RAYS)
        kw = dict(interpret=True, tile_rows=8, subs_per_page=2)
        hc = jax.jit(
            lambda o, d: cluster_nearest(pack, o, d, mode="cull", **kw)
        )(o, d)
        hd = jax.jit(
            lambda o, d: cluster_nearest(pack, o, d, mode="dense", **kw)
        )(o, d)
        np.testing.assert_array_equal(np.asarray(hc.obj), np.asarray(hd.obj))
        np.testing.assert_array_equal(np.asarray(hc.t), np.asarray(hd.t))
        assert (np.asarray(hd.obj) >= 0).any()
