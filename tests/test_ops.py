"""Geometry-op correctness vs dense numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from puflow_tpu.ops import (
    chamfer_distance,
    chamfer_parts,
    emd_auction,
    emd_loss,
    farthest_point_sample,
    gather_points,
    hausdorff_distance,
    knn_indices,
    pairwise_sqdist,
)

KEY = jax.random.PRNGKey(0)


def _rand(key, shape):
    return jax.random.uniform(key, shape, dtype=jnp.float32)


class TestKnn:
    def test_pairwise_matches_numpy(self):
        x = _rand(KEY, (2, 9, 3))
        y = _rand(jax.random.PRNGKey(1), (2, 13, 3))
        got = np.asarray(pairwise_sqdist(x, y))
        xn, yn = np.asarray(x), np.asarray(y)
        want = ((xn[:, :, None, :] - yn[:, None, :, :]) ** 2).sum(-1)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_knn_indices(self):
        x = _rand(KEY, (2, 40, 3))
        idx = np.asarray(knn_indices(x, x, 5))
        d = ((np.asarray(x)[:, :, None, :] -
              np.asarray(x)[:, None, :, :]) ** 2).sum(-1)
        want = np.argsort(d, axis=-1, kind="stable")[:, :, :5]
        # compare the neighbour *distance sets* (index ties may reorder)
        got_d = np.take_along_axis(d, idx, axis=-1)
        want_d = np.take_along_axis(d, want, axis=-1)
        np.testing.assert_allclose(np.sort(got_d, -1), np.sort(want_d, -1),
                                   atol=1e-5)
        # first neighbour of a self-query is the point itself
        assert (idx[:, :, 0] == np.arange(40)[None, :]).all()

    def test_gather(self):
        pts = _rand(KEY, (2, 10, 3))
        idx = jnp.array([[[0, 1], [2, 3]], [[4, 5], [6, 7]]], dtype=jnp.int32)
        out = np.asarray(gather_points(pts, idx))
        pn = np.asarray(pts)
        assert out.shape == (2, 2, 2, 3)
        np.testing.assert_allclose(out[0, 0, 1], pn[0, 1])
        np.testing.assert_allclose(out[1, 1, 0], pn[1, 6])


class TestFps:
    def test_fps_spreads(self):
        # clusters far apart: fps must pick one point from each
        centers = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0], [0, 0, 10]],
                           dtype=np.float32)
        pts = np.concatenate(
            [c + 0.1 * np.random.RandomState(i).randn(25, 3).astype(np.float32)
             for i, c in enumerate(centers)])
        idx = np.asarray(farthest_point_sample(jnp.asarray(pts)[None], 4))[0]
        clusters = set(idx // 25)
        assert clusters == {0, 1, 2, 3}
        assert idx[0] == 0  # deterministic start

    def test_fps_matches_greedy_oracle(self):
        pts = np.random.RandomState(0).rand(50, 3).astype(np.float32)
        m = 10
        got = np.asarray(farthest_point_sample(jnp.asarray(pts)[None], m))[0]
        # greedy numpy oracle
        sel = [0]
        dist = np.full(50, np.inf)
        for _ in range(m - 1):
            d = ((pts - pts[sel[-1]]) ** 2).sum(-1)
            dist = np.minimum(dist, d)
            sel.append(int(np.argmax(dist)))
        np.testing.assert_array_equal(got, np.array(sel))

    def test_seeded_fps_matches_greedy_oracle(self):
        from puflow_tpu.ops.fps import farthest_point_sample_seeded_xla

        rng = np.random.RandomState(1)
        pts = rng.rand(60, 3).astype(np.float32)
        seeds = rng.rand(17, 3).astype(np.float32)
        m = 12
        got = np.asarray(farthest_point_sample_seeded_xla(
            jnp.asarray(pts)[None], jnp.asarray(seeds)[None], m))[0]
        # oracle: mind = distance to nearest seed; select-then-update
        dist = ((pts[:, None, :] - seeds[None, :, :]) ** 2).sum(-1).min(1)
        sel = []
        for _ in range(m):
            nxt = int(np.argmax(dist))
            sel.append(nxt)
            dist = np.minimum(dist, ((pts - pts[nxt]) ** 2).sum(-1))
        np.testing.assert_array_equal(got, np.array(sel))

    def test_seeded_fps_pallas_matches_xla_exact(self):
        # Integer coordinates make BOTH distance formulations bit-exact
        # (the kernel seeds via the expanded |p|^2 - 2p.s + |s|^2 MXU form,
        # the XLA path via the delta form; on floats they round near-ties
        # differently — quality-gated, not index-gated). Ragged sizes
        # exercise both lane paddings (N=150 -> 256 lanes, S=33 -> 128
        # with replicated-seed padding); duplicate grid points exercise
        # first-occurrence tie-breaking.
        from puflow_tpu.ops.fps import farthest_point_sample_seeded_xla
        from puflow_tpu.ops.pallas.fps_pallas import (
            farthest_point_sample_seeded_pallas,
        )

        rng = np.random.RandomState(2)
        pts = jnp.asarray(rng.randint(0, 11, (2, 150, 3)).astype(np.float32))
        seeds = jnp.asarray(rng.randint(0, 11, (2, 33, 3)).astype(np.float32))
        ker = farthest_point_sample_seeded_pallas(pts, seeds, 20,
                                                  interpret=True)
        ref = farthest_point_sample_seeded_xla(pts, seeds, 20)
        np.testing.assert_array_equal(np.asarray(ker), np.asarray(ref))

    def test_seeded_fps_pallas_matches_xla_floats(self):
        # On random floats the two rounding schemes flip near-tie picks
        # (one early flip then reorders the whole tail), so positional
        # index equality is the wrong invariant. Check the FPS OBJECTIVE
        # instead: the coverage radius (max over candidates of the
        # min-distance to seeds + selected) must match the XLA path's,
        # and the selected SETS must overlap strongly.
        from puflow_tpu.ops.fps import farthest_point_sample_seeded_xla
        from puflow_tpu.ops.pallas.fps_pallas import (
            farthest_point_sample_seeded_pallas,
        )

        rng = np.random.RandomState(3)
        pts_np = rng.rand(2, 150, 3).astype(np.float32)
        seeds_np = rng.rand(2, 33, 3).astype(np.float32)
        pts, seeds = jnp.asarray(pts_np), jnp.asarray(seeds_np)
        m = 40
        ker = np.asarray(farthest_point_sample_seeded_pallas(
            pts, seeds, m, interpret=True))
        ref = np.asarray(farthest_point_sample_seeded_xla(pts, seeds, m))

        def coverage(sel, b):
            chosen = np.concatenate([seeds_np[b], pts_np[b][sel]])
            d = ((pts_np[b][:, None] - chosen[None]) ** 2).sum(-1)
            return d.min(1).max()

        for b in range(2):
            overlap = len(set(ker[b]) & set(ref[b])) / m
            assert overlap >= 0.7, f"cloud {b}: set overlap {overlap}"
            ck, cr = coverage(ker[b], b), coverage(ref[b], b)
            # a flipped near-tie pick wiggles the greedy coverage radius a
            # few percent either way on a fixture this small
            assert ck <= cr * 1.15 + 1e-7, (
                f"cloud {b}: kernel coverage radius {ck} vs xla {cr}")

    def test_seeded_fps_pallas_row_chunking(self, monkeypatch):
        # Oversized batches split into row-chunks (independent rows);
        # results must equal the unchunked kernel exactly. B=18 with a
        # 1-row budget chunks as 8/8/2 (8 is the floor); jit caches key on
        # shapes only, so clear them after patching the budget.
        from puflow_tpu.ops.pallas import fps_pallas

        rng = np.random.RandomState(5)
        pts = jnp.asarray(rng.randint(0, 11, (18, 140, 3)).astype(np.float32))
        seeds = jnp.asarray(rng.randint(0, 11, (18, 20, 3)).astype(np.float32))
        whole = np.asarray(fps_pallas.farthest_point_sample_seeded_pallas(
            pts, seeds, 16, interpret=True))
        monkeypatch.setattr(fps_pallas, "_VMEM_BUDGET", 256 * 4 * 10)
        jax.clear_caches()
        chunked = np.asarray(fps_pallas.farthest_point_sample_seeded_pallas(
            pts, seeds, 16, interpret=True))
        jax.clear_caches()  # don't leak budget-patched traces to other tests
        np.testing.assert_array_equal(whole, chunked)

    def test_seeded_fps_grouped(self):
        # Grouped two-level selection: indices must land on the right
        # strided subsets in step-major interleave order, be unique, and
        # keep the FPS objective (coverage radius) close to exact.
        from puflow_tpu.ops.fps import (
            farthest_point_sample_seeded,
            farthest_point_sample_seeded_grouped,
        )

        rng = np.random.RandomState(4)
        pts_np = rng.rand(2, 160, 3).astype(np.float32)
        seeds_np = rng.rand(2, 33, 3).astype(np.float32)
        pts, seeds = jnp.asarray(pts_np), jnp.asarray(seeds_np)
        m, G = 40, 4
        got = np.asarray(
            farthest_point_sample_seeded_grouped(pts, seeds, m, G))
        assert got.shape == (2, m)
        # step-major interleave: position i belongs to group i % G
        assert (got % G == np.arange(m)[None] % G).all()
        for b in range(2):
            assert len(set(got[b])) == m, "duplicate selections"

        exact = np.asarray(farthest_point_sample_seeded(pts, seeds, m))

        def coverage(sel, b):
            chosen = np.concatenate([seeds_np[b], pts_np[b][sel]])
            d = ((pts_np[b][:, None] - chosen[None]) ** 2).sum(-1)
            return d.min(1).max()

        for b in range(2):
            cg, ce = coverage(got[b], b), coverage(exact[b], b)
            assert cg <= ce * 2.0 + 1e-7, (
                f"cloud {b}: grouped coverage radius {cg} vs exact {ce}")

        # non-dividing shapes fall back to the exact seeded path
        odd = np.asarray(
            farthest_point_sample_seeded_grouped(pts[:, :159], seeds, m, G))
        ref = np.asarray(
            farthest_point_sample_seeded(pts[:, :159], seeds, m))
        np.testing.assert_array_equal(odd, ref)

    def test_seeded_fps_partitioned(self):
        # Spatially-partitioned grouping: valid unique indices, and the
        # union's NN-distance uniformity must stay near the exact seeded
        # FPS (the property strided grouping loses — the round-3d fix).
        from puflow_tpu.ops.fps import (
            farthest_point_sample_seeded,
            farthest_point_sample_seeded_grouped,
            farthest_point_sample_seeded_partitioned,
        )

        rng = np.random.RandomState(7)
        u = rng.randn(2, 2048, 3).astype(np.float32)
        u /= np.linalg.norm(u, axis=-1, keepdims=True)      # sphere surface
        s = rng.randn(2, 256, 3).astype(np.float32)
        s /= np.linalg.norm(s, axis=-1, keepdims=True)
        pts, seeds = jnp.asarray(u), jnp.asarray(s)
        m, G = 768, 8

        part = np.asarray(
            farthest_point_sample_seeded_partitioned(pts, seeds, m, G))
        assert part.shape == (2, m)
        assert part.min() >= 0 and part.max() < u.shape[1]
        for b in range(2):
            assert len(set(part[b])) == m, "duplicate selections"

        def nn_uni(sel, b):
            out = np.concatenate([s[b], u[b][sel]])
            d = ((out[:, None] - out[None]) ** 2).sum(-1)
            np.fill_diagonal(d, np.inf)
            nn = np.sqrt(d.min(1))
            return nn.std() / nn.mean()

        exact = np.asarray(farthest_point_sample_seeded(pts, seeds, m))
        strided = np.asarray(
            farthest_point_sample_seeded_grouped(pts, seeds, m, G))
        for b in range(2):
            ue, up, us = nn_uni(exact[b], b), nn_uni(part[b], b), nn_uni(
                strided[b], b)
            assert up <= ue * 1.35 + 1e-7, (
                f"cloud {b}: partitioned nn-uniformity {up} vs exact {ue}")
            assert up < us, "partitioned should beat strided uniformity"

        # non-power-of-two group counts fall back to the exact path
        fb = np.asarray(
            farthest_point_sample_seeded_partitioned(pts, seeds, m, 3))
        np.testing.assert_array_equal(fb, exact)

    def test_morton_grouped_unseeded_fps(self):
        # round-4b grouped-UNION merge op: free FPS per Morton cell (no
        # seeds, no forced originals). Valid unique indices; NN-distance
        # uniformity near the exact unseeded FPS; G=1 / non-divisible
        # shapes fall back to the exact op.
        from puflow_tpu.ops.fps import (
            farthest_point_sample,
            farthest_point_sample_morton,
        )

        rng = np.random.RandomState(11)
        u = rng.randn(2, 2048, 3).astype(np.float32)
        u /= np.linalg.norm(u, axis=-1, keepdims=True)
        pts = jnp.asarray(u)
        m = 512

        def nn_uni(sel, b):
            out = u[b][sel]
            d = ((out[:, None] - out[None]) ** 2).sum(-1)
            np.fill_diagonal(d, np.inf)
            nn = np.sqrt(d.min(1))
            return nn.std() / nn.mean()

        exact = np.asarray(farthest_point_sample(pts, m, use_pallas=False))
        for G in (4, 8):
            mo = np.asarray(farthest_point_sample_morton(
                pts, m, G, use_pallas=False))
            assert mo.shape == (2, m)
            for b in range(2):
                assert len(set(mo[b].tolist())) == m
                # unseeded cells crowd at cell BOUNDARIES (each cell's
                # FPS is blind to its neighbours' picks): measured
                # NN-uniformity ~1.6x exact at G=4 / ~2.2x at G=8 at this
                # SMALL scale (512/256 candidates per cell; the real
                # merge's cells are ~16x larger with relatively thinner
                # boundaries). Pin the G=4 envelope; whether any G is
                # acceptable at protocol scale is decided by the 127-mesh
                # side-by-side gate (QUALITY.md round-4b), not this test.
                if G == 4:
                    assert nn_uni(mo[b], b) < nn_uni(exact[b], b) * 2.0
        same = np.asarray(farthest_point_sample_morton(
            pts, m, 1, use_pallas=False))
        np.testing.assert_array_equal(same, exact)
        fb = np.asarray(farthest_point_sample_morton(
            pts[:, :2047], m, 4, use_pallas=False))  # 2047 % 4 != 0
        np.testing.assert_array_equal(
            fb, np.asarray(farthest_point_sample(
                pts[:, :2047], m, use_pallas=False)))

    def test_seeded_fps_morton(self):
        # Morton-chunk grouping (the shipped merge fast path): valid
        # unique indices; NN-distance uniformity must stay near the exact
        # seeded FPS and beat strided grouping — same quality bar as the
        # kd partition it replaces (at 1/log2(G) the sort cost).
        from puflow_tpu.ops.fps import (
            farthest_point_sample_seeded,
            farthest_point_sample_seeded_grouped,
            farthest_point_sample_seeded_morton,
        )

        rng = np.random.RandomState(7)
        u = rng.randn(2, 2048, 3).astype(np.float32)
        u /= np.linalg.norm(u, axis=-1, keepdims=True)      # sphere surface
        s = rng.randn(2, 256, 3).astype(np.float32)
        s /= np.linalg.norm(s, axis=-1, keepdims=True)
        pts, seeds = jnp.asarray(u), jnp.asarray(s)
        m = 768

        def nn_uni(sel, b):
            out = np.concatenate([s[b], u[b][sel]])
            d = ((out[:, None] - out[None]) ** 2).sum(-1)
            np.fill_diagonal(d, np.inf)
            nn = np.sqrt(d.min(1))
            return nn.std() / nn.mean()

        exact = np.asarray(farthest_point_sample_seeded(pts, seeds, m))
        for G in (8, 16):
            mo = np.asarray(
                farthest_point_sample_seeded_morton(pts, seeds, m, G))
            assert mo.shape == (2, m)
            assert mo.min() >= 0 and mo.max() < u.shape[1]
            strided = np.asarray(
                farthest_point_sample_seeded_grouped(pts, seeds, m, G))
            for b in range(2):
                assert len(set(mo[b])) == m, "duplicate selections"
                ue, um, us = (nn_uni(exact[b], b), nn_uni(mo[b], b),
                              nn_uni(strided[b], b))
                assert um <= ue * 1.35 + 1e-7, (
                    f"G={G} cloud {b}: morton nn-uniformity {um} vs "
                    f"exact {ue}")
                assert um < us, "morton should beat strided uniformity"

        # shapes that don't divide fall back to the exact path
        fb = np.asarray(
            farthest_point_sample_seeded_morton(pts, seeds, m, 7))
        np.testing.assert_array_equal(fb, exact)

    def test_morton_key_duplicates_adjacent(self):
        # duplicate coordinates share a key, so a stable sort keeps them
        # adjacent -> same Morton cell (the property that stops double
        # -picking across groups)
        from puflow_tpu.ops.fps import _morton_key

        rng = np.random.RandomState(3)
        base = rng.randn(1, 512, 3).astype(np.float32)
        dup = np.concatenate([base, base[:, :100]], axis=1)
        keys = np.asarray(_morton_key(jnp.asarray(dup)))
        np.testing.assert_array_equal(keys[0, :100], keys[0, 512:])


class TestChamfer:
    def test_parts_vs_numpy(self):
        x = _rand(KEY, (2, 8, 3))
        y = _rand(jax.random.PRNGKey(2), (2, 11, 3))
        d_xy, i_xy, d_yx, i_yx = chamfer_parts(x, y)
        d = ((np.asarray(x)[:, :, None, :] -
              np.asarray(y)[:, None, :, :]) ** 2).sum(-1)
        np.testing.assert_allclose(d_xy, d.min(-1), atol=1e-5)
        np.testing.assert_allclose(d_yx, d.min(-2), atol=1e-5)
        np.testing.assert_array_equal(i_xy, d.argmin(-1))
        np.testing.assert_array_equal(i_yx, d.argmin(-2))

    def test_identity_is_zero(self):
        x = _rand(KEY, (2, 16, 3))
        assert float(chamfer_distance(x, x)) < 1e-6
        np.testing.assert_allclose(hausdorff_distance(x, x), 0.0, atol=1e-6)


class TestEmd:
    def test_perfect_match_is_zero(self):
        x = _rand(KEY, (2, 64, 3))
        perm = jax.random.permutation(jax.random.PRNGKey(3), 64)
        y = x[:, perm]
        dist, assignment = emd_auction(x, y, eps=0.002, iters=200)
        # matched distance should be ~0: auction finds the permutation
        assert float(jnp.mean(dist)) < 1e-3

    def test_emd_close_to_optimal_on_small_problem(self):
        rng = np.random.RandomState(0)
        x = rng.rand(1, 32, 3).astype(np.float32)
        y = rng.rand(1, 32, 3).astype(np.float32)
        dist, assignment = emd_auction(jnp.asarray(x), jnp.asarray(y),
                                       eps=0.001, iters=500)
        got = float(jnp.sum(jnp.sqrt(dist)))
        # optimal assignment via scipy-free Hungarian oracle (brute force on
        # euclidean cost using lapjv-style greedy refinement is overkill —
        # use scipy if available, else check against a permutation bound)
        from scipy.optimize import linear_sum_assignment

        cost = np.sqrt(((x[0, :, None, :] - y[0, None, :, :]) ** 2).sum(-1))
        ri, ci = linear_sum_assignment(cost)
        optimal = cost[ri, ci].sum()
        assert got <= optimal * 1.05 + 1e-4
        # assignment is a bijection when the auction converges
        assert len(set(np.asarray(assignment)[0].tolist())) == 32

    def test_gradient_matches_reference_rule(self):
        x = _rand(KEY, (1, 16, 3))
        y = _rand(jax.random.PRNGKey(5), (1, 16, 3))

        grad = jax.grad(lambda a: emd_loss(a, y, eps=0.01, iters=100))(x)
        _, assignment = emd_auction(x, y, eps=0.01, iters=100)
        matched = np.asarray(y)[0][np.asarray(assignment)[0]]
        want = 2.0 * (np.asarray(x)[0] - matched)
        np.testing.assert_allclose(np.asarray(grad)[0], want, atol=1e-5)


class TestEmdPallas:
    def test_matches_xla_formulation(self):
        """Pallas kernel (interpret mode) == dense XLA auction, exactly."""
        from puflow_tpu.ops.pallas.emd_pallas import emd_auction_pallas

        x1 = jax.random.uniform(jax.random.PRNGKey(7), (2, 64, 3))
        x2 = jax.random.uniform(jax.random.PRNGKey(8), (2, 64, 3))
        d_ref, a_ref = emd_auction(x1, x2, 0.005, 50)
        d_p, a_p = emd_auction_pallas(x1, x2, 0.005, 50, interpret=True)
        np.testing.assert_array_equal(np.asarray(a_ref), np.asarray(a_p))
        np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_p),
                                   atol=1e-5)


