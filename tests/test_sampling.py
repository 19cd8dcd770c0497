"""Sampling strategies (sampling.cpp behaviors) + Morton codes."""
import numpy as np
import pytest

from pathtracer_gaussiansplatting_tpu.ops.morton import (
    morton2d, morton3d, morton_order_points, morton_sort_2d,
)
from pathtracer_gaussiansplatting_tpu.sampling import strategies as st


class TestMorton:
    def test_known_values(self):
        # interleave(x=1, y=0) = 1 ; interleave(x=0, y=1) = 2
        assert int(morton2d(1.5 / 32768, 0.0)) == 1
        assert int(morton2d(0.0, 1.5 / 32768)) == 2
        assert int(morton2d(1.5 / 32768, 1.5 / 32768)) == 3

    def test_sorted_locality(self, rng):
        uv = rng.uniform(size=(1024, 2)).astype(np.float32)
        s = morton_sort_2d(uv)
        # Z-order: mean distance between consecutive samples far below random
        d_sorted = np.linalg.norm(np.diff(s, axis=0), axis=1).mean()
        d_rand = np.linalg.norm(np.diff(uv, axis=0), axis=1).mean()
        assert d_sorted < 0.35 * d_rand

    def test_morton3d_order(self, rng):
        pts = rng.uniform(-5, 5, (500, 3))
        perm = morton_order_points(pts)
        assert sorted(perm.tolist()) == list(range(500))
        d_sorted = np.linalg.norm(np.diff(pts[perm], axis=0), axis=1).mean()
        d_orig = np.linalg.norm(np.diff(pts, axis=0), axis=1).mean()
        assert d_sorted < 0.5 * d_orig


ALL_BASIC = ["random", "uniform", "stratified", "lhs", "halton"]


class TestStrategies:
    @pytest.mark.parametrize("method", ALL_BASIC)
    def test_range_and_count(self, method):
        uv = st.generate_samples(method, 1000)
        assert uv.shape == (1000, 2)
        assert uv.min() >= 0.0 and uv.max() <= 1.0

    @pytest.mark.parametrize("method", ALL_BASIC)
    def test_morton_sorted(self, method):
        uv = st.generate_samples(method, 500)
        codes = morton2d(uv[:, 0], uv[:, 1])
        assert (np.diff(codes.astype(np.int64)) >= 0).all()

    def test_deterministic_seed(self):
        a = st.generate_samples("random", 256)
        b = st.generate_samples("random", 256)
        np.testing.assert_array_equal(a, b)  # fixed seed 13 (sampling.cpp:3)

    def test_uniform_coverage(self):
        uv = st.uniform_samples(10000)
        h, _, _ = np.histogram2d(uv[:, 0], uv[:, 1], bins=10,
                                 range=[[0, 1], [0, 1]])
        assert h.min() > 50  # every cell covered

    def test_lhs_projection_property(self):
        n = 1000
        uv = st.lhs_samples(n)
        # Each 1/n-wide stratum of each axis holds exactly one sample.
        for axis in range(2):
            strata = np.floor(uv[:, axis] * n).astype(int)
            assert len(np.unique(np.clip(strata, 0, n - 1))) == n

    def test_halton_low_discrepancy(self):
        uv = st.halton_samples(2048)
        # star discrepancy proxy: counts in dyadic boxes close to measure
        for frac in (0.5, 0.25):
            inside = ((uv[:, 0] < frac) & (uv[:, 1] < frac)).mean()
            assert abs(inside - frac * frac) < 0.01

    def test_importance_color_concentrates_on_edges(self, rng):
        # Prev pass: left half black, right half white -> gradient at x=0.5.
        prev_uv = rng.uniform(size=(20000, 2)).astype(np.float32)
        prev_col = np.where(prev_uv[:, :1] > 0.5, 1.0, 0.0)
        prev_col = np.repeat(prev_col, 4, 1).astype(np.float32)
        uv = st.importance_color_samples(20000, prev_uv, prev_col,
                                         grid_res=64)
        # The two gradient columns at x=0.5 hold ~25% of the probability
        # mass (the rest is the 0.05 epsilon floor + padding-edge gradients,
        # mirroring the reference's out-of-range lum=0 behavior). Uniform
        # would put 10% in this window.
        near_edge = (np.abs(uv[:, 0] - 0.5) < 0.05).mean()
        assert near_edge > 0.2

    def test_importance_hit_concentrates_on_hits(self, rng):
        prev_uv = rng.uniform(size=(20000, 2)).astype(np.float32)
        flags = (prev_uv[:, 1] > 0.75).astype(np.float32)  # top quarter hits
        uv = st.importance_hit_samples(20000, prev_uv, flags, grid_res=64)
        in_hit_region = (uv[:, 1] > 0.75).mean()
        assert in_hit_region > 0.5

    def test_dispatcher_importance_fallback(self):
        uv = st.generate_samples("imp_col", 100)  # no prev data -> random
        assert uv.shape == (100, 2)
