"""Golden tests for the edge/defense ops against independent numpy references,
plus gradient-semantics tests for the STEs (the robustness results depend on
these gradients — see SURVEY.md section 7 'hardest parts')."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from edge_enhancement_tpu.ops import (
    add_square, binary_connect, canny, canny_bpda, canny_step125,
    gaussian_kernel, high_freq_suppress, hfs_mask, safe_sign, sobel_kernel,
    stencil2d, thin_kernels, to_compare, to_eq,
)

import reference_numpy as ref


def rand_img(key, shape):
    return jax.random.uniform(jax.random.PRNGKey(key), shape, dtype=jnp.float32)


class TestKernels:
    def test_gaussian_matches_reference(self):
        np.testing.assert_allclose(gaussian_kernel(3, 0, 1), ref.np_gaussian(3, 0, 1), rtol=1e-6)
        np.testing.assert_allclose(gaussian_kernel(5, 0, 2), ref.np_gaussian(5, 0, 2), rtol=1e-6)

    def test_gaussian_normalized(self):
        assert abs(gaussian_kernel(3).sum() - 1.0) < 1e-6

    def test_sobel_matches_reference(self):
        np.testing.assert_allclose(sobel_kernel(3), ref.np_sobel(3), rtol=1e-6)

    def test_thin_kernels_shape_and_structure(self):
        ks = thin_kernels()
        assert ks.shape == (8, 3, 3)
        for i in range(8):
            assert ks[i, 1, 1] == 1.0
            assert ks[i].sum() == 0.0
            assert (ks[i] == -1).sum() == 1


class TestHFS:
    @pytest.mark.parametrize("h,w,r", [(28, 28, 4), (28, 28, 8), (64, 64, 8), (27, 27, 4), (224, 224, 16)])
    def test_mask_matches_reference(self, h, w, r):
        np.testing.assert_array_equal(hfs_mask(h, w, r), ref.np_hfs_mask(h, w, r))

    @pytest.mark.parametrize("h,r", [(28, 8), (64, 8)])
    def test_filter_matches_reference(self, h, r):
        x = np.asarray(rand_img(0, (2, h, h, 3)))
        got = np.asarray(high_freq_suppress(jnp.asarray(x), r))
        for b in range(2):
            for c in range(3):
                want = ref.np_hfs(x[b, :, :, c].astype(np.float64), r)
                np.testing.assert_allclose(got[b, :, :, c], want, atol=1e-5)

    def test_linear_gradient(self):
        # HFS is linear: the VJP of a sum is the filter applied to ones.
        x = rand_img(1, (1, 28, 28, 1))
        g = jax.grad(lambda v: high_freq_suppress(v, 8).sum())(x)
        want = high_freq_suppress(jnp.ones_like(x), 8)
        np.testing.assert_allclose(np.asarray(g), np.asarray(want), atol=1e-5)


class TestStencil:
    def test_edge_pad_conv(self):
        x = np.asarray(rand_img(2, (1, 16, 16, 2)))
        k = ref.np_gaussian(3)
        got = np.asarray(stencil2d(jnp.asarray(x), k, "edge"))
        for c in range(2):
            want = ref.conv2d_same(x[0, :, :, c], k, "edge")
            np.testing.assert_allclose(got[0, :, :, c], want, atol=1e-6)

    def test_zero_pad_conv(self):
        x = np.asarray(rand_img(3, (1, 12, 12, 1)))
        k = np.full((3, 3), 1.25)
        got = np.asarray(stencil2d(jnp.asarray(x), k, "zero"))
        want = ref.conv2d_same(x[0, :, :, 0], k, "zero")
        np.testing.assert_allclose(got[0, :, :, 0], want, atol=1e-6)


class TestSTE:
    def test_safe_sign(self):
        x = jnp.array([-2.0, -0.0, 0.0, 0.5, 3.0])
        np.testing.assert_array_equal(np.asarray(safe_sign(x)), [-1, -1, -1, 1, 1])

    def test_binary_connect_forward_backward(self):
        x = jnp.array([-2.0, -1.0, -0.5, 0.0, 0.5, 1.0005, 1.002, 5.0])
        y = binary_connect(x)
        np.testing.assert_array_equal(np.asarray(y), [-1, -1, -1, -1, 1, 1, 1, 1])
        g = jax.grad(lambda v: (binary_connect(v) * jnp.arange(1.0, 9.0)).sum())(x)
        # grad passes where |x| <= 1.001
        np.testing.assert_array_equal(np.asarray(g), [0, 2, 3, 4, 5, 6, 0, 0])

    def test_to_compare_forward_backward(self):
        x = jnp.array([0.0, 0.3, 0.5, 0.9, 1.0, 1.002])
        y = to_compare(x, 0.5)
        np.testing.assert_array_equal(np.asarray(y), [0, 0, 0, 1, 1, 1])
        g = jax.grad(lambda v: (to_compare(v, 0.5) * jnp.arange(1.0, 7.0)).sum())(x)
        # grad passes where x > threshold and x <= 1.001
        np.testing.assert_array_equal(np.asarray(g), [0, 0, 0, 4, 5, 0])

    def test_to_eq_forward_backward(self):
        x = jnp.array([0.0, 0.5, 1.0, 0.5])
        np.testing.assert_array_equal(np.asarray(to_eq(x)), [0, 1, 0, 1])
        g = jax.grad(lambda v: (to_eq(v) * jnp.arange(1.0, 5.0)).sum())(x)
        np.testing.assert_array_equal(np.asarray(g), [0, 2, 0, 4])


class TestCanny:
    @pytest.mark.parametrize("c,alpha", [(1, 0.0), (3, 0.0), (3, 0.3)])
    def test_step125_matches_reference(self, c, alpha):
        x = np.asarray(rand_img(4, (2, 20, 20, c))).astype(np.float64)
        got = np.asarray(canny_step125(jnp.asarray(x, jnp.float32),
                                       high_threshold=76.0 / 255, alpha=alpha))
        for b in range(2):
            want = ref.np_canny_step125(x[b], 76.0 / 255, alpha=alpha)
            np.testing.assert_allclose(got[b, :, :, 0], want, atol=1e-5)

    @pytest.mark.parametrize("c", [1, 3])
    def test_full_canny_matches_reference(self, c):
        x = np.asarray(rand_img(5, (2, 20, 20, c))).astype(np.float64)
        got = np.asarray(canny(jnp.asarray(x, jnp.float32),
                               low_threshold=60.0 / 255, high_threshold=120.0 / 255,
                               hysteresis=True))
        mismatch = 0
        for b in range(2):
            want = ref.np_canny_full(x[b], 60.0 / 255, 120.0 / 255, hysteresis=True)
            # f32 vs f64 rounding can flip hard-threshold decisions on values
            # that sit exactly at a threshold; allow a tiny mismatch budget.
            mismatch += (np.abs(got[b, :, :, 0] - want) > 1e-4).sum()
        assert mismatch <= 2, f"{mismatch} mismatching edge pixels"

    def test_bpda_forward_close_to_full(self):
        # BPDA differs from full canny only in gradient wiring + alpha mask:
        # with alpha=0 the forward NMS+threshold values must agree.
        x = rand_img(6, (1, 16, 16, 3))
        a = canny(x, 60 / 255, 120 / 255, hysteresis=True, alpha=0.0)
        b = canny_bpda(x, 60 / 255, 120 / 255, hysteresis=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_step125_gradient_mask(self):
        # d out / d img is nonzero only through pixels above the threshold
        # (To_compare STE) — sanity-check it is finite and sparse.
        x = rand_img(7, (1, 16, 16, 3))
        g = jax.grad(lambda v: canny_step125(v, high_threshold=0.2).sum())(x)
        g = np.asarray(g)
        assert np.isfinite(g).all()
        assert (g != 0).any()

    def test_full_canny_gradient_finite(self):
        x = rand_img(8, (1, 16, 16, 3))
        g = jax.grad(lambda v: canny(v, 0.1, 0.25, hysteresis=True).sum())(x)
        assert np.isfinite(np.asarray(g)).all()

    def test_jit_compiles(self):
        x = rand_img(9, (2, 28, 28, 1))
        f = jax.jit(lambda v: canny_step125(v, high_threshold=0.3, alpha=0.3))
        np.testing.assert_allclose(np.asarray(f(x)), np.asarray(
            canny_step125(x, high_threshold=0.3, alpha=0.3)))


class TestAddSquare:
    def test_stays_in_ball_and_range(self):
        x = rand_img(10, (4, 28, 28, 1))
        y = add_square(x, jax.random.PRNGKey(0), epsilon=0.05, n_queries=3)
        d = np.asarray(y - x)
        assert np.abs(d).max() <= 0.05 + 1e-6
        assert np.asarray(y).min() >= 0 and np.asarray(y).max() <= 1

    def test_stripe_init_structure(self):
        # With n_queries=0 the output is clamp(x + eps * column stripes):
        # the perturbation must be constant down each column wherever no clamp hit.
        x = jnp.full((1, 8, 8, 1), 0.5)
        y = add_square(x, jax.random.PRNGKey(1), epsilon=0.05, n_queries=0)
        d = np.asarray(y - x)[0, :, :, 0]
        assert np.allclose(d, d[0:1, :])
        np.testing.assert_allclose(np.abs(d), 0.05, rtol=1e-5)

    def test_square_is_shared_across_batch(self):
        # p_init=0.8 on 28x28x1 gives square side s=round(sqrt(0.8*784))=25
        # at diagonal offset vh in {0,1,2}. Inside the square the +/-2eps add
        # clips to a constant +/-eps for EVERY batch element regardless of the
        # per-sample stripe init (the (C,H,H) delta broadcasts over batch).
        x = jnp.full((3, 28, 28, 1), 0.5)
        y = add_square(x, jax.random.PRNGKey(2), epsilon=0.05, n_queries=1)
        d = np.asarray(y - x)[..., 0]
        found = False
        for vh in range(3):
            block = d[:, vh:vh + 25, vh:vh + 25]
            if np.allclose(np.abs(block), 0.05) and len(np.unique(block.round(6))) == 1:
                found = True
        assert found, "no shared 25x25 diagonal square found"

    def test_deterministic_given_key(self):
        x = rand_img(12, (2, 28, 28, 1))
        k = jax.random.PRNGKey(7)
        y1 = add_square(x, k, epsilon=0.05, n_queries=2)
        y2 = add_square(x, k, epsilon=0.05, n_queries=2)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    def test_differentiable(self):
        x = rand_img(11, (2, 14, 14, 1))
        g = jax.grad(lambda v: add_square(v, jax.random.PRNGKey(3), epsilon=0.05,
                                          n_queries=1).sum())(x)
        assert np.isfinite(np.asarray(g)).all()

    def test_p_selection_schedule(self):
        from edge_enhancement_tpu.ops import p_selection
        assert p_selection(0, 0.8, 10) == 0.8
        assert p_selection(11, 0.8, 10000) == 0.4
        assert p_selection(51, 0.8, 10000) == 0.2
        assert p_selection(9000, 0.8, 10000) == 0.8 / 512


class TestMaxPoolTieSemantics:
    def test_xla_backward_matches_firstmax_oracle(self):
        """The backbones rely on XLA's select-and-scatter routing gradient to
        the FIRST max per window (torch semantics). The EE front-end makes
        exact pooling ties common (saturated plateaus), so pin the convention
        against the explicit first-max oracle on tie-heavy inputs."""
        import jax
        import jax.numpy as jnp
        from edge_enhancement_tpu.ops.pooling import (max_pool_3x3_s2,
                                                      max_pool_3x3_s2_firstmax)
        rng = np.random.default_rng(0)
        for h in (64, 63, 28):
            x = jnp.asarray((rng.integers(0, 4, size=(2, h, h, 3)) / 3.0)
                            .astype(np.float32))
            np.testing.assert_array_equal(
                np.asarray(max_pool_3x3_s2(x)),
                np.asarray(max_pool_3x3_s2_firstmax(x)))
            g = jnp.asarray(rng.standard_normal(
                max_pool_3x3_s2(x).shape).astype(np.float32))
            gx = jax.grad(lambda xx: jnp.sum(max_pool_3x3_s2(xx) * g))(x)
            go = jax.grad(
                lambda xx: jnp.sum(max_pool_3x3_s2_firstmax(xx) * g))(x)
            np.testing.assert_allclose(np.asarray(gx), np.asarray(go),
                                       atol=1e-6)
