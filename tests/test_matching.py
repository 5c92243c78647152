"""Matching-track tests: models, sim matrices, heatmap decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from vsc22_tpu.matching.decode import decode_all_settings, generate_matching_result
from vsc22_tpu.matching.simmat import (
    candidate_sim_matrices,
    pad_sim_matrix,
    select_best_split_segment,
)
from vsc22_tpu.models.hrnet import sam_hrnet_tiny_test
from vsc22_tpu.models.mobilenetv3 import mobilenetv3_small


class TestMobileNetV3:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        model = mobilenetv3_small(num_classes=2)
        images = jnp.zeros((2, 160, 160, 3))
        variables = model.init(jax.random.PRNGKey(0), images, train=False)
        return model, variables

    @pytest.mark.heavy
    def test_logits_shape(self, model_and_vars):
        model, variables = model_and_vars
        images = jax.random.normal(jax.random.PRNGKey(1), (3, 160, 160, 3))
        out = model.apply(variables, images, train=False)
        assert out.shape == (3, 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_train_mode_updates_batch_stats(self, model_and_vars):
        model, variables = model_and_vars
        images = jax.random.normal(jax.random.PRNGKey(2), (2, 160, 160, 3))
        out, mutated = model.apply(
            variables, images, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
        assert out.shape == (2, 2)
        old = jax.tree.leaves(variables["batch_stats"])[0]
        new = jax.tree.leaves(mutated["batch_stats"])[0]
        assert not np.allclose(np.asarray(old), np.asarray(new))

    def test_param_count_matches_mnv3_small(self, model_and_vars):
        _, variables = model_and_vars
        n = sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))
        # timm mobilenetv3_small_100 (2 classes): ~1.5M params.
        assert 1.3e6 < n < 1.8e6


class TestSamHRNet:
    @pytest.mark.heavy
    def test_full_resolution_heatmap(self):
        model = sam_hrnet_tiny_test()
        x = jnp.zeros((1, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3)), train=False)
        # stem_stride=1 keeps the input resolution; 2 output channels.
        assert out.shape == (2, 32, 32, 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_s2d_branch0_matches_standard_path(self):
        """The packed (space-to-depth) branch-0 serving path is numerically
        the standard forward: same variables, same outputs."""
        from vsc22_tpu.models.hrnet import sam_hrnet_w18

        m0, m1 = sam_hrnet_tiny_test(), sam_hrnet_tiny_test(s2d=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        v = m0.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))
        y0 = m0.apply(v, x, train=False)
        y1 = m1.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)

        # Full W18 width at a reduced resolution (CPU-affordable): the
        # remap must hold for the real 18/36/72/144 channel plan too.
        m0, m1 = sam_hrnet_w18(), sam_hrnet_w18(s2d=True)
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
        v = m0.init(jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)))
        y0 = np.asarray(m0.apply(v, x, train=False))
        y1 = np.asarray(m1.apply(v, x, train=False))
        np.testing.assert_allclose(y1, y0, atol=1e-2 * max(1.0, np.abs(y0).max()))

    def test_s2d_kernel_remap_identity(self):
        """conv3x3(x) == d2s(conv3x3_packed(s2d(x))) for a raw kernel."""
        from vsc22_tpu.models.hrnet import _d2s, _s2d, _s2d_kernel

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 5)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 5, 7)), jnp.float32)
        dn = ("NHWC", "HWIO", "NHWC")
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn
        )
        packed = jax.lax.conv_general_dilated(
            _s2d(x), _s2d_kernel(w), (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn
        )
        np.testing.assert_allclose(
            np.asarray(_d2s(packed)), np.asarray(ref), atol=1e-4
        )

    def test_w18_channel_arithmetic(self):
        from vsc22_tpu.models.hrnet import HRNET_W18_SAM

        assert HRNET_W18_SAM.branch_channels == (18, 36, 72, 144)
        # SAM fuse input: 64 stem + 270 branch channels = 334 (reference).
        assert HRNET_W18_SAM.stem_channels + sum(HRNET_W18_SAM.branch_channels) == 334


class TestSimMatrices:
    def test_split_segment_selection(self):
        rng = np.random.default_rng(0)
        rfeat = rng.standard_normal((20, 8)).astype(np.float32)
        rfeat /= np.linalg.norm(rfeat, axis=1, keepdims=True)
        # 3 segments of 10 frames; make segment 1 strongly match the ref.
        qfeat = rng.standard_normal((30, 8)).astype(np.float32) * 0.01
        qfeat[10:20] = rfeat[:10]
        best = select_best_split_segment(qfeat, rfeat, 10)
        assert_allclose(best, qfeat[10:20])

    def test_unsplit_passthrough(self):
        rng = np.random.default_rng(1)
        q = rng.standard_normal((10, 8)).astype(np.float32)
        r = rng.standard_normal((5, 8)).astype(np.float32)
        assert_allclose(select_best_split_segment(q, r, 10), q)

    def test_candidate_matrices_include_transpose(self):
        rng = np.random.default_rng(2)
        q = {"Q1": rng.standard_normal((6, 4)).astype(np.float32)}
        r = {"R1": rng.standard_normal((9, 4)).astype(np.float32)}
        feats, infos = candidate_sim_matrices(q, r, [("Q1", "R1", 0.5)], {"Q1": 6})
        assert len(feats) == 2
        assert feats[0].shape == (6, 9)
        assert feats[1].shape == (9, 6)
        assert_allclose(feats[1], feats[0].T)
        assert infos[0] == ["Q1", "R1", 0.5]

    def test_pad_sim_matrix(self):
        sim = np.ones((5, 7), np.float32)
        out = pad_sim_matrix(sim, 10)
        assert out.shape == (10, 10, 3)
        assert out[:5, :7].sum() == 5 * 7 * 3
        assert out[5:].sum() == 0
        # Truncation path
        out2 = pad_sim_matrix(np.ones((20, 20), np.float32), 10)
        assert out2.shape == (10, 10, 3)


class TestDecode:
    def make_heatmap(self, size=64, slope=1.0, q0=10, r0=14, length=30, value=0.9):
        hm = np.zeros((size, size), np.float32)
        for t in range(length):
            q = q0 + t
            r = int(round(r0 + slope * t))
            if q < size and 0 <= r < size:
                hm[q, r] = value
        return hm

    def test_clean_diagonal_decoded(self):
        hm = self.make_heatmap()
        rows = generate_matching_result([("Q1", "R1", hm, hm)], threshold=0.5, std_ratio=0.5)
        assert len(rows) == 1
        qid, rid, qs, rs, qe, re, score = rows[0]
        assert (qs, rs) == (10, 14)
        assert (qe, re) == (39, 43)
        assert score > 0.5

    def test_negative_slope_rejected(self):
        hm = np.zeros((64, 64), np.float32)
        for t in range(30):
            hm[10 + t, 50 - t] = 0.9
        rows = generate_matching_result([("Q1", "R1", hm, hm)], threshold=0.5)
        assert rows == []

    def test_noise_only_no_matches(self):
        rng = np.random.default_rng(3)
        hm = (rng.random((64, 64)) * 0.04).astype(np.float32)
        rows = generate_matching_result([("Q1", "R1", hm, hm)], threshold=0.05)
        assert rows == []

    def test_two_segments_found(self):
        hm = self.make_heatmap() + self.make_heatmap(q0=45, r0=2, length=15)
        rows = generate_matching_result([("Q1", "R1", hm, hm)], threshold=0.5, std_ratio=0.5)
        assert len(rows) == 2

    def test_decode_all_settings_unions(self):
        hm = self.make_heatmap(value=0.2)  # visible only at low thresholds
        rows = decode_all_settings([("Q1", "R1", hm, hm)])
        assert len(rows) >= 1
        # Output keys unique.
        keys = {tuple(r[:6]) for r in rows}
        assert len(keys) == len(rows)


def test_split_fuse_equals_concat_conv():
    """The per-scale fuse (conv-before-upsample) equals the reference
    layout's upsample -> concat -> 1x1 conv, with the same fuse1 params."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vsc22_tpu.models.hrnet import _nearest_up, sam_hrnet_tiny_test

    model = sam_hrnet_tiny_test()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    variables = model.init(rng, x)
    out = np.asarray(model.apply(variables, x, train=False))

    # Oracle: materialize the full-res concat and apply the fuse kernel.
    from vsc22_tpu.models.hrnet import HRNetFeatures

    fv = {"params": variables["params"]["backbone"],
          "batch_stats": variables["batch_stats"]["backbone"]}
    feats = HRNetFeatures(model.cfg).apply(fv, x, train=False)
    ups = (1, 1, 2, 4, 8)
    cat = jnp.concatenate(
        [_nearest_up(f, u) for f, u in zip(feats, ups)], axis=-1
    )
    k = variables["params"]["fuse1"]["kernel"][0, 0]
    b = variables["params"]["fuse1"]["bias"]
    y = jax.nn.relu(jnp.einsum("bhwc,cf->bhwf", cat, k) + b)
    k2 = variables["params"]["fuse2"]["kernel"][0, 0]
    b2 = variables["params"]["fuse2"]["bias"]
    oracle = np.asarray(jnp.einsum("bhwc,cf->bhwf", y, k2) + b2)
    np.testing.assert_allclose(out, oracle, atol=2e-5, rtol=2e-5)


def test_nearest_up_matches_jax_resize():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vsc22_tpu.models.hrnet import _nearest_up

    x = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 7, 3))
    for f in (1, 2, 4):
        a = np.asarray(_nearest_up(x, f))
        b = np.asarray(
            jax.image.resize(x, (2, 5 * f, 7 * f, 3), method="nearest")
        )
        np.testing.assert_array_equal(a, b)
