"""Frame Scenes Detection tests: letterbox removal, stack splitting, fallback."""

import numpy as np
import pytest
from PIL import Image

from vsc22_tpu.data import fsd


def make_video(h, w, n=10, seed=0):
    """Noisy content frames (high temporal variance everywhere)."""
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 255, (h, w, 3), dtype=np.uint8) for _ in range(n)]


def letterboxed(frames, border=40):
    """Add static black bars top/bottom with a sharp edge line."""
    out = []
    for f in frames:
        h, w, _ = f.shape
        canvas = np.zeros((h + 2 * border, w, 3), np.uint8)
        canvas[border : border + h] = f
        out.append(canvas)
    return out


def stacked_vertical(frames_a, frames_b, gap=24):
    """Stack two videos vertically with a static black gap between them."""
    out = []
    for a, b in zip(frames_a, frames_b):
        w = a.shape[1]
        gap_block = np.zeros((gap, w, 3), np.uint8)
        out.append(np.concatenate([a, gap_block, b], axis=0))
    return out


class TestSampling:
    def test_under_cap_identity(self):
        assert fsd.sample_edge_frames(7) == list(range(7))

    def test_over_cap_downsamples(self):
        idxs = fsd.sample_edge_frames(100)
        assert len(idxs) == 20
        assert idxs[0] == 0 and idxs[-1] == 95


class TestRemoveEdges:
    def test_strips_letterbox(self):
        frames = letterboxed(make_video(200, 320), border=40)
        var, canny = fsd.variance_and_edges_host(frames)
        cut, cut_var, cut_canny = fsd.remove_edges(frames, var, canny)
        h = cut[0].shape[0]
        # Static 40px bars top+bottom should be mostly gone.
        assert h <= 220
        assert cut[0].shape[1] == 320  # width untouched
        assert cut_var.shape == cut[0].shape[:2]

    def test_keeps_full_frame_video(self):
        frames = make_video(200, 320, seed=1)
        var, canny = fsd.variance_and_edges_host(frames)
        cut, _, _ = fsd.remove_edges(frames, var, canny)
        assert cut[0].shape == frames[0].shape


class TestSplitImgs:
    def test_splits_vertical_stack(self):
        a = make_video(160, 320, seed=2)
        b = make_video(160, 320, seed=3)
        frames = stacked_vertical(a, b)
        var, canny = fsd.variance_and_edges_host(frames)
        parts = fsd.split_imgs(frames, var, canny)
        assert len(parts) == 2
        heights = sorted(p[0][0].shape[0] for p in parts)
        assert all(120 < h_ < 200 for h_ in heights)

    def test_no_split_on_plain_video(self):
        frames = make_video(200, 320, seed=4)
        var, canny = fsd.variance_and_edges_host(frames)
        parts = fsd.split_imgs(frames, var, canny)
        assert len(parts) == 1
        assert parts[0][0][0].shape == frames[0].shape


class TestImageProcess:
    def test_processes_stacked_letterboxed(self):
        a = make_video(160, 320, seed=5)
        b = make_video(160, 320, seed=6)
        frames = [Image.fromarray(f) for f in stacked_vertical(a, b)]
        processed, out = fsd.image_process(frames)
        assert processed
        # Two scenes -> 2x the frames.
        assert len(out) == 2 * len(frames)
        # crops come back as arrays (no PIL round trip on the serving path)
        assert all(np.asarray(x).ndim == 3 for x in out)

    def test_passthrough_on_plain_video(self):
        frames = [Image.fromarray(f) for f in make_video(200, 320, seed=7)]
        processed, out = fsd.image_process(frames)
        assert not processed
        assert out == frames

    def test_short_videos_untouched(self):
        frames = [Image.fromarray(f) for f in make_video(200, 320, n=3, seed=8)]
        processed, out = fsd.image_process(frames)
        assert not processed

    def test_garbage_input_falls_back(self):
        processed, out = fsd.image_process(["not-an-image"])
        assert not processed
        assert out == ["not-an-image"]


class TestDeviceMaps:
    def test_variance_matches_host(self):
        frames = make_video(64, 96, seed=9)
        var_h, _ = fsd.variance_and_edges_host(frames)
        var_d, _ = fsd.variance_and_edges_device(frames)
        np.testing.assert_allclose(var_d, var_h, rtol=1e-3, atol=1e-1)

    def test_device_edges_detect_strong_line(self):
        """Device edge map fires on a synthetic high-contrast boundary."""
        frames = []
        for f in make_video(120, 160, seed=10):
            f = f.copy()
            f[:60] = 0  # hard black/noise boundary at row 60
            frames.append(f)
        _, edges = fsd.variance_and_edges_device(frames)
        row_density = edges.mean(axis=1)
        assert row_density[59:62].max() > row_density.mean() + 0.2

    def test_device_pipeline_splits_stack(self):
        a = make_video(160, 320, seed=11)
        b = make_video(160, 320, seed=12)
        frames = [Image.fromarray(f) for f in stacked_vertical(a, b)]
        processed, out = fsd.image_process(frames, use_device_maps=True)
        assert processed
        assert len(out) == 2 * len(frames)


def test_batch_maps_match_per_video():
    """variance_and_edges_device_batch == per-video device maps."""
    import jax.numpy as jnp

    from vsc22_tpu.data import fsd

    rng = np.random.default_rng(3)
    videos = rng.integers(0, 255, (3, 8, 48, 64, 3)).astype(np.uint8)
    bvar, bedges = fsd.variance_and_edges_device_batch(jnp.asarray(videos))
    assert bvar.shape == (3, 48, 64) and bedges.shape == (3, 48, 64)
    for i in range(3):
        var_i, edges_i = fsd.variance_and_edges_device(jnp.asarray(videos[i]))
        # batch maps ship f16 (transfer halving); decisions are thresholded
        np.testing.assert_allclose(bvar[i], var_i, rtol=2e-3, atol=0.5)
        np.testing.assert_allclose(bedges[i], edges_i, rtol=2e-3, atol=2e-3)


def test_profile_screen_matches_map_path():
    """The serving profile screen must reproduce the map path's decisions:
    plain videos are screened as unchanged without any 2-D map, edited
    videos are flagged, and the flagged-map fallback yields the exact boxes
    `image_process_boxes` computes from the same batch maps."""
    import jax.numpy as jnp

    from vsc22_tpu.data import fsd

    plain = np.stack(make_video(160, 200, n=8, seed=5))
    boxed = np.stack(letterboxed(make_video(80, 200, n=8, seed=6), border=40))
    stackv = np.stack(
        stacked_vertical(
            make_video(130, 200, n=8, seed=7), make_video(130, 200, n=8, seed=8),
            gap=24,
        )
    )
    # letterboxed: 80+2*40 = 160 rows; stacked: 130*2+24=284 rows
    for videos, expect_plain in (
        (np.stack([plain, plain]), True),
        (np.stack([boxed, boxed]), False),
    ):
        maps_dev, profs = fsd.batch_maps_profiles_device(jnp.asarray(videos))
        v, n, h, w = videos.shape[:4]
        for j in range(v):
            got = fsd.level0_boxes_from_profiles(profs[j], h, w, n)
            if expect_plain:
                assert got == [(0, h, 0, w)], got
            else:
                assert got is None  # flagged: must go through the map path
                fetched = np.asarray(
                    jnp.take(maps_dev, jnp.asarray([j, v + j]), axis=0),
                    np.float32,
                )
                changed, boxes = fsd.image_process_boxes(
                    list(videos[j]), precomputed_maps=(fetched[0], fetched[1])
                )
                assert changed and boxes[0] != (0, h, 0, w)

    # the stacked composite must also be flagged (split path, not remove_edges)
    maps_dev, profs = fsd.batch_maps_profiles_device(jnp.asarray(stackv[None]))
    assert (
        fsd.level0_boxes_from_profiles(profs[0], stackv.shape[1], 200, 8) is None
    )


def test_image_process_precomputed_maps_equivalent():
    from vsc22_tpu.data import fsd

    rng = np.random.default_rng(4)
    # letterboxed video: black bars top/bottom force a border cut
    frames = np.zeros((8, 64, 64, 3), np.uint8)
    frames[:, 16:48] = rng.integers(0, 255, (8, 32, 64, 3)).astype(np.uint8)
    imgs = list(frames)
    var, edges = fsd.variance_and_edges_host(imgs)
    c1, out1 = fsd.image_process(imgs, precomputed_maps=(var, edges))
    c2, out2 = fsd.image_process(imgs)
    assert c1 == c2
    assert len(out1) == len(out2)
    for a, b in zip(out1, out2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestCropResizeWeights:
    def test_weights_match_jax_resize(self):
        import jax
        import jax.numpy as jnp

        from vsc22_tpu.data.transforms import cubic_resize_weights

        rng = np.random.default_rng(0)
        for n_in, n_out in [(360, 384), (640, 384), (90, 256), (37, 64)]:
            x = rng.standard_normal((5, n_in)).astype(np.float32)
            ref = np.asarray(
                jax.image.resize(jnp.asarray(x), (5, n_out), method="cubic")
            )
            got = x @ cubic_resize_weights(n_in, n_out)
            np.testing.assert_allclose(got, ref, atol=2e-4)

    def test_crop_weights_match_sliced_resize(self):
        import jax
        import jax.numpy as jnp

        from vsc22_tpu.data.transforms import cubic_resize_weights

        rng = np.random.default_rng(1)
        x = rng.standard_normal((4, 300)).astype(np.float32)
        ref = np.asarray(
            jax.image.resize(jnp.asarray(x[:, 40:220]), (4, 128), method="cubic")
        )
        got = x @ cubic_resize_weights(300, 128, 40, 220)
        np.testing.assert_allclose(got, ref, atol=2e-4)

    def test_crop_resize_normalize_matches_resize_of_crop(self):
        import jax.numpy as jnp

        from vsc22_tpu.data.transforms import (
            crop_resize_normalize,
            cubic_resize_weights,
            resize_normalize,
        )

        rng = np.random.default_rng(2)
        frames = rng.integers(0, 255, (3, 120, 200, 3)).astype(np.uint8)
        box = (10, 110, 20, 180)
        ref = np.asarray(
            resize_normalize(
                jnp.asarray(frames[:, box[0]:box[1], box[2]:box[3]]), 64, "vit"
            )
        )
        got = np.asarray(
            crop_resize_normalize(
                jnp.asarray(frames),
                jnp.asarray(cubic_resize_weights(120, 64, box[0], box[1])),
                jnp.asarray(cubic_resize_weights(200, 64, box[2], box[3])),
                preset="vit",
            )
        )
        np.testing.assert_allclose(got, ref, atol=2e-3)
