"""Alignment (VTA) and localization conformance tests."""

import numpy as np
import pytest

from vsc22_tpu.align.localization import VCSLLocalizationMaxSim
from vsc22_tpu.align.vta import (
    _dtw_accumulate,
    build_vta_model,
    cut_path,
    dp,
    dtw,
    hv,
    iou,
    tn,
    zero_runs,
)
from vsc22_tpu.core.types import CandidatePair, VideoFeature

D = 64


def normalize(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def make_feature(i, feature):
    return VideoFeature(
        video_id=i, feature=feature, timestamps=np.arange(feature.shape[0]) * 1.0
    )


def planted_case(rng):
    """Query video 1 copies frames 30:40 of ref video 3 at positions 20:30."""
    a = normalize(rng.normal(size=(45, D)))
    b = normalize(rng.normal(size=(30, D)))
    c = normalize(rng.normal(size=(60, D)))
    a[20:30, :] = c[30:40, :]
    return [make_feature(1, a)], [make_feature(2, b), make_feature(3, c)]


class TestHelpers:
    def test_zero_runs(self):
        runs = zero_runs(np.array([0, 0, 1, 0, 2, 0, 0, 0]))
        assert runs.tolist() == [[0, 2], [3, 4], [5, 8]]

    def test_iou_identity(self):
        box = np.array([[0, 0, 9, 9]], np.float64)
        assert iou(box, box)[0, 0] == pytest.approx(1.0)

    def test_iou_disjoint(self):
        a = np.array([[0, 0, 4, 4]], np.float64)
        b = np.array([[10, 10, 14, 14]], np.float64)
        assert iou(a, b)[0, 0] == pytest.approx(0.0)

    def test_cut_path_pure_diagonal(self):
        path = np.stack([np.arange(10), np.arange(10)], axis=1)
        assert cut_path(path, 3).tolist() == [[0, 10]]

    def test_cut_path_removes_long_horizontal(self):
        # Diagonal, then 6 steps with constant query index, then diagonal.
        qs = np.concatenate([np.arange(5), np.full(6, 4), np.arange(5, 10)])
        rs = np.arange(len(qs))
        path = np.stack([qs, rs], axis=1)
        keep = cut_path(path, diagonal_thres=3)
        assert len(keep) == 2  # the horizontal run is cut out


class TestDtw:
    def test_accumulate_matches_naive(self):
        rng = np.random.default_rng(0)
        cost = rng.random((13, 17))
        acc = _dtw_accumulate(cost)
        naive = np.zeros_like(cost)
        naive[0] = np.cumsum(cost[0])
        for i in range(1, cost.shape[0]):
            for j in range(cost.shape[1]):
                if j == 0:
                    naive[i, j] = cost[i, j] + naive[i - 1, 0]
                else:
                    naive[i, j] = cost[i, j] + min(
                        naive[i - 1, j - 1], naive[i - 1, j], naive[i, j - 1]
                    )
        np.testing.assert_allclose(acc, naive, atol=1e-9)

    def test_dtw_finds_planted_diagonal(self):
        rng = np.random.default_rng(1)
        sim = rng.random((50, 50)) * 0.1
        idx = np.arange(10, 40)
        sim[idx, idx] = 0.95
        boxes = dtw(sim, min_sim=0.3, min_length=5)
        assert len(boxes) >= 1
        q0, r0, q1, r1 = boxes[0]
        assert q0 <= 12 and q1 >= 38


class TestDp:
    def test_dp_finds_planted_diagonal(self):
        rng = np.random.default_rng(2)
        sim = rng.random((40, 40)) * 0.1 - 0.5
        idx = np.arange(5, 35)
        sim[idx, idx] = 0.9
        boxes = dp(sim.copy())
        assert len(boxes) >= 1
        q0, r0, q1, r1 = boxes[0]
        assert q0 <= 7 and q1 >= 33

    def test_dp_empty_on_noise(self):
        rng = np.random.default_rng(3)
        sim = rng.random((30, 30)) * 0.05 - 0.9
        assert dp(sim.copy(), ave_sim=1.5) == []


class TestTn:
    def test_tn_finds_planted_diagonal(self):
        rng = np.random.default_rng(4)
        sim = rng.random((50, 60)) * 0.05
        idx = np.arange(10, 40)
        sim[idx, idx + 5] = 0.9
        boxes = tn(sim)
        assert len(boxes) >= 1
        q0, r0, q1, r1 = boxes[0]
        assert q0 <= 12 and q1 >= 38 and r0 <= 17 and r1 >= 43

    def test_tn_empty_on_noise(self):
        rng = np.random.default_rng(5)
        sim = rng.random((30, 30)) * 0.01
        assert tn(sim) == []


class TestHv:
    def test_hv_finds_planted_diagonal(self):
        rng = np.random.default_rng(6)
        sim = rng.random((50, 50)) * 0.05
        idx = np.arange(10, 40)
        sim[idx, idx] = 0.9
        boxes = hv(sim.copy())
        assert any(q0 <= 10 and q1 >= 39 for q0, r0, q1, r1 in boxes)

    def test_hv_empty_below_threshold(self):
        sim = np.full((20, 20), 0.1)
        assert hv(sim.copy(), min_sim=0.5) == []


def test_build_vta_model_dispatch():
    for method in ("DTW", "DP", "TN", "HV"):
        model = build_vta_model(method)
        assert model is not None
    with pytest.raises(ValueError):
        build_vta_model("XX")


class TestLocalization:
    """Reference test_localization.py semantics."""

    def test_localize(self):
        rng = np.random.default_rng(7)
        queries, refs = planted_case(rng)
        localization = VCSLLocalizationMaxSim(queries, refs, "TN")
        assert localization.localize(CandidatePair(1, 2, 1.0)) == []
        matches = localization.localize(CandidatePair(1, 3, 2.0))
        assert len(matches) >= 1
        m = matches[0]
        # The detected segment must overlap the planted one (q 20:30, r 30:40).
        assert m.query_start < 30 and m.query_end > 20
        assert m.ref_start < 40 and m.ref_end > 30
        assert m.score > 0.5  # max sim inside the box is ~1

    def test_localize_all(self):
        rng = np.random.default_rng(8)
        queries, refs = planted_case(rng)
        localization = VCSLLocalizationMaxSim(queries, refs, "TN")
        matches = localization.localize_all(
            [CandidatePair(1, 2, 1.0), CandidatePair(1, 3, 2.0)]
        )
        assert len(matches) >= 1
        for match in matches:
            assert match.query_id == 1
            assert match.ref_id == 3


class TestSegmentPR:
    def test_perfect_overlap(self):
        from vsc22_tpu.align.metrics import segment_precision_recall

        gt = [[10, 20, 30, 40]]
        pr = segment_precision_recall(gt, gt)
        assert pr["precision"] == pytest.approx(1.0)
        assert pr["recall"] == pytest.approx(1.0)

    def test_half_coverage(self):
        from vsc22_tpu.align.metrics import segment_precision_recall

        gt = [[0, 0, 20, 20]]
        pred = [[0, 0, 10, 10]]  # covers half of each axis
        pr = segment_precision_recall(pred, gt)
        assert pr["recall"] == pytest.approx(0.5)
        assert pr["precision"] == pytest.approx(1.0)

    def test_disjoint(self):
        from vsc22_tpu.align.metrics import segment_precision_recall

        pr = segment_precision_recall([[0, 0, 5, 5]], [[50, 50, 60, 60]])
        assert pr["recall"] == 0.0
        assert pr["f1"] == 0.0

    def test_macro_average(self):
        from vsc22_tpu.align.metrics import evaluate_alignment

        gt = {("Q1", "R1"): [[0, 0, 10, 10]], ("Q2", "R2"): [[0, 0, 10, 10]]}
        preds = {("Q1", "R1"): [[0, 0, 10, 10]]}
        out = evaluate_alignment(preds, gt)
        assert out["recall"] == pytest.approx(0.5)


def test_vta_model_process_pool_matches_sequential():
    rng = np.random.default_rng(9)
    sims = [(f"k{i}", rng.random((30, 30))) for i in range(4)]
    seq = build_vta_model("HV").forward_sim(sims)
    par = build_vta_model("HV", concurrency=2).forward_sim(sims)
    assert seq == par


class TestChamfer:
    """Parity with reference chamfer_sim_cpu / sim_norm (D1/infer/vcsl/vta.py:14-41)."""

    def test_chamfer_matches_reference_formula(self):
        from vsc22_tpu.align.vta import chamfer_sim

        rng = np.random.default_rng(3)
        q = rng.standard_normal((4, 3, 8))
        r = rng.standard_normal((5, 2, 8))
        # Reference formula via tensordot (the original control flow).
        sim = np.tensordot(q, r.T, axes=1)  # [Q, m, n, R]
        c1 = np.squeeze(np.mean(np.max(sim, axis=1, keepdims=True), axis=2, keepdims=True))
        c2 = np.squeeze(np.mean(np.max(sim, axis=2, keepdims=True), axis=1, keepdims=True))
        expected = (c1 + c2) / 2
        np.testing.assert_allclose(chamfer_sim(q, r), expected, rtol=1e-12)

    def test_sim_norm_bounds(self):
        from vsc22_tpu.align.vta import sim_norm

        x = np.array([-1.0, 0.0, 0.15, 0.3, 2.0])
        out = sim_norm(x)
        np.testing.assert_allclose(out, [0.0, 0.0, 0.5, 1.0, 1.0])

    def test_sim_map_chamfer_route(self):
        from vsc22_tpu.align.vta import chamfer_sim, sim_map, sim_norm

        rng = np.random.default_rng(4)
        q = rng.standard_normal((3, 2, 6))
        r = rng.standard_normal((4, 2, 6))
        qid, rid, m = sim_map("Q", "R", q, r, similarity_type="chamfer")
        assert (qid, rid) == ("Q", "R")
        np.testing.assert_allclose(m, sim_norm(chamfer_sim(q, r)))
        qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
        rn = r / np.linalg.norm(r, axis=-1, keepdims=True)
        _, _, mn = sim_map("Q", "R", q, r, normalize_input=True, similarity_type="chamfer")
        np.testing.assert_allclose(mn, sim_norm(chamfer_sim(qn, rn)))


class TestTnNative:
    """The C++ vta_tn kernel must be bit-identical to the numpy TN."""

    @staticmethod
    def _corpus():
        rng = np.random.default_rng(11)
        cases = []
        for q, r in [(30, 40), (64, 64), (17, 90), (120, 55)]:
            sims = rng.normal(0, 0.1, (q, r))
            # plant one strong diagonal + one weak off-diagonal segment
            d = min(q, r) // 2
            sims[np.arange(d), np.arange(d) + 3 if r > d + 3 else np.arange(d)] += 0.9
            sims[np.arange(5, d), np.arange(5, d)] += 0.4
            cases.append(sims)
        cases.append(rng.normal(0, 0.3, (48, 48)))  # pure noise
        cases.append(np.zeros((10, 10)))  # degenerate
        return cases

    def test_native_matches_numpy(self):
        from vsc22_tpu.align.vta import _tn_numpy, tn
        from vsc22_tpu.native import load_library

        if load_library() is None:
            pytest.skip("no native toolchain")
        for sims in self._corpus():
            for kwargs in (
                {},
                {"tn_max_step": 5, "tn_top_k": 3},
                {"max_path": 3, "min_sim": 0.1, "min_length": 3, "max_iou": 0.5},
            ):
                assert tn(sims, **kwargs) == _tn_numpy(sims, **kwargs), kwargs

    def test_planted_segment_found(self):
        from vsc22_tpu.align.vta import tn

        rng = np.random.default_rng(12)
        sims = rng.normal(0, 0.05, (60, 80))
        sims[np.arange(10, 40), np.arange(20, 50)] = 0.95
        boxes = tn(sims, tn_max_step=5)
        assert len(boxes) >= 1
        q0, r0, q1, r1 = boxes[0]
        assert q0 <= 12 and q1 >= 38 and r0 <= 22 and r1 >= 48


class TestVcslIO:
    def test_item_and_pair_datasets(self, tmp_path):
        import cv2

        from vsc22_tpu.align.vcsl_io import (
            AsyncWriter,
            ImageItemDataset,
            ItemDataset,
            PairDataset,
            build_reader,
            build_writer,
        )

        arrs = {}
        for name in ("a", "b", "c"):
            arr = np.arange(12, dtype=np.float32).reshape(3, 4) + ord(name)
            np.save(tmp_path / f"{name}.npy", arr)
            arrs[name] = arr

        items = ItemDataset(
            [("a", "a.npy"), ("b", "b.npy")], root=str(tmp_path), data_type="numpy"
        )
        assert len(items) == 2
        uid, val = items[1]
        assert uid == "b"
        np.testing.assert_array_equal(val, arrs["b"])

        # pair-list mode
        pairs = PairDataset(
            pair_list=[("a", "c")],
            file_dict={"a": "a.npy", "c": "c.npy"},
            root=str(tmp_path),
            data_type="numpy",
        )
        qid, gid, qv, gv = pairs[0]
        assert (qid, gid) == ("a", "c")
        np.testing.assert_array_equal(gv, arrs["c"])

        # product mode, row-major
        prod = PairDataset(
            query_list=[("a", "a.npy"), ("b", "b.npy")],
            gallery_list=[("b", "b.npy"), ("c", "c.npy")],
            root=str(tmp_path),
            data_type="numpy",
        )
        assert len(prod) == 4
        qid, gid, _, _ = prod[1]
        assert (qid, gid) == ("a", "c")

        # image dataset with a transform chain
        img = np.full((4, 4, 3), 7, np.uint8)
        cv2.imwrite(str(tmp_path / "img.png"), img)
        imgs = ImageItemDataset(
            [("i", "img.png")], root=str(tmp_path), transforms=[lambda x: x + 1]
        )
        _, out = imgs[0]
        assert (out == 8).all()

        # async writer pool round-trips through the json writer
        w = AsyncWriter(pool_size=2, data_type="json")
        w.consume((str(tmp_path / "x.json"), {"k": 1}))
        w.consume((str(tmp_path / "y.json"), [1, 2]))
        w.stop()
        assert build_reader(data_type="json")(str(tmp_path / "x.json")) == {"k": 1}

        with pytest.raises(NotImplementedError):
            build_writer(store_type="oss")
