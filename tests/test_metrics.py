"""Metric conformance tests (semantics of reference test_metrics.py)."""

import io
import tempfile

import numpy as np
import pytest

from vsc22_tpu.core.metrics import (
    Intervals,
    average_precision,
    evaluate_matching_track,
    match_metric,
)
from vsc22_tpu.core.types import CandidatePair, Dataset, Match, format_video_id


def match(q0, q1, r0, r1, score=1.0, query_id="Q1", ref_id="R2"):
    return Match(
        query_id=query_id,
        ref_id=ref_id,
        query_start=q0,
        query_end=q1,
        ref_start=r0,
        ref_end=r1,
        score=score,
    )


def seg_ap(gt, predictions):
    return match_metric(gt, predictions).ap


class TestIntervals:
    def test_intersect_length(self):
        a = Intervals([(2, 5), (7, 8)])
        b = Intervals([(1, 3), (4, 7)])
        c = Intervals([(-1, 0), (3.5, 12)])
        assert a.intersect_length(b) == pytest.approx(2)
        assert a.intersect_length(c) == pytest.approx(2.5)

    def test_union_and_total(self):
        a = Intervals([(0, 2), (1, 3), (5, 6)])
        assert a.intervals == [(0, 3), (5, 6)]
        assert a.total_length() == pytest.approx(4)


class TestMatchMetric:
    def test_perfect(self):
        gt = [match(4, 14, 10, 18)]
        assert seg_ap(gt, [match(4, 14, 10, 18, score=1.0)]) == pytest.approx(1.0)

    def test_split(self):
        gt = [match(4, 14, 10, 18)]
        dets = [match(4, 8, 10, 14, score=1.0), match(8, 14, 14, 18, score=2.0)]
        assert seg_ap(gt, dets) == pytest.approx(1.0)

    def test_imperfect_calibrated(self):
        gt = [match(4, 14, 10, 18)]
        dets = [
            match(4, 8, 10, 14, score=1.0),
            match(8, 14, 16, 18, score=2.0),
            match(0, 30, 5, 25, score=0.0),
        ]
        m = seg_ap(gt, dets)
        assert 0.9 < m < 1.0

    def test_imperfect_poorly_calibrated(self):
        gt = [match(4, 14, 10, 18)]
        dets = [
            match(4, 8, 10, 14, score=1.0),
            match(8, 14, 16, 18, score=2.0),
            match(0, 30, 5, 25, score=3.0),
        ]
        assert seg_ap(gt, dets) < 0.5

    def test_vcsl_fig4f(self):
        # Disjoint GT/pred boxes must score ~0 (GT gating by 2-D overlap).
        gt = [match(4, 14, 10, 18), match(20, 28, 21, 29)]
        dets = [
            match(4, 14, 21, 29, score=1.0),
            match(20, 28, 10, 18, score=1.0),
        ]
        assert seg_ap(gt, dets) == pytest.approx(0.0)

    def test_multiple_pairs(self):
        gt = [match(4, 14, 10, 18, query_id="Q1", ref_id="R2")]
        dets = [
            match(4, 14, 10, 18, score=3.0, query_id="Q2", ref_id="R2"),
            match(4, 14, 10, 18, score=2.0, query_id="Q1", ref_id="R1"),
            match(4, 14, 10, 18, score=1.0, query_id="Q1", ref_id="R2"),
        ]
        assert seg_ap(gt, dets) == pytest.approx(1 / 3.0)

    def test_order_invariance(self):
        gt = [match(4, 14, 10, 18, query_id="Q1", ref_id="R2")]
        dets = [
            match(4, 10, 10, 14, score=3.0, query_id="Q1", ref_id="R2"),
            match(4, 10, 10, 14, score=3.0, query_id="Q2", ref_id="R1"),
            match(4, 14, 10, 18, score=2.0, query_id="Q1", ref_id="R1"),
            match(4, 14, 10, 18, score=1.0, query_id="Q2", ref_id="R2"),
            match(4, 14, 10, 18, score=1.0, query_id="Q2", ref_id="R1"),
            match(10, 14, 14, 18, score=1.0, query_id="Q1", ref_id="R2"),
        ]
        rng = np.random.default_rng(0)
        values = set()
        for _ in range(10):
            perm = rng.permutation(len(dets))
            values.add(seg_ap(gt, [dets[i] for i in perm]))
        assert len(values) == 1


class TestEvaluateMatchingTrack:
    def run_files(self, gt, dets) -> float:
        with tempfile.NamedTemporaryFile() as gtf, tempfile.NamedTemporaryFile() as df:
            Match.write_csv(gt, gtf.name)
            Match.write_csv(dets, df.name)
            return evaluate_matching_track(gtf.name, df.name).segment_ap.ap

    def test_multiple_pairs(self):
        gt = [match(4, 14, 10, 18, query_id=1, ref_id=2)]
        dets = [
            match(4, 14, 10, 18, score=3.0, query_id=2, ref_id=2),
            match(4, 14, 10, 18, score=2.0, query_id=1, ref_id=1),
            match(4, 14, 10, 18, score=1.0, query_id=1, ref_id=2),
        ]
        assert self.run_files(gt, dets) == pytest.approx(1 / 3.0)

    def test_inline_csv_column_order(self):
        gt = (
            "query_start,query_end,ref_start,ref_end,query_id,ref_id\n"
            "4,14,10,18,Q000001,R000002\n"
        )
        preds = (
            "query_id,ref_id,query_start,query_end,ref_start,ref_end,score\n"
            "2,2,4,14,10,18,3.0\n"
            "1,1,4,14,10,18,2.0\n"
            "1,2,4,14,10,18,1.0\n"
        )
        with tempfile.NamedTemporaryFile("wt", suffix=".csv") as gtf, tempfile.NamedTemporaryFile(
            "wt", suffix=".csv"
        ) as df:
            gtf.write(gt)
            gtf.flush()
            df.write(preds)
            df.flush()
            metric = evaluate_matching_track(gtf.name, df.name).segment_ap.ap
        assert metric == pytest.approx(1 / 3.0)


def C(query_id, ref_id, score):
    return CandidatePair(
        format_video_id(query_id, Dataset.QUERIES),
        format_video_id(ref_id, Dataset.REFS),
        score,
    )


class TestDescriptorTrackAP:
    def ap(self, gt, predictions):
        metrics = average_precision(gt, predictions)
        assert metrics.ap == pytest.approx(metrics.simple_ap)
        return metrics.ap

    def test_uap(self):
        gt = [C(1, 10, 1.0), C(2, 11, 1.0)]
        assert self.ap(gt, [C(1, 10, 8.0), C(2, 11, 4.0), C(99, 99, 2.0)]) == 1.0
        assert self.ap(gt, [C(1, 10, 8.0), C(2, 11, 4.0), C(99, 99, 5.0)]) == pytest.approx(
            np.mean([1, 2 / 3])
        )
        assert self.ap(gt, [C(1, 10, 3.0), C(2, 10, 2.0), C(99, 99, 1.0)]) == pytest.approx(
            np.mean([1, 0])
        )
        assert self.ap(gt, [C(1, 10, 2.0), C(2, 10, 3.0), C(99, 99, 1.0)]) == pytest.approx(
            np.mean([1 / 2, 0])
        )

    def test_missing_predictions_rescale(self):
        # Predicting only 1 of 2 positives caps AP at 1/2 (canonical rescale).
        gt = [C(1, 10, 1.0), C(2, 11, 1.0)]
        assert self.ap(gt, [C(1, 10, 8.0)]) == pytest.approx(0.5)

    def test_duplicate_rejection(self):
        gt = [C(1, 10, 1.0)]
        with pytest.raises(AssertionError):
            average_precision(gt, [C(1, 10, 1.0), C(1, 10, 2.0)])

    def test_nonfinite_scores_rejected(self):
        gt = [C(1, 10, 1.0)]
        with pytest.raises(ValueError):
            average_precision(gt, [C(1, 10, float("inf"))])

    def test_csv_serialization(self):
        candidates = [C(1, 10, 1.0), C(2, 11, 2.0)]
        with io.StringIO() as buf:
            CandidatePair.write_csv(candidates, buf)
            buf.seek(0)
            recovered = CandidatePair.read_csv(buf)
        assert candidates == recovered


class TestMatchSerialization:
    def test_roundtrip(self):
        matches = [
            match(4, 8, 10, 14, score=1.0, query_id="Q123456", ref_id="R000100"),
            match(8, 14, 14, 18, score=2.0, query_id="Q000011", ref_id="R000101"),
        ]
        with io.StringIO() as buf:
            Match.write_csv(matches, buf)
            buf.seek(0)
            recovered = Match.read_csv(buf)
        assert matches == recovered


def test_ap_matches_sklearn_on_random_inputs():
    """Our threshold-grouped AP equals sklearn's on random tie-heavy data."""
    from sklearn.metrics import average_precision_score

    from vsc22_tpu.core.metrics import _binary_average_precision

    rng = np.random.default_rng(42)
    for _ in range(20):
        n = int(rng.integers(5, 200))
        y_true = rng.integers(0, 2, n)
        if y_true.sum() == 0:
            y_true[0] = 1
        y_score = rng.choice(np.round(rng.standard_normal(5), 2), n)
        ours = _binary_average_precision(y_true, y_score)
        theirs = average_precision_score(y_true, y_score)
        assert ours == pytest.approx(theirs, abs=1e-12)
