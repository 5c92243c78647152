"""DeviceSimBuilder parity vs the host (reference-semantics) sim path.

The device path (matching/simmat.DeviceSimBuilder + the predict_device
ensemble methods) must reproduce the host oracle exactly: same split-segment
choice, same zero-padded square images, same end-to-end matching rows.
Reference semantics: M1/infer/src/utils.py:20-75, M1/infer/infer_matching.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from vsc22_tpu.core.types import VideoFeature
from vsc22_tpu.matching.simmat import (
    DeviceSimBuilder,
    candidate_sim_matrices,
    pad_sim_matrix,
    select_best_split_segment,
)


def normed(x):
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def mixed_corpus():
    """Queries exercising every segment-selection branch:
    - Q0: single segment (len == num_frames);
    - Q1: 3 full FSD segments (len = 3 * nf) with a planted copy in seg 1;
    - Q2: partial trailing segment (len = 2 * nf + 7);
    - refs of length 20 and 300 (the long one exceeds both model
      resolutions, exercising truncation)."""
    rng = np.random.default_rng(7)
    refs = {
        "R0": normed(rng.standard_normal((20, 16))).astype(np.float32),
        "R1": normed(rng.standard_normal((300, 16))).astype(np.float32),
        "R2": normed(rng.standard_normal((33, 16))).astype(np.float32),
    }
    nf = {"Q0": 15, "Q1": 15, "Q2": 15}
    q0 = normed(rng.standard_normal((15, 16))).astype(np.float32)
    q1 = normed(rng.standard_normal((45, 16))).astype(np.float32)
    q1[15 + 3 : 15 + 11] = refs["R0"][5:13]  # planted: segment 1 wins for R0
    q2 = normed(rng.standard_normal((37, 16))).astype(np.float32)
    q2[30:] = refs["R2"][10:17]  # planted in the PARTIAL trailing segment
    queries = {"Q0": q0, "Q1": normed(q1).astype(np.float32),
               "Q2": normed(q2).astype(np.float32)}
    return queries, refs, nf


PAIRS = [("Q0", "R0"), ("Q1", "R0"), ("Q1", "R1"), ("Q2", "R2"), ("Q2", "R1")]


@pytest.mark.parametrize("res", [160, 224])
def test_images_match_host_oracle(res):
    queries, refs, nf = mixed_corpus()
    builder = DeviceSimBuilder(queries, refs, nf)
    assert builder.usable()
    chunks = builder.images(PAIRS, res, chunk=2)

    flat_imgs, flat_offs = [], []
    for imgs, offs, n in chunks:
        assert imgs.shape[0] == 2  # static chunk shape, padded tail
        flat_imgs.extend(np.asarray(imgs, np.float32)[:n])
        flat_offs.extend(np.asarray(offs)[:n])

    assert len(flat_imgs) == len(PAIRS)
    for (q, r), img, off in zip(PAIRS, flat_imgs, flat_offs):
        seg = select_best_split_segment(queries[q], refs[r], nf[q])
        expect = pad_sim_matrix(seg @ refs[r].T, res, channels=1)[..., 0]
        assert_allclose(img, expect, atol=2e-5, err_msg=f"{q}x{r}@{res}")
        # Offset identifies the same segment the host oracle picked.
        start = off
        assert_allclose(queries[q][start : start + len(seg)], seg, atol=0)


def test_images_match_candidate_sim_matrices_orientations():
    """Orig + on-device-transposed images == the host path's interleaved
    (sim, sim.T) stream after padding."""
    queries, refs, nf = mixed_corpus()
    builder = DeviceSimBuilder(queries, refs, nf)
    cands = [(q, r, 1.0) for q, r in PAIRS]
    feats, infos = candidate_sim_matrices(queries, refs, cands, nf)

    res = 160
    chunks = builder.images(PAIRS, res, chunk=3)
    got = []
    for imgs, _, n in chunks:
        arr = np.asarray(imgs, np.float32)
        for i in range(n):
            got.append((arr[i], arr[i].T))
    for k, (img, img_t) in enumerate(got):
        host = pad_sim_matrix(feats[2 * k], res, 1)[..., 0]
        host_t = pad_sim_matrix(feats[2 * k + 1], res, 1)[..., 0]
        assert_allclose(img, host, atol=2e-5)
        assert_allclose(img_t, host_t, atol=2e-5)


def test_crop_hw_partial_segment():
    queries, refs, nf = mixed_corpus()
    builder = DeviceSimBuilder(queries, refs, nf)
    pairs = [("Q2", "R2")]  # planted in the 7-row partial trailing segment
    chunks = builder.images(pairs, 224, chunk=1)
    offs = np.asarray(chunks[0][1])[:1]
    assert int(offs[0]) == 30  # the partial segment won
    hw = builder.crop_hw(pairs, 224, offs)
    assert hw == [(7, 33)]  # h = remaining rows, w = ref length


@pytest.mark.heavy
def test_matching_inference_device_matches_host():
    """Full stages 3-6 equality between the device sim path and the host
    fallback (same candidates, probabilities, rows)."""
    from vsc22_tpu.models.hrnet import sam_hrnet_tiny_test
    from vsc22_tpu.models.mobilenetv3 import mobilenetv3_small
    from vsc22_tpu.pipelines.matching_infer import (
        ClassifyEnsemble,
        RefineEnsemble,
        matching_inference,
    )

    queries, refs, nf = mixed_corpus()
    qvf = [
        VideoFeature(video_id=k, feature=v, timestamps=np.arange(float(len(v))))
        for k, v in queries.items()
    ]
    rvf = [
        VideoFeature(video_id=k, feature=v, timestamps=np.arange(float(len(v))))
        for k, v in refs.items()
    ]
    cls_models, ref_models = [], []
    for seed in (0, 1):
        m = mobilenetv3_small(num_classes=2)
        v = m.init(jax.random.PRNGKey(seed), jnp.zeros((1, 160, 160, 3)),
                   train=False)
        cls_models.append((m, v))
    for seed in (2, 3):
        m = sam_hrnet_tiny_test()
        v = m.init(jax.random.PRNGKey(seed), jnp.zeros((1, 224, 224, 3)),
                   train=False)
        ref_models.append((m, v))
    classify = ClassifyEnsemble(cls_models, batch=4)
    refine = RefineEnsemble(ref_models, batch=2)

    kwargs = dict(
        queries=qvf, refs=rvf,
        sn_queries=[dataclasses.replace(v) for v in qvf],
        sn_refs=[dataclasses.replace(v) for v in rvf],
        query_video_len_map=nf,
        classify=classify, refine=refine,
        cls_threshold=0.0,
    )
    rows_host = matching_inference(use_device_sims=False, **kwargs)
    rows_dev = matching_inference(use_device_sims=True, **kwargs)

    def canon(rows):
        return sorted(
            (q, r, float(a), float(b), float(c), float(d), round(float(s), 4))
            for q, r, a, b, c, d, s in rows
        )

    assert canon(rows_dev) == canon(rows_host)
