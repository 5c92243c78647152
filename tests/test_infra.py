"""Infrastructure: checkpointing, config system, observability, vid-score
trainer, ref extraction, descriptor CLI end-to-end smoke."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cv2

from vsc22_tpu.train.checkpoint import (
    CheckpointManager,
    load_params_snapshot,
    save_ema_snapshot,
)
from vsc22_tpu.utils.config import Config, parse_override_args


class TestCheckpoint:
    def make_state(self, lr=1e-3, ema=True):
        from vsc22_tpu.models.vit import vit_tiny_test_descriptor
        from vsc22_tpu.train.contrastive import ContrastiveConfig, create_train_state

        model = vit_tiny_test_descriptor()
        cfg = ContrastiveConfig(
            total_steps=10, learning_rate=lr, entropy_weight=1.0,
            ema_decay=0.9 if ema else None,
        )
        batch = {
            "img_a": jnp.zeros((2, 64, 64, 3)),
            "img_b": jnp.zeros((2, 64, 64, 3)),
        }
        state, tx = create_train_state(model, jax.random.PRNGKey(0), batch, cfg)
        return model, cfg, tx, state, batch

    def test_save_restore_roundtrip(self, tmp_path):
        model, cfg, tx, state, batch = self.make_state()
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(3, state)
        assert mgr.latest_step() == 3
        restored = mgr.restore(state)
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        mgr.close()

    def test_resume_continues_training(self, tmp_path):
        from vsc22_tpu.train.contrastive import make_train_step

        model, cfg, tx, state, batch = self.make_state()
        step = make_train_step(model, tx, cfg)
        rng = jax.random.PRNGKey(1)
        state, _ = step(state, batch, rng)
        mgr = CheckpointManager(str(tmp_path / "ckpt2"))
        mgr.save(int(state.step), state)
        restored = mgr.restore(jax.tree.map(np.asarray, state))
        state2, _ = step(restored, batch, rng)
        assert int(state2.step) == 2
        mgr.close()

    def test_ema_snapshot_roundtrip(self, tmp_path):
        model, cfg, tx, state, batch = self.make_state()
        path = str(tmp_path / "ema.npz")
        save_ema_snapshot(path, state)
        params = load_params_snapshot(path, state.params)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state.ema_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestConfig:
    def test_fromfile_and_attrs(self, tmp_path):
        cfg_file = tmp_path / "cfg.py"
        cfg_file.write_text(
            "img_width = 256\n"
            "preprocess = 'vit'\n"
            "model = dict(type='swinv2_tiny_test')\n"
            "data = dict(probs=(0.6, 0.4), crop=0.8)\n"
        )
        cfg = Config.fromfile(str(cfg_file))
        assert cfg.img_width == 256
        assert cfg.model.type == "swinv2_tiny_test"
        assert cfg.data.crop == 0.8

    def test_merge_flags(self):
        cfg = Config({"a": {"b": 1}, "c": "x"})
        out = cfg.merge_flags({"a.b": "2", "c": "y", "d.e": "3.5"})
        assert out.a.b == 2
        assert out.c == "y"
        assert out.d.e == 3.5
        assert cfg.a.b == 1  # original untouched

    def test_parse_override_args(self):
        assert parse_override_args(["a.b=1", "c=x"]) == {"a.b": "1", "c": "x"}
        with pytest.raises(ValueError):
            parse_override_args(["novalue"])


class TestObservability:
    def test_stage_timer(self):
        from vsc22_tpu.utils.observability import StageTimer

        t = StageTimer()
        with t.stage("a"):
            pass
        with t.stage("a"):
            pass
        with t.stage("b"):
            pass
        assert t.counts["a"] == 2
        assert "a:" in t.report()

    def test_setup_logging_process0(self, tmp_path):
        from vsc22_tpu.utils.observability import setup_logging

        logger = setup_logging("t1", str(tmp_path), process_index=0)
        logger.info("hello")
        assert (tmp_path / "log.txt").exists()
        logger2 = setup_logging("t2", str(tmp_path), process_index=1)
        assert all(isinstance(h, __import__("logging").NullHandler) for h in logger2.handlers)


class TestVidScoreTrainer:
    def test_training_separates_classes(self):
        from vsc22_tpu.models.vsm import vsm_tiny_test
        from vsc22_tpu.train.vid_score import (
            VidScoreConfig,
            create_vid_score_state,
            evaluate_ap,
            make_vid_score_train_step,
        )

        rng = np.random.default_rng(0)
        # Positives: high-norm features; negatives: tiny features.
        def make_batch(n=16):
            feats = np.zeros((n, 8, 16), np.float32)
            labels = np.zeros(n, np.float32)
            for i in range(n):
                if i % 2 == 0:
                    feats[i, :4] = rng.standard_normal((4, 16)) + 3.0
                    labels[i] = 1.0
                else:
                    feats[i, :4] = rng.standard_normal((4, 16)) * 0.1
            return {"feats": jnp.asarray(feats), "label": jnp.asarray(labels)}

        model = vsm_tiny_test()
        cfg = VidScoreConfig(total_steps=60, learning_rate=1e-3, warmup_ratio=0.0)
        batch = make_batch()
        state, tx = create_vid_score_state(model, jax.random.PRNGKey(0), batch["feats"], cfg)
        step = make_vid_score_train_step(model, tx, cfg)
        key = jax.random.PRNGKey(1)
        for _ in range(30):
            key, sub = jax.random.split(key)
            state, metrics = step(state, make_batch(), sub)
        ap, scores, labels = evaluate_ap(
            model, state.params, [jax.device_get(make_batch())]
        )
        assert ap > 0.9


class TestRefExtract:
    def test_shard_and_merge(self, tmp_path):
        from vsc22_tpu.models.vit import vit_tiny_test_descriptor
        from vsc22_tpu.pipelines.query_extract import DescriptorExtractor
        from vsc22_tpu.pipelines.ref_extract import (
            extract_references,
            merge_shards,
            shard_videos,
        )

        assert shard_videos(["c", "a", "b"], 0, 2) == ["a", "c"]
        assert shard_videos(["c", "a", "b"], 1, 2) == ["b"]

        model = vit_tiny_test_descriptor()
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
        ex = DescriptorExtractor(model=model, params=params, size=64, chunk=4)
        rng = np.random.default_rng(1)
        videos = [
            (f"R{i:06d}", [rng.integers(0, 255, (48, 48, 3), dtype=np.uint8) for _ in range(3)])
            for i in range(4)
        ]
        prefix = str(tmp_path / "refs")
        # Simulate 2 processes.
        extract_references(videos, ex, prefix, process_index=0, process_count=2, merge=False)
        extract_references(videos, ex, prefix, process_index=1, process_count=2, merge=False)
        out = merge_shards(prefix)
        from vsc22_tpu.core.storage import load_features

        feats = load_features(out)
        assert [vf.video_id for vf in feats] == [f"R{i:06d}" for i in range(4)]
        assert feats[0].feature.shape == (3, 16)


def make_tiny_video_store(tmp_path, n_videos=3, frames=4):
    from vsc22_tpu.data.store import FrameStore

    rng = np.random.default_rng(0)
    videos = []
    for i in range(n_videos):
        fs = []
        for _ in range(frames):
            img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
            ok, buf = cv2.imencode(".jpg", img)
            fs.append(buf.tobytes())
        videos.append((f"R{i:06d}", fs))
    return FrameStore.build(str(tmp_path / "f.rec"), videos)


@pytest.mark.heavy
def test_descriptor_cli_end_to_end(tmp_path):
    """One real CLI run: tiny model, 1 epoch, checkpoint written."""
    from vsc22_tpu.train import descriptor_cli

    make_tiny_video_store(tmp_path)
    cfg_file = tmp_path / "cfg.py"
    cfg_file.write_text(
        "img_width = 64\npreprocess = 'vit'\nmodel = dict(type='vit_tiny_test')\n"
    )
    work_dir = tmp_path / "run"
    state = descriptor_cli.main(
        [
            "--config", str(cfg_file),
            "--store", str(tmp_path / "f.rec"),
            "--work_dir", str(work_dir),
            "--batch_size", "8",
            "--epochs", "1",
            "--num_workers", "2",
            "--entropy_weight", "1.0",
            "--print_freq", "1",
        ]
    )
    assert int(jax.device_get(state.step)) >= 1
    assert (work_dir / "log.txt").exists()
    assert (work_dir / "epoch_0_ema.npz").exists()
    ckpts = os.listdir(work_dir / "checkpoints")
    assert len(ckpts) >= 1


class TestDistributedHelpers:
    def test_maybe_initialize_noop_single_process(self, monkeypatch):
        from vsc22_tpu.parallel import distributed

        for var in ("JAX_COORDINATOR_ADDRESS", "MASTER_ADDR"):
            monkeypatch.delenv(var, raising=False)
        assert distributed.maybe_initialize() is False

    def test_barrier_and_allgather_single_process(self):
        from vsc22_tpu.parallel.distributed import barrier, process_allgather

        barrier("test")  # no-op
        out = process_allgather(np.arange(4))
        assert out.shape == (1, 4)
