"""Dataset / chat-template / packing / train-CLI tests."""

import json
import os

import numpy as np
import pytest

from visionselector_tpu.train.dataset import (
    ConversationDataset,
    DatasetSpec,
    pack_text_samples,
    parse_dataset_names,
    render_conversation,
)
from visionselector_tpu.train.loss import IGNORE_INDEX


class StubTokenizer:
    """Maps each character to an id — deterministic, reversible enough."""

    def encode(self, text):
        return [ord(c) % 500 + 10 for c in text]


class TestRegistry:
    def test_sampling_rate_suffix(self):
        reg = {"coco": {"annotation_path": "a.jsonl", "data_path": "imgs"},
               "chartqa": {"annotation_path": "b.jsonl", "data_path": ""}}
        specs = parse_dataset_names("coco%10,chartqa", reg)
        assert specs[0].sampling_rate == pytest.approx(0.1)
        assert specs[1].sampling_rate == 1.0


class TestChatTemplate:
    def test_supervision_mask(self):
        convs = [
            {"from": "human", "value": "<image>What is this?"},
            {"from": "gpt", "value": "A cat."},
            {"from": "human", "value": "Color?"},
            {"from": "gpt", "value": "Black."},
        ]
        ids, labels, slots = render_conversation(convs, StubTokenizer())
        assert len(ids) == len(labels)
        assert len(slots) == 1 and slots[0] > 0
        sup = [l for l in labels if l != IGNORE_INDEX]
        # both assistant replies supervised, questions not
        assert 0 < len(sup) < len(ids)
        # answer text present in supervised ids
        tok = StubTokenizer()
        cat = tok.encode("A cat.<|im_end|>\n")
        assert sup[: len(cat)] == cat

    def test_no_image(self):
        convs = [{"from": "human", "value": "Hi"}, {"from": "gpt", "value": "Yo"}]
        ids, labels, slots = render_conversation(convs, StubTokenizer())
        assert slots == []


class TestDataset:
    def make_ds(self, tmp_path, n=4, bad_image_at=None):
        from PIL import Image

        img = tmp_path / "img.png"
        Image.fromarray(
            (np.random.RandomState(0).rand(56, 56, 3) * 255).astype(np.uint8)
        ).save(img)
        ann = tmp_path / "data.jsonl"
        with open(ann, "w") as f:
            for i in range(n):
                name = "missing.png" if i == bad_image_at else "img.png"
                f.write(json.dumps({
                    "id": i,
                    "image": name,
                    "conversations": [
                        {"from": "human", "value": f"<image>Q{i}?"},
                        {"from": "gpt", "value": f"A{i}"},
                    ],
                }) + "\n")
        return ConversationDataset(str(ann), str(tmp_path), StubTokenizer())

    def test_basic_load(self, tmp_path):
        ds = self.make_ds(tmp_path)
        rec = ds[0]
        assert rec["image"] is not None
        assert rec["image_slot"] > 0

    def test_neighbor_fallback_on_bad_sample(self, tmp_path):
        ds = self.make_ds(tmp_path, bad_image_at=1)
        rec = ds[1]  # falls back to a neighbor instead of raising
        assert rec["image"] is not None
        assert rec["id"] != 1


class TestPacking:
    def test_first_fit(self):
        samples = [{"ids": [0] * n} for n in (60, 50, 40, 30)]
        plan = pack_text_samples(samples, t_bucket=100)
        # 60+40, 50+30 (first-fit order: 60 | +50? no -> new | 40 joins 60 | 30 joins 50)
        assert sorted(map(sorted, plan["groups"])) == [[0, 2], [1, 3]]
        assert all(s <= 100 for s in plan["sizes"])


class TestTrainCLI:
    def test_smoke_run(self, tmp_path, capsys):
        from visionselector_tpu.api.train import main

        out = str(tmp_path / "run")
        rc = main([
            "--output-dir", out, "--smoke", "--total-steps", "3",
            "--batch-size", "2", "--save-steps", "3", "--log-steps", "1",
            "--budget", "0.25",
        ])
        assert rc == 0
        assert os.path.exists(os.path.join(out, "checkpoint-3"))
        assert os.path.exists(os.path.join(out, "importance_scorer.safetensors"))
        lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
        metrics = json.loads(lines[-1])
        assert np.isfinite(metrics["loss"])

    def test_resume(self, tmp_path):
        from visionselector_tpu.api.train import main

        out = str(tmp_path / "run")
        main(["--output-dir", out, "--smoke", "--total-steps", "2",
              "--batch-size", "2", "--save-steps", "2"])
        # second invocation resumes from checkpoint-2 and continues to 4
        main(["--output-dir", out, "--smoke", "--total-steps", "4",
              "--batch-size", "2", "--save-steps", "4"])
        assert os.path.exists(os.path.join(out, "checkpoint-4"))


class TestPackedTrainSample:
    def test_pack_two_records_forward(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from visionselector_tpu.core.config import qwen25vl_tiny
        from visionselector_tpu.models.qwen25vl.model import init_params
        from visionselector_tpu.train.dataset import build_packed_train_sample
        from visionselector_tpu.train.loss import selector_train_forward

        cfg = qwen25vl_tiny()
        params = init_params(jax.random.PRNGKey(0), cfg)

        from PIL import Image

        rng = np.random.RandomState(0)
        recs = []
        for i in range(2):
            img = Image.fromarray(
                (rng.rand(56, 56, 3) * 255).astype(np.uint8)
            )
            recs.append({
                "ids": [100 + i, 200], "labels": [IGNORE_INDEX, 201 + i],
                "image_slot": 1, "image": img,
            })
        sample = build_packed_train_sample(
            cfg, recs, budget=0.25, s_bucket=64, t_bucket=64,
            min_pixels=1, max_pixels=10**9,
        )
        # two LM segments, joint vision batch
        assert set(np.unique(sample.seg_ids)) == {0, 1, 2}
        assert sample.num_merged == 8  # 2 images x 4 merged tokens
        # first token of each sample not supervised (no cross-sample CE)
        starts = [0, np.where(sample.seg_ids == 2)[0][0]]
        for s in starts:
            assert sample.labels[s] == IGNORE_INDEX

        jsample = jax.tree.map(jnp.asarray, sample)
        loss, metrics = selector_train_forward(
            params, jsample, cfg, jnp.asarray(1.0), k_max=4
        )
        assert np.isfinite(float(loss))
        np.testing.assert_allclose(
            float(metrics["soft_mass"]), float(sample.k), rtol=0.05
        )


class TestMultiImageTraining:
    """Per-record image lists in TRAINING samples (reference data layer
    processes per-record lists, ``data_qwen.py:233-242``)."""

    def test_render_two_placeholders(self):
        convs = [
            {"from": "human",
             "value": "<image>first and <image>second, compare?"},
            {"from": "gpt", "value": "Same."},
        ]
        ids, labels, slots = render_conversation(convs, StubTokenizer())
        assert len(slots) == 2 and slots[0] < slots[1]

    def test_two_image_record_loss(self):
        import jax
        import jax.numpy as jnp
        from PIL import Image

        from visionselector_tpu.core.config import qwen25vl_tiny
        from visionselector_tpu.models.qwen25vl.model import init_params
        from visionselector_tpu.train.dataset import build_sample_from_record
        from visionselector_tpu.train.loss import selector_train_forward

        cfg = qwen25vl_tiny()
        params = init_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.RandomState(0)
        imgs = [
            Image.fromarray((rng.rand(56, 56, 3) * 255).astype(np.uint8))
            for _ in range(2)
        ]
        rec = {
            "ids": [100, 101, 200, 300], "labels": [IGNORE_INDEX] * 3 + [301],
            "image_slot": 1, "image_slots": [1, 2],
            "image": imgs[0], "images": imgs, "video": None,
        }
        sample = build_sample_from_record(
            cfg, rec, budget=0.25, s_bucket=64, t_bucket=64,
            min_pixels=1, max_pixels=10**9,
        )
        assert int(sample.num_merged) == 8  # 2 images x 4 merged tokens
        # two distinct vision runs in the expanded ids
        starts = np.where(
            sample.input_ids == cfg.vision_start_token_id)[0]
        assert len(starts) == 2
        loss, metrics = selector_train_forward(
            params, jax.tree.map(jnp.asarray, sample), cfg,
            jnp.asarray(1.0), k_max=4,
        )
        assert np.isfinite(float(loss))


class TestDataFlattenWiring:
    """--data-flatten CLI path (reference default recipe: ``sft_3b.sh
    --data_flatten True`` -> ``trainer.py:29-120``): the packed stream
    groups records and the packed loss equals the padded-batch loss."""

    def _records(self, n=2, tok0=100):
        from PIL import Image

        rng = np.random.RandomState(0)
        recs = []
        for i in range(n):
            img = Image.fromarray(
                (rng.rand(56, 56, 3) * 255).astype(np.uint8)
            )
            recs.append({
                "ids": [tok0 + i, 200, 300], "labels": [IGNORE_INDEX, 201 + i, 301],
                "image_slot": 1, "image": img, "video": None,
            })
        return recs

    def test_packed_stream_groups_and_video_passthrough(self):
        from types import SimpleNamespace

        from visionselector_tpu.api.train import _packed_stream
        from visionselector_tpu.core.config import qwen25vl_tiny

        cfg = qwen25vl_tiny()
        recs = self._records(3)
        # a video record must pass through unpacked via the single builder
        recs.insert(2, {"ids": [1, 2], "labels": [1, 2], "image_slot": 0,
                        "image": None, "video": "dummy.npy"})
        args = SimpleNamespace(text_bucket=128, vision_bucket=128,
                               budget=0.25)
        singles = []

        def single_builder(cfg_, rec, budget, s_bucket, t_bucket):
            singles.append(rec)
            return "SINGLE"

        stream = _packed_stream(cfg, recs, args, single_builder)
        first = next(stream)   # recs 0+1 packed (video stops the group)
        second = next(stream)  # the video record, unpacked
        assert second == "SINGLE" and singles[0]["video"] == "dummy.npy"
        assert set(np.unique(first.seg_ids)) == {0, 1, 2}

    def test_packed_loss_equals_padded_batch_loss(self):
        """Two same-shape records: CE of the packed row == mean of the two
        padded single-sample CEs (block-diagonal attention + per-sample rope
        restart + first-token label masking make them the same program)."""
        import jax
        import jax.numpy as jnp

        from visionselector_tpu.core.config import qwen25vl_tiny
        from visionselector_tpu.models.qwen25vl.model import init_params
        from visionselector_tpu.train.dataset import (
            build_packed_train_sample,
            build_sample_from_record,
        )
        from visionselector_tpu.train.sft import sft_train_forward

        cfg = qwen25vl_tiny()
        params = init_params(jax.random.PRNGKey(0), cfg)
        recs = self._records(2)

        packed = build_packed_train_sample(
            cfg, recs, budget=0.25, s_bucket=64, t_bucket=64,
            min_pixels=1, max_pixels=10**9,
        )
        jpacked = jax.tree.map(jnp.asarray, packed)
        ce_packed, _ = sft_train_forward(params, jpacked, cfg)

        ces = []
        for rec in recs:
            s = build_sample_from_record(
                cfg, rec, budget=0.25, s_bucket=64, t_bucket=64,
                min_pixels=1, max_pixels=10**9,
            )
            ce, _ = sft_train_forward(params, jax.tree.map(jnp.asarray, s),
                                      cfg)
            ces.append(float(ce))
        # both records supervise the same token count -> plain mean
        np.testing.assert_allclose(
            float(ce_packed), np.mean(ces), rtol=2e-4,
        )


class TestOVTrainCLI:
    def test_ov_family_smoke_run(self, tmp_path, capsys):
        """--family llava_ov15 parity with the OV selector SFT entry
        (``llava-ov-15/src/train/train_sft_visionselector.py``)."""
        from visionselector_tpu.api.train import main

        out = str(tmp_path / "ov_run")
        rc = main([
            "--output-dir", out, "--smoke", "--total-steps", "2",
            "--batch-size", "2", "--save-steps", "2", "--log-steps", "1",
            "--budget", "0.25", "--family", "llava_ov15",
            "--reg-weight-end", "3.0",
        ])
        assert rc == 0
        assert os.path.exists(os.path.join(out, "checkpoint-2"))
        assert os.path.exists(os.path.join(out, "importance_scorer.safetensors"))
        lines = [l for l in capsys.readouterr().out.splitlines()
                 if l.startswith("{")]
        metrics = json.loads(lines[-1])
        assert np.isfinite(metrics["loss"])


class TestVideoTraining:
    def test_video_record_builds_sample_and_trains(self, tmp_path):
        """Video training records (<video> placeholder, data_qwen.py:266-285):
        frame-dir video -> TrainBatchSample with video M-RoPE -> train step."""
        import jax
        import jax.numpy as jnp
        from PIL import Image

        from visionselector_tpu.core.config import qwen25vl_tiny
        from visionselector_tpu.models.qwen25vl.model import init_params
        from visionselector_tpu.train.data import stack_samples
        from visionselector_tpu.train.dataset import (
            ConversationDataset,
            build_sample_from_record,
        )
        from visionselector_tpu.train.train_step import (
            ScheduleConfig,
            init_train_state,
            train_step,
        )

        cfg = qwen25vl_tiny()
        vid_dir = tmp_path / "vid0"
        os.makedirs(vid_dir)
        for i in range(4):
            Image.fromarray(
                (np.random.RandomState(i).rand(28, 28, 3) * 255).astype(np.uint8)
            ).save(vid_dir / f"f{i:02d}.png")
        ann = tmp_path / "ann.jsonl"
        with open(ann, "w") as f:
            f.write(json.dumps({
                "video": "vid0",
                "conversations": [
                    {"from": "human", "value": "<video>What happens?"},
                    {"from": "gpt", "value": "Things."},
                ],
            }) + "\n")

        class Tok:
            def encode(self, s):
                return [abs(hash(w)) % 1000 + 600 for w in s.split()][:6]

        ds = ConversationDataset(str(ann), str(tmp_path), Tok())
        rec = ds[0]
        assert rec["video"] is not None and rec["image"] is None
        sample = build_sample_from_record(cfg, rec, 0.5, 64, 64,
                                          min_pixels=1, max_pixels=10**9)
        # video token id used in the spliced run
        assert (sample.input_ids == cfg.video_token_id).sum() == sample.num_merged
        # temporal rope axis advances across frames
        vid_pos = np.where(sample.input_ids == cfg.video_token_id)[0]
        t_axis = sample.position_ids[0][vid_pos]
        assert t_axis.max() > t_axis.min()

        params = init_params(jax.random.PRNGKey(0), cfg)
        sched = ScheduleConfig(total_steps=2)
        state = init_train_state(params, sched)
        batch = jax.tree.map(jnp.asarray, stack_samples([sample, sample]))
        state, metrics = train_step(state, params, batch, cfg,
                                    max(1, int(16 * 0.5)), sched)
        assert np.isfinite(float(metrics["loss"]))


class TestLoaderConfigCopy:
    def test_copies_processor_configs(self, tmp_path):
        """Post-train config copy (reference train_qwen_selector.py:278-301:
        the output dir must be directly loadable for eval)."""
        from visionselector_tpu.api.train import _copy_loader_configs

        src = tmp_path / "ckpt"
        dst = tmp_path / "out"
        os.makedirs(src)
        os.makedirs(dst)
        for n in ("preprocessor_config.json", "chat_template.json",
                  "tokenizer_config.json"):
            (src / n).write_text("{}")
        (dst / "tokenizer_config.json").write_text('{"mine": 1}')
        _copy_loader_configs(str(src), str(dst))
        assert (dst / "preprocessor_config.json").exists()
        assert (dst / "chat_template.json").exists()
        # existing files are never overwritten
        assert (dst / "tokenizer_config.json").read_text() == '{"mine": 1}'
        _copy_loader_configs(None, str(dst))  # no-op without a base ckpt
