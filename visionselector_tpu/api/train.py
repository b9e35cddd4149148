"""Selector training CLI (reference parity: ``qwen-vl-finetune/qwenvl/train/
train_qwen_selector.py`` + ``scripts/sft_3b.sh``).

Usage:
    python -m visionselector_tpu.api.train \
        --model-path /ckpt --annotation data.jsonl --image-root imgs/ \
        --output-dir runs/selector --budget 0.2 \
        --reg-weight-start 0.1 --reg-weight-end 2.0 \
        --lr 5e-5 --total-steps 1000 --batch-size 8

Only the LIS scorer trains (frozen backbone); AdamW warmup-cosine; linear
reg-weight curriculum; orbax checkpoint-<step> auto-resume; final scorer
export to the reference's safetensors layout.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-path", default=None, help="HF checkpoint dir")
    p.add_argument("--annotation", required=False, default=None)
    p.add_argument("--image-root", default="")
    p.add_argument("--datasets", default=None,
                   help="name[%%rate],... against --dataset-registry json")
    p.add_argument("--dataset-registry", default=None)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--budget", type=float, default=0.2)
    p.add_argument("--reg-weight-start", type=float, default=0.1)
    p.add_argument("--reg-weight-end", type=float, default=2.0)
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--warmup-ratio", type=float, default=0.03)
    p.add_argument("--max-grad-norm", type=float, default=1.0,
                   help="global-norm gradient clipping (reference "
                        "TrainingArguments default; 0 disables)")
    p.add_argument("--gradient-checkpointing", action="store_true",
                   help="remat the LM layer scan: exact, recomputes "
                        "activations on backward for O(1)-layer memory "
                        "(reference --gradient_checkpointing True)")
    p.add_argument("--total-steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=8,
                   help="global batch (sharded over the data mesh axis)")
    p.add_argument("--grad-accum-steps", type=int, default=1,
                   help="micro-steps accumulated per optimizer update "
                        "(effective batch = batch-size * this; one jitted "
                        "lax.scan program, one micro-batch of activations "
                        "live at a time — reference "
                        "--gradient_accumulation_steps)")
    p.add_argument("--vision-bucket", type=int, default=4096)
    p.add_argument("--text-bucket", type=int, default=2048)
    p.add_argument("--save-steps", type=int, default=200)
    p.add_argument("--async-save", action="store_true",
                   help="checkpoint writes happen on orbax background "
                        "threads while training continues (at most one in "
                        "flight; the final save is always joined before "
                        "export)")
    p.add_argument("--log-steps", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--smoke", action="store_true",
                   help="tiny random model + synthetic data (CI)")
    p.add_argument("--family", default="qwen25vl",
                   choices=("qwen25vl", "llava_ov15"),
                   help="model family (OV selector SFT parity: "
                        "llava-ov-15/src/train/train_sft_visionselector.py)")
    p.add_argument("--method", default="selector",
                   choices=("selector", "dynamic", "sft", "dpo", "grpo"),
                   help="dynamic = Gumbel-ST VisionPredictor training "
                        "(train_qwen_dynamic.py parity); sft = baseline "
                        "full-model CE training (train_qwen.py parity); "
                        "dpo = preference optimization against a frozen "
                        "reference policy (train_dpo.py/dpo_trainer.py "
                        "parity; annotation records carry "
                        "prompt/chosen/rejected); grpo = sampled-rollout "
                        "RL with group-relative advantages "
                        "(train_grpo.py/grpo_trainer.py parity; records "
                        "carry prompt/solution)")
    # DPO knobs (reference src/trainer/dpo_trainer.py / trl surface)
    p.add_argument("--beta", type=float, default=0.1)
    p.add_argument("--dpo-loss-type", default="sigmoid",
                   choices=("sigmoid", "ipo"))
    p.add_argument("--rpo-alpha", type=float, default=0.0,
                   help="> 0 adds alpha * CE(chosen) (RPO NLL term)")
    p.add_argument("--label-smoothing", type=float, default=0.0)
    # GRPO knobs (reference src/trainer/grpo_trainer.py / trl surface)
    p.add_argument("--grpo-beta", type=float, default=0.04,
                   help="KL-to-reference weight (0 skips the ref forward)")
    p.add_argument("--num-generations", type=int, default=4)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--max-completion-length", type=int, default=64)
    p.add_argument("--grpo-loss-type", default="grpo",
                   choices=("grpo", "bnpo", "dr_grpo"))
    p.add_argument("--rewards", default="accuracy,format",
                   help="comma list from train.grpo.REWARD_FUNCS "
                        "(reference reward_funcs.py)")
    p.add_argument("--tau-start", type=float, default=1.0)
    p.add_argument("--tau-end", type=float, default=0.1)
    p.add_argument("--mask-loss-weight", type=float, default=100.0)
    # SFT freeze policy (reference argument.py tune_mm_* knobs). tune-mm-llm
    # defaults ON (an all-frozen SFT trains nothing); disable explicitly with
    # --no-tune-mm-llm for vision-/merger-only finetuning.
    p.add_argument("--tune-mm-vision", action="store_true")
    p.add_argument("--tune-mm-mlp", action="store_true")
    p.add_argument("--tune-mm-llm", action=argparse.BooleanOptionalAction,
                   default=True)
    # LoRA (reference params.py lora_rank=64 / lora_alpha=16; 0 = off)
    p.add_argument("--lora-rank", type=int, default=0)
    p.add_argument("--lora-alpha", type=int, default=16)
    # Packed/flattened training: greedy-pack consecutive records into one
    # sequence row with block-diagonal attention (segment ids) — the
    # reference's default recipe (``sft_3b.sh --data_flatten True`` ->
    # ``qwen-vl-finetune/qwenvl/train/trainer.py:29-120`` varlen patch +
    # ``data_qwen.py:566-637`` flattened collator).
    p.add_argument("--data-flatten", action=argparse.BooleanOptionalAction,
                   default=False)
    # Host/device overlap: build + device_put the next N batches in a
    # background thread while the device runs the current step (the JAX
    # analog of the reference's DataLoader workers, ``sft_3b.sh
    # --dataloader_num_workers 4``). 0 = synchronous.
    p.add_argument("--prefetch", type=int, default=2)
    return p


def _packed_stream(cfg, ds, args, single_builder):
    """Greedy first-fit packing of consecutive image records into one
    TrainBatchSample row (reference flattened recipe: ``sft_3b.sh
    --data_flatten True`` -> ``trainer.py:29-120`` + ``data_qwen.py:566-637``).
    Video/text-only records pass through unpacked."""
    from visionselector_tpu.preprocess.image import smart_resize
    from visionselector_tpu.train.dataset import build_packed_train_sample

    factor = cfg.vision.patch_size * cfg.vision.spatial_merge_size

    def est_cost(rec):
        """(vision-expanded token count, patch count) without patchifying."""
        w, h = rec["image"].size
        hb, wb = smart_resize(h, w, factor=factor,
                              min_pixels=56 * 56, max_pixels=28 * 28 * 1280)
        patches = (hb // cfg.vision.patch_size) * (wb // cfg.vision.patch_size)
        t = len(rec["ids"]) + patches // cfg.vision.spatial_merge_unit + 2
        return t, patches

    def record_iter():
        j = 0
        while True:
            yield ds[j % len(ds)]
            j += 1

    def _not_packable(rec):
        # videos, text-only and MULTI-IMAGE records go through the
        # single-sample builder (which handles image lists); the packed
        # builder splices exactly one image per record
        return (rec.get("video") is not None or rec["image"] is None
                or len(rec.get("images") or []) > 1)

    rit = record_iter()
    pending = None
    while True:
        group, tlen, patches = [], 0, 0
        while len(group) < 16:
            rec = pending if pending is not None else next(rit)
            pending = None
            if _not_packable(rec):
                pending = rec
                break
            et, ep = est_cost(rec)
            if group and (tlen + et > args.text_bucket
                          or patches + ep > args.vision_bucket):
                pending = rec
                break
            group.append(rec)
            tlen += et
            patches += ep
        if group:
            yield build_packed_train_sample(
                cfg, group, args.budget, args.vision_bucket, args.text_bucket
            )
        if pending is not None and _not_packable(pending):
            # not packable: run it as a classic single-sample row
            yield single_builder(
                cfg, pending, args.budget, args.vision_bucket,
                args.text_bucket,
            )
            pending = None


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from visionselector_tpu.core.checkpoint import maybe_resume, save_train_state
    from visionselector_tpu.core.config import qwen25vl_tiny
    from visionselector_tpu.core.mesh import batch_sharding, make_mesh, shard_params
    from visionselector_tpu.models.qwen25vl.model import init_params
    from visionselector_tpu.models.qwen25vl.weights import (
        export_scorer_to_safetensors,
    )
    from visionselector_tpu.train.data import stack_samples
    from visionselector_tpu.train.train_step import (
        ScheduleConfig,
        init_train_state,
        train_step,
    )

    is_ov = args.family == "llava_ov15"
    if args.smoke or not args.model_path:
        if is_ov:
            from visionselector_tpu.core.config import llava_ov_tiny
            from visionselector_tpu.models.llava_ov15.model import (
                init_ov_params,
            )

            cfg = llava_ov_tiny()
            params = init_ov_params(jax.random.PRNGKey(args.seed), cfg)
        else:
            cfg = qwen25vl_tiny()
            params = init_params(jax.random.PRNGKey(args.seed), cfg)
        args.vision_bucket = min(args.vision_bucket, 128)
        args.text_bucket = min(args.text_bucket, 128)
    else:
        if is_ov:
            from visionselector_tpu.models.llava_ov15.weights import (
                load_ov_checkpoint,
                ov_config_from_hf,
            )

            cfg = ov_config_from_hf(args.model_path)
            params = load_ov_checkpoint(args.model_path, cfg)
        else:
            from visionselector_tpu.models.qwen25vl.weights import (
                config_from_hf,
                load_hf_checkpoint,
            )

            cfg = config_from_hf(args.model_path)
            params = load_hf_checkpoint(args.model_path, cfg)
        if "scorer" not in params:
            from visionselector_tpu.selector.scorer import init_scorer_params

            sel = cfg.with_selector(args.budget).selector
            params["scorer"] = init_scorer_params(
                jax.random.PRNGKey(args.seed), sel
            )

    # data
    def sample_stream():
        rng = np.random.RandomState(args.seed)
        if args.annotation:
            from visionselector_tpu.train.dataset import (
                ConversationDataset,
                build_sample_from_record,
            )

            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(
                args.model_path, local_files_only=True
            )
            ds = ConversationDataset(args.annotation, args.image_root, tokenizer)
            if is_ov:
                from visionselector_tpu.train.ov_loss import (
                    build_ov_sample_from_record,
                )

                builder = build_ov_sample_from_record
            else:
                builder = build_sample_from_record
            if args.data_flatten and not is_ov:
                yield from _packed_stream(cfg, ds, args, builder)
                return
            i = 0
            while True:
                rec = ds[i % len(ds)]
                i += 1
                yield builder(
                    cfg, rec, args.budget, args.vision_bucket, args.text_bucket
                )
        elif is_ov:  # synthetic smoke data (OV family)
            from visionselector_tpu.train.ov_loss import build_ov_train_sample

            while True:
                img = (rng.rand(56, 56, 3) * 255).astype(np.uint8)
                yield build_ov_train_sample(
                    cfg, img, [101, 102], [201, 202, 203],
                    answer_ids=[301, 302],
                    budget=args.budget, s_bucket=args.vision_bucket,
                    t_bucket=args.text_bucket,
                )
        else:  # synthetic smoke data
            from visionselector_tpu.train.data import build_train_sample

            while True:
                img = (rng.rand(56, 56, 3) * 255).astype(np.uint8)
                yield build_train_sample(
                    cfg, img, [101, 102], [103], [201, 202, 203],
                    budget=args.budget, s_bucket=args.vision_bucket,
                    t_bucket=args.text_bucket, min_pixels=1, max_pixels=10**9,
                )

    def dpo_pair_stream():
        rng = np.random.RandomState(args.seed)
        if args.annotation:
            from transformers import AutoTokenizer

            from visionselector_tpu.train.dpo import build_dpo_pair_from_record

            tokenizer = AutoTokenizer.from_pretrained(
                args.model_path, local_files_only=True
            )
            with open(args.annotation) as f:
                head = f.read(1)
                f.seek(0)
                if head == "[":  # json list (reference dpo_dataset surface)
                    records = json.load(f)
                else:  # jsonl
                    records = [json.loads(ln) for ln in f if ln.strip()]
            i = 0
            while True:
                rec = records[i % len(records)]
                i += 1
                yield build_dpo_pair_from_record(
                    cfg, rec, tokenizer, args.budget,
                    args.vision_bucket, args.text_bucket,
                    image_root=args.image_root, family=args.family,
                )
        else:  # synthetic smoke pairs: same prompt, two completions
            if is_ov:
                from visionselector_tpu.train.ov_loss import (
                    build_ov_train_sample as _build,
                )
            else:
                from visionselector_tpu.train.data import (
                    build_train_sample as _build,
                )

            kw = dict(budget=args.budget, s_bucket=args.vision_bucket,
                      t_bucket=args.text_bucket, min_pixels=1,
                      max_pixels=10**9)
            while True:
                img = (rng.rand(56, 56, 3) * 255).astype(np.uint8)
                yield (
                    _build(cfg, img, [101, 102], [103],
                           [201, 202, 203], **kw),
                    _build(cfg, img, [101, 102], [103],
                           [301, 302], **kw),
                )

    def grpo_prompt_stream():
        """Yields (images, raw_prompt_ids, image_slots, solution_text|None,
        tokenizer|None) — slots are placeholder offsets in the RAW ids
        (one per image; multi-image records get one grid row each)."""
        rng = np.random.RandomState(args.seed)
        if args.annotation:
            from transformers import AutoTokenizer

            from visionselector_tpu.train.dataset import render_conversation

            tokenizer = AutoTokenizer.from_pretrained(
                args.model_path, local_files_only=True
            )
            with open(args.annotation) as f:
                head = f.read(1)
                f.seek(0)
                records = (json.load(f) if head == "["
                           else [json.loads(ln) for ln in f if ln.strip()])
            from PIL import Image

            i = 0
            while True:
                rec = records[i % len(records)]
                i += 1
                if "conversations" in rec:
                    convo = list(rec["conversations"])
                    if convo and convo[-1].get(
                            "from", convo[-1].get("role")) in (
                            "gpt", "assistant"):
                        convo = convo[:-1]
                else:
                    prompt = rec["prompt"]
                    if "<image>" not in prompt and rec.get("image"):
                        prompt = "<image>" + prompt
                    convo = [{"from": "human", "value": prompt}]
                ids, _, slots = render_conversation(convo, tokenizer)
                # open the assistant turn so generation starts on-template
                # (the reference applies the chat template with
                # add_generation_prompt=True before rollout)
                from visionselector_tpu.train.dataset import IM_START

                ids = ids + tokenizer.encode(f"{IM_START}assistant\n")
                assert slots, "GRPO entry: records need at least one image"
                img_paths = rec["image"]
                if not isinstance(img_paths, list):
                    img_paths = [img_paths]
                assert len(img_paths) == len(slots), (img_paths, slots)
                images = []
                for p in img_paths:
                    with Image.open(os.path.join(args.image_root, p)) as im:
                        images.append(im.convert("RGB").copy())
                yield (images, ids, slots,
                       rec.get("solution", rec.get("answer", "")), tokenizer)
        else:  # synthetic smoke prompts
            while True:
                img = (rng.rand(56, 56, 3) * 255).astype(np.uint8)
                yield [img], [101, 102, 103], [2], None, None

    import math

    devices = jax.devices()
    n_data = math.gcd(args.batch_size, len(devices))
    mesh = make_mesh(n_data=n_data, n_model=1, devices=devices[:n_data])
    frozen = shard_params(params, mesh)
    is_dynamic = args.method == "dynamic"
    is_sft = args.method == "sft"
    is_dpo = args.method == "dpo"
    is_grpo = args.method == "grpo"
    def maybe_add_lora():
        """Attach LoRA adapters to the policy LM (the frozen ``frozen``/
        reference tree keeps the base weights — adapters apply wherever
        these params flow, including GRPO rollouts)."""
        nonlocal params
        if args.lora_rank > 0:
            from visionselector_tpu.train.lora import add_lora_params

            params = dict(params)
            params["lm"] = add_lora_params(
                params["lm"], jax.random.PRNGKey(args.seed + 1),
                rank=args.lora_rank, alpha=args.lora_alpha,
                dtype=cfg.jax_dtype,
            )

    if is_grpo:
        assert args.grad_accum_steps <= 1 or args.grpo_loss_type == "grpo", (
            "GRPO grad accumulation supports the per-sequence-mean 'grpo' "
            "reduction (bnpo/dr_grpo weight by global token counts)")
        assert args.num_generations >= 2, (
            "GRPO needs --num-generations >= 2 for a relative advantage")
        from visionselector_tpu.train.grpo import (
            GRPOScheduleConfig,
            grpo_train_step,
            grpo_train_step_accum,
            init_grpo_state,
        )

        maybe_add_lora()
        sched = GRPOScheduleConfig(
            total_steps=args.total_steps, lr=args.lr,
            weight_decay=args.weight_decay,
            warmup_ratio=args.warmup_ratio,
            max_grad_norm=args.max_grad_norm,
            remat=args.gradient_checkpointing,
            beta=args.grpo_beta, loss_type=args.grpo_loss_type,
            num_generations=args.num_generations,
            temperature=args.temperature,
            max_completion_length=args.max_completion_length,
            tune_mm_vision=args.tune_mm_vision,
            tune_mm_mlp=args.tune_mm_mlp,
            tune_mm_llm=args.tune_mm_llm,
            lora_rank=args.lora_rank,
        )
        state = init_grpo_state(params, sched)
    elif is_dpo:
        from visionselector_tpu.train.dpo import (
            DPOScheduleConfig,
            dpo_train_step,
            dpo_train_step_accum,
            init_dpo_state,
        )

        maybe_add_lora()
        sched = DPOScheduleConfig(
            total_steps=args.total_steps, lr=args.lr,
            weight_decay=args.weight_decay,
            warmup_ratio=args.warmup_ratio,
            max_grad_norm=args.max_grad_norm,
            remat=args.gradient_checkpointing,
            beta=args.beta, loss_type=args.dpo_loss_type,
            rpo_alpha=args.rpo_alpha,
            label_smoothing=args.label_smoothing,
            tune_mm_vision=args.tune_mm_vision,
            tune_mm_mlp=args.tune_mm_mlp,
            tune_mm_llm=args.tune_mm_llm,
            lora_rank=args.lora_rank,
        )
        state = init_dpo_state(params, sched)
    elif is_sft:
        # Qwen: train_qwen.py parity; OV: llava-ov-15/src/train/train_sft.py
        # parity (the generic full-model finetune) via the family dispatch
        # in train/sft.py:forward_logits.
        from visionselector_tpu.train.sft import (
            SFTScheduleConfig,
            init_sft_state,
            sft_train_step,
        )

        if args.lora_rank > 0:
            from visionselector_tpu.train.lora import add_lora_params

            params = dict(params)
            params["lm"] = add_lora_params(
                params["lm"], jax.random.PRNGKey(args.seed + 1),
                rank=args.lora_rank, alpha=args.lora_alpha,
                dtype=cfg.jax_dtype,
            )
        sched = SFTScheduleConfig(
            total_steps=args.total_steps, lr=args.lr,
            weight_decay=args.weight_decay,
            warmup_ratio=args.warmup_ratio,
            max_grad_norm=args.max_grad_norm,
            remat=args.gradient_checkpointing,
            tune_mm_vision=args.tune_mm_vision,
            tune_mm_mlp=args.tune_mm_mlp,
            tune_mm_llm=args.tune_mm_llm,
            lora_rank=args.lora_rank,
        )
        state = init_sft_state(params, sched)
    elif is_dynamic:
        assert not is_ov, "dynamic training is a Qwen-family method"
        from visionselector_tpu.selector.baselines.dynamic import (
            init_predictor_params,
        )
        from visionselector_tpu.train.dynamic_train import (
            DynamicScheduleConfig,
            dynamic_train_step,
            init_dynamic_train_state,
        )

        sched = DynamicScheduleConfig(
            total_steps=args.total_steps, lr=args.lr,
            weight_decay=args.weight_decay,
            warmup_ratio=args.warmup_ratio,
            max_grad_norm=args.max_grad_norm,
            remat=args.gradient_checkpointing,
            tau_start=args.tau_start, tau_end=args.tau_end,
            budget=args.budget, mask_loss_weight=args.mask_loss_weight,
        )
        # predictor sized to the LM hidden (reference VisionPredictor
        # input_dim=3584 for 7B, dynamic_model.py:302); small d_model for
        # the tiny smoke config
        d_model = 64 if args.smoke or not args.model_path else 512
        predictor = init_predictor_params(
            jax.random.PRNGKey(args.seed), cfg.text.hidden_size,
            d_model=d_model, num_heads=8 if d_model >= 512 else 4,
        )
        state = init_dynamic_train_state(predictor, sched, seed=args.seed)
    else:
        sched = ScheduleConfig(
            total_steps=args.total_steps, lr=args.lr,
            weight_decay=args.weight_decay,
            warmup_ratio=args.warmup_ratio,
            max_grad_norm=args.max_grad_norm,
            remat=args.gradient_checkpointing,
            reg_weight_start=args.reg_weight_start,
            reg_weight_end=args.reg_weight_end,
        )
        state = init_train_state(params, sched)
    state, resumed = maybe_resume(args.output_dir, state)
    if resumed:
        print(f"[train] resumed at step {int(state.step)}")
    # replicate the (tiny) train state over the mesh
    from jax.sharding import NamedSharding, PartitionSpec

    state = jax.device_put(state, NamedSharding(mesh, PartitionSpec()))

    l_pad = args.vision_bucket // cfg.vision.spatial_merge_unit
    k_max = max(1, int(l_pad * args.budget))
    accum = max(1, args.grad_accum_steps)
    if accum == 1:
        spec = batch_sharding(mesh)
    else:
        from visionselector_tpu.core.mesh import accum_batch_sharding

        spec = accum_batch_sharding(mesh)
    if is_grpo:
        stream = grpo_prompt_stream()
    elif is_dpo:
        stream = dpo_pair_stream()
    else:
        stream = sample_stream()
    os.makedirs(args.output_dir, exist_ok=True)
    log_path = os.path.join(args.output_dir, "train_log.jsonl")

    t0 = time.time()

    def log_and_save(metrics, **extra):
        # host_step mirrors state.step without forcing a device sync
        # every iteration (reading state.step blocks on the in-flight
        # step and would serialize host batch-build with device compute)
        step = host_step
        if step % args.log_steps == 0 or step == args.total_steps:
            m = {k: float(v) for k, v in metrics.items()}
            m.update(step=step, wall_s=round(time.time() - t0, 1), **extra)
            print(json.dumps(m))
            with open(log_path, "a") as f:
                f.write(json.dumps(m) + "\n")
        if step % args.save_steps == 0 or step == args.total_steps:
            # step passed explicitly: int(state.step) would force a device
            # sync; host_step equals it once the step's metrics are read
            path = save_train_state(state, args.output_dir, step=step,
                                    async_save=args.async_save)
            print(f"[train] saved {path}"
                  + (" (async)" if args.async_save else ""))

    def next_host_batch():
        """One device-ready batch for the standard (selector/sft/dynamic)
        path: pull B samples (x accum micro-steps), stack, device_put."""
        if accum == 1:
            samples = [next(stream) for _ in range(args.batch_size)]
            b = jax.tree.map(jnp.asarray, stack_samples(samples))
        else:
            micro = [
                stack_samples(
                    [next(stream) for _ in range(args.batch_size)])
                for _ in range(accum)
            ]
            b = jax.tree.map(lambda *xs: jnp.stack(xs), *micro)
        return jax.tree.map(lambda x: jax.device_put(x, spec(x)), b)

    def next_dpo_batch():
        def one_pair_batch():
            pairs = [next(stream) for _ in range(args.batch_size)]
            return (stack_samples([c for c, _ in pairs]),
                    stack_samples([r for _, r in pairs]))

        if accum == 1:
            chosen, rejected = one_pair_batch()
            chosen = jax.tree.map(jnp.asarray, chosen)
            rejected = jax.tree.map(jnp.asarray, rejected)
        else:
            micro = [one_pair_batch() for _ in range(accum)]
            chosen = jax.tree.map(lambda *xs: jnp.stack(xs),
                                  *[c for c, _ in micro])
            rejected = jax.tree.map(lambda *xs: jnp.stack(xs),
                                    *[r for _, r in micro])
        chosen = jax.tree.map(lambda x: jax.device_put(x, spec(x)),
                              chosen)
        rejected = jax.tree.map(lambda x: jax.device_put(x, spec(x)),
                                rejected)
        return chosen, rejected

    # GRPO rollouts depend on the CURRENT policy, so its batches cannot
    # be built ahead; the standard and DPO paths can.
    prefetcher = None
    if is_grpo:
        batch_iter = None
    else:
        make = next_dpo_batch if is_dpo else next_host_batch
        if args.prefetch > 0:
            from visionselector_tpu.train.prefetch import BatchPrefetcher

            prefetcher = BatchPrefetcher(make, size=args.prefetch)
            batch_iter = prefetcher
        else:
            def _sync_iter(fn=make):
                while True:
                    yield fn()

            batch_iter = _sync_iter()

    host_step = int(state.step)
    try:
        while host_step < args.total_steps:
            if is_grpo:
                from visionselector_tpu.models.qwen25vl.model import QwenVLEngine
                from visionselector_tpu.preprocess.image import preprocess_image
                from visionselector_tpu.preprocess.rope import (
                    expand_vision_tokens_at_slots,
                )
                from visionselector_tpu.train.grpo import (
                    REWARD_FUNCS,
                    build_grpo_sample,
                    group_advantages,
                    rollout_group,
                )

                # rollouts under the CURRENT policy (grpo_trainer.py:843-900)
                if is_ov:
                    from visionselector_tpu.models.llava_ov15.model import (
                        OVEngine,
                    )

                    eng = OVEngine(cfg, state.params, use_selector=False)
                else:
                    eng = QwenVLEngine(cfg, state.params, use_selector=False)
                # ONE pixel-bound policy for rollout preprocessing AND the
                # scored training sample — the completions must be conditioned
                # on exactly the image grid the step scores (OV's builder
                # defaults differ from preprocess_image's, so never rely on
                # defaults here).
                mm = (dict(min_pixels=1, max_pixels=10**9)
                      if (args.smoke or not args.model_path)
                      else dict(min_pixels=56 * 56, max_pixels=28 * 28 * 1280))
                reward_fns = [REWARD_FUNCS[n]
                              for n in args.rewards.split(",") if n]
                def one_micro(seed_base):
                    samples, rewards = [], []
                    for bi in range(args.batch_size):
                        images, raw_ids, slots, solution, tok = next(stream)
                        px_list, g_list = [], []
                        for image in images:
                            px_i, g_i = preprocess_image(
                                image, patch_size=cfg.vision.patch_size,
                                temporal_patch_size=cfg.vision.temporal_patch_size,
                                merge_size=cfg.vision.spatial_merge_size, **mm)
                            px_list.append(px_i)
                            g_list.append(g_i)
                        pixels = np.concatenate(px_list, axis=0)
                        grid = np.concatenate(g_list, axis=0)
                        ids = expand_vision_tokens_at_slots(
                            raw_ids, slots, grid,
                            spatial_merge_size=cfg.vision.spatial_merge_size,
                            image_token_id=cfg.image_token_id,
                            vision_start_token_id=cfg.vision_start_token_id,
                            vision_end_token_id=cfg.vision_end_token_id)
                        comps = rollout_group(
                            eng, ids, pixels, grid, sched, seed=seed_base + bi)
                        if tok is not None:
                            texts = [tok.decode(c, skip_special_tokens=True)
                                     for c in comps]
                            sols = [solution] * len(texts)
                            per_fn = [fn(texts, solution=sols)
                                      for fn in reward_fns]
                            rewards.extend(float(sum(col))
                                           for col in zip(*per_fn))
                        else:
                            # smoke reward: parity of the completion's token
                            # sum — varies across group members
                            rewards.extend(float(int(np.sum(c)) % 2 == 0)
                                           for c in comps)
                        samples.extend(
                            build_grpo_sample(
                                cfg, images, raw_ids, slots, c,
                                budget=args.budget, s_bucket=args.vision_bucket,
                                t_bucket=args.text_bucket,
                                family=args.family, **mm)
                            for c in comps)
                    adv = group_advantages(
                        np.asarray(rewards), sched.num_generations,
                        sched.scale_rewards)
                    return stack_samples(samples), adv, rewards

                base = host_step * args.batch_size * accum
                if accum == 1:
                    batch, adv, rewards = one_micro(base)
                    batch = jax.tree.map(jnp.asarray, batch)
                    adv = jnp.asarray(adv)
                    step_fn = grpo_train_step
                else:
                    micros = [one_micro(base + a * args.batch_size)
                              for a in range(accum)]
                    batch = jax.tree.map(lambda *xs: jnp.stack(xs),
                                         *[b for b, _, _ in micros])
                    adv = jnp.stack([jnp.asarray(a) for _, a, _ in micros])
                    rewards = [r for _, _, rs in micros for r in rs]
                    step_fn = grpo_train_step_accum
                batch = jax.tree.map(lambda x: jax.device_put(x, spec(x)),
                                     batch)
                adv_dev = jax.device_put(adv, spec(adv))
                state, metrics = step_fn(state, frozen, batch, adv_dev,
                                         cfg, sched)
                host_step += 1
                log_and_save(metrics, mean_reward=float(np.mean(rewards)))
                continue
            if is_dpo:
                chosen, rejected = next(batch_iter)
                # frozen == the pretrained starting weights even after resume:
                # exactly the reference-policy contract (dpo_trainer.py).
                step_fn = dpo_train_step_accum if accum > 1 else dpo_train_step
                state, metrics = step_fn(state, frozen, chosen, rejected,
                                         cfg, sched)
                host_step += 1
                log_and_save(metrics)
                continue
            batch = next(batch_iter)
            if is_sft:
                if accum > 1:
                    from visionselector_tpu.train.sft import sft_train_step_accum

                    state, metrics = sft_train_step_accum(state, batch, cfg,
                                                          sched)
                else:
                    state, metrics = sft_train_step(state, batch, cfg, sched)
            elif is_dynamic:
                if accum > 1:
                    from visionselector_tpu.train.dynamic_train import (
                        dynamic_train_step_accum,
                    )

                    state, metrics = dynamic_train_step_accum(
                        state, frozen, batch, cfg, sched)
                else:
                    state, metrics = dynamic_train_step(state, frozen, batch,
                                                        cfg, sched)
            else:
                if accum > 1:
                    from visionselector_tpu.train.train_step import (
                        train_step_accum,
                    )

                    state, metrics = train_step_accum(state, frozen, batch,
                                                      cfg, k_max, sched)
                else:
                    state, metrics = train_step(state, frozen, batch, cfg,
                                                k_max, sched)
            host_step += 1
            log_and_save(metrics)

    finally:
        # close the prefetch thread even when a step raises, or the
        # daemon keeps pulling samples and device_put-ting batches
        # (holding HBM) while the exception unwinds
        if prefetcher is not None:
            prefetcher.close()
        if args.async_save:
            # join any in-flight background save before exports/exit (and
            # before an exception unwinds past a half-written checkpoint)
            from visionselector_tpu.core.checkpoint import finalize_saves

            finalize_saves()

    if is_dpo or is_grpo:
        if args.lora_rank > 0:
            # merge adapters into dense weights (merge_lora_weights.py flow)
            import orbax.checkpoint as ocp

            from visionselector_tpu.train.lora import merge_lora_params

            merged = dict(state.params)
            merged["lm"] = merge_lora_params(state.params["lm"])
            path = os.path.join(os.path.abspath(args.output_dir),
                                "lora_merged")
            with ocp.StandardCheckpointer() as ckptr:
                ckptr.save(path, merged, force=True)
            print(f"[train] LoRA merged into {path}")
        # full-model weights live in the orbax checkpoint-<step> dirs
        print(f"[train] {args.method.upper()} checkpoints in "
              f"{args.output_dir}")
    elif is_sft:
        if args.lora_rank > 0:
            # merge adapters into dense weights (merge_lora_weights.py flow)
            import orbax.checkpoint as ocp

            from visionselector_tpu.train.lora import merge_lora_params

            merged = dict(state.params)
            merged["lm"] = merge_lora_params(state.params["lm"])
            path = os.path.join(
                os.path.abspath(args.output_dir), "lora_merged"
            )
            with ocp.StandardCheckpointer() as ckptr:
                ckptr.save(path, merged, force=True)
            print(f"[train] LoRA merged into {path}")
        # full-model weights live in the orbax checkpoint-<step> dirs
        print(f"[train] SFT checkpoints in {args.output_dir}")
    elif is_dynamic:
        from visionselector_tpu.train.dynamic_train import (
            export_predictor_to_safetensors,
        )

        export_predictor_to_safetensors(
            jax.device_get(state.predictor_params),
            os.path.join(args.output_dir, "image_score_predictor.safetensors"),
        )
        print(f"[train] exported predictor to {args.output_dir}")
    else:
        export_scorer_to_safetensors(
            jax.device_get(state.scorer_params),
            os.path.join(args.output_dir, "importance_scorer.safetensors"),
        )
        print(f"[train] exported scorer to {args.output_dir}")
    _copy_loader_configs(getattr(args, "model_path", None), args.output_dir)
    return 0


def _copy_loader_configs(model_path, output_dir) -> None:
    """Copy the processor/tokenizer config files from the base checkpoint
    into the output dir so the trained dir is directly loadable for eval —
    the reference does the same post-train
    (``qwen-vl-finetune/qwenvl/train/train_qwen_selector.py:278-301`` copies
    preprocessor_config.json + chat_template.json)."""
    import shutil

    if not model_path or not os.path.isdir(model_path):
        return
    for name in ("preprocessor_config.json", "chat_template.json",
                 "tokenizer_config.json", "tokenizer.json", "vocab.json",
                 "merges.txt", "special_tokens_map.json", "config.json",
                 "generation_config.json"):
        src = os.path.join(model_path, name)
        dst = os.path.join(output_dir, name)
        if os.path.exists(src) and not os.path.exists(dst):
            shutil.copy2(src, dst)


if __name__ == "__main__":
    raise SystemExit(main())
