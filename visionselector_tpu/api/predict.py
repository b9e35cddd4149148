"""Single-sample inference CLI (reference parity:
``qwen-evaluation/predict.py`` — method choice, budget, one image, generate).

Usage:
    python -m visionselector_tpu.api.predict \
        --model-path /path/to/hf_checkpoint --image photo.jpg \
        --prompt "Describe this image." --method selector --budget 0.2

Without --model-path it runs the tiny random-weight config (smoke mode). The
tokenizer is loaded from the checkpoint dir when present; otherwise --prompt
must be omitted and raw --prompt-ids used.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

METHODS = ("orig", "selector", "visionzip", "prumerge_plus", "divprune",
           "holov", "fastv", "dart", "dynamic", "random",
           # reference CLI spellings (qwen-evaluation/predict.py:90-119)
           "visionzip_official", "prumerge+")
# reference name -> registry name
METHOD_ALIASES = {"visionzip_official": "visionzip", "prumerge+": "prumerge_plus"}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-path", default=None,
                   help="HF checkpoint dir (config.json + *.safetensors)")
    p.add_argument("--image", default=None, help="image file path")
    p.add_argument("--prompt", default="Describe this image.")
    p.add_argument("--prompt-ids", default=None,
                   help="comma-separated token ids (skips tokenizer)")
    p.add_argument("--method", default="selector", choices=METHODS)
    p.add_argument("--family", default="qwen25vl", choices=("qwen25vl", "llava_ov15"),
                   help="model family (llava_ov15 = RICE ViT + Qwen3 text)")
    p.add_argument("--budget", type=float, default=0.2)
    p.add_argument("--max-new-tokens", type=int, default=64)
    p.add_argument("--temperature", type=float, default=0.0,
                   help="0 = greedy; >0 enables top-p sampling")
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--top-k", type=int, default=0,
                   help="sample only from the k highest-probability tokens "
                        "(0 = off; HF TopKLogitsWarper semantics)")
    p.add_argument("--repetition-penalty", type=float, default=1.0,
                   help="HF RepetitionPenaltyLogitsProcessor: seen tokens' "
                        "scores are divided (positive) / multiplied "
                        "(negative) by this at every step (the reference "
                        "chat app's knob, app.py:111)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--quantize", default=None,
                   help="weight-only LM quantization: int8 (per-channel), "
                        "int4, or int4:g<N> (grouped, e.g. int4:g128); "
                        "int4 packs 2 weights/byte of HBM")
    p.add_argument("--speculative", type=int, default=0,
                   help="prompt-lookup speculative decoding: propose N "
                        "tokens per decode dispatch (greedy-identical at "
                        "temperature 0; exact-distribution speculative "
                        "sampling at temperature > 0)")
    p.add_argument("--eval-time", action="store_true",
                   help="print timing/memory probes (EVAL_TIME parity)")
    p.add_argument("--visualize-dir", default=None,
                   help="write <dir>/selection_{heatmap,mask}.png (parity "
                        "with the _visual eval adapter's PNG rendering, "
                        "qwen2_5_vl_with_token_compression_visual.py:418-663)")
    return p


def load_tokenizer(model_path):
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(model_path, local_files_only=True)
    except Exception as e:  # noqa: BLE001
        print(f"[predict] tokenizer unavailable ({e}); use --prompt-ids",
              file=sys.stderr)
        return None


def chat_prompt_ids(tokenizer, prompt: str):
    """Qwen2.5-VL chat template around one image: returns (before, after)."""
    before = tokenizer.encode(
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
        "<|im_start|>user\n"
    )
    after = tokenizer.encode(f"{prompt}<|im_end|>\n<|im_start|>assistant\n")
    return before, after


def main(argv=None) -> int:
    import os

    args = build_parser().parse_args(argv)
    args.method = METHOD_ALIASES.get(args.method, args.method)
    if os.environ.get("EVAL_TIME", "").lower() == "true":
        args.eval_time = True  # reference env-var contract (SURVEY.md §5.1)

    import jax

    from visionselector_tpu.preprocess.image import preprocess_image
    from visionselector_tpu.preprocess.rope import expand_vision_tokens

    tokenizer = None
    if args.family == "llava_ov15":
        from visionselector_tpu.models.llava_ov15.model import (
            OVEngine as EngineCls,
            init_ov_params as init_fn,
        )

        if args.model_path:
            from visionselector_tpu.models.llava_ov15.weights import (
                load_ov_checkpoint,
                ov_config_from_hf,
            )

            cfg = ov_config_from_hf(args.model_path)
            params = load_ov_checkpoint(args.model_path, cfg)
            tokenizer = load_tokenizer(args.model_path)
        else:
            from visionselector_tpu.core.config import llava_ov_tiny

            cfg = llava_ov_tiny()
            params = init_fn(jax.random.PRNGKey(0), cfg)
    elif args.model_path:
        from visionselector_tpu.models.qwen25vl.model import QwenVLEngine
        from visionselector_tpu.models.qwen25vl.weights import (
            config_from_hf,
            load_hf_checkpoint,
        )

        cfg = config_from_hf(args.model_path)
        params = load_hf_checkpoint(args.model_path, cfg)
        tokenizer = load_tokenizer(args.model_path)
    else:
        from visionselector_tpu.core.config import qwen25vl_tiny
        from visionselector_tpu.models.qwen25vl.model import (
            QwenVLEngine,
            init_params,
        )

        cfg = qwen25vl_tiny()
        params = init_params(jax.random.PRNGKey(0), cfg)

    if args.quantize:
        from visionselector_tpu.models.qwen25vl.lm import (
            apply_weight_quantization,
        )

        params = apply_weight_quantization(params, args.quantize)

    tp = cfg.vision.temporal_patch_size
    if args.image:
        from PIL import Image

        image = Image.open(args.image)
        pixels, grid = preprocess_image(image, temporal_patch_size=tp)
    else:
        rng = np.random.RandomState(0)
        img = (rng.rand(112, 112, 3) * 255).astype(np.uint8)
        pixels, grid = preprocess_image(
            img, min_pixels=1, max_pixels=10**9, temporal_patch_size=tp
        )

    if args.prompt_ids:
        ids_after = [int(x) for x in args.prompt_ids.split(",")]
        before, after = [], ids_after
    elif tokenizer is not None:
        before, after = chat_prompt_ids(tokenizer, args.prompt)
    else:
        before, after = [100, 200], [300, 400]  # smoke-mode placeholder

    input_ids = expand_vision_tokens(
        before, after, grid,
        spatial_merge_size=cfg.vision.spatial_merge_size,
        image_token_id=cfg.image_token_id,
        vision_start_token_id=cfg.vision_start_token_id,
        vision_end_token_id=cfg.vision_end_token_id,
    )

    strategy = None
    if args.method not in ("orig", "selector"):
        from visionselector_tpu.selector.baselines import get_baseline

        strategy = get_baseline(args.method)

    if args.family == "llava_ov15":
        engine = EngineCls(
            cfg, params, use_selector=(args.method == "selector"),
            budget=args.budget, strategy=strategy,
        )
    else:
        engine = QwenVLEngine(
            cfg, params,
            use_selector=(args.method == "selector"),
            budget=args.budget,
            strategy=strategy,
        )

    if args.speculative > 0:
        from visionselector_tpu.models.qwen25vl.model import (
            generate_speculative,
        )

        res = generate_speculative(
            engine, input_ids, pixels, grid,
            max_new_tokens=args.max_new_tokens,
            propose_len=args.speculative,
            temperature=args.temperature, top_p=args.top_p, seed=args.seed,
            top_k=args.top_k, repetition_penalty=args.repetition_penalty,
        )
    else:
        res = engine.generate(
            input_ids, pixels, grid, max_new_tokens=args.max_new_tokens,
            temperature=args.temperature, top_p=args.top_p, seed=args.seed,
            top_k=args.top_k, repetition_penalty=args.repetition_penalty,
        )

    text = (
        tokenizer.decode(res.tokens, skip_special_tokens=True)
        if tokenizer is not None
        else None
    )
    out = {
        "method": args.method,
        "budget": args.budget,
        "tokens": res.tokens,
        "text": text,
        "num_vision_tokens": res.num_vision_tokens,
        "kept_vision_tokens": (
            len(res.selected_indices) if res.selected_indices is not None
            else res.num_vision_tokens
        ),
        "prefill_len": res.prefill_len,
    }
    if args.eval_time:
        # EVAL_TIME printed-metric parity (selector_model.py:353-359;
        # extract_time.py scrapes these lines)
        print(f"Input visual token number is: {out['kept_vision_tokens']}")
        print(f"Generation prefill time is: {res.prefill_seconds * 1e3}")
        print(f"Generation total time is: {res.total_seconds * 1e3}")
    if args.visualize_dir and res.selected_indices is not None:
        from visionselector_tpu.eval.visualize import visualize_selection

        os.makedirs(args.visualize_dir, exist_ok=True)
        if args.image:
            from PIL import Image as _Image

            img_arr = np.asarray(_Image.open(args.image).convert("RGB"))
        else:
            img_arr = img  # smoke-mode synthetic image
        written = visualize_selection(
            img_arr, res.scores, res.selected_indices, grid,
            os.path.join(args.visualize_dir, "selection"),
            spatial_merge_size=cfg.vision.spatial_merge_size,
        )
        out["visualizations"] = written
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
