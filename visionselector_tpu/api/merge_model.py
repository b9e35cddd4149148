"""Assemble an LLaVA-OneVision-1.5 checkpoint from separate vision-tower and
language-model checkpoints (reference parity: ``llava-ov-15/merge_model.py``
— builds OV from MLCD vision + Qwen LLM parts, verifying each transplanted
module with activation cosine-similarity checks, :24-36, :332).

Usage:
    python -m visionselector_tpu.api.merge_model \\
        --vision-path /ckpt_with_visual --lm-path /ckpt_with_lm \\
        --output-dir merged/ [--smoke]

Both inputs are safetensors checkpoint dirs in the OV layout (the vision
part is read from one, the text part from the other). The merged tree is
saved as an orbax checkpoint plus a ``merge_report.json`` with the cosine
similarities of probe activations for each transplanted module (1.0 =
bit-faithful transplant).
"""

from __future__ import annotations

import argparse
import json
import os


def cosine(a, b) -> float:
    import numpy as np

    a = np.asarray(a, np.float32).ravel()
    b = np.asarray(b, np.float32).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def assemble(vision_params: dict, lm_params: dict, scorer_params=None) -> dict:
    params = {"visual": vision_params, "lm": lm_params}
    if scorer_params is not None:
        params["scorer"] = scorer_params
    return params


def sanity_check(params: dict, cfg, source_visual: dict,
                 source_lm: dict) -> dict:
    """Probe each transplanted module with a fixed input and compare
    activations against the source checkpoint (merge_model.py:24-36)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from visionselector_tpu.models.llava_ov15 import rice as rice_mod
    from visionselector_tpu.models.qwen25vl import lm as lm_mod
    from visionselector_tpu.preprocess.image import preprocess_image

    report = {}
    rng = np.random.RandomState(0)
    img = (rng.rand(56, 56, 3) * 255).astype(np.uint8)
    pixels, grid = preprocess_image(
        img, min_pixels=1, max_pixels=10**9,
        patch_size=cfg.vision.patch_size,
        temporal_patch_size=cfg.vision.temporal_patch_size,
        merge_size=cfg.vision.spatial_merge_size,
    )
    rb = rice_mod.build_rice_batch(
        pixels, grid, spatial_merge_size=cfg.vision.spatial_merge_size,
        pad_to=pixels.shape[0], cls_slots=4,
    )

    def vis_fwd(p):
        return rice_mod.rice_forward(
            p, jnp.asarray(rb.pixel_values), jnp.asarray(rb.rot_pos_ids),
            jnp.asarray(rb.insert_map), jnp.asarray(rb.strip_map),
            jnp.asarray(rb.seg_ids), cfg.vision,
        )

    report["visual"] = cosine(vis_fwd(params["visual"]),
                              vis_fwd(source_visual))

    t = 8
    ids = jnp.asarray(rng.randint(0, 1000, t))

    def lm_fwd(p):
        embeds = lm_mod.embed_tokens(p, ids)[None]
        pos = jnp.broadcast_to(jnp.arange(t), (3, 1, t))
        seg = jnp.ones((1, t), jnp.int32)
        h, _ = lm_mod.lm_prefill(p, embeds, pos, seg, cfg.text)
        return h

    report["lm"] = cosine(lm_fwd(params["lm"]), lm_fwd(source_lm))
    return report


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--vision-path", default=None)
    p.add_argument("--lm-path", default=None)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--smoke", action="store_true",
                   help="random tiny parts (CI wiring check)")
    args = p.parse_args(argv)

    import jax
    import orbax.checkpoint as ocp

    from visionselector_tpu.core.config import llava_ov_tiny

    if args.smoke or not (args.vision_path and args.lm_path):
        from visionselector_tpu.models.llava_ov15.model import init_ov_params

        cfg = llava_ov_tiny()
        src_a = init_ov_params(jax.random.PRNGKey(1), cfg)
        src_b = init_ov_params(jax.random.PRNGKey(2), cfg)
        vision, lm = src_a["visual"], src_b["lm"]
        scorer = src_a.get("scorer")
        src_visual, src_lm = src_a["visual"], src_b["lm"]
    else:
        from visionselector_tpu.models.llava_ov15.weights import (
            load_ov_checkpoint,
            ov_config_from_hf,
        )

        cfg = ov_config_from_hf(args.vision_path)
        a = load_ov_checkpoint(args.vision_path, cfg)
        b = load_ov_checkpoint(args.lm_path, cfg)
        vision, lm, scorer = a["visual"], b["lm"], a.get("scorer")
        src_visual, src_lm = a["visual"], b["lm"]

    params = assemble(vision, lm, scorer)

    os.makedirs(args.output_dir, exist_ok=True)
    path = os.path.join(os.path.abspath(args.output_dir), "merged")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)
        # verify the SAVED artifact (reload round trip), not the in-memory
        # tree, against the source checkpoints' activations
        restored = ckptr.restore(path, params)
    report = sanity_check(restored, cfg, src_visual, src_lm)
    ok = all(v > 0.999 for v in report.values())
    with open(os.path.join(args.output_dir, "merge_report.json"), "w") as f:
        json.dump({"cosine": report, "ok": ok}, f, indent=2)
    print(json.dumps({"cosine": report, "ok": ok, "saved": path}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
