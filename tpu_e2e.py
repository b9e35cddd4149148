import os
os.environ.setdefault("VST_ATTN_IMPL", "auto")
import time
import numpy as np, jax
from visionselector_tpu.core.config import qwen25vl_3b
from visionselector_tpu.models.qwen25vl.model import QwenVLEngine, init_params
from visionselector_tpu.preprocess.image import preprocess_image
from visionselector_tpu.preprocess.rope import expand_vision_tokens

cfg = qwen25vl_3b()
params = jax.jit(lambda k: init_params(k, cfg))(jax.random.PRNGKey(0))
jax.block_until_ready(params)
img = (np.random.RandomState(0).rand(1036, 1456, 3) * 255).astype(np.uint8)
pixels, grid = preprocess_image(img)
ids = expand_vision_tokens(list(range(100, 120)), list(range(300, 320)), grid)
eng = QwenVLEngine(cfg, params, use_selector=True, budget=0.2)
res = eng.generate(ids, pixels, grid, max_new_tokens=16)
print("TPU e2e OK: tokens:", len(res.tokens), "kept:", len(res.selected_indices),
      "of", res.num_vision_tokens, "prefill_len:", res.prefill_len)
# sampling path on TPU
res2 = eng.generate(ids, pixels, grid, max_new_tokens=8, temperature=0.8, top_p=0.9, seed=3)
print("TPU sampling OK: tokens:", len(res2.tokens))
