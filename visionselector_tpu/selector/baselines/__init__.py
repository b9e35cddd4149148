"""Training-free token-compression baselines (reference parity suite).

Each baseline is a *selection strategy*: given the merged vision tokens (and
last-ViT-block attention statistics), produce the kept token indices and
(optionally) replacement embeddings. All strategies share the framework's
single "score -> select -> compact -> prefill" pipeline — unlike the
reference, where each method is a separate monkeypatched model forward
(SURVEY.md §2.3).

Selection math runs host-side in numpy: it is O(N) .. O(N^2) on <=~1.4k tokens
and data-dependent (IQR counts, greedy loops); the heavy ViT/LLM compute stays
in jitted device programs.
"""

from __future__ import annotations

from typing import Callable, Dict

from visionselector_tpu.selector.baselines.dynamic import DynamicSelect
from visionselector_tpu.selector.baselines.llm_side import DART, FastV
from visionselector_tpu.selector.baselines.methods import (
    DivPrune,
    HoloV,
    PruMergePlus,
    RandomSelect,
    VisionZip,
)

_REGISTRY: Dict[str, Callable] = {
    "visionzip": VisionZip,
    "prumerge_plus": PruMergePlus,
    "divprune": DivPrune,
    "holov": HoloV,
    "random": RandomSelect,
    "fastv": FastV,
    "dart": DART,
    "dynamic": DynamicSelect,
}


def get_baseline(name: str, **kwargs):
    if name not in _REGISTRY:
        raise KeyError(f"unknown baseline {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def available_baselines():
    return sorted(_REGISTRY)
