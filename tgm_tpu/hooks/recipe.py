"""Pre-defined hook-manager recipes.

Parity: reference ``RecipeRegistry`` + ``RECIPE_TGB_LINK_PRED``
(/root/reference/tgm/hooks/recipe.py:17-79): a registry of callables building
ready-to-use ``HookManager`` configurations; the TGB link-prediction recipe
registers a random negative sampler (dst-id range of the training graph) for
train and the official TGB pre-generated negatives for val/test.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import numpy as np

from ..constants import RECIPE_TGB_LINK_PRED
from ..core.graph import DGraph
from ..exceptions import UndefinedRecipeError
from ..util.logging import _get_logger
from .manager import HookManager
from .negatives import RandomNegativeEdgeSamplerHook, TGBNegativeEdgeSamplerHook

logger = _get_logger(__name__)


class RecipeRegistry:
    """Registry of named pre-experiment setups (each returns a HookManager)."""

    _recipes: Dict[str, Callable] = {}

    @classmethod
    def register(cls, name: str) -> Callable:
        def decorator(func: Callable) -> Callable:
            cls._recipes[name] = func
            return func

        return decorator

    @classmethod
    def build(cls, name: str, **kwargs: Any) -> Any:
        if name not in cls._recipes:
            raise UndefinedRecipeError(
                f"Undefined or unregistered recipe: {name}. "
                f"Available: {sorted(cls._recipes)}"
            )
        return cls._recipes[name](**kwargs)


@RecipeRegistry.register(RECIPE_TGB_LINK_PRED)
def build_tgb_link_pred(
    dataset_name: str,
    train_dg: DGraph,
    val_candidates: Optional[np.ndarray] = None,
    test_candidates: Optional[np.ndarray] = None,
) -> HookManager:
    """HookManager with keys [train, val, test] for TGB link prediction.

    ``val_candidates``/``test_candidates`` allow injecting pre-generated
    negative sets directly (e.g. synthetic benchmarks without the tgb pkg);
    otherwise they are loaded from the installed TGB dataset files.
    """
    dst = train_dg.edge_dst
    hm = HookManager(keys=["train", "val", "test"])
    hm.register(
        "train", RandomNegativeEdgeSamplerHook(low=int(dst.min()), high=int(dst.max()))
    )
    if val_candidates is not None:
        hm.register("val", TGBNegativeEdgeSamplerHook(candidates=val_candidates))
    else:
        hm.register("val", TGBNegativeEdgeSamplerHook(dataset_name, split_mode="val"))
    if test_candidates is not None:
        hm.register("test", TGBNegativeEdgeSamplerHook(candidates=test_candidates))
    else:
        hm.register("test", TGBNegativeEdgeSamplerHook(dataset_name, split_mode="test"))
    logger.info("Built %s HookManager for %s", RECIPE_TGB_LINK_PRED, dataset_name)
    return hm
