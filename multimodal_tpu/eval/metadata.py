"""Zero-shot metadata: the 80 OpenAI ImageNet prompt templates + class-name tables.

Counterpart of align_clip/zero_shot_metadata.py:8-291. Stored as a JSON data asset
(assets/zero_shot_metadata.json) covering ImageNet/A/R/O, CIFAR-10/100, Flowers-102,
StanfordCars, Food-101; templates are '{}' patterns applied with .format()."""

from __future__ import annotations

import functools
import json
import os

_ASSET = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets", "zero_shot_metadata.json")


@functools.lru_cache()
def _load() -> dict:
    with open(_ASSET) as f:
        return json.load(f)


def templates(name: str = "openai") -> list:
    data = _load()
    key = {
        "openai": "OPENAI_IMAGENET_TEMPLATES",
        "simple": "SIMPLE_IMAGENET_TEMPLATES",
        "identity": "IDENTITY_TEMPLATE",
    }[name]
    return data[key]


def classnames(dataset: str) -> list:
    data = _load()
    key = {
        "imagenet": "IMAGENET_CLASSNAMES",
        "imagenet-v2": "IMAGENET_CLASSNAMES",
        "imagenet-sketch": "IMAGENET_CLASSNAMES",
        "imagenet-a": "IMAGENET_A_CLASSNAMES",
        "imagenet-r": "IMAGENET_R_CLASSNAMES",
        "imagenet-o": "IMAGENET_O_CLASSNAMES",
        "cifar10": "CIFAR10_CLASSNAMES",
        "cifar100": "CIFAR100_CLASSNAMES",
        "flowers102": "FLOWERS102_CLASSNAMES",
        "stanford-cars": "STANFORD_CARS_CLASSNAMES",
        "food101": "FOOD_CLASSNAMES",
    }[dataset]
    return data[key]


def apply_templates(classname: str, template_list: list) -> list:
    return [t.format(classname) for t in template_list]
