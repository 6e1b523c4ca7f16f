"""Dilated box-overlap: numpy kernel == naive pyref twin, and the
dilation actually bites (raw synthetic boxes rarely touch)."""

import json
import random

from ocr_image_to_text_spark import pyref
from ocr_image_to_text_spark.operators.overlap import overlap_kernel
from ocr_image_to_text_spark.transcripts import (
    BOX_FIXTURES,
    _boxes_fixture,
    _boxes_payload,
)


def test_fixtures_match_twin():
    for case in BOX_FIXTURES:
        payload = _boxes_fixture(case)
        assert overlap_kernel(payload) == pyref.box_overlap_stats(payload)


def test_random_payloads_match_twin_and_nonvacuous():
    rng = random.Random(31337)
    pairs = 0
    for _ in range(300):
        payload = _boxes_payload(rng)
        got = overlap_kernel(payload)
        assert got == pyref.box_overlap_stats(payload)
        pairs += got[1]
    assert pairs > 0  # the 6px dilation must produce overlap evidence


def test_scatter_match_twin():
    rng = random.Random(7)
    for _ in range(200):
        n = rng.randint(1, 30)
        boxes = []
        for i in range(n):
            x, y = rng.uniform(0, 500), rng.uniform(0, 500)
            w, h = rng.uniform(4, 150), rng.uniform(4, 40)
            boxes.append(
                [[[x, y], [x + w, y], [x + w, y + h], [x, y + h]],
                 f"t{i}", 0.9])
        payload = json.dumps({"h": 600, "w": 800, "boxes": boxes})
        assert overlap_kernel(payload) == pyref.box_overlap_stats(payload)
