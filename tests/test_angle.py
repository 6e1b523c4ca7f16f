"""A14 angle-mode: numpy engine kernel equals the pure-Python oracle, and
both honor the reference's rotation-rule boundaries
(src/ocr_module.py:148-167) and skew definition
(src/ocr/preprocessor.py:145-171)."""

import json
import math
import random

import pytest

from ocr_image_to_text_spark import pyref
from ocr_image_to_text_spark.operators.angle import angle_kernel
from ocr_image_to_text_spark.transcripts import (
    BOX_FIXTURES,
    _boxes_fixture,
    _boxes_payload,
)


def _rotated_payload(angle_deg: float, n_lines: int = 4, n_tok: int = 5) -> str:
    """Lines of tokens laid out along `angle_deg` (text direction)."""
    rad = math.radians(angle_deg)
    dx, dy = math.cos(rad), math.sin(rad)
    boxes = []
    for li in range(n_lines):
        # offset lines along the perpendicular so clustering separates them
        ox = 200.0 - dy * 60.0 * li
        oy = 100.0 + dx * 60.0 * li
        for ti in range(n_tok):
            x = ox + dx * 45.0 * ti
            y = oy + dy * 45.0 * ti
            boxes.append([[[x, y], [x + 30, y], [x + 30, y + 10], [x, y + 10]],
                          f"t{li}_{ti}", 0.9])
    return json.dumps({"h": 600, "w": 800, "boxes": boxes})


def test_random_payloads_match_oracle():
    rng = random.Random(321)
    n_some = 0
    for _ in range(400):
        payload = _boxes_payload(rng)
        want = pyref.angle_mode(payload)
        got = angle_kernel(payload)
        assert got == want
        if want is not None:
            n_some += 1
    assert n_some > 300  # the corpus is not vacuous for this operator


@pytest.mark.parametrize("case", BOX_FIXTURES)
def test_fixture_payloads_match_oracle(case):
    payload = _boxes_fixture(case)
    assert angle_kernel(payload) == pyref.angle_mode(payload)


def test_empty_and_single_token_return_none():
    assert angle_kernel(json.dumps({"h": 600, "w": 800, "boxes": []})) is None
    only = json.dumps({"h": 600, "w": 800,
                       "boxes": [[[[10, 10], [60, 10], [60, 24], [10, 24]], "only", 0.8]]})
    assert angle_kernel(only) is None
    assert pyref.angle_mode(only) is None


@pytest.mark.parametrize("angle_deg,theta,rotation", [
    (0.0, 90, 180),    # horizontal text → Hough normal 90 → ocr_module's
                       # (45,135) branch rotates 180 — faithfully mirrored
    (-2.0, 88, 180),   # slight CCW skew → skew_deg = -2
    (3.0, 93, 180),    # slight CW skew → skew_deg = +3
])
def test_shallow_skew_branches(angle_deg, theta, rotation):
    payload = _rotated_payload(angle_deg)
    got = angle_kernel(payload)
    assert got == pyref.angle_mode(payload)
    theta_mode, skew_deg, rot, n_lines = got
    assert theta_mode == theta
    assert skew_deg == theta - 90
    assert rot == rotation
    assert n_lines == 4


def _pair_payload(dxys, y_gap: float = 100.0) -> str:
    """One two-token line per (dx, dy); |dy| must stay inside the cluster
    tolerance (10 at h=600) or the v2 y-clustering splits the pair — steep
    directions are only expressible as short in-tolerance segments, exactly
    like the post-clustering analog defines them."""
    boxes = []
    y = 50.0
    for i, (dx, dy) in enumerate(dxys):
        for j, (x, yy) in enumerate(((100.0, y), (100.0 + dx, y + dy))):
            boxes.append([[[x, yy], [x + 8, yy], [x + 8, yy + 10], [x, yy + 10]],
                          f"t{i}_{j}", 0.9])
        y += y_gap
    return json.dumps({"h": 600, "w": 800, "boxes": boxes})


@pytest.mark.parametrize("dx,dy,theta,rotation", [
    (3.0, -9.0, 18, 90),    # dir -71.6° → theta 18 < 45 → rotate 90
    (3.0, 9.0, 161, 270),   # dir +71.6° → theta 161 > 135 → rotate 270
    (9.0, -9.0, 45, 0),     # dir -45° → theta exactly 45 → uncovered → 0
    (9.0, 9.0, 135, 0),     # dir +45° → theta exactly 135 → uncovered → 0
])
def test_steep_rotation_branches(dx, dy, theta, rotation):
    payload = _pair_payload([(dx, dy)] * 3)
    got = angle_kernel(payload)
    assert got == pyref.angle_mode(payload)
    assert got[0] == theta
    assert got[2] == rotation
    assert got[3] == 3


def test_histogram_tie_resolves_to_smallest_bin():
    # two lines at theta 18, two at theta 90 → tie → smaller bin wins
    payload = _pair_payload([(3.0, -9.0), (3.0, -9.0), (9.0, 0.0), (9.0, 0.0)])
    got = angle_kernel(payload)
    assert got == pyref.angle_mode(payload)
    assert got[0] == 18
    assert got[3] == 4
