"""Golden tests for db_postprocess vs Paddle's published DBPostProcess.

VERDICT r3 item 10: `detect/postprocess.py` unclips the min-area rectangle
along its own axes instead of running pyclipper (unavailable in this
environment). Paddle's pipeline (ppocr/postprocess/db_postprocess.py,
`boxes_from_bitmap`) is:

    contour -> minAreaRect box -> box_score_fast -> pyclipper round-join
    offset of the BOX by d = area*ratio/perimeter -> minAreaRect of the
    offset polygon -> scale+round to dest

Because Paddle offsets the min-area RECTANGLE (not the raw contour), the
round-join offset result is rect (+) disk(d), whose minimum-area enclosing
rectangle is the source rect grown by d on each side — exactly what
`_unclip_rect` computes. The tests below verify that equivalence against a
faithful replica of the Paddle pipeline (arc-sampled round joins standing in
for pyclipper, everything else identical) and quantify the residual corner
deviation on non-rectangular contours: the bound asserted is 2 px in dest
space, covering arc discretization + Paddle's integer rounding, which our
float output skips.
"""

from __future__ import annotations

import math

import cv2
import numpy as np
import pytest

from vsr_tpu.detect.postprocess import db_postprocess


# ---------------------------------------------------------------------------
# Paddle DBPostProcess replica (box mode, score_mode="fast")
# ---------------------------------------------------------------------------

def _box_score_fast(prob_map, box):
    h, w = prob_map.shape
    xmin = int(np.clip(np.floor(box[:, 0].min()), 0, w - 1))
    xmax = int(np.clip(np.ceil(box[:, 0].max()), 0, w - 1))
    ymin = int(np.clip(np.floor(box[:, 1].min()), 0, h - 1))
    ymax = int(np.clip(np.ceil(box[:, 1].max()), 0, h - 1))
    mask = np.zeros((ymax - ymin + 1, xmax - xmin + 1), np.uint8)
    shifted = (box - np.array([xmin, ymin])).round().astype(np.int32)
    cv2.fillPoly(mask, [shifted], 1)
    if mask.sum() == 0:
        return 0.0
    return float(cv2.mean(prob_map[ymin : ymax + 1, xmin : xmax + 1], mask)[0])


def _round_join_offset(box: np.ndarray, distance: float, arc_n: int = 128):
    """pyclipper JT_ROUND outward offset of a CONVEX polygon: the Minkowski
    sum with disk(distance), i.e. the convex hull of full circles sampled
    around each vertex (winding-independent)."""
    ang = np.linspace(0.0, 2.0 * math.pi, arc_n, endpoint=False)
    circle = distance * np.stack([np.cos(ang), np.sin(ang)], axis=-1)
    pts = (box[:, None, :] + circle[None, :, :]).reshape(-1, 2)
    hull = cv2.convexHull(pts.astype(np.float32))
    return hull.reshape(-1, 2).astype(np.float64)


def paddle_db_reference(prob_map, dest_hw, thresh=0.3, box_thresh=0.6,
                        max_candidates=1000, unclip_ratio=1.5, min_size=3):
    """Faithful numpy/cv2 replica of DBPostProcess.boxes_from_bitmap."""
    prob_map = np.asarray(prob_map, np.float32)
    h, w = prob_map.shape
    dest_h, dest_w = dest_hw
    bitmap = (prob_map > thresh).astype(np.uint8)
    contours, _ = cv2.findContours(bitmap, cv2.RETR_LIST,
                                   cv2.CHAIN_APPROX_SIMPLE)
    boxes = []
    for contour in contours[:max_candidates]:
        rect = cv2.minAreaRect(contour)
        if min(rect[1]) < min_size:
            continue
        box = cv2.boxPoints(rect)
        if _box_score_fast(prob_map, box) < box_thresh:
            continue
        rw, rh = rect[1]
        perimeter = 2.0 * (rw + rh)
        if perimeter <= 0:
            continue
        distance = rw * rh * unclip_ratio / perimeter
        offset_poly = _round_join_offset(box, distance)
        rect2 = cv2.minAreaRect(offset_poly.astype(np.float32))
        if min(rect2[1]) < min_size + 2:
            continue
        out = cv2.boxPoints(rect2)
        out[:, 0] = np.clip(np.round(out[:, 0] / w * dest_w), 0, dest_w)
        out[:, 1] = np.clip(np.round(out[:, 1] / h * dest_h), 0, dest_h)
        boxes.append(out.astype(np.float32))
    return boxes


# ---------------------------------------------------------------------------
# comparison helpers
# ---------------------------------------------------------------------------

def _canon(box: np.ndarray) -> np.ndarray:
    """Order corners by angle around the centroid (winding/start invariant)."""
    c = box.mean(axis=0)
    ang = np.arctan2(box[:, 1] - c[1], box[:, 0] - c[0])
    return box[np.argsort(ang)]


def _corner_dev(a: np.ndarray, b: np.ndarray) -> float:
    """Max corner distance between two quads, invariant to corner order
    (angle sort can rotate cyclically when a corner sits near the +/-pi
    wrap)."""
    ca, cb = _canon(a), _canon(b)
    return min(float(np.abs(ca - np.roll(cb, r, axis=0)).max())
               for r in range(4))


def _match_and_max_dev(ours, theirs) -> float:
    assert len(ours) == len(theirs), (len(ours), len(theirs))
    used = set()
    worst = 0.0
    for b in ours:
        best_j, best_d = None, np.inf
        for j, ref in enumerate(theirs):
            if j in used:
                continue
            d = _corner_dev(ref, b)
            if d < best_d:
                best_j, best_d = j, d
        used.add(best_j)
        worst = max(worst, best_d)
    return worst


def _blob_map(shape, draw, blur=0):
    m = np.zeros(shape, np.float32)
    draw(m)
    if blur:
        m = cv2.GaussianBlur(m, (blur, blur), 0)
    return m


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

class TestAxisAlignedExact:
    def test_unclip_geometry_exact(self):
        """Axis-aligned rectangle: analytic expected corners."""
        m = _blob_map((160, 320), lambda a: cv2.rectangle(
            a, (60, 40), (259, 99), 1.0, -1))
        boxes = db_postprocess(m, (160, 320))
        assert len(boxes) == 1
        box = _canon(boxes[0])
        # contour covers [60,259]x[40,99] -> minAreaRect 200x60 centered
        # (159.5, 69.5); d = (200*60*1.5)/(2*(200+60)) = 34.615...
        rw, rh = 200.0, 60.0
        d = rw * rh * 1.5 / (2 * (rw + rh))
        exp = np.array([
            [60 - d, 40 - d], [259 + d, 40 - d],
            [259 + d, 99 + d], [60 - d, 99 + d],
        ], np.float32)
        assert np.abs(_canon(exp) - box).max() < 1.5

    def test_dest_rescale(self):
        """Boxes scale into dest coordinates (2x here)."""
        m = _blob_map((160, 320), lambda a: cv2.rectangle(
            a, (60, 40), (259, 99), 1.0, -1))
        b1 = _canon(db_postprocess(m, (160, 320))[0])
        b2 = _canon(db_postprocess(m, (320, 640))[0])
        assert np.abs(b2 - 2.0 * b1).max() < 1e-3


class TestPaddleGolden:
    """Quantified corner deviation vs the Paddle pipeline replica."""

    CASES = {
        "axis_rect": lambda a: cv2.rectangle(a, (60, 40), (259, 99), 1.0, -1),
        "rot15": lambda a: cv2.fillPoly(a, [cv2.boxPoints(
            ((160, 80), (180, 50), 15.0)).astype(np.int32)], 1.0),
        "rot37": lambda a: cv2.fillPoly(a, [cv2.boxPoints(
            ((160, 80), (140, 44), 37.0)).astype(np.int32)], 1.0),
        "rot60_small": lambda a: cv2.fillPoly(a, [cv2.boxPoints(
            ((100, 100), (70, 24), 60.0)).astype(np.int32)], 1.0),
        "ellipse": lambda a: cv2.ellipse(
            a, (160, 80), (90, 28), 20.0, 0, 360, 1.0, -1),
        "l_shape": lambda a: (
            cv2.rectangle(a, (40, 40), (200, 70), 1.0, -1),
            cv2.rectangle(a, (40, 40), (80, 130), 1.0, -1),
        ),
        "two_blobs": lambda a: (
            cv2.rectangle(a, (20, 30), (130, 60), 1.0, -1),
            cv2.rectangle(a, (180, 90), (300, 125), 1.0, -1),
        ),
    }

    @pytest.mark.parametrize("name", sorted(CASES))
    def test_matches_paddle_semantics(self, name):
        m = _blob_map((160, 320), self.CASES[name])
        # the L fills only ~60% of its min-area rect; drop box_thresh so the
        # non-rectangular unclip itself is exercised (both pipelines reject
        # it at the default 0.6 — also an agreement, but a vacuous one)
        kw = {"box_thresh": 0.3} if name == "l_shape" else {}
        ours = db_postprocess(m, (160, 320), **kw)
        ref = paddle_db_reference(m, (160, 320), **kw)
        assert len(ours) == len(ref) and len(ours) >= 1
        dev = _match_and_max_dev(ours, ref)
        # 2 px covers arc discretization, minAreaRect float jitter, and
        # Paddle's integer rounding (which db_postprocess skips)
        assert dev <= 2.0, f"{name}: max corner deviation {dev:.2f}px"

    def test_fuzz_rotated_rects(self):
        """Random rotated rectangles: the unclip equivalence is exact, so
        deviation stays within the rounding/discretization bound."""
        rng = np.random.default_rng(7)
        worst = 0.0
        for _ in range(25):
            cx = float(rng.uniform(90, 230))
            cy = float(rng.uniform(60, 100))
            rw = float(rng.uniform(40, 160))
            rh = float(rng.uniform(12, 50))
            ang = float(rng.uniform(0, 180))
            m = _blob_map((160, 320), lambda a: cv2.fillPoly(
                a, [cv2.boxPoints(((cx, cy), (rw, rh), ang)
                                  ).astype(np.int32)], 1.0))
            ours = db_postprocess(m, (160, 320))
            ref = paddle_db_reference(m, (160, 320))
            if not ref:
                assert not ours
                continue
            assert len(ours) == len(ref)
            worst = max(worst, _match_and_max_dev(ours, ref))
        assert worst <= 2.0, f"max corner deviation {worst:.2f}px"

    def test_filters_match(self):
        """box_thresh and min_size rejections agree with the replica."""
        # low-probability blob: binarizes at 0.3 but scores < 0.6
        low = _blob_map((160, 320), lambda a: cv2.rectangle(
            a, (60, 40), (259, 99), 0.45, -1))
        assert db_postprocess(low, (160, 320)) == []
        assert paddle_db_reference(low, (160, 320)) == []
        # sub-min_size sliver
        thin = _blob_map((160, 320), lambda a: cv2.rectangle(
            a, (60, 80), (259, 81), 1.0, -1))
        assert db_postprocess(thin, (160, 320)) == []
        assert paddle_db_reference(thin, (160, 320)) == []
