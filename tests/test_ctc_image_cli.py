"""CTC, image-processing and CLI tests (reference: src/ctc.rs tests,
rten-imageproc tests, rten-cli)."""

import numpy as np
import pytest

from rten_tpu.ctc import CtcDecoder
from rten_tpu.image import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    Point,
    Polygon,
    Rect,
    chw_to_hwc,
    convex_hull,
    draw_polygon,
    fill_rect,
    find_contours,
    hwc_to_chw,
    min_area_rect,
    normalize_image,
    simplify_polygon,
)


# ---- CTC -------------------------------------------------------------------


def probs_from_labels(label_seq, n_classes, p=0.9):
    out = np.full((len(label_seq), n_classes), (1 - p) / (n_classes - 1), np.float32)
    for t, l in enumerate(label_seq):
        out[t] = (1 - p) / (n_classes - 1)
        out[t, l] = p
    return out


def test_ctc_greedy_collapses_repeats_and_blanks():
    # blank=0; emission path: a a _ b b → "ab"
    probs = probs_from_labels([1, 1, 0, 2, 2], n_classes=4)
    hyp = CtcDecoder().decode_greedy(probs)
    assert hyp.labels == [1, 2]
    # timestamps of first emissions
    assert [t for _, t in hyp.steps] == [0, 3]


def test_ctc_greedy_repeat_after_blank_kept():
    probs = probs_from_labels([1, 0, 1], n_classes=3)
    hyp = CtcDecoder().decode_greedy(probs)
    assert hyp.labels == [1, 1]


def test_ctc_beam_matches_greedy_on_peaked_dist():
    probs = probs_from_labels([1, 0, 2, 0, 3], n_classes=5, p=0.99)
    greedy = CtcDecoder().decode_greedy(probs)
    beam = CtcDecoder().decode_beam(probs, beam_size=8)
    assert beam.labels == greedy.labels


def test_ctc_beam_sums_paths():
    """Beam search can beat greedy: multiple low-prob paths for one label
    sequence can outweigh the single best path."""
    # classes: blank, a, b
    probs = np.array(
        [
            [0.0, 0.5, 0.5],
            [0.6, 0.4, 0.0],
        ],
        dtype=np.float32,
    )
    # paths: aa->a(.2) a_->a(.3) ab->ab(0) ba->ba(.2) b_->b(.3) bb->b(0)
    # P(a)=0.5*0.6+0.5*0.4=0.5 ... wait aa: .5*.4=0.2 collapses to "a";
    # a_: .5*.6=0.3 → total P("a")=0.5; b paths: b_=0.3, bb=0 → P(b)=0.3
    hyp = CtcDecoder().decode_beam(probs, beam_size=8)
    assert hyp.labels == [1]


def test_ctc_nbest():
    probs = probs_from_labels([1, 2], n_classes=4, p=0.8)
    hyps = CtcDecoder().decode_beam_nbest(probs, beam_size=8, n_best=3)
    assert len(hyps) == 3
    assert hyps[0].labels == [1, 2]
    assert hyps[0].log_prob >= hyps[1].log_prob >= hyps[2].log_prob


def test_ctc_text_alphabet():
    probs = probs_from_labels([1, 0, 2], n_classes=4)
    hyp = CtcDecoder().decode_greedy(probs)
    assert hyp.text("ab") == "ab"


# ---- image -----------------------------------------------------------------


def test_normalize_image():
    img = np.ones((3, 4, 4), np.float32) * 0.5
    out = normalize_image(img)
    expected = (0.5 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(out[:, 0, 0], expected, rtol=1e-6)


def test_hwc_chw_round_trip(rng):
    hwc = rng.standard_normal((5, 7, 3)).astype(np.float32)
    np.testing.assert_array_equal(chw_to_hwc(hwc_to_chw(hwc)), hwc)


def test_rect_iou():
    a = Rect(0, 0, 10, 10)
    b = Rect(5, 5, 15, 15)
    assert abs(a.iou(b) - 25 / 175) < 1e-6
    assert a.iou(Rect(20, 20, 30, 30)) == 0.0


def test_polygon_area_contains():
    sq = Polygon([Point(0, 0), Point(0, 4), Point(4, 4), Point(4, 0)])
    assert sq.area() == 16.0
    assert sq.contains(Point(2, 2))
    assert not sq.contains(Point(5, 2))


def test_find_contours_square():
    mask = np.zeros((10, 10), bool)
    mask[2:6, 3:8] = True
    contours = find_contours(mask)
    assert len(contours) == 1
    rect = contours[0].bounding_rect()
    assert (rect.top, rect.left, rect.bottom, rect.right) == (2, 3, 5, 7)


def test_find_contours_two_components():
    mask = np.zeros((10, 10), bool)
    mask[1:3, 1:3] = True
    mask[6:9, 5:9] = True
    contours = find_contours(mask)
    assert len(contours) == 2


def test_simplify_polygon():
    # A straight line of points collapses to endpoints.
    poly = Polygon([Point(0, i) for i in range(10)])
    simple = simplify_polygon(poly, epsilon=0.5)
    assert len(simple) == 2


def test_convex_hull():
    pts = [Point(0, 0), Point(0, 4), Point(4, 4), Point(4, 0), Point(2, 2)]
    hull = convex_hull(pts)
    assert len(hull) == 4
    assert hull.area() == 16.0


def test_min_area_rect_rotated():
    # Diamond (rotated square) — min-area rect should have area 2, not the
    # axis-aligned 4.
    pts = [Point(0, 1), Point(1, 2), Point(2, 1), Point(1, 0)]
    rr = min_area_rect(pts)
    assert abs(rr.area() - 2.0) < 1e-4


def test_drawing():
    img = np.zeros((10, 10), np.float32)
    fill_rect(img, Rect(2, 2, 4, 4), 1.0)
    assert img[3, 3] == 1.0 and img[5, 5] == 0.0
    img2 = np.zeros((10, 10), np.float32)
    draw_polygon(img2, Polygon([Point(0, 0), Point(0, 9), Point(9, 9), Point(9, 0)]))
    assert img2[0, 5] == 1.0 and img2[5, 5] == 0.0


# ---- CLI -------------------------------------------------------------------


def test_cli_end_to_end(tmp_path, capsys):
    import numpy as np

    from rten_tpu.cli import main
    from rten_tpu.format import save_rten
    from rten_tpu.graph import Graph

    g = Graph()
    x = g.add_value("x", [1, "seq", 4])
    w = g.add_constant("w", np.ones((4, 2), np.float32))
    out = g.add_simple_op("MatMul", [x, w], name="mm")
    g.inputs, g.outputs = [x], [out]
    path = tmp_path / "model.rten"
    path.write_bytes(save_rten(g, {"description": "cli test"}))

    rc = main([str(path), "-n", "2", "--size", "seq=3", "--mode", "interpret"])
    assert rc == 0
    out_text = capsys.readouterr().out
    assert "input 'x': shape [1, 3, 4]" in out_text
    assert "cli test" in out_text
    assert "latency" in out_text


def test_fill_polygon_triangle():
    from rten_tpu.image.drawing import fill_polygon
    from rten_tpu.image.shapes import Point, Polygon

    img = np.zeros((12, 12), np.float32)
    tri = Polygon([Point(1, 1), Point(1, 10), Point(10, 1)])
    fill_polygon(img, tri, 1.0)
    # Interior pixels set, exterior clear, roughly half the bbox filled.
    assert img[2, 2] == 1.0 and img[3, 5] == 1.0
    assert img[10, 10] == 0.0 and img[0, 0] == 0.0
    filled = img.sum()
    assert 25 <= filled <= 55  # ~half of the 9x9 bbox


def test_simplify_polyline_open():
    from rten_tpu.image.poly import simplify_polyline
    from rten_tpu.image.shapes import Point

    pts = [Point(0, 0), Point(0.05, 1), Point(0, 2), Point(2, 2)]
    out = simplify_polyline(pts, epsilon=0.2)
    assert len(out) == 3  # middle near-collinear point dropped
