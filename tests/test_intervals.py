"""Unit tests for the interval algebra (vsr_tpu/masks/intervals.py).

Expected values derive from hand-executing the reference semantics
(backend/tools/inpaint_tools.py, backend/tools/subtitle_detect.py statics).
"""

from vsr_tpu.masks.intervals import (
    batch_generator,
    expand_frame_ranges,
    filter_and_merge_intervals,
    find_continuous_ranges,
    find_continuous_ranges_with_same_mask,
    is_frame_number_in_ab_sections,
    split_range_by_scene,
    unify_regions,
    are_similar,
)


class TestBatchGenerator:
    def test_even_division_still_balances(self):
        # remainder 0 counts as "< half", so the size backs off until the
        # trailing batch is at least half a batch: 100/50 -> 40+40+20.
        batches = list(batch_generator(list(range(100)), 50))
        assert [len(b) for b in batches] == [40, 40, 20]

    def test_balances_remainder(self):
        # 55 items, max 50: remainder 5 < 25 so batch size shrinks until the
        # remainder reaches half a batch — landing on 36 (55 % 36 = 19 >= 18).
        batches = list(batch_generator(list(range(55)), 50))
        assert [len(b) for b in batches] == [36, 19]
        assert sum(len(b) for b in batches) == 55

    def test_all_items_preserved_in_order(self):
        data = list(range(123))
        flat = [x for b in batch_generator(data, 37) for x in b]
        assert flat == data

    def test_small_input(self):
        assert list(batch_generator([1], 50)) == [[1]]

    def test_batch_size_one(self):
        batches = list(batch_generator([1, 2, 3], 1))
        assert [len(b) for b in batches] == [1, 1, 1]


class TestExpandFrameRanges:
    def test_empty(self):
        assert expand_frame_ranges([], 3, 3) == []

    def test_simple_expand(self):
        assert expand_frame_ranges([(10, 20)], 3, 3) == [(7, 23)]

    def test_start_clamped_to_one(self):
        assert expand_frame_ranges([(2, 20)], 3, 3) == [(1, 23)]

    def test_adjacent_ranges_keep_boundary(self):
        # Gap of exactly 1 between 20 and 21: forward growth suppressed.
        assert expand_frame_ranges([(10, 20), (21, 30)], 3, 3) == [(7, 20), (21, 33)]

    def test_overlap_resolved(self):
        # (10,20)+3 -> 23 would hit next start 24: capped at 23; second range's
        # backward growth collides with 23, pushed to 24.
        out = expand_frame_ranges([(10, 20), (24, 30)], 3, 3)
        assert out == [(7, 23), (24, 33)]
        for (s1, e1), (s2, e2) in zip(out, out[1:]):
            assert e1 < s2

    def test_unsorted_input(self):
        assert expand_frame_ranges([(24, 30), (10, 20)], 3, 3) == [(7, 23), (24, 33)]


class TestFilterAndMergeIntervals:
    def test_empty(self):
        assert filter_and_merge_intervals([], 10) == []

    def test_single_point_widened(self):
        # half = (10-1)//2 = 4 -> (96, 104)
        assert filter_and_merge_intervals([(100, 100)], 10) == [(96, 104)]

    def test_long_interval_untouched(self):
        assert filter_and_merge_intervals([(1, 50)], 10) == [(1, 50)]

    def test_short_adjacent_merged(self):
        assert filter_and_merge_intervals([(1, 5), (6, 9)], 10) == [(1, 9)]

    def test_long_adjacent_not_merged(self):
        assert filter_and_merge_intervals([(1, 20), (21, 40)], 10) == [(1, 20), (21, 40)]

    def test_point_between_neighbors_bounded(self):
        # point at 10 with prev end 8 and next start 12 can only widen to (9, 11)
        out = filter_and_merge_intervals([(1, 8), (10, 10), (12, 30)], 10)
        flat = [f for s, e in out for f in (s, e)]
        assert flat == sorted(flat)
        assert any(s <= 10 <= e for s, e in out)


class TestContinuousRanges:
    def test_basic_runs(self):
        d = {1: "a", 2: "a", 3: "a", 7: "b", 8: "b"}
        assert find_continuous_ranges(d) == [(1, 3), (7, 8)]

    def test_empty(self):
        assert find_continuous_ranges({}) == []

    def test_same_mask_split_on_change(self):
        d = {1: ["a"], 2: ["a"], 3: ["b"], 4: ["b"], 6: ["b"]}
        assert find_continuous_ranges_with_same_mask(d) == [(1, 2), (3, 4), (6, 6)]

    def test_same_mask_no_split(self):
        d = {5: [(1, 2, 3, 4)], 6: [(1, 2, 3, 4)]}
        assert find_continuous_ranges_with_same_mask(d) == [(5, 6)]


class TestSplitRangeByScene:
    def test_no_points(self):
        assert split_range_by_scene([(1, 10)], []) == [(1, 10)]

    def test_point_inside(self):
        assert split_range_by_scene([(1, 10)], [5]) == [(1, 4), (5, 10)]

    def test_point_at_start(self):
        assert split_range_by_scene([(5, 10)], [5]) == [(5, 10)]

    def test_multiple_points(self):
        assert split_range_by_scene([(1, 10)], [3, 7]) == [(1, 2), (3, 6), (7, 10)]

    def test_point_outside(self):
        assert split_range_by_scene([(1, 10)], [20]) == [(1, 10)]


class TestAbSections:
    def test_none_means_everything(self):
        assert is_frame_number_in_ab_sections(42, None)

    def test_empty_means_everything(self):
        assert is_frame_number_in_ab_sections(42, [])

    def test_inside(self):
        assert is_frame_number_in_ab_sections(5, [range(1, 10)])

    def test_outside(self):
        assert not is_frame_number_in_ab_sections(50, [range(1, 10)])


class TestUnifyRegions:
    def test_similar_boxes_snapped(self):
        a = (100, 200, 50, 80)
        jitter = (105, 195, 55, 75)
        regions = {1: [a], 2: [jitter]}
        out = unify_regions(regions, tol_x=20, tol_y=20)
        assert out[2] == [a]

    def test_different_boxes_kept(self):
        a = (100, 200, 50, 80)
        b = (400, 500, 50, 80)
        out = unify_regions({1: [a], 2: [b]}, tol_x=20, tol_y=20)
        assert out[2] == [b]

    def test_chains_through_frames(self):
        a = (100, 200, 50, 80)
        drift = [(100 + i, 200 + i, 50, 80) for i in range(5)]
        out = unify_regions({i: [d] for i, d in enumerate(drift)})
        # every frame drifts by <= tolerance from the anchor -> all snap to a
        assert all(v == [a] for v in out.values())

    def test_empty(self):
        assert unify_regions({}) == {}

    def test_are_similar_edges(self):
        assert are_similar((0, 100, 0, 50), (20, 120, 20, 70), tol_x=20, tol_y=20)
        assert not are_similar((0, 100, 0, 50), (21, 100, 0, 50), tol_x=20, tol_y=20)
