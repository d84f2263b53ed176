"""Grain-backed loader: Batch-contract parity with the threaded loader."""

import numpy as np
import pytest

from robust_object_detection_tpu.data import convert, pipeline, synthetic
from robust_object_detection_tpu.data.grain_pipeline import \
    make_batches_grain


@pytest.fixture(scope="module")
def samples(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("grain")
    det = synthetic.make_det_split(tmp / "det", n_images=6,
                                   size_range=((48, 49), (48, 49)))
    convert.convert_det_to_coco(det, tmp / "coco", "val")
    return pipeline.index_coco(tmp / "coco", "val")


def test_grain_matches_threaded_loader(samples):
    bg = list(make_batches_grain(samples, 4, 64, max_boxes=16))
    bt = list(pipeline.make_batches(samples, 4, 64, max_boxes=16))
    assert len(bg) == len(bt) == 2
    for g, t in zip(bg, bt):
        np.testing.assert_array_equal(g.images[:g.num_valid],
                                      t.images[:t.num_valid])
        np.testing.assert_array_equal(g.boxes[:g.num_valid],
                                      t.boxes[:t.num_valid])
        np.testing.assert_array_equal(g.classes[:g.num_valid],
                                      t.classes[:t.num_valid])
        assert g.num_valid == t.num_valid
    assert (bg[1].image_ids[bg[1].num_valid:] == -1).all()


def test_grain_shuffle_is_permutation(samples):
    bg = list(make_batches_grain(samples, 2, 64, max_boxes=16,
                                 shuffle=True, seed=3))
    ids = np.concatenate([b.image_ids[:b.num_valid] for b in bg])
    assert sorted(ids.tolist()) == [s.image_id for s in samples]
