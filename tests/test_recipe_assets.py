"""The shipped VOC12 recipe index lists parse with the repo's readers.

``recipes/voc12/list/`` ships the reference recipe's dataset index files
verbatim (data assets — see recipes/voc12/README.md); these tests pin their
line counts to the reference's (SURVEY.md §2.3) and verify the formats the
data layer actually consumes (``data/voc.py:33-47``).
"""

import os.path as osp

from dsrg_tpu.data.voc import read_id_list, read_pair_list

_LIST_DIR = osp.join(osp.dirname(__file__), "..", "recipes", "voc12", "list")


def test_input_list_format_and_count():
    pairs = read_pair_list(osp.join(_LIST_DIR, "input_list.txt"))
    assert len(pairs) == 10582
    names, idxs = zip(*pairs)
    assert all(n.endswith(".jpg") for n in names)
    # cue-pickle keys are the 0-based positions: indices must be unique ints
    as_int = sorted(int(i) for i in idxs)
    assert as_int[0] == 0 and len(set(as_int)) == 10582


def test_stage2_pair_list():
    pairs = read_pair_list(osp.join(_LIST_DIR, "train.txt"))
    # 10581 per `wc -l` (SURVEY §2.3) but the file has no trailing newline:
    # the real pair count is 10582, one per train_aug image
    assert len(pairs) == 10582
    img, gt = pairs[0]
    assert img.startswith("/JPEGImages/") and img.endswith(".jpg")
    assert gt.startswith("/DSRGOutput/") and gt.endswith(".png")


def test_id_lists():
    train_aug = read_id_list(osp.join(_LIST_DIR, "train_aug_id.txt"))
    val = read_id_list(osp.join(_LIST_DIR, "val_id.txt"))
    test = read_id_list(osp.join(_LIST_DIR, "test_id.txt"))
    assert (len(train_aug), len(val), len(test)) == (10582, 1449, 1456)
    # standard VOC12 id shape: YYYY_NNNNNN
    for ids in (train_aug, val, test):
        assert all(len(i) == 11 and i[4] == "_" for i in ids)
    # val is disjoint from the training split (weak-supervision contract)
    assert not set(val) & set(train_aug)
