"""Builtin dataset registry parity (coin/data/datasets/builtin.py:121-175):
reference-exact split names, directory layout, split files, image formats,
class orders; plus round-1 aliases and the friendly unknown-name error."""

import pytest

from coin_tpu.data import voc


def test_reference_splits_exact():
    voc.register_all_builtin()
    s = voc.get_dataset("foggytrain_0.02")
    assert s.dirname == "CityScapes_FoggyCityScapes"
    assert s.split == "train_foggy_0.02"
    assert s.image_ext == ".png"
    assert s.class_names == ("truck", "car", "rider", "person", "train",
                             "motorcycle", "bicycle", "bus")

    kitti = voc.get_dataset("KITTItrainval")
    assert (kitti.dirname, kitti.split, kitti.class_names) == \
        ("KITTI", "train_car", ("car",))

    bdd = voc.get_dataset("BDD100Ktrain")
    assert bdd.split == "train_object"
    assert bdd.class_names == ("person", "rider", "car", "truck", "bus",
                               "motorcycle", "bicycle")

    clipart = voc.get_dataset("clipartval")
    assert clipart.split == "all" and len(clipart.class_names) == 20

    sim3 = voc.get_dataset("SIMtrainval")
    assert sim3.class_names == ("car", "motorbike", "person")


def test_aliases_resolve_to_reference_specs():
    voc.register_all_builtin()
    assert voc.get_dataset("kittitrain") is voc.get_dataset("KITTItrainval")
    assert voc.get_dataset("simval") is voc.get_dataset("SIMtrainval_car")
    assert voc.get_dataset("bddtrain") is voc.get_dataset("BDD100Ktrain")


def test_unknown_dataset_error_lists_registry():
    with pytest.raises(KeyError, match="unknown dataset.*foggyval_0.02"):
        voc.get_dataset("definitely_not_registered")
