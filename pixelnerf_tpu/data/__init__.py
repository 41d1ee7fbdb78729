"""Dataset factory (reference src/data/__init__.py semantics).

Formats: srn | dvr | dvr_gen | dvr_dtu | multi_obj | synthetic.
"""
from __future__ import annotations

from .base import DatasetBase  # noqa: F401
from .color_jitter import ColorJitterDataset  # noqa: F401
from .dvr import DVRDataset  # noqa: F401
from .multi_object import MultiObjectDataset  # noqa: F401
from .pipeline import RayBatchPipeline, gen_rays_at  # noqa: F401
from .srn import SRNDataset  # noqa: F401
from .synthetic import SyntheticSphereDataset  # noqa: F401


def dataset_kwargs_from_conf(conf) -> dict:
    """``data.*`` config keys (minus ``format``) as dataset constructor
    kwargs, so ``--override data.num_objects=2048`` etc. reaches the dataset
    from EVERY app, not just training."""
    return {k: v for k, v in (conf.get("data") or {}).items() if k != "format"}


def get_split_dataset(dataset_type, datadir, want_split="all", training=True, **kwargs):
    """Build dataset(s) for the requested split(s).

    :param want_split: 'train' | 'val' | 'test' | 'all' (returns a 3-tuple)
    """
    flags = {}
    train_aug = None
    train_aug_flags = {}

    if dataset_type == "srn":
        dset_class = SRNDataset
    elif dataset_type == "multi_obj":
        dset_class = MultiObjectDataset
    elif dataset_type == "synthetic":
        dset_class = SyntheticSphereDataset

        def dset_class(datadir, stage="train", **kw):  # noqa: F811 - datadir unused
            return SyntheticSphereDataset(stage=stage, **kw)

    elif dataset_type.startswith("dvr"):
        dset_class = DVRDataset
        if dataset_type == "dvr_gen":
            flags["list_prefix"] = "gen_"
        elif dataset_type == "dvr_dtu":
            flags["list_prefix"] = "new_"
            if training:
                flags["max_imgs"] = 49
            flags["sub_format"] = "dtu"
            flags["scale_focal"] = False
            flags["z_near"] = 0.1
            flags["z_far"] = 5.0
            train_aug = ColorJitterDataset
            train_aug_flags = {"extra_inherit_attrs": ["sub_format"]}
    else:
        raise NotImplementedError(f"Unsupported dataset type {dataset_type}")

    def build(stage):
        dset = dset_class(datadir, stage=stage, **flags, **kwargs)
        if stage == "train" and train_aug is not None:
            dset = train_aug(dset, **train_aug_flags)
        return dset

    if want_split == "train":
        return build("train")
    if want_split == "val":
        return build("val")
    if want_split == "test":
        return build("test")
    return build("train"), build("val"), build("test")
