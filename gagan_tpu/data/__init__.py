"""Dataset tooling and input pipelines."""

from .dataset import ImageFolderDataset, InfiniteSampler, data_loader

__all__ = ["ImageFolderDataset", "InfiniteSampler", "data_loader"]
