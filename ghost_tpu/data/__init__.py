from ghost_tpu.data.datasets import FaceEmbedDataset, FaceEmbedVGG2Dataset, CelebAStyleDataset
from ghost_tpu.data.loader import PrefetchLoader

__all__ = [
    "FaceEmbedDataset",
    "FaceEmbedVGG2Dataset",
    "CelebAStyleDataset",
    "PrefetchLoader",
]
