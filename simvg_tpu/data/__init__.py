from .tokenization import clean_string, build_tokenizer, SimpleTokenizer
from .datasets import build_dataset, BaseDataset, DATASET_CLASSES
from .loader import DataLoader, collate
from . import transforms

__all__ = [
    "clean_string",
    "build_tokenizer",
    "SimpleTokenizer",
    "build_dataset",
    "BaseDataset",
    "DATASET_CLASSES",
    "DataLoader",
    "collate",
    "transforms",
]
