from ccmh.data.split import load_raw, split_data, make_splits
from ccmh.data.dataset import CrossModalDataset, BatchIterator
from ccmh.data.synthetic import synthetic_arrays, write_synthetic_mat_dataset

__all__ = [
    "load_raw", "split_data", "make_splits",
    "CrossModalDataset", "BatchIterator",
    "synthetic_arrays", "write_synthetic_mat_dataset",
]
