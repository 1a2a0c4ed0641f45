"""Dataset loading — twin of `/root/reference/dalm/utils.py:8-19`.

Accepts a ``datasets.Dataset``, a saved-dataset directory, or a CSV path.
"""

from __future__ import annotations

import os
from typing import Union

import datasets
from datasets import Dataset


def load_dataset(dataset_or_path: Union[str, Dataset]) -> Dataset:
    if isinstance(dataset_or_path, Dataset):
        return dataset_or_path
    if os.path.isdir(dataset_or_path):
        return datasets.load_from_disk(dataset_or_path)
    return datasets.load_dataset("csv", data_files=dataset_or_path)["train"]
