"""Document → passage chunking.

Twin of `/root/reference/dalm/datasets/docs_to_passage/{main,utils}.py`:
split each document at every ``max_words``-th space (default 100), drop
passages under ``min_words`` (default 5), cap at ``max_docs`` documents
(reference const 500k, `main.py:23`).
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional, Union

from datasets import Dataset

logger = logging.getLogger(__name__)

DEFAULT_MAX_WORDS = 100
DEFAULT_MIN_WORDS = 5
MAX_NUM_DOCUMENTS = 500_000
TITLE_COL = "title"
TEXT_COL = "text"


def split_text(text: str, n: int = DEFAULT_MAX_WORDS, character: str = " ") -> List[str]:
    """Every n-th occurrence of ``character`` (`utils.py:9-12`)."""
    pieces = text.split(character)
    return [character.join(pieces[i : i + n]).strip() for i in range(0, len(pieces), n)]


def split_documents(documents: dict, max_words: int = DEFAULT_MAX_WORDS) -> dict:
    titles, texts = [], []
    for title, text in zip(documents[TITLE_COL], documents[TEXT_COL]):
        if text is None:
            continue
        for passage in split_text(text, n=max_words):
            titles.append(title if title is not None else "")
            texts.append(passage)
    return {TITLE_COL: titles, TEXT_COL: texts}


def keep_sufficiently_long_passages(example: dict, min_words: int = DEFAULT_MIN_WORDS) -> bool:
    return len(example[TEXT_COL].split()) >= min_words


def docs_to_passages(
    df: Union[Dataset, "object"],
    max_words: int = DEFAULT_MAX_WORDS,
    title_col: str = TITLE_COL,
    text_col: str = TEXT_COL,
    max_docs: Optional[int] = None,
) -> Dataset:
    """Twin of `docs_to_passages` (`main.py:26-71`)."""
    import pandas as pd
    from functools import partial

    cols = df.columns if isinstance(df, pd.DataFrame) else df.column_names
    if title_col not in cols or text_col not in cols:
        raise AssertionError(
            f"{title_col} and {text_col} must be present; pass title_col/text_col"
        )
    dataset = Dataset.from_pandas(df[[title_col, text_col]]) if isinstance(df, pd.DataFrame) else df
    dataset = dataset.rename_columns(
        {k: v for k, v in {title_col: TITLE_COL, text_col: TEXT_COL}.items() if k != v}
    )
    dataset = dataset.select_columns([TITLE_COL, TEXT_COL])

    if max_docs is not None and len(dataset) > max_docs:
        dataset = dataset.train_test_split(train_size=max_docs)["train"]

    dataset = dataset.map(partial(split_documents, max_words=max_words), batched=True, batch_size=1000)
    return dataset.filter(keep_sufficiently_long_passages)


def main_to_csv(dataset_path: str, title_col=TITLE_COL, text_col=TEXT_COL, output_dir=".", max_words=DEFAULT_MAX_WORDS, max_docs=None) -> str:
    import datasets as hf_datasets

    ds = hf_datasets.load_from_disk(dataset_path)
    passages = docs_to_passages(ds, max_words, title_col, text_col, max_docs)
    out = os.path.join(output_dir, "passages.csv")
    passages.to_csv(out)
    return out
