"""Generator-SFT data utilities — twins of the reference's TRL-side prep
(`/root/reference/dalm/training/generator_only/trainer.py:23-80,222-259`).

- ``create_datasets``: local / hub / streaming split handling (:23-59) —
  streaming keeps the take/skip + shuffle-buffer semantics;
- ``chars_token_ratio``: avg chars/token over a 400-sample probe (:62-80);
- ``format_chat``: chatml rendering of ``messages`` rows (the reference
  calls ``tokenizer.apply_chat_template``; our self-contained renderer
  emits standard chatml so any chatml-trained model reads it);
- ``pack_dataset``: TRL ``ConstantLengthDataset`` equivalent — token
  streams concatenated with EOS and cut into fixed ``seq_length`` blocks
  (static shapes for the MXU; no padding waste).
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def format_chat(messages: List[Dict[str, str]]) -> str:
    """Render a ``messages`` list as chatml."""
    parts = []
    for m in messages:
        parts.append(f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n")
    return "".join(parts)


def prepare_sample_text(example: Dict[str, Any]) -> str:
    """Row → training text; malformed rows yield "" and are skipped
    (reference behavior, `trainer.py:222-229`)."""
    try:
        return format_chat(example["messages"])
    except Exception:
        logger.exception("error preparing text; skipping example")
        return ""


def create_datasets(
    dataset_name: str,
    split: str = "train",
    validation_split: Optional[float] = 0.05,
    size_valid_set: Optional[int] = None,
    streaming: bool = False,
    shuffle_buffer: Optional[int] = None,
    num_workers: int = 4,
    local_dataset: bool = False,
    seed: int = 42,
):
    """Twin of `create_datasets` (`trainer.py:23-59`).

    ``seed`` fixes the train/validation split (and the streaming shuffle
    order). The reference gets the same determinism implicitly from
    accelerate's global ``set_seed`` before dataset prep; here it is
    explicit because every process must draw the IDENTICAL split for
    multi-process data parallelism to shard one dataset instead of two
    (the 2-process equality test pins this).
    """
    import datasets as hf_datasets

    if local_dataset:
        dataset = hf_datasets.load_from_disk(dataset_name)
        if isinstance(dataset, hf_datasets.DatasetDict):
            dataset = dataset[split]
    else:
        dataset = hf_datasets.load_dataset(
            dataset_name,
            split=split,
            num_proc=num_workers if not streaming else None,
            streaming=streaming,
        )
    if streaming:
        if not (shuffle_buffer and size_valid_set):
            raise ValueError("size_valid_set must be set when streaming is enabled")
        valid_data = dataset.take(size_valid_set)
        train_data = dataset.skip(size_valid_set).shuffle(buffer_size=shuffle_buffer, seed=seed)
    else:
        if not validation_split:
            raise ValueError("validation_split must be set when streaming is disabled")
        parts = dataset.train_test_split(test_size=validation_split, seed=seed)
        train_data, valid_data = parts["train"], parts["test"]
        logger.info("train set: %d rows, validation set: %d rows", len(train_data), len(valid_data))
    return train_data, valid_data


def chars_token_ratio(
    dataset,
    tokenizer,
    formatting_func: Callable[[Dict[str, Any]], str] = prepare_sample_text,
    sample_size: int = 400,
) -> float:
    """Twin of `chars_token_ratio` (`trainer.py:62-80`)."""
    total_chars, total_tokens = 0, 0
    for _, example in zip(range(sample_size), iter(dataset)):
        text = formatting_func(example)
        total_chars += len(text)
        total_tokens += len(tokenizer.encode_batch([text], padding=False)["input_ids"][0])
    return total_chars / max(total_tokens, 1)


def pack_dataset(
    dataset: Iterable[Dict[str, Any]],
    tokenizer,
    seq_length: int,
    formatting_func: Callable[[Dict[str, Any]], str] = prepare_sample_text,
    max_blocks: Optional[int] = None,
) -> np.ndarray:
    """Concatenate tokenized texts (EOS-joined) into (N, seq_length) blocks.

    TRL ``packing=True`` equivalent. The tail remainder shorter than
    ``seq_length`` is dropped (TRL default).
    """
    eos = tokenizer.eos_token_id
    buf: List[int] = []
    blocks: List[List[int]] = []
    for example in dataset:
        text = formatting_func(example)
        if not text:
            continue
        ids = tokenizer.encode_batch([text], padding=False)["input_ids"][0]
        buf.extend(ids)
        if eos is not None:
            buf.append(eos)
        while len(buf) >= seq_length:
            blocks.append(buf[:seq_length])
            buf = buf[seq_length:]
            if max_blocks and len(blocks) >= max_blocks:
                return np.asarray(blocks, np.int32)
    return np.asarray(blocks, np.int32) if blocks else np.zeros((0, seq_length), np.int32)


def pad_dataset(
    dataset: Iterable[Dict[str, Any]],
    tokenizer,
    seq_length: int,
    formatting_func: Callable[[Dict[str, Any]], str] = prepare_sample_text,
    max_samples: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-sample fixed-length padding — TRL ``packing=False`` equivalent
    (`trainer.py:231`). Each row is tokenized, EOS-terminated, truncated
    to ``seq_length`` and right-padded; the attention mask zeroes the pad
    region so the loss covers only real tokens. Shapes stay static (TPU).
    """
    eos = tokenizer.eos_token_id
    pad = getattr(tokenizer, "pad_token_id", None)
    if pad is None:
        pad = eos if eos is not None else 0
    ids_rows: List[List[int]] = []
    mask_rows: List[List[int]] = []
    for example in dataset:
        text = formatting_func(example)
        if not text:
            continue
        ids = tokenizer.encode_batch([text], padding=False)["input_ids"][0]
        if eos is not None:
            ids = list(ids) + [eos]
        ids = list(ids)[:seq_length]
        n = len(ids)
        ids_rows.append(ids + [pad] * (seq_length - n))
        mask_rows.append([1] * n + [0] * (seq_length - n))
        if max_samples and len(ids_rows) >= max_samples:
            break
    if not ids_rows:
        return np.zeros((0, seq_length), np.int32), np.zeros((0, seq_length), np.int32)
    return np.asarray(ids_rows, np.int32), np.asarray(mask_rows, np.int32)
