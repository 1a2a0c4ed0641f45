"""Synthetic question generation over passages (QA-gen).

Twin of `/root/reference/dalm/datasets/qa_gen/question_answer_generation.py`:
one question per passage from an instruction-tuned LLM with a one-shot
example (`:100-127`), a malformed-question filter (`:153-166`), and a
title-grouped 80/20 train/test split with sklearn's splitter at
random_state 42 (`:169-184`).

Differences:
- generation goes through a pluggable ``generate_fn`` (default:
  `dalm_tpu.data.backends.JaxTextGenerator` running our decoder on the
  mesh) instead of an inline torch Qwen load;
- the reference's ``dalm qa-gen`` CLI crashes (7 args passed, 8 required
  — SURVEY.md §7.4); here ``max_input_tokens`` has a default so both the
  API and CLI work.
"""

from __future__ import annotations

import logging
import os
import warnings
from functools import partial
from pathlib import Path
from typing import Optional

import datasets
from datasets import Dataset, DatasetDict
from sklearn.model_selection import train_test_split

from dalm_tpu.data.backends import GenerateFn

logger = logging.getLogger(__name__)

TEST_SIZE = 0.2

_EXAMPLE_PASSAGE = (
    "Dense retrieval models encode queries and passages into a shared "
    "vector space and are trained with contrastive objectives so that a "
    "query lands near its relevant passages. In-batch negatives reuse the "
    "other passages in a training batch as negative examples, which makes "
    "large-batch training an effective way to sharpen the ranking."
)
_EXAMPLE_QUESTION = (
    "How do in-batch negatives contribute to training dense retrieval "
    "models, and why does batch size matter for ranking quality?"
)

PROMPT_TEMPLATE = (
    "Read the passage below and write exactly one question grounded in its "
    "content. Keep the question between 10 and 100 words. Output only the "
    "question itself: no labels such as 'Question:' or 'Answer:', no "
    "explanations, no line breaks.\n\n"
    "Example:\nPassage: {example_passage}\n{example_question}\n\n"
    "Now write a question for this passage:\n{passage}\n"
)


def build_prompt(passage: str) -> str:
    return PROMPT_TEMPLATE.format(
        example_passage=_EXAMPLE_PASSAGE,
        example_question=_EXAMPLE_QUESTION,
        passage=passage,
    )


def generate_question_answer_pairs(examples, generate_fn: GenerateFn, passage_column_name: str):
    """Batch-map fn: one generated Question per passage; Answer left ""
    (the reference does the same — answers come from elsewhere)."""
    prompts = [build_prompt(p) for p in examples[passage_column_name]]
    responses = generate_fn(prompts)
    return {
        "Question": [r.strip().replace("\n", " ") for r in responses],
        "Answer": ["" for _ in responses],
    }


def filter_malformed_questions(record: dict) -> bool:
    """Exact reference filter semantics (`:153-166`)."""
    q = record["Question"]
    return (
        q is not None
        and q != ""
        and q != "-"
        and len(q.split()) >= 5
        and not q.startswith("<")
        and "instruction" not in q.lower()
        and "question" not in q.lower()
        and "answer" not in q.lower()
    )


def split_dataset(shuffled: Dataset, title_column_name: str, test_size: float = TEST_SIZE) -> DatasetDict:
    """Group split by unique title, 80/20, seed 42 (`:169-184`)."""
    unique_titles = set(shuffled[title_column_name])
    train_titles, test_titles = train_test_split(
        sorted(unique_titles), test_size=test_size, random_state=42
    )
    train_titles, test_titles = set(train_titles), set(test_titles)
    return DatasetDict(
        {
            "train": shuffled.filter(lambda ex: ex[title_column_name] in train_titles),
            "test": shuffled.filter(lambda ex: ex[title_column_name] in test_titles),
        }
    )


def generate_qa_from_dataset(
    dataset: Dataset,
    passage_column_name: str,
    title_column_name: str,
    sample_size: int,
    batch_size: int,
    max_input_tokens: int = 512,
    generate_fn: Optional[GenerateFn] = None,
    model_spec: str = "tiny",
    tokenizer: str = "byte",
) -> DatasetDict:
    """Twin of `generate_qa_from_dataset` (`:187-227`)."""
    if generate_fn is None:
        from dalm_tpu.data.backends import JaxTextGenerator

        generate_fn = JaxTextGenerator(
            model_spec, tokenizer=tokenizer,
            max_input_tokens=max_input_tokens, batch_size=batch_size,
        )

    dataset = dataset.shuffle(seed=42)
    small = dataset.select(range(min(sample_size, len(dataset))))
    splits = split_dataset(small, title_column_name)
    logger.info("train split: %d rows, test split: %d rows", len(splits["train"]), len(splits["test"]))

    qa_map = partial(
        generate_question_answer_pairs,
        generate_fn=generate_fn,
        passage_column_name=passage_column_name,
    )
    processed = splits.map(qa_map, batched=True, batch_size=batch_size)
    filtered = processed.filter(filter_malformed_questions)
    logger.info(
        "dropped malformed questions: train %d, test %d",
        len(processed["train"]) - len(filtered["train"]),
        len(processed["test"]) - len(filtered["test"]),
    )
    return filtered


def _load_dataset_from_path(dataset_path: str) -> Dataset:
    """CSV / saved dir / hub name (`:230-252`)."""
    if dataset_path.endswith(".csv"):
        return Dataset.from_csv(dataset_path)
    if not os.path.splitext(dataset_path)[-1]:
        if os.path.isdir(dataset_path):
            return datasets.load_from_disk(dataset_path)
        ds = datasets.load_dataset(dataset_path)
        if isinstance(ds, DatasetDict):
            key = "train" if "train" in ds else "training" if "training" in ds else next(iter(ds))
            warnings.warn(f"multiple splits found; using {key}", stacklevel=0)
            ds = ds[key]
        return ds
    raise ValueError("dataset-path must be a csv, a saved dataset dir, or a hub name")


def generate_qa_from_disk(
    dataset_path: str,
    passage_column_name: str,
    title_column_name: str,
    sample_size: int,
    batch_size: int,
    output_dir: str,
    as_csv: bool,
    max_input_tokens: int = 512,
    generate_fn: Optional[GenerateFn] = None,
    model_spec: str = "tiny",
    tokenizer: str = "byte",
) -> None:
    """Twin of `generate_qa_from_disk` (`:255-276`)."""
    dataset = _load_dataset_from_path(dataset_path)
    qa = generate_qa_from_dataset(
        dataset, passage_column_name, title_column_name, sample_size, batch_size,
        max_input_tokens, generate_fn=generate_fn, model_spec=model_spec, tokenizer=tokenizer,
    )
    out = Path(output_dir)
    out.mkdir(exist_ok=True, parents=True)
    for split_name, split_ds in qa.items():
        path = out / f"question_answer_pairs_{split_name}"
        if as_csv:
            split_ds.to_csv(f"{path}.csv")
        else:
            split_ds.save_to_disk(str(path))
        logger.info("saved split %s to %s", split_name, path)
