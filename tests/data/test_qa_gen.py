"""QA-gen: filter semantics, title-grouped split, generation plumbing."""

import datasets
import pytest

from dalm_tpu.data.qa_gen import (
    build_prompt,
    filter_malformed_questions,
    generate_qa_from_dataset,
    split_dataset,
)


@pytest.mark.parametrize(
    "question,expected",
    [
        ("What drives the retrieval quality in this system exactly", True),
        ("", False),
        ("-", False),
        ("Too short", False),
        ("<think> some model token leak here today", False),
        ("Here is the instruction you asked for today", False),
        ("What is the question you want answered now", False),  # contains "question"
        ("The answer to life the universe and everything", False),  # contains "answer"
        (None, False),
    ],
)
def test_filter_malformed(question, expected):
    assert filter_malformed_questions({"Question": question}) is expected


def test_split_dataset_groups_by_title():
    rows = [{"Title": f"t{i % 5}", "Abstract": f"passage {i}"} for i in range(50)]
    ds = datasets.Dataset.from_list(rows)
    splits = split_dataset(ds, "Title", test_size=0.2)
    train_titles = set(splits["train"]["Title"])
    test_titles = set(splits["test"]["Title"])
    assert train_titles and test_titles
    assert not (train_titles & test_titles)  # no title leakage across splits
    assert len(splits["train"]) + len(splits["test"]) == 50


def test_generate_qa_with_fake_llm():
    rows = [{"Title": f"t{i}", "Abstract": f"passage number {i} with content"} for i in range(10)]
    ds = datasets.Dataset.from_list(rows)

    def fake_generate(prompts):
        # well-formed, filter-passing question per prompt
        return [f"How does the system handle workload {j} under heavy load" for j in range(len(prompts))]

    result = generate_qa_from_dataset(
        ds, "Abstract", "Title", sample_size=10, batch_size=4, generate_fn=fake_generate
    )
    assert set(result.keys()) == {"train", "test"}
    total = len(result["train"]) + len(result["test"])
    assert total == 10  # all questions pass the filter
    assert all(q for q in result["train"]["Question"])


def test_prompt_contains_passage():
    prompt = build_prompt("UNIQUE_PASSAGE_MARKER")
    assert "UNIQUE_PASSAGE_MARKER" in prompt
    assert "Example" in prompt
