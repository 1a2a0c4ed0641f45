"""QA-extractor state machine: the format families the reference's only
substantive unit tests cover (`/root/reference/tests/datasets/
reading_comprehension_generation/test_utils.py`) — fresh test data, same
behavioral contract."""

from dalm_tpu.data.rc_utils import (
    _raw_question_and_answer_extractor,
    question_and_answer_extractor,
)


def _norm(pairs):
    return [(p["question"].strip().lower(), p["answer"].strip().lower()) for p in pairs]


def test_plain_question_answer_lines():
    text = (
        "QUESTION: What powers a TPU matmul?\n"
        "ANSWER: The MXU systolic array.\n"
        "QUESTION: Where do embeddings live?\n"
        "ANSWER: In HBM across the mesh.\n"
    )
    pairs = _raw_question_and_answer_extractor(text)
    assert _norm(pairs) == [
        ("what powers a tpu matmul?", "the mxu systolic array."),
        ("where do embeddings live?", "in hbm across the mesh."),
    ]


def test_numbered_questions():
    text = (
        "1. QUESTION: What is sharding?\n"
        "ANSWER: Splitting arrays across devices.\n"
        "2. QUESTION: What merges winners?\n"
        "ANSWER: An all-gather over ICI.\n"
    )
    pairs = _raw_question_and_answer_extractor(text)
    assert len(pairs) == 2
    assert pairs[0]["question"].startswith("what is sharding")


def test_bracketed_type_annotations():
    text = (
        "[question type: factual] QUESTION: What is a mesh?\n"
        "[answer] ANSWER: A named grid of devices.\n"
    )
    pairs = _raw_question_and_answer_extractor(text)
    assert len(pairs) == 1
    assert "mesh" in pairs[0]["question"]


def test_question_without_answer_skipped():
    text = (
        "QUESTION: First without answer?\n"
        "Some stray narration line.\n"
        "QUESTION: Second with answer?\n"
        "ANSWER: Yes indeed.\n"
    )
    pairs = _raw_question_and_answer_extractor(text)
    assert len(pairs) == 1
    assert "second" in pairs[0]["question"]


def test_blank_lines_ignored():
    text = "\n\nQUESTION: Q here?\n\n\nANSWER: A here.\n\n"
    pairs = _raw_question_and_answer_extractor(text)
    assert len(pairs) == 1


def test_chat_completion_wrapping_and_alternation():
    text = "QUESTION: Q1?\nANSWER: A1.\nQUESTION: Q2?\nANSWER: A2.\n"
    convo = question_and_answer_extractor(text, context="Some context passage.")
    assert convo is not None
    assert convo[0]["role"] == "user" and "Some context passage." in convo[0]["content"]
    roles = [m["role"] for m in convo[1:]]
    assert roles == ["user", "assistant", "user", "assistant"]


def test_no_pairs_returns_none():
    assert question_and_answer_extractor("no structure at all", "ctx") is None
